"""Definitive timing-semantics probe for the axon tunnel.

For dense bf16, int8 qmm (pallas), and int4 qmm (pallas) at the same shape:
  - run the chained scan at iters=4 and iters=32 with FRESH inputs each rep;
  - real on-device compute must scale ~8x between the two; a flat time means
    the measurement (or the backend's completion signal) is broken.
Prints total wall ms per run call.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from vllmini_tpu.ops.quant_matmul import _qmm_2d, quantize_weight

K, N, M, G, R = 4096, 6144, 32, 128, 8


def make_run(step, iters):
    # Weights MUST be jit ARGUMENTS: closed-over arrays ship as inline MLIR
    # constants to the remote compile helper (HTTP 413 above ~100 MB) and
    # invite constant folding.
    @jax.jit
    def run(x, ws):
        def body(x, _):
            for w in ws:
                y = step(x, w)
                r = jnp.max(y.astype(jnp.float32), axis=-1, keepdims=True)
                x = x + (r * 1e-24).astype(x.dtype)
            return x, ()
        x, _ = jax.lax.scan(body, x, None, length=iters)
        return x
    return run


def bench(name, step, ws):
    """block_until_ready through the axon tunnel acks ENQUEUE, not
    completion (measured: a 256-op scan 'finished' in 0.1 ms regardless of
    iteration count) — only a host FETCH forces the device to drain. So:
    fetch the result every run, and difference two iteration counts so the
    constant costs (dispatch + ~25 ms fetch RTT) cancel."""
    rng = np.random.default_rng(1)
    t_at = {}
    for iters in (4, 36):
        run = make_run(step, iters)
        x0 = jnp.asarray(rng.normal(size=(M, K)), dtype=jnp.bfloat16)
        np.asarray(run(x0, ws))  # warmup incl. compile, forced
        times = []
        for rep in range(3):
            xf = jnp.asarray(rng.normal(size=(M, K)), dtype=jnp.bfloat16)
            t0 = time.perf_counter()
            np.asarray(run(xf, ws))
            times.append(time.perf_counter() - t0)
        t_at[iters] = min(times)
    per = (t_at[36] - t_at[4]) / ((36 - 4) * len(ws))
    print(f"{name:16s} t4={t_at[4]*1e3:8.2f} ms t36={t_at[36]*1e3:8.2f} ms"
          f"  per-op {per*1e6:7.1f} us", flush=True)


def main():
    rng = np.random.default_rng(0)
    w_np = rng.normal(size=(K, N)).astype(np.float32) * 0.02
    wbf = [jnp.asarray(w_np + i * 1e-6).astype(jnp.bfloat16)
           for i in range(R)]
    bench("dense bf16", lambda x, w: jnp.dot(
        x, w, preferred_element_type=jnp.float32).astype(jnp.bfloat16), wbf)
    del wbf

    qw8 = quantize_weight(jnp.asarray(w_np), 8, G)
    r8 = [(qw8.qvalues + jnp.int8(0), qw8.scales + 0) for _ in range(R)]
    bench("qmm int8", lambda x, w: _qmm_2d(x, w[0], w[1], bits=8,
                                           group_size=G), r8)
    del r8

    qw4 = quantize_weight(jnp.asarray(w_np), 4, G)
    r4 = [(qw4.qvalues + jnp.int8(0), qw4.scales + 0) for _ in range(R)]
    for up in ("i32", "i8"):
        bench(f"qmm int4 {up}",
              lambda x, w, up=up: _qmm_2d(x, w[0], w[1], bits=4,
                                          group_size=G, unpack=up), r4)


if __name__ == "__main__":
    main()
