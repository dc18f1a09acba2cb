"""Fixed cost of one pallas custom call at GPT-2-124M decode shapes.

gpt2-int8 measured 2x SLOWER than bf16 (r3 verdict #3) despite halved
weight bytes. Hypothesis: each quantized matmul is a pallas custom call
(the bf16 model's matmuls are fused XLA dots), and the per-call fixed cost
(custom-call boundary, layout copies, grid setup) dwarfs the ~2 us stream
time of a 1.8 MB GPT-2 weight. This probe measures, chained in one scan:

  - a minimal passthrough pallas kernel   [16, 768]
  - qmm int8 at gpt2 shapes (768x2304 / 768x3072 / 3072x768)
  - the same matmul as a plain XLA dot (bf16 weights)

If the passthrough floor is ~tens of us, per-matmul pallas quantization
can never pay at 124M scale and the quantized headline belongs to models
where weight streaming dominates (gpt2-xl, llama-8b).
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl

from vllmini_tpu.ops.quant_matmul import _qmm_2d, quantize_weight

M = 16
R = 8
ITERS = 16


def bench(name, step, ws, nbytes):
    @jax.jit
    def run(x, ws):
        def body(x, _):
            for w in ws:
                y = step(x, w)
                r = jnp.max(y.astype(jnp.float32), axis=-1, keepdims=True)
                x = x + (r * 1e-24).astype(x.dtype)
            return x, ()
        x, _ = jax.lax.scan(body, x, None, length=ITERS)
        return x
    rng = np.random.default_rng(1)
    x0 = jnp.asarray(rng.normal(size=(M, 768)), dtype=jnp.bfloat16)
    out = run(x0, ws)
    jax.block_until_ready(out)
    best = float("inf")
    for _ in range(3):
        xf = jnp.asarray(rng.normal(size=(M, 768)), dtype=jnp.bfloat16)
        t0 = time.perf_counter()
        out = run(xf, ws)
        jax.block_until_ready(out)
        best = min(best, time.perf_counter() - t0)
    per = best / (ITERS * len(ws))
    bound = nbytes / (819e9)
    print(f"{name:26s} {per*1e6:7.1f} us/call  (stream bound "
          f"{bound*1e6:5.1f} us)", flush=True)


def passthrough(x, w):
    def kernel(x_ref, o_ref):
        o_ref[...] = x_ref[...] * 1.0001

    return pl.pallas_call(
        kernel, out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype))(x)


def main():
    print(f"backend={jax.default_backend()} M={M}", flush=True)
    rng = np.random.default_rng(0)
    dummy = [jnp.zeros((8, 128), jnp.bfloat16) + i for i in range(R)]
    bench("pallas passthrough", passthrough, dummy, 16 * 768 * 2)

    K, N = 768, 3072
    w_np = rng.normal(size=(K, N)).astype(np.float32) * 0.02
    qw = quantize_weight(jnp.asarray(w_np), 8, 128)
    r8 = [(qw.qvalues + jnp.int8(0), qw.scales + 0) for _ in range(R)]
    bench("qmm int8 768x3072", lambda x, w: _qmm_2d(
        x, w[0], w[1], bits=8, group_size=128), r8, K * N)

    wbf = [jnp.asarray(w_np + i * 1e-6).astype(jnp.bfloat16)
           for i in range(R)]
    bench("XLA dot bf16 768x3072", lambda x, w: jnp.dot(
        x, w, preferred_element_type=jnp.float32).astype(jnp.bfloat16),
        wbf, K * N * 2)

    qw4 = quantize_weight(jnp.asarray(w_np), 4, 128)
    r4 = [(qw4.qvalues + jnp.int8(0), qw4.scales + 0) for _ in range(R)]
    bench("qmm int4 i8 768x3072", lambda x, w: _qmm_2d(
        x, w[0], w[1], bits=4, group_size=128, unpack="i8"), r4, K * N // 2)


if __name__ == "__main__":
    main()
