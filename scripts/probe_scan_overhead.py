"""Why does a lone [32,4096]x[4096,6144] bf16 dot measure ~480us (104 GB/s)
in a scan chain when the engine's full decode step achieves ~590 GB/s?

Variations: carry-dependent vs independent iterations, M in {8,32,128,256},
scan vs unrolled fori, different N. Run on the real chip.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

HBM_GBS = 819.0
K, N = 4096, 6144
ITERS = 64


def bench(run, *args):
    out = run(*args)
    jax.block_until_ready(out)
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        out = run(*args)
        jax.block_until_ready(out)
        best = min(best, time.perf_counter() - t0)
    return best / ITERS


def main():
    rng = np.random.default_rng(0)
    w = jnp.asarray(rng.normal(size=(K, N)).astype(np.float32) * 0.02
                    ).astype(jnp.bfloat16)
    nbytes = K * N * 2
    bound = nbytes / (HBM_GBS * 1e9)
    print(f"w [{K}x{N}] bf16 = {nbytes/1e6:.1f} MB, stream bound "
          f"{bound*1e6:.1f} us", flush=True)

    for M in (8, 32, 128, 256):
        x = jnp.asarray(rng.normal(size=(M, K)), dtype=jnp.bfloat16)

        @jax.jit
        def chain(x, w):
            def body(x, _):
                y = jnp.dot(x, w, preferred_element_type=jnp.float32)
                return x + y[:, :1].astype(x.dtype) * 1e-24, ()
            x, _ = jax.lax.scan(body, x, None, length=ITERS)
            return x
        dt = bench(chain, x, w)
        print(f"M={M:4d} chain-dep   {dt*1e6:7.1f} us "
              f"{nbytes/dt/1e9:6.1f} GB/s", flush=True)

        xs = jnp.asarray(rng.normal(size=(ITERS, M, K)), dtype=jnp.bfloat16)

        @jax.jit
        def indep(xs, w):
            def body(acc, xi):
                y = jnp.dot(xi, w, preferred_element_type=jnp.float32)
                return acc + y[0, 0], ()
            acc, _ = jax.lax.scan(body, jnp.float32(0), xs)
            return acc
        dt = bench(indep, xs, w)
        print(f"M={M:4d} indep-scan  {dt*1e6:7.1f} us "
              f"{nbytes/dt/1e9:6.1f} GB/s", flush=True)

    # N-sweep at M=32 to find a fixed per-dot overhead.
    M = 32
    x = jnp.asarray(rng.normal(size=(M, K)), dtype=jnp.bfloat16)
    for n in (1024, 4096, 16384):
        w2 = jnp.asarray(rng.normal(size=(K, n)).astype(np.float32)
                         ).astype(jnp.bfloat16)
        nb = K * n * 2

        @jax.jit
        def chain2(x, w2):
            def body(x, _):
                y = jnp.dot(x, w2, preferred_element_type=jnp.float32)
                return x + y[:, :1].astype(x.dtype) * 1e-24, ()
            x, _ = jax.lax.scan(body, x, None, length=ITERS)
            return x
        dt = bench(chain2, x, w2)
        print(f"M=32 N={n:6d} chain  {dt*1e6:7.1f} us  {nb/dt/1e9:6.1f} GB/s"
              f"  (bound {nb/(HBM_GBS*1e9)*1e6:.1f} us)", flush=True)


if __name__ == "__main__":
    main()
