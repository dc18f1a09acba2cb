"""Does the axon remote backend cache executions with identical inputs?

Times the same jitted scan-of-dots twice per input: if a repeat call with
IDENTICAL args returns ~1000x faster than the first, the link caches
results and every best-of-N timing with fixed inputs is a lie. Also dumps
the compiled HLO op histogram of the loop body to check for elimination.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

K, N, M, ITERS = 4096, 6144, 32, 8
R = 7


def main():
    rng = np.random.default_rng(0)
    ws = [jnp.asarray(rng.normal(size=(K, N)).astype(np.float32) * 0.02
                      ).astype(jnp.bfloat16) for _ in range(R)]

    @jax.jit
    def run(x, ws):
        def body(x, _):
            for w in ws:
                y = jnp.dot(x, w, preferred_element_type=jnp.float32)
                r = jnp.sum(y, axis=-1, keepdims=True)
                x = x + (r * 1e-24).astype(x.dtype)
            return x, ()
        x, _ = jax.lax.scan(body, x, None, length=ITERS)
        return x

    x = jnp.asarray(rng.normal(size=(M, K)), dtype=jnp.bfloat16)

    # HLO: check the dots survive.
    txt = run.lower(x, ws).compile().as_text()
    import re
    print("compiled HLO op counts in while body region:")
    for op in ("fusion", "dot", "custom-call", "while"):
        print(f"  {op}: {len(re.findall(rf'= [^=]*{op}', txt))}")
    convs = txt.count("convolution")
    print(f"  convolution: {convs}", flush=True)

    out = run(x, ws)
    jax.block_until_ready(out)
    for rep in range(4):
        t0 = time.perf_counter()
        out = run(x, ws)
        jax.block_until_ready(out)
        dt_same = time.perf_counter() - t0
        x2 = x + jnp.bfloat16(rep + 1) * 1e-3
        t0 = time.perf_counter()
        out = run(x2, ws)
        jax.block_until_ready(out)
        dt_new = time.perf_counter() - t0
        print(f"rep {rep}: identical-args {dt_same*1e3:8.3f} ms   "
              f"fresh-args {dt_new*1e3:8.3f} ms", flush=True)
    per = dt_new / (ITERS * R)
    print(f"per-dot (fresh): {per*1e6:.1f} us -> "
          f"{K*N*2/per/1e9:.1f} GB/s", flush=True)


if __name__ == "__main__":
    main()
