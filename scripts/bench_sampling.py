"""On-chip A/B for the per-step sampling cost (GPT-2 headline lever).

Round-2 profiling put sample_tokens at ~0.26 ms of a ~1.0 ms device step
(b16, 50k vocab) — ~100x the bandwidth bound of one bf16 logits pass, i.e.
fixed overhead / multi-pass reduction, not bytes. Candidates timed here on
the serving shapes:

  argmax       — greedy lower bound (one pass)
  approx64     — jax.lax.approx_max_k(bf16, 64) (shipping candidate set)
  top64        — exact jax.lax.top_k
  full sampler — sample_tokens (candidates + cuts + gumbel)
  sampler+lp   — sample_tokens_lp (adds the logsumexp logprob capture)

Usage: PYTHONPATH=/root/repo:/root/.axon_site python scripts/bench_sampling.py
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")

from vllmini_tpu.engine.sampling import sample_tokens, sample_tokens_lp


def timeit(fn, *args, iters=50):
    y = fn(*args)
    jax.block_until_ready(y)
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(iters):
            y = fn(*args)
        jax.block_until_ready(y)
        best = min(best, (time.perf_counter() - t0) / iters)
    return best


def main():
    print(f"backend={jax.default_backend()}")
    for B, V in ((16, 50257), (32, 128256)):
        logits = jax.random.normal(jax.random.PRNGKey(0), (B, V),
                                   jnp.float32) * 4
        seeds = jnp.arange(B, dtype=jnp.uint32)
        pos = jnp.full(B, 100, jnp.int32)
        temps = jnp.full(B, 0.8, jnp.float32)
        tks = jnp.full(B, 50, jnp.int32)
        tps = jnp.full(B, 0.95, jnp.float32)
        bound_us = B * V * 4 / 819e3  # one f32 pass at HBM speed
        rows = [
            ("argmax", jax.jit(lambda x: jnp.argmax(x, -1)), (logits,)),
            ("approx64", jax.jit(lambda x: jax.lax.approx_max_k(
                x.astype(jnp.bfloat16), 64, recall_target=0.99)), (logits,)),
            ("top64", jax.jit(lambda x: jax.lax.top_k(x, 64)), (logits,)),
            ("sampler", jax.jit(sample_tokens),
             (logits, seeds, pos, temps, tks, tps)),
            ("sampler+lp", jax.jit(sample_tokens_lp),
             (logits, seeds, pos, temps, tks, tps)),
            ("greedy-lane", jax.jit(sample_tokens),
             (logits, seeds, pos, jnp.zeros(B, jnp.float32), tks, tps)),
        ]
        print(f"-- B={B} V={V}  (one-pass bound {bound_us:.0f} us)")
        for name, fn, args in rows:
            dt = timeit(fn, *args)
            print(f"   {name:11s} {dt*1e6:8.1f} us  ({dt*1e6/bound_us:5.1f}x"
                  f" bound)")


if __name__ == "__main__":
    main()
