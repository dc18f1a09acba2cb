"""On-chip cost of the sampling tail at bench shapes.

Times, inside one jitted 64-step scan (per-dispatch link latency amortized;
logits perturbed per step so nothing hoists):
  argmax            — greedy pick alone
  lse               — the unconditional logsumexp sample_tokens_lp adds
  sample_tokens     — full sampler, all-greedy temps (cond fast path)
  sample_tokens_lp  — what the engine actually calls per step

Usage: PYTHONPATH=/root/repo:/root/.axon_site python scripts/probe_sampling_cost.py
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

from vllmini_tpu.engine.sampling import sample_tokens, sample_tokens_lp

B, V, STEPS, N = 16, 50257, 64, 5


def bench(name, step):
    """step: (logits) -> [B]-ish array consumed into the carry."""

    def chunk(logits):
        def body(logits, _):
            out = step(logits)
            logits = logits + out.reshape(B, -1)[:, :1].astype(
                logits.dtype) * 1e-9
            return logits, None
        logits, _ = jax.lax.scan(body, logits, None, length=STEPS)
        return logits

    f = jax.jit(chunk)
    logits0 = jax.random.normal(jax.random.PRNGKey(0), (B, V), jnp.float32)
    jax.block_until_ready(f(logits0))
    t0 = time.perf_counter()
    for _ in range(N):
        logits0 = f(logits0)
    jax.block_until_ready(logits0)
    dt = (time.perf_counter() - t0) / N / STEPS
    print(f"{name:24s} {dt*1e6:9.1f} us/step")


def main():
    zeros_u = jnp.zeros(B, jnp.uint32)
    zeros_i = jnp.zeros(B, jnp.int32)
    zeros_f = jnp.zeros(B, jnp.float32)
    ks = jnp.full(B, 50, jnp.int32)
    ones_f = jnp.ones(B, jnp.float32)

    bench("argmax", lambda lg: jnp.argmax(lg, -1).astype(jnp.int32))
    bench("lse", lambda lg: jax.nn.logsumexp(lg.astype(jnp.float32), -1))
    bench("sample_tokens greedy", lambda lg: sample_tokens(
        lg, zeros_u, zeros_i, zeros_f, ks, ones_f))
    bench("sample_tokens_lp greedy", lambda lg: sample_tokens_lp(
        lg, zeros_u, zeros_i, zeros_f, ks, ones_f)[1])
    bench("sample_tokens sampled", lambda lg: sample_tokens(
        lg, zeros_u, zeros_i, ones_f, ks, ones_f))


if __name__ == "__main__":
    main()
