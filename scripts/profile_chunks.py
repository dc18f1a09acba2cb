"""Measure chunk-size scaling + in-scan sampling cost + pipelined dispatch.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python scripts/profile_chunks.py
"""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp

from vllmini_tpu.config import CacheConfig, ModelConfig
from vllmini_tpu.memory.kv_cache import create_kv_pool
from vllmini_tpu.models.registry import get_family
from vllmini_tpu.engine.sampling import sample_tokens


def main():
    on_tpu = jax.default_backend() == "tpu"
    B = int(__import__("os").environ.get("PB", "8"))
    config = ModelConfig.gpt2_124m(dtype="bfloat16" if on_tpu else "float32")
    cache = CacheConfig(num_pages=int(__import__("os").environ.get("PNP", "1024")), page_size=int(__import__("os").environ.get("PPS", "16")), max_pages_per_seq=int(__import__("os").environ.get("PMP", "32")),
                        kv_dtype=config.dtype)
    family = get_family(config)
    params = family.init_params(config, jax.random.PRNGKey(0))

    token_ids = jnp.zeros(B, jnp.int32)
    seq_lens0 = jnp.full(B, 200, jnp.int32)
    page_tables = (jnp.arange(B * cache.max_pages_per_seq, dtype=jnp.int32)
                   .reshape(B, -1) % cache.num_pages)
    active = jnp.ones(B, bool)
    temps = jnp.zeros(B, jnp.float32)
    seeds = jnp.zeros(B, jnp.uint32)
    topks = jnp.full(B, 50, jnp.int32)
    topps = jnp.ones(B, jnp.float32)

    def make_chunk(steps, sampling):
        def chunk(params, pool, tok, seq_lens, rng):
            def body(carry, step_rng):
                pool, tok, seq_lens = carry
                positions = seq_lens - 1
                logits, pool = family.decode_forward(
                    params, config, pool, tok, positions, seq_lens,
                    page_tables, active, interpret=not on_tpu)
                if sampling == "full":
                    tok = sample_tokens(logits, seeds, positions, temps, topks, topps)
                elif sampling == "greedy":
                    tok = jnp.argmax(logits, axis=-1).astype(jnp.int32)
                return (pool, tok, seq_lens + 1), None
            rngs = jax.random.split(rng, steps)
            (pool, tok, seq_lens), _ = jax.lax.scan(
                body, (pool, tok, seq_lens), rngs)
            return pool, tok, seq_lens
        return jax.jit(chunk, donate_argnums=(1,))

    rng = jax.random.PRNGKey(0)
    for sampling in ("full", "greedy", "none"):
        for steps in (16, 32, 64):
            cf = make_chunk(steps, sampling)
            pool = create_kv_pool(config, cache)
            # compile + warm
            pool, tok, sl = cf(params, pool, token_ids, seq_lens0, rng)
            jax.block_until_ready(tok)
            # blocked-each (what the current scheduler does); seq_lens reset
            # per dispatch to stay inside the 512-token page budget.
            t0 = time.perf_counter()
            n = 6
            for _ in range(n):
                pool, tok, _sl = cf(params, pool, token_ids, seq_lens0, rng)
                jax.block_until_ready(tok)
            blocked = (time.perf_counter() - t0) / n
            # pipelined (dispatch all, block once)
            t0 = time.perf_counter()
            for _ in range(n):
                pool, tok, _sl = cf(params, pool, token_ids, seq_lens0, rng)
            jax.block_until_ready(tok)
            piped = (time.perf_counter() - t0) / n
            print(f"sampling={sampling:6s} steps={steps:3d}  "
                  f"blocked {blocked*1e3:7.2f} ms ({steps/blocked:7.0f} st/s) "
                  f"piped {piped*1e3:7.2f} ms ({steps/piped:7.0f} st/s) "
                  f"tok/s piped {B*steps/piped:8.0f}")


if __name__ == "__main__":
    main()
