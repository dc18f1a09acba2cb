"""Scan-based component timing at bench shapes (run on TPU).

Times jit(scan of N iterations) of: fused paged-attention alone (x12 layers),
transformer matmuls alone, sampling alone — to locate per-step device cost.

Usage: PB=32 PYTHONPATH=/root/repo:/root/.axon_site python scripts/profile_parts.py
"""

from __future__ import annotations

import os
import time

import jax
import jax.numpy as jnp

from vllmini_tpu.config import CacheConfig, ModelConfig
from vllmini_tpu.engine.sampling import sample_tokens
from vllmini_tpu.memory.kv_cache import create_kv_pool
from vllmini_tpu.models.common import layer_norm, linear
from vllmini_tpu.models.registry import get_family
from vllmini_tpu.ops.paged_attention import paged_attention

STEPS = 16
N = 6


def timeit(name, fn, *args):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(N):
        out = fn(*args)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / N / STEPS
    print(f"{name:40s} {dt*1e3:8.3f} ms/step")
    return dt


def main():
    on_tpu = jax.default_backend() == "tpu"
    B = int(os.environ.get("PB", "32"))
    ctx = int(os.environ.get("PCTX", "200"))
    config = ModelConfig.gpt2_124m(dtype="bfloat16" if on_tpu else "float32")
    cache = CacheConfig(num_pages=B * 32 + 64, page_size=32,
                        max_pages_per_seq=32, kv_dtype=config.dtype)
    family = get_family(config)
    params = family.init_params(config, jax.random.PRNGKey(0))
    pool = create_kv_pool(config, cache)
    print("pool row width:", pool.row_width)

    seq_lens = jnp.full(B, ctx, jnp.int32)
    page_tables = (jnp.arange(B * cache.max_pages_per_seq, dtype=jnp.int32)
                   .reshape(B, -1) % cache.num_pages)
    active = jnp.ones(B, bool)
    H, d = config.num_heads, config.head_size
    L = config.num_layers

    # 1. full decode forward in scan
    def full_chunk(params, pool, tok):
        def body(carry, _):
            pool, tok = carry
            logits, pool = family.decode_forward(
                params, config, pool, tok, seq_lens - 1, seq_lens,
                page_tables, active, interpret=not on_tpu)
            tok = jnp.argmax(logits, -1).astype(jnp.int32)
            return (pool, tok), None
        (pool, tok), _ = jax.lax.scan(body, (pool, tok), None, length=STEPS)
        return pool, tok
    f = jax.jit(full_chunk, donate_argnums=(1,))
    pool2 = jax.tree.map(jnp.copy, pool)
    d_full = timeit("full decode fwd + greedy", lambda: f(
        params, jax.tree.map(jnp.copy, pool), jnp.zeros(B, jnp.int32)))

    # 2. attention only (12 layers of fused paged_attention), scan
    q0 = jax.random.normal(jax.random.PRNGKey(1), (B, H, d), config.jnp_dtype)
    kn = jax.random.normal(jax.random.PRNGKey(2), (B, config.kv_heads, d),
                           config.jnp_dtype)

    def attn_chunk(pool, q):
        def body(carry, _):
            pool, q = carry
            for i in range(L):
                kv, _ = pool.layer(i)
                o, kv = paged_attention(
                    q, kv, seq_lens, page_tables, k_new=kn, v_new=kn,
                    num_kv_heads=pool.num_kv_heads, interpret=not on_tpu)
                pool = pool.with_layer(i, kv)
                q = o * 0.999
            return (pool, q), None
        (pool, q), _ = jax.lax.scan(body, (pool, q), None, length=STEPS)
        return pool, q
    g = jax.jit(attn_chunk, donate_argnums=(0,))
    d_attn = timeit("attention only x12", lambda: g(
        jax.tree.map(jnp.copy, pool), q0))

    # 3. matmuls only
    x0 = jax.random.normal(jax.random.PRNGKey(3),
                           (B, config.hidden_size), config.jnp_dtype)

    def mm_chunk(params, x):
        def body(x, _):
            for blk in params["blocks"]:
                h1 = layer_norm(x, blk["ln_1"]["g"], blk["ln_1"]["b"])
                qkv = linear(h1, blk["attn"]["c_attn_w"],
                             blk["attn"]["c_attn_b"])
                x = x + linear(qkv[:, :config.hidden_size],
                               blk["attn"]["c_proj_w"],
                               blk["attn"]["c_proj_b"])
                h2 = layer_norm(x, blk["ln_2"]["g"], blk["ln_2"]["b"])
                hh = jax.nn.gelu(linear(h2, blk["mlp"]["c_fc_w"],
                                        blk["mlp"]["c_fc_b"]),
                                 approximate=True)
                x = x + linear(hh, blk["mlp"]["c_proj_w"],
                               blk["mlp"]["c_proj_b"])
            logits = jnp.dot(x, params["wte"].T,
                             preferred_element_type=jnp.float32)
            x = x + logits[:, :config.hidden_size].astype(x.dtype) * 1e-6
            return x, None
        x, _ = jax.lax.scan(body, x, None, length=STEPS)
        return x
    h = jax.jit(mm_chunk)
    d_mm = timeit("matmuls+lm_head only", h, params, x0)

    # 4. sampling only
    logits0 = jax.random.normal(jax.random.PRNGKey(4), (B, config.vocab_size))

    def samp_chunk(logits, rng):
        def body(carry, _):
            logits, rng = carry
            rng, k = jax.random.split(rng)
            tok = sample_tokens(logits, jnp.zeros(B, jnp.uint32),
                                jnp.zeros(B, jnp.int32),
                                jnp.zeros(B), jnp.full(B, 50),
                                jnp.ones(B))
            logits = logits + tok[:, None] * 1e-9
            return (logits, rng), None
        (logits, rng), _ = jax.lax.scan(body, (logits, rng), None,
                                        length=STEPS)
        return logits
    s = jax.jit(samp_chunk)
    d_s = timeit("sampling only", s, logits0, jax.random.PRNGKey(5))

    print(f"\nsum of parts: {(d_attn + d_mm + d_s)*1e3:.3f} ms/step "
          f"vs full {d_full*1e3:.3f}")


if __name__ == "__main__":
    main()
