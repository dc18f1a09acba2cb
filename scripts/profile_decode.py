"""Component-level timing of the decode step at bench shapes (run on TPU).

Usage: PYTHONPATH=/root/repo:/root/.axon_site python scripts/profile_decode.py
"""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp
import numpy as np

from vllmini_tpu.config import CacheConfig, ModelConfig
from vllmini_tpu.memory.kv_cache import create_kv_pool
from vllmini_tpu.models.registry import get_family
from vllmini_tpu.engine.sampling import sample_tokens
from vllmini_tpu.ops.paged_attention import paged_attention
from vllmini_tpu.ops.kv_write import write_kv_decode


def timeit(name, fn, *args, n=50, **kw):
    out = fn(*args, **kw)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args, **kw)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / n
    print(f"{name:36s} {dt*1e3:9.3f} ms")
    return dt


def main():
    on_tpu = jax.default_backend() == "tpu"
    B = 8
    config = ModelConfig.gpt2_124m(dtype="bfloat16" if on_tpu else "float32")
    cache = CacheConfig(num_pages=1024, page_size=16, max_pages_per_seq=32,
                        kv_dtype=config.dtype)
    family = get_family(config)
    params = family.init_params(config, jax.random.PRNGKey(0))
    pool = create_kv_pool(config, cache)

    token_ids = jnp.zeros(B, jnp.int32)
    seq_lens = jnp.full(B, 200, jnp.int32)
    positions = seq_lens - 1
    page_tables = (jnp.arange(B * cache.max_pages_per_seq, dtype=jnp.int32)
                   .reshape(B, -1) % cache.num_pages)
    active = jnp.ones(B, bool)

    # ---- host<->device round trip latency
    one = jnp.ones(())
    t0 = time.perf_counter()
    for _ in range(10):
        float(jax.jit(lambda x: x + 1)(one))
    rt = (time.perf_counter() - t0) / 10
    print(f"{'host sync round trip':36s} {rt*1e3:9.3f} ms")

    # ---- single forward, blocked each call (latency) and pipelined
    fwd = jax.jit(lambda p, pool, t, pos, sl, pt, a: family.decode_forward(
        p, config, pool, t, pos, sl, pt, a, interpret=not on_tpu))
    def fwd_blocked():
        out = fwd(params, pool, token_ids, positions, seq_lens, page_tables,
                  active)
        jax.block_until_ready(out)
        return out
    timeit("decode_forward (blocked each)", fwd_blocked, n=20)
    timeit("decode_forward (pipelined)", fwd, params, pool, token_ids,
           positions, seq_lens, page_tables, active)

    # ---- scan of 16 forwards + sampling (the chunk shape), blocked
    temps = jnp.zeros(B, jnp.float32)
    seeds = jnp.zeros(B, jnp.uint32)
    topks = jnp.full(B, 50, jnp.int32)
    topps = jnp.ones(B, jnp.float32)

    def chunk16(params, pool, tok, positions, seq_lens, rng):
        def body(carry, step_rng):
            pool, tok = carry
            logits, pool = family.decode_forward(
                params, config, pool, tok, positions, seq_lens, page_tables,
                active, interpret=not on_tpu)
            tok = sample_tokens(logits, seeds, positions, temps, topks, topps)
            return (pool, tok), None
        rngs = jax.random.split(rng, 16)
        (pool, tok), _ = jax.lax.scan(body, (pool, tok), rngs)
        return pool, tok
    cf = jax.jit(chunk16, donate_argnums=(1,))
    p2 = jax.tree.map(jnp.copy, pool)
    rng = jax.random.PRNGKey(0)

    def chunk_blocked():
        nonlocal p2
        p2, tok = cf(params, p2, token_ids, positions, seq_lens, rng)
        jax.block_until_ready(tok)
        return tok
    d16 = timeit("chunk16 scan (blocked each)", chunk_blocked, n=10)
    print(f"{'  -> per step':36s} {d16/16*1e3:9.3f} ms")

    # ---- components
    kv0, sc0 = pool.layer(0)
    H, d = config.num_heads, config.head_size
    q = jax.random.normal(jax.random.PRNGKey(1), (B, H, d), config.jnp_dtype)
    pa = jax.jit(lambda q, kv: paged_attention(
        q, kv, seq_lens, page_tables, num_kv_heads=config.kv_heads,
        interpret=not on_tpu))
    timeit("paged_attention x1 (pipelined)", pa, q, kv0)

    k = jax.random.normal(jax.random.PRNGKey(2), (B, config.kv_heads, d),
                          config.jnp_dtype)
    wr = jax.jit(lambda kv, k, v: write_kv_decode(
        kv, k, v, positions, page_tables, active, interpret=not on_tpu))
    timeit("write_kv_decode x1 (pipelined)", wr, kv0, k, k)

    logits = jax.random.normal(jax.random.PRNGKey(3),
                               (B, config.vocab_size), jnp.float32)
    samp = jax.jit(lambda l: sample_tokens(l, seeds, positions, temps,
                                           topks, topps))
    timeit("sample_tokens (pipelined)", samp, logits)

    x = jax.random.normal(jax.random.PRNGKey(5),
                          (B, config.hidden_size), config.jnp_dtype)

    def mm_only(params, x):
        from vllmini_tpu.models.common import layer_norm, linear
        for blk in params["blocks"]:
            h1 = layer_norm(x, blk["ln_1"]["g"], blk["ln_1"]["b"])
            qkv = linear(h1, blk["attn"]["c_attn_w"], blk["attn"]["c_attn_b"])
            x = x + linear(qkv[:, :config.hidden_size],
                           blk["attn"]["c_proj_w"], blk["attn"]["c_proj_b"])
            h2 = layer_norm(x, blk["ln_2"]["g"], blk["ln_2"]["b"])
            h = linear(h2, blk["mlp"]["c_fc_w"], blk["mlp"]["c_fc_b"])
            h = jax.nn.gelu(h, approximate=True)
            x = x + linear(h, blk["mlp"]["c_proj_w"], blk["mlp"]["c_proj_b"])
        return jnp.dot(x, params["wte"].T, preferred_element_type=jnp.float32)
    mm = jax.jit(mm_only)
    timeit("matmuls only (12 blocks+lm_head)", mm, params, x)


if __name__ == "__main__":
    main()
