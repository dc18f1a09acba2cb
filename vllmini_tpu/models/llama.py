"""Llama-family model with paged KV cache (JAX functional).

Capability extension beyond the reference (which serves only GPT-2,
`/root/reference/vllmini/server.py:34`), required by the target configs
(BASELINE.md: Llama-3-8B/70B). Same paged-KV contract as `gpt2.py`: shared page
table across layers, cache-then-attend, seq_lens include the current token.

Architecture: RMSNorm, RoPE (rotate-half convention matching HF), GQA, SwiGLU.
The same forward serves Mistral (`config.sliding_window`) and Qwen2
(`config.attention_bias` — QKV biases, bias-free o_proj).
"""

from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp

from ..config import ModelConfig
from ..memory.kv_cache import KVPool
from ..ops.flash_attention import flash_attention_prefill
from ..ops.kv_write import write_kv_prefill
from .common import (apply_rope, linear, maybe_psum, paged_decode_attention,
                     rms_norm, rope_table)
from .gpt2 import _gather_prefix_kv, _update_pool_layer

Params = Dict[str, Any]


def init_params(config: ModelConfig, key: jax.Array) -> Params:
    dt = config.jnp_dtype
    h, L = config.hidden_size, config.num_layers
    m = config.mlp_size
    d, H, Hkv = config.head_size, config.num_heads, config.kv_heads
    keys = jax.random.split(key, 2 + 7 * L)
    std = 0.02

    def norm(k, shape):
        return (jax.random.normal(k, shape) * std).astype(dt)

    params: Params = {
        "embed": norm(keys[0], (config.vocab_size, h)),
        "norm_f": jnp.ones(h, dt),
        "lm_head": (None if config.tie_word_embeddings
                    else norm(keys[1], (h, config.vocab_size))),
        "blocks": [],
    }
    for i in range(L):
        ks = keys[2 + 7 * i: 9 + 7 * i]
        params["blocks"].append({
            "input_norm": jnp.ones(h, dt),
            "post_attn_norm": jnp.ones(h, dt),
            "attn": {
                "wq": norm(ks[0], (h, H * d)),
                "wk": norm(ks[1], (h, Hkv * d)),
                "wv": norm(ks[2], (h, Hkv * d)),
                "wo": norm(ks[3], (H * d, h)),
                **({"bq": jnp.zeros(H * d, dt),
                    "bk": jnp.zeros(Hkv * d, dt),
                    "bv": jnp.zeros(Hkv * d, dt)}
                   if config.attention_bias else {}),
            },
            "mlp": {
                "w_gate": norm(ks[4], (h, m)),
                "w_up": norm(ks[5], (h, m)),
                "w_down": norm(ks[6], (m, h)),
            },
        })
    return params


def _mlp(block: Params, x: jax.Array) -> jax.Array:
    m = block["mlp"]
    if "w_gateup" in m:  # fused layout (models/fuse.py): one weight stream
        inter = m["w_down"].shape[0]
        y = linear(x, m["w_gateup"])
        gate, up = y[..., :inter], y[..., inter:]
        return linear(jax.nn.silu(gate) * up, m["w_down"])
    gate = jax.nn.silu(linear(x, m["w_gate"]))
    up = linear(x, m["w_up"])
    return linear(gate * up, m["w_down"])


def _qkv(block: Params, h1: jax.Array, H: int, Hkv: int, d: int):
    """Project to (q, k, v) [..., heads, d] — fused or per-weight layout;
    any leading shape (decode [B, h], prefill [L, h], burst [B, L, h])."""
    a = block["attn"]
    lead = h1.shape[:-1]
    if "wqkv" in a:
        y = linear(h1, a["wqkv"], a.get("bqkv"))
        q = y[..., :H * d]
        k = y[..., H * d:(H + Hkv) * d]
        v = y[..., (H + Hkv) * d:]
    else:
        q = linear(h1, a["wq"], a.get("bq"))
        k = linear(h1, a["wk"], a.get("bk"))
        v = linear(h1, a["wv"], a.get("bv"))
    return (q.reshape(*lead, H, d), k.reshape(*lead, Hkv, d),
            v.reshape(*lead, Hkv, d))


def _logits(params: Params, x: jax.Array) -> jax.Array:
    lm = params.get("lm_head")
    if lm is not None:
        from .common import QuantizedWeight
        if isinstance(lm, QuantizedWeight):
            # An untied lm_head may be weight-quantized (>1 GB/step at bf16
            # for 128k vocabs); keep f32 logits for sampling.
            from ..ops.quant_matmul import quantized_matmul
            return quantized_matmul(x, lm, out_dtype=jnp.float32)
        return jnp.dot(x, lm, preferred_element_type=jnp.float32)
    return jnp.dot(x, params["embed"].T, preferred_element_type=jnp.float32)


def prefill_forward(
    params: Params,
    config: ModelConfig,
    pool: KVPool,
    token_ids: jax.Array,   # [L_pad] int32
    seq_len: jax.Array,     # scalar int32
    page_table: jax.Array,  # [pages_per_seq_max] int32
    start_pos: int | jax.Array = 0,
    *,
    interpret: bool = False,
    tp_axis: str | None = None,
    return_all_logits: bool = False,
):
    L_pad = token_ids.shape[0]
    prefix_tokens = int(start_pos) if isinstance(start_pos, int) else 0
    assert prefix_tokens == 0 or pool is not None, \
        "chunked prefill needs the pool for its prefix"
    H, Hkv, d = config.num_heads, config.kv_heads, config.head_size
    positions = start_pos + jnp.arange(L_pad, dtype=jnp.int32)
    cos, sin = rope_table(positions, d, config.rope_theta)  # [L, d/2]
    x = params["embed"][token_ids]

    for i, block in enumerate(params["blocks"]):
        h1 = rms_norm(x, block["input_norm"], config.layer_norm_eps)
        q, k, v = _qkv(block, h1, H, Hkv, d)
        q = apply_rope(q, cos[:, None, :], sin[:, None, :])
        k = apply_rope(k, cos[:, None, :], sin[:, None, :])

        if pool is not None:
            kv, sc = pool.layer(i)
            out = write_kv_prefill(kv, k, v, page_table, seq_len,
                                   start_pos=start_pos, kv_scales=sc)
            if pool.quantized:
                kv, sc = out
            else:
                kv = out
            pool = _update_pool_layer(pool, i, kv, sc)

        if prefix_tokens:
            pk, pv = _gather_prefix_kv(pool, i, page_table, prefix_tokens,
                                       k.dtype, Hkv, d)
            k_att = jnp.concatenate([pk, k], axis=0)
            v_att = jnp.concatenate([pv, v], axis=0)
        else:
            k_att, v_att = k, v
        attn = flash_attention_prefill(
            q.transpose(1, 0, 2), k_att.transpose(1, 0, 2),
            v_att.transpose(1, 0, 2), prefix_tokens + seq_len,
            q_offset=prefix_tokens, causal=True,
            sliding_window=config.sliding_window,
            interpret=interpret,
        ).transpose(1, 0, 2).reshape(L_pad, H * d)
        x = x + maybe_psum(linear(attn, block["attn"]["wo"]), tp_axis)
        h2 = rms_norm(x, block["post_attn_norm"], config.layer_norm_eps)
        x = x + maybe_psum(_mlp(block, h2), tp_axis)

    x = rms_norm(x, params["norm_f"], config.layer_norm_eps)
    if return_all_logits:
        return _logits(params, x), pool
    return _logits(params, x[seq_len - 1]), pool


def prefill_batch_forward(
    params: Params,
    config: ModelConfig,
    pool: KVPool,
    token_ids: jax.Array,    # [B, L_pad] int32
    seq_lens: jax.Array,     # [B] int32 true prompt lengths
    page_tables: jax.Array,  # [B, pages_per_seq_max] int32
    *,
    interpret: bool = False,
    tp_axis: str | None = None,
):
    """Burst prefill: B fresh prompts in ONE forward (batched flash kernel +
    flat batched KV write). Returns (last-position logits [B, vocab], pool).
    Rows with seq_len 0 are inactive (KV to trash, logits garbage — the
    engine masks their inserts)."""
    from ..ops.flash_attention import flash_attention_prefill_batch
    from ..ops.kv_write import write_kv_prefill_batch

    B, L_pad = token_ids.shape
    H, Hkv, d = config.num_heads, config.kv_heads, config.head_size
    positions = jnp.arange(L_pad, dtype=jnp.int32)
    cos, sin = rope_table(positions, d, config.rope_theta)  # [L, d/2]
    x = params["embed"][token_ids]                          # [B, L, h]

    for i, block in enumerate(params["blocks"]):
        h1 = rms_norm(x, block["input_norm"], config.layer_norm_eps)
        q, k, v = _qkv(block, h1, H, Hkv, d)                # [B, L, heads, d]
        q = apply_rope(q, cos[None, :, None, :], sin[None, :, None, :])
        k = apply_rope(k, cos[None, :, None, :], sin[None, :, None, :])

        if pool is not None:
            kv, sc = pool.layer(i)
            out = write_kv_prefill_batch(kv, k, v, page_tables, seq_lens,
                                         kv_scales=sc)
            if pool.quantized:
                kv, sc = out
            else:
                kv = out
            pool = _update_pool_layer(pool, i, kv, sc)

        attn = flash_attention_prefill_batch(
            q.transpose(0, 2, 1, 3), k.transpose(0, 2, 1, 3),
            v.transpose(0, 2, 1, 3), seq_lens, causal=True,
            sliding_window=config.sliding_window,
            interpret=interpret,
        ).transpose(0, 2, 1, 3).reshape(B, L_pad, H * d)
        x = x + maybe_psum(linear(attn, block["attn"]["wo"]), tp_axis)
        h2 = rms_norm(x, block["post_attn_norm"], config.layer_norm_eps)
        x = x + maybe_psum(_mlp(block, h2), tp_axis)

    x = rms_norm(x, params["norm_f"], config.layer_norm_eps)
    last = x[jnp.arange(B), jnp.maximum(seq_lens - 1, 0)]   # [B, h]
    return _logits(params, last), pool


def decode_forward(
    params: Params,
    config: ModelConfig,
    pool: KVPool,
    token_ids: jax.Array,    # [B]
    positions: jax.Array,    # [B]
    seq_lens: jax.Array,     # [B] (include current token)
    page_tables: jax.Array,  # [B, pages_per_seq_max]
    active: jax.Array,       # [B] bool
    *,
    interpret: bool = False,
    tp_axis: str | None = None,
    kv_partitions: int = 1,
):
    B = token_ids.shape[0]
    H, Hkv, d = config.num_heads, config.kv_heads, config.head_size
    cos, sin = rope_table(positions, d, config.rope_theta)  # [B, d/2]
    x = params["embed"][token_ids]

    for i, block in enumerate(params["blocks"]):
        h1 = rms_norm(x, block["input_norm"], config.layer_norm_eps)
        q, k, v = _qkv(block, h1, H, Hkv, d)
        q = apply_rope(q, cos[:, None, :], sin[:, None, :])
        k = apply_rope(k, cos[:, None, :], sin[:, None, :])

        attn, pool = paged_decode_attention(
            pool, i, q, k, v, positions, seq_lens, page_tables, active,
            num_kv_heads=Hkv, sliding_window=config.sliding_window,
            kv_partitions=kv_partitions, interpret=interpret)
        x = x + maybe_psum(
            linear(attn.reshape(B, H * d), block["attn"]["wo"]), tp_axis)
        h2 = rms_norm(x, block["post_attn_norm"], config.layer_norm_eps)
        x = x + maybe_psum(_mlp(block, h2), tp_axis)

    x = rms_norm(x, params["norm_f"], config.layer_norm_eps)
    return _logits(params, x), pool


def decode_verify_forward(
    params: Params,
    config: ModelConfig,
    pool: KVPool,
    token_ids: jax.Array,    # [B, S1] — fed token + S drafts
    positions: jax.Array,    # [B, S1] — consecutive per row
    page_tables: jax.Array,  # [B, pages_per_seq_max]
    active: jax.Array,       # [B] bool
    *,
    interpret: bool = False,
    tp_axis: str | None = None,
):
    """Speculative-decoding verify: one weight stream scores S1 tokens per
    sequence (logits [B, S1, vocab] f32). KV for every fed token is written
    (cache-then-attend); rejected positions are overwritten by later
    steps."""
    from .common import paged_spec_attention

    B, S1 = token_ids.shape
    H, Hkv, d = config.num_heads, config.kv_heads, config.head_size
    cos, sin = rope_table(positions.reshape(-1), d, config.rope_theta)
    cos = cos.reshape(B, S1, 1, -1)
    sin = sin.reshape(B, S1, 1, -1)
    x = params["embed"][token_ids]                          # [B, S1, h]

    for i, block in enumerate(params["blocks"]):
        h1 = rms_norm(x, block["input_norm"], config.layer_norm_eps)
        q, k, v = _qkv(block, h1, H, Hkv, d)                # [B, S1, heads, d]
        q = apply_rope(q, cos, sin)
        k = apply_rope(k, cos, sin)

        attn, pool = paged_spec_attention(
            pool, i, q, k, v, positions, page_tables, active,
            num_kv_heads=Hkv, sliding_window=config.sliding_window,
            interpret=interpret)
        x = x + maybe_psum(
            linear(attn.reshape(B, S1, H * d), block["attn"]["wo"]),
            tp_axis)
        h2 = rms_norm(x, block["post_attn_norm"], config.layer_norm_eps)
        x = x + maybe_psum(_mlp(block, h2), tp_axis)

    x = rms_norm(x, params["norm_f"], config.layer_norm_eps)
    return _logits(params, x), pool
