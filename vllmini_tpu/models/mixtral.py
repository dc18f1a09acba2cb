"""Mixtral-family model: Llama attention + sparse Mixture-of-Experts MLP.

Capability extension beyond the reference (GPT-2 only, `vllmini/server.py:34`).
The attention path (RoPE, GQA, paged KV, fused decode write) is shared with
`llama.py`; the MLP is a top-k-routed MoE, expressed TPU-first:

- the router picks top-k experts per token (softmax over the selected
  logits, Mixtral convention);
- dispatch/combine are dense one-hot einsums with capacity = T (every token
  always served — inference must not drop tokens; the dispatch einsum is a
  few percent of the expert FLOPs);
- expert weights are STACKED arrays [E, h, m] so all local experts run as
  one batched einsum on the MXU, not a Python loop;
- EXPERT PARALLELISM rides the same mesh axis as tensor parallelism: expert
  arrays are sharded on their E axis, each shard computes only its local
  experts' partial sums, and the block's existing down-proj `psum` combines
  them — EP needs zero extra collectives (`jax.lax.axis_index` supplies the
  shard's expert offset inside shard_map).
"""

from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp

from ..config import ModelConfig
from ..memory.kv_cache import KVPool
from ..ops.flash_attention import flash_attention_prefill
from ..ops.kv_write import write_kv_prefill
from .common import (apply_rope, linear, maybe_psum,
                     paged_decode_attention, rms_norm, rope_table)
from .llama import _qkv
from .gpt2 import _gather_prefix_kv, _update_pool_layer

Params = Dict[str, Any]


def init_params(config: ModelConfig, key: jax.Array) -> Params:
    dt = config.jnp_dtype
    h, L, m = config.hidden_size, config.num_layers, config.mlp_size
    d, H, Hkv = config.head_size, config.num_heads, config.kv_heads
    E = config.num_experts
    keys = jax.random.split(key, 2 + 9 * L)
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
        ks = keys[2 + 9 * i: 11 + 9 * i]
        params["blocks"].append({
            "input_norm": jnp.ones(h, dt),
            "post_attn_norm": jnp.ones(h, dt),
            "attn": {
                "wq": norm(ks[0], (h, H * d)),
                "wk": norm(ks[1], (h, Hkv * d)),
                "wv": norm(ks[2], (h, Hkv * d)),
                "wo": norm(ks[3], (H * d, h)),
            },
            "moe": {
                "router": norm(ks[4], (h, E)),
                "w_gate": norm(ks[5], (E, h, m)),
                "w_up": norm(ks[6], (E, h, m)),
                "w_down": norm(ks[7], (E, m, h)),
            },
        })
    return params


def _moe(block: Params, x: jax.Array, config: ModelConfig,
         tp_axis: str | None) -> jax.Array:
    """Top-k routed MoE over stacked local experts. x: [T, h] -> [T, h]
    (PARTIAL sum under EP — the caller's psum completes it)."""
    T, h = x.shape
    moe = block["moe"]
    E_local = moe["w_gate"].shape[0]  # experts on THIS shard
    k = config.num_experts_per_tok

    # Routing is computed on the GLOBAL expert space (router is replicated).
    logits = jnp.dot(x, moe["router"],
                     preferred_element_type=jnp.float32)       # [T, E]
    top_vals, top_idx = jax.lax.top_k(logits, k)               # [T, k]
    top_w = jax.nn.softmax(top_vals, axis=-1)                  # Mixtral norm

    # This shard's expert-id window under EP.
    if tp_axis is not None:
        offset = jax.lax.axis_index(tp_axis) * E_local
    else:
        offset = 0
    local_idx = top_idx - offset                               # [T, k]

    # Dense dispatch: combine weight of token t for LOCAL expert e.
    onehot = jax.nn.one_hot(local_idx, E_local,
                            dtype=jnp.float32)                 # [T, k, El]
    combine = jnp.einsum("tk,tke->te", top_w, onehot)          # [T, El]

    # Gather every token into every local expert (capacity = T: no drops),
    # run the experts batched, combine with routing weights. Tokens not
    # routed to a local expert contribute zero via `combine`.
    xf = x.astype(jnp.float32)
    gate = jnp.einsum("th,ehm->etm", xf,
                      moe["w_gate"].astype(jnp.float32))
    up = jnp.einsum("th,ehm->etm", xf, moe["w_up"].astype(jnp.float32))
    act = jax.nn.silu(gate) * up                               # [El, T, m]
    out = jnp.einsum("etm,emh->eth", act,
                     moe["w_down"].astype(jnp.float32))        # [El, T, h]
    y = jnp.einsum("te,eth->th", combine, out)                 # [T, h]
    return y.astype(x.dtype)


def prefill_forward(
    params: Params,
    config: ModelConfig,
    pool: KVPool,
    token_ids: jax.Array,
    seq_len: jax.Array,
    page_table: jax.Array,
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
    cos, sin = rope_table(positions, d, config.rope_theta)
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
        x = x + maybe_psum(_moe(block, h2, config, tp_axis), tp_axis)

    x = rms_norm(x, params["norm_f"], config.layer_norm_eps)
    from .llama import _logits
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
    """Burst prefill (see `llama.prefill_batch_forward`); the MoE runs on
    the flattened [B*L] token axis — routing is per-token, so batching is
    free."""
    from ..ops.flash_attention import flash_attention_prefill_batch
    from ..ops.kv_write import write_kv_prefill_batch

    B, L_pad = token_ids.shape
    H, Hkv, d = config.num_heads, config.kv_heads, config.head_size
    positions = jnp.arange(L_pad, dtype=jnp.int32)
    cos, sin = rope_table(positions, d, config.rope_theta)
    x = params["embed"][token_ids]                          # [B, L, h]

    for i, block in enumerate(params["blocks"]):
        h1 = rms_norm(x, block["input_norm"], config.layer_norm_eps)
        q, k, v = _qkv(block, h1, H, Hkv, d)
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
        moe_out = _moe(block, h2.reshape(B * L_pad, -1), config,
                       tp_axis).reshape(B, L_pad, -1)
        x = x + maybe_psum(moe_out, tp_axis)

    x = rms_norm(x, params["norm_f"], config.layer_norm_eps)
    from .llama import _logits
    last = x[jnp.arange(B), jnp.maximum(seq_lens - 1, 0)]   # [B, h]
    return _logits(params, last), pool


def decode_forward(
    params: Params,
    config: ModelConfig,
    pool: KVPool,
    token_ids: jax.Array,
    positions: jax.Array,
    seq_lens: jax.Array,
    page_tables: jax.Array,
    active: jax.Array,
    *,
    interpret: bool = False,
    tp_axis: str | None = None,
    kv_partitions: int = 1,
):
    B = token_ids.shape[0]
    H, Hkv, d = config.num_heads, config.kv_heads, config.head_size
    cos, sin = rope_table(positions, d, config.rope_theta)
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
        x = x + maybe_psum(_moe(block, h2, config, tp_axis), tp_axis)

    x = rms_norm(x, params["norm_f"], config.layer_norm_eps)
    from .llama import _logits
    return _logits(params, x), pool


def decode_verify_forward(
    params: Params,
    config: ModelConfig,
    pool: KVPool,
    token_ids: jax.Array,    # [B, S1]
    positions: jax.Array,    # [B, S1]
    page_tables: jax.Array,  # [B, pages_per_seq_max]
    active: jax.Array,       # [B] bool
    *,
    interpret: bool = False,
    tp_axis: str | None = None,
):
    """Speculative-decoding verify (see llama.decode_verify_forward);
    the MoE routes on the flattened [B*S1] token axis."""
    from .common import paged_spec_attention

    B, S1 = token_ids.shape
    H, Hkv, d = config.num_heads, config.kv_heads, config.head_size
    cos, sin = rope_table(positions.reshape(-1), d, config.rope_theta)
    cos = cos.reshape(B, S1, 1, -1)
    sin = sin.reshape(B, S1, 1, -1)
    x = params["embed"][token_ids]

    for i, block in enumerate(params["blocks"]):
        h1 = rms_norm(x, block["input_norm"], config.layer_norm_eps)
        q, k, v = _qkv(block, h1, H, Hkv, d)
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
        moe_out = _moe(block, h2.reshape(B * S1, -1), config,
                       tp_axis).reshape(B, S1, -1)
        x = x + maybe_psum(moe_out, tp_axis)

    x = rms_norm(x, params["norm_f"], config.layer_norm_eps)
    from .llama import _logits
    return _logits(params, x), pool
