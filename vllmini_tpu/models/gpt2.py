"""GPT-2 with paged KV cache (JAX functional).

Reference counterpart: `/root/reference/vllmini/model/gpt2.py` (from-scratch GPT-2
whose attention always scatters K/V into the paged cache and uses masked dense
attention for prefill, the paged kernel for decode — `gpt2.py:43-63`). Differences
(deliberate, SURVEY.md §7):

- functional params pytree + pure forward functions, jit-compiled once per shape
  bucket (the reference allocates fresh CUDA tensors per token);
- prefill uses the flash kernel (no O(L^2) mask tensor, cf. the reference's
  `generate_triangular_mask`);
- decode runs a fixed-shape BATCH of sequences in one forward (the reference is
  strictly batch-1, `scheduler.py:78-98`);
- `seq_lens` passed to decode attention INCLUDE the current token, fixing the
  reference's off-by-one (`scheduler.py:96` — a token never attends to itself).

Weight names/layout follow HF GPT-2 (Conv1D weights already transposed to
[in, out] by the loader, cf. `gpt2.py:316-317`).
"""

from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp

from ..config import ModelConfig
from ..memory.kv_cache import KVPool
from ..ops.flash_attention import flash_attention_prefill
from ..ops.kv_write import write_kv_prefill
from .common import (layer_norm, linear, maybe_psum,
                     paged_decode_attention)

Params = Dict[str, Any]


def init_params(config: ModelConfig, key: jax.Array) -> Params:
    """Random init (tests / benchmarks without HF weights)."""
    dt = config.jnp_dtype
    h, L = config.hidden_size, config.num_layers
    m = config.mlp_size
    keys = jax.random.split(key, 2 + 4 * L)
    std = 0.02

    def norm(k, shape):
        return (jax.random.normal(k, shape) * std).astype(dt)

    params: Params = {
        "wte": norm(keys[0], (config.vocab_size, h)),
        "wpe": norm(keys[1], (config.max_position_embeddings, h)),
        "ln_f": {"g": jnp.ones(h, dt), "b": jnp.zeros(h, dt)},
        "blocks": [],
    }
    for i in range(L):
        k0, k1, k2, k3 = keys[2 + 4 * i: 6 + 4 * i]
        params["blocks"].append({
            "ln_1": {"g": jnp.ones(h, dt), "b": jnp.zeros(h, dt)},
            "attn": {
                "c_attn_w": norm(k0, (h, 3 * h)),
                "c_attn_b": jnp.zeros(3 * h, dt),
                "c_proj_w": norm(k1, (h, h)),
                "c_proj_b": jnp.zeros(h, dt),
            },
            "ln_2": {"g": jnp.ones(h, dt), "b": jnp.zeros(h, dt)},
            "mlp": {
                "c_fc_w": norm(k2, (h, m)),
                "c_fc_b": jnp.zeros(m, dt),
                "c_proj_w": norm(k3, (m, h)),
                "c_proj_b": jnp.zeros(h, dt),
            },
        })
    return params


def _update_pool_layer(pool: KVPool, i: int, kv_pages,
                       kv_scales) -> KVPool:
    return pool.with_layer(i, kv_pages, kv_scales)




def _gather_prefix_kv(pool: KVPool, layer: int, page_table: jax.Array,
                      prefix_tokens: int, dtype, H: int, d: int):
    """Dense [prefix_tokens, H, d] K and V for chunked prefill: the chunk's
    queries attend over the pool-resident prefix (written by earlier chunks).
    `prefix_tokens` is STATIC and page-aligned (the engine chunks on page
    boundaries), so shapes stay fixed per (bucket, prefix) pair. `H` is the
    LOCAL kv-head count (under shard_map each TP shard gathers its own
    lane slice)."""
    kv, sc = pool.layer(layer)
    ps = kv.shape[2]
    n = prefix_tokens // ps
    pages = jnp.clip(page_table[:n], 0, kv.shape[0] - 1)
    g = kv[pages]                                   # [n, 2, ps, W]
    x = g[..., :H * d].reshape(n, 2, ps, H, d)
    if sc is not None:
        scales = sc[pages]                          # [n, 2, H, ps]
        x = (x.astype(jnp.float32)
             * scales.transpose(0, 1, 3, 2).astype(jnp.float32)[..., None])
    k = x[:, 0].reshape(n * ps, H, d).astype(dtype)
    v = x[:, 1].reshape(n * ps, H, d).astype(dtype)
    return k, v


def _split_qkv(qkv: jax.Array, num_heads: int, num_kv_heads: int,
               head_dim: int):
    """[..., h + 2*kv_h*d] -> q [..., H, d], k/v [..., Hkv, d] (any leading
    shape: decode [B, ...], prefill [L, ...], burst prefill [B, L, ...])."""
    lead = qkv.shape[:-1]
    q_size = num_heads * head_dim
    kv_size = num_kv_heads * head_dim
    q = qkv[..., :q_size].reshape(*lead, num_heads, head_dim)
    k = qkv[..., q_size:q_size + kv_size].reshape(*lead, num_kv_heads,
                                                  head_dim)
    v = qkv[..., q_size + kv_size:].reshape(*lead, num_kv_heads, head_dim)
    return q, k, v


def _mlp(block: Params, x: jax.Array) -> jax.Array:
    h = linear(x, block["mlp"]["c_fc_w"], block["mlp"]["c_fc_b"])
    h = jax.nn.gelu(h, approximate=True)  # HF gelu_new
    return linear(h, block["mlp"]["c_proj_w"], block["mlp"]["c_proj_b"])


def untie_lm_head(params: Params, pad_to: int = 128) -> Params:
    """Split the tied wte head into an explicit `lm_head` [h, vocab_padded]
    so `quantize_params` can quantize it (the logits matmul streams the
    whole table every step — 77 MB/step at bf16 for GPT-2's 50k vocab —
    while the embedding GATHER reads only a few rows and stays bf16).
    The vocab dim is zero-padded to a lane multiple so the fused dequant
    kernel applies (`quantized_matmul` falls back to full dequant on ragged
    N); `_logits` slices the pad back off before sampling."""
    if params.get("lm_head") is not None:
        return params
    head = params["wte"].T  # [h, vocab]
    pad = (-head.shape[1]) % pad_to
    if pad:
        head = jnp.pad(head, ((0, 0), (0, pad)))
    return {**params, "lm_head": head}


def _logits(params: Params, x: jax.Array) -> jax.Array:
    """Final projection; supports the tied wte head (reference behavior,
    `vllmini/model/gpt2.py` lm_head=wte) and an untied — possibly
    quantized, possibly vocab-padded — `lm_head` (see `untie_lm_head`)."""
    vocab = params["wte"].shape[0]
    lm = params.get("lm_head")
    if lm is not None:
        from .common import QuantizedWeight
        if isinstance(lm, QuantizedWeight):
            from ..ops.quant_matmul import quantized_matmul
            y = quantized_matmul(x, lm, out_dtype=jnp.float32)
        else:
            y = jnp.dot(x, lm, preferred_element_type=jnp.float32)
        return y[..., :vocab]
    return jnp.dot(x, params["wte"].T, preferred_element_type=jnp.float32)


def prefill_forward(
    params: Params,
    config: ModelConfig,
    pool: KVPool,
    token_ids: jax.Array,   # [L_pad] int32
    seq_len: jax.Array,     # scalar int32 true length
    page_table: jax.Array,  # [pages_per_seq_max] int32
    start_pos: int | jax.Array = 0,
    *,
    interpret: bool = False,
    tp_axis: str | None = None,
    return_all_logits: bool = False,
):
    """Run one sequence's (padded) prompt; returns (logits, pool).

    logits is the last token's [vocab] row, or [L_pad, vocab] when
    `return_all_logits` (used by the PPL harness). `pool=None` skips KV cache
    writes entirely (pure scoring mode)."""
    L_pad = token_ids.shape[0]
    prefix_tokens = int(start_pos) if isinstance(start_pos, int) else 0
    assert prefix_tokens == 0 or pool is not None, \
        "chunked prefill needs the pool for its prefix"
    H, Hkv, d = config.num_heads, config.kv_heads, config.head_size
    positions = start_pos + jnp.arange(L_pad, dtype=jnp.int32)
    # Clamp padding positions into range for the wpe lookup.
    safe_pos = jnp.minimum(positions, config.max_position_embeddings - 1)
    x = params["wte"][token_ids] + params["wpe"][safe_pos]  # [L, h]

    for i, block in enumerate(params["blocks"]):
        h1 = layer_norm(x, block["ln_1"]["g"], block["ln_1"]["b"],
                        config.layer_norm_eps)
        qkv = linear(h1, block["attn"]["c_attn_w"], block["attn"]["c_attn_b"])
        q, k, v = _split_qkv(qkv, H, Hkv, d)

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
            q_offset=prefix_tokens, causal=True, interpret=interpret,
        ).transpose(1, 0, 2).reshape(L_pad, H * d)
        x = x + maybe_psum(
            linear(attn, block["attn"]["c_proj_w"],
                   block["attn"]["c_proj_b"]), tp_axis)

        h2 = layer_norm(x, block["ln_2"]["g"], block["ln_2"]["b"],
                        config.layer_norm_eps)
        x = x + maybe_psum(_mlp(block, h2), tp_axis)

    x = layer_norm(x, params["ln_f"]["g"], params["ln_f"]["b"],
                   config.layer_norm_eps)
    if return_all_logits:
        logits = _logits(params, x)
    else:
        logits = _logits(params, x[seq_len - 1])
    return logits, pool


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
    Rows with seq_len 0 are inactive (KV lands on the trash page, logits are
    garbage — the engine masks their slot inserts)."""
    from ..ops.flash_attention import flash_attention_prefill_batch
    from ..ops.kv_write import write_kv_prefill_batch

    B, L_pad = token_ids.shape
    H, Hkv, d = config.num_heads, config.kv_heads, config.head_size
    positions = jnp.arange(L_pad, dtype=jnp.int32)
    safe_pos = jnp.minimum(positions, config.max_position_embeddings - 1)
    x = params["wte"][token_ids] + params["wpe"][safe_pos]  # [B, L, h]

    for i, block in enumerate(params["blocks"]):
        h1 = layer_norm(x, block["ln_1"]["g"], block["ln_1"]["b"],
                        config.layer_norm_eps)
        qkv = linear(h1, block["attn"]["c_attn_w"], block["attn"]["c_attn_b"])
        q, k, v = _split_qkv(qkv, H, Hkv, d)                # [B, L, heads, d]

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
            interpret=interpret,
        ).transpose(0, 2, 1, 3).reshape(B, L_pad, H * d)
        x = x + maybe_psum(
            linear(attn, block["attn"]["c_proj_w"],
                   block["attn"]["c_proj_b"]), tp_axis)

        h2 = layer_norm(x, block["ln_2"]["g"], block["ln_2"]["b"],
                        config.layer_norm_eps)
        x = x + maybe_psum(_mlp(block, h2), tp_axis)

    x = layer_norm(x, params["ln_f"]["g"], params["ln_f"]["b"],
                   config.layer_norm_eps)
    last = x[jnp.arange(B), jnp.maximum(seq_lens - 1, 0)]   # [B, h]
    return _logits(params, last), pool


def decode_forward(
    params: Params,
    config: ModelConfig,
    pool: KVPool,
    token_ids: jax.Array,    # [B] int32 — current token per slot
    positions: jax.Array,    # [B] int32 — its absolute position
    seq_lens: jax.Array,     # [B] int32 — length INCLUDING current token
    page_tables: jax.Array,  # [B, pages_per_seq_max] int32
    active: jax.Array,       # [B] bool
    *,
    interpret: bool = False,
    tp_axis: str | None = None,
    kv_partitions: int = 1,
):
    """One batched decode step; returns (logits [B, vocab] f32, pool)."""
    B = token_ids.shape[0]
    H, Hkv, d = config.num_heads, config.kv_heads, config.head_size
    safe_pos = jnp.clip(positions, 0, config.max_position_embeddings - 1)
    x = params["wte"][token_ids] + params["wpe"][safe_pos]  # [B, h]

    for i, block in enumerate(params["blocks"]):
        h1 = layer_norm(x, block["ln_1"]["g"], block["ln_1"]["b"],
                        config.layer_norm_eps)
        qkv = linear(h1, block["attn"]["c_attn_w"], block["attn"]["c_attn_b"])
        q, k, v = _split_qkv(qkv, H, Hkv, d)  # [B,H,d], [B,Hkv,d]

        # The current token's KV write is FUSED into the attention kernel
        # (one launch per layer) on the hot path; kv_partitions > 1 takes
        # the write-then-partitioned-attend path (see common.py).
        attn, pool = paged_decode_attention(
            pool, i, q, k, v, positions, seq_lens, page_tables, active,
            num_kv_heads=Hkv, kv_partitions=kv_partitions,
            interpret=interpret)
        x = x + maybe_psum(
            linear(attn.reshape(B, H * d), block["attn"]["c_proj_w"],
                   block["attn"]["c_proj_b"]), tp_axis)

        h2 = layer_norm(x, block["ln_2"]["g"], block["ln_2"]["b"],
                        config.layer_norm_eps)
        x = x + maybe_psum(_mlp(block, h2), tp_axis)

    x = layer_norm(x, params["ln_f"]["g"], params["ln_f"]["b"],
                   config.layer_norm_eps)
    logits = _logits(params, x)
    return logits, pool


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
    """Speculative-decoding verify (see llama.decode_verify_forward)."""
    from .common import paged_spec_attention

    B, S1 = token_ids.shape
    H, Hkv, d = config.num_heads, config.kv_heads, config.head_size
    safe_pos = jnp.clip(positions, 0, config.max_position_embeddings - 1)
    x = params["wte"][token_ids] + params["wpe"][safe_pos]  # [B, S1, h]

    for i, block in enumerate(params["blocks"]):
        h1 = layer_norm(x, block["ln_1"]["g"], block["ln_1"]["b"],
                        config.layer_norm_eps)
        qkv = linear(h1, block["attn"]["c_attn_w"], block["attn"]["c_attn_b"])
        q, k, v = _split_qkv(qkv, H, Hkv, d)                # [B, S1, heads, d]

        attn, pool = paged_spec_attention(
            pool, i, q, k, v, positions, page_tables, active,
            num_kv_heads=Hkv, interpret=interpret)
        x = x + maybe_psum(
            linear(attn.reshape(B, S1, H * d), block["attn"]["c_proj_w"],
                   block["attn"]["c_proj_b"]), tp_axis)
        h2 = layer_norm(x, block["ln_2"]["g"], block["ln_2"]["b"],
                        config.layer_norm_eps)
        x = x + maybe_psum(_mlp(block, h2), tp_axis)

    x = layer_norm(x, params["ln_f"]["g"], params["ln_f"]["b"],
                   config.layer_norm_eps)
    return _logits(params, x), pool
