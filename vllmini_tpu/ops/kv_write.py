"""KV-cache scatter ops (TPU equivalents of `reshape_and_cache`).

Reference counterpart: the slot-mapping scatter kernel
(`/root/reference/paged_attention_ext/paged_attention_cuda/cache_kernels.cu:153-207`),
which writes per-token K/V into the paged pools at `slot_mapping[token]` and skips
negative slots (padding). Here the same contract is expressed as XLA scatters with
out-of-bounds drop semantics:

- positions are (page, offset) pairs derived from a *shared* page table (one table per
  sequence, all layers — SURVEY.md §7 design delta vs the reference's per-layer
  tables, `vllmini/kv_cache.py:19`),
- padding tokens map to an out-of-range page index and are dropped by the scatter
  (`mode="drop"`), the analog of `slot_idx < 0 -> return` at `cache_kernels.cu:166-169`,
- when the cache is int8/fp8-quantized, per-token scales are computed on the fly and
  scattered alongside (the reference's fused fp8 store path, `cache_kernels.cu:199-205`).

The scatter updates alias their cache operands; under `jax.jit` with donated cache
buffers XLA performs them in place, so no copy of the multi-MB pool happens per step.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp


def _pad_head(x: jax.Array, pages: jax.Array) -> jax.Array:
    """Zero-pad the trailing head_dim of new K/V to the pool's (lane-padded)
    head_dim. Zeros contribute nothing to QK dots and are never read back."""
    pad = pages.shape[-1] - x.shape[-1]
    if pad == 0:
        return x
    widths = [(0, 0)] * (x.ndim - 1) + [(0, pad)]
    return jnp.pad(x, widths)


def _quantize_tokens(x: jax.Array, dtype) -> Tuple[jax.Array, jax.Array]:
    """Per-token symmetric quantization along the last (head_dim) axis.

    x: [..., head_dim] float -> (q: [..., head_dim] `dtype`, scale: [...] f32)
    """
    amax = jnp.max(jnp.abs(x.astype(jnp.float32)), axis=-1)
    if dtype == jnp.int8:
        qmax = 127.0
    else:  # fp8 variants
        qmax = float(jnp.finfo(dtype).max)
    scale = jnp.maximum(amax / qmax, 1e-8)
    q = x.astype(jnp.float32) / scale[..., None]
    if dtype == jnp.int8:
        q = jnp.clip(jnp.round(q), -qmax, qmax)
    return q.astype(dtype), scale.astype(jnp.float32)


def write_kv_decode(
    k_pages: jax.Array,        # [num_kv_heads, num_pages, page_size, head_dim]
    v_pages: jax.Array,
    k_new: jax.Array,          # [batch, num_kv_heads, head_dim] (one token/seq)
    v_new: jax.Array,
    positions: jax.Array,      # [batch] int32 — token position (0-based)
    page_tables: jax.Array,    # [batch, pages_per_seq_max] int32
    active: jax.Array,         # [batch] bool — False rows are dropped
    k_scales: Optional[jax.Array] = None,  # [num_kv_heads, num_pages, page_size]
    v_scales: Optional[jax.Array] = None,
):
    """Scatter one new token per sequence into the paged KV pool.

    Returns (k_pages, v_pages) or (k_pages, v_pages, k_scales, v_scales).
    """
    batch = k_new.shape[0]
    num_pages, page_size = k_pages.shape[1], k_pages.shape[2]
    k_new, v_new = _pad_head(k_new, k_pages), _pad_head(v_new, v_pages)

    logical_page = positions // page_size
    offset = positions % page_size
    page_idx = jnp.take_along_axis(
        page_tables, logical_page[:, None], axis=1
    )[:, 0]
    # Inactive rows -> OOB page index -> dropped by the scatter.
    page_idx = jnp.where(active, page_idx, num_pages)

    kv_dtype = k_pages.dtype
    if k_scales is not None:
        k_q, k_s = _quantize_tokens(k_new, kv_dtype)   # [b,h,d], [b,h]
        v_q, v_s = _quantize_tokens(v_new, kv_dtype)
        k_scales = k_scales.at[:, page_idx, offset].set(
            k_s.T, mode="drop")
        v_scales = v_scales.at[:, page_idx, offset].set(
            v_s.T, mode="drop")
        k_src, v_src = k_q, v_q
    else:
        k_src, v_src = k_new.astype(kv_dtype), v_new.astype(kv_dtype)

    # [num_kv_heads, batch, head_dim] scattered at (:, page_idx[b], offset[b], :)
    k_pages = k_pages.at[:, page_idx, offset, :].set(
        k_src.transpose(1, 0, 2), mode="drop")
    v_pages = v_pages.at[:, page_idx, offset, :].set(
        v_src.transpose(1, 0, 2), mode="drop")

    if k_scales is not None:
        return k_pages, v_pages, k_scales, v_scales
    return k_pages, v_pages


def write_kv_prefill(
    k_pages: jax.Array,       # [num_kv_heads, num_pages, page_size, head_dim]
    v_pages: jax.Array,
    k_new: jax.Array,         # [seq_len_padded, num_kv_heads, head_dim]
    v_new: jax.Array,
    page_table: jax.Array,    # [pages_per_seq_max] int32 (one sequence)
    seq_len: jax.Array,       # scalar int32 — true prompt length (<= padded)
    start_pos: jax.Array | int = 0,  # first token's absolute position
    k_scales: Optional[jax.Array] = None,
    v_scales: Optional[jax.Array] = None,
):
    """Scatter a whole (padded) prompt's K/V into the pool for one sequence.

    Tokens at index >= seq_len are padding and are dropped. Unlike the reference
    (`vllmini/kv_cache.py:35` overflows a single block for prompts > 16 tokens —
    SURVEY.md "bugs"), positions map through the page table, so any prompt up to
    max_pages_per_seq * page_size lands in its own pages.
    """
    L = k_new.shape[0]
    num_pages, page_size = k_pages.shape[1], k_pages.shape[2]
    k_new, v_new = _pad_head(k_new, k_pages), _pad_head(v_new, v_pages)

    positions = start_pos + jnp.arange(L, dtype=jnp.int32)
    logical_page = positions // page_size
    offset = positions % page_size
    valid = jnp.arange(L) < seq_len
    # Clamp the table lookup (logical_page may run past the table for padding),
    # then invalidate padding rows via OOB.
    logical_page = jnp.minimum(logical_page, page_table.shape[0] - 1)
    page_idx = jnp.where(valid, page_table[logical_page], num_pages)

    kv_dtype = k_pages.dtype
    if k_scales is not None:
        k_q, k_s = _quantize_tokens(k_new, kv_dtype)   # [L,h,d],[L,h]
        v_q, v_s = _quantize_tokens(v_new, kv_dtype)
        k_scales = k_scales.at[:, page_idx, offset].set(k_s.T, mode="drop")
        v_scales = v_scales.at[:, page_idx, offset].set(v_s.T, mode="drop")
        k_src, v_src = k_q, v_q
    else:
        k_src, v_src = k_new.astype(kv_dtype), v_new.astype(kv_dtype)

    k_pages = k_pages.at[:, page_idx, offset, :].set(
        k_src.transpose(1, 0, 2), mode="drop")
    v_pages = v_pages.at[:, page_idx, offset, :].set(
        v_src.transpose(1, 0, 2), mode="drop")

    if k_scales is not None:
        return k_pages, v_pages, k_scales, v_scales
    return k_pages, v_pages


def copy_pages(
    pages: jax.Array,        # [num_kv_heads, num_pages, page_size, head_dim]
    src_indices: jax.Array,  # [n] int32
    dst_indices: jax.Array,  # [n] int32 (OOB index -> no-op row)
) -> jax.Array:
    """Batched page duplication (copy-on-write / beam forking).

    TPU equivalent of `copy_blocks` (`cache_kernels.cu:69-148`). With the layer
    dimension folded into the pool arrays, one call covers all layers.
    """
    src = pages[:, src_indices]
    return pages.at[:, dst_indices].set(src, mode="drop")


def gather_pages(pages: jax.Array, indices: jax.Array) -> jax.Array:
    """Gather pages into a dense [num_kv_heads, n, page_size, head_dim] array.

    Used for swap-out (device -> host): the TPU analog of `swap_blocks`
    (`cache_kernels.cu:24-63`) — the caller `jax.device_get`s the result.
    """
    return pages[:, indices]


def scatter_pages(pages: jax.Array, indices: jax.Array,
                  values: jax.Array) -> jax.Array:
    """Inverse of gather_pages: swap-in (host -> device) landing."""
    return pages.at[:, indices].set(values, mode="drop")
