"""Device-side paged KV pool (token-major, K/V-interleaved layout).

Reference counterpart: the two global cache tensors in `KVCache`
(`/root/reference/vllmini/kv_cache.py:13-14`). TPU-first layout deltas (SURVEY.md §7):

- per-layer arrays `[num_pages, 2, page_size, row_width]` — plane 0 holds K,
  plane 1 holds V, and one page ROW is one token's K (or V) for ALL kv heads
  concatenated (`row_width = align(num_kv_heads * head_dim, 128)` per TP
  shard) — NOT the reference's CUDA 16-byte-LDG vectorized
  `[blocks, heads, head_size//8, block_size, 8]` layout. Interleaving K and V
  in one page makes a page gather ONE contiguous DMA descriptor covering
  both (decode attention is DMA-descriptor-issue bound, so descriptor count
  is the cost model); token-major rows make the decode-token write a single
  masked row select;
- the pool is a LIST of per-layer arrays rather than one stacked
  `[layers, ...]` tensor: layer updates then swap a pytree leaf instead of a
  dynamic-update-slice through a multi-hundred-MB array;
- one page table per sequence serves all layers (same page index in every
  layer's array);
- optional int8/fp8 payload with per-token-per-head fp32 scales stored
  alongside (`[num_pages, 2, num_kv_heads, page_size]` bf16, tokens on
  lanes) — the north-star
  quantized cache; the reference's fp8 machinery is `quantization/fp8/**` +
  `convert_fp8`.

The pool is a pytree threaded through the jitted step functions with donation,
so in-place updates never copy it.
"""

from __future__ import annotations

import dataclasses
from typing import List, Optional

import jax
import jax.numpy as jnp

from ..config import CacheConfig, ModelConfig


def align_row_width(num_kv_heads: int, head_dim: int, shards: int = 1) -> int:
    """Pool row width: per-TP-shard `(H/shards)*d` rounded up to the 128-lane
    tile, so every shard_map slice stays 128-aligned."""
    assert num_kv_heads % shards == 0
    per = (num_kv_heads // shards) * head_dim
    return shards * ((per + 127) // 128 * 128)


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class KVPool:
    """All KV state for one model, all layers, all sequences.

    `kv_pages` holds `num_layers` arrays of shape
    [num_pages, 2, page_size, row_width] (K plane 0, V plane 1);
    `kv_scales` (quantized pools) [num_pages, 2, num_kv_heads, page_size]
    bf16 (tokens on lanes — what the decode kernel consumes).
    `num_kv_heads`/`head_dim` are static pytree metadata: the row layout
    folds heads into lanes, so they are not derivable from shapes (row_width
    may carry per-shard alignment padding).
    """

    kv_pages: List[jax.Array]
    kv_scales: Optional[List[jax.Array]]
    num_kv_heads: int = dataclasses.field(
        metadata=dict(static=True), default=1)
    head_dim: int = dataclasses.field(metadata=dict(static=True), default=128)

    @property
    def num_layers(self) -> int:
        return len(self.kv_pages)

    @property
    def num_pages(self) -> int:
        return self.kv_pages[0].shape[0]

    @property
    def page_size(self) -> int:
        return self.kv_pages[0].shape[2]

    @property
    def row_width(self) -> int:
        return self.kv_pages[0].shape[3]

    @property
    def quantized(self) -> bool:
        return self.kv_scales is not None

    def layer(self, i: int):
        """(kv_pages, kv_scales) for layer i."""
        sc = self.kv_scales[i] if self.kv_scales is not None else None
        return self.kv_pages[i], sc

    def with_layer(self, i: int, kv_pages, kv_scales=None) -> "KVPool":
        """Functional single-layer replacement (leaf swap, no array copy)."""
        kv_list = list(self.kv_pages)
        kv_list[i] = kv_pages
        sc_list = self.kv_scales
        if kv_scales is not None:
            sc_list = list(self.kv_scales)
            sc_list[i] = kv_scales
        return KVPool(kv_list, sc_list, num_kv_heads=self.num_kv_heads,
                      head_dim=self.head_dim)

    def bytes(self) -> int:
        total = sum(x.nbytes for x in self.kv_pages)
        if self.kv_scales is not None:
            total += sum(x.nbytes for x in self.kv_scales)
        return total


def convert_pool(pool: KVPool, target_dtype) -> KVPool:
    """Cache-wide dtype conversion — the TPU analog of the reference's
    `convert_fp8` (`cache_kernels.cu:322-392`), both directions:

    - float pool -> int8/fp8 pool: per-token-per-head symmetric quantization,
      scales materialized alongside;
    - quantized pool -> float pool: dequantize with the stored scales and
      drop them.

    Used when changing serving precision on a warm cache (e.g. admitting a
    long-context burst by halving KV bytes without evicting anything).
    Requires an unsharded row layout (row_width == align(H*d)).
    """
    target = jnp.dtype(target_dtype)
    quant_targets = (jnp.int8, jnp.dtype("float8_e4m3fn"),
                     jnp.dtype("float8_e5m2"))
    H, d = pool.num_kv_heads, pool.head_dim

    def split_heads(x):  # [P, 2, ps, W] -> [P, 2, ps, H, d]
        return x[..., :H * d].reshape(x.shape[0], 2, x.shape[2], H, d)

    def merge_heads(x, W):  # [P, 2, ps, H, d] -> [P, 2, ps, W]
        P, _, ps = x.shape[0], x.shape[1], x.shape[2]
        flat = x.reshape(P, 2, ps, H * d)
        if W > H * d:
            flat = jnp.pad(flat, ((0, 0),) * 3 + ((0, W - H * d),))
        return flat

    def quantize(x):  # -> (q [P, 2, ps, W], scale [P, 2, H, ps])
        W = x.shape[3]
        xh = split_heads(x).astype(jnp.float32)
        amax = jnp.max(jnp.abs(xh), axis=-1)          # [P, 2, ps, H]
        qmax = 127.0 if target == jnp.int8 else float(jnp.finfo(target).max)
        # bf16-rounded scale FIRST so dequant-by-stored-scale is exact up to
        # payload rounding (matches `kv_write._quantize_tokens`).
        scale = jnp.maximum(amax / qmax, 1e-8).astype(jnp.bfloat16)
        q = xh / scale.astype(jnp.float32)[..., None]
        if target == jnp.int8:
            q = jnp.clip(jnp.round(q), -qmax, qmax)
        return (merge_heads(q, W).astype(target),
                scale.transpose(0, 1, 3, 2))          # [P, 2, H, ps]

    def dequantize(x, s):
        W = x.shape[3]
        y = (split_heads(x).astype(jnp.float32)
             * s.transpose(0, 1, 3, 2).astype(jnp.float32)[..., None])
        return merge_heads(y, W).astype(target)

    if target in quant_targets:
        if pool.quantized:  # re-quantize via fp32
            pool = convert_pool(pool, jnp.float32)
        kq = [quantize(x) for x in pool.kv_pages]
        return KVPool(kv_pages=[q for q, _ in kq],
                      kv_scales=[s for _, s in kq],
                      num_kv_heads=H, head_dim=d)
    if pool.quantized:
        return KVPool(
            kv_pages=[dequantize(x, s) for x, s in zip(pool.kv_pages,
                                                       pool.kv_scales)],
            kv_scales=None, num_kv_heads=H, head_dim=d)
    return KVPool(kv_pages=[x.astype(target) for x in pool.kv_pages],
                  kv_scales=None, num_kv_heads=H, head_dim=d)


def create_kv_pool(model: ModelConfig, cache: CacheConfig,
                   sharding=None, shards: int = 1) -> KVPool:
    """Allocate the zero-filled token-major interleaved pool: ~`2 * L *
    page_size * row_width * (num_pages+1) * itemsize` bytes (the reference's
    ≈49 MB GPT-2 pool, `SURVEY.md` §3.1).

    One extra physical page beyond `cache.num_pages` is allocated as the TRASH
    page: padding/inactive writes land there unconditionally, which lets the
    KV-write ops avoid `lax.cond` (a cond around a pool update forces XLA to
    copy the whole pool). The allocator never hands it out; its index equals
    the page-table padding sentinel (`cache.num_pages`).

    `shards` > 1 pads each TP shard's lane slice independently (see
    `align_row_width`).
    """
    W = align_row_width(model.kv_heads, model.head_size, shards)
    shape = (cache.num_pages + 1, 2, cache.page_size, W)
    # Scales live heads-on-sublanes x TOKENS-ON-LANES bf16 — the layout the
    # decode attention kernel consumes, so the per-step gather never lane-
    # transposes (and bf16 halves its traffic vs f32).
    scale_shape = (cache.num_pages + 1, 2, model.kv_heads, cache.page_size)
    dtype = cache.jnp_kv_dtype
    L = model.num_layers

    def _zeros(shape, dtype):
        x = jnp.zeros(shape, dtype)
        if sharding is not None:
            x = jax.device_put(x, sharding)
        return x

    kv_pages = [_zeros(shape, dtype) for _ in range(L)]
    kv_scales = None
    if cache.quantized:
        kv_scales = [_zeros(scale_shape, jnp.bfloat16) for _ in range(L)]
    return KVPool(kv_pages, kv_scales,
                  num_kv_heads=model.kv_heads, head_dim=model.head_size)
