"""Device-side paged KV pool.

Reference counterpart: the two global cache tensors in `KVCache`
(`/root/reference/vllmini/kv_cache.py:13-14`). TPU-first layout deltas (SURVEY.md §7):

- per-layer arrays `[num_kv_heads, num_pages, page_size, head_dim]` with
  head_dim on the 128-lane axis — NOT the reference's CUDA 16-byte-LDG
  vectorized `[blocks, heads, head_size//8, block_size, 8]` layout;
- key and value share one layout (the reference needs two);
- the pool is a LIST of per-layer arrays rather than one stacked
  `[layers, ...]` tensor: layer updates then swap a pytree leaf instead of a
  dynamic-update-slice through a multi-hundred-MB array (XLA cannot always
  elide that slice+writeback, and it costs a full layer copy per step);
- one page table per sequence serves all layers (same page index in every
  layer's array);
- optional int8/fp8 payload with per-token fp32 scales stored alongside
  (the north-star quantized cache; the reference's fp8 machinery is
  `quantization/fp8/**` + `convert_fp8`).

The pool is a pytree threaded through the jitted step functions with donation,
so in-place scatter updates never copy it.
"""

from __future__ import annotations

import dataclasses
from typing import List, Optional

import jax
import jax.numpy as jnp

from ..config import CacheConfig, ModelConfig


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class KVPool:
    """All KV state for one model, all layers, all sequences.

    Each list holds `num_layers` arrays of shape
    [num_kv_heads, num_pages, page_size/packing, packing*head_dim]
    (scales: [num_kv_heads, num_pages, page_size]).

    `packing` > 1 is the PACKED layout for head_dim < 128: `packing` adjacent
    tokens share one 128-lane row (token t of a page lives in row t//packing,
    lanes (t%packing)*head_dim ...). Byte-identical to the unpadded contiguous
    [page_size, head_dim] data, so it reads/writes at full DMA width with NO
    lane-padding waste — for GPT-2's 64-dim heads this halves KV bytes vs the
    pad-to-128 layout. packing == 1 is the plain (possibly lane-padded)
    layout.
    """

    k_pages: List[jax.Array]
    v_pages: List[jax.Array]
    k_scales: Optional[List[jax.Array]]
    v_scales: Optional[List[jax.Array]]
    packing: int = dataclasses.field(metadata=dict(static=True), default=1)

    @property
    def num_layers(self) -> int:
        return len(self.k_pages)

    @property
    def num_kv_heads(self) -> int:
        return self.k_pages[0].shape[0]

    @property
    def num_pages(self) -> int:
        return self.k_pages[0].shape[1]

    @property
    def page_size(self) -> int:
        return self.k_pages[0].shape[2] * self.packing

    @property
    def head_dim(self) -> int:
        """Logical per-token head dim (lane width / packing)."""
        return self.k_pages[0].shape[3] // self.packing

    @property
    def quantized(self) -> bool:
        return self.k_scales is not None

    def layer(self, i: int):
        """(k_pages, v_pages, k_scales, v_scales) for layer i."""
        ks = self.k_scales[i] if self.k_scales is not None else None
        vs = self.v_scales[i] if self.v_scales is not None else None
        return self.k_pages[i], self.v_pages[i], ks, vs

    def with_layer(self, i: int, k_pages, v_pages, k_scales=None,
                   v_scales=None) -> "KVPool":
        """Functional single-layer replacement (leaf swap, no array copy)."""
        k_list = list(self.k_pages)
        v_list = list(self.v_pages)
        k_list[i], v_list[i] = k_pages, v_pages
        ks_list, vs_list = self.k_scales, self.v_scales
        if k_scales is not None:
            ks_list = list(self.k_scales)
            vs_list = list(self.v_scales)
            ks_list[i], vs_list[i] = k_scales, v_scales
        return KVPool(k_list, v_list, ks_list, vs_list,
                      packing=self.packing)

    def bytes(self) -> int:
        total = sum(x.nbytes for x in self.k_pages)
        total += sum(x.nbytes for x in self.v_pages)
        if self.k_scales is not None:
            total += sum(x.nbytes for x in self.k_scales)
            total += sum(x.nbytes for x in self.v_scales)
        return total


def convert_pool(pool: KVPool, target_dtype) -> KVPool:
    """Cache-wide dtype conversion — the TPU analog of the reference's
    `convert_fp8` (`cache_kernels.cu:322-392`), both directions:

    - float pool -> int8/fp8 pool: per-token symmetric quantization, scales
      materialized alongside;
    - quantized pool -> float pool: dequantize with the stored scales and
      drop them.

    Used when changing serving precision on a warm cache (e.g. admitting a
    long-context burst by halving KV bytes without evicting anything).
    """
    import jax.numpy as _jnp

    target = _jnp.dtype(target_dtype)
    quant_targets = (_jnp.int8, _jnp.dtype("float8_e4m3fn"),
                     _jnp.dtype("float8_e5m2"))
    P = pool.packing

    def unpack(x):  # packed rows -> per-token rows [H, Pg, ps, d]
        if P == 1:
            return x
        H, Pg, rows, lanes = x.shape
        return x.reshape(H, Pg, rows * P, lanes // P)

    def repack(x):
        if P == 1:
            return x
        H, Pg, ps, d = x.shape
        return x.reshape(H, Pg, ps // P, d * P)

    def quantize(x):  # [H, Pg, ps, d] float -> (q, scale [H, Pg, ps])
        x = unpack(x)
        amax = _jnp.max(_jnp.abs(x.astype(_jnp.float32)), axis=-1)
        qmax = 127.0 if target == _jnp.int8 else float(
            _jnp.finfo(target).max)
        scale = _jnp.maximum(amax / qmax, 1e-8)
        q = x.astype(_jnp.float32) / scale[..., None]
        if target == _jnp.int8:
            q = _jnp.clip(_jnp.round(q), -qmax, qmax)
        return repack(q.astype(target)), scale.astype(_jnp.float32)

    def dequantize(x, s):
        y = unpack(x).astype(_jnp.float32) * s[..., None]
        return repack(y.astype(target))

    if target in quant_targets:
        if pool.quantized:  # re-quantize via fp32
            pool = convert_pool(pool, _jnp.float32)
        kq = [quantize(x) for x in pool.k_pages]
        vq = [quantize(x) for x in pool.v_pages]
        return KVPool(k_pages=[q for q, _ in kq], v_pages=[q for q, _ in vq],
                      k_scales=[s for _, s in kq],
                      v_scales=[s for _, s in vq], packing=P)
    if pool.quantized:
        return KVPool(
            k_pages=[dequantize(x, s) for x, s in zip(pool.k_pages,
                                                      pool.k_scales)],
            v_pages=[dequantize(x, s) for x, s in zip(pool.v_pages,
                                                      pool.v_scales)],
            k_scales=None, v_scales=None, packing=P)
    return KVPool(k_pages=[x.astype(target) for x in pool.k_pages],
                  v_pages=[x.astype(target) for x in pool.v_pages],
                  k_scales=None, v_scales=None, packing=P)


def create_kv_pool(model: ModelConfig, cache: CacheConfig,
                   sharding=None) -> KVPool:
    """Allocate the zero-filled pool: ~`2 * L * H_kv * P * page_size *
    padded_head_dim * itemsize` bytes (the reference's ≈49 MB GPT-2 pool,
    `SURVEY.md` §3.1, lane padding included).

    One extra physical page beyond `cache.num_pages` is allocated as the TRASH
    page: padding/inactive writes land there unconditionally, which lets the
    KV-write ops avoid `lax.cond` (a cond around a pool update forces XLA to
    copy the whole pool). The allocator never hands it out; its index equals
    the page-table padding sentinel (`cache.num_pages`).

    head_size < 128 with a compatible page_size selects the PACKED layout
    (see KVPool.packing): no lane padding, half the KV bytes for 64-dim
    heads."""
    packing = cache.packing_for(model.head_size)
    if packing > 1:
        shape = (model.kv_heads, cache.num_pages + 1,
                 cache.page_size // packing, packing * model.head_size)
    else:
        shape = (model.kv_heads, cache.num_pages + 1, cache.page_size,
                 cache.padded_head_dim(model.head_size))
    scale_shape = (model.kv_heads, cache.num_pages + 1, cache.page_size)
    dtype = cache.jnp_kv_dtype
    L = model.num_layers

    def _zeros(shape, dtype):
        x = jnp.zeros(shape, dtype)
        if sharding is not None:
            x = jax.device_put(x, sharding)
        return x

    k_pages = [_zeros(shape, dtype) for _ in range(L)]
    v_pages = [_zeros(shape, dtype) for _ in range(L)]
    k_scales = v_scales = None
    if cache.quantized:
        k_scales = [_zeros(scale_shape, jnp.float32) for _ in range(L)]
        v_scales = [_zeros(scale_shape, jnp.float32) for _ in range(L)]
    return KVPool(k_pages, v_pages, k_scales, v_scales, packing=packing)
