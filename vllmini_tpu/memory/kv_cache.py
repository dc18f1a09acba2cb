"""Device-side paged KV pool.

Reference counterpart: the two global cache tensors in `KVCache`
(`/root/reference/vllmini/kv_cache.py:13-14`). TPU-first layout deltas (SURVEY.md §7):

- key layout `[num_layers, num_kv_heads, num_pages, page_size, head_dim]` with
  head_dim on the 128-lane axis — NOT the reference's CUDA 16-byte-LDG vectorized
  `[blocks, heads, head_size//8, block_size, 8]` layout;
- key and value share one layout (the reference needs two);
- layer is a leading dim of single arrays, so one page table serves all layers;
- optional int8/fp8 payload with per-token fp32 scales stored alongside
  (the north-star quantized cache; the reference's fp8 machinery is
  `quantization/fp8/**` + `convert_fp8`).

The pool is a pytree threaded through the jitted step functions with donation, so
in-place scatter updates never copy it.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp

from ..config import CacheConfig, ModelConfig


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class KVPool:
    """All KV state for one model, all layers, all sequences."""

    k_pages: jax.Array  # [L, H_kv, P, page_size, head_dim] kv_dtype
    v_pages: jax.Array
    k_scales: Optional[jax.Array]  # [L, H_kv, P, page_size] f32 | None
    v_scales: Optional[jax.Array]

    @property
    def num_layers(self) -> int:
        return self.k_pages.shape[0]

    @property
    def num_kv_heads(self) -> int:
        return self.k_pages.shape[1]

    @property
    def num_pages(self) -> int:
        return self.k_pages.shape[2]

    @property
    def page_size(self) -> int:
        return self.k_pages.shape[3]

    @property
    def head_dim(self) -> int:
        return self.k_pages.shape[4]

    @property
    def quantized(self) -> bool:
        return self.k_scales is not None

    def layer(self, i: int):
        """(k_pages, v_pages, k_scales, v_scales) views for layer i."""
        ks = self.k_scales[i] if self.k_scales is not None else None
        vs = self.v_scales[i] if self.v_scales is not None else None
        return self.k_pages[i], self.v_pages[i], ks, vs

    def bytes(self) -> int:
        total = self.k_pages.nbytes + self.v_pages.nbytes
        if self.k_scales is not None:
            total += self.k_scales.nbytes + self.v_scales.nbytes
        return total


def create_kv_pool(model: ModelConfig, cache: CacheConfig,
                   sharding=None) -> KVPool:
    """Allocate the zero-filled pool. ~`2 * L * H_kv * P * page_size * head_dim *
    itemsize` bytes (the reference's ≈49 MB GPT-2 pool, `SURVEY.md` §3.1)."""
    shape = (model.num_layers, model.kv_heads, cache.num_pages,
             cache.page_size, cache.padded_head_dim(model.head_size))
    dtype = cache.jnp_kv_dtype

    def _zeros(shape, dtype):
        if sharding is not None:
            return jax.device_put(jnp.zeros(shape, dtype), sharding)
        return jnp.zeros(shape, dtype)

    k_pages = _zeros(shape, dtype)
    v_pages = _zeros(shape, dtype)
    k_scales = v_scales = None
    if cache.quantized:
        k_scales = _zeros(shape[:-1], jnp.float32)
        v_scales = _zeros(shape[:-1], jnp.float32)
    return KVPool(k_pages, v_pages, k_scales, v_scales)
