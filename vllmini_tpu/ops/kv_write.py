"""KV-cache write ops for the token-major pool (TPU `reshape_and_cache`).

Reference counterpart: the slot-mapping scatter kernel
(`/root/reference/paged_attention_ext/paged_attention_cuda/cache_kernels.cu:153-207`),
which writes per-token K/V into the paged pools at `slot_mapping[token]` and skips
negative slots (padding). In the token-major layout (`memory/kv_cache.py`) one
token is ONE contiguous pool row `[row_width]`, so:

- the batched decode write is a single-launch Pallas kernel that pulls each
  slot's current page whole (ONE contiguous DMA descriptor), patches the
  token's row with a masked select, and pushes it back (Mosaic DMA slices
  must be sublane-tile aligned, so a bare row store is not expressible);
  the serving hot path instead fuses this into the attention kernel
  (`paged_attention(..., k_new=, v_new=)`);
- the prefill write is one whole-page `dynamic_update_slice` per prompt page;
- padding tokens land on the pool's TRASH page (the analog of
  `slot_idx < 0 -> return` at `cache_kernels.cu:166-169`) so no `lax.cond`
  ever wraps a pool update (XLA would copy the pool);
- when the cache is int8/fp8-quantized, per-token-per-head scales are computed
  on the fly and scattered into the token-major scale pools (the reference's
  fused fp8 store path, `cache_kernels.cu:199-205`).

All updates alias their cache operands; under `jax.jit` with donated cache
buffers XLA performs them in place.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _quantize_tokens(x: jax.Array, dtype) -> Tuple[jax.Array, jax.Array]:
    """Per-token-per-head symmetric quantization along the last axis.

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


def widen_rows(x: jax.Array, row_width: int) -> jax.Array:
    """[B, H, d] -> [B, 1, row_width]: one pool row per token."""
    B = x.shape[0]
    flat = x.reshape(B, 1, -1)
    if flat.shape[-1] < row_width:
        flat = jnp.pad(flat, ((0, 0), (0, 0),
                              (0, row_width - flat.shape[-1])))
    return flat


def _decode_write_kernel(page_idx_ref, offset_ref, k_new, v_new,
                         k_in, v_in, k_out, v_out, k_buf, v_buf, sem,
                         *, batch: int):
    """Read-modify-write each slot's current page in one kernel launch.

    Mosaic DMA slices must be sublane-tile aligned, so a single token row
    cannot be stored directly; each page is pulled whole into VMEM (ONE
    contiguous descriptor in the token-major layout), the token's row
    replaced with a masked select, and pushed back."""
    del k_in, v_in  # aliased with the outputs

    def copies(direction_in: bool):
        out = []
        for b in range(batch):
            page = page_idx_ref[b]
            for pages, buf in ((k_out, k_buf), (v_out, v_buf)):
                src, dst = pages.at[page], buf.at[b]
                if direction_in:
                    out.append(pltpu.make_async_copy(src, dst, sem))
                else:
                    out.append(pltpu.make_async_copy(dst, src, sem))
        return out

    for c in copies(True):
        c.start()
    for c in copies(True):
        c.wait()

    page_size, row_width = k_buf.shape[1], k_buf.shape[2]
    row = jax.lax.broadcasted_iota(jnp.int32, (page_size, row_width), 0)
    for b in range(batch):
        hit = row == offset_ref[b]
        k_buf[b] = jnp.where(hit, k_new[b], k_buf[b])
        v_buf[b] = jnp.where(hit, v_new[b], v_buf[b])

    for c in copies(False):
        c.start()
    for c in copies(False):
        c.wait()


@functools.partial(jax.jit, static_argnames=("interpret",))
def _write_kv_decode_rows(k_pages, v_pages, k_rows, v_rows, page_idx, offset,
                          *, interpret: bool = False):
    batch = k_rows.shape[0]
    page_size, row_width = k_pages.shape[1], k_pages.shape[2]
    kernel = functools.partial(_decode_write_kernel, batch=batch)
    return pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(1,),
            in_specs=[pl.BlockSpec((batch, 1, row_width),
                                   lambda *_: (0, 0, 0))] * 2 +
                     [pl.BlockSpec(memory_space=pl.ANY)] * 2,
            out_specs=(pl.BlockSpec(memory_space=pl.ANY),
                       pl.BlockSpec(memory_space=pl.ANY)),
            scratch_shapes=[
                pltpu.VMEM((batch, page_size, row_width), k_pages.dtype),
                pltpu.VMEM((batch, page_size, row_width), v_pages.dtype),
                pltpu.SemaphoreType.DMA,
            ],
        ),
        out_shape=(jax.ShapeDtypeStruct(k_pages.shape, k_pages.dtype),
                   jax.ShapeDtypeStruct(v_pages.shape, v_pages.dtype)),
        # operands (incl. 2 scalar-prefetch): page_idx, offset, k_rows,
        # v_rows, k_pages (idx 4), v_pages (idx 5) -> aliased outputs.
        input_output_aliases={4: 0, 5: 1},
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
        interpret=interpret,
    )(page_idx, offset, k_rows, v_rows, k_pages, v_pages)


def _token_pages(positions, page_tables, active, num_pages, page_size):
    """(page_idx, offset) per token, inactive rows -> trash page."""
    logical_page = positions // page_size
    offset = positions % page_size
    page_idx = jnp.take_along_axis(
        page_tables, logical_page[:, None], axis=1)[:, 0]
    trash = num_pages - 1
    page_idx = jnp.where(active, jnp.clip(page_idx, 0, num_pages - 1), trash)
    return page_idx.astype(jnp.int32), offset.astype(jnp.int32)


def quantize_decode_tokens(
    k_new: jax.Array,          # [batch, num_kv_heads, head_dim]
    v_new: jax.Array,
    positions: jax.Array,      # [batch] int32
    page_tables: jax.Array,    # [batch, pages_per_seq_max] int32
    active: jax.Array,         # [batch] bool
    k_scales: jax.Array,       # [num_pages, page_size, num_kv_heads] f32
    v_scales: jax.Array,
    kv_dtype,
):
    """Quantize one decode token per sequence and scatter its scales.

    Companion to the fused write inside `paged_attention(..., k_new=, v_new=)`:
    the kernel DMAs the quantized payload row, while the scale pools (below
    DMA granularity) are updated here with one XLA scatter each.
    Returns (k_q, v_q, k_scales, v_scales).
    """
    num_pages, page_size = k_scales.shape[0], k_scales.shape[1]
    k_q, k_s = _quantize_tokens(k_new, kv_dtype)   # [b,h,d], [b,h]
    v_q, v_s = _quantize_tokens(v_new, kv_dtype)
    page_idx, offset = _token_pages(positions, page_tables, active,
                                    num_pages, page_size)
    k_scales = k_scales.at[page_idx, offset].set(k_s)
    v_scales = v_scales.at[page_idx, offset].set(v_s)
    return k_q, v_q, k_scales, v_scales


def write_kv_decode(
    k_pages: jax.Array,        # [num_pages, page_size, row_width]
    v_pages: jax.Array,
    k_new: jax.Array,          # [batch, num_kv_heads, head_dim]
    v_new: jax.Array,
    positions: jax.Array,      # [batch] int32 — token position (0-based)
    page_tables: jax.Array,    # [batch, pages_per_seq_max] int32
    active: jax.Array,         # [batch] bool — False rows go to the trash page
    k_scales: Optional[jax.Array] = None,
    v_scales: Optional[jax.Array] = None,
    interpret: bool = False,
):
    """Scatter one new token per sequence into the paged KV pool.

    Standalone path (the fused-in-attention write is preferred for the decode
    hot loop; this serves the partitioned long-context path and tests).
    Returns (k_pages, v_pages) or (k_pages, v_pages, k_scales, v_scales).
    """
    num_pages, page_size, row_width = k_pages.shape
    kv_dtype = k_pages.dtype
    if k_scales is not None:
        k_q, k_s = _quantize_tokens(k_new, kv_dtype)
        v_q, v_s = _quantize_tokens(v_new, kv_dtype)
        k_src, v_src = k_q, v_q
    else:
        k_src, v_src = k_new.astype(kv_dtype), v_new.astype(kv_dtype)

    page_idx, offset = _token_pages(positions, page_tables, active,
                                    num_pages, page_size)
    k_pages, v_pages = _write_kv_decode_rows(
        k_pages, v_pages, widen_rows(k_src, row_width),
        widen_rows(v_src, row_width), page_idx, offset, interpret=interpret)

    if k_scales is not None:
        k_scales = k_scales.at[page_idx, offset].set(k_s)
        v_scales = v_scales.at[page_idx, offset].set(v_s)
        return k_pages, v_pages, k_scales, v_scales
    return k_pages, v_pages


def write_kv_prefill(
    k_pages: jax.Array,       # [num_pages, page_size, row_width]
    v_pages: jax.Array,
    k_new: jax.Array,         # [chunk_len_padded, num_kv_heads, head_dim]
    v_new: jax.Array,
    page_table: jax.Array,    # [pages_per_seq_max] int32 (one sequence)
    seq_len: jax.Array,       # scalar int32 — true token count of THIS chunk
    start_pos: jax.Array | int = 0,  # first token's absolute position;
    #                           must be page-aligned (engine chunks on page
    #                           boundaries)
    k_scales: Optional[jax.Array] = None,
    v_scales: Optional[jax.Array] = None,
):
    """Scatter a (padded) prompt chunk's K/V into the pool for one sequence.

    Tokens at index >= seq_len are padding and land on the trash page. Unlike
    the reference (`vllmini/kv_cache.py:35` overflows a single block for
    prompts > 16 tokens — SURVEY.md "bugs"), positions map through the page
    table, so any prompt up to max_pages_per_seq * page_size lands in its own
    pages. With `start_pos > 0` (chunked prefill) the chunk continues at
    logical page `start_pos // page_size`.
    """
    L = k_new.shape[0]
    num_pages, page_size, row_width = k_pages.shape
    H, d = k_new.shape[1], k_new.shape[2]

    kv_dtype = k_pages.dtype
    if k_scales is not None:
        k_q, k_s = _quantize_tokens(k_new, kv_dtype)   # [L,h,d],[L,h]
        v_q, v_s = _quantize_tokens(v_new, kv_dtype)
        k_src, v_src = k_q, v_q
    else:
        k_src, v_src = k_new.astype(kv_dtype), v_new.astype(kv_dtype)
        k_s = v_s = None

    # Whole-page dynamic_update_slices (XLA scatter serializes per element on
    # TPU). Garbage in the tail of the last page is never read: attention
    # masks positions >= seq_len, and decode overwrites its own slots later.
    n_logical = page_table.shape[0]
    L_pad = -(-L // page_size) * page_size

    def pad_tokens(x):
        return jnp.pad(x, ((0, L_pad - L),) + ((0, 0),) * (x.ndim - 1))

    def rows(x):  # [L_pad, H, d] -> [n_chunk_pages, page_size, row_width]
        flat = x.reshape(L_pad, H * d)
        if H * d < row_width:
            flat = jnp.pad(flat, ((0, 0), (0, row_width - H * d)))
        return flat.reshape(-1, page_size, row_width)

    k_pg = rows(pad_tokens(k_src))
    v_pg = rows(pad_tokens(v_src))
    if k_s is not None:
        ks_pg = pad_tokens(k_s).reshape(-1, page_size, H)
        vs_pg = pad_tokens(v_s).reshape(-1, page_size, H)
    n_chunk_pages = k_pg.shape[0]

    trash = num_pages - 1
    page0 = jnp.asarray(start_pos, jnp.int32) // page_size

    def body(j, carry):
        kp, vp, ks, vs = carry
        logical = page0 + j
        page = jnp.clip(page_table[jnp.minimum(logical, n_logical - 1)],
                        0, trash)
        page = jnp.where((j * page_size) < seq_len, page, trash)
        start = (page, 0, 0)
        kp = jax.lax.dynamic_update_slice(kp, k_pg[j][None], start)
        vp = jax.lax.dynamic_update_slice(vp, v_pg[j][None], start)
        if ks is not None:
            ks = jax.lax.dynamic_update_slice(ks, ks_pg[j][None], start)
            vs = jax.lax.dynamic_update_slice(vs, vs_pg[j][None], start)
        return kp, vp, ks, vs

    k_pages, v_pages, k_scales, v_scales = jax.lax.fori_loop(
        0, n_chunk_pages, body, (k_pages, v_pages, k_scales, v_scales))

    if k_scales is not None:
        return k_pages, v_pages, k_scales, v_scales
    return k_pages, v_pages


def copy_pages(
    pages: jax.Array,        # [num_pages, page_size, ...] (data or scales)
    src_indices: jax.Array,  # [n] int32
    dst_indices: jax.Array,  # [n] int32 (OOB index -> no-op row)
) -> jax.Array:
    """Batched page duplication (copy-on-write / beam forking).

    TPU equivalent of `copy_blocks` (`cache_kernels.cu:69-148`). With the
    layer dimension folded into the pool lists, one call covers one layer's
    array; pages are dim 0 in the token-major layout.
    """
    return pages.at[dst_indices].set(pages[src_indices], mode="drop")


def gather_pages(pages: jax.Array, indices: jax.Array) -> jax.Array:
    """Gather pages into a dense [n, page_size, ...] array.

    Used for swap-out (device -> host): the TPU analog of `swap_blocks`
    (`cache_kernels.cu:24-63`) — the caller `jax.device_get`s the result.
    """
    return pages[indices]


def scatter_pages(pages: jax.Array, indices: jax.Array,
                  values: jax.Array) -> jax.Array:
    """Inverse of gather_pages: swap-in (host -> device) landing."""
    return pages.at[indices].set(values, mode="drop")
