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

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


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


def _decode_write_kernel(
    page_idx_ref, offset_ref,       # scalar prefetch [B] i32 (token offset)
    k_new_ref, v_new_ref,           # VMEM [B, H, lane_w] (lanes pre-placed)
    k_pages_any, v_pages_any,       # ANY (aliased with the outputs)
    k_out, v_out,                   # ANY outputs (same memory)
    k_buf, v_buf,                   # VMEM [B, H, page_rows, lane_w]
    sem,
    *, batch: int, packing: int = 1,
):
    """Read-modify-write each slot's current page in one kernel launch.

    Mosaic cannot DMA a single token row (sub-tile slice of the (page_size,
    head_dim) tiled page), so each page is pulled whole into VMEM, the token's
    row replaced with a vector select, and pushed back. 2 x batch strided DMAs
    of ~heads*page_size*head_dim bytes each — one XLA op instead of a
    per-sequence dynamic_update_slice chain (each XLA op costs ~85 us of launch
    overhead on this backend; the chain dominated the whole decode step).
    """
    del k_pages_any, v_pages_any  # use the aliased output refs

    def copies(direction_in: bool):
        out = []
        for b in range(batch):
            page = page_idx_ref[b]
            for pages, buf in ((k_out, k_buf), (v_out, v_buf)):
                src = pages.at[:, page]
                dst = buf.at[b]
                if direction_in:
                    out.append(pltpu.make_async_copy(src, dst, sem))
                else:
                    out.append(pltpu.make_async_copy(dst, src, sem))
        return out

    for c in copies(True):
        c.start()
    for c in copies(True):
        c.wait()

    page_rows, lane_w = k_buf.shape[2], k_buf.shape[3]
    d = lane_w // packing
    for b in range(batch):
        off = offset_ref[b]
        row = jax.lax.broadcasted_iota(jnp.int32, (1, page_rows, lane_w), 1)
        hit = row == (off // packing)
        if packing > 1:
            lane_block = jax.lax.broadcasted_iota(
                jnp.int32, (1, page_rows, lane_w), 2) // d
            hit = hit & (lane_block == jax.lax.rem(off, packing))
        k_buf[b] = jnp.where(hit, k_new_ref[b][:, None, :], k_buf[b])
        v_buf[b] = jnp.where(hit, v_new_ref[b][:, None, :], v_buf[b])

    for c in copies(False):
        c.start()
    for c in copies(False):
        c.wait()


@functools.partial(jax.jit, static_argnames=("interpret", "packing"))
def _write_kv_decode_fused(k_pages, v_pages, k_new, v_new, page_idx, offset,
                           *, interpret: bool = False, packing: int = 1):
    batch = k_new.shape[0]
    kernel = functools.partial(_decode_write_kernel, batch=batch,
                               packing=packing)
    return pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(1,),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pl.ANY),
                pl.BlockSpec(memory_space=pl.ANY),
            ],
            out_specs=(pl.BlockSpec(memory_space=pl.ANY),
                       pl.BlockSpec(memory_space=pl.ANY)),
            scratch_shapes=[
                pltpu.VMEM((batch,) + k_pages.shape[0:1] + k_pages.shape[2:],
                           k_pages.dtype),
                pltpu.VMEM((batch,) + v_pages.shape[0:1] + v_pages.shape[2:],
                           v_pages.dtype),
                pltpu.SemaphoreType.DMA,
            ],
        ),
        out_shape=(jax.ShapeDtypeStruct(k_pages.shape, k_pages.dtype),
                   jax.ShapeDtypeStruct(v_pages.shape, v_pages.dtype)),
        # inputs (incl. 2 scalar-prefetch): page_idx, offset, k_new, v_new,
        # k_pages (idx 4), v_pages (idx 5) -> alias pools onto the outputs.
        input_output_aliases={4: 0, 5: 1},
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
        interpret=interpret,
    )(page_idx, offset, k_new, v_new, k_pages, v_pages)


def quantize_decode_tokens(
    k_new: jax.Array,          # [batch, num_kv_heads, head_dim]
    v_new: jax.Array,
    positions: jax.Array,      # [batch] int32
    page_tables: jax.Array,    # [batch, pages_per_seq_max] int32
    active: jax.Array,         # [batch] bool
    k_scales: jax.Array,       # [num_kv_heads, num_pages, page_size] f32
    v_scales: jax.Array,
    kv_dtype,
):
    """Quantize one decode token per sequence and scatter its scales.

    Companion to the fused write inside `paged_attention(..., k_new=, v_new=)`:
    the kernel patches the quantized payload into the page, while the scale
    pools (below Mosaic DMA granularity) are updated here with one XLA scatter
    each. Returns (k_q, v_q, k_scales, v_scales).
    """
    num_pages, page_size = k_scales.shape[1], k_scales.shape[2]
    k_q, k_s = _quantize_tokens(k_new, kv_dtype)   # [b,h,d], [b,h]
    v_q, v_s = _quantize_tokens(v_new, kv_dtype)
    logical_page = positions // page_size
    offset = positions % page_size
    page_idx = jnp.take_along_axis(
        page_tables, logical_page[:, None], axis=1)[:, 0]
    # Inactive slots park their scale on the trash page (see write_kv_decode).
    trash = num_pages - 1
    page_idx = jnp.where(active, jnp.clip(page_idx, 0, num_pages - 1), trash)
    k_scales = k_scales.at[:, page_idx, offset].set(k_s.T)
    v_scales = v_scales.at[:, page_idx, offset].set(v_s.T)
    return k_q, v_q, k_scales, v_scales


def _place_lanes(x: jax.Array, positions: jax.Array, packing: int,
                 lane_w: int) -> jax.Array:
    """[B, H, d] -> [B, H, lane_w] with each token's values in its lane block
    (position mod packing); identity reshape for packing == 1."""
    B, H, d = x.shape
    if packing == 1:
        return x
    lb = positions.astype(jnp.int32) % packing
    onehot = jax.nn.one_hot(lb, packing, dtype=x.dtype)  # [B, P]
    return jnp.einsum("bp,bhd->bhpd", onehot, x).reshape(B, H, lane_w)


def write_kv_decode(
    k_pages: jax.Array,  # [num_kv_heads, num_pages, page_size/packing,
    v_pages: jax.Array,  #   packing*head_dim]
    k_new: jax.Array,          # [batch, num_kv_heads, head_dim] (one token/seq)
    v_new: jax.Array,
    positions: jax.Array,      # [batch] int32 — token position (0-based)
    page_tables: jax.Array,    # [batch, pages_per_seq_max] int32
    active: jax.Array,         # [batch] bool — False rows are dropped
    k_scales: Optional[jax.Array] = None,  # [num_kv_heads, num_pages, page_size]
    v_scales: Optional[jax.Array] = None,
    interpret: bool = False,
    packing: int = 1,
):
    """Scatter one new token per sequence into the paged KV pool.

    Returns (k_pages, v_pages) or (k_pages, v_pages, k_scales, v_scales).
    """
    batch = k_new.shape[0]
    num_pages = k_pages.shape[1]
    page_size = k_pages.shape[2] * packing  # logical tokens per page
    lane_w = k_pages.shape[3]
    if packing == 1:
        k_new, v_new = _pad_head(k_new, k_pages), _pad_head(v_new, v_pages)

    logical_page = positions // page_size
    offset = positions % page_size
    page_idx = jnp.take_along_axis(
        page_tables, logical_page[:, None], axis=1
    )[:, 0]
    page_idx = jnp.clip(page_idx, 0, num_pages - 1)

    kv_dtype = k_pages.dtype
    if k_scales is not None:
        k_q, k_s = _quantize_tokens(k_new, kv_dtype)   # [b,h,d], [b,h]
        v_q, v_s = _quantize_tokens(v_new, kv_dtype)
        k_src, v_src = k_q, v_q
    else:
        k_src, v_src = k_new.astype(kv_dtype), v_new.astype(kv_dtype)
    k_src = _place_lanes(k_src, positions, packing, lane_w)
    v_src = _place_lanes(v_src, positions, packing, lane_w)

    # Inactive slots write to the pool's dedicated TRASH page (the last
    # physical page, see memory/kv_cache.py): every write becomes
    # unconditional. (A lax.cond here forces XLA to copy the whole pool per
    # iteration.)
    trash = num_pages - 1
    page_idx = jnp.where(active, page_idx, trash)

    # Payload goes through the fused one-launch RMW kernel.
    k_pages, v_pages = _write_kv_decode_fused(
        k_pages, v_pages, k_src, v_src, page_idx.astype(jnp.int32),
        offset.astype(jnp.int32), interpret=interpret, packing=packing)

    if k_scales is not None:
        # Scale pools are below Mosaic's DMA tiling granularity; update them
        # with one scatter per pool (small arrays). TODO(perf): pack per-token
        # scales into the page's padding lanes to fold this into the kernel.
        k_scales = k_scales.at[:, page_idx, offset].set(k_s.T)
        v_scales = v_scales.at[:, page_idx, offset].set(v_s.T)
        return k_pages, v_pages, k_scales, v_scales
    return k_pages, v_pages


def write_kv_prefill(
    k_pages: jax.Array,  # [num_kv_heads, num_pages, page_size/packing,
    v_pages: jax.Array,  #   packing*head_dim]
    k_new: jax.Array,         # [seq_len_padded, num_kv_heads, head_dim]
    v_new: jax.Array,
    page_table: jax.Array,    # [pages_per_seq_max] int32 (one sequence)
    seq_len: jax.Array,       # scalar int32 — true prompt length (<= padded)
    start_pos: jax.Array | int = 0,  # first token's absolute position
    k_scales: Optional[jax.Array] = None,
    v_scales: Optional[jax.Array] = None,
    packing: int = 1,
):
    """Scatter a whole (padded) prompt's K/V into the pool for one sequence.

    Tokens at index >= seq_len are padding and are dropped. Unlike the reference
    (`vllmini/kv_cache.py:35` overflows a single block for prompts > 16 tokens —
    SURVEY.md "bugs"), positions map through the page table, so any prompt up to
    max_pages_per_seq * page_size lands in its own pages.
    """
    L = k_new.shape[0]
    num_kv_heads, num_pages = k_pages.shape[0], k_pages.shape[1]
    page_size = k_pages.shape[2] * packing  # logical tokens per page
    head_dim = k_pages.shape[3] // packing
    if packing == 1:
        k_new, v_new = _pad_head(k_new, k_pages), _pad_head(v_new, v_pages)

    kv_dtype = k_pages.dtype
    if k_scales is not None:
        k_q, k_s = _quantize_tokens(k_new, kv_dtype)   # [L,h,d],[L,h]
        v_q, v_s = _quantize_tokens(v_new, kv_dtype)
        k_src, v_src = k_q, v_q
    else:
        k_src, v_src = k_new.astype(kv_dtype), v_new.astype(kv_dtype)
        k_s = v_s = None

    # Prompt tokens fill logical pages contiguously from position 0, so the
    # write is one whole-page dynamic_update_slice per page (all heads at
    # once) — not a per-token scatter (XLA scatter serializes per element on
    # TPU). Garbage in the tail of the last page is never read: attention
    # masks positions >= seq_len, and decode overwrites its own slots later.
    # (The engine always prefills whole prompts from position 0; a chunked
    # prefill with start_pos % page_size != 0 would need a partial-first-page
    # path.)
    n_logical = page_table.shape[0]
    L_pad = -(-L // page_size) * page_size

    def pad_tokens(x):
        return jnp.pad(x, ((0, L_pad - L),) + ((0, 0),) * (x.ndim - 1))

    # [n_prompt_pages, H, page_size, d] / [n_prompt_pages, H, page_size]
    k_pg = pad_tokens(k_src).reshape(-1, page_size, num_kv_heads,
                                     head_dim).transpose(0, 2, 1, 3)
    v_pg = pad_tokens(v_src).reshape(-1, page_size, num_kv_heads,
                                     head_dim).transpose(0, 2, 1, 3)
    if packing > 1:
        # Contiguous (page_size, d) -> (page_size/packing, packing*d): the
        # packed row layout is byte-identical, so this is a pure reshape.
        k_pg = k_pg.reshape(k_pg.shape[0], num_kv_heads,
                            page_size // packing, packing * head_dim)
        v_pg = v_pg.reshape(v_pg.shape[0], num_kv_heads,
                            page_size // packing, packing * head_dim)
    if k_s is not None:
        ks_pg = pad_tokens(k_s).reshape(-1, page_size,
                                        num_kv_heads).transpose(0, 2, 1)
        vs_pg = pad_tokens(v_s).reshape(-1, page_size,
                                        num_kv_heads).transpose(0, 2, 1)
    n_prompt_pages = k_pg.shape[0]

    # No conditional: logical pages beyond the prompt map to the table's
    # padding sentinel, which clips to the trash page (see decode path note on
    # why lax.cond is poison here).
    trash = num_pages - 1

    def body(j, carry):
        kp, vp, ks, vs = carry
        page = jnp.clip(page_table[jnp.minimum(j, n_logical - 1)], 0, trash)
        page = jnp.where((j * page_size) < seq_len, page, trash)
        start = (0, page, 0, 0)
        kp = jax.lax.dynamic_update_slice(kp, k_pg[j][:, None], start)
        vp = jax.lax.dynamic_update_slice(vp, v_pg[j][:, None], start)
        if ks is not None:
            ks = jax.lax.dynamic_update_slice(ks, ks_pg[j][:, None],
                                              start[:3])
            vs = jax.lax.dynamic_update_slice(vs, vs_pg[j][:, None],
                                              start[:3])
        return kp, vp, ks, vs

    k_pages, v_pages, k_scales, v_scales = jax.lax.fori_loop(
        0, n_prompt_pages, body, (k_pages, v_pages, k_scales, v_scales))

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
