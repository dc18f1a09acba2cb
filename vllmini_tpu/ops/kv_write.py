"""KV write ops for the token-major interleaved pool (TPU `reshape_and_cache`).

Reference counterpart: the slot-mapping scatter kernel
(`/root/reference/paged_attention_ext/paged_attention_cuda/cache_kernels.cu:153-207`),
which writes per-token K/V into the paged pools at `slot_mapping[token]` and skips
negative slots (padding). In the token-major interleaved layout
(`memory/kv_cache.py`, pages `[num_pages, 2, page_size, row_width]`) one token
is ONE contiguous row per plane, so:

- the batched decode write is a single-launch Pallas kernel that pulls each
  slot's current page whole (ONE contiguous DMA descriptor covering K and V),
  patches the token's rows with masked selects, and pushes it back (Mosaic
  DMA slices must be sublane-tile aligned, so a bare row store is not
  expressible); the serving hot path instead fuses this into the attention
  kernel (`paged_attention(..., k_new=, v_new=)`);
- the prefill write is one whole-page `dynamic_update_slice` per prompt page
  (both planes at once);
- padding tokens land on the pool's TRASH page (the analog of
  `slot_idx < 0 -> return` at `cache_kernels.cu:166-169`) so no `lax.cond`
  ever wraps a pool update (XLA would copy the pool);
- when the cache is int8/fp8-quantized, per-token-per-head scales are computed
  on the fly and scattered into the scale pool (the reference's fused fp8
  store path, `cache_kernels.cu:199-205`).

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

    x: [..., head_dim] float -> (q: [..., head_dim] `dtype`, scale: [...]
    bf16). The scale is rounded to bf16 FIRST and the payload divides by the
    rounded value, so dequant-by-stored-scale reproduces pure payload
    rounding error — the scale pool stores bf16 (it rides per decode step
    into the attention kernel; bf16 halves that traffic)."""
    amax = jnp.max(jnp.abs(x.astype(jnp.float32)), axis=-1)
    if dtype == jnp.int8:
        qmax = 127.0
    else:  # fp8 variants
        qmax = float(jnp.finfo(dtype).max)
    scale = jnp.maximum(amax / qmax, 1e-8).astype(jnp.bfloat16)
    q = x.astype(jnp.float32) / scale[..., None].astype(jnp.float32)
    if dtype == jnp.int8:
        q = jnp.clip(jnp.round(q), -qmax, qmax)
    return q.astype(dtype), scale


def widen_rows(x: jax.Array, row_width: int) -> jax.Array:
    """[B, H, d] -> [B, 1, row_width]: one pool row per token."""
    B = x.shape[0]
    flat = x.reshape(B, 1, -1)
    if flat.shape[-1] < row_width:
        flat = jnp.pad(flat, ((0, 0), (0, 0),
                              (0, row_width - flat.shape[-1])))
    return flat


def _decode_write_kernel(page_idx_ref, offset_ref, k_new, v_new,
                         kv_in, kv_out, kv_buf, sem, *, batch: int):
    """Read-modify-write each slot's current page in one kernel launch.

    Mosaic DMA slices must be sublane-tile aligned, so a single token row
    cannot be stored directly; each page (both planes) is pulled whole into
    VMEM with ONE contiguous descriptor, the token's rows replaced with
    masked selects, and pushed back."""
    del kv_in  # aliased with the output

    def copies(direction_in: bool):
        out = []
        for b in range(batch):
            page = page_idx_ref[b]
            src, dst = kv_out.at[page], kv_buf.at[b]
            if direction_in:
                out.append(pltpu.make_async_copy(src, dst, sem))
            else:
                out.append(pltpu.make_async_copy(dst, src, sem))
        return out

    for c in copies(True):
        c.start()
    for c in copies(True):
        c.wait()

    page_size, row_width = kv_buf.shape[2], kv_buf.shape[3]
    row = jax.lax.broadcasted_iota(jnp.int32, (page_size, row_width), 0)
    for b in range(batch):
        hit = row == offset_ref[b]
        kv_buf[b, 0] = jnp.where(hit, k_new[b], kv_buf[b, 0])
        kv_buf[b, 1] = jnp.where(hit, v_new[b], kv_buf[b, 1])

    for c in copies(False):
        c.start()
    for c in copies(False):
        c.wait()


@functools.partial(jax.jit, static_argnames=("interpret",))
def _write_kv_decode_rows(kv_pages, k_rows, v_rows, page_idx, offset,
                          *, interpret: bool = False):
    batch = k_rows.shape[0]
    _, _, page_size, row_width = kv_pages.shape
    kernel = functools.partial(_decode_write_kernel, batch=batch)
    return pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(1,),
            in_specs=[pl.BlockSpec((batch, 1, row_width),
                                   lambda *_: (0, 0, 0))] * 2 +
                     [pl.BlockSpec(memory_space=pl.ANY)],
            out_specs=pl.BlockSpec(memory_space=pl.ANY),
            scratch_shapes=[
                pltpu.VMEM((batch, 2, page_size, row_width), kv_pages.dtype),
                pltpu.SemaphoreType.DMA,
            ],
        ),
        out_shape=jax.ShapeDtypeStruct(kv_pages.shape, kv_pages.dtype),
        # operands (incl. 2 scalar-prefetch): page_idx, offset, k_rows,
        # v_rows, kv_pages (idx 4) -> aliased output.
        input_output_aliases={4: 0},
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
        interpret=interpret,
    )(page_idx, offset, k_rows, v_rows, kv_pages)


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
    kv_scales: jax.Array,      # [num_pages, 2, num_kv_heads, page_size] bf16
    kv_dtype,
):
    """Quantize one decode token per sequence and scatter its scales.

    Companion to the fused write inside `paged_attention(..., k_new=, v_new=)`:
    the kernel patches the quantized payload into the page, while the scale
    pool (below DMA granularity) is updated here with one XLA scatter.
    Returns (k_q, v_q, kv_scales).
    """
    num_pages, page_size = kv_scales.shape[0], kv_scales.shape[3]
    k_q, k_s = _quantize_tokens(k_new, kv_dtype)   # [b,h,d], [b,h]
    v_q, v_s = _quantize_tokens(v_new, kv_dtype)
    page_idx, offset = _token_pages(positions, page_tables, active,
                                    num_pages, page_size)
    kv_scales = kv_scales.at[page_idx, :, :, offset].set(
        jnp.stack([k_s, v_s], axis=1))
    return k_q, v_q, kv_scales


def write_kv_decode(
    kv_pages: jax.Array,       # [num_pages, 2, page_size, row_width]
    k_new: jax.Array,          # [batch, num_kv_heads, head_dim]
    v_new: jax.Array,
    positions: jax.Array,      # [batch] int32 — token position (0-based)
    page_tables: jax.Array,    # [batch, pages_per_seq_max] int32
    active: jax.Array,         # [batch] bool — False rows go to the trash page
    kv_scales: Optional[jax.Array] = None,
    interpret: bool = False,
):
    """Scatter one new token per sequence into the paged KV pool.

    Standalone path (the fused-in-attention write is preferred for the decode
    hot loop; this serves the partitioned long-context path and tests).
    Returns kv_pages or (kv_pages, kv_scales).
    """
    num_pages, _, page_size, row_width = kv_pages.shape
    kv_dtype = kv_pages.dtype
    if kv_scales is not None:
        k_q, k_s = _quantize_tokens(k_new, kv_dtype)
        v_q, v_s = _quantize_tokens(v_new, kv_dtype)
        k_src, v_src = k_q, v_q
    else:
        k_src, v_src = k_new.astype(kv_dtype), v_new.astype(kv_dtype)

    page_idx, offset = _token_pages(positions, page_tables, active,
                                    num_pages, page_size)
    kv_pages = _write_kv_decode_rows(
        kv_pages, widen_rows(k_src, row_width),
        widen_rows(v_src, row_width), page_idx, offset, interpret=interpret)

    if kv_scales is not None:
        kv_scales = kv_scales.at[page_idx, :, :, offset].set(
            jnp.stack([k_s, v_s], axis=1))
        return kv_pages, kv_scales
    return kv_pages


def _spec_write_kernel(pages_ref, offsets_ref, k_new, v_new,
                       kv_in, kv_out, kv_buf, sem, *,
                       group: int, s1: int):
    """RMW write of S1 CONSECUTIVE tokens per sequence (speculative-decode
    verify). Consecutive positions span at most two pages, so each sequence
    pulls (up to) two pages whole, patches every token routed to each page,
    and pushes both back — unlike `_decode_write_kernel`, two tokens landing
    in the SAME page both survive (that kernel gives each token a private
    page copy; last writeback would win)."""
    del kv_in  # aliased with the output
    g = pl.program_id(0)

    def copies(direction_in: bool):
        out = []
        for b in range(group):
            for p in range(2):
                page = pages_ref[g * group + b, p]
                src, dst = kv_out.at[page], kv_buf.at[b, p]
                if direction_in:
                    out.append(pltpu.make_async_copy(src, dst, sem))
                else:
                    out.append(pltpu.make_async_copy(dst, src, sem))
        return out

    for c in copies(True):
        c.start()
    for c in copies(True):
        c.wait()

    page_size, row_width = kv_buf.shape[3], kv_buf.shape[4]
    row = jax.lax.broadcasted_iota(jnp.int32, (page_size, row_width), 0)
    for b in range(group):
        for p in range(2):
            for j in range(s1):
                # offsets_ref[b, j] encodes (page-select p, row offset) as
                # p * page_size + offset; invalid tokens carry -1.
                hit = row == (offsets_ref[g * group + b, j] - p * page_size)
                kv_buf[b, p, 0] = jnp.where(hit, k_new[b, j],
                                            kv_buf[b, p, 0])
                kv_buf[b, p, 1] = jnp.where(hit, v_new[b, j],
                                            kv_buf[b, p, 1])

    for c in copies(False):
        c.start()
    for c in copies(False):
        c.wait()


@functools.partial(jax.jit, static_argnames=("interpret",))
def _write_kv_spec_rows(kv_pages, k_rows, v_rows, pages, offsets,
                        *, interpret: bool = False):
    batch, s1 = k_rows.shape[0], k_rows.shape[1]
    _, _, page_size, row_width = kv_pages.shape
    # Per-program footprint: group * 2 pages * 2 planes (plus payload rows).
    itemsize = jnp.dtype(kv_pages.dtype).itemsize
    group = batch
    while group > 1 and (group * 2 * 2 * page_size * row_width * itemsize
                         > 8 * 1024 * 1024):
        group //= 2
    while batch % group != 0:
        group -= 1
    kernel = functools.partial(_spec_write_kernel, group=group, s1=s1)
    return pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(batch // group,),
            in_specs=[pl.BlockSpec((group, s1, row_width),
                                   lambda i, *_: (i, 0, 0))] * 2 +
                     [pl.BlockSpec(memory_space=pl.ANY)],
            out_specs=pl.BlockSpec(memory_space=pl.ANY),
            scratch_shapes=[
                pltpu.VMEM((group, 2, 2, page_size, row_width),
                           kv_pages.dtype),
                pltpu.SemaphoreType.DMA,
            ],
        ),
        out_shape=jax.ShapeDtypeStruct(kv_pages.shape, kv_pages.dtype),
        # operands (incl. 2 scalar-prefetch): pages, offsets, k_rows,
        # v_rows, kv_pages (idx 4) -> aliased output.
        input_output_aliases={4: 0},
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            has_side_effects=True),
        interpret=interpret,
    )(pages, offsets, k_rows, v_rows, kv_pages)


def write_kv_spec(
    kv_pages: jax.Array,       # [num_pages, 2, page_size, row_width]
    k_new: jax.Array,          # [batch, S1, num_kv_heads, head_dim]
    v_new: jax.Array,
    start_positions: jax.Array,  # [batch] i32 — position of token 0
    page_tables: jax.Array,    # [batch, pages_per_seq_max] i32
    active: jax.Array,         # [batch] bool
    kv_scales: Optional[jax.Array] = None,
    interpret: bool = False,
):
    """Scatter S1 consecutive tokens per sequence (speculative verify: the
    fed token + S drafts at positions start..start+S1-1). Tokens whose
    position falls outside the sequence's mapped pages are silently dropped
    (their logits are discarded by acceptance truncation anyway); inactive
    rows write nothing. Returns kv_pages or (kv_pages, kv_scales)."""
    num_pages, _, page_size, row_width = kv_pages.shape
    B, S1 = k_new.shape[0], k_new.shape[1]
    n_logical = page_tables.shape[1]
    trash = num_pages - 1
    kv_dtype = kv_pages.dtype

    if kv_scales is not None:
        k_src, k_s = _quantize_tokens(k_new, kv_dtype)  # [B,S1,h,d],[B,S1,h]
        v_src, v_s = _quantize_tokens(v_new, kv_dtype)
    else:
        k_src = k_new.astype(kv_dtype)
        v_src = v_new.astype(kv_dtype)
        k_s = v_s = None

    pos = start_positions[:, None] + jnp.arange(S1, dtype=jnp.int32)  # [B,S1]
    logical = pos // page_size
    offset = pos % page_size
    raw = jnp.take_along_axis(
        page_tables, jnp.clip(logical, 0, n_logical - 1), axis=1)  # [B, S1]
    valid = (active[:, None] & (logical < n_logical)
             & (raw >= 0) & (raw < trash))

    # Each row touches at most two distinct pages (consecutive positions):
    # buffer 0 holds token 0's page, buffer 1 the following page (trash when
    # unused). Encoded offset = sel * page_size + offset; -1 drops the token.
    sel = (logical != logical[:, :1]).astype(jnp.int32)          # [B, S1]
    page0 = jnp.where(valid[:, 0], raw[:, 0], trash)
    first_sel1 = sel.astype(bool) & ~jnp.concatenate(
        [jnp.zeros((B, 1), bool), sel[:, :-1].astype(bool)], axis=1)
    page1 = jnp.where(
        jnp.any(first_sel1 & valid, axis=1),
        jnp.sum(jnp.where(first_sel1 & valid, raw, 0), axis=1), trash)
    pages = jnp.stack([page0, page1], axis=1).astype(jnp.int32)  # [B, 2]
    enc_off = jnp.where(valid, sel * page_size + offset, -1).astype(jnp.int32)

    def rows(x):  # [B, S1, h, d] -> [B, S1, row_width]
        flat = x.reshape(B, S1, -1)
        if flat.shape[-1] < row_width:
            flat = jnp.pad(flat, ((0, 0), (0, 0),
                                  (0, row_width - flat.shape[-1])))
        return flat

    kv_pages = _write_kv_spec_rows(kv_pages, rows(k_src), rows(v_src),
                                   pages, enc_off, interpret=interpret)
    if kv_scales is not None:
        sc_page = jnp.where(valid, raw, trash).reshape(-1)
        sc_off = offset.reshape(-1)
        kv_scales = kv_scales.at[sc_page, :, :, sc_off].set(
            jnp.stack([k_s.reshape(B * S1, -1),
                       v_s.reshape(B * S1, -1)], axis=1))
        return kv_pages, kv_scales
    return kv_pages


def write_kv_prefill(
    kv_pages: jax.Array,      # [num_pages, 2, page_size, row_width]
    k_new: jax.Array,         # [chunk_len_padded, num_kv_heads, head_dim]
    v_new: jax.Array,
    page_table: jax.Array,    # [pages_per_seq_max] int32 (one sequence)
    seq_len: jax.Array,       # scalar int32 — true token count of THIS chunk
    start_pos: jax.Array | int = 0,  # first token's absolute position;
    #                           must be page-aligned (engine chunks on page
    #                           boundaries)
    kv_scales: Optional[jax.Array] = None,
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
    num_pages, _, page_size, row_width = kv_pages.shape
    H, d = k_new.shape[1], k_new.shape[2]

    kv_dtype = kv_pages.dtype
    if kv_scales is not None:
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

    # [n_chunk_pages, 2, page_size, row_width]
    kv_pg = jnp.stack([rows(pad_tokens(k_src)), rows(pad_tokens(v_src))],
                      axis=1)
    if k_s is not None:
        # Scale pool layout is [P, 2, H, ps] — heads on sublanes, tokens on
        # lanes (the layout the decode attention kernel consumes directly).
        sc_pg = jnp.stack(
            [pad_tokens(k_s).reshape(-1, page_size, H).transpose(0, 2, 1),
             pad_tokens(v_s).reshape(-1, page_size, H).transpose(0, 2, 1)],
            axis=1)
    n_chunk_pages = kv_pg.shape[0]

    trash = num_pages - 1
    page0 = jnp.asarray(start_pos, jnp.int32) // page_size

    def body(j, carry):
        kv, sc = carry
        logical = page0 + j
        page = jnp.clip(page_table[jnp.minimum(logical, n_logical - 1)],
                        0, trash)
        page = jnp.where((j * page_size) < seq_len, page, trash)
        start = (page, 0, 0, 0)
        kv = jax.lax.dynamic_update_slice(kv, kv_pg[j][None], start)
        if sc is not None:
            sc = jax.lax.dynamic_update_slice(sc, sc_pg[j][None], start)
        return kv, sc

    kv_pages, kv_scales = jax.lax.fori_loop(
        0, n_chunk_pages, body, (kv_pages, kv_scales))

    if kv_scales is not None:
        return kv_pages, kv_scales
    return kv_pages


def write_kv_prefill_batch(
    kv_pages: jax.Array,       # [num_pages, 2, page_size, row_width]
    k_new: jax.Array,          # [B, L_padded, num_kv_heads, head_dim]
    v_new: jax.Array,
    page_tables: jax.Array,    # [B, pages_per_seq_max] int32
    seq_lens: jax.Array,       # [B] int32 — true token count per prompt
    kv_scales: Optional[jax.Array] = None,
):
    """Batched-prompt variant of `write_kv_prefill` (burst admission): B
    fresh prompts (start_pos 0) land in one flat page loop — one device op
    instead of B. Padding rows/pages go to the trash page as usual."""
    B, L = k_new.shape[0], k_new.shape[1]
    num_pages, _, page_size, row_width = kv_pages.shape
    H, d = k_new.shape[2], k_new.shape[3]
    kv_dtype = kv_pages.dtype

    if kv_scales is not None:
        k_src, k_s = _quantize_tokens(k_new, kv_dtype)
        v_src, v_s = _quantize_tokens(v_new, kv_dtype)
    else:
        k_src = k_new.astype(kv_dtype)
        v_src = v_new.astype(kv_dtype)
        k_s = v_s = None

    n_logical = page_tables.shape[1]
    L_pad = -(-L // page_size) * page_size

    def pad_tokens(x):
        return jnp.pad(x, ((0, 0), (0, L_pad - L)) +
                       ((0, 0),) * (x.ndim - 2))

    def rows(x):  # [B, L_pad, H, d] -> [B, n_pg, page_size, row_width]
        flat = x.reshape(B, L_pad, H * d)
        if H * d < row_width:
            flat = jnp.pad(flat, ((0, 0), (0, 0), (0, row_width - H * d)))
        return flat.reshape(B, -1, page_size, row_width)

    kv_pg = jnp.stack([rows(pad_tokens(k_src)), rows(pad_tokens(v_src))],
                      axis=2)                  # [B, n_pg, 2, ps, W]
    if k_s is not None:
        sc_pg = jnp.stack(
            [pad_tokens(k_s).reshape(B, -1, page_size, H)
             .transpose(0, 1, 3, 2),
             pad_tokens(v_s).reshape(B, -1, page_size, H)
             .transpose(0, 1, 3, 2)], axis=2)    # [B, n_pg, 2, H, ps]
    n_pg = kv_pg.shape[1]
    trash = num_pages - 1

    def body(j, carry):
        kv, sc = carry
        b, p = j // n_pg, j % n_pg
        page = jnp.clip(page_tables[b, jnp.minimum(p, n_logical - 1)],
                        0, trash)
        page = jnp.where((p * page_size) < seq_lens[b], page, trash)
        start = (page, 0, 0, 0)
        kv = jax.lax.dynamic_update_slice(kv, kv_pg[b, p][None], start)
        if sc is not None:
            sc = jax.lax.dynamic_update_slice(sc, sc_pg[b, p][None], start)
        return kv, sc

    kv_pages, kv_scales = jax.lax.fori_loop(
        0, B * n_pg, body, (kv_pages, kv_scales))
    if kv_scales is not None:
        return kv_pages, kv_scales
    return kv_pages


def copy_pages(
    pages: jax.Array,        # [num_pages, ...] (data or scales)
    src_indices: jax.Array,  # [n] int32
    dst_indices: jax.Array,  # [n] int32 (OOB index -> no-op row)
) -> jax.Array:
    """Batched page duplication (copy-on-write / beam forking).

    TPU equivalent of `copy_blocks` (`cache_kernels.cu:69-148`). With the
    layer dimension folded into the pool lists and K/V interleaved, one call
    covers one layer's whole array; pages are dim 0.
    """
    return pages.at[dst_indices].set(pages[src_indices], mode="drop")


def gather_pages(pages: jax.Array, indices: jax.Array) -> jax.Array:
    """Gather pages into a dense [n, ...] array.

    Used for swap-out (device -> host): the TPU analog of `swap_blocks`
    (`cache_kernels.cu:24-63`) — the caller `jax.device_get`s the result.
    """
    return pages[indices]


def scatter_pages(pages: jax.Array, indices: jax.Array,
                  values: jax.Array) -> jax.Array:
    """Inverse of gather_pages: swap-in (host -> device) landing."""
    return pages.at[indices].set(values, mode="drop")
