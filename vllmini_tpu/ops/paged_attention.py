"""Paged-attention decode kernel (Pallas/TPU).

TPU-native equivalent of the reference's `paged_attention_v1` CUDA kernel
(`/root/reference/paged_attention_ext/paged_attention_cuda/attention_kernels.cu:86-496`):
one query token per sequence attends over a page-table-indirected KV cache. The CUDA
design (warp-per-KV-block iteration, fp32 softmax in shared memory) maps to TPU as:

- grid over (batch,): each program handles one sequence, ALL kv heads at once —
  a single strided DMA per page (`pool.at[:, page]`) gathers every head's slice
  of that page, so DMA count per layer is `batch x pages`, not
  `batch x heads x pages` (12x fewer descriptors than a head-per-program grid;
  decode attention here is DMA-issue-bound, not FLOP-bound),
- pages are double-buffered in VMEM; the non-contiguity across pages still
  costs one DMA per page, all started concurrently,
- online softmax (running max m, normalizer l, fp32 accumulator) over page
  blocks — the flash-decoding structure of the reference's `paged_attention_v2`
  (`attention_kernels.cu:534-669`) fused into one kernel — with all heads
  advanced together as batched [H, group, *] tiles,
- GQA: q heads sharing a KV head form the `group` dim (the CUDA kernel's
  num_queries_per_kv, `attention_kernels.cu:152-153`),
- optional int8/fp8 KV with per-token scales dequantized in-register; scales are
  pre-gathered OUTSIDE the kernel into dense per-sequence rows and streamed in as
  a normal VMEM operand (Mosaic cannot DMA-slice sub-128-lane scale pages), the
  TPU shape of the reference's fp8 `scaled_convert` (`quantization/fp8/**`).

Hardware contract (enforced by the engine for native runs; interpret mode is lax):
- pool head_dim must be a multiple of 128 (pools for head_size<128 models are
  lane-padded; wrappers pad q / slice the output transparently),
- page_size must be a multiple of the dtype's sublane tile (8 f32 / 16 bf16 /
  32 int8|fp8): the page's (page_size, head_dim) trailing dims are what each
  strided DMA slices on, and Mosaic requires tile-aligned sliced memrefs.

Layouts are TPU-first, not the reference's 16-byte LDG-vectorized key layout
(`cache_kernels.cu:184-194`); see SURVEY.md §7.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# -0.7 * max-float instead of -inf: avoids NaN from exp(-inf - (-inf)).
DEFAULT_MASK_VALUE = -0.7 * float(jnp.finfo(jnp.float32).max)


class _PageGatherCopy:
    """Async-gather of a compute block's non-contiguous KV pages into one VMEM
    slot, ALL HEADS per page in a single strided DMA.

    `pages_hbm_ref.at[:, page]` is a strided slice (head stride = pool
    pages*page_size*head_dim); the DMA engine walks it natively, so one
    descriptor moves `num_kv_heads x page_size x head_dim` bytes.
    """

    def __init__(self, pages_hbm_ref, vmem_buf, sem, page_tables_ref, seq_idx,
                 block_idx, slot, pages_per_block):
        self._copies = []
        for j in range(pages_per_block):
            page_idx = page_tables_ref[seq_idx, block_idx * pages_per_block + j]
            self._copies.append(
                pltpu.make_async_copy(
                    pages_hbm_ref.at[:, page_idx],  # [H, page_size, head_dim]
                    vmem_buf.at[slot, j],
                    sem,
                )
            )

    def start(self):
        for c in self._copies:
            c.start()

    def wait(self):
        for c in self._copies:
            c.wait()


def _paged_attention_kernel(
    # scalar prefetch
    seq_lens_ref,      # [batch] int32 (length INCLUDES the current token)
    page_tables_ref,   # [batch, pages_per_seq_max] int32 (clamped in range)
    # inputs
    q_ref,             # [1, num_kv_heads, group, head_dim] VMEM
    k_new_ref,         # [1, num_kv_heads, head_dim] VMEM or None (fused write)
    v_new_ref,
    k_pages_hbm_ref,   # [num_kv_heads, num_pages, page_size, head_dim] HBM/ANY
    v_pages_hbm_ref,
    k_scale_rows_ref,  # [1, num_kv_heads, ctx_pad] f32 VMEM or None
    v_scale_rows_ref,
    # outputs
    o_ref,             # [1, num_kv_heads, group, head_dim] VMEM
    # scratch
    k_buf, v_buf,      # [2, pages_per_block, num_kv_heads, page_size, head_dim]
    k_sem, v_sem, wb_sem,
    *,
    pages_per_block: int,
    page_size: int,
    sm_scale: float,
    mask_value: float,
    sliding_window: int | None = None,
):
    b = pl.program_id(0)
    seq_len = seq_lens_ref[b]
    num_kv_heads, group, head_dim = (
        q_ref.shape[1], q_ref.shape[2], q_ref.shape[3])
    block_tokens = pages_per_block * page_size
    quantized = k_scale_rows_ref is not None
    fused_write = k_new_ref is not None

    num_blocks = pl.cdiv(seq_len, block_tokens)
    # Location of the CURRENT token (position seq_len-1) for the fused write.
    cur_logical = jnp.maximum(seq_len - 1, 0) // page_size
    cur_block = cur_logical // pages_per_block
    cur_j = jax.lax.rem(cur_logical, pages_per_block)  # page within block buf
    cur_off = jax.lax.rem(jnp.maximum(seq_len - 1, 0), page_size)
    cur_page = page_tables_ref[b, cur_logical]

    def writeback_copies(slot):
        """Push the patched current page (k and v) back to HBM."""
        return [
            pltpu.make_async_copy(k_buf.at[slot, cur_j],
                                  k_pages_hbm_ref.at[:, cur_page], wb_sem),
            pltpu.make_async_copy(v_buf.at[slot, cur_j],
                                  v_pages_hbm_ref.at[:, cur_page], wb_sem),
        ]

    def start_block(block_idx, slot):
        _PageGatherCopy(k_pages_hbm_ref, k_buf, k_sem, page_tables_ref,
                        b, block_idx, slot, pages_per_block).start()
        _PageGatherCopy(v_pages_hbm_ref, v_buf, v_sem, page_tables_ref,
                        b, block_idx, slot, pages_per_block).start()

    def wait_block(block_idx, slot):
        _PageGatherCopy(k_pages_hbm_ref, k_buf, k_sem, page_tables_ref,
                        b, block_idx, slot, pages_per_block).wait()
        _PageGatherCopy(v_pages_hbm_ref, v_buf, v_sem, page_tables_ref,
                        b, block_idx, slot, pages_per_block).wait()

    @pl.when(seq_len == 0)
    def _():
        # Inactive batch slot: emit zeros, no DMA, no write.
        o_ref[...] = jnp.zeros_like(o_ref)

    @pl.when(seq_len > 0)
    def _():
        # Whole blocks strictly below the sliding window carry no attended
        # tokens: skip their DMAs entirely.
        if sliding_window is None:
            first_block = 0
        else:
            first_block = (jnp.maximum(seq_len - sliding_window, 0)
                           // block_tokens)
        start_block(first_block, jax.lax.rem(first_block, 2))

        # [H, group, head_dim] fp32
        q = q_ref[0].astype(jnp.float32) * sm_scale

        def load_kv(buf, slot):
            # [ppb, H, ps, d] -> [H, ppb*ps, d] (leading-dim shuffle only; no
            # lane/sublane relayout).
            x = buf[slot]
            x = jnp.transpose(x, (1, 0, 2, 3))
            return x.reshape(num_kv_heads, block_tokens, head_dim).astype(
                jnp.float32)

        def body(i, carry):
            m_prev, l_prev, acc_prev = carry
            slot = jax.lax.rem(i, 2)

            @pl.when(i + 1 < num_blocks)
            def _():
                start_block(i + 1, jax.lax.rem(i + 1, 2))

            wait_block(i, slot)

            if fused_write:
                # Patch the current token's K/V row into the freshly gathered
                # page IN VMEM, then push just that page back to HBM while
                # attention computes on it. This replaces a whole separate
                # read-modify-write kernel per layer (TPU analog of
                # `reshape_and_cache`, `cache_kernels.cu:153-207`, fused into
                # the attention launch).
                @pl.when(i == cur_block)
                def _():
                    row = jax.lax.broadcasted_iota(
                        jnp.int32, (1, page_size, 1), 1)
                    hit = row == cur_off
                    k_buf[slot, cur_j] = jnp.where(
                        hit, k_new_ref[0][:, None, :], k_buf[slot, cur_j])
                    v_buf[slot, cur_j] = jnp.where(
                        hit, v_new_ref[0][:, None, :], v_buf[slot, cur_j])
                    for c in writeback_copies(slot):
                        c.start()

            tok0 = pl.multiple_of(i * block_tokens, block_tokens)
            k = load_kv(k_buf, slot)  # [H, bt, d]
            if quantized:
                ks = k_scale_rows_ref[0, :, pl.ds(tok0, block_tokens)]
                k = k * ks[:, :, None]

            # Batched over heads on the MXU: [H, g, d] x [H, bt, d] -> [H, g, bt]
            s = jax.lax.dot_general(
                q, k,
                dimension_numbers=(((2,), (2,)), ((0,), (0,))),
                preferred_element_type=jnp.float32,
            )

            token_pos = (
                i * block_tokens
                + jax.lax.broadcasted_iota(jnp.int32, s.shape, 2)
            )
            valid = token_pos < seq_len
            if sliding_window is not None:
                # Mistral-style window: the current token (pos seq_len-1)
                # attends to positions (seq_len-1-window, seq_len-1].
                valid &= token_pos >= seq_len - sliding_window
            s = jnp.where(valid, s, mask_value)

            m_cur = jnp.max(s, axis=-1, keepdims=True)          # [H, g, 1]
            m_next = jnp.maximum(m_prev, m_cur)
            alpha = jnp.exp(m_prev - m_next)
            p = jnp.exp(s - m_next)                             # [H, g, bt]
            l_next = alpha * l_prev + jnp.sum(p, axis=-1, keepdims=True)

            v = load_kv(v_buf, slot)  # [H, bt, d]
            if quantized:
                vs = v_scale_rows_ref[0, :, pl.ds(tok0, block_tokens)]
                v = v * vs[:, :, None]

            # [H, g, bt] x [H, bt, d] -> [H, g, d]
            o_cur = jax.lax.dot_general(
                p, v,
                dimension_numbers=(((2,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.float32,
            )
            acc_next = alpha * acc_prev + o_cur
            return m_next, l_next, acc_next

        m0 = jnp.full((num_kv_heads, group, 1), -jnp.inf, jnp.float32)
        l0 = jnp.zeros((num_kv_heads, group, 1), jnp.float32)
        acc0 = jnp.zeros((num_kv_heads, group, head_dim), jnp.float32)
        _, l, acc = jax.lax.fori_loop(first_block, num_blocks, body,
                                      (m0, l0, acc0))

        if fused_write:
            # The current page is always in the LAST block (the current token
            # is position seq_len-1), so its buffer slot is never reused by a
            # later gather; just await the write-back before the program ends.
            for c in writeback_copies(jax.lax.rem(num_blocks - 1, 2)):
                c.wait()

        l = jnp.where(l == 0.0, 1.0, l)
        o_ref[0] = (acc / l).astype(o_ref.dtype)


def _default_pages_per_block(page_size: int, pages_per_seq: int) -> int:
    """Aim for 128-token compute blocks (one lane-width of scores)."""
    if page_size >= 128:
        return 1
    return max(1, min(pages_per_seq, 128 // page_size))


@functools.partial(
    jax.jit,
    static_argnames=(
        "sm_scale", "pages_per_compute_block", "mask_value", "interpret",
        "sliding_window",
    ),
)
def paged_attention(
    q: jax.Array,            # [batch, num_q_heads, head_dim_q]
    k_pages: jax.Array,      # [num_kv_heads, num_pages, page_size, head_dim]
    v_pages: jax.Array,
    seq_lens: jax.Array,     # [batch] int32, length INCLUDING current token
    page_tables: jax.Array,  # [batch, pages_per_seq_max] int32
    *,
    sm_scale: float | None = None,
    pages_per_compute_block: int | None = None,
    k_scales: jax.Array | None = None,  # [num_kv_heads, num_pages, page_size]
    v_scales: jax.Array | None = None,
    k_new: jax.Array | None = None,  # [batch, num_kv_heads, head_dim_q]:
    v_new: jax.Array | None = None,  # fuse the current token's KV write
    sliding_window: int | None = None,
    mask_value: float = DEFAULT_MASK_VALUE,
    interpret: bool = False,
):
    """Single-token-per-sequence attention over a paged KV cache.

    The pool's head_dim may exceed q's (lane padding); q is zero-padded to match
    and the output sliced back. Unlike the reference (`vllmini/scheduler.py:96`
    passes seq_lens *excluding* the just-cached token, so a token never attends
    to itself — SURVEY.md "bugs"), `seq_lens` here includes the current token:
    KV for position `seq_lens-1` must already be written (cache-then-attend)
    — UNLESS `k_new`/`v_new` are given, in which case the kernel itself writes
    the current token's K/V into its page (patched in VMEM on the gathered
    page, pushed back to HBM while attention computes) and the call returns
    `(out, k_pages, v_pages)` with the pools aliased in-place. `k_new`/`v_new`
    must already be in the pool dtype (pre-quantized when the pool is int8/fp8,
    with their scales already scattered into the scale pools).
    """
    batch, num_q_heads, head_dim_q = q.shape
    num_kv_heads, num_pages, page_size, head_dim = k_pages.shape
    assert head_dim_q <= head_dim
    assert num_q_heads % num_kv_heads == 0
    group = num_q_heads // num_kv_heads
    pages_per_seq = page_tables.shape[1]
    fused_write = k_new is not None

    if sm_scale is None:
        sm_scale = head_dim_q ** -0.5
    if pages_per_compute_block is None:
        pages_per_compute_block = _default_pages_per_block(
            page_size, pages_per_seq)
    # The page table is processed in whole compute blocks; pad table length.
    if pages_per_seq % pages_per_compute_block != 0:
        pad = pages_per_compute_block - pages_per_seq % pages_per_compute_block
        page_tables = jnp.pad(page_tables, ((0, 0), (0, pad)))
        pages_per_seq += pad
    # Clamp sentinel/padding entries in range: the kernel DMAs pages by index
    # before masking, and an out-of-range DMA is undefined behavior.
    page_tables = jnp.clip(page_tables.astype(jnp.int32), 0, num_pages - 1)

    if head_dim_q < head_dim:
        q = jnp.pad(q, ((0, 0), (0, 0), (0, head_dim - head_dim_q)))

    quantized = k_scales is not None
    if quantized:
        assert v_scales is not None

    grid = (batch,)
    kernel = functools.partial(
        _paged_attention_kernel,
        pages_per_block=pages_per_compute_block,
        page_size=page_size,
        sm_scale=sm_scale,
        mask_value=mask_value,
        sliding_window=sliding_window,
    )

    def _kernel_entry(seq_lens_ref, page_tables_ref, q_ref, *rest):
        rest = list(rest)
        knr = vnr = None
        if fused_write:
            knr, vnr = rest.pop(0), rest.pop(0)
        k_in, v_in = rest.pop(0), rest.pop(0)  # pool inputs (ANY)
        ksr = vsr = None
        if quantized:
            ksr, vsr = rest.pop(0), rest.pop(0)
        o_ref = rest.pop(0)
        if fused_write:
            # Write (and read) through the aliased output refs.
            k_hbm, v_hbm = rest.pop(0), rest.pop(0)
        else:
            k_hbm, v_hbm = k_in, v_in
        kb, vb, ks, vs, wbs = rest
        kernel(seq_lens_ref, page_tables_ref, q_ref, knr, vnr, k_hbm, v_hbm,
               ksr, vsr, o_ref, kb, vb, ks, vs, wbs)

    in_specs = [
        pl.BlockSpec((1, num_kv_heads, group, head_dim),
                     lambda b, *_: (b, 0, 0, 0)),
    ]
    inputs = [q.reshape(batch, num_kv_heads, group, head_dim)]
    if fused_write:
        def pad_new(x):
            x = x.astype(k_pages.dtype)
            if x.shape[-1] < head_dim:
                x = jnp.pad(x, ((0, 0), (0, 0),
                                (0, head_dim - x.shape[-1])))
            return x.reshape(batch, num_kv_heads, head_dim)
        in_specs += [
            pl.BlockSpec((1, num_kv_heads, head_dim),
                         lambda b, *_: (b, 0, 0)),
            pl.BlockSpec((1, num_kv_heads, head_dim),
                         lambda b, *_: (b, 0, 0)),
        ]
        inputs += [pad_new(k_new), pad_new(v_new)]
    in_specs += [
        pl.BlockSpec(memory_space=pl.ANY),  # k_pages stays in HBM
        pl.BlockSpec(memory_space=pl.ANY),  # v_pages
    ]
    inputs += [k_pages, v_pages]
    if quantized:
        # Pre-gather per-sequence dense scale rows [batch, kv_heads, ctx_pad]:
        # a handful of KB, and it sidesteps Mosaic's inability to DMA-slice
        # sub-lane-width scale pages.
        def rows(scales):
            g = scales[:, page_tables]                 # [Hkv, B, pages, ps]
            return g.transpose(1, 0, 2, 3).reshape(
                batch, num_kv_heads, pages_per_seq * page_size
            ).astype(jnp.float32)
        ctx_pad = pages_per_seq * page_size
        in_specs += [
            pl.BlockSpec((1, num_kv_heads, ctx_pad), lambda b, *_: (b, 0, 0)),
            pl.BlockSpec((1, num_kv_heads, ctx_pad), lambda b, *_: (b, 0, 0)),
        ]
        inputs += [rows(k_scales), rows(v_scales)]

    scratch_shapes = [
        pltpu.VMEM((2, pages_per_compute_block, num_kv_heads, page_size,
                    head_dim), k_pages.dtype),
        pltpu.VMEM((2, pages_per_compute_block, num_kv_heads, page_size,
                    head_dim), v_pages.dtype),
        pltpu.SemaphoreType.DMA,
        pltpu.SemaphoreType.DMA,
        pltpu.SemaphoreType.DMA,
    ]

    o_spec = pl.BlockSpec((1, num_kv_heads, group, head_dim),
                          lambda b, *_: (b, 0, 0, 0))
    o_shape = jax.ShapeDtypeStruct(
        (batch, num_kv_heads, group, head_dim), q.dtype)
    if fused_write:
        out_specs = (o_spec, pl.BlockSpec(memory_space=pl.ANY),
                     pl.BlockSpec(memory_space=pl.ANY))
        out_shape = (o_shape,
                     jax.ShapeDtypeStruct(k_pages.shape, k_pages.dtype),
                     jax.ShapeDtypeStruct(v_pages.shape, v_pages.dtype))
        # Operand order incl. 2 scalar-prefetch args: seq_lens(0), tables(1),
        # q(2), k_new(3), v_new(4), k_pages(5), v_pages(6) -> outputs 1, 2.
        io_aliases = {5: 1, 6: 2}
    else:
        out_specs = o_spec
        out_shape = o_shape
        io_aliases = {}

    call = pl.pallas_call(
        _kernel_entry,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=grid,
            in_specs=in_specs,
            out_specs=out_specs,
            scratch_shapes=scratch_shapes,
        ),
        out_shape=out_shape,
        input_output_aliases=io_aliases,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",),
            has_side_effects=fused_write,
        ),
        interpret=interpret,
    )
    result = call(seq_lens.astype(jnp.int32), page_tables, *inputs)

    if fused_write:
        out, k_pages, v_pages = result
    else:
        out = result
    out = out.reshape(batch, num_q_heads, head_dim)
    if head_dim_q < head_dim:
        out = out[:, :, :head_dim_q]
    if fused_write:
        return out, k_pages, v_pages
    return out


def paged_attention_reference(
    q, k_pages, v_pages, seq_lens, page_tables, *, sm_scale=None,
    k_scales=None, v_scales=None, sliding_window=None,
):
    """Naive jnp oracle for tests (gather pages, full softmax). O(batch*ctx)."""
    batch, num_q_heads, head_dim_q = q.shape
    num_kv_heads, num_pages, page_size, head_dim = k_pages.shape
    group = num_q_heads // num_kv_heads
    if sm_scale is None:
        sm_scale = head_dim_q ** -0.5
    page_tables = jnp.clip(page_tables, 0, num_pages - 1)
    max_ctx = page_tables.shape[1] * page_size

    # Gather per-sequence contiguous K/V: [batch, num_kv_heads, max_ctx, head_dim]
    gathered_k = k_pages[:, page_tables]  # [kvh, batch, pages, psize, hd]
    gathered_v = v_pages[:, page_tables]
    if k_scales is not None:
        ks = k_scales[:, page_tables][..., None]
        vs = v_scales[:, page_tables][..., None]
        gathered_k = gathered_k.astype(jnp.float32) * ks
        gathered_v = gathered_v.astype(jnp.float32) * vs
    k = gathered_k.transpose(1, 0, 2, 3, 4).reshape(
        batch, num_kv_heads, max_ctx, head_dim).astype(jnp.float32)
    v = gathered_v.transpose(1, 0, 2, 3, 4).reshape(
        batch, num_kv_heads, max_ctx, head_dim).astype(jnp.float32)
    k = k[..., :head_dim_q]
    v = v[..., :head_dim_q]

    qf = q.reshape(batch, num_kv_heads, group, head_dim_q).astype(jnp.float32)
    s = jnp.einsum("bhgd,bhtd->bhgt", qf, k) * sm_scale
    pos = jnp.arange(max_ctx)[None, None, None, :]
    mask = pos < seq_lens[:, None, None, None]
    if sliding_window is not None:
        mask &= pos >= (seq_lens[:, None, None, None] - sliding_window)
    s = jnp.where(mask, s, -jnp.inf)
    p = jax.nn.softmax(s, axis=-1)
    p = jnp.where(seq_lens[:, None, None, None] > 0, p, 0.0)
    o = jnp.einsum("bhgt,bhtd->bhgd", p, v)
    return o.reshape(batch, num_q_heads, head_dim_q).astype(q.dtype)
