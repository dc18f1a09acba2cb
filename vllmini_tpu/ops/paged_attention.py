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
    """Async-gather of a compute block's non-contiguous KV pages — for ALL
    the program's sequences at once — into one VMEM slot, ALL HEADS per page
    in a single strided DMA.

    `pages_hbm_ref.at[:, page]` is a strided slice (head stride = pool
    pages*page_size*head_dim); the DMA engine walks it natively, so one
    descriptor moves `num_kv_heads x page_size x head_dim` bytes. All
    `seqs_per_program * pages_per_block` descriptors go in flight together —
    batching sequences per program amortizes the wait latency that dominates
    a one-sequence-per-program grid.
    """

    def __init__(self, pages_hbm_ref, vmem_buf, sem, page_tables_ref,
                 seq0, seqs_per_program, block_idx, slot, pages_per_block):
        self._copies = []
        for s in range(seqs_per_program):
            for j in range(pages_per_block):
                page_idx = page_tables_ref[
                    seq0 + s, block_idx * pages_per_block + j]
                self._copies.append(
                    pltpu.make_async_copy(
                        pages_hbm_ref.at[:, page_idx],  # [H, rows, lane_w]
                        vmem_buf.at[slot, s, j],
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
    q_ref,             # [S, num_kv_heads, group, head_dim] VMEM (LOGICAL d)
    k_new_ref,         # [S, num_kv_heads, packing*head_dim] VMEM or None;
    v_new_ref,         #   packed layouts pre-place the token's lanes
    k_self_ref,        # [S, num_kv_heads, head_dim] RAW (unquantized) current
    v_self_ref,        #   token K/V for the in-register self-attention term
    k_pages_hbm_ref,   # [num_kv_heads, num_pages, page_size/packing,
    v_pages_hbm_ref,   #   packing*head_dim] HBM/ANY
    k_scale_rows_ref,  # [S, packing, num_kv_heads, ctx_pad/packing] f32|None
    v_scale_rows_ref,
    # outputs
    o_ref,             # [S, num_kv_heads, group, head_dim] VMEM
    # scratch
    k_buf, v_buf,      # [2, S, ppb, num_kv_heads, rows, packing*d]
    k_wb, v_wb,        # [S, num_kv_heads, rows, packing*d] writeback staging
    k_sem, v_sem, wb_sem,
    *,
    pages_per_block: int,
    page_size: int,          # LOGICAL tokens per page
    sm_scale: float,
    mask_value: float,
    sliding_window: int | None = None,
    packing: int = 1,
    seqs_per_program: int = 1,
):
    """One grid program handles `seqs_per_program` (S) sequences: their page
    gathers go in flight together and all math is batched over the extra S
    dim, amortizing the DMA-wait latency that dominates one-seq programs.

    packing > 1: `packing` adjacent tokens share one 128-lane pool row
    (lane block l holds token row*packing+l). Scores become `packing` batched
    dots of q placed in lane block l against the packed rows — same MXU MACs
    as the lane-padded layout, HALF (for packing=2) the HBM traffic."""
    g_id = pl.program_id(0)
    S = seqs_per_program
    seq0 = g_id * S
    num_kv_heads, group, head_dim = (
        q_ref.shape[1], q_ref.shape[2], q_ref.shape[3])
    P = packing
    block_tokens = pages_per_block * page_size
    block_rows = block_tokens // P
    page_rows = page_size // P
    lane_w = P * head_dim
    quantized = k_scale_rows_ref is not None
    fused_write = k_new_ref is not None

    sl_vec = jnp.stack([seq_lens_ref[seq0 + s] for s in range(S)])  # [S]
    max_len = jnp.max(sl_vec)
    num_blocks = pl.cdiv(max_len, block_tokens)
    # Location of each member's CURRENT token (position sl-1), fused write.
    pos_vec = jnp.maximum(sl_vec - 1, 0)
    cur_logical = pos_vec // page_size
    cur_block_vec = cur_logical // pages_per_block
    cur_j_vec = jax.lax.rem(cur_logical, pages_per_block)
    cur_off = jax.lax.rem(pos_vec, page_size)
    cur_row_vec = cur_off // P
    cur_lb_vec = jax.lax.rem(cur_off, P)
    cur_pages = [page_tables_ref[seq0 + s, cur_logical[s]] for s in range(S)]

    def member_writeback(s):
        """The member's patched current page (staged in k_wb/v_wb, so later
        gathers reusing the double buffers cannot clobber it) -> HBM."""
        return [
            pltpu.make_async_copy(
                k_wb.at[s], k_pages_hbm_ref.at[:, cur_pages[s]], wb_sem),
            pltpu.make_async_copy(
                v_wb.at[s], v_pages_hbm_ref.at[:, cur_pages[s]], wb_sem),
        ]

    def start_block(block_idx, slot):
        _PageGatherCopy(k_pages_hbm_ref, k_buf, k_sem, page_tables_ref,
                        seq0, S, block_idx, slot, pages_per_block).start()
        _PageGatherCopy(v_pages_hbm_ref, v_buf, v_sem, page_tables_ref,
                        seq0, S, block_idx, slot, pages_per_block).start()

    def wait_block(block_idx, slot):
        _PageGatherCopy(k_pages_hbm_ref, k_buf, k_sem, page_tables_ref,
                        seq0, S, block_idx, slot, pages_per_block).wait()
        _PageGatherCopy(v_pages_hbm_ref, v_buf, v_sem, page_tables_ref,
                        seq0, S, block_idx, slot, pages_per_block).wait()

    @pl.when(max_len == 0)
    def _():
        # All member slots inactive: emit zeros, no DMA, no write.
        o_ref[...] = jnp.zeros_like(o_ref)

    @pl.when(max_len > 0)
    def _():
        # Whole blocks strictly below every member's sliding window carry no
        # attended tokens: skip their DMAs entirely.
        if sliding_window is None:
            first_block = 0
        else:
            first_block = jnp.min(
                jnp.maximum(sl_vec - sliding_window, 0)) // block_tokens
        start_block(first_block, jax.lax.rem(first_block, 2))

        SH = S * num_kv_heads
        # Mosaic matmul supports ONE batch dim: merge (S, H) -> SH.
        # [SH, group, head_dim] fp32 (logical d)
        q = q_ref[...].astype(jnp.float32).reshape(
            SH, group, head_dim) * sm_scale
        # q placed in each lane block (static pads; P copies).
        q_lanes = [
            jnp.pad(q, ((0, 0), (0, 0),
                        (l * head_dim, (P - 1 - l) * head_dim)))
            for l in range(P)
        ]
        def per_member_mask(fn):
            """[SH, group, block_rows] bool from a scalar-threshold predicate
            per member (concat of broadcasts; no reshapes — Mosaic rejects
            sublane-merging shape casts on small int vectors)."""
            return jnp.concatenate(
                [jnp.broadcast_to(fn(sl_vec[s]),
                                  (num_kv_heads,) + fn(sl_vec[s]).shape[1:])
                 for s in range(S)], axis=0)

        def load_kv(buf, slot):
            # [S, ppb, H, rows, P*d] -> [SH, ppb*rows, P*d] (leading-dim
            # shuffle only; no lane/sublane relayout).
            x = buf[slot]
            x = jnp.transpose(x, (0, 2, 1, 3, 4))
            return x.reshape(SH, block_rows, lane_w).astype(jnp.float32)

        def body(i, carry):
            m_prev, l_prev, acc_prev = carry
            slot = jax.lax.rem(i, 2)

            @pl.when(i + 1 < num_blocks)
            def _():
                start_block(i + 1, jax.lax.rem(i + 1, 2))

            wait_block(i, slot)

            if fused_write:
                # Stage each member's current page with the current token's
                # K/V lanes patched in (k_new_ref is pre-placed at the
                # member's lane block) for the write-back that makes it
                # visible to FUTURE steps. THIS step's attention never reads
                # it from the page: the self-token term is computed
                # in-register from k_self/v_self after the loop, so the
                # gathered buffers stay read-only. Replaces a separate RMW
                # kernel per layer (TPU analog of `reshape_and_cache`,
                # `cache_kernels.cu:153-207`).
                for s in range(S):
                    @pl.when((i == cur_block_vec[s]) & (sl_vec[s] > 0))
                    def _(s=s):
                        row = jax.lax.broadcasted_iota(
                            jnp.int32, (1, page_rows, lane_w), 1)
                        hit = row == cur_row_vec[s]
                        if P > 1:
                            lane_block = jax.lax.broadcasted_iota(
                                jnp.int32, (1, page_rows, lane_w),
                                2) // head_dim
                            hit = hit & (lane_block == cur_lb_vec[s])
                        jm = cur_j_vec[s]
                        k_wb[s] = jnp.where(hit, k_new_ref[s][:, None, :],
                                            k_buf[slot, s, jm])
                        v_wb[s] = jnp.where(hit, v_new_ref[s][:, None, :],
                                            v_buf[slot, s, jm])

            row0 = pl.multiple_of(i * block_rows, block_rows)
            k = load_kv(k_buf, slot)  # [SH, bR, P*d]

            # Scores per lane block: s_l[sh, g, R] = q . token(R*P + l).
            s_list = []
            for l in range(P):
                s = jax.lax.dot_general(
                    q_lanes[l], k,
                    dimension_numbers=(((2,), (2,)), ((0,), (0,))),
                    preferred_element_type=jnp.float32,
                )  # [SH, g, bR]
                if quantized:
                    ks = k_scale_rows_ref[
                        :, l, :, pl.ds(row0, block_rows)].reshape(
                            SH, block_rows)
                    s = s * ks[:, None, :]
                token_pos = (
                    i * block_tokens + l
                    + P * jax.lax.broadcasted_iota(
                        jnp.int32, (1, group, block_rows), 2)
                )  # [1, g, bR], same for every (seq, head) row

                def _valid(sl, token_pos=token_pos):
                    v = token_pos < (sl - 1 if fused_write else sl)
                    if sliding_window is not None:
                        # Mistral-style window: the current token (pos sl-1)
                        # attends to positions (sl-1-window, sl-1].
                        v &= token_pos >= sl - sliding_window
                    return v
                valid = per_member_mask(_valid)       # [SH, g, bR]
                s_list.append(jnp.where(valid, s, mask_value))

            m_cur = s_list[0].max(axis=-1, keepdims=True)
            for s in s_list[1:]:
                m_cur = jnp.maximum(m_cur, s.max(axis=-1, keepdims=True))
            m_next = jnp.maximum(m_prev, m_cur)
            alpha = jnp.exp(m_prev - m_next)

            v = load_kv(v_buf, slot)  # [SH, bR, P*d]
            l_add = jnp.zeros_like(l_prev)
            o_cur = jnp.zeros_like(acc_prev)
            for l in range(P):
                p = jnp.exp(s_list[l] - m_next)                # [SH, g, bR]
                l_add += jnp.sum(p, axis=-1, keepdims=True)
                if quantized:
                    vs = v_scale_rows_ref[
                        :, l, :, pl.ds(row0, block_rows)].reshape(
                            SH, block_rows)
                    p = p * vs[:, None, :]
                # [SH, g, bR] x [SH, bR, P*d] -> [SH, g, P*d]; only lane
                # block l carries sum(p_l * v_token(R*P+l)).
                full = jax.lax.dot_general(
                    p, v,
                    dimension_numbers=(((2,), (1,)), ((0,), (0,))),
                    preferred_element_type=jnp.float32,
                )
                o_cur += full[..., l * head_dim:(l + 1) * head_dim]

            l_next = alpha * l_prev + l_add
            acc_next = alpha * acc_prev + o_cur
            return m_next, l_next, acc_next

        SH_ = S * num_kv_heads
        m0 = jnp.full((SH_, group, 1), -jnp.inf, jnp.float32)
        l0 = jnp.zeros((SH_, group, 1), jnp.float32)
        acc0 = jnp.zeros((SH_, group, head_dim), jnp.float32)
        m, l, acc = jax.lax.fori_loop(first_block, num_blocks, body,
                                      (m0, l0, acc0))

        if fused_write:
            # Self-token attention term, computed from the RAW (unquantized)
            # current K/V in VMEM — exact, and it frees the page path from
            # having to see this step's write.
            ksf = k_self_ref[...].astype(jnp.float32).reshape(
                SH_, 1, head_dim)
            vsf = v_self_ref[...].astype(jnp.float32).reshape(
                SH_, 1, head_dim)
            s_self = jnp.sum(q * ksf, axis=-1, keepdims=True)  # [SH, g, 1]
            zero1 = jnp.zeros((1, group, 1), jnp.int32)
            alive = per_member_mask(lambda sl: zero1 < sl)
            s_self = jnp.where(alive, s_self, mask_value)
            m_f = jnp.maximum(m, s_self)
            alpha = jnp.exp(m - m_f)
            p_self = jnp.exp(s_self - m_f)
            l = alpha * l + p_self
            acc = alpha * acc + p_self * vsf

        if fused_write:
            # All members' current pages are staged in the wb buffers by the
            # end of the loop; one batch of write-backs, awaited before the
            # program ends (next program's gathers reuse the double buffers,
            # but never the staging buffers). Inactive members (seq_len 0)
            # write NOTHING — the kernel contract the engine's slot lifecycle
            # relies on.
            for s in range(S):
                @pl.when(sl_vec[s] > 0)
                def _(s=s):
                    for c in member_writeback(s):
                        c.start()
            for s in range(S):
                @pl.when(sl_vec[s] > 0)
                def _(s=s):
                    for c in member_writeback(s):
                        c.wait()

        l = jnp.where(l == 0.0, 1.0, l)
        out = acc / l
        # Members with seq_len == 0 saw only masked (finite mask_value)
        # scores — their softmax is garbage, not zero. Zero them explicitly.
        zeros1 = jnp.zeros((1, group, head_dim), jnp.int32)
        active_mask = per_member_mask(lambda sl: zeros1 < sl)  # [SH, g, d]
        out = jnp.where(active_mask, out, 0.0)
        o_ref[...] = out.reshape(S, num_kv_heads, group,
                                 head_dim).astype(o_ref.dtype)


import os


def _default_pages_per_block(page_size: int, pages_per_seq: int) -> int:
    """Aim for 256-token compute blocks (two lane-widths of scores)."""
    target = int(os.environ.get("VLLMINI_BLOCK_TOKENS", "128"))
    if page_size >= target:
        return 1
    return max(1, min(pages_per_seq, target // page_size))


@functools.partial(
    jax.jit,
    static_argnames=(
        "sm_scale", "pages_per_compute_block", "mask_value", "interpret",
        "sliding_window", "packing", "seqs_per_program",
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
    k_new_raw: jax.Array | None = None,  # unquantized current K/V for the
    v_new_raw: jax.Array | None = None,  # self term (default: k_new/v_new)
    sliding_window: int | None = None,
    packing: int = 1,
    seqs_per_program: int | None = None,
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
    num_kv_heads, num_pages, pool_rows, lane_w = k_pages.shape
    page_size = pool_rows * packing       # logical tokens per page
    head_dim = lane_w // packing          # pool's per-token lane width
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
    if k_scales is not None:
        # The kernel slices the pre-gathered scale rows at offset
        # block_index * block_rows on their last dim; Mosaic requires that
        # offset be 128-aligned. Grow the compute block until
        # block_tokens/packing is a multiple of 128 (or covers the table).
        while ((pages_per_compute_block * page_size // packing) % 128 != 0
               and pages_per_compute_block < pages_per_seq):
            pages_per_compute_block += 1
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

    # Sequences per grid program: batch the page gathers of several sequences
    # into one DMA wait (the wait latency, not bandwidth, dominates a
    # one-seq-per-program grid at serving batch sizes). Auto-selection also
    # respects the ~16 MB VMEM budget: double-buffered K+V blocks plus the
    # write-back staging pages scale with spp x pages_per_block x kv_heads.
    if seqs_per_program is None:
        want = int(os.environ.get("VLLMINI_SPP", "8"))
        spp = next(s for s in (want, 8, 4, 2, 1)
                   if s >= 1 and batch % s == 0)
        page_bytes = (num_kv_heads * pool_rows * lane_w
                      * jnp.dtype(k_pages.dtype).itemsize)
        per_seq_scratch = (4 * pages_per_compute_block + 2) * page_bytes
        # Mosaic's true scoped-vmem footprint runs ~2.2x this estimate
        # (pipelined input blocks, sublane padding) against a hard 16 MB
        # scoped limit — 7.2e6 modeled bytes is the measured safe cap
        # (GPT-2 124M spp=8 at 7.08e6 fits; GPT-2 XL spp=4 at 7.37e6
        # overflows by 2%).
        budget = 7_200_000
        while spp > 1 and spp * per_seq_scratch > budget:
            spp //= 2
        while batch % spp != 0:
            spp -= 1
        seqs_per_program = spp
    assert batch % seqs_per_program == 0
    spp = seqs_per_program

    grid = (batch // spp,)
    kernel = functools.partial(
        _paged_attention_kernel,
        pages_per_block=pages_per_compute_block,
        page_size=page_size,
        sm_scale=sm_scale,
        mask_value=mask_value,
        sliding_window=sliding_window,
        packing=packing,
        seqs_per_program=spp,
    )

    def _kernel_entry(seq_lens_ref, page_tables_ref, q_ref, *rest):
        rest = list(rest)
        knr = vnr = ksl = vsl = None
        if fused_write:
            knr, vnr = rest.pop(0), rest.pop(0)
            ksl, vsl = rest.pop(0), rest.pop(0)
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
        kb, vb, kw, vw, ks, vs, wbs = rest
        kernel(seq_lens_ref, page_tables_ref, q_ref, knr, vnr, ksl, vsl,
               k_hbm, v_hbm, ksr, vsr, o_ref, kb, vb, kw, vw, ks, vs, wbs)

    in_specs = [
        pl.BlockSpec((spp, num_kv_heads, group, head_dim),
                     lambda b, *_: (b, 0, 0, 0)),
    ]
    inputs = [q.reshape(batch, num_kv_heads, group, head_dim)]
    if fused_write:
        def pack_new(x):
            x = x.astype(k_pages.dtype)
            if x.shape[-1] < head_dim:
                x = jnp.pad(x, ((0, 0), (0, 0),
                                (0, head_dim - x.shape[-1])))
            if packing == 1:
                return x.reshape(batch, num_kv_heads, lane_w)
            # Place the token's d values in its lane block (token position
            # mod packing) so the kernel's patch is a plain masked select.
            lb = jnp.maximum(seq_lens.astype(jnp.int32) - 1, 0) % packing
            onehot = jax.nn.one_hot(lb, packing, dtype=x.dtype)  # [B, P]
            placed = jnp.einsum("bp,bhd->bhpd", onehot, x)
            return placed.reshape(batch, num_kv_heads, lane_w)
        in_specs += [
            pl.BlockSpec((spp, num_kv_heads, lane_w),
                         lambda b, *_: (b, 0, 0)),
            pl.BlockSpec((spp, num_kv_heads, lane_w),
                         lambda b, *_: (b, 0, 0)),
        ]
        inputs += [pack_new(k_new), pack_new(v_new)]
        # Raw (unquantized) current-token K/V for the in-register self term.
        def pad_self(x):
            if x.shape[-1] < head_dim:
                x = jnp.pad(x, ((0, 0), (0, 0),
                                (0, head_dim - x.shape[-1])))
            return x
        if quantized and k_new_raw is None:
            raise ValueError(
                "quantized pools need k_new_raw/v_new_raw (unquantized "
                "current-token K/V) alongside the quantized k_new/v_new")
        k_self = pad_self(k_new if k_new_raw is None else k_new_raw)
        v_self = pad_self(v_new if v_new_raw is None else v_new_raw)
        self_spec = pl.BlockSpec((spp, num_kv_heads, head_dim),
                                 lambda b, *_: (b, 0, 0))
        in_specs += [self_spec, self_spec]
        inputs += [k_self, v_self]
    in_specs += [
        pl.BlockSpec(memory_space=pl.ANY),  # k_pages stays in HBM
        pl.BlockSpec(memory_space=pl.ANY),  # v_pages
    ]
    inputs += [k_pages, v_pages]
    if quantized:
        # Pre-gather per-sequence dense scale rows, de-interleaved by lane
        # block: [batch, kv_heads, packing, ctx_pad/packing]. A handful of
        # KB, and it sidesteps Mosaic's inability to DMA-slice sub-lane-width
        # scale pages.
        def rows(scales):
            g = scales[:, page_tables]                 # [Hkv, B, pages, ps]
            r = g.transpose(1, 0, 2, 3).reshape(
                batch, num_kv_heads, pages_per_seq * page_size)
            # [B, P, Hkv, ctx/P]: packing as a LEADING dim — a (P, ctxR)
            # trailing pair would sublane-pad P=2 rows to 8 (4x VMEM waste).
            r = r.reshape(batch, num_kv_heads, -1,
                          packing).transpose(0, 3, 1, 2)
            return r.astype(jnp.float32)
        ctx_rows = pages_per_seq * page_size // packing
        scale_spec = pl.BlockSpec((spp, packing, num_kv_heads, ctx_rows),
                                  lambda b, *_: (b, 0, 0, 0))
        in_specs += [scale_spec, scale_spec]
        inputs += [rows(k_scales), rows(v_scales)]

    scratch_shapes = [
        pltpu.VMEM((2, spp, pages_per_compute_block, num_kv_heads, pool_rows,
                    lane_w), k_pages.dtype),
        pltpu.VMEM((2, spp, pages_per_compute_block, num_kv_heads, pool_rows,
                    lane_w), v_pages.dtype),
        pltpu.VMEM((spp, num_kv_heads, pool_rows, lane_w), k_pages.dtype),
        pltpu.VMEM((spp, num_kv_heads, pool_rows, lane_w), v_pages.dtype),
        pltpu.SemaphoreType.DMA,
        pltpu.SemaphoreType.DMA,
        pltpu.SemaphoreType.DMA,
    ]

    o_spec = pl.BlockSpec((spp, num_kv_heads, group, head_dim),
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
        # q(2), k_new(3), v_new(4), k_self(5), v_self(6), k_pages(7),
        # v_pages(8) -> outputs 1, 2.
        io_aliases = {7: 1, 8: 2}
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


def unpack_pages(pages: jax.Array, packing: int) -> jax.Array:
    """Packed [H, P, rows, packing*d] -> per-token [H, P, rows*packing, d]."""
    if packing == 1:
        return pages
    H, Pg, rows, lanes = pages.shape
    return pages.reshape(H, Pg, rows * packing, lanes // packing)


def paged_attention_reference(
    q, k_pages, v_pages, seq_lens, page_tables, *, sm_scale=None,
    k_scales=None, v_scales=None, sliding_window=None, packing=1,
):
    """Naive jnp oracle for tests (gather pages, full softmax). O(batch*ctx)."""
    k_pages = unpack_pages(k_pages, packing)
    v_pages = unpack_pages(v_pages, packing)
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
