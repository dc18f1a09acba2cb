"""Token-major paged-attention decode kernel (Pallas/TPU).

TPU-native counterpart of the reference's `paged_attention_v1`/`v2` CUDA kernels
(`/root/reference/paged_attention_ext/paged_attention_cuda/attention_kernels.cu:86-496,
528-990`). Design (second generation, replacing the head-major packed pool):

- **Token-major, K/V-interleaved pages**: the pool is ONE array
  `[num_pages, 2, page_size, row_width]` (plane 0 = K, plane 1 = V) with
  `row_width = align(num_kv_heads * head_dim, 128)` — a page row holds one
  token's K (or V) for ALL heads, and a page holds its K and V planes
  contiguously. One page gather is therefore ONE contiguous DMA descriptor
  covering both K and V (the head-major layout cost 2 x num_kv_heads-segment
  strided copies per page). Decode attention at serving batch sizes is bound
  by DMA-descriptor issue rate on the scalar core (~0.15 us each), so
  descriptor count IS the cost model.
- **Per-page conditional gathers**: pages holding no attendable token for
  their sequence (beyond its length, before its sliding window, block
  padding) skip their DMA entirely — gather traffic is exactly
  ceil(len/page_size) pages per sequence even in ragged batches.
- **Block-diagonal-Q MXU matmuls**: scores for a group of `hpm` KV heads are
  ONE real matmul `q_bd [M, hpm*d] @ k_block^T` with `M = hpm * group` query
  rows, instead of per-(seq, head) M=1 dots that run the MXU at 1/128
  utilization while Mosaic loops the batch dim. `q_bd` places head h's query
  at lane block h — the off-diagonal MACs are zeros (hpm-fold redundancy,
  ~1% of streamed-bytes budget for MHA shapes). `hpm` is auto-selected: full
  merge for MHA, small groups for GQA where redundancy would cost real FLOPs.
- **Online softmax** (running max m, normalizer l, fp32 accumulators) over
  compute blocks of `pages_per_compute_block` pages — the flash-decoding
  structure of `attention_kernels.cu:534-669`.
- **Fused current-token write**: the token's K/V rows are patched into the
  already-gathered current page with a masked select and the page (both
  planes) is written back with ONE descriptor — the TPU shape of
  `reshape_and_cache` (`cache_kernels.cu:153-207`) fused into the attention
  launch. (Mosaic DMA slices must be sublane-tile aligned, so a bare row
  store is not expressible.) THIS step's self-attention term is merged
  OUTSIDE the kernel in plain XLA from the raw values, so the gathered pages
  stay read-only in-step.
- **LSE outputs + outside merge** also let one sequence's KV be split over
  `kv_partitions` grid programs and renormalization-merged — the analog of
  `paged_attention_v2`'s PARTITION_SIZE grid split + reduce kernel
  (`attention_kernels.cu:845-928`) for long-context low-batch decode.
- int8 / fp8 KV with per-token-per-head scales dequantized via the scores
  (scale factors commute out of the dot products), the TPU shape of the
  reference's fp8 `scaled_convert` (`quantization/fp8/**`).

Hardware contract: `row_width` must be a multiple of 128 and `page_size` a
multiple of the pool dtype's sublane tile (8 f32 / 16 bf16 / 32 int8|fp8).
"""

from __future__ import annotations

import functools
import os
from typing import NamedTuple

import jax
import numpy as np
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# -0.7 * max-float instead of -inf: avoids NaN from exp(-inf - (-inf)).
DEFAULT_MASK_VALUE = -0.7 * float(jnp.finfo(jnp.float32).max)


def align_row_width(num_kv_heads: int, head_dim: int, shards: int = 1) -> int:
    """Pool row width: per-TP-shard lane width rounded up to the 128-lane
    tile. With `shards` > 1 each shard's `(H/shards)*d` slice is padded
    independently so shard_map slices stay 128-aligned."""
    assert num_kv_heads % shards == 0
    per = (num_kv_heads // shards) * head_dim
    return shards * ((per + 127) // 128 * 128)


class BlockSparse(NamedTuple):
    """Block-sparse attention pattern (`attention_kernels.cu:105-110,
    211-241` — the reference's IS_BLOCK_SPARSE template path, vLLM's
    Phi-3-Small pattern): KV sparsity block b is attended iff it is LOCAL
    (within `local_blocks` of the query's block) or REMOTE
    ((b + head_phase) % vert_stride == 0). `head_sliding_step >= 0` slides
    the phase per Q head, < 0 per KV head; `tp_rank` offsets the phase per
    tensor-parallel shard. Masking here is token-granular (the reference
    skips whole KV pages, which over-attends when its page size does not
    divide `block_size`)."""

    local_blocks: int
    vert_stride: int
    block_size: int
    head_sliding_step: int = 0
    tp_rank: int = 0


def default_alibi_slopes(num_heads: int) -> tuple:
    """Standard ALiBi geometric slopes (Press et al.; the HF/BLOOM
    construction for non-power-of-two head counts)."""
    import math

    def pow2_slopes(n):
        start = 2.0 ** (-(2.0 ** -(math.log2(n) - 3)))
        return [start * (start ** i) for i in range(n)]

    n2 = 2 ** int(math.floor(math.log2(num_heads)))
    slopes = pow2_slopes(n2)
    if n2 != num_heads:
        extra = pow2_slopes(2 * n2)[0::2][: num_heads - n2]
        slopes += extra
    return tuple(slopes)


def select_heads_per_matmul(num_kv_heads: int, group: int,
                            head_dim: int) -> int:
    """Pick `hpm`: how many KV heads share one block-diagonal score matmul.

    Larger hpm -> more query rows per MXU pass (M = hpm*group) but hpm-fold
    redundant MACs. MHA (group 1) merges everything; GQA stops once M >= 8.
    A lane-group split (hpm < H) requires 128-aligned slices, i.e.
    (hpm*head_dim) % 128 == 0."""
    env = os.environ.get("VLLMINI_HPM")
    if env:
        return int(env)
    for h in range(1, num_kv_heads + 1):
        if num_kv_heads % h:
            continue
        if (h * head_dim) % 128 != 0 and h != num_kv_heads:
            continue
        if h * group >= 8:
            return h
    return num_kv_heads


def _build_q_blockdiag(q: jax.Array, num_kv_heads: int, hpm: int,
                       sm_scale: float, row_width: int) -> jax.Array:
    """[B, H_q, d] -> block-diagonal [B, G, M, Kd] with head h's (scaled)
    query at lane block h of its group; G = H/hpm, M = hpm*group,
    Kd = hpm*d (padded to row_width when G == 1)."""
    B, H_q, d = q.shape
    G = num_kv_heads // hpm
    group = H_q // num_kv_heads
    q5 = (q.astype(jnp.float32) * sm_scale).reshape(B, G, hpm, group, d)
    eye = jnp.eye(hpm, dtype=jnp.float32)
    q_bd = jnp.einsum("bGhgd,hp->bGhgpd", q5, eye).reshape(
        B, G, hpm * group, hpm * d)
    if G == 1 and hpm * d < row_width:
        q_bd = jnp.pad(q_bd, ((0, 0), (0, 0), (0, 0),
                              (0, row_width - hpm * d)))
    return q_bd.astype(q.dtype)


class _PageGather:
    """Async gather of one compute block's pages — every page ONE contiguous
    DMA covering both K and V planes — for all the program's sequences at
    once, SKIPPING pages that hold no attendable token for their sequence
    (the DMA-descriptor issue rate on the scalar core is the binding cost,
    so every skipped page is ~0.15 us back).

    Contiguity fast path (r5): when a member's pages for this block are
    physically CONSECUTIVE (the allocator's run-granular mode makes this
    the common case) and every page is attendable, the whole block moves
    with ONE multi-page DMA instead of pages_per_block descriptors. The
    check is per (member, block) at runtime, so arbitrary tables (COW
    forks, fragmented pools, prefix-cache adoption) stay correct through
    the per-page path. `VLLMINI_GATHER_RUNS=0` disables it for A/B."""

    def __init__(self, pages_hbm_ref, vmem_buf, sem, page_tables_ref,
                 seq0, seqs_per_program, block_idx, slot, pages_per_block,
                 page_size, lim_vec, ws_vec):
        self._buf = vmem_buf
        self._items = []
        self._runs = []
        ppb = pages_per_block
        # The fast-path copy slices [base, base+ppb) of the physical pool:
        # its STATIC size must fit the pool even though the predicate keeps
        # out-of-bounds bases from ever issuing (tiny test pools can be
        # smaller than one compute block).
        use_runs = (ppb > 1
                    and pages_hbm_ref.shape[0] >= ppb
                    and os.environ.get("VLLMINI_GATHER_RUNS", "1") != "0")
        for s in range(seqs_per_program):
            pages = [page_tables_ref[seq0 + s, block_idx * ppb + j]
                     for j in range(ppb)]
            if use_runs:
                contig = pages[1] == pages[0] + 1
                for j in range(2, ppb):
                    contig &= pages[j] == pages[0] + j
                blk0 = block_idx * ppb * page_size
                # Every page attendable: the LAST page starts before the
                # gather limit and the FIRST page ends past the window
                # start (per-page `needed` below is the overlap test).
                all_needed = ((blk0 + (ppb - 1) * page_size < lim_vec[s])
                              & (blk0 + page_size > ws_vec[s]))
                fast = contig & all_needed
                self._runs.append((fast, pltpu.make_async_copy(
                    pages_hbm_ref.at[pl.ds(pages[0], ppb)],
                    vmem_buf.at[slot, s], sem)))
            else:
                fast = False
            for j in range(ppb):
                logical = block_idx * ppb + j
                p0 = logical * page_size
                needed = (p0 < lim_vec[s]) & (p0 + page_size > ws_vec[s])
                if use_runs:
                    needed &= jnp.logical_not(fast)
                self._items.append(
                    (needed, (slot, s, j), pltpu.make_async_copy(
                        pages_hbm_ref.at[pages[j]],
                        vmem_buf.at[slot, s, j], sem),
                     fast if use_runs else False))

    def start(self):
        for fast, c in self._runs:
            @pl.when(fast)
            def _(c=c):
                c.start()
        for needed, _, c, _fast in self._items:
            @pl.when(needed)
            def _(c=c):
                c.start()

    def wait(self):
        for fast, c in self._runs:
            @pl.when(fast)
            def _(c=c):
                c.wait()
        for needed, (slot, s, j), c, fast in self._items:
            @pl.when(needed)
            def _(c=c):
                c.wait()

            # Skipped slots may hold uninitialized VMEM (possibly inf/NaN
            # bit patterns); their tokens are masked in the scores, but
            # 0 * inf = NaN would still poison the V aggregation — zero
            # them (a VPU store, cheaper than the DMA it replaces). Slots
            # covered by a fast-path run were fully copied: skip.
            not_covered = jnp.logical_not(needed)
            if fast is not False:
                not_covered &= jnp.logical_not(fast)

            @pl.when(not_covered)
            def _(slot=slot, s=s, j=j):
                self._buf[slot, s, j] = jnp.zeros(
                    self._buf.shape[3:], self._buf.dtype)


def _paged_attention_kernel(
    # scalar prefetch
    attend_lens_ref,   # [batch] i32 — tokens to attend (EXCLUDES any fused
    #                    current token; the self term merges outside)
    page_tables_ref,   # [batch, pages_per_seq_max] i32, clamped in range
    win_starts_ref,    # [batch] i32 — first attendable position (sliding
    #                    window / partition start), 0 otherwise
    write_pos_ref,     # [batch] i32 — current-token position for the fused
    #                    write, or -1 to skip (also the inactive marker)
    alibi_ctr_ref,     # [batch] i32 — the current token's position in THIS
    #                    partition's local coordinates (ALiBi bias anchor;
    #                    unused when alibi_slopes is None)
    # inputs
    q_ref,             # [S, G, M, Kd] VMEM, pre-scaled block-diagonal q
    k_new_ref,         # [S, 1, row_width] VMEM or None: the fused current
    v_new_ref,         #   token's (pool-dtype) K/V row
    kv_pages_hbm_ref,  # [num_pages, 2, page_size, row_width] ANY
    kv_scales_ref,     # [S, 2, num_kv_heads, ctx_pad] bf16 VMEM or None
    #                     (per KV head; quantized GQA runs hpm == 1 so the
    #                      single head row broadcasts over the group —
    #                      pre-expanding to query heads was tried and the
    #                      4x-bigger per-step gather cost more than the
    #                      matmul grouping saved, see trace notes)
    alibi_rows_ref,    # [G, M, 1] f32 VMEM or None: per-q-bd-row ALiBi
    #                     slopes (row m of group Gi = q-head Gi*M + m)
    bs_off_ref,        # [G, M, 1] i32 VMEM or None: per-q-bd-row block-
    #                     sparse vertical-stride phase offsets
    # outputs
    o_ref,             # [S, G, M, d]
    m_ref,             # [S, G, M] f32 or None (with lse outputs)
    l_ref,
    # scratch
    kv_buf,            # [2, S, ppb, 2, page_size, row_width]
    kv_wb,             # [S, 2, page_size, row_width] writeback staging | None
    g_sem, w_sem,
    *,
    pages_per_block: int,
    page_size: int,
    head_dim: int,
    group: int,
    mask_value: float,
    seqs_per_program: int,
    lse: bool,
    blocksparse: tuple | None = None,  # static (local_blocks, vert_stride,
    #                                    block_size) or None
):
    g_id = pl.program_id(0)
    S = seqs_per_program
    seq0 = g_id * S
    G, M, Kd = q_ref.shape[1], q_ref.shape[2], q_ref.shape[3]
    hpm = M // group
    d = head_dim
    row_width = kv_buf.shape[-1]
    bT = pages_per_block * page_size     # tokens per compute block
    quantized = kv_scales_ref is not None
    fused = k_new_ref is not None
    if quantized and group > 1:
        assert hpm == 1  # scale rows broadcast over the group

    al_vec = jnp.stack([attend_lens_ref[seq0 + s] for s in range(S)])
    ws_vec = jnp.stack([win_starts_ref[seq0 + s] for s in range(S)])
    use_alibi = alibi_rows_ref is not None
    use_bs = bs_off_ref is not None
    if use_alibi or use_bs:
        ac_vec = [alibi_ctr_ref[seq0 + s] for s in range(S)]
    max_len = jnp.max(al_vec)
    if fused:
        # Loop far enough to gather every member's CURRENT page too: the
        # sublane tile holding the token is staged in VMEM with the token's
        # row patched in and written back (r5: only that tile — a whole-page
        # writeback moved page_size/tile_rows more bytes than changed,
        # 37 MB/step at the gpt2 headline config vs 4.7 MB for the tile).
        tile_rows = kv_wb.shape[2]
        wp = [write_pos_ref[seq0 + s] for s in range(S)]
        wp_vec = jnp.stack(wp)
        cur_logical = [jnp.maximum(wp[s], 0) // page_size for s in range(S)]
        cur_block = [cur_logical[s] // pages_per_block for s in range(S)]
        cur_j = [jax.lax.rem(cur_logical[s], pages_per_block)
                 for s in range(S)]
        cur_row = [jax.lax.rem(jnp.maximum(wp[s], 0), page_size)
                   for s in range(S)]
        cur_t0 = [pl.multiple_of(cur_row[s] // tile_rows * tile_rows,
                                 tile_rows) for s in range(S)]
        cur_page = [page_tables_ref[seq0 + s, cur_logical[s]]
                    for s in range(S)]
        max_len = jnp.maximum(max_len, jnp.max(wp_vec) + 1)
        # Per-member gather limit: everything attendable plus the write page.
        lim_vec = jnp.maximum(al_vec, wp_vec + 1)

        def wb_writes(s):
            return [pltpu.make_async_copy(
                kv_wb.at[s],
                kv_pages_hbm_ref.at[cur_page[s], :,
                                    pl.ds(cur_t0[s], tile_rows)],
                w_sem)]
    else:
        lim_vec = al_vec
    num_blocks = pl.cdiv(max_len, bT)
    first_block = jnp.min(ws_vec) // bT

    def gather(i, slot):
        return _PageGather(kv_pages_hbm_ref, kv_buf, g_sem, page_tables_ref,
                           seq0, S, i, slot, pages_per_block, page_size,
                           lim_vec, ws_vec)

    have_work = first_block < num_blocks

    @pl.when(have_work)
    def _():
        gather(first_block, jax.lax.rem(first_block, 2)).start()

    def member_mask(fn):
        """[S, 1, bT] bool from a per-member scalar-threshold predicate."""
        return jnp.concatenate([fn(s)[None] for s in range(S)], axis=0)

    def load(slot, plane):
        x = kv_buf[slot][:, :, plane]     # [S, ppb, page_size, row_width]
        x = x.reshape(S, bT, row_width)   # leading-dim merge, no relayout
        return x.astype(q_ref.dtype)

    def body(i, carry):
        m_prev, l_prev, acc_prev = carry  # per-G lists

        slot = jax.lax.rem(i, 2)

        @pl.when(i + 1 < num_blocks)
        def _():
            gather(i + 1, jax.lax.rem(i + 1, 2)).start()
        gather(i, slot).wait()

        if fused:
            # Stage each member's current sublane TILE with the token's row
            # patched in (the write-back that makes it visible to FUTURE
            # steps; THIS step's self term merges outside from the raw
            # values, so the gathered buffers stay read-only).
            for s in range(S):
                @pl.when((i == cur_block[s]) & (wp_vec[s] >= 0))
                def _(s=s):
                    row = jax.lax.broadcasted_iota(
                        jnp.int32, (tile_rows, row_width), 0)
                    hit = row == (cur_row[s] - cur_t0[s])
                    src_k = kv_buf[slot, s, cur_j[s], 0,
                                   pl.ds(cur_t0[s], tile_rows)]
                    src_v = kv_buf[slot, s, cur_j[s], 1,
                                   pl.ds(cur_t0[s], tile_rows)]
                    kv_wb[s, 0] = jnp.where(hit, k_new_ref[s], src_k)
                    kv_wb[s, 1] = jnp.where(hit, v_new_ref[s], src_v)

        k = load(slot, 0)                 # [S, bT, row_width]
        v = load(slot, 1)
        tok0 = pl.multiple_of(i * bT, bT)

        # Valid-token mask, shared by every head row: [S, 1, bT].
        pos = tok0 + jax.lax.broadcasted_iota(jnp.int32, (1, bT), 1)

        def _valid(s):
            return (pos < al_vec[s]) & (pos >= ws_vec[s])
        valid = member_mask(_valid)

        if use_bs:
            # Block-sparse pattern (`attention_kernels.cu:216-241`), token-
            # granular: KV position p is attended iff its sparsity block
            # b = p // BSZ is LOCAL (within LB blocks of the query's block)
            # or REMOTE ((b + per-head phase) % VS == 0). The local half is
            # shared by all head rows; the remote half is per q_bd row.
            LB, VS, BSZ = blocksparse
            bsb = pos // BSZ                                    # [1, bT]

            def _bs_local(s):
                return bsb > (ac_vec[s] // BSZ - LB)
            bs_local = member_mask(_bs_local)                   # [S, 1, bT]

        if use_alibi:
            # Per-token distance to the current position, [S, 1, bT] f32;
            # the per-row slope folds in per head group below.
            rel_f = jnp.concatenate(
                [(pos - ac_vec[s]).astype(jnp.float32)[None]
                 for s in range(S)], axis=0)

        if quantized:
            if kv_scales_ref.shape[-1] == bT:
                # One block covers the whole table: a static full read (the
                # dynamic slice offset can't be proven 128-aligned when bT
                # itself isn't a multiple of 128).
                ks_blk = kv_scales_ref[:, 0]               # [S, H_q, bT]
                vs_blk = kv_scales_ref[:, 1]
            else:
                assert bT % 128 == 0  # wrapper grew ppb to guarantee this
                ks_blk = kv_scales_ref[:, 0, :, pl.ds(tok0, bT)]
                vs_blk = kv_scales_ref[:, 1, :, pl.ds(tok0, bT)]

        m_next, l_next, acc_next = [], [], []
        for Gi in range(G):
            if G == 1:
                k_g, v_g = k, v
            else:
                k_g = k[:, :, Gi * hpm * d:(Gi + 1) * hpm * d]
                v_g = v[:, :, Gi * hpm * d:(Gi + 1) * hpm * d]
            # ONE matmul for hpm heads x group queries: [S, M, bT].
            s_g = jax.lax.dot_general(
                q_ref[:, Gi], k_g,
                dimension_numbers=(((2,), (2,)), ((0,), (0,))),
                preferred_element_type=jnp.float32)
            if quantized:
                # [S, hpm, bT]; group > 1 implies hpm == 1 -> broadcasts.
                ks_g = ks_blk[:, Gi * hpm:(Gi + 1) * hpm].astype(jnp.float32)
                s_g = s_g * ks_g
            if use_alibi:
                # ALiBi: slope_h * (pos - cur), <= 0 for attendable tokens
                # (`attention_kernels.cu:154-155,297`); the fused self term
                # merges outside with bias slope*(cur-cur) = 0 — exact.
                # q_bd row m of group Gi is q-head Gi*M + m (see
                # _build_q_blockdiag's (G, hpm, group) reshape).
                s_g = s_g + alibi_rows_ref[Gi] * rel_f
            if use_bs:
                rem = jax.lax.rem(bsb + bs_off_ref[Gi],
                                  jnp.int32(VS)) == 0            # [M, bT]
                s_g = jnp.where(valid & (bs_local | rem[None]),
                                s_g, mask_value)
            else:
                s_g = jnp.where(valid, s_g, mask_value)

            m_cur = jnp.maximum(m_prev[Gi], s_g.max(-1, keepdims=True))
            alpha = jnp.exp(m_prev[Gi] - m_cur)
            p = jnp.exp(s_g - m_cur)                        # [S, M, bT] f32
            l_cur = alpha * l_prev[Gi] + p.sum(-1, keepdims=True)
            if quantized:
                vs_g = vs_blk[:, Gi * hpm:(Gi + 1) * hpm].astype(jnp.float32)
                # Row (h, g) of the output only ever reads head h's lane
                # block, so scaling p by v's per-(token, h) scale is exact
                # on the diagonal blocks we keep.
                p = p * vs_g
            o_g = jax.lax.dot_general(
                p.astype(q_ref.dtype), v_g,
                dimension_numbers=(((2,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.float32)          # [S, M, Kd]
            m_next.append(m_cur)
            l_next.append(l_cur)
            acc_next.append(alpha * acc_prev[Gi] + o_g)
        return m_next, l_next, acc_next

    Kd_full = Kd
    m0 = [jnp.full((S, M, 1), -jnp.inf, jnp.float32) for _ in range(G)]
    l0 = [jnp.zeros((S, M, 1), jnp.float32) for _ in range(G)]
    acc0 = [jnp.zeros((S, M, Kd_full), jnp.float32) for _ in range(G)]
    m, l, acc = jax.lax.fori_loop(first_block, num_blocks, body,
                                  (m0, l0, acc0))

    if fused:
        # Patched current pages -> HBM: one contiguous page DMA per member
        # (both planes), draining under the extraction math below. Inactive
        # members (write_pos < 0) write NOTHING — the kernel contract the
        # engine's slot lifecycle relies on.
        for s in range(S):
            @pl.when(wp_vec[s] >= 0)
            def _(s=s):
                for c in wb_writes(s):
                    c.start()

    # Diagonal-block extraction: row (h, g) keeps lane block h. A masked
    # constant matmul [M, Kd] @ [Kd, d] folds the lane blocks down to d —
    # no lane-splitting reshapes (Mosaic would relayout).
    lane = jax.lax.broadcasted_iota(jnp.int32, (M, Kd_full), 1)
    rowi = jax.lax.broadcasted_iota(jnp.int32, (M, Kd_full), 0)
    diag = (lane // d == rowi // group) & (lane < hpm * d)
    fold = (jax.lax.broadcasted_iota(jnp.int32, (Kd_full, d), 0) % d ==
            jax.lax.broadcasted_iota(jnp.int32, (Kd_full, d), 1)
            ).astype(q_ref.dtype)
    # Members with no valid tokens saw only masked (finite mask_value)
    # scores — their softmax is garbage, not zero. With LSE outputs the
    # outside merge kills them (their weight exp(m - m_merged) underflows to
    # 0); the plain path must zero them here.
    if not lse:
        zero1 = jnp.zeros((1, M, d), jnp.int32)
        alive = jnp.concatenate(
            [jnp.broadcast_to(zero1 < (al_vec[s] - ws_vec[s]), (1, M, d))
             for s in range(S)], axis=0)                     # [S, M, d]
    for Gi in range(G):
        l_safe = jnp.where(l[Gi] == 0.0, 1.0, l[Gi])
        out_full = jnp.where(diag[None], acc[Gi] / l_safe, 0.0)
        out = jax.lax.dot_general(
            out_full.astype(q_ref.dtype), fold,
            dimension_numbers=(((2,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)              # [S, M, d]
        if not lse:
            out = jnp.where(alive, out, 0.0)
        o_ref[:, Gi] = out.astype(o_ref.dtype)
        if lse:
            m_ref[:, Gi] = m[Gi][..., 0].astype(m_ref.dtype)
            l_ref[:, Gi] = l[Gi][..., 0].astype(l_ref.dtype)

    if fused:
        for s in range(S):
            @pl.when(wp_vec[s] >= 0)
            def _(s=s):
                for c in wb_writes(s):
                    c.wait()


def _default_pages_per_block(page_size: int, pages_per_seq: int) -> int:
    target = int(os.environ.get("VLLMINI_BLOCK_TOKENS", "256"))
    if page_size >= target:
        return 1
    return max(1, min(pages_per_seq, target // page_size))


def gather_run_pages(page_size: int, pages_per_seq: int) -> int:
    """Allocation-run size (pages) that makes one allocator run span exactly
    one attention compute block — the engine passes this to the allocator so
    the kernel's contiguity fast path (one DMA per block) hits on
    decode-grown pages, not just prefilled prompt spans."""
    return _default_pages_per_block(page_size, pages_per_seq)


@functools.partial(
    jax.jit,
    static_argnames=("num_kv_heads", "head_dim", "sm_scale",
                     "pages_per_compute_block", "mask_value", "interpret",
                     "seqs_per_program", "heads_per_matmul", "return_lse",
                     "fused_write", "alibi_slopes", "blocksparse"),
)
def _paged_attention_call(
    q_bd, attend_lens, page_tables, win_starts, write_pos, alibi_ctr,
    kv_pages, k_new, v_new, kv_scale_rows,
    *, num_kv_heads, head_dim, sm_scale, pages_per_compute_block,
    mask_value, interpret, seqs_per_program, heads_per_matmul,
    return_lse, fused_write, alibi_slopes=None, blocksparse=None,
):
    B, G, M, Kd = q_bd.shape
    num_pages, _, page_size, row_width = kv_pages.shape
    group = M // heads_per_matmul
    spp = seqs_per_program
    grid = (B // spp,)

    kernel = functools.partial(
        _paged_attention_kernel,
        pages_per_block=pages_per_compute_block,
        page_size=page_size,
        head_dim=head_dim,
        group=group,
        mask_value=mask_value,
        seqs_per_program=spp,
        lse=return_lse,
        blocksparse=(None if blocksparse is None
                     else tuple(blocksparse[:3])),
    )
    quantized = kv_scale_rows is not None
    use_alibi = alibi_slopes is not None
    use_bs = blocksparse is not None

    def entry(al_ref, pt_ref, ws_ref, wp_ref, ac_ref, q_ref, *rest):
        rest = list(rest)
        knr = vnr = None
        if fused_write:
            knr, vnr = rest.pop(0), rest.pop(0)
        kv_in = rest.pop(0)
        ksr = None
        if quantized:
            ksr = rest.pop(0)
        alr = rest.pop(0) if use_alibi else None
        bsr = rest.pop(0) if use_bs else None
        o_ref = rest.pop(0)
        mr = lr = None
        if return_lse:
            mr, lr = rest.pop(0), rest.pop(0)
        if fused_write:
            kv_hbm = rest.pop(0)  # aliased output
        else:
            kv_hbm = kv_in
        kwb = None
        if fused_write:
            kwb = rest.pop(0)
        kb, gs, ws = rest
        kernel(al_ref, pt_ref, ws_ref, wp_ref, ac_ref, q_ref, knr, vnr,
               kv_hbm, ksr, alr, bsr, o_ref, mr, lr, kb, kwb, gs, ws)

    in_specs = [pl.BlockSpec((spp, G, M, Kd), lambda b, *_: (b, 0, 0, 0))]
    inputs = [q_bd]
    if fused_write:
        new_spec = pl.BlockSpec((spp, 1, row_width), lambda b, *_: (b, 0, 0))
        in_specs += [new_spec, new_spec]
        inputs += [k_new, v_new]
    in_specs += [pl.BlockSpec(memory_space=pl.ANY)]
    inputs += [kv_pages]
    if quantized:
        ctx_pad = kv_scale_rows.shape[-1]
        scale_spec = pl.BlockSpec((spp, 2, num_kv_heads, ctx_pad),
                                  lambda b, *_: (b, 0, 0, 0))
        in_specs += [scale_spec]
        inputs += [kv_scale_rows]
    if use_alibi:
        # Tiny whole-array block: row m of group Gi = q-head Gi*M + m.
        rows = np.asarray(alibi_slopes, np.float32).reshape(G, M, 1)
        in_specs += [pl.BlockSpec((G, M, 1), lambda b, *_: (0, 0, 0))]
        inputs += [jnp.asarray(rows)]
    if use_bs:
        # Per-row vertical-stride phase (`attention_kernels.cu:216-224`):
        # >=0 head_sliding_step slides on Q heads, <0 on KV heads.
        _lb, _vs, _bsz, step, tpr = blocksparse
        qh = np.arange(G * M).reshape(G, M)
        if step >= 0:
            off = (tpr * G * M + qh) * step + 1
        else:
            kvh = (qh // M) * heads_per_matmul + (qh % M) // group
            off = (tpr * num_kv_heads + kvh) * (-step) + 1
        in_specs += [pl.BlockSpec((G, M, 1), lambda b, *_: (0, 0, 0))]
        inputs += [jnp.asarray(off[..., None], jnp.int32)]

    scratch = []
    if fused_write:
        scratch += [pltpu.VMEM((spp, 2, _wb_tile_rows(kv_pages), row_width),
                               kv_pages.dtype)]
    scratch += [
        pltpu.VMEM((2, spp, pages_per_compute_block, 2, page_size,
                    row_width), kv_pages.dtype),
        pltpu.SemaphoreType.DMA,
        pltpu.SemaphoreType.DMA,
    ]

    o_spec = pl.BlockSpec((spp, G, M, head_dim), lambda b, *_: (b, 0, 0, 0))
    out_specs = [o_spec]
    out_shape = [jax.ShapeDtypeStruct((B, G, M, head_dim), q_bd.dtype)]
    if return_lse:
        lse_spec = pl.BlockSpec((spp, G, M), lambda b, *_: (b, 0, 0))
        out_specs += [lse_spec, lse_spec]
        out_shape += [jax.ShapeDtypeStruct((B, G, M), jnp.float32)] * 2
    io_aliases = {}
    if fused_write:
        out_specs += [pl.BlockSpec(memory_space=pl.ANY)]
        out_shape += [jax.ShapeDtypeStruct(kv_pages.shape, kv_pages.dtype)]
        # operand index (incl. 5 scalar-prefetch): q=5, k_new=6, v_new=7,
        # kv_pages=8 -> the trailing output.
        n_lse = 2 if return_lse else 0
        io_aliases = {8: 1 + n_lse}

    call = pl.pallas_call(
        entry,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=5,
            grid=grid,
            in_specs=in_specs,
            out_specs=tuple(out_specs),
            scratch_shapes=scratch,
        ),
        out_shape=tuple(out_shape),
        input_output_aliases=io_aliases,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",),
            has_side_effects=fused_write,
        ),
        interpret=interpret,
    )
    return call(attend_lens, page_tables, win_starts, write_pos, alibi_ctr,
                *inputs)


def _wb_tile_rows(kv_pages) -> int:
    """Fused-write staging height: one sublane tile of the pool dtype
    (8 f32 / 16 bf16 / 32 int8|fp8), capped at the page — the smallest
    Mosaic-DMA-able row slice containing the written token."""
    return min(32 // jnp.dtype(kv_pages.dtype).itemsize, kv_pages.shape[2])


def _auto_spp(batch, pages_per_block, page_size, row_width, itemsize,
              quantized, ctx_pad, num_kv_heads, fused):
    """Seqs per program under the VMEM budget, computed from the actual
    scratch + double-buffered input-block footprint (ADVICE r1: no single
    fudged constant). Hard Mosaic scoped-VMEM limit is 16 MB; leave room
    for q/o blocks and compiler padding."""
    want = int(os.environ.get("VLLMINI_SPP", "8"))
    spp = next(s for s in (want, 8, 4, 2, 1) if s >= 1 and batch % s == 0)
    limit = 12 * 1024 * 1024

    def footprint(s):
        bufs = 2 * s * pages_per_block * 2 * page_size * row_width * itemsize
        tile = min(32 // itemsize, page_size)
        wb = s * 2 * tile * row_width * itemsize if fused else 0
        scales = 2 * s * 2 * num_kv_heads * ctx_pad * 2 if quantized else 0
        # Compute-dtype copies of the current block's K and V (the kernel
        # casts the gathered block to the matmul dtype; int8/fp8 pools pay
        # full bf16-width temporaries).
        conv = 2 * s * pages_per_block * page_size * row_width * 2
        return bufs + wb + scales + conv
    while spp > 1 and footprint(spp) > limit:
        spp //= 2
    while batch % spp != 0:
        spp -= 1
    return spp


def paged_attention(
    q: jax.Array,            # [batch, num_q_heads, head_dim_q]
    kv_pages: jax.Array,     # [num_pages, 2, page_size, row_width]
    seq_lens: jax.Array,     # [batch] i32, length INCLUDING current token
    page_tables: jax.Array,  # [batch, pages_per_seq_max] i32
    *,
    num_kv_heads: int,
    sm_scale: float | None = None,
    pages_per_compute_block: int | None = None,
    kv_scales: jax.Array | None = None,  # [num_pages, 2, H, page_size] bf16
    k_new: jax.Array | None = None,      # [batch, H, d] pool-dtype payload:
    v_new: jax.Array | None = None,      #   fuse the current token's write
    k_new_raw: jax.Array | None = None,  # unquantized current K/V for the
    v_new_raw: jax.Array | None = None,  #   self term (default k_new/v_new)
    sliding_window: int | None = None,
    alibi_slopes=None,                   # [H_q] per-q-head ALiBi slopes
    blocksparse: BlockSparse | None = None,
    kv_partitions: int = 1,
    seqs_per_program: int | None = None,
    heads_per_matmul: int | None = None,
    mask_value: float = DEFAULT_MASK_VALUE,
    interpret: bool = False,
):
    """Single-token-per-sequence attention over a token-major paged KV pool.

    `seq_lens` includes the current token. Without `k_new`/`v_new`, position
    `seq_lens - 1` must already be written to the pool (cache-then-attend).
    With them, the kernel itself writes the current token's K/V into its page
    (visible to future steps) while THIS step's self term is merged outside
    from the raw values, and the call returns `(out, kv_pages)` with the pool
    aliased in place. `k_new`/`v_new` must already be in the pool dtype
    (pre-quantized for int8/fp8 pools, scales pre-scattered).

    `kv_partitions > 1` splits every sequence's page table into that many
    grid programs with an LSE renormalization merge — the reference's
    `paged_attention_v2` partitioning — for long-context small-batch decode.
    """
    batch, num_q_heads, head_dim_q = q.shape
    num_pages, _two, page_size, row_width = kv_pages.shape
    assert _two == 2
    assert num_q_heads % num_kv_heads == 0
    group = num_q_heads // num_kv_heads
    d = head_dim_q
    assert num_kv_heads * d <= row_width
    fused = k_new is not None
    quantized = kv_scales is not None
    if sm_scale is None:
        sm_scale = d ** -0.5
    if alibi_slopes is not None:
        # Static per call: baked into the kernel as per-row constants
        # (`attention_kernels.cu:154-155,297` keeps them in registers).
        alibi_slopes = tuple(float(x) for x in np.asarray(alibi_slopes))
        assert len(alibi_slopes) == num_q_heads
    if blocksparse is not None:
        blocksparse = BlockSparse(*(int(x) for x in blocksparse))
        assert blocksparse.local_blocks >= 1, \
            "local_blocks >= 1 keeps the last position attendable"
        assert blocksparse.vert_stride >= 1 and blocksparse.block_size >= 1
        assert kv_partitions == 1, \
            "blocksparse + kv_partitions is not supported"

    if heads_per_matmul is None:
        if quantized and group > 1:
            heads_per_matmul = 1  # see kernel: scales broadcast over group
        else:
            heads_per_matmul = select_heads_per_matmul(num_kv_heads, group, d)
    hpm = heads_per_matmul
    if quantized and group > 1:
        assert hpm == 1, "quantized GQA requires heads_per_matmul == 1"
    G = num_kv_heads // hpm
    assert G == 1 or (hpm * d) % 128 == 0, (hpm, d)

    pages_per_seq = page_tables.shape[1]
    seq_lens = seq_lens.astype(jnp.int32)
    P = kv_partitions
    if P > 1 and pages_per_seq % P != 0:
        pad = P - pages_per_seq % P
        page_tables = jnp.pad(page_tables, ((0, 0), (0, pad)))
        pages_per_seq += pad
    pages_local = pages_per_seq // P
    if pages_per_compute_block is None:
        pages_per_compute_block = _default_pages_per_block(
            page_size, pages_local)
    ppb = min(pages_per_compute_block, pages_local)
    if quantized:
        # Scale rows are lane-sliced at block_tokens offsets, which must be
        # 128-aligned unless one block covers the whole (local) table.
        while (ppb * page_size) % 128 != 0 and ppb < pages_local:
            ppb += 1
    if pages_local % ppb != 0:
        pad = (ppb - pages_local % ppb) * P
        if P > 1:  # keep partitions contiguous: pad each partition's slice
            pt = page_tables.reshape(batch, P, pages_local)
            pt = jnp.pad(pt, ((0, 0), (0, 0), (0, pad // P)))
            page_tables = pt.reshape(batch, -1)
        else:
            page_tables = jnp.pad(page_tables, ((0, 0), (0, pad)))
        pages_per_seq += pad
        pages_local += pad // P
    page_tables = jnp.clip(page_tables.astype(jnp.int32), 0, num_pages - 1)

    if P > 1:
        assert not fused, "partitioned decode uses the standalone KV write"
        part_tokens = pages_local * page_size
        p_idx = jnp.tile(jnp.arange(P, dtype=jnp.int32), batch)  # [B*P]
        sl_rep = jnp.repeat(seq_lens, P)
        attend_lens = jnp.clip(sl_rep - p_idx * part_tokens, 0, part_tokens)
        if sliding_window is not None:
            ws_g = jnp.maximum(sl_rep - sliding_window, 0)
            win_starts = jnp.clip(ws_g - p_idx * part_tokens, 0, part_tokens)
        else:
            win_starts = jnp.zeros_like(attend_lens)
        page_tables = page_tables.reshape(batch * P, pages_local)
        pages_per_seq = pages_local
        vbatch = batch * P
        q_v = jnp.repeat(q, P, axis=0)
        # ALiBi anchor in partition-local coordinates: local_pos - ctr ==
        # global_pos - (seq_len - 1).
        alibi_ctr = sl_rep - 1 - p_idx * part_tokens
    else:
        attend_lens = seq_lens - 1 if fused else seq_lens
        attend_lens = jnp.maximum(attend_lens, 0)
        if sliding_window is not None:
            win_starts = jnp.maximum(seq_lens - sliding_window, 0)
        else:
            win_starts = jnp.zeros_like(attend_lens)
        vbatch = batch
        q_v = q
        alibi_ctr = seq_lens - 1

    write_pos = (jnp.where(seq_lens > 0, seq_lens - 1, -1)
                 if fused else jnp.full(vbatch, -1, jnp.int32))

    q_bd = _build_q_blockdiag(q_v, num_kv_heads, hpm, sm_scale, row_width)

    ctx_pad = pages_per_seq * page_size
    if quantized:
        # [num_pages, 2, H, ps] -> [vB, 2, H, ctx_pad]. The pool stores
        # scales TOKEN-ON-LANES bf16 (the exact layout the kernel consumes).
        num_pages = kv_scales.shape[0]
        row = 2 * num_kv_heads * page_size
        # MXU one-hot gather (r4): XLA lowers the page gather to an ~80 us
        # row-shuffle fusion PER LAYER (26 GB/s on 2 MB — measured via
        # scripts/trace_decode.py, 2.56 ms of a 14 ms 8B step). A one-hot
        # [vB*pages, num_pages] x [num_pages, 2*H*ps] matmul moves the same
        # rows through the MXU in ~10 us. Exact: one-hot rows select single
        # pool rows (bf16 values x {0,1}); padded/sentinel table entries
        # were clipped to valid page ids above and select real rows —
        # identical to the gather path — and correctness rests on the
        # kernel's validity mask, exactly as it does for the gather.
        # Gated by num_pages: the dot's FLOPs scale with pool size, the
        # gather's bytes don't.
        if num_pages <= 4096:
            tbl = page_tables.reshape(-1)            # [vB * pages]
            onehot = (tbl[:, None] == jnp.arange(num_pages)[None]
                      ).astype(kv_scales.dtype)
            g = jax.lax.dot_general(
                onehot, kv_scales.reshape(num_pages, row),
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32).astype(kv_scales.dtype)
            g = g.reshape(vbatch, pages_per_seq, 2, num_kv_heads, page_size)
        else:
            g = kv_scales[page_tables]       # [vB, pages, 2, H, ps]
        ksr = g.transpose(0, 2, 3, 1, 4).reshape(
            vbatch, 2, num_kv_heads, ctx_pad)
    else:
        ksr = None

    if fused:
        def widen(x):
            x = x.astype(kv_pages.dtype).reshape(vbatch, 1, -1)
            if x.shape[-1] < row_width:
                x = jnp.pad(x, ((0, 0), (0, 0),
                                (0, row_width - x.shape[-1])))
            return x
        kn1, vn1 = widen(k_new), widen(v_new)
    else:
        kn1 = vn1 = None

    if seqs_per_program is None:
        seqs_per_program = _auto_spp(
            vbatch, ppb, page_size, row_width,
            jnp.dtype(kv_pages.dtype).itemsize, quantized, ctx_pad,
            num_kv_heads, fused)
    assert vbatch % seqs_per_program == 0

    need_lse = fused or P > 1
    result = _paged_attention_call(
        q_bd, attend_lens, page_tables, win_starts, write_pos,
        alibi_ctr.astype(jnp.int32),
        kv_pages, kn1, vn1, ksr,
        num_kv_heads=num_kv_heads, head_dim=d, sm_scale=sm_scale,
        pages_per_compute_block=ppb, mask_value=mask_value,
        interpret=interpret, seqs_per_program=seqs_per_program,
        heads_per_matmul=hpm, return_lse=need_lse, fused_write=fused,
        alibi_slopes=alibi_slopes, blocksparse=blocksparse)

    result = list(result) if isinstance(result, (tuple, list)) else [result]
    o = result.pop(0).reshape(vbatch, num_q_heads, d)
    if need_lse:
        m = result.pop(0).reshape(vbatch, num_q_heads)
        l = result.pop(0).reshape(vbatch, num_q_heads)
    if fused:
        kv_pages = result.pop(0)

    if P > 1:
        # LSE merge across partitions (`paged_attention_v2_reduce_kernel`,
        # `attention_kernels.cu:567-669`) — tiny, plain XLA.
        o = o.reshape(batch, P, num_q_heads, d).astype(jnp.float32)
        m = m.reshape(batch, P, num_q_heads)
        l = l.reshape(batch, P, num_q_heads)
        m_g = jnp.max(m, axis=1, keepdims=True)
        w = l * jnp.exp(m - m_g)                      # [B, P, H_q]
        l_g = jnp.sum(w, axis=1)
        o = jnp.sum(o * w[..., None], axis=1) / jnp.maximum(
            l_g, 1e-30)[..., None]
        o = jnp.where((seq_lens > 0)[:, None, None], o, 0.0)
        return o.astype(q.dtype)

    if fused:
        # Merge the current token's self term from the RAW (unquantized)
        # K/V — exact, and the pages stay read-only within the step.
        k_self = (k_new if k_new_raw is None else k_new_raw)
        v_self = (v_new if v_new_raw is None else v_new_raw)
        if quantized and k_new_raw is None:
            raise ValueError(
                "quantized pools need k_new_raw/v_new_raw (unquantized "
                "current-token K/V) alongside the quantized k_new/v_new")
        qf = q.astype(jnp.float32)
        ks = jnp.repeat(k_self.astype(jnp.float32), group, axis=1)
        vs = jnp.repeat(v_self.astype(jnp.float32), group, axis=1)
        s_self = jnp.sum(qf * ks, axis=-1) * sm_scale          # [B, H_q]
        alive = seq_lens > 0
        s_self = jnp.where(alive[:, None], s_self, -jnp.inf)
        m2 = jnp.maximum(m, s_self)
        lw = l * jnp.exp(m - m2)
        pw = jnp.exp(s_self - m2)
        o = (o.astype(jnp.float32) * lw[..., None] + pw[..., None] * vs)
        o = o / jnp.maximum(lw + pw, 1e-30)[..., None]
        o = jnp.where(alive[:, None, None], o, 0.0).astype(q.dtype)
        return o, kv_pages
    return o.astype(q.dtype)


def unpack_pages(kv_pages: jax.Array, num_kv_heads: int,
                 head_dim: int):
    """Interleaved [P, 2, ps, W] -> head-major (k, v) [H, P, ps, d]
    (oracles)."""
    P, _, ps, W = kv_pages.shape
    x = kv_pages[:, :, :, :num_kv_heads * head_dim]
    x = x.reshape(P, 2, ps, num_kv_heads, head_dim).transpose(1, 3, 0, 2, 4)
    return x[0], x[1]


def paged_attention_reference(
    q, kv_pages, seq_lens, page_tables, *, num_kv_heads,
    sm_scale=None, kv_scales=None, sliding_window=None, alibi_slopes=None,
    blocksparse=None,
):
    """Naive jnp oracle (gather pages, full softmax). O(batch*ctx)."""
    batch, num_q_heads, d = q.shape
    k_hm, v_hm = unpack_pages(kv_pages, num_kv_heads, d)
    num_pages, _, page_size, _ = kv_pages.shape
    group = num_q_heads // num_kv_heads
    if sm_scale is None:
        sm_scale = d ** -0.5
    page_tables = jnp.clip(page_tables, 0, num_pages - 1)
    max_ctx = page_tables.shape[1] * page_size

    gathered_k = k_hm[:, page_tables]    # [H, B, pages, ps, d]
    gathered_v = v_hm[:, page_tables]
    if kv_scales is not None:
        sc = kv_scales[page_tables].astype(
            jnp.float32)                 # [B, pages, 2, H, ps]
        ks = sc[:, :, 0].transpose(2, 0, 1, 3)[..., None]  # [H,B,pg,ps,1]
        vs = sc[:, :, 1].transpose(2, 0, 1, 3)[..., None]
        gathered_k = gathered_k.astype(jnp.float32) * ks
        gathered_v = gathered_v.astype(jnp.float32) * vs
    k = gathered_k.transpose(1, 0, 2, 3, 4).reshape(
        batch, num_kv_heads, max_ctx, d).astype(jnp.float32)
    v = gathered_v.transpose(1, 0, 2, 3, 4).reshape(
        batch, num_kv_heads, max_ctx, d).astype(jnp.float32)

    qf = q.reshape(batch, num_kv_heads, group, d).astype(jnp.float32)
    s = jnp.einsum("bhgd,bhtd->bhgt", qf, k) * sm_scale
    pos = jnp.arange(max_ctx)[None, None, None, :]
    if alibi_slopes is not None:
        slopes = jnp.asarray(alibi_slopes, jnp.float32).reshape(
            1, num_kv_heads, group, 1)
        s = s + slopes * (pos - (seq_lens[:, None, None, None] - 1))
    mask = pos < seq_lens[:, None, None, None]
    if sliding_window is not None:
        mask &= pos >= (seq_lens[:, None, None, None] - sliding_window)
    if blocksparse is not None:
        lb, vs_, bsz, step, tpr = blocksparse
        b_id = pos // bsz
        q_bs = (seq_lens[:, None, None, None] - 1) // bsz
        qh = (jnp.arange(num_kv_heads)[:, None] * group
              + jnp.arange(group)[None, :])          # q-head = kv*group + g
        if step >= 0:
            off = (tpr * num_q_heads + qh) * step + 1
        else:
            off = ((tpr * num_kv_heads + qh // group) * (-step) + 1)
        off = off[None, :, :, None]
        mask &= (b_id > q_bs - lb) | ((b_id + off) % vs_ == 0)
    s = jnp.where(mask, s, -jnp.inf)
    p = jax.nn.softmax(s, axis=-1)
    p = jnp.where(seq_lens[:, None, None, None] > 0, p, 0.0)
    o = jnp.einsum("bhgt,bhtd->bhgd", p, v)
    return o.reshape(batch, num_q_heads, d).astype(q.dtype)
