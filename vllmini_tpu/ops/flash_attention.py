"""Causal flash-attention prefill kernel (Pallas/TPU).

The reference's prefill path is plain torch matmul+mask+softmax
(`/root/reference/vllmini/model/gpt2.py:71-78`) with an additive -inf mask built on
host (`generate_triangular_mask.py`). On TPU that materializes an O(L^2) scores
matrix in HBM; here prefill is a tiled online-softmax kernel instead (flash
attention), with:

- grid (q_head, q_block, kv_block), kv innermost; fp32 running max/normalizer/
  accumulator in VMEM scratch persisting across kv blocks,
- whole-block causal skip above the diagonal plus elementwise causal + actual-
  length masking inside diagonal blocks (prompt lengths are bucket-padded),
- GQA folded into the index map (q head h reads kv head h // group).

Short prompts (below one 128-token tile) fall back to a dense jnp path — masking
cost is trivial there and tiles would be sub-minimal.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

DEFAULT_MASK_VALUE = -0.7 * float(jnp.finfo(jnp.float32).max)


def _flash_kernel(
    seq_len_ref,            # scalar prefetch: [1] int32 TOTAL true length
    q_off_ref,              # scalar prefetch: [1] int32 — absolute position
    #                         of q row 0 (chunked prefill: the chunk's
    #                         queries attend over the pool-resident prefix
    #                         rows 0..q_off-1 + the chunk itself)
    slopes_ref,             # scalar prefetch: [H] int32 — per-q-head ALiBi
    #                         slopes as round(slope * 2^24) fixed-point
    #                         (zeros when disabled; scalar memory is
    #                         integer-typed)
    q_ref,                  # [1, block_q, head_dim]
    k_ref,                  # [1, block_kv, head_dim]
    v_ref,
    o_ref,                  # [1, block_q, head_dim]
    m_scratch, l_scratch,   # [block_q, 1] f32
    acc_scratch,            # [block_q, head_dim] f32
    *,
    sm_scale: float,
    causal: bool,
    mask_value: float,
    sliding_window: int | None = None,
    use_alibi: bool = False,
    batched: bool = False,
):
    # Batched (burst prefill) grids lead with a prompt axis; per-prompt true
    # length comes from seq_len_ref[b] and q_off is 0 (fresh prompts only).
    off = 1 if batched else 0
    h = pl.program_id(off)      # q head
    i = pl.program_id(off + 1)  # q block
    j = pl.program_id(off + 2)  # kv block
    block_q = q_ref.shape[-2]
    block_kv = k_ref.shape[-2]
    num_kv_blocks = pl.num_programs(off + 2)
    seq_len = seq_len_ref[pl.program_id(0)] if batched else seq_len_ref[0]
    q_off = q_off_ref[0]
    if use_alibi:
        # Scalar memory is integer-typed and Mosaic's tpu.bitcast only
        # accepts VECTORS (a scalar bitcast_convert_type fails native
        # verification — caught by scripts/native_smoke.py r4), so the
        # slope ships as round(slope * 2^24) fixed-point and is
        # reconstructed with a plain scalar int->float convert. ALiBi
        # slopes are <= 1, so 2^-24 granularity is ~1e-7 absolute.
        slope = slopes_ref[h].astype(jnp.float32) * (2.0 ** -24)

    @pl.when(j == 0)
    def _():
        m_scratch[...] = jnp.full_like(m_scratch, -jnp.inf)
        l_scratch[...] = jnp.zeros_like(l_scratch)
        acc_scratch[...] = jnp.zeros_like(acc_scratch)

    # Whole-block causal skip: block strictly above the diagonal; with a
    # sliding window, also blocks entirely below every query's window.
    run = True
    if causal:
        run = (j * block_kv) <= (q_off + (i + 1) * block_q - 1)
    if sliding_window is not None:
        run &= ((j + 1) * block_kv - 1) > (q_off + i * block_q
                                          - sliding_window)

    @pl.when(run)
    def _():
        q = q_ref[...].reshape(block_q, q_ref.shape[-1]).astype(
            jnp.float32) * sm_scale
        k = k_ref[...].reshape(block_kv, k_ref.shape[-1]).astype(jnp.float32)
        s = jax.lax.dot_general(
            q, k, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # [block_q, block_kv]

        row = (q_off + i * block_q
               + jax.lax.broadcasted_iota(jnp.int32, s.shape, 0))
        col = j * block_kv + jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
        if use_alibi:
            # slope_h * (k_pos - q_pos), <= 0 under the causal mask
            # (`attention_kernels.cu:154-155` builds the same bias).
            s = s + slope * (col - row).astype(jnp.float32)
        mask = col < seq_len
        if causal:
            mask = jnp.logical_and(mask, col <= row)
        if sliding_window is not None:
            mask = jnp.logical_and(mask, col > row - sliding_window)
        s = jnp.where(mask, s, mask_value)

        m_prev, l_prev = m_scratch[...], l_scratch[...]
        m_cur = jnp.max(s, axis=-1, keepdims=True)
        m_next = jnp.maximum(m_prev, m_cur)
        alpha = jnp.exp(m_prev - m_next)
        p = jnp.exp(s - m_next)
        l_next = alpha * l_prev + jnp.sum(p, axis=-1, keepdims=True)
        m_scratch[...], l_scratch[...] = m_next, l_next

        v = v_ref[...].reshape(block_kv, v_ref.shape[-1]).astype(
            jnp.float32)
        acc_scratch[...] = alpha * acc_scratch[...] + jax.lax.dot_general(
            p, v, dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    @pl.when(j == num_kv_blocks - 1)
    def _():
        l = l_scratch[...]
        l = jnp.where(l == 0.0, 1.0, l)
        o_ref[...] = (acc_scratch[...] / l).astype(
            o_ref.dtype).reshape(o_ref.shape)


def _dense_reference(q, k, v, seq_len, sm_scale, causal, mask_value,
                     sliding_window=None, q_offset=0, alibi_slopes=None):
    """Dense fallback/oracle: [h, Lq, d] x [kvh, Lk, d] -> [h, Lq, d]."""
    num_q_heads, Lq, head_dim = q.shape
    num_kv_heads, Lk = k.shape[0], k.shape[1]
    group = num_q_heads // num_kv_heads
    qf = q.reshape(num_kv_heads, group, Lq, head_dim).astype(jnp.float32)
    kf = k.astype(jnp.float32)
    vf = v.astype(jnp.float32)
    s = jnp.einsum("hgqd,hkd->hgqk", qf, kf) * sm_scale
    row = q_offset + jnp.arange(Lq)[:, None]
    col = jnp.arange(Lk)[None, :]
    if alibi_slopes is not None:
        slopes = jnp.asarray(alibi_slopes, jnp.float32).reshape(
            num_kv_heads, group, 1, 1)
        s = s + slopes * (col - row)[None, None].astype(jnp.float32)
    mask = col < seq_len
    if causal:
        mask = jnp.logical_and(mask, col <= row)
    if sliding_window is not None:
        mask = jnp.logical_and(mask, col > row - sliding_window)
    s = jnp.where(mask[None, None], s, mask_value)
    p = jax.nn.softmax(s, axis=-1)
    o = jnp.einsum("hgqk,hkd->hgqd", p, vf)
    return o.reshape(num_q_heads, Lq, head_dim).astype(q.dtype)


@functools.partial(
    jax.jit,
    static_argnames=("sm_scale", "causal", "block_q", "block_kv", "interpret",
                     "sliding_window", "alibi_slopes"),
)
def flash_attention_prefill_batch(
    q: jax.Array,    # [B, num_q_heads, Lq, head_dim]
    k: jax.Array,    # [B, num_kv_heads, Lq, head_dim]
    v: jax.Array,
    seq_lens: jax.Array,  # [B] int32 true prompt lengths
    *,
    sm_scale: float | None = None,
    causal: bool = True,
    sliding_window: int | None = None,
    alibi_slopes: tuple | None = None,
    block_q: int = 128,
    block_kv: int = 128,
    interpret: bool = False,
) -> jax.Array:
    """Multi-prompt burst prefill: B fresh prompts (q_offset 0), one kernel
    launch, per-prompt length masking via seq_lens. The reference's worst
    serving bottleneck is prefill serialization on the event loop
    (`/root/reference/vllmini/server.py:81`); this is the kernel-level half
    of the batched-admission answer (engine half: `prefill_burst`)."""
    B, num_q_heads, Lq, head_dim = q.shape
    num_kv_heads, Lk = k.shape[1], k.shape[2]
    assert num_q_heads % num_kv_heads == 0
    group = num_q_heads // num_kv_heads
    if sm_scale is None:
        sm_scale = head_dim ** -0.5
    seq_lens = jnp.asarray(seq_lens, jnp.int32)
    q_off = jnp.zeros(1, jnp.int32)
    if alibi_slopes is not None:
        assert len(alibi_slopes) == num_q_heads
        # Fixed-point 2^24: see the slope reconstruction in _flash_kernel.
        slopes_i32 = jnp.asarray(np.round(
            np.asarray(alibi_slopes, np.float64) * 2.0 ** 24).astype(
                np.int32))
    else:
        slopes_i32 = jnp.zeros(num_q_heads, jnp.int32)

    if (Lq % block_q != 0 or Lk % block_kv != 0
            or Lq < block_q or Lk < block_kv):
        dense = jax.vmap(
            lambda qb, kb, vb, sl: _dense_reference(
                qb, kb, vb, sl, sm_scale, causal, DEFAULT_MASK_VALUE,
                sliding_window=sliding_window, alibi_slopes=alibi_slopes))
        return dense(q, k, v, seq_lens)

    grid = (B, num_q_heads, Lq // block_q, Lk // block_kv)
    kernel = functools.partial(
        _flash_kernel, sm_scale=sm_scale, causal=causal,
        mask_value=DEFAULT_MASK_VALUE, sliding_window=sliding_window,
        use_alibi=alibi_slopes is not None, batched=True,
    )
    return pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=3,
            grid=grid,
            in_specs=[
                pl.BlockSpec((1, 1, block_q, head_dim),
                             lambda b, h, i, j, *_: (b, h, i, 0)),
                pl.BlockSpec((1, 1, block_kv, head_dim),
                             lambda b, h, i, j, *_: (b, h // group, j, 0)),
                pl.BlockSpec((1, 1, block_kv, head_dim),
                             lambda b, h, i, j, *_: (b, h // group, j, 0)),
            ],
            out_specs=pl.BlockSpec((1, 1, block_q, head_dim),
                                   lambda b, h, i, j, *_: (b, h, i, 0)),
            scratch_shapes=[
                pltpu.VMEM((block_q, 1), jnp.float32),
                pltpu.VMEM((block_q, 1), jnp.float32),
                pltpu.VMEM((block_q, head_dim), jnp.float32),
            ],
        ),
        out_shape=jax.ShapeDtypeStruct((B, num_q_heads, Lq, head_dim),
                                       q.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel",
                                 "arbitrary"),
        ),
        interpret=interpret,
    )(seq_lens, q_off, slopes_i32, q, k, v)


@functools.partial(
    jax.jit,
    static_argnames=("sm_scale", "causal", "block_q", "block_kv", "interpret",
                     "sliding_window", "alibi_slopes"),
)
def flash_attention_prefill(
    q: jax.Array,   # [num_q_heads, Lq, head_dim]
    k: jax.Array,   # [num_kv_heads, Lk, head_dim]  (Lk >= Lq: chunked
    v: jax.Array,   #   prefill passes prefix + chunk K/V)
    seq_len: jax.Array | None = None,  # scalar int32 TOTAL true len (<= Lk)
    *,
    q_offset: jax.Array | int = 0,  # absolute position of q row 0
    sm_scale: float | None = None,
    causal: bool = True,
    sliding_window: int | None = None,
    alibi_slopes: tuple | None = None,  # [H_q] static per-head slopes
    block_q: int = 128,
    block_kv: int = 128,
    interpret: bool = False,
) -> jax.Array:
    num_q_heads, Lq, head_dim = q.shape
    num_kv_heads, Lk = k.shape[0], k.shape[1]
    assert num_q_heads % num_kv_heads == 0
    group = num_q_heads // num_kv_heads
    if sm_scale is None:
        sm_scale = head_dim ** -0.5
    if seq_len is None:
        seq_len = jnp.int32(Lk)
    seq_len = jnp.asarray(seq_len, jnp.int32).reshape(1)
    q_off = jnp.asarray(q_offset, jnp.int32).reshape(1)
    if alibi_slopes is not None:
        assert len(alibi_slopes) == num_q_heads
        # Fixed-point 2^24: see the slope reconstruction in _flash_kernel.
        slopes_i32 = jnp.asarray(np.round(
            np.asarray(alibi_slopes, np.float64) * 2.0 ** 24).astype(
                np.int32))
    else:
        slopes_i32 = jnp.zeros(num_q_heads, jnp.int32)

    if (Lq % block_q != 0 or Lk % block_kv != 0
            or Lq < block_q or Lk < block_kv):
        return _dense_reference(q, k, v, seq_len[0], sm_scale, causal,
                                DEFAULT_MASK_VALUE,
                                sliding_window=sliding_window,
                                q_offset=q_off[0],
                                alibi_slopes=alibi_slopes)

    grid = (num_q_heads, Lq // block_q, Lk // block_kv)
    kernel = functools.partial(
        _flash_kernel, sm_scale=sm_scale, causal=causal,
        mask_value=DEFAULT_MASK_VALUE, sliding_window=sliding_window,
        use_alibi=alibi_slopes is not None,
    )
    return pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=3,
            grid=grid,
            in_specs=[
                pl.BlockSpec((1, block_q, head_dim),
                             lambda h, i, j, *_: (h, i, 0)),
                pl.BlockSpec((1, block_kv, head_dim),
                             lambda h, i, j, *_: (h // group, j, 0)),
                pl.BlockSpec((1, block_kv, head_dim),
                             lambda h, i, j, *_: (h // group, j, 0)),
            ],
            out_specs=pl.BlockSpec((1, block_q, head_dim),
                                   lambda h, i, j, *_: (h, i, 0)),
            scratch_shapes=[
                pltpu.VMEM((block_q, 1), jnp.float32),
                pltpu.VMEM((block_q, 1), jnp.float32),
                pltpu.VMEM((block_q, head_dim), jnp.float32),
            ],
        ),
        out_shape=jax.ShapeDtypeStruct((num_q_heads, Lq, head_dim),
                                       q.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(seq_len, q_off, slopes_i32, q, k, v)
