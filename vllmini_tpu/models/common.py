"""Shared model building blocks (functional, pytree params).

Norms run in fp32 regardless of activation dtype; matmuls dispatch through
`linear()` so weight-only-quantized layers (QuantizedWeight) transparently use the
fused dequant matmul kernel.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class QuantizedWeight:
    """Weight-only quantized linear weight.

    qvalues: int8 [in, out] (int4 packs two nibbles per int8 -> [in//2, out])
    scales:  f32 [in//group_size, out] per-group scales along the contraction dim
    """

    qvalues: jax.Array
    scales: jax.Array
    bits: int = dataclasses.field(metadata=dict(static=True), default=8)
    group_size: int = dataclasses.field(metadata=dict(static=True), default=128)
    # W8A8: quantize activations per token at run time and do the matmul
    # int8 x int8 on the MXU (int32 accumulation); False = weight-only.
    act_quant: bool = dataclasses.field(metadata=dict(static=True),
                                        default=False)

    @property
    def shape(self):
        in_dim = self.qvalues.shape[0] * (2 if self.bits == 4 else 1)
        return (in_dim, self.qvalues.shape[1])


def linear(x: jax.Array, w, b: Optional[jax.Array] = None) -> jax.Array:
    """y = x @ w (+ b), dispatching on plain vs quantized weights."""
    if isinstance(w, QuantizedWeight):
        from ..ops.quant_matmul import quantized_matmul
        y = quantized_matmul(x, w)
    else:
        y = jnp.dot(x, w, preferred_element_type=x.dtype)
    if b is not None:
        y = y + b
    return y


def paged_decode_attention(pool, layer_idx: int, q, k, v, positions,
                           seq_lens, page_tables, active, *,
                           num_kv_heads: int, sliding_window=None,
                           kv_partitions: int = 1, interpret: bool = False):
    """One layer's decode attention over the paged pool, including the
    current token's KV write. Returns (attn [B, H, d], pool).

    kv_partitions == 1 (the hot path): the write is FUSED into the attention
    kernel (page patched in VMEM, written back during compute) and this
    step's self term merges outside from the raw values.
    kv_partitions > 1 (long-context low-batch): the token is written first
    via the standalone scatter, then attention runs split into that many
    grid programs per sequence with an LSE renormalization merge — the
    reference's `paged_attention_v2` regime (`attention_kernels.cu:529-669`).
    """
    from ..ops.kv_write import quantize_decode_tokens, write_kv_decode
    from ..ops.paged_attention import paged_attention

    kv, sc = pool.layer(layer_idx)
    masked_lens = jnp.where(active, seq_lens, 0)
    if kv_partitions > 1:
        out = write_kv_decode(kv, k, v, positions, page_tables, active,
                              kv_scales=sc, interpret=interpret)
        if sc is not None:
            kv, sc = out
        else:
            kv = out
        attn = paged_attention(q, kv, masked_lens, page_tables,
                               kv_scales=sc,
                               sliding_window=sliding_window,
                               num_kv_heads=num_kv_heads,
                               kv_partitions=kv_partitions,
                               interpret=interpret)
    else:
        if pool.quantized:
            k_src, v_src, sc = quantize_decode_tokens(
                k, v, positions, page_tables, active, sc, kv.dtype)
        else:
            k_src, v_src = k, v
        attn, kv = paged_attention(q, kv, masked_lens, page_tables,
                                   kv_scales=sc,
                                   k_new=k_src, v_new=v_src,
                                   k_new_raw=k, v_new_raw=v,
                                   sliding_window=sliding_window,
                                   num_kv_heads=num_kv_heads,
                                   interpret=interpret)
    return attn, pool.with_layer(layer_idx, kv, sc)


def paged_spec_attention(pool, layer_idx: int, q, k, v, positions,
                         page_tables, active, *, num_kv_heads: int,
                         sliding_window=None, interpret: bool = False):
    """Speculative-verify attention: S1 consecutive tokens per sequence.

    q/k/v: [B, S1, H(kv), d]; positions: [B, S1] (consecutive per row).
    All S1 tokens' K/V are written first (`write_kv_spec` — multi-token page
    RMW), then each token attends as its own VIRTUAL batch row over the
    shared page table with seq_len = position + 1: causality within the
    draft run falls out of the per-row length, and the weight-streaming
    matmuls outside process B*S1 tokens in one pass — the speculative win
    on a weight-bound decode step. Returns (attn [B, S1, H, d], pool)."""
    from ..ops.kv_write import write_kv_spec
    from ..ops.paged_attention import paged_attention

    B, S1, H, d = q.shape
    kv, sc = pool.layer(layer_idx)
    out = write_kv_spec(kv, k, v, positions[:, 0], page_tables, active,
                        kv_scales=sc, interpret=interpret)
    if sc is not None:
        kv, sc = out
    else:
        kv = out
    lens = jnp.where(active[:, None], positions + 1, 0).reshape(-1)
    attn = paged_attention(q.reshape(B * S1, H, d), kv, lens,
                           jnp.repeat(page_tables, S1, axis=0),
                           kv_scales=sc,
                           sliding_window=sliding_window,
                           num_kv_heads=num_kv_heads,
                           interpret=interpret)
    return attn.reshape(B, S1, H, d), pool.with_layer(layer_idx, kv, sc)


def maybe_psum(x: jax.Array, axis: Optional[str]) -> jax.Array:
    """All-reduce partial sums across the tensor-parallel axis (no-op when
    unsharded). Used after row-parallel projections (attn out-proj, MLP
    down-proj) inside shard_map; row-parallel biases are pre-divided by the TP
    degree at shard time so the psum reconstitutes them exactly once."""
    return jax.lax.psum(x, axis_name=axis) if axis else x


def layer_norm(x: jax.Array, gamma: jax.Array, beta: jax.Array,
               eps: float = 1e-5) -> jax.Array:
    xf = x.astype(jnp.float32)
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mu), axis=-1, keepdims=True)
    y = (xf - mu) * jax.lax.rsqrt(var + eps)
    return (y * gamma + beta).astype(x.dtype)


def rms_norm(x: jax.Array, gamma: jax.Array, eps: float = 1e-5) -> jax.Array:
    xf = x.astype(jnp.float32)
    var = jnp.mean(jnp.square(xf), axis=-1, keepdims=True)
    return (xf * jax.lax.rsqrt(var + eps) * gamma).astype(x.dtype)


def rope_table(positions: jax.Array, head_dim: int,
               theta: float = 10000.0):
    """Rotary embedding cos/sin for given absolute positions.

    positions: [...] int32 -> (cos, sin): [..., head_dim//2] f32
    """
    half = head_dim // 2
    freqs = theta ** (-jnp.arange(0, half, dtype=jnp.float32) / half)
    angles = positions.astype(jnp.float32)[..., None] * freqs  # [..., half]
    return jnp.cos(angles), jnp.sin(angles)


def apply_rope(x: jax.Array, cos: jax.Array, sin: jax.Array) -> jax.Array:
    """Rotate pairs (x1, x2) = (x[..., :half], x[..., half:]) — the HF/Llama
    "rotate_half" convention. x: [..., head_dim]; cos/sin broadcastable to
    [..., head_dim//2]."""
    half = x.shape[-1] // 2
    x1, x2 = x[..., :half], x[..., half:]
    xf1, xf2 = x1.astype(jnp.float32), x2.astype(jnp.float32)
    out1 = xf1 * cos - xf2 * sin
    out2 = xf2 * cos + xf1 * sin
    return jnp.concatenate([out1, out2], axis=-1).astype(x.dtype)
