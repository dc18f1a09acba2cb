"""Data-free scale equalization for low-bit weight quantization.

AWQ-style per-input-channel rescaling (Lin et al., AWQ; Nagel et al.,
data-free quantization): a weight row with outlier magnitudes inflates its
quantization group's scale and wastes the int4 grid for every other row.
Scaling row k by d_k < 1 and compensating EXACTLY in the producer of that
input channel (a norm gamma or the previous projection's output columns)
leaves the float function unchanged while balancing the rows the quantizer
sees. Without calibration activations (no network egress here), d is chosen
from weight statistics alone:

    d_k = clip((geomean(rowmax) / rowmax_k) ** alpha, 1/8, 8)

Fold targets per family (the producer side is NEVER quantized, so the
compensation is quality-free):

  llama/mistral/qwen2:  input_norm -> {wq,wk,wv};  wv columns -> wo rows
  (GQA: wo's d reduced over the q-heads sharing each kv head);
  post_attn_norm -> {w_gate,w_up};  w_up columns -> w_down rows
  (silu(g)*u is linear in u, so scaling u compensates the down rows).

  gpt2:  ln_1{g,b} -> c_attn;  c_attn V-columns -> attn c_proj;
  ln_2{g,b} -> c_fc.  The MLP c_proj fold is impossible: its input passes
  through gelu, which is not homogeneous.

  mixtral: attention folds as llama; the stacked 3-D expert weights are not
  quantized by quantize_params, so no MLP fold is needed.

Reference anchor: the reference has no weight quantization at all
(`/root/reference/vllmini` serves fp16); this implements the BASELINE
"INT4 weight-only" configs at the required quality gate.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..config import ModelConfig

ALPHA = 0.5
DMAX = 8.0


def _row_scale(*weights: jax.Array) -> jax.Array:
    """Equalization factors d [K] from the per-row absmax across all the
    weights consuming the same input channels (concatenated on N)."""
    rowmax = jnp.maximum(
        jnp.concatenate([jnp.max(jnp.abs(w.astype(jnp.float32)), axis=1,
                                 keepdims=True)
                         for w in weights], axis=1).max(axis=1), 1e-10)
    log_gm = jnp.mean(jnp.log(rowmax))
    d = jnp.exp((log_gm - jnp.log(rowmax)) * ALPHA)
    return jnp.clip(d, 1.0 / DMAX, DMAX)


def _scale_rows(w, d):
    return (w.astype(jnp.float32) * d[:, None]).astype(w.dtype)


def _scale_cols(w, inv_d):
    return (w.astype(jnp.float32) * inv_d[None, :]).astype(w.dtype)


def _scale_vec(v, inv_d):
    return (v.astype(jnp.float32) * inv_d).astype(v.dtype)


def _equalize_llama_block(blk: dict, config: ModelConfig) -> dict:
    if "wqkv" in blk["attn"]:  # already fused (models/fuse.py): too late
        return blk
    blk = {**blk, "attn": dict(blk["attn"]), "mlp": dict(blk["mlp"])}
    a, m = blk["attn"], blk["mlp"]

    # 1. input_norm -> q/k/v rows.
    d = _row_scale(a["wq"], a["wk"], a["wv"])
    blk["input_norm"] = _scale_vec(blk["input_norm"], 1.0 / d)
    for wname in ("wq", "wk", "wv"):
        a[wname] = _scale_rows(a[wname], d)

    # 2. wv output columns -> wo rows. Attention output channel (h_q, j)
    # carries kv-head h_q//group's v channel j, so d must be constant across
    # the q-heads sharing a kv head: reduce wo's per-row stat over the group.
    H = config.num_heads
    Hkv = config.num_kv_heads or H
    dh = a["wo"].shape[0] // H
    d_full = _row_scale(a["wo"])                            # [H*dh]
    d_kv = jnp.exp(jnp.mean(jnp.log(
        d_full.reshape(Hkv, H // Hkv, dh)), axis=1))        # [Hkv, dh]
    d_full = jnp.broadcast_to(d_kv[:, None, :],
                              (Hkv, H // Hkv, dh)).reshape(H * dh)
    a["wo"] = _scale_rows(a["wo"], d_full)
    a["wv"] = _scale_cols(a["wv"], 1.0 / d_kv.reshape(Hkv * dh))
    if a.get("bv") is not None:
        a["bv"] = _scale_vec(a["bv"], 1.0 / d_kv.reshape(Hkv * dh))

    # 3. post_attn_norm -> gate/up rows.
    d = _row_scale(m["w_gate"], m["w_up"])
    blk["post_attn_norm"] = _scale_vec(blk["post_attn_norm"], 1.0 / d)
    m["w_gate"] = _scale_rows(m["w_gate"], d)
    m["w_up"] = _scale_rows(m["w_up"], d)

    # 4. w_up output columns -> w_down rows (silu(g) * u is linear in u).
    d = _row_scale(m["w_down"])
    m["w_down"] = _scale_rows(m["w_down"], d)
    m["w_up"] = _scale_cols(m["w_up"], 1.0 / d)
    return blk


def _equalize_gpt2_block(blk: dict, config: ModelConfig) -> dict:
    blk = {**blk, "attn": dict(blk["attn"]), "mlp": dict(blk["mlp"]),
           "ln_1": dict(blk["ln_1"]), "ln_2": dict(blk["ln_2"])}
    a, m = blk["attn"], blk["mlp"]
    h = a["c_attn_w"].shape[0]

    # 1. ln_1 (gamma AND bias: both feed the same channels) -> c_attn rows.
    d = _row_scale(a["c_attn_w"])
    blk["ln_1"]["g"] = _scale_vec(blk["ln_1"]["g"], 1.0 / d)
    blk["ln_1"]["b"] = _scale_vec(blk["ln_1"]["b"], 1.0 / d)
    a["c_attn_w"] = _scale_rows(a["c_attn_w"], d)

    # 2. c_attn V columns -> attention c_proj rows (MHA: per-channel).
    d = _row_scale(a["c_proj_w"])
    a["c_proj_w"] = _scale_rows(a["c_proj_w"], d)
    inv = 1.0 / d
    a["c_attn_w"] = a["c_attn_w"].at[:, 2 * h:].set(
        _scale_cols(a["c_attn_w"][:, 2 * h:], inv))
    a["c_attn_b"] = a["c_attn_b"].at[2 * h:].set(
        _scale_vec(a["c_attn_b"][2 * h:], inv))

    # 3. ln_2 -> c_fc rows. (No MLP c_proj fold: gelu in between.)
    d = _row_scale(m["c_fc_w"])
    blk["ln_2"]["g"] = _scale_vec(blk["ln_2"]["g"], 1.0 / d)
    blk["ln_2"]["b"] = _scale_vec(blk["ln_2"]["b"], 1.0 / d)
    m["c_fc_w"] = _scale_rows(m["c_fc_w"], d)
    return blk


def _equalize_mixtral_block(blk: dict, config: ModelConfig) -> dict:
    # Attention folds exactly as llama; expert weights are 3-D stacks that
    # quantize_params leaves full-precision, so no MLP fold.
    if "wqkv" in blk["attn"]:  # already fused (models/fuse.py): too late
        return blk
    blk = {**blk, "attn": dict(blk["attn"])}
    a = blk["attn"]
    d = _row_scale(a["wq"], a["wk"], a["wv"])
    blk["input_norm"] = _scale_vec(blk["input_norm"], 1.0 / d)
    for wname in ("wq", "wk", "wv"):
        a[wname] = _scale_rows(a[wname], d)
    H = config.num_heads
    Hkv = config.num_kv_heads or H
    dh = a["wo"].shape[0] // H
    d_full = _row_scale(a["wo"])
    d_kv = jnp.exp(jnp.mean(jnp.log(
        d_full.reshape(Hkv, H // Hkv, dh)), axis=1))
    d_full = jnp.broadcast_to(d_kv[:, None, :],
                              (Hkv, H // Hkv, dh)).reshape(H * dh)
    a["wo"] = _scale_rows(a["wo"], d_full)
    a["wv"] = _scale_cols(a["wv"], 1.0 / d_kv.reshape(Hkv * dh))
    return blk


_BLOCK_FNS = {
    "llama": _equalize_llama_block,
    "mistral": _equalize_llama_block,
    "qwen2": _equalize_llama_block,
    "gpt2": _equalize_gpt2_block,
    "mixtral": _equalize_mixtral_block,
}


def equalize_params(params: dict, config: ModelConfig) -> dict:
    """Return params with quantization-friendly equalized scales folded in.
    Float-function-preserving up to rounding; apply BEFORE quantize_params."""
    fn = _BLOCK_FNS.get(config.family)
    if fn is None:
        return params
    out = dict(params)
    out["blocks"] = [fn(blk, config) for blk in params["blocks"]]
    return out
