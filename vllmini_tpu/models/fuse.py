"""Projection fusion: merge per-layer matmuls that share an input.

Llama-family layers issue three QKV projections and two MLP gate/up
projections per block; each is a separate HBM weight stream (and, when
quantized, a separate Pallas kernel launch). Concatenating the weights on
their OUTPUT dim turns them into one matmul each — numerically identical
(dot-product accumulation is per output column) while cutting the decode
step's matmul launches per block from 7 to 4 and giving the weight streamer
larger contiguous reads. GPT-2 ships pre-fused (`c_attn`), which is exactly
the layout this reproduces; the reference keeps it fused too
(`/root/reference/vllmini/model/gpt2.py:61-78`).

Fusion composes with the other param transforms in this order:

    load/init -> equalize+quantize (quantize_params) -> fuse -> TP shard

Quantized weights concatenate exactly (per-group scales are per output
channel), and `parallel/tp.py` column-permutes fused weights at shard time
so each chip's contiguous 1/tp slice holds its own (q_i | k_i | v_i) /
(gate_i | up_i) — the same trick it already applies to GPT-2's c_attn.
The model forwards accept both layouts (`"wqkv" in attn`).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict

import jax.numpy as jnp

from ..config import ModelConfig
from .common import QuantizedWeight


def _concat(ws):
    """Concatenate plain or quantized weights along the output dim.
    Returns None (fusion declined) when the group mixes quantized and plain
    weights — e.g. quantize_params skipped a small wk under min_dim —
    since joining them would change the matmul numerics."""
    quant = [isinstance(w, QuantizedWeight) for w in ws]
    if any(quant):
        first = ws[quant.index(True)]
        if not all(quant) or not all(
                w.bits == first.bits and w.group_size == first.group_size
                and w.act_quant == first.act_quant for w in ws):
            return None
        return dataclasses.replace(
            first,
            qvalues=jnp.concatenate([w.qvalues for w in ws], axis=1),
            scales=jnp.concatenate([w.scales for w in ws], axis=1))
    return jnp.concatenate(ws, axis=1)


def _fuse_llama_attn(a: Dict[str, Any]) -> Dict[str, Any]:
    wqkv = _concat([a["wq"], a["wk"], a["wv"]])
    if wqkv is None:
        return a
    out = {"wqkv": wqkv, "wo": a["wo"]}
    if "bq" in a:
        out["bqkv"] = jnp.concatenate([a["bq"], a["bk"], a["bv"]])
    return out


def fuse_params(params: Dict[str, Any], config: ModelConfig):
    """Return params with QKV / gate-up projections fused (no-op for
    families that ship fused, or params already fused)."""
    if config.family not in ("llama", "mistral", "qwen2", "mixtral"):
        return params
    blocks = []
    for blk in params["blocks"]:
        if "wqkv" in blk["attn"]:  # already fused
            blocks.append(blk)
            continue
        blk = dict(blk)
        blk["attn"] = _fuse_llama_attn(blk["attn"])
        if "mlp" in blk:
            m = blk["mlp"]
            gu = _concat([m["w_gate"], m["w_up"]])
            if gu is not None:
                blk["mlp"] = {"w_gateup": gu, "w_down": m["w_down"]}
        blocks.append(blk)
    return {**params, "blocks": blocks}
