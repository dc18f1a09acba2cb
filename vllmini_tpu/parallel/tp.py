"""Tensor-parallel parameter sharding + shard_map'd step functions.

Megatron-style TP expressed the TPU way (mesh + shard_map + XLA collectives):

- column-parallel: QKV / q,k,v / MLP up+gate weights sharded on the output dim by
  head (or channel) groups — each chip computes its own heads' attention locally;
- row-parallel: attn out-proj and MLP down-proj sharded on the input dim; their
  partial sums are combined with ONE `lax.psum` per projection per layer (the
  only collectives in the decode step, riding ICI);
- the paged KV pool is sharded on its kv_heads axis, so the paged-attention
  kernel runs unmodified on each chip's local heads — zero attention-time
  communication (GQA co-location);
- row-parallel biases are pre-divided by the TP degree so the psum reconstitutes
  them exactly once (keeps the model forward free of bias special cases);
- GPT-2's fused c_attn [h, 3h] is column-PERMUTED at shard time so each chip's
  contiguous slice holds (q_i | k_i | v_i) for its own heads.

The batch ("data") axis shards decode slots and the page pool jointly — each data
shard is an independent replica pool addressed by local page indices.
"""

from __future__ import annotations

import dataclasses
import logging
from typing import Any, Dict

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax import shard_map

from ..config import ModelConfig
from ..memory.kv_cache import KVPool
from .mesh import DATA_AXIS, MODEL_AXIS


def local_model_config(config: ModelConfig, tp: int) -> ModelConfig:
    """Per-chip view of the architecture under `tp`-way head sharding.

    Dense families shard the MLP's intermediate dim; the mixtral family
    shards whole EXPERTS instead (expert parallelism over the same axis), so
    its intermediate size stays whole per chip."""
    if tp == 1:
        return config
    if config.num_heads % tp or config.kv_heads % tp:
        raise ValueError(
            f"num_heads={config.num_heads}/num_kv_heads={config.kv_heads} "
            f"not divisible by tensor_parallel={tp}")
    intermediate = config.mlp_size
    if config.family != "mixtral":
        if config.mlp_size % tp:
            raise ValueError(
                "intermediate_size not divisible by tensor_parallel")
        intermediate = config.mlp_size // tp
    elif config.num_experts % tp:
        raise ValueError(
            f"num_experts={config.num_experts} not divisible by "
            f"tensor_parallel={tp} (expert parallelism)")
    return dataclasses.replace(
        config,
        num_heads=config.num_heads // tp,
        num_kv_heads=config.kv_heads // tp,
        head_dim=config.head_size,
        intermediate_size=intermediate,
    )


def _fused_col_index(widths, tp: int) -> np.ndarray:
    """Column permutation for a fused projection whose output is the concat
    of segments with the given widths: a contiguous 1/tp slice of the
    permuted weight holds (seg0_i | seg1_i | ...) for shard i."""
    starts = np.concatenate([[0], np.cumsum(widths)])[:-1]
    cols = []
    for i in range(tp):
        for s, w in zip(starts, widths):
            wl = w // tp
            cols.append(s + np.arange(i * wl, (i + 1) * wl))
    return np.concatenate(cols)


def _permute_cols(w, idx: np.ndarray):
    """Reorder output columns of a plain or weight-only-quantized weight
    (column permutation commutes with per-group ROW quantization)."""
    from ..models.common import QuantizedWeight

    if isinstance(w, QuantizedWeight):
        return dataclasses.replace(
            w, qvalues=jnp.asarray(w.qvalues)[:, idx],
            scales=jnp.asarray(w.scales)[:, idx])
    return jnp.asarray(np.asarray(w)[:, idx])


def _permute_gpt2_qkv(w, b: jax.Array, num_heads: int,
                      head_dim: int, tp: int):
    """Reorder fused-QKV output columns so a contiguous 1/tp slice holds
    (q_i | k_i | v_i) for head group i."""
    h = num_heads * head_dim
    idx = _fused_col_index([h, h, h], tp)
    return _permute_cols(w, idx), jnp.asarray(np.asarray(b)[idx])


def shard_params_gpt2(params: Dict[str, Any], config: ModelConfig,
                      mesh: Mesh) -> Dict[str, Any]:
    tp = mesh.shape[MODEL_AXIS]
    rep = NamedSharding(mesh, P())
    col = NamedSharding(mesh, P(None, MODEL_AXIS))   # column-parallel weight
    colb = NamedSharding(mesh, P(MODEL_AXIS))        # column-parallel bias
    row = NamedSharding(mesh, P(MODEL_AXIS, None))   # row-parallel weight

    put = _put_weight

    out = {
        "wte": put(params["wte"], rep),
        "wpe": put(params["wpe"], rep),
        "ln_f": jax.tree_util.tree_map(lambda x: put(x, rep), params["ln_f"]),
        # Untied (possibly quantized) head from gpt2.untie_lm_head.
        "lm_head": put(params.get("lm_head"), rep),
        "blocks": [],
    }
    H, d = config.num_heads, config.head_size
    for blk in params["blocks"]:
        aw, ab = blk["attn"]["c_attn_w"], blk["attn"]["c_attn_b"]
        if tp > 1:
            aw, ab = _permute_gpt2_qkv(aw, ab, H, d, tp)
        out["blocks"].append({
            "ln_1": jax.tree_util.tree_map(lambda x: put(x, rep), blk["ln_1"]),
            "ln_2": jax.tree_util.tree_map(lambda x: put(x, rep), blk["ln_2"]),
            "attn": {
                "c_attn_w": put(aw, col),
                "c_attn_b": put(ab, colb),
                "c_proj_w": put(blk["attn"]["c_proj_w"], row),
                "c_proj_b": put(blk["attn"]["c_proj_b"] / tp, rep),
            },
            "mlp": {
                "c_fc_w": put(blk["mlp"]["c_fc_w"], col),
                "c_fc_b": put(blk["mlp"]["c_fc_b"], colb),
                "c_proj_w": put(blk["mlp"]["c_proj_w"], row),
                "c_proj_b": put(blk["mlp"]["c_proj_b"] / tp, rep),
            },
        })
    return out


def _puttable(x, sharding: NamedSharding) -> bool:
    """True when every leaf dimension divides by its mesh-axis extent."""
    def ok(leaf):
        for dim, axis in enumerate(sharding.spec):
            if axis is None:
                continue
            if leaf.shape[dim] % sharding.mesh.shape[axis] != 0:
                return False
        return True
    return all(ok(l) for l in jax.tree_util.tree_leaves(x))


def _put_weight(x, sharding: NamedSharding):
    """device_put that degrades gracefully for quantized weights whose scale
    grid doesn't divide the mesh axis (e.g. K/group_size % tp != 0): the
    weight is dequantized and sharded full-precision instead of failing."""
    from ..models.common import QuantizedWeight

    if x is None:
        return None
    if isinstance(x, QuantizedWeight) and not _puttable(x, sharding):
        from ..ops.quant_matmul import dequantize_weight

        logging.getLogger("vllmini_tpu.tp").warning(
            "quantized weight %s (groups %s) does not divide mesh axis; "
            "sharding dequantized", x.shape, x.scales.shape)
        return jax.device_put(dequantize_weight(x), sharding)
    return jax.device_put(x, sharding)


def shard_params_llama(params: Dict[str, Any], config: ModelConfig,
                       mesh: Mesh) -> Dict[str, Any]:
    rep = NamedSharding(mesh, P())
    col = NamedSharding(mesh, P(None, MODEL_AXIS))
    row = NamedSharding(mesh, P(MODEL_AXIS, None))

    put = _put_weight

    out = {
        "embed": put(params["embed"], rep),
        "norm_f": put(params["norm_f"], rep),
        "lm_head": put(params.get("lm_head"), rep),
        "blocks": [],
    }
    colb = NamedSharding(mesh, P(MODEL_AXIS))  # column-parallel bias
    tp = mesh.shape[MODEL_AXIS]
    H, Hkv, d = config.num_heads, config.kv_heads, config.head_size
    for blk in params["blocks"]:
        attn = _shard_fused_attn(blk["attn"], H, Hkv, d, tp, put, col, colb,
                                 row)
        m = blk["mlp"]
        if "w_gateup" in m:  # fused gate|up (models/fuse.py)
            gu = m["w_gateup"]
            if tp > 1:
                inter = config.mlp_size
                gu = _permute_cols(gu, _fused_col_index([inter, inter], tp))
            mlp = {"w_gateup": put(gu, col), "w_down": put(m["w_down"], row)}
        else:
            mlp = {
                "w_gate": put(m["w_gate"], col),
                "w_up": put(m["w_up"], col),
                "w_down": put(m["w_down"], row),
            }
        out["blocks"].append({
            "input_norm": put(blk["input_norm"], rep),
            "post_attn_norm": put(blk["post_attn_norm"], rep),
            "attn": attn,
            "mlp": mlp,
        })
    return out


def _shard_fused_attn(a, H: int, Hkv: int, d: int, tp: int, put, col, colb,
                      row):
    """Shard a llama-style attention dict in either layout (fused wqkv from
    models/fuse.py, or separate wq/wk/wv)."""
    if "wqkv" in a:
        w, b = a["wqkv"], a.get("bqkv")
        if tp > 1:
            idx = _fused_col_index([H * d, Hkv * d, Hkv * d], tp)
            w = _permute_cols(w, idx)
            if b is not None:
                b = jnp.asarray(np.asarray(b)[idx])
        attn = {"wqkv": put(w, col), "wo": put(a["wo"], row)}
        if b is not None:
            attn["bqkv"] = put(b, colb)
        return attn
    attn = {
        "wq": put(a["wq"], col),
        "wk": put(a["wk"], col),
        "wv": put(a["wv"], col),
        "wo": put(a["wo"], row),
    }
    for b in ("bq", "bk", "bv"):  # Qwen2-style QKV biases
        if b in a:
            attn[b] = put(a[b], colb)
    return attn


def shard_params_mixtral(params: Dict[str, Any], config: ModelConfig,
                         mesh: Mesh) -> Dict[str, Any]:
    """Attention sharded like Llama; MoE experts sharded on their E axis
    (expert parallelism over the MODEL axis); router replicated."""
    rep = NamedSharding(mesh, P())
    col = NamedSharding(mesh, P(None, MODEL_AXIS))
    row = NamedSharding(mesh, P(MODEL_AXIS, None))
    ep = NamedSharding(mesh, P(MODEL_AXIS, None, None))
    put = _put_weight

    out = {
        "embed": put(params["embed"], rep),
        "norm_f": put(params["norm_f"], rep),
        "lm_head": put(params.get("lm_head"), rep),
        "blocks": [],
    }
    colb = NamedSharding(mesh, P(MODEL_AXIS))
    tp = mesh.shape[MODEL_AXIS]
    H, Hkv, d = config.num_heads, config.kv_heads, config.head_size
    for blk in params["blocks"]:
        out["blocks"].append({
            "input_norm": put(blk["input_norm"], rep),
            "post_attn_norm": put(blk["post_attn_norm"], rep),
            "attn": _shard_fused_attn(blk["attn"], H, Hkv, d, tp, put, col,
                                      colb, row),
            "moe": {
                "router": put(blk["moe"]["router"], rep),
                "w_gate": put(blk["moe"]["w_gate"], ep),
                "w_up": put(blk["moe"]["w_up"], ep),
                "w_down": put(blk["moe"]["w_down"], ep),
            },
        })
    return out


def shard_params(params, config: ModelConfig, mesh: Mesh):
    if config.family == "gpt2":
        return shard_params_gpt2(params, config, mesh)
    if config.family == "llama":
        return shard_params_llama(params, config, mesh)
    if config.family == "mixtral":
        return shard_params_mixtral(params, config, mesh)
    raise ValueError(config.family)


def param_specs(params) -> Any:
    """PartitionSpecs matching shard_params' placement (for shard_map
    in_specs)."""
    def spec_of(x):
        if x is None:
            return P()
        s = x.sharding
        if isinstance(s, NamedSharding):
            return s.spec
        return P()
    return jax.tree_util.tree_map(spec_of, params,
                                  is_leaf=lambda x: x is None)


def pool_pspec(num_layers: int, quantized: bool, *,
               num_kv_heads: int, head_dim: int) -> KVPool:
    """Per-layer token-major interleaved pool arrays
    [pages, 2, page_size, row_width]: head lanes on MODEL (head-sharded KV —
    each shard's `(H/tp)*d` lane slice is independently 128-aligned, see
    `align_row_width`), pages on DATA (per-replica pools). Static pytree
    fields must agree with the value pool's."""
    arr = [P(DATA_AXIS, None, None, MODEL_AXIS)] * num_layers
    # Scales are [pages, 2, H, ps]: heads on dim 2 -> MODEL there.
    sc = ([P(DATA_AXIS, None, MODEL_AXIS, None)] * num_layers if quantized
          else None)
    return KVPool(kv_pages=arr, kv_scales=sc,
                  num_kv_heads=num_kv_heads, head_dim=head_dim)


def shard_pool(pool: KVPool, mesh: Mesh) -> KVPool:
    s = NamedSharding(mesh, P(DATA_AXIS, None, None, MODEL_AXIS))
    sc_s = NamedSharding(mesh, P(DATA_AXIS, None, MODEL_AXIS, None))
    return KVPool(
        kv_pages=[jax.device_put(x, s) for x in pool.kv_pages],
        kv_scales=([jax.device_put(x, sc_s) for x in pool.kv_scales]
                   if pool.kv_scales is not None else None),
        num_kv_heads=pool.num_kv_heads, head_dim=pool.head_dim,
    )


def make_tp_decode_fn(family, config: ModelConfig, mesh: Mesh, params,
                      *, quantized_pool: bool = False,
                      interpret: bool = False, kv_partitions: int = 1):
    """Build a jitted shard_map'd batched decode step.

    Signature: (params, pool, token_ids, positions, seq_lens, page_tables,
    active) -> (logits [B, vocab], pool). Batch arrays are sharded on DATA;
    page_tables hold LOCAL page indices per data shard.
    """
    tp = mesh.shape[MODEL_AXIS]
    local_cfg = local_model_config(config, tp)
    p_specs = param_specs(params)
    pool_specs = pool_pspec(config.num_layers, quantized=quantized_pool,
                            num_kv_heads=config.kv_heads,
                            head_dim=config.head_size)

    data = P(DATA_AXIS)
    in_specs = (p_specs, pool_specs, data, data, data,
                P(DATA_AXIS, None), data)
    out_specs = (data, pool_specs)

    def step(params, pool, token_ids, positions, seq_lens, page_tables,
             active):
        logits, pool = family.decode_forward(
            params, local_cfg, pool, token_ids, positions, seq_lens,
            page_tables, active, interpret=interpret,
            tp_axis=MODEL_AXIS if tp > 1 else None,
            kv_partitions=kv_partitions)
        return logits, pool

    fn = shard_map(step, mesh=mesh, in_specs=in_specs, out_specs=out_specs,
                   check_vma=False)
    return jax.jit(fn, donate_argnums=(1,))
