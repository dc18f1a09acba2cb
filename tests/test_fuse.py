"""Projection fusion (models/fuse.py) correctness.

Fusing QKV / gate-up into one matmul must leave outputs numerically
unchanged (bf16/f32 and quantized), and the fused layout must shard
correctly under tensor parallelism (column permutation so each chip's
slice holds its own q_i|k_i|v_i / gate_i|up_i).
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vllmini_tpu.config import CacheConfig, ModelConfig, QuantConfig
from vllmini_tpu.memory.kv_cache import create_kv_pool
from vllmini_tpu.models.fuse import fuse_params
from vllmini_tpu.models.registry import get_family
from vllmini_tpu.ops.quant_matmul import quantize_params

CFGS = {
    "llama": ModelConfig(family="llama", vocab_size=128, hidden_size=64,
                         num_layers=2, num_heads=8, num_kv_heads=4,
                         intermediate_size=128,
                         max_position_embeddings=64, dtype="float32"),
    "qwen2": ModelConfig(family="llama", vocab_size=128, hidden_size=64,
                         num_layers=2, num_heads=8, num_kv_heads=4,
                         intermediate_size=128, attention_bias=True,
                         max_position_embeddings=64, dtype="float32"),
    "mixtral": ModelConfig(family="mixtral", vocab_size=128, hidden_size=64,
                           num_layers=2, num_heads=8, num_kv_heads=4,
                           intermediate_size=96, max_position_embeddings=64,
                           num_experts=4, num_experts_per_tok=2,
                           dtype="float32"),
}


def _decode_logits(params, config):
    family = get_family(config)
    cache = CacheConfig(num_pages=16, page_size=4, max_pages_per_seq=4,
                        kv_dtype="float32", head_pad_to=1)
    pool = create_kv_pool(config, cache)
    B = 3
    toks = jnp.asarray([5, 9, 77], jnp.int32)
    seq_lens = jnp.asarray([3, 5, 1], jnp.int32)
    tables = jnp.arange(B * 4, dtype=jnp.int32).reshape(B, 4)
    logits, _ = family.decode_forward(
        params, config, pool, toks, seq_lens - 1, seq_lens, tables,
        jnp.ones(B, bool), interpret=True)
    return np.asarray(logits, np.float32)


@pytest.mark.parametrize("fam", sorted(CFGS))
def test_fused_decode_matches_unfused(fam):
    config = CFGS[fam]
    params = get_family(config).init_params(config, jax.random.PRNGKey(0))
    base = _decode_logits(params, config)
    fused = _decode_logits(fuse_params(params, config), config)
    np.testing.assert_allclose(fused, base, rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("fam", sorted(CFGS))
def test_fused_prefill_matches_unfused(fam):
    config = CFGS[fam]
    family = get_family(config)
    params = family.init_params(config, jax.random.PRNGKey(1))
    toks = jnp.asarray(np.random.default_rng(0).integers(0, 128, 16),
                       jnp.int32)

    def logits(p):
        out, _ = family.prefill_forward(
            p, config, None, toks, jnp.int32(16), page_table=None,
            interpret=True, return_all_logits=True)
        return np.asarray(out, np.float32)

    np.testing.assert_allclose(logits(fuse_params(params, config)),
                               logits(params), rtol=1e-5, atol=1e-5)


def test_fuse_after_quantize_matches_unfused_quantized():
    """Quantize-then-fuse must equal running the same quantized weights
    unfused (per-column scales concatenate exactly)."""
    config = CFGS["llama"]
    params = get_family(config).init_params(config, jax.random.PRNGKey(2))
    qp = quantize_params(params, QuantConfig(weight_dtype="int8",
                                             group_size=32))
    base = _decode_logits(qp, config)
    fused = _decode_logits(fuse_params(qp, config), config)
    np.testing.assert_allclose(fused, base, rtol=1e-5, atol=1e-5)


@pytest.mark.skipif(len(jax.devices()) < 4, reason="needs 4 virtual devices")
def test_fused_tp_decode_matches_single_device():
    from vllmini_tpu.parallel.mesh import make_mesh
    from vllmini_tpu.parallel.tp import make_tp_decode_fn, shard_params, \
        shard_pool

    config = CFGS["qwen2"]  # biases exercise the bqkv permutation
    family = get_family(config)
    cache = CacheConfig(num_pages=16, page_size=4, max_pages_per_seq=4,
                        kv_dtype="float32", head_pad_to=1)
    params = fuse_params(
        family.init_params(config, jax.random.PRNGKey(3)), config)
    B = 4
    toks = jnp.asarray([5, 9, 77, 3], jnp.int32)
    seq_lens = jnp.asarray([3, 5, 1, 7], jnp.int32)
    tables = jnp.arange(B * 4, dtype=jnp.int32).reshape(B, 4)
    active = jnp.ones(B, bool)

    pool = create_kv_pool(config, cache)
    ref, _ = family.decode_forward(params, config, pool, toks, seq_lens - 1,
                                   seq_lens, tables, active, interpret=True)

    mesh = make_mesh(1, 4)
    sp = shard_params(params, config, mesh)
    pool_tp = shard_pool(create_kv_pool(config, cache, shards=4), mesh)
    fn = make_tp_decode_fn(family, config, mesh, sp, interpret=True)
    out, _ = fn(sp, pool_tp, toks, seq_lens - 1, seq_lens, tables, active)
    np.testing.assert_allclose(np.asarray(out, np.float32),
                               np.asarray(ref, np.float32),
                               rtol=2e-5, atol=2e-5)
