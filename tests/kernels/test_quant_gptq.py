"""GPTQ error-compensating quantizer: oracle properties.

The claim under test is the GPTQ contract itself: on CORRELATED calibration
inputs, error feedback must beat round-to-nearest in activation space
(‖X(W - Ŵ)‖), while staying a valid drop-in QuantizedWeight (same packed
layout `ops.quant_matmul` consumes).
"""

import jax
import jax.numpy as jnp
import numpy as np

from vllmini_tpu.models.common import QuantizedWeight
from vllmini_tpu.ops.quant_gptq import (collect_hessians,
                                        gptq_quantize_weight)
from vllmini_tpu.ops.quant_matmul import dequantize_weight, quantize_weight


def _act_err(x, w, qw):
    return float(np.linalg.norm(
        np.asarray(x @ (w - dequantize_weight(qw).astype(jnp.float32)))))


def test_gptq_beats_rtn_on_correlated_inputs():
    rng = np.random.default_rng(0)
    K, N, M, G = 256, 128, 512, 128
    # Correlated inputs: a rank-heavy mixing of a few latent directions plus
    # noise — the regime where error feedback has signal.
    mix = rng.normal(size=(32, K))
    x = rng.normal(size=(M, 32)) @ mix + 0.1 * rng.normal(size=(M, K))
    x = jnp.asarray(x, jnp.float32)
    w = jnp.asarray(rng.normal(size=(K, N)), jnp.float32) * 0.05
    h = np.asarray(x.T @ x, np.float64)

    q_rtn = quantize_weight(w, 4, G, clip_search=False)
    q_gptq = gptq_quantize_weight(w, h, bits=4, group_size=G)
    err_rtn = _act_err(x, w, q_rtn)
    err_gptq = _act_err(x, w, q_gptq)
    # GPTQ must materially reduce activation-space error.
    assert err_gptq < 0.9 * err_rtn, (err_gptq, err_rtn)


def test_gptq_int8_and_packing_are_valid():
    rng = np.random.default_rng(1)
    K, N, G = 256, 64, 128
    w = jnp.asarray(rng.normal(size=(K, N)), jnp.float32)
    h = np.eye(K) * 1.0
    for bits in (8, 4):
        qw = gptq_quantize_weight(w, h, bits=bits, group_size=G)
        assert isinstance(qw, QuantizedWeight) and qw.bits == bits
        deq = dequantize_weight(qw)
        # With H = I there is no cross-row compensation: per-group RTN
        # (int4 additionally clip-searches, same sweep as quantize_weight).
        ref = dequantize_weight(quantize_weight(w, bits, G,
                                                clip_search=(bits == 4)))
        np.testing.assert_allclose(np.asarray(deq), np.asarray(ref),
                                   rtol=0, atol=1e-5)


def test_collect_hessians_covers_every_block_matmul():
    from vllmini_tpu.config import ModelConfig
    from vllmini_tpu.models.registry import get_family

    config = ModelConfig(num_layers=2, hidden_size=128, num_heads=4,
                         vocab_size=256, intermediate_size=256,
                         max_position_embeddings=128,
                         family="gpt2", dtype="float32")
    family = get_family(config)
    params = family.init_params(config, jax.random.PRNGKey(0))
    stream = np.arange(96) % 256
    hs = collect_hessians(params, config, stream, window=48)

    want = []
    for blk in params["blocks"]:
        want += [blk["attn"]["c_attn_w"], blk["attn"]["c_proj_w"],
                 blk["mlp"]["c_fc_w"], blk["mlp"]["c_proj_w"]]
    for wmat in want:
        h = hs.get(id(wmat))
        assert h is not None and h.shape == (wmat.shape[0],) * 2
        np.testing.assert_allclose(h, h.T, rtol=1e-9, atol=1e-6)
        assert np.all(np.linalg.eigvalsh(h) > -1e-6)
