"""Weight-only quantized matmul: kernel vs dequantize-then-dot oracle."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vllmini_tpu.config import QuantConfig
from vllmini_tpu.models.common import QuantizedWeight
from vllmini_tpu.ops.quant_matmul import (
    dequantize_weight,
    quantize_params,
    quantize_weight,
    quantized_matmul,
)


@pytest.mark.parametrize("bits", [8, 4])
def test_quantize_roundtrip_error(bits):
    key = jax.random.PRNGKey(0)
    w = jax.random.normal(key, (256, 128), jnp.float32)
    # Round-to-nearest: error bounded by scale/2 per element (scale=amax/qmax).
    qw = quantize_weight(w, bits=bits, group_size=128, clip_search=False)
    deq = dequantize_weight(qw)
    qmax = 127.0 if bits == 8 else 7.0
    amax = np.abs(np.asarray(w)).reshape(2, 128, 128).max(axis=1)
    bound = (amax / qmax)[:, None, :].repeat(128, axis=1).reshape(256, 128)
    assert np.all(np.abs(np.asarray(deq) - np.asarray(w)) <= bound * 0.5 + 1e-6)


def test_int4_clip_search_reduces_mse():
    """The MSE-optimal clip search (served int4 default) trades bounded
    outlier error for strictly lower squared error than plain RTN."""
    w = jax.random.normal(jax.random.PRNGKey(3), (512, 256), jnp.float32)
    # Heavy-tailed rows so amax-clipping has something to win on.
    w = w * (1.0 + 5.0 * (jax.random.uniform(
        jax.random.PRNGKey(4), (512, 256)) > 0.99))
    mse_rtn = float(jnp.mean((dequantize_weight(
        quantize_weight(w, bits=4, group_size=128, clip_search=False)) - w
    ) ** 2))
    mse_clip = float(jnp.mean((dequantize_weight(
        quantize_weight(w, bits=4, group_size=128, clip_search=True)) - w
    ) ** 2))
    assert mse_clip <= mse_rtn


@pytest.mark.parametrize("bits", [8, 4])
@pytest.mark.parametrize("M", [1, 8])
def test_kernel_matches_dequant_dot(bits, M):
    key = jax.random.PRNGKey(1)
    K, N = 256, 256
    x = jax.random.normal(key, (M, K), jnp.float32)
    w = jax.random.normal(jax.random.PRNGKey(2), (K, N), jnp.float32)
    qw = quantize_weight(w, bits=bits, group_size=128)
    got = quantized_matmul(x, qw, interpret=True)
    ref = x @ dequantize_weight(qw)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=1e-3, rtol=1e-3)


@pytest.mark.parametrize("bits", [8, 4])
def test_quantized_accuracy_vs_fp32(bits):
    """End-to-end quant error stays small relative to activations."""
    key = jax.random.PRNGKey(3)
    x = jax.random.normal(key, (4, 512), jnp.float32)
    w = jax.random.normal(jax.random.PRNGKey(4), (512, 256), jnp.float32) * 0.05
    qw = quantize_weight(w, bits=bits, group_size=128)
    got = quantized_matmul(x, qw, interpret=True)
    ref = x @ w
    rel = (np.linalg.norm(np.asarray(got) - np.asarray(ref))
           / np.linalg.norm(np.asarray(ref)))
    # Quantization noise is ~scale/sqrt(12) per element: ~0.4% of sigma for
    # int8 (qmax=127), ~12% for int4 (qmax=7) at group_size=128.
    assert rel < (0.01 if bits == 8 else 0.15), rel


def test_quantize_params_structure():
    from vllmini_tpu.config import ModelConfig
    from vllmini_tpu.models.gpt2 import init_params

    cfg = ModelConfig(family="gpt2", vocab_size=128, hidden_size=128,
                      num_layers=2, num_heads=2, max_position_embeddings=64,
                      dtype="float32")
    params = init_params(cfg, jax.random.PRNGKey(0))
    qp = quantize_params(params, QuantConfig(weight_dtype="int8",
                                             group_size=128))
    # Embeddings untouched; block weights quantized; biases untouched.
    assert isinstance(qp["wte"], jax.Array)
    blk = qp["blocks"][0]
    assert isinstance(blk["attn"]["c_attn_w"], QuantizedWeight)
    assert isinstance(blk["attn"]["c_attn_b"], jax.Array)
    assert isinstance(blk["mlp"]["c_fc_w"], QuantizedWeight)


def test_w8a8_matches_fp_reference():
    key = jax.random.PRNGKey(20)
    M, K, N, G = 16, 256, 128, 64
    x = jax.random.normal(key, (M, K), jnp.float32)
    w = jax.random.normal(jax.random.PRNGKey(21), (K, N), jnp.float32) * 0.05
    qw = quantize_weight(w, bits=8, group_size=G)
    qw = QuantizedWeight(qvalues=qw.qvalues, scales=qw.scales, bits=8,
                         group_size=G, act_quant=True)
    got = quantized_matmul(x, qw, interpret=True)
    ref = x @ w
    # int8 weights AND int8 activations: ~1% relative error budget
    err = jnp.abs(got - ref) / (jnp.abs(ref).mean() + 1e-6)
    assert float(err.mean()) < 0.02, float(err.mean())


def test_w8a8_quantize_params_marks_act_quant():
    from vllmini_tpu.models.gpt2 import init_params
    from vllmini_tpu.config import ModelConfig

    cfg = ModelConfig(family="gpt2", vocab_size=128, hidden_size=128,
                      num_layers=1, num_heads=2, max_position_embeddings=32,
                      dtype="float32")
    params = init_params(cfg, jax.random.PRNGKey(0))
    qp = quantize_params(params, QuantConfig(weight_dtype="w8a8",
                                             group_size=64))
    blk = qp["blocks"][0]
    assert isinstance(blk["attn"]["c_attn_w"], QuantizedWeight)
    assert blk["attn"]["c_attn_w"].act_quant
    assert blk["attn"]["c_attn_w"].bits == 8


def test_w4a8_matches_dequant_reference():
    """w4a8: packed int4 weights x int8 activations, all-integer MXU dots
    with the +8 low-nibble bias folded into a rowsum correction. Against
    the exact dequant oracle the only extra error is activation
    quantization (~1%)."""
    key = jax.random.PRNGKey(30)
    M, K, N, G = 16, 512, 256, 128
    x = jax.random.normal(key, (M, K), jnp.float32)
    w = jax.random.normal(jax.random.PRNGKey(31), (K, N), jnp.float32) * 0.05
    qw = quantize_weight(w, bits=4, group_size=G)
    qw = QuantizedWeight(qvalues=qw.qvalues, scales=qw.scales, bits=4,
                         group_size=G, act_quant=True)
    got = quantized_matmul(x, qw, interpret=True)
    # Oracle: int8-quantized activations x EXACT dequantized int4 weights.
    from vllmini_tpu.ops.quant_matmul import quantize_activations
    xq, xs = quantize_activations(x)
    ref = (xq.astype(jnp.float32) * xs) @ dequantize_weight(qw)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=1e-3, rtol=1e-3)


def test_w4a8_quantize_params_marks_bits4():
    from vllmini_tpu.config import ModelConfig
    from vllmini_tpu.models.gpt2 import init_params

    cfg = ModelConfig(family="gpt2", vocab_size=128, hidden_size=128,
                      num_layers=1, num_heads=2, max_position_embeddings=32,
                      dtype="float32")
    params = init_params(cfg, jax.random.PRNGKey(0))
    qp = quantize_params(params, QuantConfig(weight_dtype="w4a8",
                                             group_size=64))
    blk = qp["blocks"][0]
    assert isinstance(blk["attn"]["c_attn_w"], QuantizedWeight)
    assert blk["attn"]["c_attn_w"].act_quant
    assert blk["attn"]["c_attn_w"].bits == 4
    # Packed storage: half the rows.
    assert blk["attn"]["c_attn_w"].qvalues.shape[0] == 64
