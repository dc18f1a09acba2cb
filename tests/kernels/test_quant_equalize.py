"""Scale equalization (ops/quant_equalize.py) correctness tests.

The fold must be EXACTLY float-function-preserving (up to dtype rounding):
for every family the equalized params produce the same prefill logits. And
on outlier-heavy weights — the case equalization exists for — the served
int4 pipeline (equalize + clip search) must beat plain RTN on quantization
error of the end-to-end logits.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vllmini_tpu.config import ModelConfig, QuantConfig
from vllmini_tpu.models.registry import get_family
from vllmini_tpu.ops.quant_equalize import equalize_params
from vllmini_tpu.ops.quant_matmul import quantize_params

CONFIGS = {
    "gpt2": ModelConfig(family="gpt2", vocab_size=128, hidden_size=128,
                        num_layers=2, num_heads=2,
                        max_position_embeddings=64, dtype="float32"),
    "llama": ModelConfig(family="llama", vocab_size=128, hidden_size=64,
                         num_layers=2, num_heads=8, num_kv_heads=4,
                         intermediate_size=128,
                         max_position_embeddings=64, dtype="float32"),
    "mixtral": ModelConfig(family="mixtral", vocab_size=128, hidden_size=64,
                           num_layers=2, num_heads=8, num_kv_heads=4,
                           intermediate_size=96, max_position_embeddings=64,
                           num_experts=4, num_experts_per_tok=2,
                           dtype="float32"),
}


def _logits(params, config, toks):
    family = get_family(config)
    out, _ = family.prefill_forward(
        params, config, None, toks, jnp.int32(toks.shape[0]),
        page_table=None, interpret=True, return_all_logits=True)
    return np.asarray(out, np.float32)


def _spike(params, factor=8.0, every=13):
    """Inject per-input-channel outliers into every 2-D block weight."""
    def f(x):
        if isinstance(x, jax.Array) and x.ndim == 2 and min(x.shape) >= 32:
            k = x.shape[0]
            mask = (np.arange(k) % every == 0) * (factor - 1.0) + 1.0
            return (x.astype(jnp.float32)
                    * jnp.asarray(mask, jnp.float32)[:, None]).astype(x.dtype)
        return x
    out = dict(params)
    out["blocks"] = [jax.tree_util.tree_map(f, b) for b in params["blocks"]]
    return out


@pytest.mark.parametrize("fam", sorted(CONFIGS))
def test_equalize_preserves_function(fam):
    config = CONFIGS[fam]
    family = get_family(config)
    params = family.init_params(config, jax.random.PRNGKey(0))
    # Spiked weights force LARGE equalization factors — the strongest test
    # that producer-side compensation is exact.
    params = _spike(params)
    toks = jnp.asarray(np.random.default_rng(0).integers(
        0, config.vocab_size, 24), jnp.int32)
    base = _logits(params, config, toks)
    eq = _logits(equalize_params(params, config), config, toks)
    np.testing.assert_allclose(eq, base, rtol=2e-4, atol=2e-4)


def test_served_int4_beats_rtn_on_outliers():
    config = CONFIGS["llama"]
    family = get_family(config)
    params = _spike(family.init_params(config, jax.random.PRNGKey(1)),
                    factor=6.0)
    toks = jnp.asarray(np.random.default_rng(1).integers(
        0, config.vocab_size, 24), jnp.int32)
    base = _logits(params, config, toks)
    # group_size=32 so the tiny 64-wide hidden dim has >1 group.
    served = _logits(quantize_params(
        params, QuantConfig(weight_dtype="int4", group_size=32),
        model_config=config), config, toks)
    rtn = _logits(quantize_params(
        params, QuantConfig(weight_dtype="int4", group_size=32,
                            equalize=False, clip_search=False),
        model_config=config), config, toks)
    err_served = float(np.mean((served - base) ** 2))
    err_rtn = float(np.mean((rtn - base) ** 2))
    assert err_served < err_rtn, (err_served, err_rtn)
