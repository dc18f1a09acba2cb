"""PPL harness: cross-check against torch HF loss, and quantization ΔPPL."""

import math

import jax
import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

import jax.numpy as jnp

from vllmini_tpu.config import QuantConfig
from vllmini_tpu.evaluation import delta_ppl, perplexity
from vllmini_tpu.models.loader import params_from_hf_model
from vllmini_tpu.ops.quant_matmul import quantize_params


@pytest.fixture(scope="module")
def tiny():
    cfg = transformers.GPT2Config(vocab_size=256, n_positions=64, n_embd=64,
                                  n_layer=2, n_head=2)
    torch.manual_seed(0)
    model = transformers.GPT2LMHeadModel(cfg).eval()
    config, params = params_from_hf_model(model, dtype=jnp.float32)
    rng = np.random.default_rng(0)
    tokens = rng.integers(0, 256, 100).tolist()
    return model, config, params, tokens


def hf_ppl(model, ids, window):
    total_nll, count = 0.0, 0
    for s in range(0, len(ids), window):
        chunk = ids[s: s + window]
        if len(chunk) < 2:
            break
        t = torch.tensor([chunk], dtype=torch.long)
        with torch.no_grad():
            out = model(t, labels=t)
        n = len(chunk) - 1
        total_nll += float(out.loss) * n
        count += n
    return math.exp(total_nll / count)


def test_ppl_matches_hf(tiny):
    model, config, params, tokens = tiny
    ours = perplexity(params, config, tokens, window=32, interpret=True)
    ref = hf_ppl(model, tokens, 32)
    assert abs(ours - ref) / ref < 1e-3, (ours, ref)


def test_delta_ppl_int8_small(tiny):
    model, config, params, tokens = tiny
    qparams = quantize_params(params, QuantConfig(weight_dtype="int8",
                                                  group_size=64),
                              min_dim=32)
    base, quant, delta = delta_ppl(params, qparams, config, tokens,
                                   window=32, interpret=True)
    # int8 weight-only on a tiny random model should barely move PPL.
    assert abs(delta) / base < 0.05, (base, quant)
