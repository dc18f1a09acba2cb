"""Untied (and quantized) GPT-2 lm_head — the quantized-headline-serving
path (VERDICT r3 #3: serve the headline bench model with int8 weights + KV).

GPT-2 ties its head to wte (`/root/reference/vllmini/model/gpt2.py`
lm_head = wte); the logits matmul therefore streams the whole 77 MB (bf16)
table every decode step. `gpt2.untie_lm_head` splits off an explicit
[h, vocab_padded] head so `quantize_params` can store it int8, halving the
biggest single weight stream of the model; the embedding gather keeps the
full-precision table (it reads only a few rows per step).
"""

import jax
import jax.numpy as jnp
import numpy as np

from vllmini_tpu.config import (
    CacheConfig,
    EngineConfig,
    ModelConfig,
    QuantConfig,
    SamplingParams,
    SchedulerConfig,
)
from vllmini_tpu.engine.engine import LLMEngine
from vllmini_tpu.engine.scheduler import Scheduler
from vllmini_tpu.models.gpt2 import untie_lm_head
from vllmini_tpu.models.registry import get_family
from vllmini_tpu.models.common import QuantizedWeight
from vllmini_tpu.ops.quant_matmul import quantize_params

# Vocab deliberately NOT a lane multiple: untie_lm_head must pad to 128 and
# _logits must slice the pad back off.
MODEL = ModelConfig(family="gpt2", vocab_size=97, hidden_size=64,
                    num_layers=2, num_heads=2, max_position_embeddings=64,
                    dtype="float32")


def _params():
    return get_family(MODEL).init_params(MODEL, jax.random.PRNGKey(0))


def _sched(params):
    cfg = EngineConfig(
        model=MODEL,
        cache=CacheConfig(num_pages=32, page_size=4, max_pages_per_seq=8,
                          kv_dtype="float32"),
        scheduler=SchedulerConfig(max_decode_slots=2, decode_chunk_steps=3,
                                  prefill_buckets=(8, 16)),
        hf_model=None,
    )
    return Scheduler(LLMEngine(cfg, params=params))


def test_untied_unquantized_head_is_exact():
    """Pad columns are zero and sliced off before sampling: an untied but
    unquantized head must reproduce the tied head bit-for-bit."""
    params = _params()
    untied = untie_lm_head(jax.tree.map(jnp.copy, params))
    assert untied["lm_head"].shape == (64, 128)  # padded to lanes

    outs = {}
    for tag, p in (("tied", params), ("untied", untied)):
        s = _sched(jax.tree.map(jnp.copy, p))
        rid = s.add_request([3, 1, 4, 1, 5],
                            SamplingParams(max_new_tokens=8, greedy=True))
        s.run_to_completion(max_steps=100)
        outs[tag] = s.get(rid).output_ids
    assert outs["tied"] == outs["untied"]


def test_quantized_head_logits_match_dequant_oracle():
    """Fused int8 head matmul == dot with the explicitly dequantized head
    (per-group accumulation order tolerance only), and pad columns never
    leak into the logits."""
    from vllmini_tpu.models import gpt2

    params = quantize_params(untie_lm_head(_params()),
                             QuantConfig(weight_dtype="int8", group_size=64),
                             model_config=MODEL)
    assert isinstance(params["lm_head"], QuantizedWeight)

    logits, _ = gpt2.prefill_forward(
        params, MODEL, None, jnp.asarray([3, 1, 4, 1, 5, 9, 2, 6], jnp.int32),
        jnp.int32(8), jnp.zeros(8, jnp.int32), return_all_logits=True,
        interpret=True)
    assert logits.shape == (8, 97)  # pad sliced off

    from vllmini_tpu.ops.quant_matmul import dequantize_weight
    ref_params = dict(params)
    ref_params["lm_head"] = dequantize_weight(params["lm_head"])
    ref, _ = gpt2.prefill_forward(
        ref_params, MODEL, None,
        jnp.asarray([3, 1, 4, 1, 5, 9, 2, 6], jnp.int32),
        jnp.int32(8), jnp.zeros(8, jnp.int32), return_all_logits=True,
        interpret=True)
    np.testing.assert_allclose(np.asarray(logits), np.asarray(ref),
                               atol=1e-4, rtol=1e-4)


def test_int8_gpt2_engine_end_to_end():
    """Fully quantized GPT-2 (int8 blocks + int8 untied head) serves
    deterministically through the whole scheduler stack, burst prefill
    included."""
    params = quantize_params(untie_lm_head(_params()),
                             QuantConfig(weight_dtype="int8", group_size=64),
                             model_config=MODEL)
    prompts = [[3, 1, 4, 1, 5], [9, 2, 6], [5, 3, 5, 8]]
    outs = []
    for _ in range(2):
        s = _sched(jax.tree.map(
            lambda x: jnp.copy(x) if hasattr(x, "dtype") else x, params))
        ids = [s.add_request(list(p),
                             SamplingParams(max_new_tokens=6, greedy=True))
               for p in prompts]
        s.run_to_completion(max_steps=100)
        outs.append([s.get(i).output_ids for i in ids])
        for o in outs[-1]:
            assert len(o) == 6
            assert all(0 <= t < 97 for t in o)
    assert outs[0] == outs[1]
