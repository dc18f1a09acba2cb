"""Sampled-token log-probs captured at decode time (OpenAI `logprobs`).

Oracle: teacher-force prompt+generated through the cache-less prefill scorer
and compare each generated token's log-softmax against the device-captured
value — across plain decode, the prefill first token, speculative decode,
and recompute preemption (absorbed tokens keep theirs).
"""

import jax
import jax.numpy as jnp
import numpy as np

from vllmini_tpu.config import (CacheConfig, EngineConfig, ModelConfig,
                                SamplingParams, SchedulerConfig)
from vllmini_tpu.engine.engine import LLMEngine
from vllmini_tpu.engine.scheduler import Scheduler
from vllmini_tpu.models.registry import get_family

TINY = ModelConfig(family="gpt2", vocab_size=128, hidden_size=64,
                   num_layers=2, num_heads=4, intermediate_size=128,
                   max_position_embeddings=128, dtype="float32")
PROMPT = [1, 2, 3, 4, 5, 6, 7, 8]


def _make(params, *, spec=0, preemption="swap", num_pages=64):
    cfg = EngineConfig(
        model=TINY,
        cache=CacheConfig(num_pages=num_pages, page_size=8,
                          max_pages_per_seq=8, kv_dtype="float32"),
        scheduler=SchedulerConfig(max_decode_slots=2, decode_chunk_steps=4,
                                  pipeline_depth=1, prefill_buckets=(16,),
                                  speculative_tokens=spec,
                                  speculative_ngram=2,
                                  preemption_mode=preemption),
        hf_model=None,
    )
    return Scheduler(LLMEngine(cfg, params=jax.tree.map(jnp.copy, params)))


def _oracle_logprobs(params, prompt, gen):
    """Teacher-forced log-softmax of each generated token."""
    family = get_family(TINY)
    ids = list(prompt) + list(gen)
    L = len(ids)
    pad = np.zeros(16 * ((L + 15) // 16), np.int32)
    pad[:L] = ids
    logits, _ = family.prefill_forward(
        params, TINY, None, jnp.asarray(pad), jnp.int32(L), page_table=None,
        interpret=True, return_all_logits=True)
    lp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    # Token at position p is predicted from position p-1's logits.
    return [float(lp[len(prompt) - 1 + j, t]) for j, t in enumerate(gen)]


def _run(sched, *, max_new=10, greedy=True, seed=3):
    rid = sched.add_request(list(PROMPT), SamplingParams(
        max_new_tokens=max_new, greedy=greedy, temperature=0.9, seed=seed,
        logprobs=True))
    sched.run_to_completion(max_steps=200)
    seq = sched.get(rid)
    return seq.generated_ids(), seq.generated_logprobs()


def test_logprobs_match_teacher_forced_oracle():
    family = get_family(TINY)
    params = family.init_params(TINY, jax.random.PRNGKey(0))
    for greedy in (True, False):
        gen, lps = _run(_make(params), greedy=greedy)
        assert len(lps) == len(gen)
        oracle = _oracle_logprobs(params, PROMPT, gen)
        np.testing.assert_allclose(lps, oracle, rtol=0, atol=5e-4)
        assert all(x <= 0.0 for x in lps)


def test_logprobs_gated_off_by_default():
    """Without SamplingParams.logprobs the lse pass is compiled out: tokens
    are identical, captured lps are zeros, and a MIXED batch (one flagged
    request) still gets oracle-correct values for the flagged one."""
    family = get_family(TINY)
    params = family.init_params(TINY, jax.random.PRNGKey(0))

    s = _make(params)
    rid = s.add_request(list(PROMPT), SamplingParams(max_new_tokens=10,
                                                     greedy=True))
    s.run_to_completion(max_steps=200)
    plain = s.get(rid)
    gen_flagged, lps_flagged = _run(_make(params), greedy=True)
    assert plain.generated_ids() == gen_flagged
    assert all(x == 0.0 for x in plain.generated_logprobs()[1:])

    # Mixed batch: the flagged request's values stay oracle-correct.
    s = _make(params)
    a = s.add_request(list(PROMPT), SamplingParams(
        max_new_tokens=10, greedy=True, logprobs=True))
    b = s.add_request([9, 8, 7, 6], SamplingParams(max_new_tokens=10,
                                                   greedy=True))
    s.run_to_completion(max_steps=200)
    seq = s.get(a)
    oracle = _oracle_logprobs(params, PROMPT, seq.generated_ids())
    np.testing.assert_allclose(seq.generated_logprobs(), oracle,
                               rtol=0, atol=5e-4)


def test_logprobs_under_speculative_decode():
    family = get_family(TINY)
    params = family.init_params(TINY, jax.random.PRNGKey(0))
    gen, lps = _run(_make(params, spec=3))
    gen0, lps0 = _run(_make(params))
    assert gen == gen0
    np.testing.assert_allclose(lps, lps0, rtol=0, atol=5e-4)


def test_logprobs_survive_recompute_preemption():
    family = get_family(TINY)
    params = family.init_params(TINY, jax.random.PRNGKey(0))
    # Starve the pool so the second request forces a preemption.
    s = _make(params, preemption="recompute", num_pages=4)
    a = s.add_request(list(PROMPT), SamplingParams(max_new_tokens=12,
                                                   greedy=True,
                                                   logprobs=True))
    b = s.add_request([9, 8, 7, 6, 5, 4, 3, 2],
                      SamplingParams(max_new_tokens=12, greedy=True,
                                     logprobs=True))
    s.run_to_completion(max_steps=400)
    assert s.engine.metrics.snapshot().get("preemptions", 0) > 0
    for rid in (a, b):
        seq = s.get(rid)
        gen, lps = seq.generated_ids(), seq.generated_logprobs()
        assert len(lps) == len(gen)
        oracle = _oracle_logprobs(params, seq.prompt_ids[
            : seq.orig_prompt_len], gen)
        np.testing.assert_allclose(lps, oracle, rtol=0, atol=5e-4)
