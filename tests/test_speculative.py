"""Speculative decoding (n-gram / prompt-lookup drafting).

The reference has no speculative decoding; vLLM ships it as the ngram /
prompt-lookup proposer. Here each decode chunk iteration drafts S tokens per
slot from the slot's own device-resident token history, verifies fed-token +
drafts in ONE weight stream (`decode_verify_forward`), and commits the
accepted prefix plus the bonus sample. The invariant under test: output is
BIT-IDENTICAL to plain decoding for greedy AND seeded sampling — a draft is
accepted only when it equals the token the verifier sampled at that position,
so drafting can only change speed, never the token stream.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vllmini_tpu.config import (CacheConfig, EngineConfig, ModelConfig,
                                SamplingParams, SchedulerConfig)
from vllmini_tpu.engine.engine import LLMEngine, _propose_ngram
from vllmini_tpu.engine.scheduler import Scheduler
from vllmini_tpu.models.registry import get_family

TINY = ModelConfig(family="gpt2", vocab_size=128, hidden_size=32,
                   num_layers=2, num_heads=2, max_position_embeddings=128,
                   dtype="float32")
TINY_LLAMA = ModelConfig(family="llama", vocab_size=128, hidden_size=32,
                         num_layers=2, num_heads=2, num_kv_heads=2,
                         intermediate_size=64, max_position_embeddings=128,
                         dtype="float32")

# A prompt whose continuation (tiny greedy models lock into cycles) plus its
# own periodic body gives the n-gram proposer real matches.
PROMPT = [1, 2, 3, 1, 2, 3, 1, 2]


def _make(model, params, spec, *, kv_dtype="float32", num_pages=64,
          page_size=8, chunk=8, window=None, preemption="swap"):
    import dataclasses
    if window is not None:
        model = dataclasses.replace(model, sliding_window=window)
    cfg = EngineConfig(
        model=model,
        cache=CacheConfig(num_pages=num_pages, page_size=page_size,
                          max_pages_per_seq=16, kv_dtype=kv_dtype),
        scheduler=SchedulerConfig(max_decode_slots=2,
                                  decode_chunk_steps=chunk,
                                  pipeline_depth=1, prefill_buckets=(16,),
                                  speculative_tokens=spec,
                                  speculative_ngram=2,
                                  preemption_mode=preemption),
        hf_model=None,
    )
    return Scheduler(LLMEngine(cfg, params=jax.tree.map(jnp.copy, params)))


def _generate(sched, prompt, *, max_new=32, greedy=True, seed=7):
    rid = sched.add_request(list(prompt), SamplingParams(
        max_new_tokens=max_new, greedy=greedy, temperature=0.8, seed=seed))
    sched.run_to_completion(max_steps=300)
    out = sched.get(rid).generated_ids()
    st = sched.engine.state
    return out, int(np.asarray(st.spec_emitted).sum()), \
        int(np.asarray(st.spec_steps).sum())


# ------------------------------------------------------------- proposer unit

def test_propose_ngram_prefers_full_continuation():
    """On a self-similar stream the MOST RECENT match sits at T-1 and its
    continuation is unwritten; the proposer must fall back to a match whose
    full S-token continuation is committed history."""
    cap = 16
    buf = jnp.zeros((3, cap), jnp.int32)
    buf = buf.at[0, :8].set(2)                                # constant
    buf = buf.at[1, :8].set(jnp.array([1, 2, 3, 1, 2, 3, 1, 2]))  # period 3
    buf = buf.at[2, :8].set(jnp.array([5, 6, 7, 8, 9, 10, 11, 12]))
    T = jnp.array([8, 8, 8], jnp.int32)
    last = jnp.array([2, 3, 13], jnp.int32)
    d = np.asarray(_propose_ngram(buf, T, last, n=3, S=4))
    assert d[0].tolist() == [2, 2, 2, 2]
    assert d[1].tolist() == [1, 2, 3, 1]
    assert d[2].tolist() == [0, 0, 0, 0]  # no match -> no (real) draft


def test_propose_ngram_partial_fallback():
    """Only a near-the-end match exists: propose its committed continuation
    and zero-mask the uncommitted tail rather than proposing garbage."""
    cap = 16
    # Committed [4, 5, 9, 4] (T=4), pending last=5: the suffix 2-gram [4, 5]
    # matches only at p=1, too close to the end for a full 3-token
    # continuation (needs p <= 0). Fall back to it anyway: drafts are
    # buf[2:5] with the uncommitted position 4 masked to 0.
    buf = jnp.zeros((1, cap), jnp.int32).at[0, :4].set(
        jnp.array([4, 5, 9, 4]))
    d = np.asarray(_propose_ngram(buf, jnp.array([4]), jnp.array([5]),
                                  n=2, S=3))
    assert d[0].tolist() == [9, 4, 0]


# --------------------------------------------------------------- end to end

def test_spec_matches_serial_greedy_and_accelerates():
    family = get_family(TINY)
    params = family.init_params(TINY, jax.random.PRNGKey(3))
    serial, _, _ = _generate(_make(TINY, params, 0), PROMPT, max_new=40)
    out, emitted, steps = _generate(_make(TINY, params, 3), PROMPT,
                                    max_new=40)
    assert out == serial
    # Tiny greedy models cycle; with real acceptance a verify step commits
    # >1 token on average (seed 3 measures ~2.05).
    assert steps > 0 and emitted > steps, (emitted, steps)


def test_spec_matches_serial_sampled():
    family = get_family(TINY)
    params = family.init_params(TINY, jax.random.PRNGKey(3))
    serial, _, _ = _generate(_make(TINY, params, 0), PROMPT, greedy=False,
                             seed=11)
    out, _, steps = _generate(_make(TINY, params, 3), PROMPT, greedy=False,
                              seed=11)
    # Per-position (seed, position) sampling makes rejection exact: the
    # stream is bit-identical however many drafts were tried.
    assert out == serial and steps > 0


def test_spec_matches_serial_llama_quantized_kv():
    """int8 KV + spec: write_kv_spec quantizes per token exactly like the
    serial fused write, so greedy outputs stay bit-identical to the serial
    int8 run."""
    family = get_family(TINY_LLAMA)
    params = family.init_params(TINY_LLAMA, jax.random.PRNGKey(5))
    serial, _, _ = _generate(
        _make(TINY_LLAMA, params, 0, kv_dtype="int8", page_size=32,
              num_pages=16), PROMPT)
    out, _, steps = _generate(
        _make(TINY_LLAMA, params, 3, kv_dtype="int8", page_size=32,
              num_pages=16), PROMPT)
    assert out == serial and steps > 0


def test_spec_matches_serial_sliding_window():
    family = get_family(TINY_LLAMA)
    params = family.init_params(TINY_LLAMA, jax.random.PRNGKey(1))
    serial, _, _ = _generate(_make(TINY_LLAMA, params, 0, window=16), PROMPT)
    out, _, steps = _generate(_make(TINY_LLAMA, params, 3, window=16),
                              PROMPT)
    assert out == serial and steps > 0


def test_spec_two_concurrent_requests():
    """Per-slot budgets and histories stay independent under continuous
    batching: two staggered requests both match their serial outputs."""
    family = get_family(TINY)
    params = family.init_params(TINY, jax.random.PRNGKey(3))
    prompts = [PROMPT, [4, 4, 4, 4, 4]]
    serial = []
    for p in prompts:
        o, _, _ = _generate(_make(TINY, params, 0), p, max_new=24)
        serial.append(o)
    sched = _make(TINY, params, 3)
    rids = [sched.add_request(list(p), SamplingParams(max_new_tokens=24,
                                                      greedy=True))
            for p in prompts]
    sched.run_to_completion(max_steps=300)
    for rid, want in zip(rids, serial):
        assert sched.get(rid).generated_ids() == want


def test_spec_survives_preemption():
    """Recompute-preemption rebuilds the device token history (all_tokens is
    re-uploaded at re-prefill), so drafting continues and outputs still
    match the unpreempted run."""
    family = get_family(TINY)
    params = family.init_params(TINY, jax.random.PRNGKey(3))
    serial, _, _ = _generate(_make(TINY, params, 3, num_pages=64), PROMPT,
                             max_new=24)
    # 6 pages (page 8): both 8-token prompts admit (1 page each), but growth
    # to 32 tokens needs 4 pages each -> forces preemption mid-decode.
    sched = _make(TINY, params, 3, num_pages=6, preemption="recompute")
    a = sched.add_request(list(PROMPT), SamplingParams(max_new_tokens=24,
                                                       greedy=True))
    b = sched.add_request(list(PROMPT), SamplingParams(max_new_tokens=24,
                                                       greedy=True))
    sched.run_to_completion(max_steps=400)
    assert sched.engine.metrics.snapshot().get("preemptions", 0) > 0
    assert sched.get(a).generated_ids() == serial
    assert sched.get(b).generated_ids() == serial


def test_spec_matches_serial_under_tp():
    """The spec chunk runs inside the TP shard_map (head-sharded pool +
    psums inside decode_verify_forward): tokens match the unsharded spec
    run, which matches serial."""
    from vllmini_tpu.config import ParallelConfig
    import dataclasses
    family = get_family(TINY_LLAMA)
    params = family.init_params(TINY_LLAMA, jax.random.PRNGKey(2))
    outs = {}
    for tp in (1, 2):
        cfg = EngineConfig(
            model=TINY_LLAMA,
            cache=CacheConfig(num_pages=32, page_size=8,
                              max_pages_per_seq=16, kv_dtype="float32",
                              head_pad_to=1),
            scheduler=SchedulerConfig(max_decode_slots=2,
                                      decode_chunk_steps=8,
                                      pipeline_depth=1,
                                      prefill_buckets=(16,),
                                      speculative_tokens=3,
                                      speculative_ngram=2),
            parallel=ParallelConfig(tensor_parallel=tp),
            hf_model=None,
        )
        sched = Scheduler(LLMEngine(cfg, params=jax.tree.map(jnp.copy,
                                                             params)))
        rid = sched.add_request(list(PROMPT), SamplingParams(
            max_new_tokens=16, greedy=True))
        sched.run_to_completion(max_steps=200)
        outs[tp] = sched.get(rid).generated_ids()
        assert len(outs[tp]) == 16
    assert outs[1] == outs[2]


def test_spec_tokens_must_fit_page():
    family = get_family(TINY)
    params = family.init_params(TINY, jax.random.PRNGKey(3))
    with pytest.raises(ValueError, match="page_size"):
        _make(TINY, params, 9, page_size=8)
