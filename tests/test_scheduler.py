"""Continuous-batching scheduler integration tests (tiny model, CPU interpret).

Reference analog: `vllmini/tests/test_scheduler.py` (add_sequence bookkeeping,
run-to-empty, max_length bound, removal cleans dicts). Extended here with the
behaviors the reference lacks: true continuous batching, per-request limits,
preemption with swap — verified bit-exact against an unpreempted run.
"""

import jax.numpy as jnp
import pytest

from vllmini_tpu.config import (
    CacheConfig,
    EngineConfig,
    ModelConfig,
    SamplingParams,
    SchedulerConfig,
)
from vllmini_tpu.engine.engine import LLMEngine
from vllmini_tpu.engine.scheduler import Scheduler
from vllmini_tpu.engine.sequence import FinishReason, SequenceState

TINY = ModelConfig(family="gpt2", vocab_size=128, hidden_size=32,
                   num_layers=2, num_heads=2, max_position_embeddings=64,
                   dtype="float32")


def make_sched(num_pages=32, page_size=4, max_pages=8, slots=2,
               preemption="swap"):
    cfg = EngineConfig(
        model=TINY,
        cache=CacheConfig(num_pages=num_pages, page_size=page_size,
                          max_pages_per_seq=max_pages, kv_dtype="float32"),
        scheduler=SchedulerConfig(max_decode_slots=slots,
                                  prefill_buckets=(8, 16, 32),
                                  decode_chunk_steps=2,
                                  preemption_mode=preemption),
        hf_model=None,
    )
    return Scheduler(LLMEngine(cfg))


def greedy(n=4, **kw):
    return SamplingParams(max_new_tokens=n, greedy=True, **kw)


def test_single_request_completes():
    s = make_sched()
    sid = s.add_request([1, 2, 3, 4, 5], greedy(4))
    s.run_to_completion(max_steps=50)
    seq = s.get(sid)
    assert seq.state == SequenceState.FINISHED
    assert seq.finish_reason == FinishReason.MAX_NEW_TOKENS
    assert len(seq.generated_ids()) == 4
    assert all(0 <= t < 128 for t in seq.generated_ids())


def test_more_requests_than_slots():
    s = make_sched(slots=2)
    ids = [s.add_request([i + 1, i + 2, i + 3], greedy(3)) for i in range(5)]
    s.run_to_completion(max_steps=200)
    for sid in ids:
        seq = s.get(sid)
        assert seq.state == SequenceState.FINISHED
        assert len(seq.generated_ids()) == 3


def test_greedy_determinism_and_batch_independence():
    prompt = [7, 8, 9, 10]
    s1 = make_sched(slots=1)
    a = s1.add_request(prompt, greedy(5))
    s1.run_to_completion(max_steps=50)
    out_solo = s1.get(a).generated_ids()

    # Same prompt among other concurrent requests must produce the same tokens.
    s2 = make_sched(slots=3)
    b = s2.add_request(prompt, greedy(5))
    s2.add_request([20, 21], greedy(5))
    s2.add_request([30, 31, 32, 33, 34, 35], greedy(5))
    s2.run_to_completion(max_steps=100)
    assert s2.get(b).generated_ids() == out_solo


def test_per_request_max_new_tokens():
    s = make_sched()
    a = s.add_request([1, 2, 3], greedy(2))
    b = s.add_request([4, 5, 6], greedy(6))
    s.run_to_completion(max_steps=100)
    assert len(s.get(a).generated_ids()) == 2
    assert len(s.get(b).generated_ids()) == 6


def test_stop_token():
    s = make_sched()
    sid = s.add_request([1, 2, 3], greedy(6))
    seq = s.get(sid)
    # Find what greedy generates, then stop at its 2nd token.
    s.run_to_completion(max_steps=50)
    tokens = seq.generated_ids()
    # Stop at the first occurrence of some generated token value; everything
    # before that occurrence must be emitted, the stop token itself must not.
    stop = tokens[1] if tokens[1] not in tokens[:1] else tokens[0]
    expected = tokens[: tokens.index(stop)]

    s2 = make_sched()
    sid2 = s2.add_request([1, 2, 3], greedy(6, stop_token_ids=(stop,)))
    s2.run_to_completion(max_steps=50)
    seq2 = s2.get(sid2)
    assert seq2.finish_reason == FinishReason.STOP_TOKEN
    assert seq2.generated_ids() == expected


@pytest.mark.parametrize("mode", ["swap", "recompute"])
def test_preemption_matches_unpreempted(mode):
    prompts = [[1, 2, 3, 4, 5, 6, 7], [10, 11, 12, 13, 14, 15],
               [20, 21, 22, 23, 24]]
    n = 6

    # Ample pool: no preemption.
    big = make_sched(num_pages=64, slots=3)
    big_ids = [big.add_request(p, greedy(n)) for p in prompts]
    big.run_to_completion(max_steps=100)
    expected = [big.get(i).generated_ids() for i in big_ids]

    # Tight pool: 3 seqs need up to ceil((7+6)/4)=4 pages each = 12; give 9
    # so the third forces preemption.
    small = make_sched(num_pages=9, slots=3, preemption=mode)
    small_ids = [small.add_request(p, greedy(n)) for p in prompts]
    small.run_to_completion(max_steps=300)
    got = [small.get(i).generated_ids() for i in small_ids]
    assert got == expected
    assert small.engine.metrics.snapshot().get("preemptions", 0) >= 1


def test_abort_and_queue_cleanup():
    s = make_sched(slots=1)
    a = s.add_request([1, 2, 3], greedy(50))
    b = s.add_request([4, 5, 6], greedy(2))
    s.step()
    assert s.abort(a)
    s.run_to_completion(max_steps=100)
    assert s.get(a).finish_reason == FinishReason.ABORTED
    assert s.get(b).state == SequenceState.FINISHED
    # All pages returned.
    assert s.engine.allocator.num_free_pages == 32
    assert s.pop_finished(a) is not None
    assert s.get(a) is None


def test_finished_result_gc_bounds_sequences():
    """A client that never DELETEs results must not grow scheduler.sequences
    without bound (count-bounded eviction, oldest first)."""
    import dataclasses as _dc

    sched = make_sched(slots=2)
    # Scheduler.config is a live read-only view of engine.config (rebuilt
    # by convert_kv_dtype); override at the source.
    sched.engine.config = _dc.replace(
        sched.config, scheduler=_dc.replace(sched.config.scheduler,
                                            max_finished=5,
                                            finished_ttl_s=0.0))
    ids = []
    for i in range(12):
        ids.append(sched.add_request([1 + i % 7, 2], greedy(2)))
        sched.run_to_completion(max_steps=100)
    sched.step()  # one more tick to run GC after the last finish
    finished_kept = [i for i in ids if sched.get(i) is not None]
    assert len(finished_kept) <= 6  # cap (5) + the one finishing this tick
    # The newest results survive.
    assert sched.get(ids[-1]) is not None
