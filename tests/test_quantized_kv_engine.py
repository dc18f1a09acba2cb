"""End-to-end engine runs with a quantized (int8) KV cache.

Covers the north-star quantized-cache path through prefill, chunked decode,
swap-preemption, all with per-token scales maintained alongside the pool.
"""

import jax.numpy as jnp
import numpy as np
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
from vllmini_tpu.engine.sequence import SequenceState

TINY = ModelConfig(family="gpt2", vocab_size=128, hidden_size=32,
                   num_layers=2, num_heads=2, max_position_embeddings=64,
                   dtype="float32")


def make_sched(kv_dtype, num_pages=32):
    cfg = EngineConfig(
        model=TINY,
        cache=CacheConfig(num_pages=num_pages, page_size=4,
                          max_pages_per_seq=8, kv_dtype=kv_dtype),
        scheduler=SchedulerConfig(max_decode_slots=2,
                                  prefill_buckets=(8, 16),
                                  decode_chunk_steps=2),
        hf_model=None,
    )
    return Scheduler(LLMEngine(cfg))


@pytest.mark.parametrize("kv_dtype", ["int8", "fp8_e4m3"])
def test_quantized_kv_generation_completes(kv_dtype):
    s = make_sched(kv_dtype)
    a = s.add_request([1, 2, 3, 4, 5], SamplingParams(max_new_tokens=5,
                                                      greedy=True))
    b = s.add_request([9, 8, 7], SamplingParams(max_new_tokens=3,
                                                greedy=True))
    s.run_to_completion(max_steps=60)
    for sid, n in [(a, 5), (b, 3)]:
        seq = s.get(sid)
        assert seq.state == SequenceState.FINISHED
        assert len(seq.generated_ids()) == n
        assert all(0 <= t < 128 for t in seq.generated_ids())
    # Scales got populated for used pages.
    pool = s.engine.pool
    assert float(np.abs(np.asarray(pool.kv_scales)).sum()) > 0


def test_float16_kv_generation_completes():
    """fp16 cache option (the reference's dtype, `kv_cache.py:13-14`) —
    unquantized path, no scale pool."""
    s = make_sched("float16")
    a = s.add_request([1, 2, 3, 4, 5], SamplingParams(max_new_tokens=5,
                                                      greedy=True))
    s.run_to_completion(max_steps=60)
    seq = s.get(a)
    assert seq.state == SequenceState.FINISHED
    assert len(seq.generated_ids()) == 5
    assert s.engine.pool.kv_scales is None
    assert s.engine.pool.kv_pages[0].dtype == jnp.float16


def test_quantized_kv_close_to_fp32():
    """int8 KV shouldn't derail greedy decode on a tame model: the first
    generated token (pure prefill, no quantized reads) must match, and the
    full outputs should mostly agree."""
    prompt = [5, 9, 42, 7]
    f32 = make_sched("float32")
    q = make_sched("int8")
    a = f32.add_request(prompt, SamplingParams(max_new_tokens=6, greedy=True))
    b = q.add_request(prompt, SamplingParams(max_new_tokens=6, greedy=True))
    f32.run_to_completion(max_steps=60)
    q.run_to_completion(max_steps=60)
    out_f = f32.get(a).generated_ids()
    out_q = q.get(b).generated_ids()
    assert out_f[0] == out_q[0]
    agree = sum(x == y for x, y in zip(out_f, out_q))
    assert agree >= len(out_f) - 2, (out_f, out_q)


def test_quantized_kv_swap_preemption():
    s = make_sched("int8", num_pages=7)
    ids = [s.add_request([i + 1] * 5, SamplingParams(max_new_tokens=4,
                                                     greedy=True))
           for i in range(2)]
    s.run_to_completion(max_steps=100)
    for sid in ids:
        assert s.get(sid).state == SequenceState.FINISHED
        assert len(s.get(sid).generated_ids()) == 4


def test_packed_pool_engine_matches_padded():
    """Engine with the PACKED pool layout (head_dim<128) generates the same
    greedy tokens as the lane-padded layout."""
    import jax
    import jax.numpy as jnp

    from vllmini_tpu.config import (CacheConfig, EngineConfig, ModelConfig,
                                    SamplingParams, SchedulerConfig)
    from vllmini_tpu.engine.engine import LLMEngine
    from vllmini_tpu.engine.scheduler import Scheduler
    from vllmini_tpu.models.registry import get_family

    model = ModelConfig(family="gpt2", vocab_size=97, hidden_size=64,
                        num_layers=2, num_heads=2,
                        max_position_embeddings=256, dtype="float32")
    family = get_family(model)
    params = family.init_params(model, jax.random.PRNGKey(5))

    outs = {}
    for mode, page_size in (("ps32", 32), ("ps16", 16)):
        cache = CacheConfig(num_pages=16 * 32 // page_size,
                            page_size=page_size,
                            max_pages_per_seq=128 // page_size,
                            kv_dtype="float32")
        cfg = EngineConfig(model=model, cache=cache,
                           scheduler=SchedulerConfig(
                               max_decode_slots=2, decode_chunk_steps=3,
                               prefill_buckets=(32,)),
                           hf_model=None)
        engine = LLMEngine(cfg, params=jax.tree.map(jnp.copy, params))
        sched = Scheduler(engine)
        rid = sched.add_request([3, 1, 4, 1, 5],
                                SamplingParams(max_new_tokens=9, greedy=True))
        sched.run_to_completion(max_steps=100)
        outs[mode] = sched.get(rid).output_ids
        assert len(outs[mode]) == 9
    assert outs["ps32"] == outs["ps16"], outs


def test_w4a8_engine_generation_completes():
    """w4a8 weights (packed int4 x int8-activation MXU kernel) through the
    full engine: prefill + chunked decode produce valid tokens."""
    import jax

    from vllmini_tpu.config import QuantConfig
    from vllmini_tpu.models.registry import get_family
    from vllmini_tpu.ops.quant_matmul import quantize_params

    model = ModelConfig(family="llama", vocab_size=128, hidden_size=256,
                        num_layers=2, num_heads=2, num_kv_heads=2,
                        intermediate_size=512, max_position_embeddings=64,
                        tie_word_embeddings=False, dtype="float32")
    params = quantize_params(
        get_family(model).init_params(model, jax.random.PRNGKey(0)),
        QuantConfig(weight_dtype="w4a8"), model_config=model)
    cfg = EngineConfig(
        model=model,
        cache=CacheConfig(num_pages=32, page_size=4, max_pages_per_seq=8,
                          kv_dtype="int8"),
        scheduler=SchedulerConfig(max_decode_slots=2,
                                  prefill_buckets=(8, 16),
                                  decode_chunk_steps=2),
        hf_model=None,
    )
    sched = Scheduler(LLMEngine(cfg, params=params))
    rid = sched.add_request(list(range(1, 11)),
                            SamplingParams(max_new_tokens=6, greedy=True))
    sched.run_to_completion(max_steps=100)
    out = sched.get(rid).output_ids
    assert len(out) == 6
    assert all(0 <= t < model.vocab_size for t in out)
