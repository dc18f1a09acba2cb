"""Chunked prefill (VERDICT r1 next #4): prompts longer than the largest
compile bucket are admitted in page-aligned chunks; each chunk attends over
the pool-resident prefix through the rectangular flash kernel, and the
result is token-identical to a single whole-prompt prefill."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from vllmini_tpu.config import (CacheConfig, EngineConfig, ModelConfig,
                                SamplingParams, SchedulerConfig)
from vllmini_tpu.engine.engine import LLMEngine
from vllmini_tpu.engine.scheduler import Scheduler
from vllmini_tpu.models.registry import get_family

TINY = ModelConfig(family="gpt2", vocab_size=211, hidden_size=32,
                   num_layers=2, num_heads=2, max_position_embeddings=128,
                   dtype="float32")
LLAMA = ModelConfig(family="llama", vocab_size=211, hidden_size=32,
                    num_layers=2, num_heads=4, num_kv_heads=2,
                    intermediate_size=64, max_position_embeddings=128,
                    dtype="float32")


def _sched(params, model, buckets, kv_dtype="float32"):
    cfg = EngineConfig(
        model=model,
        cache=CacheConfig(num_pages=48, page_size=4, max_pages_per_seq=24,
                          kv_dtype=kv_dtype),
        scheduler=SchedulerConfig(max_decode_slots=2, decode_chunk_steps=3,
                                  pipeline_depth=1, prefill_buckets=buckets),
        hf_model=None,
    )
    return Scheduler(LLMEngine(cfg, params=jax.tree.map(jnp.copy, params)))


def _run(sched, prompt, n=5):
    rid = sched.add_request(list(prompt), SamplingParams(max_new_tokens=n,
                                                         greedy=True))
    sched.run_to_completion(max_steps=200)
    return sched.get(rid).output_ids


def test_chunked_equals_whole_prompt_gpt2():
    family = get_family(TINY)
    params = family.init_params(TINY, jax.random.PRNGKey(0))
    rng = np.random.default_rng(3)
    prompt = rng.integers(0, TINY.vocab_size, 19).tolist()  # 2x8 + 3
    chunked = _sched(params, TINY, buckets=(8,))
    assert chunked.engine.prefill_chunk == 8
    whole = _sched(params, TINY, buckets=(8, 16, 32))
    out_c = _run(chunked, prompt)
    out_w = _run(whole, prompt)
    assert len(out_c) == 5
    assert out_c == out_w, (out_c, out_w)


def test_chunked_prefill_llama_quant_kv_logit_parity():
    """Chunked prefill over an int8 KV pool: the prefix is dequantized from
    the pool; final-chunk logits match the whole-prompt prefill of the SAME
    quantized pipeline within int8 noise (exact greedy-token equality is not
    guaranteed — splitting the prompt changes matmul reduction order by an
    ulp, which per-token re-quantization can amplify)."""
    from vllmini_tpu.memory.kv_cache import create_kv_pool

    family = get_family(LLAMA)
    params = family.init_params(LLAMA, jax.random.PRNGKey(1))
    cache = CacheConfig(num_pages=16, page_size=4, max_pages_per_seq=8,
                        kv_dtype="int8")
    rng = np.random.default_rng(4)
    toks = jnp.asarray(rng.integers(0, LLAMA.vocab_size, 12), jnp.int32)
    table = jnp.arange(8, dtype=jnp.int32)

    pool_w = create_kv_pool(LLAMA, cache)
    logits_w, _ = family.prefill_forward(
        params, LLAMA, pool_w, toks, jnp.int32(12), table, interpret=True)
    pool_c = create_kv_pool(LLAMA, cache)
    _, pool_c = family.prefill_forward(
        params, LLAMA, pool_c, toks[:8], jnp.int32(8), table,
        interpret=True)
    logits_c, _ = family.prefill_forward(
        params, LLAMA, pool_c, toks[8:], jnp.int32(4), table, start_pos=8,
        interpret=True)
    np.testing.assert_allclose(np.asarray(logits_c), np.asarray(logits_w),
                               atol=3e-2, rtol=3e-2)


def test_model_level_chunked_prefill_logit_parity():
    """Direct model check: prefill in two chunks == one-shot prefill, to
    tight tolerance (same arithmetic path up to flash block boundaries)."""
    from vllmini_tpu.memory.kv_cache import create_kv_pool

    family = get_family(TINY)
    params = family.init_params(TINY, jax.random.PRNGKey(2))
    cache = CacheConfig(num_pages=16, page_size=4, max_pages_per_seq=8)
    rng = np.random.default_rng(5)
    toks = jnp.asarray(rng.integers(0, TINY.vocab_size, 12), jnp.int32)
    table = jnp.arange(8, dtype=jnp.int32)

    pool_w = create_kv_pool(TINY, cache)
    logits_w, pool_w = family.prefill_forward(
        params, TINY, pool_w, toks, jnp.int32(12), table, interpret=True)

    pool_c = create_kv_pool(TINY, cache)
    _, pool_c = family.prefill_forward(
        params, TINY, pool_c, toks[:8], jnp.int32(8), table,
        interpret=True)
    logits_c, pool_c = family.prefill_forward(
        params, TINY, pool_c, toks[8:], jnp.int32(4), table, start_pos=8,
        interpret=True)

    np.testing.assert_allclose(np.asarray(logits_c), np.asarray(logits_w),
                               atol=1e-4, rtol=1e-4)
    # Pool contents agree to bf16 ulp (the chunk split changes matmul
    # reduction order).
    for a, b in zip(pool_c.kv_pages, pool_w.kv_pages):
        np.testing.assert_allclose(np.asarray(a, np.float32),
                                   np.asarray(b, np.float32), atol=4e-3)
