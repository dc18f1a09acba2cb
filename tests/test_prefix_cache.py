"""Automatic prefix caching: requests sharing a page-aligned prompt prefix
reuse its KV pages copy-on-write instead of re-prefilling."""

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
                   num_layers=2, num_heads=2, max_position_embeddings=64,
                   dtype="float32")


def _sched(params, prefix_cache=True, num_pages=32):
    cfg = EngineConfig(
        model=TINY,
        cache=CacheConfig(num_pages=num_pages, page_size=4,
                          max_pages_per_seq=8,
                          enable_prefix_cache=prefix_cache),
        scheduler=SchedulerConfig(max_decode_slots=2, decode_chunk_steps=3,
                                  pipeline_depth=1, prefill_buckets=(8, 16)),
        hf_model=None,
    )
    return Scheduler(LLMEngine(cfg, params=jax.tree.map(jnp.copy, params)))


def _run(sched, prompt, n=5):
    rid = sched.add_request(list(prompt), SamplingParams(max_new_tokens=n,
                                                         greedy=True))
    sched.run_to_completion(max_steps=200)
    return sched.get(rid).output_ids


def test_prefix_reuse_matches_cold_and_shares_pages():
    family = get_family(TINY)
    params = family.init_params(TINY, jax.random.PRNGKey(0))
    rng = np.random.default_rng(2)
    prompt = rng.integers(0, TINY.vocab_size, 14).tolist()  # 3 full pages + 2

    warm = _sched(params, prefix_cache=True)
    out1 = _run(warm, prompt)
    hits0 = warm.engine.prefix_caches[0].hits
    out2 = _run(warm, prompt)  # same prompt again: 12 tokens adopted
    cache = warm.engine.prefix_caches[0]
    assert cache.hits == hits0 + 1
    assert cache.hit_tokens >= 12
    assert out2 == out1, (out2, out1)

    # A longer prompt sharing the first pages also hits.
    longer = prompt + rng.integers(0, TINY.vocab_size, 6).tolist()
    out3 = _run(warm, longer)
    cold = _sched(params, prefix_cache=False)
    assert _run(cold, prompt) == out1
    assert _run(cold, longer) == out3


def test_prefix_cache_pages_shared_and_reclaimed():
    family = get_family(TINY)
    params = family.init_params(TINY, jax.random.PRNGKey(1))
    sched = _sched(params, prefix_cache=True)
    prompt = list(range(1, 13))  # 3 full pages
    _run(sched, prompt)
    alloc = sched.engine.allocator
    cache = sched.engine.prefix_caches[0]
    assert len(cache) == 3
    # Cache holds its references even after the sequence finished.
    held = 32 - alloc.num_free_pages
    assert held == 3
    cache.clear()
    assert alloc.num_free_pages == 32


def test_prefix_cache_evicts_under_pressure():
    family = get_family(TINY)
    params = family.init_params(TINY, jax.random.PRNGKey(3))
    sched = _sched(params, prefix_cache=True, num_pages=8)
    rng = np.random.default_rng(7)
    outs = []
    for i in range(4):  # each distinct prompt fills 3 pages of cache
        p = rng.integers(0, TINY.vocab_size, 12).tolist()
        outs.append(_run(sched, p, n=3))
    # The pool (8 pages) can't hold 4x3 cached pages: eviction must have
    # kept admission working; every request completed.
    assert all(len(o) == 3 for o in outs)
    assert sched.engine.allocator.num_free_pages >= 0
