"""Sliding-window page reclamation (VERDICT r1 weak #7 / next #9).

Pages fully below the attention window are recycled as a ring, so a long
windowed generation holds a bounded number of physical pages — and produces
EXACTLY the same tokens as the non-recycling allocator (the kernel's window
masks and conditional gathers never read the dead slots).
"""

import jax
import jax.numpy as jnp

from vllmini_tpu.config import (CacheConfig, EngineConfig, ModelConfig,
                                SamplingParams, SchedulerConfig)
from vllmini_tpu.engine.engine import LLMEngine
from vllmini_tpu.engine.scheduler import Scheduler
from vllmini_tpu.memory.allocator import PageAllocator, make_allocator
from vllmini_tpu.models.registry import get_family

WINDOWED = ModelConfig(family="llama", vocab_size=151, hidden_size=32,
                       num_layers=2, num_heads=2, num_kv_heads=2,
                       intermediate_size=64, max_position_embeddings=128,
                       sliding_window=8, dtype="float32")


def test_allocator_ring_bounds_steady_state():
    # window 8 tokens, page 4 -> ring = ceil(8/4)+1 = 3 pages
    a = PageAllocator(num_pages=32, page_size=4, pages_per_seq_max=16,
                      window_pages=3)
    a.allocate(1, 5)  # 2 pages
    for _ in range(40):
        a.append_token(1)
    table = a.seq_pages(1)
    assert len(table) == a.pages_needed(45)
    assert len(set(table)) <= 3          # steady-state physical footprint
    assert a.num_free_pages == 32 - len(set(table))
    # Period-ring reuse: same physical page every `ring` logical slots.
    for j in range(3, len(table)):
        assert table[j] == table[j - 3]
    released = a.free(1)
    assert a.num_free_pages == 32 and len(released) == len(set(table))


def test_allocator_ring_never_recycles_shared_pages():
    a = PageAllocator(num_pages=32, page_size=4, pages_per_seq_max=16,
                      window_pages=3)
    a.allocate(1, 12)  # 3 pages (full ring)
    a.fork(1, 2)       # all shared
    for _ in range(8):
        a.append_token(1)
    table = a.seq_pages(1)
    shared = set(a.seq_pages(2))
    # New pages past the fork are fresh, not recycled shared ones.
    assert all(p not in shared for p in table[3:])
    a.free(1)
    a.free(2)
    assert a.num_free_pages == 32


def _build(params, ring: bool):
    cfg = EngineConfig(
        model=WINDOWED,
        cache=CacheConfig(num_pages=24, page_size=4, max_pages_per_seq=16),
        scheduler=SchedulerConfig(max_decode_slots=2, decode_chunk_steps=4,
                                  pipeline_depth=1, prefill_buckets=(8,)),
        hf_model=None,
    )
    engine = LLMEngine(cfg, params=jax.tree.map(jnp.copy, params))
    # ring = ceil(window/ps) + chunk_pages = ceil(8/4) + 8//4 = 4: wide
    # enough that a full prefill chunk's writes never alias in-window pages.
    assert engine.window_pages == 4
    if not ring:
        engine.window_pages = None
        engine.allocators = [make_allocator(24, 4, 16, window_pages=None,
                                            force_python=True)]
        engine.allocator = engine.allocators[0]
    return Scheduler(engine)


def test_windowed_generation_matches_non_ring_and_bounds_pages():
    family = get_family(WINDOWED)
    params = family.init_params(WINDOWED, jax.random.PRNGKey(0))
    prompt = [3, 1, 4, 1, 5]
    outs = {}
    for ring in (True, False):
        sched = _build(params, ring)
        rid = sched.add_request(list(prompt), SamplingParams(
            max_new_tokens=40, greedy=True))
        # Peek at page usage mid-generation.
        max_distinct = 0
        for _ in range(40):
            sched.step()
            if sched.engine.allocator.has_seq(rid):
                pages = sched.engine.allocator.seq_pages(rid)
                max_distinct = max(max_distinct, len(set(pages)))
            if not sched.has_work:
                break
        sched.run_to_completion(max_steps=100)
        outs[ring] = sched.get(rid).output_ids
        assert len(outs[ring]) == 40
        if ring:
            # ring=4 plus up to one chunk's reserved headroom page
            assert max_distinct <= 5, max_distinct
        else:
            assert max_distinct >= 9  # without reclamation pages pile up
    assert outs[True] == outs[False]


def test_windowed_chunked_prefill_matches_non_ring():
    """ADVICE r2 high #1: a prompt longer than prefill_chunk used to have
    its chunk KV writes ring-aliased onto pages still backing in-window
    prefix positions; the widened ring must make chunked prefill bit-exact
    vs the non-recycling allocator."""
    family = get_family(WINDOWED)
    params = family.init_params(WINDOWED, jax.random.PRNGKey(1))
    # prefill_chunk = 8 (bucket 8): prompt 21 -> chunks [0:8), [8:16), rem 5.
    prompt = [(7 * i + 3) % WINDOWED.vocab_size for i in range(21)]
    outs = {}
    for ring in (True, False):
        sched = _build(params, ring)
        rid = sched.add_request(list(prompt), SamplingParams(
            max_new_tokens=16, greedy=True))
        sched.run_to_completion(max_steps=100)
        outs[ring] = sched.get(rid).output_ids
        assert len(outs[ring]) == 16
    assert outs[True] == outs[False]
