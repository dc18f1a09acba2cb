"""Cross-host serving: primary/worker command-replay equivalence.

Single-process stand-in for the multi-host SPMD contract
(parallel/multihost.py): a worker engine that replays the primary's recorded
device-command log must end every tick with BIT-IDENTICAL device state (KV
pool + decode state), because on a real multi-host slice each host enters the
same compiled steps with these operands.
"""

import pickle

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vllmini_tpu.config import (CacheConfig, EngineConfig, ModelConfig,
                                SamplingParams, SchedulerConfig)
from vllmini_tpu.engine.engine import LLMEngine
from vllmini_tpu.engine.scheduler import Scheduler
from vllmini_tpu.models.registry import get_family
from vllmini_tpu.parallel.multihost import (PrimaryDriver, WorkerDriver,
                                            broadcast_bytes)


def _cfg(**kw):
    return EngineConfig(
        model=ModelConfig(family="gpt2", vocab_size=97, hidden_size=32,
                          num_layers=2, num_heads=2,
                          max_position_embeddings=64, dtype="float32"),
        cache=CacheConfig(num_pages=kw.pop("num_pages", 16), page_size=4,
                          max_pages_per_seq=4, kv_dtype="float32",
                          head_pad_to=1),
        scheduler=SchedulerConfig(max_decode_slots=2, decode_chunk_steps=2,
                                  pipeline_depth=1,
                                  prefill_buckets=(8,), **kw),
        hf_model=None,
    )


def _pair(config):
    family = get_family(config.model)
    params = family.init_params(config.model, jax.random.PRNGKey(0))
    primary = LLMEngine(config, params=jax.tree.map(jnp.copy, params))
    worker = LLMEngine(config, params=jax.tree.map(jnp.copy, params))
    return primary, worker


def _assert_devices_match(a: LLMEngine, b: LLMEngine):
    for xa, xb in zip(jax.tree_util.tree_leaves((a.pool, a.state)),
                      jax.tree_util.tree_leaves((b.pool, b.state))):
        np.testing.assert_array_equal(np.asarray(xa), np.asarray(xb))
    np.testing.assert_array_equal(a._tables_host, b._tables_host)


def test_worker_replay_matches_primary():
    config = _cfg()
    primary_engine, worker_engine = _pair(config)
    sched = Scheduler(primary_engine)
    worker = WorkerDriver(worker_engine)

    r1 = sched.add_request([3, 1, 4], SamplingParams(max_new_tokens=5,
                                                     greedy=True))
    r2 = sched.add_request([1, 5, 9, 2, 6], SamplingParams(
        max_new_tokens=3, temperature=0.8, top_k=5, seed=0))

    ticks = 0
    while sched.has_work and ticks < 30:
        log = []
        primary_engine.command_sink = log
        sched.step()
        primary_engine.command_sink = None
        worker.step_once(pickle.dumps(log))
        ticks += 1
    assert not sched.has_work
    assert len(sched.get(r1).output_ids) == 5
    assert len(sched.get(r2).output_ids) == 3
    _assert_devices_match(primary_engine, worker_engine)


def test_worker_replay_through_preemption_swap():
    """Pool exhaustion -> swap-out/swap-in commands replay exactly."""
    config = _cfg(num_pages=5)  # tight pool: 2 seqs can't both grow
    primary_engine, worker_engine = _pair(config)
    sched = Scheduler(primary_engine)
    worker = WorkerDriver(worker_engine)

    for p in ([2, 7, 1], [8, 2, 8, 1]):
        sched.add_request(list(p), SamplingParams(max_new_tokens=10,
                                                  greedy=True))
    ticks = 0
    preempted = False
    while sched.has_work and ticks < 60:
        log = []
        primary_engine.command_sink = log
        sched.step()
        primary_engine.command_sink = None
        ops = [op for op, _ in log]
        preempted = preempted or "swap_out" in ops
        worker.step_once(pickle.dumps(log))
        ticks += 1
    assert not sched.has_work
    assert preempted, "test did not exercise the swap path; loosen the pool"
    _assert_devices_match(primary_engine, worker_engine)


def test_primary_driver_and_broadcast_identity():
    config = _cfg()
    primary_engine, worker_engine = _pair(config)
    sched = Scheduler(primary_engine)
    driver = PrimaryDriver(sched)
    sched.add_request([5, 5], SamplingParams(max_new_tokens=2, greedy=True))
    # Single-process broadcast is the identity; drive one tick through it.
    finished = driver.step()
    assert isinstance(finished, list)
    assert broadcast_bytes(b"xyz") == b"xyz"


def test_abort_between_ticks_is_broadcast():
    """scheduler.abort() from an HTTP handler runs OUTSIDE PrimaryDriver.step();
    its device commands (clear_slot/free) must still reach workers via the
    driver's persistent command sink (ADVICE r1, high)."""
    config = _cfg()
    primary_engine, worker_engine = _pair(config)
    sched = Scheduler(primary_engine)
    driver = PrimaryDriver(sched)
    worker = WorkerDriver(worker_engine)

    r1 = sched.add_request([3, 1, 4], SamplingParams(max_new_tokens=8,
                                                     greedy=True))
    r2 = sched.add_request([2, 7], SamplingParams(max_new_tokens=8,
                                                  greedy=True))

    def tick():
        # Mirror PrimaryDriver.step() but hand the payload to the in-process
        # worker instead of the (identity) broadcast.
        try:
            sched.step()
        finally:
            worker.step_once(driver._drain())

    tick()
    tick()
    # Abort OUTSIDE a tick — as the server's DELETE handler does (api.py).
    # (With pipelined summaries r1 can occasionally already be finished at
    # this point; the property under test — commands emitted between ticks
    # replicate to the worker — holds either way.)
    sched.abort(r1)
    tick()
    ticks = 0
    while sched.has_work and ticks < 50:
        tick()
        ticks += 1
    assert not sched.has_work
    assert len(sched.get(r2).output_ids) == 8
    _assert_devices_match(primary_engine, worker_engine)
