"""Collective budget: the TP decode step must ship exactly 2 all-reduces
per layer (attention out-proj + MLP down-proj) and nothing else.

VERDICT r2 #10 (multi-chip perf readiness): real multi-chip hardware isn't
available here, but the collective COUNT is a compile-time property we can
pin on the virtual mesh — any extra all-reduce/all-gather sneaking into the
decode path (e.g. a sharding annotation gone wrong re-gathering the KV pool)
would double per-step ICI latency on a real pod. Companion runbook:
`docs/RUNBOOK_v5e8.md`; trace capture: `scripts/trace_tp_step.py`.
"""

import re

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vllmini_tpu.config import (
    CacheConfig,
    EngineConfig,
    ModelConfig,
    ParallelConfig,
    SamplingParams,
    SchedulerConfig,
)
from vllmini_tpu.engine.engine import LLMEngine
from vllmini_tpu.engine.scheduler import Scheduler

LLAMA = ModelConfig(family="llama", vocab_size=96, hidden_size=32,
                    num_layers=2, num_heads=4, num_kv_heads=2,
                    max_position_embeddings=64, dtype="float32")
GPT2 = ModelConfig(family="gpt2", vocab_size=128, hidden_size=32,
                   num_layers=2, num_heads=2, max_position_embeddings=64,
                   dtype="float32")


def _engine(model, tp, dp=1):
    cfg = EngineConfig(
        model=model,
        cache=CacheConfig(num_pages=32, page_size=4, max_pages_per_seq=8,
                          kv_dtype="float32", head_pad_to=1),
        scheduler=SchedulerConfig(max_decode_slots=2 * dp,
                                  decode_chunk_steps=3,
                                  prefill_buckets=(8, 16)),
        parallel=ParallelConfig(tensor_parallel=tp, data_parallel=dp),
        hf_model=None,
    )
    return LLMEngine(cfg)


def _count_collectives(hlo: str):
    """Occurrences of each collective op in compiled HLO text."""
    out = {}
    for op in ("all-reduce", "all-gather", "reduce-scatter",
               "collective-permute", "all-to-all"):
        # Match op instructions (incl. async -start variants), not the
        # fusion names that mention them.
        n = len(re.findall(rf"= \S+ {op}(?:-start)?\(", hlo))
        out[op] = n
    return out


@pytest.mark.parametrize("model,per_layer", [(LLAMA, 2), (GPT2, 2)],
                         ids=["llama", "gpt2"])
def test_decode_chunk_collective_count(model, per_layer):
    engine = _engine(model, tp=2)
    budget = jnp.zeros(engine.max_slots, jnp.int32)
    tables = jnp.zeros((engine.max_slots, engine.pages_per_seq_max),
                       jnp.int32)
    lowered = jax.jit(
        lambda p, pool, st, t, b: engine._chunk_fn(p, pool, st, t, b,
                                                   steps=1)
    ).lower(engine.params, engine.pool, engine.state, tables, budget)
    counts = _count_collectives(lowered.compile().as_text())
    expected = per_layer * model.num_layers
    assert counts["all-reduce"] == expected, counts
    # Nothing else may ride the decode critical path: the KV pool is
    # head-lane-sharded so attention needs ZERO communication.
    for op in ("all-gather", "reduce-scatter", "all-to-all"):
        assert counts[op] == 0, counts


def test_decode_chunk_collectives_scale_with_steps():
    """A K-step chunk is K sequential steps: collectives scale linearly,
    confirming nothing is hoisted out of (or duplicated into) the scan."""
    engine = _engine(LLAMA, tp=2)
    budget = jnp.zeros(engine.max_slots, jnp.int32)
    tables = jnp.zeros((engine.max_slots, engine.pages_per_seq_max),
                       jnp.int32)

    def n_allreduce(steps):
        lowered = jax.jit(
            lambda p, pool, st, t, b: engine._chunk_fn(p, pool, st, t, b,
                                                       steps=steps)
        ).lower(engine.params, engine.pool, engine.state, tables, budget)
        hlo = lowered.compile().as_text()
        # While-loop bodies appear once in HLO regardless of trip count, so
        # count the loop body's all-reduces (steps collapse into the body).
        return _count_collectives(hlo)["all-reduce"]

    assert n_allreduce(1) == n_allreduce(3) == 2 * LLAMA.num_layers


def test_dp_engine_no_cross_replica_collectives_in_decode():
    """Data replicas are independent at decode time: dp=2 adds NO
    all-reduces beyond the TP set (replica exchange happens only through
    the host at admission)."""
    engine = _engine(LLAMA, tp=2, dp=2)
    budget = jnp.zeros(engine.max_slots, jnp.int32)
    tables = jnp.zeros((engine.max_slots, engine.pages_per_seq_max),
                       jnp.int32)
    lowered = jax.jit(
        lambda p, pool, st, t, b: engine._chunk_fn(p, pool, st, t, b,
                                                   steps=1)
    ).lower(engine.params, engine.pool, engine.state, tables, budget)
    counts = _count_collectives(lowered.compile().as_text())
    assert counts["all-reduce"] == 2 * LLAMA.num_layers, counts
