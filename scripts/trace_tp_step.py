"""Capture + summarize a profiler trace of the TENSOR-PARALLEL decode chunk.

VERDICT r2 #10 (multi-chip perf readiness): single-chip hardware here means
multi-chip TP can only be correctness-tested — but the per-step op schedule
(matmul/collective interleaving, all-reduce placement) is a compile-time
artifact we can capture on the virtual CPU mesh today, and on a real v5e-8
the day one exists (same command, drop JAX_PLATFORMS/XLA_FLAGS overrides).

Usage (virtual 8-device mesh, CPU):
  JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
      PYTHONPATH=/root/repo python scripts/trace_tp_step.py [tp] [dp]

On a real pod slice (see docs/RUNBOOK_v5e8.md):
  PYTHONPATH=/root/repo:... python scripts/trace_tp_step.py 8 1

Prints per-step time grouped by op family, collectives separated out, plus
the all-reduce count (must equal 2 x num_layers — pinned by
tests/test_collective_budget.py).
"""

from __future__ import annotations

import collections
import glob
import gzip
import json
import os
import re
import sys

# Default to the virtual mesh when no accelerator is configured.
if "--xla_force_host_platform_device_count" not in os.environ.get(
        "XLA_FLAGS", ""):
    os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                               + " --xla_force_host_platform_device_count=8"
                               ).strip()

import numpy as np  # noqa: E402
import jax  # noqa: E402

TRACE_DIR = "/tmp/jxtrace_tp_step"


def build(tp: int, dp: int):
    from vllmini_tpu.config import (CacheConfig, EngineConfig, ModelConfig,
                                    ParallelConfig, SamplingParams,
                                    SchedulerConfig)
    from vllmini_tpu.engine.engine import LLMEngine
    from vllmini_tpu.engine.scheduler import Scheduler

    on_tpu = jax.default_backend() == "tpu"
    if on_tpu:
        model = ModelConfig.llama3_8b(dtype="bfloat16")
        cache = CacheConfig(num_pages=512, page_size=64,
                            max_pages_per_seq=16, kv_dtype="int8")
        slots, chunk = 32, 8
    else:  # virtual mesh: tiny shapes, the SCHEDULE is what matters
        model = ModelConfig(family="llama", vocab_size=256, hidden_size=64,
                            num_layers=4, num_heads=8, num_kv_heads=4,
                            max_position_embeddings=256, dtype="float32")
        cache = CacheConfig(num_pages=64, page_size=8, max_pages_per_seq=16,
                            kv_dtype="float32", head_pad_to=1)
        slots, chunk = 4 * dp, 4
    cfg = EngineConfig(
        model=model, cache=cache,
        scheduler=SchedulerConfig(max_decode_slots=slots,
                                  decode_chunk_steps=chunk,
                                  pipeline_depth=2, prefill_buckets=(64,)),
        parallel=ParallelConfig(tensor_parallel=tp, data_parallel=dp),
        hf_model=None)
    engine = LLMEngine(cfg)
    return Scheduler(engine), slots, chunk, SamplingParams


def main():
    tp = int(sys.argv[1]) if len(sys.argv) > 1 else 2
    dp = int(sys.argv[2]) if len(sys.argv) > 2 else 1
    sched, slots, chunk, SamplingParams = build(tp, dp)
    engine = sched.engine

    # Collective budget straight from the compiled chunk fn.
    import jax.numpy as jnp
    budget = jnp.zeros(engine.max_slots, jnp.int32)
    tables = jnp.zeros((engine.max_slots, engine.pages_per_seq_max),
                       jnp.int32)
    hlo = jax.jit(
        lambda p, pool, st, t, b: engine._chunk_fn(p, pool, st, t, b,
                                                   steps=1)
    ).lower(engine.params, engine.pool, engine.state, tables,
            budget).compile().as_text()
    n_ar = len(re.findall(r"= \S+ all-reduce(?:-start)?\(", hlo))
    n_layers = engine.config.model.num_layers
    print(f"tp={tp} dp={dp}: {n_ar} all-reduces per step "
          f"(budget: {2 * n_layers} = 2 x {n_layers} layers)")

    rng = np.random.default_rng(0)
    for _ in range(slots):
        sched.add_request(
            rng.integers(0, engine.config.model.vocab_size, 48).tolist(),
            SamplingParams(max_new_tokens=200, greedy=True))
    for _ in range(8):
        sched.step()

    jax.profiler.start_trace(TRACE_DIR)
    n_chunks = 3
    for _ in range(n_chunks):
        sched.step()
    jax.block_until_ready(sched.engine.state.tokens_in_kv)
    jax.profiler.stop_trace()

    paths = sorted(glob.glob(
        TRACE_DIR + "/plugins/profile/*/*.trace.json.gz"))
    if not paths:
        print("no trace written (profiler unsupported on this backend)")
        return
    with gzip.open(paths[-1]) as f:
        data = json.load(f)
    ev = data.get("traceEvents", [])
    names = {e["pid"]: e["args"].get("name", "") for e in ev
             if e.get("ph") == "M" and e.get("name") == "process_name"}
    groups, cnt = collections.Counter(), collections.Counter()
    steps = n_chunks * chunk
    want = ("TPU", "CPU") if jax.default_backend() != "tpu" else ("TPU",)
    for e in ev:
        if e.get("ph") == "X" and any(
                w in names.get(e.get("pid"), "") for w in want):
            n = e["name"]
            if n.startswith("jit_") or n.startswith("while"):
                continue
            g = re.sub(r"[.\d]+$", "", n)
            key = ("COLLECTIVE " + g if "all-reduce" in g
                   or "collective" in g or "all-gather" in g else g)
            groups[key] += e.get("dur", 0)
            cnt[key] += 1
    total = sum(groups.values())
    print(f"{total / steps / 1e3:.3f} ms/step attributed ({steps} steps)")
    for g, d in groups.most_common(20):
        print(f"{d / steps / 1e3:9.4f} ms/step  x{cnt[g] // steps:5d}/step  "
              f"{g}")


if __name__ == "__main__":
    main()
