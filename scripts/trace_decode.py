"""Capture + summarize a jax.profiler trace of the real decode chunk.

The only reliable way to attribute step time on this backend: microbenchmarks
with closed-over weights lie (jit constants -> constant folding / DCE /
HTTP-413 remote compiles), so trace the REAL engine and aggregate device-op
durations from the trace JSON.

Usage:
  PYTHONPATH=/root/repo:/root/.axon_site python scripts/trace_decode.py [gpt2|llama3-8b]

Prints ms/step per op family (qmm, fusion, paged_attention, copies, ...).
Round-2 finding (8B int4+int8KV, b32): of a 16 ms step — int4 dequant
matmuls 9.0 ms (1.5x weight-stream time), XLA glue fusions 3.0 ms,
paged attention 1.9 ms, layout copies 1.4 ms.
"""

from __future__ import annotations

import collections
import glob
import gzip
import json
import re
import sys

import numpy as np
import jax

from vllmini_tpu.config import (CacheConfig, EngineConfig, ModelConfig,
                                QuantConfig, SamplingParams, SchedulerConfig)
from vllmini_tpu.engine.engine import LLMEngine
from vllmini_tpu.engine.scheduler import Scheduler

TRACE_DIR = "/tmp/jxtrace_decode"


def build(model_name: str):
    if model_name == "llama3-8b":
        sys.path.insert(0, "/root/repo")
        from bench import build_quantized_llama

        model = ModelConfig.llama3_8b(dtype="bfloat16")
        params = build_quantized_llama(model, QuantConfig(weight_dtype="int4"))
        cache = CacheConfig(num_pages=512, page_size=64, max_pages_per_seq=16,
                            kv_dtype="int8")
        slots, chunk = 32, 8
    else:
        model = ModelConfig.gpt2_124m(dtype="bfloat16")
        params = None
        cache = CacheConfig(num_pages=512, page_size=64, max_pages_per_seq=16)
        slots, chunk = 16, 16
    cfg = EngineConfig(
        model=model, cache=cache,
        scheduler=SchedulerConfig(max_decode_slots=slots,
                                  decode_chunk_steps=chunk,
                                  pipeline_depth=2, prefill_buckets=(64,)),
        hf_model=None)
    return Scheduler(LLMEngine(cfg, params=params)), slots, chunk


def main():
    model_name = sys.argv[1] if len(sys.argv) > 1 else "gpt2"
    sched, slots, chunk = build(model_name)
    rng = np.random.default_rng(0)
    for _ in range(slots):
        sched.add_request(rng.integers(0, 1000, 48).tolist(),
                          SamplingParams(max_new_tokens=400, greedy=True))
    for _ in range(12):
        sched.step()
    jax.profiler.start_trace(TRACE_DIR)
    n_chunks = 3
    for _ in range(n_chunks):
        sched.step()
    jax.block_until_ready(sched.engine.state.tokens_in_kv)
    jax.profiler.stop_trace()

    path = sorted(glob.glob(TRACE_DIR + "/plugins/profile/*/*.trace.json.gz"))[-1]
    with gzip.open(path) as f:
        data = json.load(f)
    ev = data.get("traceEvents", [])
    names = {e["pid"]: e["args"].get("name", "") for e in ev
             if e.get("ph") == "M" and e.get("name") == "process_name"}
    groups, cnt = collections.Counter(), collections.Counter()
    steps = n_chunks * chunk
    for e in ev:
        if e.get("ph") == "X" and "TPU" in names.get(e.get("pid"), ""):
            n = e["name"]
            if n.startswith("jit_") or n.startswith("while"):
                continue
            g = re.sub(r"[.\d]+$", "", n)
            groups[g] += e.get("dur", 0)
            cnt[g] += 1
    total = sum(groups.values())
    print(f"{model_name}: {total/steps/1e3:.3f} ms/step attributed "
          f"({steps} steps)")
    for g, d in groups.most_common(15):
        print(f"{d/steps/1e3:9.4f} ms/step  x{cnt[g]//steps:5d}/step  {g}")

    # Drill into the glue: top individual op instances (exact names keep
    # their numeric suffix so distinct fusions are distinguishable).
    inst, icnt = collections.Counter(), collections.Counter()
    for e in ev:
        if e.get("ph") == "X" and "TPU" in names.get(e.get("pid"), ""):
            n = e["name"]
            if n.startswith("jit_") or n.startswith("while"):
                continue
            if n.split(".")[0] in ("fusion", "copy", "reshape", "broadcast",
                                   "convert_element_type"):
                inst[n] += e.get("dur", 0)
                icnt[n] += 1
    print("\ntop glue op instances:")
    for g, d in inst.most_common(20):
        print(f"{d/steps:9.2f} us/step  x{icnt[g]/steps:6.1f}/step  {g}")


if __name__ == "__main__":
    main()
