"""Knob sweep for the decode hot path on the real chip.

Runs the REAL engine (same construction as bench.py's gpt2 headline) and
prints tokens/s for one knob setting, read from env — kernel knobs are
consumed at trace time, so each setting needs a fresh process:

  VLLMINI_BLOCK_TOKENS  compute-block tokens in paged attention (default 256)
  VLLMINI_SPP           sequences per grid program (default 8, VMEM-capped)
  VLLMINI_BENCH_PS      page size (default 64)
  VLLMINI_BENCH_SLOTS   batch (default 16)

Usage:
  for bt in 128 256 512; do VLLMINI_BLOCK_TOKENS=$bt python scripts/sweep_decode.py; done
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

import jax  # noqa: E402

from vllmini_tpu.config import (CacheConfig, EngineConfig, ModelConfig,  # noqa: E402
                                ParallelConfig, SamplingParams,
                                SchedulerConfig)
from vllmini_tpu.engine.engine import LLMEngine  # noqa: E402
from vllmini_tpu.engine.scheduler import Scheduler  # noqa: E402


def main():
    slots = int(os.environ.get("VLLMINI_BENCH_SLOTS", "16"))
    chunk = int(os.environ.get("VLLMINI_BENCH_CHUNK", "16"))
    ps = int(os.environ.get("VLLMINI_BENCH_PS", "64"))
    on_tpu = jax.default_backend() == "tpu"
    model = ModelConfig.gpt2_124m(dtype="bfloat16" if on_tpu else "float32")
    cache = CacheConfig(
        num_pages=max(512 * 32 // ps, slots * 1024 // ps), page_size=ps,
        max_pages_per_seq=1024 // ps,
        kv_dtype="bfloat16" if on_tpu else "float32")
    config = EngineConfig(
        model=model, cache=cache,
        scheduler=SchedulerConfig(max_decode_slots=slots,
                                  decode_chunk_steps=chunk,
                                  pipeline_depth=4,
                                  prefill_buckets=(64,)),
        parallel=ParallelConfig(), hf_model=None)
    engine = LLMEngine(config)
    sched = Scheduler(engine)
    rng = np.random.default_rng(0)
    for _ in range(slots):
        sched.add_request(rng.integers(0, model.vocab_size, 64).tolist(),
                          SamplingParams(max_new_tokens=960, greedy=True))
    while sched.num_running < slots:
        sched.step()
    for _ in range(6):
        sched.step()

    def total():
        return sum(len(s.output_ids) for s in sched.sequences.values())

    rates = []
    for _ in range(3):
        n0, t0 = total(), time.perf_counter()
        for _ in range(12):
            sched.step()
        dt = time.perf_counter() - t0
        rates.append((total() - n0) / dt)
    knobs = {k: os.environ.get(k, "-") for k in
             ("VLLMINI_BLOCK_TOKENS", "VLLMINI_SPP", "VLLMINI_BENCH_PS",
              "VLLMINI_BENCH_SLOTS")}
    print(f"tok/s={np.median(rates):9.1f}  knobs={knobs}", flush=True)


if __name__ == "__main__":
    main()
