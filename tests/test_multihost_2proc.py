"""REAL two-process multi-host serving test (jax.distributed over localhost).

Spawns a primary and a worker process on the CPU backend: the primary runs
the scheduler and broadcasts its device-command log via
`multihost_utils.broadcast_one_to_all`; the worker replays it. Both dump
their final decode state; the test asserts bit-identical replication —
the actual cross-host contract of parallel/multihost.py, not the in-process
simulation of test_multihost.py.
"""

import json
import os
import socket
import subprocess
import sys

import numpy as np
import pytest

_WORKER_SRC = r"""
import json, os, sys
import jax
jax.config.update("jax_platforms", "cpu")
jax.distributed.initialize(coordinator_address=os.environ["COORD"],
                           num_processes=2,
                           process_id=int(os.environ["PID_IDX"]),
                           local_device_ids=[0])
import jax.numpy as jnp
import numpy as np
from vllmini_tpu.config import (CacheConfig, EngineConfig, ModelConfig,
                                SamplingParams, SchedulerConfig)
from vllmini_tpu.engine.engine import LLMEngine
from vllmini_tpu.engine.scheduler import Scheduler
from vllmini_tpu.parallel.multihost import PrimaryDriver, WorkerDriver

config = EngineConfig(
    model=ModelConfig(family="gpt2", vocab_size=97, hidden_size=32,
                      num_layers=2, num_heads=2,
                      max_position_embeddings=64, dtype="float32"),
    cache=CacheConfig(num_pages=16, page_size=4, max_pages_per_seq=4,
                      kv_dtype="float32", head_pad_to=1),
    scheduler=SchedulerConfig(max_decode_slots=2, decode_chunk_steps=2,
                              pipeline_depth=1, prefill_buckets=(8,)),
    hf_model=None,
)
engine = LLMEngine(config)

if int(os.environ["PID_IDX"]) == 0:
    sched = Scheduler(engine)
    driver = PrimaryDriver(sched)
    r1 = sched.add_request([3, 1, 4], SamplingParams(max_new_tokens=5,
                                                     greedy=True))
    r2 = sched.add_request([1, 5, 9, 2], SamplingParams(max_new_tokens=4,
                                                        greedy=True))
    ticks = 0
    while sched.has_work and ticks < 30:
        driver.step()
        ticks += 1
    driver.shutdown()
    outputs = {"r1": sched.get(r1).output_ids, "r2": sched.get(r2).output_ids}
else:
    WorkerDriver(engine).run_forever()
    outputs = {}

digest = [float(np.asarray(x).astype(np.float64).sum())
          for x in jax.tree_util.tree_leaves((engine.pool, engine.state))]
print("RESULT " + json.dumps({"digest": digest, "outputs": outputs,
                              "proc": int(os.environ["PID_IDX"])}))
"""


def _free_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_two_process_replay_bit_identical(tmp_path):
    coord = f"127.0.0.1:{_free_port()}"
    script = tmp_path / "mh.py"
    script.write_text(_WORKER_SRC)
    env = {**os.environ, "COORD": coord,
           "PYTHONPATH": os.getcwd(), "JAX_PLATFORMS": "cpu"}
    procs = []
    for pid in (0, 1):
        procs.append(subprocess.Popen(
            [sys.executable, str(script)],
            env={**env, "PID_IDX": str(pid)},
            stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True))
    results = {}
    for p in procs:
        out, err = p.communicate(timeout=240)
        assert p.returncode == 0, err[-3000:]
        line = next(l for l in out.splitlines() if l.startswith("RESULT "))
        r = json.loads(line[len("RESULT "):])
        results[r["proc"]] = r

    # The worker's replayed device state matches the primary's bit-for-bit.
    np.testing.assert_array_equal(np.asarray(results[0]["digest"]),
                                  np.asarray(results[1]["digest"]))
    assert len(results[0]["outputs"]["r1"]) == 5
    assert len(results[0]["outputs"]["r2"]) == 4
