"""Cross-host continuous batching: single controller, SPMD workers.

The reference has no distributed machinery at all (SURVEY.md §2.3/§5.8); this
subsystem is the TPU-native design for BASELINE.md config 5 (multi-host slice
with cross-host continuous batching and preemption/swap):

- `jax.distributed.initialize` connects the hosts; jitted step functions are
  entered by EVERY process each tick with identical shapes (the SPMD
  contract). The mesh spans all hosts' devices; weights/KV shard over it.
- ONE logical scheduler: process 0 owns every host-side decision (HTTP
  requests, page allocator, continuous batching, preemption). Its engine
  records each device-mutating call (prefill / chunk / clear / swap) into a
  command log of plain numpy arrays — see `LLMEngine.command_sink`.
- Every tick the log is broadcast (pickle -> length-prefixed uint8 array via
  two `broadcast_one_to_all` rounds) and each worker's engine REPLAYS it via
  `apply_commands`. Replay is deterministic: same call order, same fold_in
  RNG counters, same shapes -> all hosts enter the same compiled steps with
  the same operands, and replicated state stays bit-identical everywhere.
- Summaries are read from each host's own (addressable) replicated arrays —
  no collective on the read path. Only process 0 acts on them.

Single-process mode degrades to the identity broadcast, which is how
tests/test_multihost.py verifies primary/worker replay equivalence without a
second host.
"""

from __future__ import annotations

import logging
import pickle
from typing import List, Optional

import jax
import numpy as np

logger = logging.getLogger("vllmini_tpu.multihost")

_SHUTDOWN = "__shutdown__"


def initialize_distributed(coordinator_address: Optional[str] = None,
                           num_processes: Optional[int] = None,
                           process_id: Optional[int] = None) -> int:
    """Connect this host to the slice (no-op single-process). Returns the
    process index."""
    if num_processes is None or num_processes <= 1:
        return 0
    jax.distributed.initialize(coordinator_address=coordinator_address,
                               num_processes=num_processes,
                               process_id=process_id)
    return jax.process_index()


def is_primary() -> bool:
    return jax.process_index() == 0


def broadcast_bytes(payload: Optional[bytes]) -> bytes:
    """Broadcast a byte string from process 0 to all processes.

    Two rounds (length, then padded body) so every process presents matching
    shapes to `broadcast_one_to_all`. Identity when single-process.
    """
    if jax.process_count() == 1:
        assert payload is not None
        return payload
    from jax.experimental import multihost_utils

    if payload is None:
        payload = b""
    n = np.asarray([len(payload)], np.int64)
    n = np.asarray(multihost_utils.broadcast_one_to_all(n))
    size = int(n[0])
    buf = np.zeros(size, np.uint8)
    if is_primary():
        buf[:] = np.frombuffer(payload, np.uint8)
    buf = np.asarray(multihost_utils.broadcast_one_to_all(buf))
    return buf.tobytes()


class PrimaryDriver:
    """Wraps the scheduler on process 0: each tick runs one scheduler step
    with command recording on, then broadcasts the recorded log.

    The engine's `command_sink` is PERSISTENT (installed once here), not
    scoped to `step()`: device-mutating calls made between ticks — e.g.
    `scheduler.abort()` from an HTTP DELETE handler, serialized by the
    server's engine lock — accumulate in the same log and ride the next
    tick's broadcast. (A step-scoped sink silently dropped those commands,
    leaving worker hosts with diverged replicated state.)"""

    def __init__(self, scheduler):
        self.scheduler = scheduler
        self.engine = scheduler.engine
        self._log: List = []
        self.engine.command_sink = self._log

    def _drain(self) -> bytes:
        log, self._log = self._log, []
        self.engine.command_sink = self._log
        return pickle.dumps(log)

    def step(self):
        try:
            finished = self.scheduler.step()
        finally:
            # Broadcast whatever DID execute even if the step raised —
            # workers must mirror every device mutation that happened.
            broadcast_bytes(self._drain())
        return finished

    def shutdown(self) -> None:
        broadcast_bytes(self._drain())
        broadcast_bytes(pickle.dumps(_SHUTDOWN))


class WorkerDriver:
    """Non-primary processes: replay the primary's device-command stream on
    the local engine until shutdown."""

    def __init__(self, engine):
        self.engine = engine

    def step_once(self, payload: Optional[bytes] = None) -> bool:
        """Receive (or accept) one log and replay it. Returns False on
        shutdown."""
        if payload is None:
            payload = broadcast_bytes(None)
        ops = pickle.loads(payload)
        if ops == _SHUTDOWN:
            return False
        self.engine.apply_commands(ops)
        return True

    def run_forever(self) -> None:
        while self.step_once():
            pass
