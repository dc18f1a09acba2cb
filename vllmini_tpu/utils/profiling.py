"""Tracing / profiling hooks.

The reference's only profiling artifact is an nvcc `-lineinfo` flag
(SURVEY.md §5.1); runtime observability is print(). Here:

- `trace(logdir)`: context manager around `jax.profiler.trace` producing a
  TensorBoard-loadable xplane trace of device execution,
- `annotate(name)`: `jax.profiler.TraceAnnotation` wrapper for host-side spans,
- `device_timer(fn)`: measures steady-state device time of a jitted callable
  (block_until_ready fencing, warmup included) — used by bench.py and perf
  tests.
"""

from __future__ import annotations

import contextlib
import time
from typing import Callable

import jax


@contextlib.contextmanager
def trace(logdir: str):
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    return jax.profiler.TraceAnnotation(name)


def device_timer(fn: Callable, *args, warmup: int = 3, iters: int = 20,
                 **kwargs) -> float:
    """Returns steady-state seconds per call of `fn(*args, **kwargs)`."""
    for _ in range(warmup):
        out = fn(*args, **kwargs)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args, **kwargs)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters
