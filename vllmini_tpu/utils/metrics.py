"""Minimal metrics registry (counters + latency histograms).

The reference has no observability beyond print() (SURVEY.md §5.1/§5.5); this is
the real subsystem: counters and timing histograms queryable by the server's
/metrics endpoint and the benchmark harness.
"""

from __future__ import annotations

import threading
import time
from collections import defaultdict
from typing import Dict, List


class _Timer:
    def __init__(self, metrics: "Metrics", name: str):
        self._metrics = metrics
        self._name = name

    def __enter__(self):
        self._t0 = time.perf_counter()
        return self

    def __exit__(self, *exc):
        self._metrics.observe(self._name, time.perf_counter() - self._t0)
        return False


class Metrics:
    def __init__(self):
        self._lock = threading.Lock()
        self._counters: Dict[str, float] = defaultdict(float)
        self._observations: Dict[str, List[float]] = defaultdict(list)

    def counter(self, name: str, inc: float = 1.0) -> None:
        with self._lock:
            self._counters[name] += inc

    def observe(self, name: str, value: float) -> None:
        with self._lock:
            obs = self._observations[name]
            obs.append(value)
            if len(obs) > 10000:  # bound memory
                del obs[: len(obs) // 2]

    def timer(self, name: str) -> _Timer:
        return _Timer(self, name)

    def percentile(self, name: str, q: float) -> float:
        with self._lock:
            obs = sorted(self._observations.get(name, []))
        if not obs:
            return 0.0
        idx = min(len(obs) - 1, int(q / 100.0 * len(obs)))
        return obs[idx]

    def snapshot(self) -> Dict[str, object]:
        with self._lock:
            out: Dict[str, object] = dict(self._counters)
            for name, obs in self._observations.items():
                if not obs:
                    continue
                s = sorted(obs)
                out[name + "_count"] = len(s)
                out[name + "_p50"] = s[len(s) // 2]
                out[name + "_p99"] = s[min(len(s) - 1, int(0.99 * len(s)))]
                out[name + "_mean"] = sum(s) / len(s)
        return out
