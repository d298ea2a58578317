"""Phase timing and counters.

The reference's only observability is debug phase logging with no timing
(/root/reference/src/fp_handler.c:283,364,374,391). Here each phase is a
named timer that also emits a ``jax.profiler`` trace annotation so device
traces line up with host phases, plus simple monotonic counters for the
north-star metrics (ingest rate, query latency).
"""

from __future__ import annotations

import contextlib
import threading
import time
from collections import defaultdict


class Metrics:
    """Process-wide counters and latency records (thread-safe)."""

    def __init__(self) -> None:
        self._lock = threading.Lock()
        self.counters: dict[str, float] = defaultdict(float)
        self.timings: dict[str, list[float]] = defaultdict(list)

    def add(self, name: str, value: float = 1.0) -> None:
        with self._lock:
            self.counters[name] += value

    def record_time(self, name: str, seconds: float) -> None:
        with self._lock:
            self.timings[name].append(seconds)

    def percentile(self, name: str, pct: float) -> float | None:
        with self._lock:
            vals = sorted(self.timings.get(name, ()))
        if not vals:
            return None
        idx = min(len(vals) - 1, int(round(pct / 100.0 * (len(vals) - 1))))
        return vals[idx]

    def snapshot(self) -> dict:
        with self._lock:
            return {
                "counters": dict(self.counters),
                "timings": {k: list(v) for k, v in self.timings.items()},
            }


metrics = Metrics()


@contextlib.contextmanager
def phase(name: str, record: bool = True):
    """Time a phase; annotate it in jax profiler traces when active."""
    try:
        import jax.profiler

        ctx = jax.profiler.TraceAnnotation(name)
    except Exception:  # pragma: no cover - jax always present in this env
        ctx = contextlib.nullcontext()
    start = time.perf_counter()
    with ctx:
        yield
    if record:
        metrics.record_time(name, time.perf_counter() - start)
