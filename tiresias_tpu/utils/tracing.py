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
from collections import defaultdict, deque


class Metrics:
    """Process-wide counters and latency records (thread-safe)."""

    # per-phase sample cap: a serving process records one sample per
    # scored window forever — unbounded lists are a slow memory leak and
    # make every stats snapshot copy ever-growing data. A sliding window
    # also keeps the percentiles RECENT (a p50 over millions of ancient
    # samples hides a regression).
    MAX_SAMPLES = 4096

    def __init__(self) -> None:
        self._lock = threading.Lock()
        self.counters: dict[str, float] = defaultdict(float)
        self.timings: dict[str, deque] = defaultdict(
            lambda: deque(maxlen=self.MAX_SAMPLES)
        )

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
    try:
        with ctx:
            yield
    finally:
        # record failures too: p95/p99 must not silently exclude exactly
        # the slow/raising requests they exist to expose
        if record:
            metrics.record_time(name, time.perf_counter() - start)
