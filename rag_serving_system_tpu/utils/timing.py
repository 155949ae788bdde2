"""Timing / profiling helpers.

The reference's observability is ad-hoc per-stage log lines (SURVEY §5);
here the same stage timings are structured, and `jax.profiler` tracing can
be toggled for real device timelines.
"""

from __future__ import annotations

import contextlib
import logging
import time
from collections import defaultdict
from typing import Dict

logger = logging.getLogger(__name__)


class StageTimer:
    """Accumulates wall-time per named stage. Lock-guarded: stage-1 pipeline
    workers (PREFETCH_WORKERS > 1) time the same stage concurrently, and an
    unguarded `+=` on the shared dicts would drop updates."""

    def __init__(self):
        import threading

        self.totals: Dict[str, float] = defaultdict(float)
        self.counts: Dict[str, int] = defaultdict(int)
        self.last: Dict[str, float] = {}
        self._lock = threading.Lock()

    @contextlib.contextmanager
    def stage(self, name: str):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            dt = time.perf_counter() - t0
            with self._lock:
                self.totals[name] += dt
                self.counts[name] += 1
                self.last[name] = dt

    def reset(self) -> None:
        """Drop accumulated timings (e.g. after warmup, whose compile-laden
        stage times would otherwise dominate every mean in /stats)."""
        with self._lock:
            self.totals.clear()
            self.counts.clear()
            self.last.clear()

    def summary(self) -> Dict[str, dict]:
        return {
            name: {
                "total_s": self.totals[name],
                "count": self.counts[name],
                "mean_s": self.totals[name] / max(self.counts[name], 1),
                "last_s": self.last.get(name, 0.0),
            }
            for name in self.totals
        }


@contextlib.contextmanager
def device_trace(log_dir: str | None):
    """jax.profiler trace context; no-op when log_dir is None."""
    if not log_dir:
        yield
        return
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
        logger.info("jax profiler trace written to %s", log_dir)
