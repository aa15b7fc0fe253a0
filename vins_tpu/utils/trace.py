"""Tracing / profiling utilities.

The reference instruments every stage with a wall-clock stopwatch and
running averages (vins_estimator/src/utility/tic_toc.h, duplicated in all
three packages; `printStatistics` visualization.cpp:65-104; per-factor
accumulated time projection_factor.cpp:4,118).  Here that becomes one shared
module: `TicToc` (same API), `StageStats` (running mean/max/count per named
stage), and `Tracer` (context-manager instrumentation that feeds a
StageStats and can emit one structured JSON line per window — the
"structured tracing" the reference lacks).

Device-time caveat: JAX dispatch is async — a stage that launches device
work returns before it finishes.  Wrap the stage so it ends with a
`jax.block_until_ready` on its outputs (the pipeline's fused per-frame step
already does) and wall-clock equals device+host time.
"""
from __future__ import annotations

import json
import time
from contextlib import contextmanager


class TicToc:
    """Wall-clock stopwatch (tic_toc.h API: construct = tic, toc → ms)."""

    def __init__(self):
        self.tic()

    def tic(self):
        self._t0 = time.perf_counter()

    def toc(self) -> float:
        return (time.perf_counter() - self._t0) * 1e3


class StageStats:
    """Running per-stage statistics (printStatistics's running averages)."""

    def __init__(self):
        self._n: dict = {}
        self._sum: dict = {}
        self._max: dict = {}
        self._last: dict = {}

    def reset(self):
        """Drop accumulated stats (e.g. after a warm-up segment, so means
        exclude compile time)."""
        self.__init__()

    def add(self, stage: str, ms: float):
        self._n[stage] = self._n.get(stage, 0) + 1
        self._sum[stage] = self._sum.get(stage, 0.0) + ms
        self._max[stage] = max(self._max.get(stage, 0.0), ms)
        self._last[stage] = ms

    def mean(self, stage: str) -> float:
        n = self._n.get(stage, 0)
        return self._sum.get(stage, 0.0) / n if n else 0.0

    def snapshot(self) -> dict:
        return {
            s: {"n": self._n[s], "mean_ms": round(self.mean(s), 3),
                "max_ms": round(self._max[s], 3),
                "last_ms": round(self._last[s], 3)}
            for s in sorted(self._n)
        }

    def report(self) -> str:
        return "\n".join(
            f"{s:24s} n={v['n']:6d} mean={v['mean_ms']:8.3f}ms "
            f"max={v['max_ms']:8.3f}ms" for s, v in self.snapshot().items()
        )


class Tracer:
    """Instrumentation hub: `with tracer.span("solve"): ...` accumulates into
    StageStats; `emit()` returns one JSON line (structured trace record)."""

    def __init__(self, enabled: bool = True):
        self.enabled = enabled
        self.stats = StageStats()

    @contextmanager
    def span(self, stage: str):
        if not self.enabled:
            yield
            return
        t0 = time.perf_counter()
        try:
            yield
        finally:
            self.stats.add(stage, (time.perf_counter() - t0) * 1e3)

    def emit(self, **extra) -> str:
        rec = {"stats": self.stats.snapshot()}
        rec.update(extra)
        return json.dumps(rec, sort_keys=True)
