"""Tracing / profiling / metrics.

The reference has NO observability: no timers, no counters anywhere
(SURVEY.md section 5); its only introspection is commented-out debug
printers (team_alignment.cpp:164-167).  This module is the framework's
first-class replacement:

* ``stage(name)``: wall-clock stage timers that aggregate into a report,
  doubling as ``jax.profiler.TraceAnnotation`` scopes so device traces show
  the same stage names,
* ``device_trace(dir)``: capture a full ``jax.profiler`` trace for
  tensorboard / xprof,
* ``Counters``: throughput counters (reads, bases, DP cells) with derived
  reads/s and GCUPS, the metrics BASELINE.md tracks.

Everything is no-overhead-when-unused: timers are context managers around
host code; nothing is inserted into jitted computations.
"""

from __future__ import annotations

import contextlib
import json
import time
from collections import defaultdict
from typing import Dict, Iterator, Optional


class StageTimers:
    """Named wall-clock accumulators with jax.profiler annotations."""

    def __init__(self) -> None:
        self.totals: Dict[str, float] = defaultdict(float)
        self.counts: Dict[str, int] = defaultdict(int)

    @contextlib.contextmanager
    def stage(self, name: str) -> Iterator[None]:
        import jax
        t0 = time.perf_counter()
        with jax.profiler.TraceAnnotation(name):
            yield
        dt = time.perf_counter() - t0
        self.totals[name] += dt
        self.counts[name] += 1

    def report(self) -> str:
        lines = ["stage                          total_s   calls    avg_ms"]
        for name in sorted(self.totals, key=lambda n: -self.totals[n]):
            t, c = self.totals[name], self.counts[name]
            lines.append(f"{name:<30} {t:8.3f} {c:7d} {1e3 * t / c:9.3f}")
        return "\n".join(lines)

    def as_dict(self) -> Dict[str, float]:
        return dict(self.totals)


class Counters:
    """Throughput counters with derived rates."""

    def __init__(self) -> None:
        self.reads = 0
        self.bases = 0
        self.dp_cells = 0.0
        self.mapped = 0
        self._t0: Optional[float] = None

    def start(self) -> None:
        self._t0 = time.perf_counter()

    def observe(self, n_reads: int, n_bases: int, dp_cells: float,
                n_mapped: int) -> None:
        self.reads += n_reads
        self.bases += n_bases
        self.dp_cells += dp_cells
        self.mapped += n_mapped

    def summary(self) -> Dict[str, float]:
        dt = (time.perf_counter() - self._t0) if self._t0 else 0.0
        out = {"reads": self.reads, "bases": self.bases,
               "mapped": self.mapped, "wall_s": round(dt, 3)}
        if dt > 0:
            out["reads_per_s"] = round(self.reads / dt, 2)
            out["gcups"] = round(self.dp_cells / dt / 1e9, 4)
        return out

    def json_line(self) -> str:
        return json.dumps(self.summary())


@contextlib.contextmanager
def device_trace(log_dir: str) -> Iterator[None]:
    """Capture a jax.profiler device trace (view with tensorboard/xprof)."""
    import jax
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
