"""Profiling / tracing helpers (SURVEY.md section 5 tracing row).

`phase_timer` wraps host-side phases; `trace` wraps a block in a
jax.profiler trace (TensorBoard/Perfetto) for device-level inspection of
the factorize+solve hot loop — the north-star "KKT factorize+solve ms"
metric comes straight out of these traces or from bench.py.
"""

from __future__ import annotations

import contextlib
import time
from collections import defaultdict

import jax


class PhaseTimers:
    """Accumulating named wall-clock timers (blocks until device idle)."""

    def __init__(self):
        self.totals = defaultdict(float)
        self.counts = defaultdict(int)

    @contextlib.contextmanager
    def phase(self, name: str):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            self.totals[name] += time.perf_counter() - t0
            self.counts[name] += 1

    def report(self) -> str:
        lines = []
        for name in sorted(self.totals, key=self.totals.get, reverse=True):
            lines.append(
                f"{name:30s} {self.totals[name]*1e3:10.2f} ms "
                f"({self.counts[name]} calls)"
            )
        return "\n".join(lines)


@contextlib.contextmanager
def trace(log_dir: str = "/tmp/socp_tpu_trace"):
    """Device-level profiler trace; view with TensorBoard or Perfetto."""
    jax.profiler.start_trace(log_dir)
    try:
        yield log_dir
    finally:
        jax.profiler.stop_trace()
