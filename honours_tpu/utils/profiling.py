"""Observability: phase timers and TPU trace capture.

The reference's only instrumentation is clock() around bound/press/
depress (press/test.h:8, SURVEY §5).  This module keeps that three-phase
timing shape, adds named scopes, and can wrap any region in a
jax.profiler trace for TPU timeline inspection.
"""

from __future__ import annotations

import contextlib
import time
from collections import defaultdict


class PhaseTimer:
    """Accumulating named timers (perf_counter)."""

    def __init__(self):
        self.totals = defaultdict(float)
        self.counts = defaultdict(int)

    @contextlib.contextmanager
    def phase(self, name: str):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            dt = time.perf_counter() - t0
            self.totals[name] += dt
            self.counts[name] += 1

    def report(self) -> str:
        lines = []
        for name in sorted(self.totals):
            lines.append(
                f"{name}\t{self.totals[name]:.6f}s\t{self.counts[name]}x"
            )
        return "\n".join(lines)


@contextlib.contextmanager
def tpu_trace(logdir: str):
    """Capture a jax.profiler trace around a region (view with xprof)."""
    import jax

    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
