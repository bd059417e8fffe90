"""Profiling hooks: jax.profiler traces + simple phase timers.

The reference ships no tracing (SURVEY.md §5); this adds the TPU-native
equivalent: XLA/TPU traces viewable in TensorBoard / Perfetto plus
lightweight wall-clock phase accounting for the host pipeline.
"""
from __future__ import annotations

import contextlib
import time
from collections import defaultdict

import jax


@contextlib.contextmanager
def trace(log_dir):
    """Capture a jax.profiler trace for the enclosed block."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name):
    """Named region that shows up inside device traces."""
    return jax.profiler.TraceAnnotation(name)


class PhaseTimer:
    """Accumulate wall-clock per named phase (host-side)."""

    def __init__(self):
        self.totals = defaultdict(float)
        self.counts = defaultdict(int)

    @contextlib.contextmanager
    def phase(self, name):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            dt = time.perf_counter() - t0
            self.totals[name] += dt
            self.counts[name] += 1

    def summary(self):
        return {name: dict(total_s=round(self.totals[name], 4),
                           count=self.counts[name],
                           mean_ms=round(1e3 * self.totals[name]
                                         / max(self.counts[name], 1), 3))
                for name in self.totals}

    def __repr__(self):
        return "\n".join(f"{k}: {v['total_s']}s over {v['count']} calls "
                         f"({v['mean_ms']} ms avg)"
                         for k, v in self.summary().items())
