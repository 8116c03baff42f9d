"""Profiling / tracing helpers (SURVEY §5 tracing subsystem).

The reference's only instrumentation is a CUDA-synchronized timer; here the
timer (core/timer.py) is complemented by `jax.profiler` trace capture and a
simple named-section aggregator for solver loops.
"""
from __future__ import annotations

import contextlib
import time
from collections import defaultdict

import jax

__all__ = ["trace_to", "annotate", "SectionTimer"]


@contextlib.contextmanager
def trace_to(logdir: str):
    """Capture a jax.profiler trace (view with TensorBoard / xprof)."""
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """Named trace annotation for device-side profiling."""
    return jax.profiler.TraceAnnotation(name)


class SectionTimer:
    """Accumulates wall-clock per named section (device-synchronized)."""

    def __init__(self):
        self.totals = defaultdict(float)
        self.counts = defaultdict(int)

    @contextlib.contextmanager
    def section(self, name: str, *block_on):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            for a in block_on:
                jax.block_until_ready(a)
            if not block_on:
                jax.effects_barrier()
            self.totals[name] += time.perf_counter() - t0
            self.counts[name] += 1

    def summary(self) -> dict:
        return {k: {"total_s": v, "count": self.counts[k],
                    "mean_ms": 1000.0 * v / max(self.counts[k], 1)}
                for k, v in sorted(self.totals.items())}
