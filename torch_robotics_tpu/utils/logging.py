"""Structured logging from inside jitted solver loops.

SURVEY §5 metrics/observability: the reference prints from Python loops; under
jit that becomes ``jax.debug.callback`` — this module provides a progress
logger that taps solver scans without breaking tracing, plus a metrics
accumulator for host-side consumption.
"""
from __future__ import annotations

import logging
from typing import Callable, Optional

import jax
import jax.numpy as jnp

logger = logging.getLogger("torch_robotics_tpu")

__all__ = ["log_every", "MetricsAccumulator", "logger"]


def log_every(name: str, every: int = 10,
              printer: Optional[Callable] = None):
    """Returns f(i, value) to call inside a scan body: logs value every
    ``every`` iterations via a host callback (non-blocking, ordered=False).

    Example::

        log_cost = log_every("gpmp2/cost", every=25)
        def step(theta, i):
            ...
            log_cost(i, cost.mean())
    """
    emit = printer or (lambda i, v: logger.info("%s[%d] = %s", name, int(i), v))

    def _cb(i, value):
        emit(i, value)

    def log_fn(i, value):
        jax.lax.cond(
            (i % every) == 0,
            lambda: jax.debug.callback(_cb, i, value, ordered=False),
            lambda: None)

    return log_fn


class MetricsAccumulator:
    """Collects (name, step, value) triples emitted from jitted code."""

    def __init__(self):
        self.records = []

    def printer(self, name: str):
        def emit(i, v):
            self.records.append((name, int(i), float(v)))
        return emit

    def as_dict(self):
        out = {}
        for name, i, v in self.records:
            out.setdefault(name, []).append((i, v))
        return out
