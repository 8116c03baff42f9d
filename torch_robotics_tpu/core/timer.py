"""Device-synchronized wall-clock timer.

TPU analogue of the reference ``TimerCUDA``
(/root/reference/torch_robotics/torch_utils/torch_timer.py): JAX dispatch is
async, so the timer blocks on supplied arrays (or a global barrier) before
reading the clock.
"""
from __future__ import annotations

import time

import jax


class TimerTPU:
    """Context-manager timer that synchronizes the device on exit.

    Usage::

        with TimerTPU() as t:
            out = jitted_fn(x)
            t.block_on(out)
        print(t.elapsed)

    If ``block_on`` is never called, a global device barrier is used instead.
    """

    def __init__(self):
        self.elapsed = 0.0
        self._blocked = False

    def __enter__(self):
        self._start = time.perf_counter()
        self._blocked = False
        return self

    def block_on(self, *arrays):
        for a in arrays:
            jax.tree_util.tree_map(
                lambda x: x.block_until_ready() if isinstance(x, jax.Array) else x, a)
        self._blocked = True

    def __exit__(self, exc_type, exc_value, exc_tb):
        if not self._blocked:
            # Global barrier: wait for everything in flight.
            jax.effects_barrier()
        self.elapsed = time.perf_counter() - self._start
        return False


# Back-compat alias matching the reference class name.
TimerCUDA = TimerTPU
