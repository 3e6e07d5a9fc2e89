"""Profiling / tracing helpers (SURVEY §5: the reference has none beyond a
specs/s loop, ex_maest.py:108-159; TPU builds get jax.profiler traces).

``trace(dir)``   — context manager writing a TensorBoard-loadable profile.
``force(x)``     — fetch a scalar from an array, forcing execution. Needed
                   because remote TPU relays (axon) execute lazily and
                   ``block_until_ready`` alone may not wait for completion.
``StepTimer``    — wall-clock step timing with audio-sec/s accounting.
"""

from __future__ import annotations

import contextlib
import time

import jax
import numpy as np


@contextlib.contextmanager
def trace(log_dir: str = "/tmp/maest_tpu_trace"):
    """jax.profiler trace context; inspect with TensorBoard's profile tab."""
    jax.profiler.start_trace(log_dir)
    try:
        yield log_dir
    finally:
        jax.profiler.stop_trace()


def force(x) -> float:
    """Force execution of everything ``x`` depends on; returns a scalar."""
    arr = x
    if hasattr(arr, "reshape"):
        arr = arr.reshape(-1)[0]
    return float(np.asarray(arr, dtype=np.float64))


class StepTimer:
    """Accumulates step wall-times after a warmup prefix."""

    def __init__(self, warmup: int = 2):
        self.warmup = warmup
        self._times: list = []
        self._t0 = None
        self._count = 0

    def start(self):
        self._t0 = time.perf_counter()

    def stop(self):
        dt = time.perf_counter() - self._t0
        self._count += 1
        if self._count > self.warmup:
            self._times.append(dt)
        return dt

    @property
    def mean(self) -> float:
        return float(np.mean(self._times)) if self._times else float("nan")

    def throughput(self, items_per_step: float) -> float:
        return items_per_step / self.mean if self._times else float("nan")
