"""Profiling and timing hooks (the reference has none — SURVEY.md §5).

``jax.profiler`` trace capture around arbitrary spans + a per-step timer.
"""

from __future__ import annotations

import contextlib
import time
from typing import Optional

import jax


@contextlib.contextmanager
def trace(log_dir: Optional[str] = None):
    """Capture a jax.profiler trace (viewable in TensorBoard/Perfetto)."""
    if log_dir is None:
        yield
        return
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class StepTimer:
    """Wall-clock per-step timing with device sync on read."""

    def __init__(self):
        self.t0 = None
        self.times = []

    def start(self):
        self.t0 = time.perf_counter()

    def stop(self, *sync_arrays):
        for a in sync_arrays:
            jax.block_until_ready(a)
        self.times.append(time.perf_counter() - self.t0)

    @property
    def mean(self) -> float:
        return sum(self.times) / max(len(self.times), 1)

    def summary(self) -> str:
        if not self.times:
            return "no steps timed"
        ts = sorted(self.times)
        return (f"steps={len(ts)} mean={self.mean * 1e3:.1f}ms "
                f"p50={ts[len(ts) // 2] * 1e3:.1f}ms "
                f"max={ts[-1] * 1e3:.1f}ms")
