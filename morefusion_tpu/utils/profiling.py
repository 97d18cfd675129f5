"""Profiling & step timing (aux subsystem).

The reference's only tracing tool is a wall-clock context manager
(``morefusion/utils/timer.py``). Here we add the TPU-native pieces:

- ``trace(logdir)``: context manager around ``jax.profiler`` — captures a
  Perfetto/TensorBoard trace of device execution;
- ``annotate(name)``: TraceAnnotation for labeling host spans inside a
  capture;
- ``StepTimer``: rolling step-time / throughput statistics for training
  loops (p50/p90, samples/s), the chrome-trace-free daily driver.
"""

from __future__ import annotations

import contextlib
import time
from collections import deque
from typing import Dict, Optional

import numpy as np


@contextlib.contextmanager
def trace(logdir: str, host_tracer_level: int = 2):
    """Capture a jax.profiler trace into ``logdir`` (view in TensorBoard
    or Perfetto)."""
    import jax

    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """Label a host-side span inside an active trace."""
    import jax

    return jax.profiler.TraceAnnotation(name)


class StepTimer:
    """Rolling step-time statistics."""

    def __init__(self, window: int = 100):
        self._times = deque([], window)
        self._last: Optional[float] = None
        self._count = 0

    def tick(self) -> Optional[float]:
        """Mark a step boundary; returns the last step's duration."""
        now = time.perf_counter()
        dt = None
        if self._last is not None:
            dt = now - self._last
            self._times.append(dt)
        self._last = now
        self._count += 1
        return dt

    def stats(self, batch_size: int = 1) -> Dict[str, float]:
        if not self._times:
            return {}
        arr = np.asarray(self._times)
        return {
            "step_time_mean": float(arr.mean()),
            "step_time_p50": float(np.percentile(arr, 50)),
            "step_time_p90": float(np.percentile(arr, 90)),
            "steps_per_s": float(1.0 / arr.mean()),
            "samples_per_s": float(batch_size / arr.mean()),
        }
