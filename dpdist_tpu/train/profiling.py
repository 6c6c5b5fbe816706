"""Profiling hooks (SURVEY §5: the reference has only wall-clock timers).

- trace(): context manager writing a jax.profiler trace viewable in
  TensorBoard / Perfetto.
- annotate(): named TraceAnnotation for custom spans inside the step.
- StepTimer: synchronous-fetch step timing. On remote-relay TPU platforms
  block_until_ready can return before execution completes, so the timer
  forces a tiny device fetch instead.
"""

from __future__ import annotations

import contextlib
import time

import numpy as np
import jax


@contextlib.contextmanager
def trace(logdir: str):
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    return jax.profiler.TraceAnnotation(name)


class StepTimer:
    """Measures steady-state step time with a synchronous fetch."""

    def __init__(self):
        self.times = []
        self._t0 = None

    def start(self):
        self._t0 = time.perf_counter()

    def stop(self, result=None):
        if result is not None:
            leaf = jax.tree_util.tree_leaves(result)
            if leaf:
                np.asarray(leaf[0])  # force completion
        dt = time.perf_counter() - self._t0
        self.times.append(dt)
        return dt

    @property
    def mean_ms(self) -> float:
        if not self.times:
            return float("nan")
        return 1e3 * float(np.mean(self.times[max(1, len(self.times) // 5):]))
