"""Profiling and throughput instrumentation.

The reference has no profiler (SURVEY.md §5); its closest artifact is
layer summaries. This module provides:
  - ``trace(logdir)``: a context manager around ``jax.profiler`` producing
    TensorBoard-viewable device traces;
  - ``StepTimer``: steady-state step timing + examples/sec, the measurement
    device behind bench.py and the Trainer's logs;
  - ``annotate``: named trace regions (jax.profiler.TraceAnnotation).
"""

from __future__ import annotations

import contextlib
import time

import jax


@contextlib.contextmanager
def trace(logdir: str):
    """Capture a device trace viewable in TensorBoard's profile plugin."""
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """Named region for traces: ``with annotate('train_step'): ...``"""
    return jax.profiler.TraceAnnotation(name)


class StepTimer:
    """Tracks steady-state step latency and examples/sec over a window."""

    def __init__(self, window: int = 50):
        self.window = window
        self.reset()

    def reset(self):
        self._t0 = time.time()
        self._steps = 0
        self._examples = 0

    def update(self, steps: int, examples: int):
        self._steps += steps
        self._examples += examples

    @property
    def elapsed(self) -> float:
        return time.time() - self._t0

    def rates(self) -> dict:
        dt = max(self.elapsed, 1e-9)
        return {
            "steps_per_sec": self._steps / dt,
            "examples_per_sec": self._examples / dt,
            "ms_per_step": 1e3 * dt / max(self._steps, 1),
        }
