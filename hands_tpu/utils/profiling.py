"""Profiling / tracing hooks.

The reference has none (SURVEY §5.1 — it even ships with
``CUDA_LAUNCH_BLOCKING=1`` left on); here profiling is first-class:
``jax.profiler`` trace capture around training steps plus a lightweight
step timer with percentile reporting.
"""

from __future__ import annotations

import contextlib
import time
from typing import List, Optional

import jax
import numpy as np


@contextlib.contextmanager
def trace(log_dir: str):
    """Capture a jax.profiler trace (view with TensorBoard / xprof)."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """Named region inside a trace (shows up in xprof timelines)."""
    return jax.profiler.TraceAnnotation(name)


class StepTrace:
    """Trace a window of training steps into ``log_dir``.

    The Trainer hookup for ``Config.profile_steps`` (cli.train
    --profile_steps N): captures steps [skip, skip+N) of the run — the
    first ``skip`` steps are compile/warmup and would drown the timeline.
    ``update(step)`` is called once per step; no-op when ``steps == 0``.
    View with TensorBoard's profile plugin / xprof.
    """

    def __init__(self, log_dir: str, steps: int, skip: int = 2):
        self.log_dir = log_dir
        self.steps = steps
        self.skip = skip
        self._on = False
        self._done = steps == 0

    def update(self, step: int):
        if self._done:
            return
        if not self._on and step >= self.skip:
            jax.profiler.start_trace(self.log_dir)
            self._on = True
        elif self._on and step >= self.skip + self.steps:
            jax.profiler.stop_trace()
            self._on = False
            self._done = True

    def close(self):
        if self._on:
            jax.profiler.stop_trace()
            self._on = False
            self._done = True


class StepTimer:
    """Wall-clock step timing with device sync and percentile summary."""

    def __init__(self, warmup: int = 2):
        self.warmup = warmup
        self.times: List[float] = []
        self._t0: Optional[float] = None
        self._count = 0

    def start(self):
        self._t0 = time.perf_counter()

    def stop(self, result=None):
        if result is not None:
            jax.block_until_ready(result)
        dt = time.perf_counter() - self._t0
        self._count += 1
        if self._count > self.warmup:
            self.times.append(dt)
        return dt

    def summary(self) -> dict:
        if not self.times:
            return {}
        arr = np.asarray(self.times)
        return {
            "steps": len(arr),
            "mean_ms": float(arr.mean() * 1e3),
            "p50_ms": float(np.percentile(arr, 50) * 1e3),
            "p95_ms": float(np.percentile(arr, 95) * 1e3),
            "max_ms": float(arr.max() * 1e3),
        }
