"""Profiling: jax.profiler traces + step timing (SURVEY.md §5 — the
reference has only tqdm bars and a wall-clock ETA window, main.py:34,79-83).

Usage:
    with trace_steps("/tmp/trace", enabled=True):
        ... run a few steps ...
    # then: tensorboard --logdir /tmp/trace  (or xprof)

    timer = StepTimer()
    with timer:
        state, m = step(...)
        jax.block_until_ready(m["loss"])
    print(timer.summary())
"""

from __future__ import annotations

import contextlib
import time

import jax
import numpy as np


@contextlib.contextmanager
def trace_steps(log_dir: str, enabled: bool = True):
    """Capture an XLA/TPU profiler trace of the enclosed steps."""
    if not enabled:
        yield
        return
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class StepTimer:
    """Accumulates wall-clock step times; report p50/p90/mean."""

    def __init__(self):
        self.times: list[float] = []
        self._t0 = 0.0

    def __enter__(self):
        self._t0 = time.perf_counter()
        return self

    def __exit__(self, *exc):
        self.times.append(time.perf_counter() - self._t0)

    def summary(self) -> dict:
        if not self.times:
            return {}
        t = np.asarray(self.times)
        return {
            "steps": len(t),
            "mean_ms": float(t.mean() * 1e3),
            "p50_ms": float(np.percentile(t, 50) * 1e3),
            "p90_ms": float(np.percentile(t, 90) * 1e3),
            "max_ms": float(t.max() * 1e3),
        }


def annotate(name: str):
    """Named trace region (shows up in the profiler timeline)."""
    return jax.profiler.TraceAnnotation(name)
