"""Profiling / tracing hooks (first-class, unlike the reference's manual
time.time() timing — reference: tfsr/trainer_sr.py:259-265, SURVEY.md §5).

- :func:`trace`: context manager around ``jax.profiler`` writing a
  TensorBoard-loadable trace,
- :class:`StepTimer`: host-side per-step wall timing with summary stats,
- :func:`annotate`: named TraceAnnotation for kernel-level attribution.
"""

import contextlib
import time

import jax
import numpy as np


@contextlib.contextmanager
def trace(log_dir, enabled=True):
    if not enabled:
        yield
        return
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name):
    return jax.profiler.TraceAnnotation(name)


class StepTimer:
    """Wall-clock timing of jitted steps (blocks on results)."""

    def __init__(self, warmup=2):
        self.warmup = warmup
        self.times = []
        self._count = 0

    @contextlib.contextmanager
    def step(self, result_to_block=None):
        start = time.perf_counter()
        yield
        if result_to_block is not None:
            jax.block_until_ready(result_to_block)
        elapsed = time.perf_counter() - start
        self._count += 1
        if self._count > self.warmup:
            self.times.append(elapsed)

    def summary(self):
        if not self.times:
            return {}
        arr = np.asarray(self.times)
        return {
            "steps": len(arr),
            "mean_ms": float(arr.mean() * 1e3),
            "p50_ms": float(np.percentile(arr, 50) * 1e3),
            "p95_ms": float(np.percentile(arr, 95) * 1e3),
            "min_ms": float(arr.min() * 1e3),
        }
