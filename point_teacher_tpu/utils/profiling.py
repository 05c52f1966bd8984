"""Profiling / timing utilities.

Capability target: mmdet/utils/profiling.py (profile_time context manager
with CUDA events) + the per-step timing of TextLoggerHook. TPU equivalents:
wall-clock timing around block_until_ready, and jax.profiler traces viewable
in TensorBoard/XProf.
"""
from __future__ import annotations

import contextlib
import time
from typing import Optional

import jax


@contextlib.contextmanager
def profile_time(name: str, stream=None, end_stream=None):
    """Wall-clock timing of a block, synchronising outstanding device work."""
    t0 = time.perf_counter()
    try:
        yield
    finally:
        try:
            jax.block_until_ready(jax.device_put(0.0))
        except Exception:
            pass
        print(f"{name} time: {time.perf_counter() - t0:.4f}s", flush=True)


@contextlib.contextmanager
def device_trace(log_dir: str):
    """jax.profiler trace context (open in TensorBoard / xprof)."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class StepTimer:
    """EMA step timer for throughput logging."""

    def __init__(self, alpha: float = 0.9):
        self.alpha = alpha
        self.avg: Optional[float] = None
        self._t = None

    def tic(self):
        self._t = time.perf_counter()

    def toc(self) -> float:
        dt = time.perf_counter() - self._t
        self.avg = dt if self.avg is None else self.alpha * self.avg + (1 - self.alpha) * dt
        return dt
