"""Tracing / profiling hooks (SURVEY.md §5 "Tracing: ABSENT" row).

`jax.profiler` trace capture around train/sample phases plus named scopes
on kernels; traces open in Perfetto/TensorBoard. Also a light wall-clock
step timer for throughput metrics without the profiler overhead.
"""
from __future__ import annotations

import contextlib
import time
from typing import Iterator, Optional

import jax


@contextlib.contextmanager
def trace(log_dir: Optional[str] = None) -> Iterator[None]:
    """Capture a profiler trace for the enclosed block (no-op if log_dir
    is None)."""
    if log_dir is None:
        yield
        return
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """Name a region for the profiler timeline: use as a context manager
    around kernel calls (jax.named_scope wraps trace-time, this wraps
    runtime via TraceAnnotation)."""
    return jax.profiler.TraceAnnotation(name)


class StepTimer:
    """Wall-clock steps/s with device sync on read."""

    def __init__(self):
        self.t0 = None
        self.steps = 0

    def start(self):
        self.t0 = time.perf_counter()
        self.steps = 0
        return self

    def tick(self, n: int = 1):
        self.steps += n

    def rate(self, sync_on=None) -> float:
        if sync_on is not None:
            jax.block_until_ready(sync_on)
        dt = time.perf_counter() - self.t0
        return self.steps / dt if dt > 0 else float("inf")
