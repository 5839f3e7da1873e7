"""Tracing / profiling utilities (SURVEY.md §5: the reference has none beyond
wall-clock-per-epoch prints; the rebuild adds jax.profiler traces and honest
per-step timing with block_until_ready).
"""

from __future__ import annotations

import contextlib
import time
from typing import Iterator, Optional

import jax


@contextlib.contextmanager
def trace(log_dir: str) -> Iterator[None]:
    """Capture a jax.profiler trace (viewable in TensorBoard / Perfetto)."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """Named region inside a trace (host-side)."""
    return jax.profiler.TraceAnnotation(name)


class StepTimer:
    """Honest steps/sec: blocks on device completion before reading the clock."""

    def __init__(self, warmup: int = 2):
        self.warmup = warmup
        self._count = 0
        self._t0: Optional[float] = None

    def tick(self, result=None) -> None:
        if result is not None:
            jax.block_until_ready(result)
        self._count += 1
        if self._count == self.warmup:
            self._t0 = time.perf_counter()

    @property
    def steps_per_sec(self) -> float:
        if self._t0 is None or self._count <= self.warmup:
            return 0.0
        return (self._count - self.warmup) / (time.perf_counter() - self._t0)
