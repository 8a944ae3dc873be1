"""Profiling helpers.

The reference has no profiler integration (SURVEY §5.1 — its native trainer
hand-rolls iteration timing). TPU-native: thin wrappers over
``jax.profiler`` traces/annotations plus a steps/sec meter.
"""

from __future__ import annotations

import contextlib
import time
from typing import Iterator, Optional

import jax


@contextlib.contextmanager
def trace(log_dir: str) -> Iterator[None]:
    """Capture a TensorBoard-viewable device trace for the enclosed block."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """Named region visible in the profiler timeline."""
    return jax.profiler.TraceAnnotation(name)


class Throughput:
    """items/sec meter (the analog of the reference trainer's hand-rolled
    measurement at examples/flava/native/train.py:247-261)."""

    def __init__(self):
        self.reset()

    def reset(self):
        self._t0 = time.perf_counter()
        self._items = 0

    def update(self, n: int):
        self._items += n

    @property
    def items_per_sec(self) -> float:
        dt = time.perf_counter() - self._t0
        return self._items / max(dt, 1e-9)
