"""Profiling / tracing utilities (TPU-native replacement for the reference's
benchmark.py wall-clock + mmcv LogBuffer timing; SURVEY §5).

Wraps jax.profiler: xplane traces viewable in TensorBoard / Perfetto, plus a
lightweight samples/sec meter.
"""
from __future__ import annotations

import contextlib
import time
from typing import Iterator

import jax


@contextlib.contextmanager
def trace(log_dir: str) -> Iterator[None]:
    """Capture a device trace: `with trace('/tmp/tb'): run_steps()`."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class Throughput:
    """Steady-state samples/sec meter with warmup skip."""

    def __init__(self, warmup: int = 5):
        self.warmup = warmup
        self.count = -warmup
        self.t0 = None

    def tick(self, n: int = 1) -> float | None:
        if self.count < 0:
            self.count += 1
            if self.count == 0:
                self.t0 = time.perf_counter()
            return None
        self.count += n
        dt = time.perf_counter() - self.t0
        return self.count / dt if dt > 0 else None


def annotate(name: str):
    """Named region for traces: `with annotate('decoder'): ...`."""
    return jax.profiler.TraceAnnotation(name)
