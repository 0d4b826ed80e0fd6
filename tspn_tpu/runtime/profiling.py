"""Profiling / tracing hooks.

The reference has none (SURVEY.md section 5.1: wall-clock deltas +
torch.cuda.max_memory_allocated in the log line). Here: a context
manager around jax.profiler for device traces viewable in
TensorBoard/Perfetto, named step annotations, and a step timer that
separates host (data) time from device time.
"""

from __future__ import annotations

import contextlib
import time
from typing import Iterator, Optional

import jax


@contextlib.contextmanager
def trace(log_dir: Optional[str]) -> Iterator[None]:
    """Capture a device trace while the body runs (no-op when log_dir is
    falsy), e.g. `with profiling.trace("logs/trace"): step(...)`."""
    if not log_dir:
        yield
        return
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """Named region visible in the trace timeline."""
    return jax.profiler.TraceAnnotation(name)


class StepTimer:
    """Separates data (host) time from step (device) time per iteration."""

    def __init__(self):
        self._mark = time.perf_counter()
        self.data_time = 0.0
        self.step_time = 0.0

    def data_ready(self):
        now = time.perf_counter()
        self.data_time = now - self._mark
        self._mark = now

    def step_done(self, *arrays):
        for a in arrays:
            jax.block_until_ready(a)
        now = time.perf_counter()
        self.step_time = now - self._mark
        self._mark = now


def device_memory_stats() -> dict:
    """Per-device memory stats where the backend reports them (the
    torch.cuda.max_memory_allocated counterpart)."""
    stats = {}
    for d in jax.local_devices():
        try:
            s = d.memory_stats()
        except Exception:
            s = None
        if s:
            stats[str(d)] = {
                "bytes_in_use": s.get("bytes_in_use"),
                "peak_bytes_in_use": s.get("peak_bytes_in_use"),
            }
    return stats
