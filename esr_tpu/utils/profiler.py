"""Tracing / profiling (SURVEY.md §5.1).

The reference only wall-clock-prints epoch/iter timings; the TPU-native
equivalent is jax.profiler traces (viewable in TensorBoard's profile plugin /
Perfetto) plus fence-accurate step timing for benches.

Trace capture is validated against this environment's axon relay backend
(round 1): ``with trace(dir): ...`` produces xplane.pb + trace.json.gz whose
per-fusion device timings parse cleanly (see PROGRESS_NOTES.md for the
RRDB step breakdown extracted this way).
"""

from __future__ import annotations

import contextlib
import time

import jax

__all__ = ["trace", "StepTimer", "annotate"]


@contextlib.contextmanager
def trace(log_dir: str):
    """Capture a jax.profiler trace (TensorBoard 'profile' plugin format)."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """Named region that shows up on the trace timeline."""
    return jax.profiler.TraceAnnotation(name)


class StepTimer:
    """Fence-accurate (block_until_ready) step timing with warmup discard."""

    def __init__(self, warmup: int = 1):
        self.warmup = warmup
        self.times: list[float] = []
        self._seen = 0

    @contextlib.contextmanager
    def step(self, result_to_fence=None):
        t0 = time.perf_counter()
        out = {}
        yield out
        fence = out.get("fence", result_to_fence)
        if fence is not None:
            jax.block_until_ready(fence)
        dt = time.perf_counter() - t0
        self._seen += 1
        if self._seen > self.warmup:
            self.times.append(dt)

    @property
    def mean(self) -> float:
        return sum(self.times) / len(self.times) if self.times else float("nan")

    def rate(self, items_per_step: float = 1.0) -> float:
        return items_per_step / self.mean if self.times else float("nan")
