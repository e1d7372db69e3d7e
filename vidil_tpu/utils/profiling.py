"""Tracing / profiling helpers.

The reference's observability is wall-clock timers + CUDA max-mem in
MetricLogger (reference: utils.py:139-183) plus unused NVTX machinery in
vendored Apex. TPU-native equivalents: jax.profiler traces (viewable in
TensorBoard/XProf/Perfetto), named annotations, and a simple step timer.
"""

from __future__ import annotations

import contextlib
import time

import jax


@contextlib.contextmanager
def trace(log_dir: str):
    """Capture a device trace for the enclosed region.

    View with TensorBoard's profile plugin or ui.perfetto.dev.
    """
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """Named region that shows up in device traces (NVTX-range analogue)."""
    return jax.profiler.TraceAnnotation(name)


class StepTimer:
    """Wall-clock step timing with warmup exclusion and a one-line summary."""

    def __init__(self, warmup: int = 1):
        self.warmup = warmup
        self.times: list[float] = []
        self._t0 = None
        self._count = 0

    def __enter__(self):
        self._t0 = time.perf_counter()
        return self

    def __exit__(self, *exc):
        dt = time.perf_counter() - self._t0
        self._count += 1
        if self._count > self.warmup:
            self.times.append(dt)
        return False

    @property
    def mean(self) -> float:
        return sum(self.times) / max(len(self.times), 1)

    def summary(self, items_per_step: float = 1.0) -> str:
        if not self.times:
            return "no timed steps"
        return (f"{len(self.times)} steps, mean {self.mean*1000:.1f} ms/step, "
                f"{items_per_step / self.mean:.2f} items/s")


def device_memory_stats() -> dict:
    """Peak/current HBM usage of the first addressable device, if exposed."""
    try:
        stats = jax.local_devices()[0].memory_stats() or {}
        return {
            "bytes_in_use": stats.get("bytes_in_use"),
            "peak_bytes_in_use": stats.get("peak_bytes_in_use"),
            "bytes_limit": stats.get("bytes_limit"),
        }
    except Exception:
        return {}
