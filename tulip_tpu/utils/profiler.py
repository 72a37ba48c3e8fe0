"""Profiling hooks (aux subsystem; SURVEY.md 5.1).

The reference only prints iteration timings and max GPU memory
(tulip/util/misc.py:125-169).  Here: the same wall-clock metering lives in
MetricLogger, and on-device visibility comes from jax.profiler traces
(viewable in TensorBoard's profile plugin / Perfetto) plus a lightweight
step-window trace helper for the train loop.
"""

from __future__ import annotations

import contextlib
import os


@contextlib.contextmanager
def trace(log_dir: str):
    """Capture a device trace for the enclosed region."""
    import jax
    os.makedirs(log_dir, exist_ok=True)
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class StepWindowProfiler:
    """Trace steps [start, stop) of a training loop."""

    def __init__(self, log_dir: str, start: int = 10, stop: int = 13):
        self.log_dir = log_dir
        self.start = start
        self.stop = stop
        self._active = False

    def on_step(self, step: int) -> None:
        import jax
        if step == self.start and not self._active:
            os.makedirs(self.log_dir, exist_ok=True)
            jax.profiler.start_trace(self.log_dir)
            self._active = True
        elif step == self.stop and self._active:
            jax.profiler.stop_trace()
            self._active = False

    def close(self) -> None:
        import jax
        if self._active:
            jax.profiler.stop_trace()
            self._active = False


def device_memory_stats() -> dict:
    """Best-effort live/peak device memory (the TPU analogue of
    torch.cuda.max_memory_allocated prints in the reference logger)."""
    import jax
    try:
        stats = jax.local_devices()[0].memory_stats() or {}
        return {
            "bytes_in_use": stats.get("bytes_in_use", 0),
            "peak_bytes_in_use": stats.get("peak_bytes_in_use", 0),
            "bytes_limit": stats.get("bytes_limit", 0),
        }
    except Exception:
        return {}
