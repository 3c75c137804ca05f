"""Runtime tracing/profiling (SURVEY §5: the reference installs
torch-tb-profiler but never wires it; TensorBoard scalars are its only
introspection). Here profiling is first-class: a jax.profiler trace
context that drops a TensorBoard-compatible trace next to the run logs,
plus a simple step timer."""

from __future__ import annotations

import contextlib
import time


@contextlib.contextmanager
def trace(log_dir: str):
    """Capture a device trace viewable in TensorBoard's profile plugin or
    Perfetto (trace.json.gz under <log_dir>/plugins/profile/...)."""
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class StepTimer:
    """Rolling step-time / throughput tracker (volumes/sec)."""

    def __init__(self, window: int = 50):
        self.window = window
        self.times: list[float] = []
        self._last = None

    def tick(self, batch_size: int) -> dict:
        now = time.perf_counter()
        out = {}
        if self._last is not None:
            dt = now - self._last
            self.times.append(dt)
            if len(self.times) > self.window:
                self.times.pop(0)
            mean_dt = sum(self.times) / len(self.times)
            out = {"step_time_s": dt,
                   "volumes_per_s": batch_size / mean_dt}
        self._last = now
        return out
