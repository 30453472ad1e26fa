"""Tracing / profiling / numerics-debug hooks (SURVEY.md §5 aux subsystems).

The reference has no observability beyond per-step loss prints; here:
  * `trace(dir)` — context manager around jax.profiler for device traces
    viewable in TensorBoard/Perfetto.
  * `step_timer` — lightweight wall-clock per-step timing with EMA.
  * `debug_nans(enable)` — toggles jax_debug_nans for fault isolation.
"""

from __future__ import annotations

import contextlib
import time
from typing import Iterator, Optional

import jax


@contextlib.contextmanager
def trace(log_dir: str) -> Iterator[None]:
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def debug_nans(enable: bool = True) -> None:
    jax.config.update("jax_debug_nans", enable)


class StepTimer:
    """EMA wall-clock step timing: `with timer: ...` then `timer.ms`."""

    def __init__(self, decay: float = 0.9):
        self.decay = decay
        self.ms: Optional[float] = None
        self._t0 = 0.0

    def __enter__(self):
        self._t0 = time.perf_counter()
        return self

    def __exit__(self, *exc):
        dt = (time.perf_counter() - self._t0) * 1e3
        self.ms = dt if self.ms is None else self.decay * self.ms + (1 - self.decay) * dt
        return False
