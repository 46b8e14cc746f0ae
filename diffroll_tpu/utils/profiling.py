"""First-class profiling (SURVEY.md §5: the reference has none).

`trace_if` wraps a window of training steps in a `jax.profiler` trace
(viewable in XProf/TensorBoard); `StepTimer` keeps a cheap host-side
steps/sec + examples/sec counter for the metrics stream.
"""

from __future__ import annotations

import contextlib
import time
from typing import Optional

import jax


@contextlib.contextmanager
def trace_if(enabled: bool, log_dir: str):
    """Profile the enclosed block with the JAX profiler when enabled."""
    if not enabled:
        yield
        return
    with jax.profiler.trace(log_dir):
        yield


class StepTimer:
    """Rolling steps/sec + examples/sec between `tick()` calls."""

    def __init__(self):
        self._t: Optional[float] = None
        self._steps = 0
        self._examples = 0

    def tick(self, batch_size: int):
        if self._t is None:
            self._t = time.perf_counter()
        self._steps += 1
        self._examples += batch_size

    def rates(self) -> dict:
        if self._t is None or self._steps == 0:
            return {}
        dt = time.perf_counter() - self._t
        if dt <= 0:
            return {}
        out = {
            "perf/steps_per_sec": self._steps / dt,
            "perf/examples_per_sec": self._examples / dt,
        }
        self._t = time.perf_counter()
        self._steps = 0
        self._examples = 0
        return out
