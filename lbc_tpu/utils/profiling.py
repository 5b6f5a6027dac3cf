"""Profiling helpers: jax.profiler traces + steps/sec counters
(SURVEY.md section 5 tracing plan; the reference only has ad-hoc wall-clock
prints, run_benchmark.py:90-91)."""
from __future__ import annotations

import contextlib
import time

import jax


@contextlib.contextmanager
def trace(log_dir='/tmp/lbc_tpu_trace'):
    """Capture a jax profiler trace viewable in tensorboard/perfetto."""
    jax.profiler.start_trace(log_dir)
    try:
        yield log_dir
    finally:
        jax.profiler.stop_trace()


class StepTimer:
    """env-steps/sec/chip counter — the north-star metric
    (BASELINE.json)."""

    def __init__(self, batch_size: int):
        self.batch_size = batch_size
        self.reset()

    def reset(self):
        self._t0 = time.time()
        self._steps = 0

    def tick(self, n_steps: int = 1):
        self._steps += n_steps

    @property
    def steps_per_sec(self) -> float:
        dt = max(time.time() - self._t0, 1e-9)
        return self._steps * self.batch_size / dt
