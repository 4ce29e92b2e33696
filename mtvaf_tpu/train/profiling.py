"""Profiling hooks (SURVEY.md §5: the reference has none; this framework
exposes jax.profiler traces + per-step timing)."""

from __future__ import annotations

import logging
import time
from typing import Optional

logger = logging.getLogger(__name__)


class StepProfiler:
    """Captures a jax.profiler trace for a window of training steps and logs
    steady-state step latency."""

    def __init__(self, profile_dir: Optional[str], start_step: int = 3,
                 num_steps: int = 5):
        self.profile_dir = profile_dir
        self.start_step = start_step
        self.num_steps = num_steps
        self._active = False
        self._step = 0
        self._t0 = None
        self._times = []

    def step_begin(self):
        import jax
        self._step += 1
        if self.profile_dir and self._step == self.start_step:
            jax.profiler.start_trace(self.profile_dir)
            self._active = True
            logger.info("profiler trace started → %s", self.profile_dir)
        self._t0 = time.perf_counter()

    def step_end(self, result=None):
        import jax
        if result is not None:
            jax.block_until_ready(result)
        self._times.append(time.perf_counter() - self._t0)
        if self._active and self._step >= self.start_step + self.num_steps:
            jax.profiler.stop_trace()
            self._active = False
            logger.info("profiler trace stopped")

    @property
    def mean_step_ms(self) -> float:
        times = self._times[2:] or self._times
        return 1000 * sum(times) / max(len(times), 1)

    def close(self):
        if self._active:
            import jax
            jax.profiler.stop_trace()
            self._active = False
