"""Rollout throughput + trace instrumentation.

The reference ships zero tracing/profiling (SURVEY.md §5). This module
provides the two tools the TPU build standardizes on:

* :class:`StepsPerSecond` — a wall-clock env-steps/s meter that forces a
  host fetch before reading the clock (plain ``block_until_ready`` does NOT
  wait for execution on remote TPU backends and silently reports fantasy
  numbers).
* :func:`trace` — a context manager around ``jax.profiler`` emitting a
  TensorBoard-loadable trace directory.
"""

import contextlib
import time

import jax
import numpy as np


class StepsPerSecond:
    """Env-steps/s meter. Call ``tick(sync_array)`` once per env step."""

    def __init__(self, num_envs: int):
        self.num_envs = num_envs
        self.reset()

    def reset(self):
        self._t0 = None
        self._steps = 0

    def tick(self, sync_array=None):
        if sync_array is not None:
            np.asarray(sync_array)          # force completion of the chain
        now = time.perf_counter()
        if self._t0 is None:
            self._t0 = now
        self._steps += 1

    @property
    def env_steps_per_s(self) -> float:
        if self._t0 is None or self._steps < 2:
            return 0.0
        return (self._steps - 1) * self.num_envs / (time.perf_counter()
                                                    - self._t0)


@contextlib.contextmanager
def trace(logdir: str):
    """``with trace('/tmp/trace'):`` — profile the enclosed device work."""
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
