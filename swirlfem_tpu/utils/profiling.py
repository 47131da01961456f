"""Profiling helpers (reference parity: CLU periodic_actions.Profile).

The reference wires ``clu.periodic_actions.Profile(num_profile_steps=5)``
into the training loop (``niles/train.py:641-642``); here a small explicit
helper wraps ``jax.profiler`` traces so any loop (training, datagen,
benchmarks) can capture a TensorBoard-viewable trace for a step window.
"""

from __future__ import annotations

import contextlib

import jax


@contextlib.contextmanager
def trace(logdir: str):
  """Context manager capturing a jax profiler trace into `logdir`."""
  jax.profiler.start_trace(logdir)
  try:
    yield
  finally:
    jax.profiler.stop_trace()


class PeriodicProfile:
  """Captures one profiler trace covering steps [start, start+num_steps)."""

  def __init__(self, logdir: str, start_step: int = 10,
               num_steps: int = 5):
    self.logdir = logdir
    self.start = start_step
    self.stop = start_step + num_steps
    self._active = False

  def __call__(self, step: int) -> None:
    if step == self.start and not self._active and self.logdir:
      jax.profiler.start_trace(self.logdir)
      self._active = True
    elif step >= self.stop and self._active:
      jax.profiler.stop_trace()
      self._active = False
