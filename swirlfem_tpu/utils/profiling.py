"""Profiling helpers (reference parity: CLU periodic_actions.Profile).

The reference wires ``clu.periodic_actions.Profile(num_profile_steps=5)``
into the training loop (``niles/train.py:641-648``), which re-captures a
trace window *periodically* (every ``profile_duration_ms``/steps); here a
small explicit helper wraps ``jax.profiler`` traces so any loop (training,
datagen, benchmarks) can capture TensorBoard-viewable traces, repeating the
capture window every `every_steps` so late-training regressions (compile
leaks, input-pipeline stalls, checkpoint hiccups) show up — a single
start-of-run window would miss them.
"""

from __future__ import annotations

import contextlib
import os

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
  """Repeatedly captures `num_steps`-step profiler trace windows.

  The first window covers steps ``[start_step, start_step + num_steps)``;
  subsequent windows repeat every `every_steps` steps (0 disables repeats,
  restoring single-window behavior).  Each window lands in its own
  ``step_<N>`` subdirectory so TensorBoard lists them separately.
  """

  def __init__(self, logdir: str, start_step: int = 10,
               num_steps: int = 5, every_steps: int = 1000):
    self.logdir = logdir
    self.start = start_step
    self.num_steps = num_steps
    self.every = every_steps
    self._stop_at = -1
    self._active = False

  def _should_start(self, step: int) -> bool:
    if step < self.start:
      return False
    if step == self.start:
      return True
    return self.every > 0 and (step - self.start) % self.every == 0

  def __call__(self, step: int) -> None:
    if self._active and step >= self._stop_at:
      jax.profiler.stop_trace()
      self._active = False
    if not self._active and self.logdir and self._should_start(step):
      jax.profiler.start_trace(os.path.join(self.logdir, f'step_{step}'))
      self._active = True
      self._stop_at = step + self.num_steps

  def close(self) -> None:
    """Stops an in-flight window (call after the loop: a run whose last
    step lands inside a window would otherwise leave the profiler
    running and its trace unflushed)."""
    if self._active:
      jax.profiler.stop_trace()
      self._active = False
