"""PeriodicProfile: repeated trace windows (reference parity:
``clu.periodic_actions.Profile`` re-profiles periodically,
``swirl_fem/niles/train.py:641-648``)."""

import glob

import jax.numpy as jnp
import pytest

from swirlfem_tpu.utils.profiling import PeriodicProfile, trace

pytestmark = pytest.mark.smoke


def _drive(profile, steps):
  x = jnp.zeros(8)
  for step in range(steps):
    profile(step)
    x = (x + 1.0).block_until_ready()
  profile(steps)  # closes any open window


def test_repeated_windows(tmp_path):
  p = PeriodicProfile(str(tmp_path), start_step=2, num_steps=2,
                      every_steps=6)
  _drive(p, 16)
  wins = sorted(w.split('/')[-1] for w in glob.glob(str(tmp_path) + '/step_*'))
  assert wins == ['step_14', 'step_2', 'step_8'], wins
  # Each window captured a nonempty trace.
  for w in glob.glob(str(tmp_path) + '/step_*'):
    assert glob.glob(w + '/**/*.pb', recursive=True) or glob.glob(
        w + '/**/*.json.gz', recursive=True), w


def test_single_window_when_disabled(tmp_path):
  p = PeriodicProfile(str(tmp_path), start_step=1, num_steps=2,
                      every_steps=0)
  _drive(p, 10)
  wins = glob.glob(str(tmp_path) + '/step_*')
  assert len(wins) == 1 and wins[0].endswith('step_1'), wins


def test_trace_context_manager(tmp_path):
  with trace(str(tmp_path)):
    jnp.ones(4).block_until_ready()
  assert glob.glob(str(tmp_path) + '/**/*', recursive=True)
