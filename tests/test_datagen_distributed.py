"""Distributed datagen vs the single-device datagen oracle.

The slab-sharded Kolmogorov DNS (8-way on the virtual CPU mesh) must
write shard files numerically matching the single-device run: same
fractional step, same exact FDM solves, snapshot-for-snapshot.
"""

import glob

import h5py
import jax
import numpy as np
import pytest

from swirlfem_tpu.niles import datagen
from swirlfem_tpu.niles.datagen_distributed import run_simulation_distributed

NUM_DEV = 8


@pytest.fixture(scope='module')
def cfg():
  return datagen.DatagenConfig(
      resolution=8, order=3, time_order=2, reynolds_number=1000.0,
      num_cycles=2, num_steps_per_cycle=6, dt=1e-3, snapshot_every=2,
      split='train')


def _read_all(workdir):
  out = {}
  for path in sorted(glob.glob(workdir + '/train_*.h5')):
    with h5py.File(path, 'r') as f:
      out[path.split('/')[-1]] = {k: f[k][:] for k in f}
  return out


def test_distributed_matches_single_device(cfg, tmp_path):
  assert jax.device_count() >= NUM_DEV, jax.devices()
  single_dir, dist_dir = str(tmp_path / 's'), str(tmp_path / 'd')
  datagen.run_simulation(single_dir, cfg)
  run_simulation_distributed(dist_dir, cfg, num_devices=NUM_DEV)

  single, dist = _read_all(single_dir), _read_all(dist_dir)
  assert set(single) == set(dist) and len(single) == 2
  for name in single:
    for key in ('t', 'u', 'p'):
      np.testing.assert_allclose(
          dist[name][key], single[name][key], atol=1e-9,
          err_msg=f'{name}/{key}')
  # The flow actually evolved (frames differ over time).
  u = single[sorted(single)[0]]['u']
  assert np.abs(u[-1] - u[0]).max() > 1e-6
