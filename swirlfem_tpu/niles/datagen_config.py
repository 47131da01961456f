"""Datagen hyperparameter configs.

Parity target: reference ``swirl_fem/niles/datagen/config/
kolmogorov_re_1000.py`` (get_config :20-53, sweep :55-57): the Kolmogorov
DNS generation settings with a seed sweep for ensemble generation.
"""

import ml_collections


def get_config() -> ml_collections.ConfigDict:
  config = ml_collections.ConfigDict()
  config.resolution = 64
  config.order = 8
  config.time_order = 3
  config.reynolds_number = 20000.0
  config.num_cycles = 500
  config.num_steps_per_cycle = 500
  config.dt = 1e-4
  config.drag_coeff = 0.05  # reference kolmogorov_re_1000.py:47
  config.forcing_wavenumber = 4.0
  config.snapshot_every = 10
  config.split = 'train'
  config.seed = 0
  return config


def sweep(add):
  """Ensemble sweep over initial seeds."""
  for seed in range(32):
    add(seed=seed)


def as_datagen_config(config):
  """Converts a ConfigDict to the dataclass the runner consumes."""
  from swirlfem_tpu.niles.datagen import DatagenConfig
  return DatagenConfig(
      resolution=config.resolution,
      order=config.order,
      time_order=config.time_order,
      reynolds_number=config.reynolds_number,
      num_cycles=config.num_cycles,
      num_steps_per_cycle=config.num_steps_per_cycle,
      dt=config.dt,
      drag_coeff=config.drag_coeff,
      forcing_wavenumber=config.forcing_wavenumber,
      snapshot_every=config.snapshot_every,
      split=config.split,
      seed=config.seed)
