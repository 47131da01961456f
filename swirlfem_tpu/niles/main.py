"""NiLES training CLI.

Parity target: reference ``swirl_fem/niles/main.py`` (:28-67): absl flags
``--workdir`` + ``--config`` (ml_collections config file), multi-process JAX
logging, then ``train.train_and_evaluate``.
"""

from absl import app
from absl import flags
from absl import logging
import jax
from ml_collections import config_flags

from swirlfem_tpu.niles import train

FLAGS = flags.FLAGS

flags.DEFINE_string('workdir', None, 'Directory to store model data.')
config_flags.DEFINE_config_file(
    'config', None, 'Path to the hyperparameter configuration.',
    lock_config=True)


def main(argv):
  if len(argv) > 1:
    raise app.UsageError('Too many command-line arguments.')

  logging.info('JAX process: %d / %d', jax.process_index(),
               jax.process_count())
  logging.info('JAX local devices: %r', jax.local_devices())
  train.train_and_evaluate(FLAGS.config, FLAGS.workdir)


if __name__ == '__main__':
  flags.mark_flags_as_required(['config', 'workdir'])
  app.run(main)
