"""Virtual multi-device setup for tests and dry runs.

Parity target: reference ``swirl_fem/communication/set_test_device_count.py``
(:22-33).  Forces the host (CPU) platform with N virtual XLA devices so
multi-chip sharding can be exercised without hardware.  Must reinitialize the
backend if one already exists.
"""

from __future__ import annotations

import os

import jax


def set_host_platform_device_count(num_devices: int) -> None:
  """Switches jax to the CPU platform with `num_devices` virtual devices.

  Note: in some environments (e.g. tunneled TPU plugins) the
  ``JAX_PLATFORMS`` env var is not honored; using ``jax.config`` is reliable.
  """
  flags = os.environ.get('XLA_FLAGS', '')
  flags = ' '.join(f for f in flags.split()
                   if not f.startswith('--xla_force_host_platform_device_count'))
  os.environ['XLA_FLAGS'] = (
      f'{flags} --xla_force_host_platform_device_count={num_devices}'.strip())
  jax.config.update('jax_platforms', 'cpu')
  # Drop any initialized backend so the new flags take effect.
  try:
    jax.extend.backend.clear_backends()
  except (AttributeError, RuntimeError):
    try:
      jax.clear_backends()  # pytype: disable=module-attr
    except Exception:  # pylint: disable=broad-except
      pass
