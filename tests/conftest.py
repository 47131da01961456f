"""Test configuration: CPU backend with 8 virtual devices, float64 oracles.

Mirrors the reference test strategy (``swirl_fem/communication/
set_test_device_count.py:22-33`` and x64 test mains): numerics are validated
in float64 on CPU, and multi-device behavior is tested against a virtual
8-device host-platform mesh.  Must run before jax initializes a backend.

Note: in this environment the ``JAX_PLATFORMS`` env var is not honored by
the TPU plugin, so the platform is forced through ``jax.config`` (which also
avoids paying TPU-tunnel initialization time in unit tests).
"""

import os
import sys

flags = os.environ.get('XLA_FLAGS', '')
if 'xla_force_host_platform_device_count' not in flags:
  os.environ['XLA_FLAGS'] = (
      flags + ' --xla_force_host_platform_device_count=8').strip()

import jax  # noqa: E402

jax.config.update('jax_platforms', 'cpu')
jax.config.update('jax_enable_x64', True)

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
