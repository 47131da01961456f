"""SPMD execution of partition-stacked computations under jit + shard_map.

Parity target: reference ``swirl_fem/communication/jit_distributed.py``
(jit_distributed :26-97).  Runs a per-partition function over arrays whose
leading axis is the partition axis, sharded across a ``jax.sharding.Mesh``
device axis — pmap semantics, but compiled as one jitted SPMD program so it
composes with the rest of an XLA computation and rides ICI collectives.

Mechanism: ``shard_map`` over ``PartitionSpec(axis_name)`` (each device sees
a leading shard axis of size 1), with an inner ``vmap`` removing that axis so
the wrapped function sees the bare per-partition view.  Named collectives
(``lax.psum(..., axis_name)``) inside the function bind to the shard_map
axis.
"""

from __future__ import annotations

import functools
import inspect
from typing import Callable, Sequence

import jax
from jax import shard_map
from jax.sharding import Mesh
from jax.sharding import PartitionSpec as P


def device_mesh(axis_name: str, num_devices: int | None = None,
                devices=None) -> Mesh:
  """A 1D ``jax.sharding.Mesh`` over the first `num_devices` devices."""
  if devices is None:
    devices = jax.devices()
  if num_devices is not None:
    devices = devices[:num_devices]
  import numpy as np
  return Mesh(np.asarray(devices), (axis_name,))


def spmd_map(
    f: Callable,
    mesh: Mesh,
    axis_name: str,
    *,
    static_argnames: Sequence[str] | None = None,
):
  """Compiles `f` to run per-partition across `axis_name` of `mesh`.

  Positional/keyword arguments and outputs carry a leading partition axis of
  size ``axis_size``; `f` itself sees them without that axis (pmap-style).
  Keyword-only parameters of `f` default to static (not sharded, compile-time
  constants), overridable via `static_argnames`.
  """
  sig = inspect.signature(f)
  if static_argnames is None:
    static_argnames = [name for name, p in sig.parameters.items()
                       if p.kind == p.KEYWORD_ONLY]
  static_set = set(static_argnames)

  shmap = functools.partial(shard_map, mesh=mesh, in_specs=P(axis_name),
                            out_specs=P(axis_name), check_vma=False)

  @functools.wraps(f)
  def wrapper(*args, **kwargs):
    bound = sig.bind(*args, **kwargs)
    bound.apply_defaults()
    static_kwargs = {k: v for k, v in bound.arguments.items()
                     if k in static_set}
    dynamic = {k: v for k, v in bound.arguments.items()
               if k not in static_set}
    g = functools.partial(f, **static_kwargs)

    def call(kw):
      return g(**kw)

    if dynamic:
      return shmap(jax.vmap(call, in_axes=0))(dynamic)
    # vmap needs at least one batched input; feed a dummy that DCE removes.
    return shmap(
        lambda: jax.vmap(lambda _: g())(jax.numpy.zeros(1, jax.numpy.int32)))()

  return jax.jit(wrapper, static_argnames=static_argnames)
