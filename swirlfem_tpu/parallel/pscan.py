"""Exclusive parallel prefix scan and all-reduce over a mapped axis.

Parity target: reference ``swirl_fem/communication/pscan.py`` (pscan :243,
preduce :270, monoid unit table :42-50).

TPU-first redesign: the reference builds a log2(P)-stage binary
fan-in/fan-out tree out of ``lax.pshuffle`` rounds with a
`SemiTracedScalar`-computed static schedule.  On TPU ICI, for the small
payloads these scans carry (global id counters, buffer sizes), a single
``all_gather`` followed by a local masked combine is both simpler and
faster: one collective instead of 2 log2(P), and the O(P x payload) local
reduction is negligible.  The tradeoff (transient P-times payload memory) is
documented; for large payloads prefer `preduce`'s native collectives.

Supported ops and their monoid units match the reference table; works for
any axis size (no power-of-2 requirement).
"""

from __future__ import annotations

import numbers

import jax
from jax import lax
import jax.numpy as jnp


def _unit(op, dtype):
  """Monoid unit for `op` at `dtype`."""
  dtype = jnp.dtype(dtype)
  if dtype == jnp.dtype(bool):
    lo, hi = False, True
  elif issubclass(dtype.type, numbers.Integral):
    info = jnp.iinfo(dtype)
    lo, hi = info.min, info.max
  else:
    info = jnp.finfo(dtype)
    lo, hi = info.min, info.max

  if op is jnp.add:
    return jnp.zeros((), dtype)
  if op is jnp.multiply:
    return jnp.ones((), dtype)
  if op is jnp.maximum:
    return jnp.asarray(lo, dtype)
  if op is jnp.minimum:
    return jnp.asarray(hi, dtype)
  if op is jnp.bitwise_and:
    return (jnp.asarray(True) if dtype == jnp.dtype(bool)
            else ~jnp.zeros((), dtype))
  if op in (jnp.bitwise_or, jnp.bitwise_xor):
    return (jnp.asarray(False) if dtype == jnp.dtype(bool)
            else jnp.zeros((), dtype))
  raise ValueError(f'unsupported op for pscan/preduce: {op}')


def _scan_leaf(leaf, op, axis_name, prefix_scan, reduction):
  idx = lax.axis_index(axis_name)
  gathered = lax.all_gather(leaf, axis_name)  # (P,) + leaf.shape
  num = gathered.shape[0]
  outs = []
  if prefix_scan:
    mask = (jnp.arange(num) < idx).reshape((num,) + (1,) * leaf.ndim)
    unit = _unit(op, leaf.dtype)
    masked = jnp.where(mask, gathered, unit)
    scan = masked[0]
    for i in range(1, num):
      scan = op(scan, masked[i])
    outs.append(scan)
  if reduction:
    red = gathered[0]
    for i in range(1, num):
      red = op(red, gathered[i])
    outs.append(red)
  return outs


def pscan(x, op, axis_name, reduction: bool = False):
  """Exclusive prefix scan of `x` (a pytree) along the mapped axis.

  Device i receives ``op(x_0, ..., x_{i-1})`` (the monoid unit for i = 0).
  With ``reduction=True`` additionally returns the all-reduce.
  """
  leaves, treedef = jax.tree_util.tree_flatten(x)
  results = [_scan_leaf(l, op, axis_name, True, reduction) for l in leaves]
  scan = jax.tree_util.tree_unflatten(treedef, [r[0] for r in results])
  if not reduction:
    return scan
  red = jax.tree_util.tree_unflatten(treedef, [r[1] for r in results])
  return scan, red


def preduce(x, op, axis_name):
  """All-reduce of `x` along the mapped axis with monoid `op`.

  Uses native collectives (psum/pmax/pmin) where available, otherwise the
  all_gather + local-combine path.
  """
  if op is jnp.add:
    return lax.psum(x, axis_name=axis_name)
  if op is jnp.maximum:
    return lax.pmax(x, axis_name=axis_name)
  if op is jnp.minimum:
    return lax.pmin(x, axis_name=axis_name)
  leaves, treedef = jax.tree_util.tree_flatten(x)
  results = [_scan_leaf(l, op, axis_name, False, True) for l in leaves]
  return jax.tree_util.tree_unflatten(treedef, [r[0] for r in results])
