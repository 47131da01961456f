"""Exclusive parallel prefix scan and all-reduce over a mapped axis.

Parity target: reference ``swirl_fem/communication/pscan.py`` (pscan :243,
preduce :270, monoid unit table :42-50).

TPU-first redesign, two strategies:

* ``method='all_gather'``: one ``all_gather`` + local masked combine.  For
  the small payloads these scans usually carry (global id counters, buffer
  sizes) this is simpler and faster than a tree — one collective instead
  of ~log2(P) — at the cost of transient P-times payload memory.
* ``method='tree'``: a Hillis–Steele distance-doubling scan out of
  ceil(log2 P) + 1 ``ppermute`` rounds — O(payload) memory and
  O(payload log P) traffic, the right shape when the scanned payload
  grows with the problem (the reference's pshuffle fan-in/fan-out tree,
  ``communication/pscan.py:53-223``, fills the same role).

``method='auto'`` (default) picks the tree above 4096 scanned elements per
leaf.  Supported ops and their monoid units match the reference table;
works for any axis size (no power-of-2 requirement).
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


_TREE_THRESHOLD = 4096


def _tree_scan_leaf(leaf, op, axis_name, reduction):
  """Exclusive Hillis–Steele scan: ceil(log2 P) + 1 ppermute rounds.

  Round 0 shifts every value one rank up (rank 0 takes the unit), turning
  the subsequent inclusive distance-doubling scan into the exclusive one.
  Ranks below the doubling distance receive nothing from ppermute (zeros);
  a `where` on the rank index restores the monoid unit there — zeros are
  only correct for `add`.
  """
  num = lax.axis_size(axis_name)
  idx = lax.axis_index(axis_name)
  unit = jnp.broadcast_to(_unit(op, leaf.dtype), leaf.shape)

  def from_lower(y, d):
    got = lax.ppermute(y, axis_name,
                       perm=[(i, i + d) for i in range(num - d)])
    return jnp.where(idx >= d, got, unit)

  scan = from_lower(leaf, 1)
  d = 1
  while d < num - 1:
    scan = op(scan, from_lower(scan, d))
    d *= 2
  outs = [scan]
  if reduction:
    # Total = op(exclusive scan, own) on the last rank; pmax/psum can't
    # broadcast arbitrary monoids, so close with the native reduce when
    # available and an all_gather fold otherwise.
    outs.append(_scan_leaf(leaf, op, axis_name, False, True)[0]
                if op not in (jnp.add, jnp.maximum, jnp.minimum)
                else {jnp.add: lax.psum, jnp.maximum: lax.pmax,
                      jnp.minimum: lax.pmin}[op](leaf, axis_name))
  return outs


def pscan(x, op, axis_name, reduction: bool = False, method: str = 'auto'):
  """Exclusive prefix scan of `x` (a pytree) along the mapped axis.

  Device i receives ``op(x_0, ..., x_{i-1})`` (the monoid unit for i = 0).
  With ``reduction=True`` additionally returns the all-reduce.  `method`:
  ``'all_gather'`` (one collective, P-times transient memory), ``'tree'``
  (log-P ppermute rounds, O(payload) memory), or ``'auto'``.
  """
  if method not in ('auto', 'all_gather', 'tree'):
    raise ValueError(f'unknown pscan method: {method!r}')
  leaves, treedef = jax.tree_util.tree_flatten(x)

  def scan_fn(leaf):
    use_tree = (method == 'tree'
                or (method == 'auto' and leaf.size > _TREE_THRESHOLD))
    if use_tree:
      return _tree_scan_leaf(leaf, op, axis_name, reduction)
    return _scan_leaf(leaf, op, axis_name, True, reduction)

  results = [scan_fn(l) for l in leaves]
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
