"""Scalars with a traced per-device value and a concrete cross-axis view.

Parity target: reference ``swirl_fem/communication/semi_traced_scalar.py``
(SemiTracedScalar :29-137).  A `SemiTracedScalar` carries both the (possibly
traced) value local to this axis index and a concrete numpy array of the
value across *all* axis indices.  This lets collective algorithms compute
their communication *schedules* statically (from the concrete view) while
the *data* stays traced — the key trick behind static-schedule collectives
like tree scans and the crystal router.
"""

from __future__ import annotations

import dataclasses
import operator
from typing import Any

from jax import lax
import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass(frozen=True)
class SemiTracedScalar:
  """A scalar with simultaneous local (traced) and global (concrete) views.

  ``x.local`` is this device's value (may be a tracer); ``x.global_`` is a
  concrete ``np.ndarray`` of every device's value along the mapped axis.
  Arithmetic/comparison operators apply pairwise to both views.
  """

  local: Any
  global_: np.ndarray

  @staticmethod
  def axis_index(axis_name) -> 'SemiTracedScalar':
    n = int(lax.psum(1, axis_name=axis_name))
    return SemiTracedScalar(local=lax.axis_index(axis_name),
                            global_=np.arange(n))

  @staticmethod
  def axis_size(axis_name) -> 'SemiTracedScalar':
    n = int(lax.psum(1, axis_name=axis_name))
    return SemiTracedScalar(local=n, global_=np.full((n,), n))

  @staticmethod
  def constant(c, axis_name) -> 'SemiTracedScalar':
    n = int(lax.psum(1, axis_name=axis_name))
    return SemiTracedScalar(local=c, global_=np.full((n,), c))

  @staticmethod
  def index_and_size(axis_name):
    return (SemiTracedScalar.axis_index(axis_name),
            SemiTracedScalar.axis_size(axis_name))

  @staticmethod
  def where(c: 'SemiTracedScalar', x: 'SemiTracedScalar',
            y: 'SemiTracedScalar') -> 'SemiTracedScalar':
    return SemiTracedScalar(local=jnp.where(c.local, x.local, y.local),
                            global_=np.where(c.global_, x.global_, y.global_))


def _lift(op, reflected=False):
  def method(self, other):
    if isinstance(other, SemiTracedScalar):
      lo, go = other.local, other.global_
    else:
      lo, go = other, other
    if reflected:
      return SemiTracedScalar(local=op(lo, self.local),
                              global_=op(go, self.global_))
    return SemiTracedScalar(local=op(self.local, lo),
                            global_=op(self.global_, go))
  return method


for _name, _op in [
    ('add', operator.add), ('sub', operator.sub), ('mul', operator.mul),
    ('floordiv', operator.floordiv), ('truediv', operator.truediv),
    ('mod', operator.mod), ('pow', operator.pow),
    ('and', operator.and_), ('or', operator.or_), ('xor', operator.xor),
    ('lshift', operator.lshift), ('rshift', operator.rshift),
]:
  setattr(SemiTracedScalar, f'__{_name}__', _lift(_op))
  setattr(SemiTracedScalar, f'__r{_name}__', _lift(_op, reflected=True))

for _name, _op in [
    ('lt', operator.lt), ('le', operator.le), ('gt', operator.gt),
    ('ge', operator.ge), ('eq', operator.eq), ('ne', operator.ne),
]:
  setattr(SemiTracedScalar, f'__{_name}__', _lift(_op))

SemiTracedScalar.__neg__ = lambda self: SemiTracedScalar(  # type: ignore[method-assign]
    local=-self.local, global_=-self.global_)
SemiTracedScalar.__invert__ = lambda self: SemiTracedScalar(  # type: ignore[method-assign]
    local=~self.local, global_=~self.global_)
