"""Sum-factorized tensor-product operator application.

This is the compute core of the framework.  Element-local data for an
``ndim``-dimensional tensor-product element of order ``p`` is a flat vector of
length ``(p+1)^ndim`` in lexicographic order (axis 0 slowest).  All element
operators (interpolation to quadrature points, reference-space gradients,
their transposes, and compositions) are expressed as per-axis contractions
with small 1D matrices:

    u[a0, a1, ..., ad] = sum_j M_k[a_k, j] u[..., j, ...]

batched over elements.  XLA lowers each contraction to a batched GEMM of
shape ``(q, n) x (n, E * n^{d-1})`` that tiles onto the TPU MXU.  Compared to
the reference's full-Kronecker einsum (``core/interpolation.py:246-292``),
this is ``O(N^{d+1})`` instead of ``O(N^{2d})`` flops per element.

A `BarycentricInterpolator` facade mirrors the reference API
(``core/interpolation.py:143-292``): same constructor signature and methods
(`interpolate`, `interpolate_grad`, `interpolation_matrix`,
`interpolation_matrix_grad`), but `interpolate`/`interpolate_grad` run the
sum-factorized path; the materialized Kronecker matrices remain available as
an oracle for tests.
"""

from __future__ import annotations

import functools

import jax
from jax import lax
import jax.numpy as jnp
import numpy as np

from swirlfem_tpu.core.quadrature import interpolation_grad_matrix_1d
from swirlfem_tpu.core.quadrature import interpolation_matrix_1d
from swirlfem_tpu.core.quadrature import Nodes1D

# All small-matrix contractions accumulate in the highest available
# precision; on TPU this selects f32 accumulation paths on the MXU.
PRECISION = lax.Precision.HIGHEST


def apply_axis(u: jax.Array, mat: jax.Array, axis: int) -> jax.Array:
  """Contracts `mat` (q, n) with axis `axis` (size n) of `u`, keeping order."""
  moved = jnp.moveaxis(u, axis, -1)
  out = jnp.einsum('qn,...n->...q', mat, moved, precision=PRECISION)
  return jnp.moveaxis(out, -1, axis)


def apply_factors(u: jax.Array, mats) -> jax.Array:
  """Applies mats[k] along axis -(ndim - k) of `u` for k = 0..ndim-1.

  `u` has shape ``batch_shape + (n,) * ndim``; the trailing `ndim` axes are
  the element's tensor axes in lexicographic order (axis 0 slowest).
  """
  ndim = len(mats)
  for k, mat in enumerate(mats):
    u = apply_axis(u, mat, axis=u.ndim - ndim + k)
  return u


def _as_nd(u: jax.Array, n: int, ndim: int) -> jax.Array:
  return u.reshape(u.shape[:-1] + (n,) * ndim)


def _as_flat(u: jax.Array, ndim: int) -> jax.Array:
  size = 1
  for s in u.shape[u.ndim - ndim:]:
    size *= s
  return u.reshape(u.shape[:u.ndim - ndim] + (size,))


class BarycentricInterpolator:
  """Tensor-product Lagrange interpolation via sum factorization.

  Drop-in analogue of the reference `BarycentricInterpolator`
  (``core/interpolation.py:143-292``).  Operates on flat element vectors of
  length ``gridpoints_1d.num_points ** ndim`` (lexicographic order).
  """

  def __init__(self, ndim: int, gridpoints_1d: Nodes1D, evalpoints_1d: Nodes1D):
    self.ndim = ndim
    self.gridpoints_1d = gridpoints_1d
    self.evalpoints_1d = evalpoints_1d
    # Static (host-side) float64 factor tables.
    self.interp_1d = interpolation_matrix_1d(gridpoints_1d, evalpoints_1d)
    self.interp_grad_1d = interpolation_grad_matrix_1d(
        gridpoints_1d, evalpoints_1d)

  # Hashable/comparable by construction parameters so instances can serve as
  # static (non-pytree) metadata in jitted structures.
  def __eq__(self, other):
    if not isinstance(other, BarycentricInterpolator):
      return NotImplemented
    return (self.ndim == other.ndim
            and self.gridpoints_1d == other.gridpoints_1d
            and self.evalpoints_1d == other.evalpoints_1d)

  def __hash__(self):
    return hash((self.ndim, self.gridpoints_1d, self.evalpoints_1d))

  @property
  def _is_identity(self) -> bool:
    return self.gridpoints_1d == self.evalpoints_1d

  # ---- static Kronecker oracles (host-side numpy; for tests/small tables) --

  def interpolation_matrix(self) -> np.ndarray:
    """Full (q^d, n^d) Kronecker interpolation matrix (oracle path)."""
    return functools.reduce(np.kron, [self.interp_1d] * self.ndim)

  def interpolation_matrix_grad(self) -> np.ndarray:
    """Full (q^d, n^d, d) Kronecker gradient matrices (oracle path).

    Component i is ``M (x) ... (x) G (x) ... (x) M`` with the grad factor G in
    position i, i.e. the partial derivative along tensor axis i.
    """
    cols = []
    for i in range(self.ndim):
      mats = [self.interp_1d] * self.ndim
      mats[i] = self.interp_grad_1d
      cols.append(functools.reduce(np.kron, mats))
    return np.stack(cols, axis=-1)

  # ---- sum-factorized device paths ----------------------------------------

  def _factors(self, dtype):
    return jnp.asarray(self.interp_1d, dtype=dtype)

  def _grad_factors(self, dtype):
    return jnp.asarray(self.interp_grad_1d, dtype=dtype)

  def interpolate(self, u: jax.Array) -> jax.Array:
    """Interpolates nodal values to the evaluation points.

    Accepts ``(..., n^d)`` and returns ``(..., q^d)``.
    """
    if self._is_identity:
      return u
    n = self.gridpoints_1d.num_points
    m = self._factors(u.dtype)
    out = apply_factors(_as_nd(u, n, self.ndim), [m] * self.ndim)
    return _as_flat(out, self.ndim)

  def interpolate_grad(self, u: jax.Array) -> jax.Array:
    """Reference-space gradient at the evaluation points.

    Accepts ``(..., n^d)`` and returns ``(..., q^d, d)`` where component i is
    the partial derivative along tensor axis i.
    """
    n = self.gridpoints_1d.num_points
    m = self._factors(u.dtype)
    g = self._grad_factors(u.dtype)
    u_nd = _as_nd(u, n, self.ndim)
    parts = []
    for i in range(self.ndim):
      mats = [m] * self.ndim
      mats[i] = g
      parts.append(_as_flat(apply_factors(u_nd, mats), self.ndim))
    return jnp.stack(parts, axis=-1)

  def interpolate_t(self, w: jax.Array) -> jax.Array:
    """Transpose of `interpolate`: ``(..., q^d) -> (..., n^d)``.

    This is the quadrature-to-nodes "covector" map used by operator
    transposes; provided explicitly so hand-written adjoints match what
    `jax.linear_transpose` derives.
    """
    if self._is_identity:
      return w
    q = self.evalpoints_1d.num_points
    mt = self._factors(w.dtype).T
    out = apply_factors(_as_nd(w, q, self.ndim), [mt] * self.ndim)
    return _as_flat(out, self.ndim)
