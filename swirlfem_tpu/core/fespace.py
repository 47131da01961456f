"""Finite element spaces: fields, forms, integration, operator actions.

Parity target: reference ``swirl_fem/core/fespace.py`` (QFunction/Form :36-72,
NodalQFunction :76-225, grad/div :233-248, FiniteElementSpace :256-471).

The core trick is preserved: any multilinear form written as a q-function
expression is turned into a matrix-free element-local operator action by
``jax.linear_transpose`` of ``v -> integrate(form(u, v))``
(`local_covector`); stiffness/mass/convection/divergence operators exist
without ever assembling matrices, and stay differentiable.

Two deliberate TPU-first redesigns versus the reference:

* **Batch-evaluated q-functions.**  The reference makes pointwise-looking
  ``f(x)`` expressions evaluate over (elements x quadrature points) through
  nested ``jax.custom_vmap`` batching rules (``fespace.py:104-167``).  Here a
  q-function is simply a callable receiving the full quadrature coordinate
  array ``(E, Q, ndim)`` and returning batch values ``(E, Q, ...)``; nodal
  functions ignore the coordinates and interpolate their nodal values.
  Closed-form callables written pointwise are auto-promoted with a double
  vmap.  Inside forms, contract trailing (component) axes with
  :func:`inner` instead of ``jnp.vdot``.

* **Sum-factorized evaluation.**  Interpolation and gradients to quadrature
  points run through the per-axis 1D factors
  (:mod:`swirlfem_tpu.core.tensor`), i.e. batched small GEMMs on the MXU, not
  full Kronecker einsums.  ``jax.linear_transpose`` of these is again a chain
  of small GEMMs, so operator actions are sum-factorized too.  Jacobian
  inverses/determinants use closed forms for ndim <= 3 instead of vmapped
  ``jnp.linalg``.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, Protocol

import flax.struct
import jax
from jax import lax
import jax.numpy as jnp
import numpy as np

from swirlfem_tpu.core.mesh import Mesh
from swirlfem_tpu.core.quadrature import Quadrature1D
from swirlfem_tpu.core.tensor import BarycentricInterpolator
from swirlfem_tpu.core.tensor import PRECISION


class QFunction(Protocol):
  """A function over the mesh, evaluated in batch at quadrature points.

  Called with the quadrature coordinates ``(E, Q, ndim)``; returns values of
  shape ``(E, Q) + value_shape``.
  """

  def __call__(self, x: jax.Array) -> jax.Array:
    ...


class Form(Protocol):
  """Maps q-functions to a scalar-valued q-function (to be integrated)."""

  def __call__(self, *args: QFunction) -> QFunction:
    ...


def inner(a: jax.Array, b: jax.Array) -> jax.Array:
  """Contracts all trailing (component) axes of two ``(E, Q, ...)`` arrays."""
  return jnp.einsum('eq...,eq...->eq', a, b, precision=PRECISION)


class NodalQFunction:
  """A field in a `FiniteElementSpace`, interpolated from nodal values.

  ``u_local`` is element-local: ``(E, nodes_per_element) + value_shape``.
  ``u_local=None`` marks the open slot of a form (the argument
  `local_covector` transposes over).  Subclasses all share the constructor
  signature ``(fespace, u_local=None)`` so `with_values` can rebuild any of
  them.
  """

  def __init__(self, fespace: 'FiniteElementSpace',
               value_shape: tuple[int, ...],
               u_local: jax.Array | None = None):
    self.fespace = fespace
    self.value_shape = value_shape
    self.u_local = u_local
    if u_local is not None:
      expected = (fespace.num_elements,
                  fespace.mesh.num_nodes_per_element) + value_shape
      if u_local.shape != expected:
        raise ValueError(
            f'expected nodal values of shape {expected}, got {u_local.shape}')

  def with_values(self, u_local: jax.Array) -> 'NodalQFunction':
    return type(self)(self.fespace, u_local)  # pylint: disable=too-many-function-args

  def _evaluate(self) -> jax.Array:
    raise NotImplementedError

  def __call__(self, x: jax.Array) -> jax.Array:
    del x  # Nodal functions are determined by their nodal values.
    return self._evaluate()


class ScalarNodalQFunction(NodalQFunction):
  """Scalar field: values ``(E, Q)``."""

  def __init__(self, fespace, u_local=None):
    super().__init__(fespace, value_shape=(), u_local=u_local)

  def _evaluate(self):
    return self.fespace.interpolator.interpolate(self.u_local)


class ScalarNodalQFunctionGrad(NodalQFunction):
  """Physical gradient of a scalar field: values ``(E, Q, ndim)``."""

  def __init__(self, fespace, u_local=None):
    super().__init__(fespace, value_shape=(), u_local=u_local)

  def _evaluate(self):
    ref_grads = self.fespace.interpolator.interpolate_grad(self.u_local)
    # invjacs[e, q, j, i] = d xi_i / d x_j.
    return jnp.einsum('eqi,eqji->eqj', ref_grads, self.fespace.invjacs,
                      precision=PRECISION)


class VectorNodalQFunction(NodalQFunction):
  """Vector field: values ``(E, Q, ndim)``."""

  def __init__(self, fespace, u_local=None):
    super().__init__(fespace, value_shape=(fespace.mesh.ndim,),
                     u_local=u_local)

  def _evaluate(self):
    # Components ride on the trailing axis; interpolate handles leading
    # batch axes, so move components in front of the node axis.
    u = jnp.moveaxis(self.u_local, -1, 1)  # (E, k, n^d)
    vals = self.fespace.interpolator.interpolate(u)
    return jnp.moveaxis(vals, 1, -1)  # (E, Q, k)


class VectorNodalQFunctionGrad(NodalQFunction):
  """Physical Jacobian of a vector field: ``(E, Q, ndim, ndim)``.

  ``value[..., j, k] = d u_k / d x_j`` (first index: derivative direction),
  matching the reference layout (``fespace.py:221-225``).
  """

  def __init__(self, fespace, u_local=None):
    super().__init__(fespace, value_shape=(fespace.mesh.ndim,),
                     u_local=u_local)

  def _evaluate(self):
    u = jnp.moveaxis(self.u_local, -1, 1)  # (E, k, n^d)
    ref_grads = self.fespace.interpolator.interpolate_grad(u)  # (E, k, Q, i)
    return jnp.einsum('ekqi,eqji->eqjk', ref_grads, self.fespace.invjacs,
                      precision=PRECISION)


def grad(f) -> QFunction:
  """Gradient of a q-function.

  Nodal fields dispatch to their sum-factorized gradient evaluators; other
  callables are treated as closed-form pointwise functions of the coordinate
  and differentiated with ``jax.grad`` under a double vmap.
  """
  if isinstance(f, ScalarNodalQFunction):
    return ScalarNodalQFunctionGrad(fespace=f.fespace, u_local=f.u_local)
  if isinstance(f, VectorNodalQFunction):
    return VectorNodalQFunctionGrad(fespace=f.fespace, u_local=f.u_local)
  return lambda x: jax.vmap(jax.vmap(jax.grad(f)))(x)


def div(f) -> QFunction:
  """Divergence of a vector-valued q-function: trace of the Jacobian."""
  g = grad(f)
  return lambda x: jnp.trace(g(x), axis1=-2, axis2=-1)


def _inv_and_det(jacs: jax.Array) -> tuple[jax.Array, jax.Array]:
  """Closed-form batched inverse + determinant for d x d, d <= 3."""
  d = jacs.shape[-1]
  if d == 1:
    det = jacs[..., 0, 0]
    return (1.0 / det)[..., None, None], det
  if d == 2:
    a, b = jacs[..., 0, 0], jacs[..., 0, 1]
    c, e = jacs[..., 1, 0], jacs[..., 1, 1]
    det = a * e - b * c
    inv = jnp.stack([
        jnp.stack([e, -b], axis=-1),
        jnp.stack([-c, a], axis=-1),
    ], axis=-2) / det[..., None, None]
    return inv, det
  if d == 3:
    # Cofactor expansion.
    m = jacs
    c00 = m[..., 1, 1] * m[..., 2, 2] - m[..., 1, 2] * m[..., 2, 1]
    c01 = m[..., 1, 2] * m[..., 2, 0] - m[..., 1, 0] * m[..., 2, 2]
    c02 = m[..., 1, 0] * m[..., 2, 1] - m[..., 1, 1] * m[..., 2, 0]
    c10 = m[..., 0, 2] * m[..., 2, 1] - m[..., 0, 1] * m[..., 2, 2]
    c11 = m[..., 0, 0] * m[..., 2, 2] - m[..., 0, 2] * m[..., 2, 0]
    c12 = m[..., 0, 1] * m[..., 2, 0] - m[..., 0, 0] * m[..., 2, 1]
    c20 = m[..., 0, 1] * m[..., 1, 2] - m[..., 0, 2] * m[..., 1, 1]
    c21 = m[..., 0, 2] * m[..., 1, 0] - m[..., 0, 0] * m[..., 1, 2]
    c22 = m[..., 0, 0] * m[..., 1, 1] - m[..., 0, 1] * m[..., 1, 0]
    det = (m[..., 0, 0] * c00 + m[..., 0, 1] * c01 + m[..., 0, 2] * c02)
    adj = jnp.stack([
        jnp.stack([c00, c10, c20], axis=-1),
        jnp.stack([c01, c11, c21], axis=-1),
        jnp.stack([c02, c12, c22], axis=-1),
    ], axis=-2)
    return adj / det[..., None, None], det
  # Rare fallback for d > 3.
  return (jax.vmap(jax.vmap(jnp.linalg.inv))(jacs),
          jax.vmap(jax.vmap(jnp.linalg.det))(jacs))


@flax.struct.dataclass
class FiniteElementSpace:
  """A nodal finite element space on a `Mesh` with a quadrature rule.

  A pytree (flax.struct) so spaces can cross ``jit``/``vmap``/``shard_map``
  boundaries: the geometric factor arrays are leaves, the quadrature rule and
  interpolator are hashable static metadata.

  Attributes:
    mesh: the underlying mesh.
    quadrature: 1D quadrature rule (tensor-product in ndim).
    interpolator: sum-factorized interpolation nodes -> quadrature points.
    invjacs: ``(E, Q, ndim, ndim)`` inverse Jacobians (``[j, i] = dxi_i/dx_j``).
    jacdets: ``(E, Q)`` Jacobian determinants.
    quad_coords: ``(E, Q, ndim)`` quadrature point coordinates.
  """

  mesh: Mesh
  invjacs: jax.Array
  jacdets: jax.Array
  quad_coords: jax.Array
  quadrature: Quadrature1D = flax.struct.field(pytree_node=False)
  interpolator: BarycentricInterpolator = flax.struct.field(
      pytree_node=False)

  @classmethod
  def create(cls, mesh: Mesh, quadrature: Quadrature1D) -> 'FiniteElementSpace':
    interpolator = BarycentricInterpolator(
        ndim=mesh.ndim,
        gridpoints_1d=mesh.gridpoints_1d,
        evalpoints_1d=quadrature.nodes)
    elem_coords = mesh.element_coords()  # (E, n^d, d)
    coords_t = jnp.moveaxis(elem_coords, -1, 1)  # (E, d, n^d)
    quad_coords = jnp.moveaxis(interpolator.interpolate(coords_t), 1, -1)
    # jacs[e, q, i, j] = d x_j / d xi_i.
    ref_grads = interpolator.interpolate_grad(coords_t)  # (E, j, Q, i)
    jacs = jnp.einsum('ejqi->eqij', ref_grads)
    invjacs, jacdets = _inv_and_det(jacs)
    return cls(mesh=mesh, invjacs=invjacs, jacdets=jacdets,
               quad_coords=quad_coords, quadrature=quadrature,
               interpolator=interpolator)

  @property
  def num_elements(self) -> int:
    return self.mesh.num_elements

  @property
  def num_quadrature_points_per_element(self) -> int:
    return int(self.quadrature.num_points ** self.mesh.ndim)

  # -- field constructors ----------------------------------------------------

  def scalar_function(self, u_local: jax.Array | None) -> ScalarNodalQFunction:
    return ScalarNodalQFunction(fespace=self, u_local=u_local)

  def vector_function(self, u_local: jax.Array | None) -> VectorNodalQFunction:
    return VectorNodalQFunction(fespace=self, u_local=u_local)

  # -- evaluation / integration ----------------------------------------------

  def evaluate(self, f: QFunction) -> jax.Array:
    """Evaluates a q-function at all quadrature points: ``(E, Q, ...)``.

    Batch-style callables (including nodal functions) are called with the
    full coordinate array; pointwise closed-form callables are promoted with
    a double vmap when the batch call does not produce ``(E, Q, ...)``.
    """
    if isinstance(f, NodalQFunction):
      return f(self.quad_coords)
    expected_lead = (self.num_elements, self.num_quadrature_points_per_element)
    try:
      w = f(self.quad_coords)
      if hasattr(w, 'shape') and w.shape[:2] == expected_lead:
        return w
    except (TypeError, IndexError):
      # Pointwise closed-form callables typically fail on the batched
      # coordinate array with a rank/indexing error; promote them below.
      # Anything else (a genuine bug in a batch-style q-function) must
      # surface, not be masked by an unrelated pointwise retry.
      pass
    return jax.vmap(jax.vmap(f))(self.quad_coords)

  def integrate(self, f: QFunction) -> jax.Array:
    """Integrates a scalar q-function over the mesh."""
    w = self.evaluate(f)
    expected = (self.num_elements, self.num_quadrature_points_per_element)
    if w.shape != expected:
      raise ValueError(f'integrand must evaluate to shape {expected}, got '
                       f'{w.shape}')
    weights = jnp.asarray(self.quadrature.weights_nd(self.mesh.ndim),
                          dtype=w.dtype)
    return jnp.einsum('eq,eq,q->', w, self.jacdets, weights,
                      precision=PRECISION)

  # -- operator actions --------------------------------------------------------

  def local_covector(self, form: Form, funs: tuple[Any, ...]) -> jax.Array:
    """Element-local covector of a form, linear in its open slot.

    Exactly one entry of `funs` must be a `NodalQFunction` with
    ``u_local=None``; the returned array is the transpose of
    ``v_local -> integrate(form(..., v, ...))`` applied to 1.0, i.e. the
    element-local action of the (multi)linear operator.  Obtain the global
    covector with ``mesh.scatter``.

    Reference parity: ``fespace.py:406-471``.
    """

    def _is_slot(f):
      return isinstance(f, NodalQFunction) and f.u_local is None

    if sum(_is_slot(f) for f in funs) != 1:
      raise ValueError('exactly one q-function must be the open slot '
                       '(NodalQFunction with u_local=None)')

    def _integral(v_local):
      filled = tuple(
          f.with_values(v_local) if _is_slot(f) else f for f in funs)
      return self.integrate(form(*filled))

    value_shape = next(f.value_shape for f in funs if _is_slot(f))
    primal = jax.ShapeDtypeStruct(
        shape=(self.num_elements,
               self.mesh.num_nodes_per_element) + value_shape,
        dtype=self.jacdets.dtype)
    one = jnp.ones((), dtype=self.jacdets.dtype)
    return jax.linear_transpose(_integral, primal)(one)[0]
