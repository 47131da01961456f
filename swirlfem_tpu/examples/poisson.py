"""Matrix-free Poisson solver: the canonical end-to-end example.

Parity target: reference ``swirl_fem/examples/poisson.py`` (solve_poisson
:49-164).  Solves ``-lap(u) = f`` with homogeneous Dirichlet conditions
imposed by interior-mask row elision, entirely matrix-free: the stiffness and
mass operators are `local_covector` transposes of the bilinear forms
``a(u, v) = int grad u . grad v`` and ``l(u, v) = int u v``.
"""

from __future__ import annotations

from collections.abc import Mapping
from typing import Any, Callable, Union

import jax.numpy as jnp
import numpy as np

# The canonical enum: a local redefinition would never compare equal to
# core.bc.BCType, silently skipping Dirichlet masking for callers that
# pass the solver-wide enum.
from swirlfem_tpu.core.bc import BCType
from swirlfem_tpu.core.fespace import FiniteElementSpace
from swirlfem_tpu.core.fespace import grad
from swirlfem_tpu.core.fespace import inner
from swirlfem_tpu.core.mesh import Mesh
from swirlfem_tpu.core.quadrature import NodeType
from swirlfem_tpu.core.quadrature import Quadrature1D
from swirlfem_tpu.linalg.cg import cg

BCValue = Union[float, Any, Callable]




def interior_mask(mesh: Mesh, boundary_conditions) -> np.ndarray:
  """1.0 on interior nodes, 0.0 on Dirichlet boundary nodes."""
  mask = np.ones((mesh.num_nodes,))
  for group, (bctype, _) in boundary_conditions.items():
    if bctype == BCType.DIRICHLET:
      mask = mask * (1 - np.asarray(mesh.physical_masks[group]))
  return mask


def poisson_operators(mesh: Mesh, boundary_conditions):
  """Returns masked stiffness/mass operator actions ``(A, B)`` on nodal u."""
  quadrature = Quadrature1D.create(
      num_points=mesh.order + (mesh.ndim + 1) // 2,
      quadrature_type=NodeType.GAUSS_LEGENDRE)
  fespace = FiniteElementSpace.create(mesh, quadrature)
  mask = jnp.asarray(interior_mask(mesh, boundary_conditions))

  def a(u, v):
    return lambda x: inner(grad(u)(x), grad(v)(x))

  def l(u, v):
    return lambda x: u(x) * v(x)

  def A(u):
    uq = fespace.scalar_function(mesh.gather(u))
    v = fespace.scalar_function(None)
    return mask * mesh.scatter(fespace.local_covector(a, (uq, v)))

  def B(u):
    uq = fespace.scalar_function(mesh.gather(u))
    v = fespace.scalar_function(None)
    return mask * mesh.scatter(fespace.local_covector(l, (uq, v)))

  return A, B


def solve_poisson(mesh: Mesh, forcing, boundary_conditions,
                  rtol: float = 1e-5, atol: float = 0.0):
  """Solves ``-lap(u) = f`` on `mesh` with the given boundary conditions.

  Only homogeneous scalar boundary values are supported (reference parity:
  ``examples/poisson.py:124-127``).
  """
  for _, (_, value) in boundary_conditions.items():
    if not (np.isscalar(value) and value == 0):
      raise NotImplementedError(
          f'only scalar homogeneous boundary values supported, got {value}')
  A, B = poisson_operators(mesh, boundary_conditions)
  b = B(jnp.asarray(forcing))
  u, _ = cg(A, b, tol=rtol, atol=atol)
  return u
