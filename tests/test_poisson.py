"""Poisson analytic-solution tests (reference: examples/poisson_test.py)."""

import jax.numpy as jnp
import numpy as np

from swirlfem_tpu.core.quadrature import Nodes1D, NodeType
from swirlfem_tpu.core.refine import refine_premesh
from swirlfem_tpu.examples.poisson import BCType, solve_poisson
from swirlfem_tpu.utils.box import unit_cube_mesh
import pytest


def _solve_unit_square(n, order, forcing_fn):
  pm = unit_cube_mesh(n, ndim=2)
  grid = Nodes1D.create(order + 1, NodeType.GAUSS_LOBATTO_LEGENDRE)
  mesh = refine_premesh(pm, grid).finalize()
  coords = np.asarray(mesh.node_coords)
  f = forcing_fn(coords)
  u = solve_poisson(mesh, jnp.asarray(f),
                    {'boundary': (BCType.DIRICHLET, 0)}, rtol=1e-10)
  return coords, np.asarray(u)


def test_poisson_1d_interval():
  """-u'' = pi^2 sin(pi x) on [0, 1] => u = sin(pi x)."""
  pm = unit_cube_mesh(8, ndim=1)
  grid = Nodes1D.create(4, NodeType.GAUSS_LOBATTO_LEGENDRE)
  mesh = refine_premesh(pm, grid).finalize()
  x = np.asarray(mesh.node_coords)[:, 0]
  f = np.pi**2 * np.sin(np.pi * x)
  u = solve_poisson(mesh, jnp.asarray(f),
                    {'boundary': (BCType.DIRICHLET, 0)}, rtol=1e-10)
  np.testing.assert_allclose(np.asarray(u), np.sin(np.pi * x), atol=1e-5)


@pytest.mark.smoke
def test_poisson_unit_square_sine():
  """-lap(u) = 2 pi^2 sin(pi x) sin(pi y) => u = sin(pi x) sin(pi y)."""
  def forcing(c):
    return 2 * np.pi**2 * np.sin(np.pi * c[:, 0]) * np.sin(np.pi * c[:, 1])

  coords, u = _solve_unit_square(6, 4, forcing)
  expected = np.sin(np.pi * coords[:, 0]) * np.sin(np.pi * coords[:, 1])
  np.testing.assert_allclose(u, expected, atol=1e-6)


def test_poisson_spectral_convergence():
  """Error decays with p-refinement (spectral accuracy)."""
  def forcing(c):
    return 2 * np.pi**2 * np.sin(np.pi * c[:, 0]) * np.sin(np.pi * c[:, 1])

  errs = []
  for order in (2, 4, 6):
    coords, u = _solve_unit_square(3, order, forcing)
    expected = np.sin(np.pi * coords[:, 0]) * np.sin(np.pi * coords[:, 1])
    errs.append(np.abs(u - expected).max())
  assert errs[1] < 1e-2 * errs[0]
  assert errs[2] < 1e-2 * errs[1] or errs[2] < 1e-9
