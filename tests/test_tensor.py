"""Sum-factorized apply vs the materialized Kronecker oracle."""

import jax.numpy as jnp
import numpy as np
import pytest

from swirlfem_tpu.core import quadrature as q
from swirlfem_tpu.core.tensor import BarycentricInterpolator

pytestmark = pytest.mark.smoke


@pytest.mark.parametrize('ndim', [1, 2, 3])
def test_interpolate_matches_kron_oracle(ndim):
  rng = np.random.default_rng(0)
  grid = q.Nodes1D.create(4, q.NodeType.GAUSS_LOBATTO_LEGENDRE)
  evalpts = q.Nodes1D.create(6, q.NodeType.GAUSS_LEGENDRE)
  interp = BarycentricInterpolator(ndim, grid, evalpts)
  u = rng.standard_normal((5, 4**ndim))  # batch of 5 elements
  got = interp.interpolate(jnp.asarray(u))
  oracle = u @ interp.interpolation_matrix().T
  np.testing.assert_allclose(np.asarray(got), oracle, atol=1e-12)


@pytest.mark.parametrize('ndim', [1, 2, 3])
def test_interpolate_grad_matches_kron_oracle(ndim):
  rng = np.random.default_rng(1)
  grid = q.Nodes1D.create(3, q.NodeType.GAUSS_LOBATTO_LEGENDRE)
  evalpts = q.Nodes1D.create(5, q.NodeType.GAUSS_LEGENDRE)
  interp = BarycentricInterpolator(ndim, grid, evalpts)
  u = rng.standard_normal((4, 3**ndim))
  got = np.asarray(interp.interpolate_grad(jnp.asarray(u)))
  oracle_mats = interp.interpolation_matrix_grad()  # (q^d, n^d, d)
  oracle = np.einsum('qnd,en->eqd', oracle_mats, u)
  np.testing.assert_allclose(got, oracle, atol=1e-12)


def test_identity_interpolation_shortcircuits():
  grid = q.Nodes1D.create(4, q.NodeType.GAUSS_LOBATTO_LEGENDRE)
  interp = BarycentricInterpolator(2, grid, grid)
  u = jnp.arange(16.0)
  assert interp.interpolate(u) is u


def test_transpose_is_adjoint():
  rng = np.random.default_rng(2)
  grid = q.Nodes1D.create(4, q.NodeType.GAUSS_LOBATTO_LEGENDRE)
  evalpts = q.Nodes1D.create(7, q.NodeType.GAUSS_LEGENDRE)
  interp = BarycentricInterpolator(2, grid, evalpts)
  u = rng.standard_normal((16,))
  w = rng.standard_normal((49,))
  lhs = np.vdot(np.asarray(interp.interpolate(jnp.asarray(u))), w)
  rhs = np.vdot(u, np.asarray(interp.interpolate_t(jnp.asarray(w))))
  np.testing.assert_allclose(lhs, rhs, atol=1e-12)


def test_sum_factorized_2d_polynomial_exact():
  """Interpolating x^2*y on the tensor grid is exact at eval points."""
  grid = q.Nodes1D.create(4, q.NodeType.GAUSS_LOBATTO_LEGENDRE)
  evalpts = q.Nodes1D.create(5, q.NodeType.GAUSS_LEGENDRE)
  interp = BarycentricInterpolator(2, grid, evalpts)
  gx, gy = np.meshgrid(grid.points, grid.points, indexing='ij')
  u = (gx**2 * gy).reshape(-1)
  ex, ey = np.meshgrid(evalpts.points, evalpts.points, indexing='ij')
  got = np.asarray(interp.interpolate(jnp.asarray(u)))
  np.testing.assert_allclose(got, (ex**2 * ey).reshape(-1), atol=1e-12)
