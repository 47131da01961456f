"""Quadrature exactness and interpolation-operator oracles.

Modeled on the reference test strategy (``core/interpolation_test.py``):
quadrature rules integrate polynomials/trig to machine precision,
barycentric interpolation reproduces polynomials exactly, differentiation
matrices differentiate them exactly.
"""

import numpy as np
import pytest

from swirlfem_tpu.core import quadrature as q

pytestmark = pytest.mark.smoke


@pytest.mark.parametrize('node_type', [q.NodeType.GAUSS_LEGENDRE,
                                       q.NodeType.GAUSS_LOBATTO_LEGENDRE])
@pytest.mark.parametrize('n', [2, 3, 5, 8])
def test_quadrature_polynomial_exactness(node_type, n):
  rule = q.Quadrature1D.create(num_points=n, quadrature_type=node_type)
  # GL exact through degree 2n-1; GLL through 2n-3.
  max_degree = 2 * n - 1 if node_type == q.NodeType.GAUSS_LEGENDRE else 2 * n - 3
  for degree in range(max_degree + 1):
    exact = (1.0 - (-1.0) ** (degree + 1)) / (degree + 1)
    got = np.sum(rule.weights * rule.nodes.points ** degree)
    np.testing.assert_allclose(got, exact, atol=1e-13)


def test_quadrature_weights_sum_to_measure():
  for node_type in [q.NodeType.GAUSS_LEGENDRE,
                    q.NodeType.GAUSS_LOBATTO_LEGENDRE,
                    q.NodeType.NEWTON_COTES]:
    rule = q.Quadrature1D.create(num_points=6, quadrature_type=node_type)
    np.testing.assert_allclose(rule.weights.sum(), 2.0, atol=1e-13)


def test_gll_endpoints_and_symmetry():
  nodes = q.Nodes1D.create(7, q.NodeType.GAUSS_LOBATTO_LEGENDRE)
  assert nodes.points[0] == -1.0 and nodes.points[-1] == 1.0
  np.testing.assert_allclose(nodes.points, -nodes.points[::-1], atol=1e-15)
  assert nodes.is_continuous()
  gl = q.Nodes1D.create(7, q.NodeType.GAUSS_LEGENDRE)
  assert not gl.is_continuous()


@pytest.mark.parametrize('node_type', list(q.NodeType)[:3])
def test_interpolation_reproduces_polynomials(node_type):
  grid = q.Nodes1D.create(6, node_type)
  evalpts = q.Nodes1D.create(9, q.NodeType.GAUSS_LEGENDRE)
  mat = q.interpolation_matrix_1d(grid, evalpts)
  for degree in range(6):  # degree <= n-1 = 5 exactly representable
    vals = grid.points ** degree
    np.testing.assert_allclose(mat @ vals, evalpts.points ** degree,
                               atol=1e-10)


def test_interpolation_identity_at_own_nodes():
  grid = q.Nodes1D.create(5, q.NodeType.GAUSS_LOBATTO_LEGENDRE)
  mat = q.interpolation_matrix_1d(grid, grid)
  np.testing.assert_allclose(mat, np.eye(5), atol=1e-14)


@pytest.mark.parametrize('node_type', list(q.NodeType)[:3])
def test_differentiation_matrix(node_type):
  grid = q.Nodes1D.create(7, node_type)
  d = q.differentiation_matrix_1d(grid)
  for degree in range(7):
    vals = grid.points ** degree
    expected = degree * grid.points ** max(degree - 1, 0) if degree else 0 * vals
    np.testing.assert_allclose(d @ vals, expected, atol=1e-10)


def test_interp_grad_matrix():
  grid = q.Nodes1D.create(6, q.NodeType.GAUSS_LOBATTO_LEGENDRE)
  evalpts = q.Nodes1D.create(8, q.NodeType.GAUSS_LEGENDRE)
  g = q.interpolation_grad_matrix_1d(grid, evalpts)
  vals = grid.points ** 4
  np.testing.assert_allclose(g @ vals, 4 * evalpts.points ** 3, atol=1e-10)


def test_single_point_nodes():
  single = q.Nodes1D.create_single_point(np.array(1.5))
  assert single.num_points == 1
  np.testing.assert_allclose(single.points, [1.5])
  grid = q.Nodes1D.create(3, q.NodeType.NEWTON_COTES)
  mat = q.interpolation_matrix_1d(grid, single)
  # Extrapolating x^2 to x=1.5.
  np.testing.assert_allclose(mat @ grid.points**2, [2.25], atol=1e-12)
