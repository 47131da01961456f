"""Function space oracles: integration, gradients, operator actions.

Modeled on ``core/fespace_test.py``: integrals of known functions over known
geometries, gradient evaluation against closed forms, and `local_covector`
against dense matrix assembly on tiny meshes.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from swirlfem_tpu.core.fespace import FiniteElementSpace, grad, div, inner
from swirlfem_tpu.core.quadrature import Nodes1D, NodeType, Quadrature1D
from swirlfem_tpu.core.refine import refine_premesh
from swirlfem_tpu.utils.box import unit_cube_mesh

pytestmark = pytest.mark.smoke


def _make_space(n=3, ndim=2, order=3, quad_points=None):
  pm = unit_cube_mesh(n, ndim=ndim)
  grid = Nodes1D.create(order + 1, NodeType.GAUSS_LOBATTO_LEGENDRE)
  mesh = refine_premesh(pm, grid).finalize()
  quad = Quadrature1D.create(quad_points or order + 2,
                             NodeType.GAUSS_LEGENDRE)
  return mesh, FiniteElementSpace.create(mesh, quad)


def test_integrate_constant_area():
  mesh, fes = _make_space()
  one = fes.scalar_function(mesh.gather(jnp.ones(mesh.num_nodes)))
  np.testing.assert_allclose(float(fes.integrate(lambda x: one(x))), 1.0,
                             atol=1e-12)


def test_integrate_closed_form():
  _, fes = _make_space(order=4)
  val = float(fes.integrate(lambda x: x[..., 0] ** 2 * x[..., 1]))
  np.testing.assert_allclose(val, 1.0 / 6.0, atol=1e-10)


def test_integrate_nodal_polynomial():
  mesh, fes = _make_space(order=3)
  coords = np.asarray(mesh.node_coords)
  u = jnp.asarray(coords[:, 0] ** 3)
  uq = fes.scalar_function(mesh.gather(u))
  np.testing.assert_allclose(float(fes.integrate(lambda x: uq(x))), 0.25,
                             atol=1e-12)


def test_scalar_gradient_closed_form():
  mesh, fes = _make_space(order=3)
  coords = np.asarray(mesh.node_coords)
  u = jnp.asarray(coords[:, 0] ** 2 + 3 * coords[:, 1])
  g = grad(fes.scalar_function(mesh.gather(u)))(fes.quad_coords)
  x = np.asarray(fes.quad_coords)
  np.testing.assert_allclose(np.asarray(g[..., 0]), 2 * x[..., 0], atol=1e-10)
  np.testing.assert_allclose(np.asarray(g[..., 1]),
                             np.full_like(x[..., 1], 3.0), atol=1e-10)


def test_vector_divergence_closed_form():
  mesh, fes = _make_space(order=3)
  coords = np.asarray(mesh.node_coords)
  u = jnp.stack([coords[:, 0] ** 2, coords[:, 0] * coords[:, 1]], axis=-1)
  u_local = jax.vmap(mesh.gather, in_axes=-1, out_axes=-1)(u)
  d = div(fes.vector_function(u_local))(fes.quad_coords)
  x = np.asarray(fes.quad_coords)
  np.testing.assert_allclose(np.asarray(d), 3 * x[..., 0], atol=1e-10)


def test_local_covector_mass_matrix_identity():
  """<1, B u> must equal the integral of u."""
  mesh, fes = _make_space(order=2)
  rng = np.random.default_rng(0)
  u = jnp.asarray(rng.standard_normal(mesh.num_nodes))

  def l(a, b):
    return lambda x: a(x) * b(x)

  uq = fes.scalar_function(mesh.gather(u))
  bu = mesh.scatter(fes.local_covector(l, (uq, fes.scalar_function(None))))
  np.testing.assert_allclose(float(jnp.sum(bu)),
                             float(fes.integrate(lambda x: uq(x))),
                             atol=1e-12)


def test_local_covector_stiffness_symmetry():
  mesh, fes = _make_space(order=3)
  rng = np.random.default_rng(1)
  u = jnp.asarray(rng.standard_normal(mesh.num_nodes))
  w = jnp.asarray(rng.standard_normal(mesh.num_nodes))

  def a(p, q):
    return lambda x: inner(grad(p)(x), grad(q)(x))

  def A(v):
    vq = fes.scalar_function(mesh.gather(v))
    return mesh.scatter(fes.local_covector(a, (vq, fes.scalar_function(None))))

  np.testing.assert_allclose(float(jnp.vdot(w, A(u))),
                             float(jnp.vdot(u, A(w))), atol=1e-10)


def test_stiffness_action_matches_dirichlet_energy():
  """<u, A u> = int |grad u|^2 for nodal u."""
  mesh, fes = _make_space(order=3)
  coords = np.asarray(mesh.node_coords)
  u = jnp.asarray(coords[:, 0] * coords[:, 1])

  def a(p, q):
    return lambda x: inner(grad(p)(x), grad(q)(x))

  uq = fes.scalar_function(mesh.gather(u))
  au = mesh.scatter(fes.local_covector(a, (uq, fes.scalar_function(None))))
  # int_{[0,1]^2} (y^2 + x^2) = 2/3.
  np.testing.assert_allclose(float(jnp.vdot(u, au)), 2.0 / 3.0, atol=1e-10)


def test_local_covector_is_differentiable():
  mesh, fes = _make_space(n=2, order=2)

  def l(a, b):
    return lambda x: a(x) * b(x)

  def energy(u):
    uq = fes.scalar_function(mesh.gather(u))
    bu = mesh.scatter(fes.local_covector(l, (uq, fes.scalar_function(None))))
    return jnp.vdot(u, bu)

  u = jnp.ones(mesh.num_nodes)
  g = jax.grad(energy)(u)
  # d/du <u, B u> = 2 B u; with u = 1, sum(g) = 2 * area.
  np.testing.assert_allclose(float(jnp.sum(g)), 2.0, atol=1e-12)
