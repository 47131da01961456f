"""E-last fast operators vs the generic local_covector operators."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from swirlfem_tpu.core.bc import BCType
from swirlfem_tpu.nse.solver import StokesSEM
from swirlfem_tpu.ops import sem2d
from swirlfem_tpu.utils.box import unit_cube_mesh

pytestmark = pytest.mark.smoke


@pytest.fixture(scope='module')
def setup():
  pm = unit_cube_mesh(4, ndim=2, periodic_dims=(0, 1))
  sem = StokesSEM.create(pm, boundary_conditions={}, order=5)
  ops = sem2d.build_sem2d_ops(sem.velocity, sem.pressure)
  return sem, ops


def test_layout_roundtrip(setup):
  sem, ops = setup
  vinfo = ops.vinfo
  rng = np.random.default_rng(0)
  u = jnp.asarray(rng.standard_normal(sem.velocity.mesh.num_nodes))
  el = sem2d.nodal_to_el(u, vinfo)
  # matches the (E, nper) structured gather, transposed.
  ref = sem.velocity.mesh.gather(u)
  n = vinfo.order + 1
  np.testing.assert_allclose(
      np.asarray(el),
      np.asarray(ref).reshape(-1, n, n).transpose(1, 2, 0), atol=0)
  # transpose identity: <nodal_to_el(u), w> == <u, el_to_nodal(w)>
  w = jnp.asarray(rng.standard_normal(el.shape))
  lhs = float(jnp.vdot(el, w))
  rhs = float(jnp.vdot(u, sem2d.el_to_nodal(w, vinfo)))
  np.testing.assert_allclose(lhs, rhs, rtol=1e-12)


def test_pressure_layout_roundtrip(setup):
  sem, ops = setup
  pinfo = ops.pinfo
  rng = np.random.default_rng(1)
  p = jnp.asarray(rng.standard_normal(sem.pressure.pspace.mesh.num_nodes))
  el = sem2d.nodal_to_el(p, pinfo)
  back = sem2d.el_to_nodal(el, pinfo)
  np.testing.assert_allclose(np.asarray(back), np.asarray(p), atol=0)


def _nodal_op_el(sem, ops, fn_el):
  """Wraps a component-wise E-last op into a (N, 2) nodal op."""
  vinfo = ops.vinfo

  def apply(u):
    comps = [sem2d.nodal_to_el(u[:, j], vinfo) for j in range(2)]
    outs = fn_el(comps)
    return jnp.stack([sem2d.el_to_nodal(o, vinfo) for o in outs], axis=-1)

  return apply


def test_stiffness_matches_generic(setup):
  sem, ops = setup
  rng = np.random.default_rng(2)
  u = jnp.asarray(rng.standard_normal((sem.velocity.mesh.num_nodes, 2)))
  fast = _nodal_op_el(sem, ops,
                      lambda c: [ops.stiffness_el(x) for x in c])(u)
  ref = sem.A(u)
  np.testing.assert_allclose(np.asarray(fast), np.asarray(ref), atol=1e-10)


def test_mass_matches_generic(setup):
  sem, ops = setup
  rng = np.random.default_rng(3)
  u = jnp.asarray(rng.standard_normal((sem.velocity.mesh.num_nodes, 2)))
  fast = _nodal_op_el(sem, ops, lambda c: [ops.wmass * x for x in c])(u)
  np.testing.assert_allclose(np.asarray(fast), np.asarray(sem.B(u)),
                             atol=1e-12)


def test_divergence_matches_generic(setup):
  sem, ops = setup
  rng = np.random.default_rng(4)
  u = jnp.asarray(rng.standard_normal((sem.velocity.mesh.num_nodes, 2)))
  comps = [sem2d.nodal_to_el(u[:, j], ops.vinfo) for j in range(2)]
  fast = sem2d.el_to_nodal(ops.divergence_el(*comps), ops.pinfo)
  np.testing.assert_allclose(np.asarray(fast), np.asarray(sem.D(u)),
                             atol=1e-10)


def test_gradient_matches_generic(setup):
  sem, ops = setup
  rng = np.random.default_rng(5)
  p = jnp.asarray(rng.standard_normal(sem.pressure.pspace.mesh.num_nodes))
  pel = sem2d.nodal_to_el(p, ops.pinfo)
  outs = ops.gradient_el(pel)
  fast = jnp.stack([sem2d.el_to_nodal(o, ops.vinfo) for o in outs], axis=-1)
  np.testing.assert_allclose(np.asarray(fast), np.asarray(sem.Dt(p)),
                             atol=1e-10)


def test_convection_matches_generic(setup):
  sem, ops = setup
  rng = np.random.default_rng(6)
  u = jnp.asarray(rng.standard_normal((sem.velocity.mesh.num_nodes, 2)))
  comps = [sem2d.nodal_to_el(u[:, j], ops.vinfo) for j in range(2)]
  outs = ops.convection_el(*comps)
  fast = jnp.stack([sem2d.el_to_nodal(o, ops.vinfo) for o in outs], axis=-1)
  np.testing.assert_allclose(np.asarray(fast), np.asarray(sem.C(u)),
                             atol=1e-9)


def test_divergence_gradient_adjoint(setup):
  sem, ops = setup
  rng = np.random.default_rng(7)
  u = jnp.asarray(rng.standard_normal((sem.velocity.mesh.num_nodes, 2)))
  p = jnp.asarray(rng.standard_normal(sem.pressure.pspace.mesh.num_nodes))
  comps = [sem2d.nodal_to_el(u[:, j], ops.vinfo) for j in range(2)]
  du = sem2d.el_to_nodal(ops.divergence_el(*comps), ops.pinfo)
  dtp = jnp.stack([sem2d.el_to_nodal(o, ops.vinfo)
                   for o in ops.gradient_el(sem2d.nodal_to_el(p, ops.pinfo))],
                  axis=-1)
  np.testing.assert_allclose(float(jnp.vdot(p, du)),
                             float(jnp.vdot(u, dtp)), rtol=1e-10)
