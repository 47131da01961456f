"""3D E-last fast operators vs the generic local_covector path."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from swirlfem_tpu.nse.solver import StokesSEM
from swirlfem_tpu.ops import sem3d
from swirlfem_tpu.utils.box import unit_cube_mesh


@pytest.fixture(scope='module')
def sem():
  pm = unit_cube_mesh(2, ndim=3, periodic_dims=(0, 1, 2))
  return StokesSEM.create(pm, boundary_conditions={}, order=3)


@pytest.fixture(scope='module')
def fields(sem):
  rng = np.random.default_rng(0)
  nv = sem.velocity.mesh.num_nodes
  npn = sem.pressure.pspace.mesh.num_nodes
  u = jnp.asarray(rng.standard_normal((nv, 3)))
  p = jnp.asarray(rng.standard_normal(npn))
  return u, p


def test_fast_ops_built_for_3d(sem):
  assert sem.fast_ops is not None
  assert sem.fast_ops.vinfo.ndim == 3


def test_layout_roundtrip_and_gather_equivalence(sem, fields):
  u, _ = fields
  info = sem.fast_ops.vinfo
  el = sem3d.nodal_to_el(u[:, 0], info)
  # Same values as the generic mesh gather, reshaped to E-last.
  ref = sem.velocity.mesh.gather(u[:, 0])  # (E, k^3)
  k = info.order + 1
  ref_el = jnp.moveaxis(ref, 0, -1).reshape(k, k, k, -1)
  np.testing.assert_allclose(np.asarray(el), np.asarray(ref_el), rtol=0)
  # el_to_nodal is the exact transpose of nodal_to_el.
  w = jnp.asarray(np.random.default_rng(1).standard_normal(el.shape))
  lhs = jnp.vdot(w, sem3d.nodal_to_el(u[:, 0], info))
  rhs = jnp.vdot(sem3d.el_to_nodal(w, info), u[:, 0])
  np.testing.assert_allclose(float(lhs), float(rhs), rtol=1e-12)


def test_exchange_el_matches_mesh_exchange(sem, fields):
  u, _ = fields
  info = sem.fast_ops.vinfo
  n = info.num_elements_per_dim
  k = info.order + 1
  # Build an element-local covector (partition a nodal field by copy count),
  # exchange in el form, compare against the nodal exchange.
  ones = jnp.ones((k, k, k, n ** 3))
  grid_mult = sem3d.el_to_nodal(ones, info)
  w = sem3d.nodal_to_el(u[:, 0] / grid_mult, info).reshape((k,) * 3 + (n,) * 3)
  exchanged = sem3d.exchange_el(w, info).reshape((k,) * 3 + (n ** 3,))
  got = sem3d.el_to_nodal(exchanged, info) / grid_mult
  want = sem.velocity.mesh.exchange(u[:, 0])
  np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-12)


def test_exchange_el_accepts_use_pallas_kwarg(sem, fields):
  """Signature parity with sem2d.exchange_el: the el-form NSE step passes
  use_pallas to whichever module matches the mesh dimension (regression:
  the 3D TGV campaign crashed at trace time on this kwarg)."""
  u, _ = fields
  info = sem.fast_ops.vinfo
  n, k = info.num_elements_per_dim, info.order + 1
  w = sem3d.nodal_to_el(u[:, 0], info).reshape((k,) * 3 + (n,) * 3)
  got = sem3d.exchange_el(w, info, use_pallas=True)
  want = sem3d.exchange_el(w, info)
  np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=0)


def test_fast_stiffness_matches_generic(sem, fields):
  u, _ = fields
  want = sem.A(u)
  got = jnp.stack(
      sem._fast_stiffness(tuple(u[:, i] for i in range(3))), axis=-1)
  got = sem.velocity.interior_mask * got
  np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-10)


def test_fast_divergence_matches_generic(sem, fields):
  u, _ = fields
  want = sem.D(u)
  got = sem._fast_D(tuple(u[:, i] for i in range(3)))
  np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-10)


def test_fast_gradient_matches_generic(sem, fields):
  _, p = fields
  want = sem.Dt(p)
  got = jnp.stack(sem._fast_Dt(p), axis=-1)
  np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-10)


def test_fast_convection_matches_generic(sem, fields):
  u, _ = fields
  want = sem.velocity.C(u)
  got = jnp.stack(sem._fast_C(tuple(u[:, i] for i in range(3))), axis=-1)
  got = sem.velocity.interior_mask * got
  np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-9)


def test_stiffness_diag_matches_dense(sem):
  ops = sem.fast_ops
  info = ops.vinfo
  k = info.order + 1
  E = info.num_elements_per_dim ** 3
  diag = np.asarray(ops.stiffness_diag_el())
  # Probe a few basis vectors: e_(i,j,l) on a fixed element.
  rng = np.random.default_rng(2)
  for _ in range(6):
    i, j, l = rng.integers(0, k, size=3)
    e = rng.integers(0, E)
    basis = jnp.zeros((k, k, k, E)).at[i, j, l, e].set(1.0)
    out = ops.stiffness_el(basis)
    np.testing.assert_allclose(float(out[i, j, l, e]), diag[i, j, l, e],
                               rtol=1e-10)


def test_3d_step_el_path_matches_generic(sem, fields):
  u, _ = fields
  # Divergence-free-ish smooth field for a stable comparison.
  coords = np.asarray(sem.velocity.mesh.node_coords)
  kw = 2 * np.pi
  u = np.stack([
      np.cos(kw * coords[:, 0]) * np.sin(kw * coords[:, 1]),
      -np.sin(kw * coords[:, 0]) * np.cos(kw * coords[:, 1]),
      0.2 * np.sin(kw * coords[:, 2]),
  ], axis=-1)
  u = jnp.asarray(u)
  p0 = jnp.zeros(sem.pressure.pspace.mesh.num_nodes)
  kwargs = dict(f=0, mu=1e-2, dt=1e-3, time_order=2, tol=1e-10, atol=1e-12)
  u1, p1, a1 = sem.stokes_one_step([u, u], [p0, p0], **kwargs)

  sem_generic = sem.replace(fast_ops=None)
  u2, p2, a2 = sem_generic.stokes_one_step([u, u], [p0, p0], **kwargs)
  np.testing.assert_allclose(np.asarray(u1), np.asarray(u2), atol=1e-8)
  np.testing.assert_allclose(np.asarray(p1 - jnp.mean(p1)),
                             np.asarray(p2 - jnp.mean(p2)), atol=1e-7)


def test_stiffness_el_multi_matches_per_component():
  """Component-batched stiffness == per-component applies exactly."""
  pm = unit_cube_mesh(3, ndim=3, periodic_dims=(0, 1, 2))
  sem = StokesSEM.create(pm, boundary_conditions={}, order=4)
  ops = sem.fast_ops
  k, E = ops.vinfo.order + 1, 27
  rng = np.random.default_rng(9)
  us = tuple(jnp.asarray(rng.standard_normal((k, k, k, E)))
             for _ in range(3))
  batched = ops.stiffness_el_multi(us)
  for got, u in zip(batched, us):
    np.testing.assert_allclose(np.asarray(got),
                               np.asarray(ops.stiffness_el(u)),
                               rtol=1e-13, atol=1e-13)


def test_slim_for_el_step_preserves_el_operators(sem):
  """`StokesSEM.slim_for_el_step` (VERDICT r3 #3 HBM diet): drops the
  generic-path geometric fields and compresses the congruent kinv fields
  to broadcastable views — every el-form operator must be IDENTICAL."""
  slim = sem.slim_for_el_step()

  def nbytes(t):
    return sum(x.nbytes for x in jax.tree_util.tree_leaves(t)
               if hasattr(x, 'nbytes'))

  assert nbytes(slim) < nbytes(sem) / 3
  # Congruent box: kinv/kinv_o compressed to per-element-constant views.
  assert slim.fast_ops.kinv.shape[2:] == (1, 1, 1, 1)
  assert slim.fast_ops.kinv_o.shape[2:] == (1, 1, 1, 1)

  ops, ops_s = sem.fast_ops, slim.fast_ops
  k = ops.vinfo.order + 1
  m = ops.pinfo.order + 1
  num_e = ops.vinfo.num_elements_per_dim ** 3
  rng = np.random.default_rng(7)
  us = tuple(jnp.asarray(rng.standard_normal((k, k, k, num_e)))
             for _ in range(3))
  p = jnp.asarray(rng.standard_normal((m, m, m, num_e)))

  for a, b in zip(ops.stiffness_el_multi(us), ops_s.stiffness_el_multi(us)):
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-13)
  for a, b in zip(ops.convection_el(*us), ops_s.convection_el(*us)):
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-13)
  np.testing.assert_allclose(
      np.asarray(ops.divergence_el(*us)),
      np.asarray(ops_s.divergence_el(*us)), atol=1e-13)
  for a, b in zip(ops.gradient_el(p), ops_s.gradient_el(p)):
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-13)
