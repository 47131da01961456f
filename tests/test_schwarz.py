"""Tests for the two-level Schwarz pressure preconditioner (ops.schwarz).

Strategy mirrors the reference's operator-identity ladder
(``swirl_fem/navier_stokes/navier_stokes_test.py``): structural properties
(SPD, nullspace flag) first, then solver-level impact (CG iteration counts
vs the unpreconditioned baseline and solution agreement with an exact
solve).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from swirlfem_tpu.core.bc import BCType
from swirlfem_tpu.linalg.cg import cg
from swirlfem_tpu.nse.solver import StokesSEM
from swirlfem_tpu.utils.box import unit_cube_mesh
from swirlfem_tpu.utils.cylinder import cylinder_channel_premesh
from swirlfem_tpu.utils.cylinder import make_cylinder_snap

DT = 1e-3
TIME_ORDER = 2


@pytest.fixture(scope='module')
def cylinder5():
  """Cylinder SEM at order 5 plus the (expensive, ~1250-iteration) plain-CG
  baseline solve, shared by every preconditioner parametrization."""
  sem, premesh, bcs = _cylinder_sem(order=5)
  npn = sem.pressure.pspace.mesh.num_nodes
  rng = np.random.default_rng(2)
  rhs = jnp.asarray(rng.standard_normal(npn))
  matvec = lambda p: sem.E(p, dt=DT, time_order=TIME_ORDER)
  x_plain, iters_plain = _pressure_iters(sem, matvec, rhs, M=None, tol=1e-7)
  return sem, premesh, bcs, rhs, matvec, x_plain, iters_plain


@pytest.fixture(scope='module')
def cylinder4():
  return _cylinder_sem(order=4)


def _cavity_sem(n=6, order=5):
  premesh = unit_cube_mesh(n, ndim=2)
  bcs = {'boundary': (BCType.DIRICHLET, 0.0)}
  sem = StokesSEM.create(premesh, boundary_conditions=bcs, order=order)
  return sem, premesh, bcs


def _cylinder_sem(order=5):
  premesh = cylinder_channel_premesh(ns=6, nr=4, nx_down=10)
  bcs = {
      'cylinder': (BCType.DIRICHLET, 0.0),
      'walls': (BCType.DIRICHLET, 0.0),
      'inflow': (BCType.DIRICHLET, 0.0),
  }
  snap = make_cylinder_snap(premesh, radius=0.05, center=(0.2, 0.2))
  sem = StokesSEM.create(premesh, boundary_conditions=bcs, order=order,
                         coord_transform=snap)
  return sem, premesh, bcs


def _project(sem, r):
  ones = jnp.ones_like(r)
  return r - (jnp.vdot(ones, r) / jnp.vdot(ones, ones)) * ones


def _pressure_iters(sem, matvec, rhs, M, tol=1e-8):
  x, info = cg(matvec, rhs, M=M, tol=tol, maxiter=4000)
  return x, int(info['num_iterations'])


class TestSchwarzStructure:

  def test_spd_enclosed(self):
    sem, premesh, bcs = _cavity_sem()
    from swirlfem_tpu.ops.schwarz import build_schwarz_pressure_solver
    M = build_schwarz_pressure_solver(sem, premesh, bcs, DT, TIME_ORDER)
    assert M.has_nullspace  # enclosed flow: E singular
    npn = sem.pressure.pspace.mesh.num_nodes
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal(npn))
    y = jnp.asarray(rng.standard_normal(npn))
    sym_err = abs(float(jnp.vdot(x, M(y)) - jnp.vdot(M(x), y)))
    scale = float(jnp.vdot(x, M(x)))
    assert sym_err < 1e-10 * abs(scale)
    assert scale > 0
    assert float(jnp.vdot(y, M(y))) > 0

  def test_outflow_detection(self, cylinder4):
    sem, premesh, bcs = cylinder4
    from swirlfem_tpu.ops.schwarz import build_schwarz_pressure_solver
    M = build_schwarz_pressure_solver(sem, premesh, bcs, DT, TIME_ORDER)
    # Do-nothing outflow present: E nonsingular, no nullspace.
    assert not M.has_nullspace


class TestSchwarzSolves:

  def test_cavity_iteration_reduction(self):
    sem, premesh, bcs = _cavity_sem(n=8, order=6)
    M = sem.schwarz_pressure_preconditioner(premesh, bcs, DT, TIME_ORDER)
    npn = sem.pressure.pspace.mesh.num_nodes
    rng = np.random.default_rng(1)
    rhs = _project(sem, jnp.asarray(rng.standard_normal(npn)))
    matvec = lambda p: sem.E(p, dt=DT, time_order=TIME_ORDER)

    x_plain, iters_plain = _pressure_iters(
        sem, matvec, rhs, M=lambda r: _project(sem, r))
    x_schwarz, iters_schwarz = _pressure_iters(sem, matvec, rhs, M=M)
    # Both converge to the same solution (up to the constant mode).
    da = _project(sem, x_plain - x_schwarz)
    assert float(jnp.abs(da).max() / jnp.abs(x_plain).max()) < 1e-5
    assert iters_schwarz < iters_plain / 2, (iters_schwarz, iters_plain)
    assert iters_schwarz < 60, iters_schwarz

  @pytest.mark.parametrize('coarse,overlap,bound', [
      ('p1dg', 0, 80),       # measured ~48 (plain CG: ~1250)
      ('p1dg', 'auto', 40),  # overlap-1 locals, measured ~23
      ('vertex', 'auto', 90),
  ])
  def test_cylinder_iteration_reduction(self, cylinder5, coarse, overlap,
                                        bound):
    sem, premesh, bcs, rhs, matvec, x_plain, iters_plain = cylinder5
    M = sem.schwarz_pressure_preconditioner(premesh, bcs, DT, TIME_ORDER,
                                            coarse=coarse, overlap=overlap)
    x_schwarz, iters_schwarz = _pressure_iters(sem, matvec, rhs, M=M,
                                               tol=1e-7)
    rel = float(jnp.abs(x_plain - x_schwarz).max() / jnp.abs(x_plain).max())
    assert rel < 1e-4, rel
    assert iters_schwarz < bound, (iters_schwarz, iters_plain)
    assert iters_schwarz < iters_plain / 8, (iters_schwarz, iters_plain)

  def test_3d_overlap_tables_consistent(self):
    """ext_nodes must be the self-consistent elements[owner][local]."""
    from swirlfem_tpu.ops import schwarz as _s
    premesh = unit_cube_mesh(3, ndim=3)
    sem = StokesSEM.create(premesh, {'boundary': (BCType.DIRICHLET, 0.0)},
                           order=3)
    uid = _s._vertex_unique_ids(premesh)
    el_uid = uid[premesh.elements]
    elements = np.asarray(sem.pressure.pspace.mesh.elements)
    m = sem.pressure.pspace.mesh.order + 1
    ext_nodes, ext_owner, ext_local = _s._extended_index_tables_3d(
        el_uid, elements, m)
    assert ext_nodes.shape == (27, m ** 3 + 6 * m * m)
    live = ext_owner >= 0
    np.testing.assert_array_equal(
        ext_nodes[live],
        elements[ext_owner[live], ext_local[live]])
    # Interior element: all 6 faces present; corner element: 3.
    n_live = live.sum(axis=1)
    assert n_live.max() == m ** 3 + 6 * m * m
    assert n_live.min() == m ** 3 + 3 * m * m

  def test_3d_overlap_iteration_reduction(self):
    premesh = unit_cube_mesh(3, ndim=3)
    bcs = {'boundary': (BCType.DIRICHLET, 0.0)}
    sem = StokesSEM.create(premesh, bcs, order=3)
    npn = sem.pressure.pspace.mesh.num_nodes
    rng = np.random.default_rng(4)
    rhs = _project(sem, jnp.asarray(rng.standard_normal(npn)))
    matvec = lambda p: sem.E(p, dt=DT, time_order=TIME_ORDER)
    m0 = sem.schwarz_pressure_preconditioner(premesh, bcs, DT, TIME_ORDER,
                                             overlap=0)
    m1 = sem.schwarz_pressure_preconditioner(premesh, bcs, DT, TIME_ORDER,
                                             overlap=1)
    x0, it0 = _pressure_iters(sem, matvec, rhs, M=m0)
    x1, it1 = _pressure_iters(sem, matvec, rhs, M=m1)
    da = _project(sem, x0 - x1)
    assert float(jnp.abs(da).max() / jnp.abs(x0).max()) < 1e-5
    assert it1 < it0, (it1, it0)

  def test_3d_overlap_mixed_orientations(self):
    """Rotated per-element corner orderings: the face pairing and the
    extended tables must be orientation-invariant (they pair conforming
    faces by sorted corner uids and never assume aligned local axes)."""
    import itertools
    corners = np.array([[(i >> 2) & 1, (i >> 1) & 1, i & 1]
                        for i in range(8)]) * 2 - 1    # axis 0 slowest
    rots = []
    for perm in itertools.permutations(range(3)):
      for signs in itertools.product((1, -1), repeat=3):
        m = np.zeros((3, 3))
        for i, p in enumerate(perm):
          m[i, p] = signs[i]
        if np.linalg.det(m) > 0:                       # keep jacdet > 0
          rc = corners @ m.T
          rots.append(np.array(
              [np.nonzero((corners == r).all(1))[0][0] for r in rc]))

    premesh = unit_cube_mesh(3, ndim=3)
    elements = np.array(premesh.elements)
    rng = np.random.default_rng(7)
    for e in range(len(elements)):
      elements[e] = elements[e][rots[rng.integers(len(rots))]]
    premesh = premesh.replace(elements=elements)

    bcs = {'boundary': (BCType.DIRICHLET, 0.0)}
    sem = StokesSEM.create(premesh, bcs, order=3)
    npn = sem.pressure.pspace.mesh.num_nodes
    rng2 = np.random.default_rng(8)
    rhs = _project(sem, jnp.asarray(rng2.standard_normal(npn)))
    matvec = lambda p: sem.E(p, dt=DT, time_order=TIME_ORDER)
    m0 = sem.schwarz_pressure_preconditioner(premesh, bcs, DT, TIME_ORDER,
                                             overlap=0)
    m1 = sem.schwarz_pressure_preconditioner(premesh, bcs, DT, TIME_ORDER,
                                             overlap=1)
    x0, it0 = _pressure_iters(sem, matvec, rhs, M=m0)
    x1, it1 = _pressure_iters(sem, matvec, rhs, M=m1)
    da = _project(sem, x0 - x1)
    assert float(jnp.abs(da).max() / jnp.abs(x0).max()) < 1e-5
    assert it1 < it0, (it1, it0)

  def test_cylinder_step_matches_dense(self, cylinder4):
    """A full NSE step with Schwarz-PCG matches the dense-inverse step."""
    sem, premesh, bcs = cylinder4
    nv = sem.velocity.mesh.num_nodes
    npn = sem.pressure.pspace.mesh.num_nodes
    rng = np.random.default_rng(3)
    mask = np.asarray(sem.velocity.interior_mask)
    u0 = jnp.asarray(rng.standard_normal((nv, 2)) * 1e-2 * mask)
    p0 = jnp.zeros(npn)
    dense = sem.dense_pressure_preconditioner(DT, TIME_ORDER)
    schwarz = sem.schwarz_pressure_preconditioner(premesh, bcs, DT,
                                                 TIME_ORDER)
    kwargs = dict(mu=1e-3, dt=DT, time_order=TIME_ORDER, tol=1e-10,
                  project_out_nullspace=False)
    u_a, p_a, _ = sem.stokes_one_step(
        [u0, u0], [p0, p0], jnp.zeros_like(u0),
        pressure_preconditioner=dense, **kwargs)
    u_b, p_b, aux = sem.stokes_one_step(
        [u0, u0], [p0, p0], jnp.zeros_like(u0),
        pressure_preconditioner=schwarz, **kwargs)
    assert float(jnp.abs(u_a - u_b).max() / jnp.abs(u_a).max()) < 1e-6
    assert float(jnp.abs(p_a - p_b).max() / jnp.abs(p_a).max()) < 1e-5


if __name__ == '__main__':
  pytest.main([__file__, '-v'])


def test_vertex_coarse_sparse_path_matches_dense_oracles():
  """Above the dense threshold the vertex-coarse inverse switches to a
  sparse-LU grounded solve; it must equal the eigh pseudo-inverse
  (singular/enclosed) and the dense inverse (nonsingular/outflow) to
  rounding.  Motivation: the O(nv^3) eigh dominated Schwarz setup at
  scale (25 min at nv = 16,641)."""
  from swirlfem_tpu.nse.solver import bdfk_coeffs
  from swirlfem_tpu.ops import schwarz as _s
  from swirlfem_tpu.utils.box import unit_cube_mesh

  pm = unit_cube_mesh(50, ndim=2).replace(box_info=None)  # nv=2601 > 2048
  uid = _s._vertex_unique_ids(pm)
  el_uid = uid[pm.elements]
  nv = int(uid.max()) + 1
  s_el = _s._coarse_element_stiffness(pm)
  a_c = np.zeros((nv, nv))
  np.add.at(a_c, (el_uid[:, :, None], el_uid[:, None, :]), s_el)
  scale = float(bdfk_coeffs(2)[-1]) / 1e-2

  # Singular (enclosed flow): grounded solve == eigh pinv.
  got = _s._vertex_coarse_inverse(
      pm, {'boundary': (BCType.DIRICHLET, 0.0)}, uid, el_uid, nv,
      1e-2, 2, True)
  want, _ = _s._pinv_psd(a_c)
  err = np.abs(got - scale * want).max() / (scale * np.abs(want).max())
  assert err < 1e-9, err

  # Nonsingular (all-outflow): sparse Dirichlet rows == dense inverse.
  got2 = _s._vertex_coarse_inverse(pm, {}, uid, el_uid, nv, 1e-2, 2, False)
  a2 = a_c.copy()
  bdry = _s._boundary_vertices(pm.elements, uid, pm.ndim)
  dref = float(np.mean(np.diag(a2)))
  a2[bdry, :] = 0.0
  a2[:, bdry] = 0.0
  a2[bdry, bdry] = dref
  want2 = scale * np.linalg.inv(a2)
  err2 = np.abs(got2 - want2).max() / np.abs(want2).max()
  assert err2 < 1e-9, err2
