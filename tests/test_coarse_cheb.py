"""Tests for the matrix-free Chebyshev vertex coarse (ops.coarse_cheb).

Oracle strategy (mirrors the reference's identity -> solve ladder,
``swirl_fem/navier_stokes/navier_stokes_test.py``): first the coarse solve
in isolation against the dense (pseudo-)inverse it replaces, then its
structural contract (linearity, symmetry, nullspace annihilation) — the
properties the outer CG silently depends on — then the solver-level impact
inside the full two-level Schwarz preconditioner.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from swirlfem_tpu.core.bc import BCType
from swirlfem_tpu.linalg.cg import cg
from swirlfem_tpu.nse.solver import StokesSEM
from swirlfem_tpu.ops import schwarz as schwarz_mod
from swirlfem_tpu.ops.coarse_cheb import build_cheb_vertex_coarse
from swirlfem_tpu.ops.schwarz import build_schwarz_pressure_solver
from swirlfem_tpu.utils.box import unit_cube_mesh
from swirlfem_tpu.utils.cylinder import cylinder_channel_premesh
from swirlfem_tpu.utils.cylinder import make_cylinder_snap

DT = 1e-3
TIME_ORDER = 2


def _vertex_setup(premesh):
  uid = schwarz_mod._vertex_unique_ids(premesh)
  el_uid = uid[premesh.elements]
  nv = int(uid.max()) + 1
  return uid, el_uid, nv


def _cavity(n=8):
  premesh = unit_cube_mesh(n, ndim=2)
  bcs = {'boundary': (BCType.DIRICHLET, 0.0)}
  return premesh, bcs


def _cylinder():
  premesh = cylinder_channel_premesh(ns=4, nr=3, nx_down=6)
  bcs = {
      'cylinder': (BCType.DIRICHLET, 0.0),
      'walls': (BCType.DIRICHLET, 0.0),
      'inflow': (BCType.DIRICHLET, 0.0),
  }
  return premesh, bcs


def _build_both(premesh, bcs, tol=1e-6):
  """(cheb, dense inv_c, nv) for the same coarse operator, f64."""
  uid, el_uid, nv = _vertex_setup(premesh)
  has_nullspace = not schwarz_mod._has_outflow(premesh, bcs, uid)
  cheb = build_cheb_vertex_coarse(
      premesh, bcs, uid, el_uid, nv, DT, TIME_ORDER, has_nullspace,
      rdtype=np.float64, tol=tol)
  inv_c = schwarz_mod._vertex_coarse_inverse(
      premesh, bcs, uid, el_uid, nv, DT, TIME_ORDER, has_nullspace)
  return cheb, inv_c, nv, has_nullspace


class TestChebVsDenseInverse:

  @pytest.mark.smoke
  def test_enclosed_matches_pinv(self):
    premesh, bcs = _cavity(n=8)          # nv = 81, singular coarse
    cheb, inv_c, nv, has_nullspace = _build_both(premesh, bcs)
    assert has_nullspace
    rng = np.random.default_rng(0)
    r = rng.standard_normal(nv)
    want = inv_c @ (r - r.mean())
    got = np.asarray(cheb.solve(jnp.asarray(r)))
    assert np.linalg.norm(got - want) <= 1e-4 * np.linalg.norm(want)

  @pytest.mark.smoke
  def test_outflow_matches_inverse(self):
    premesh, bcs = _cylinder()           # do-nothing outflow: nonsingular
    cheb, inv_c, nv, has_nullspace = _build_both(premesh, bcs)
    assert not has_nullspace
    rng = np.random.default_rng(1)
    r = rng.standard_normal(nv)
    want = inv_c @ r
    got = np.asarray(cheb.solve(jnp.asarray(r)))
    assert np.linalg.norm(got - want) <= 1e-4 * np.linalg.norm(want)


class TestStructure:

  @pytest.mark.smoke
  def test_linear_symmetric_psd(self):
    """The outer CG requires the coarse term to be a LINEAR, SYMMETRIC,
    positive semi-definite map — the reason for fixed-degree Chebyshev
    instead of an inner CG."""
    premesh, bcs = _cavity(n=8)
    cheb, _, nv, _ = _build_both(premesh, bcs, tol=1e-2)
    rng = np.random.default_rng(2)
    r1 = jnp.asarray(rng.standard_normal(nv))
    r2 = jnp.asarray(rng.standard_normal(nv))
    y1 = cheb.solve(r1)
    y2 = cheb.solve(r2)
    # Linearity.
    y12 = cheb.solve(2.0 * r1 - 3.0 * r2)
    np.testing.assert_allclose(np.asarray(y12),
                               np.asarray(2.0 * y1 - 3.0 * y2),
                               rtol=1e-10, atol=1e-10)
    # Symmetry: <r2, S r1> == <r1, S r2>.
    np.testing.assert_allclose(float(jnp.vdot(r2, y1)),
                               float(jnp.vdot(r1, y2)), rtol=1e-9)
    # Positivity on the range (zero-mean) subspace.
    assert float(jnp.vdot(r1 - jnp.mean(r1), y1)) > 0.0
    # Constants are annihilated (nullspace contract of the pinv path).
    yc = cheb.solve(jnp.ones(nv))
    assert float(jnp.linalg.norm(yc)) <= 1e-8

  @pytest.mark.smoke
  def test_device_solve_matches_numpy_twin(self):
    """The setup-time degree verification runs `_cheb_solve_np`; this pins
    it against the deployed device recurrence so a future edit to one
    without the other is caught (they must stay the same polynomial)."""
    import scipy.sparse as sp
    from swirlfem_tpu.ops.coarse_cheb import _cheb_solve_np
    premesh, bcs = _cavity(n=8)
    cheb, _, nv, _ = _build_both(premesh, bcs, tol=1e-2)
    ell_idx = np.asarray(cheb.ell_idx)
    ell_val = np.asarray(cheb.ell_val)
    a_csr = sp.coo_matrix(
        (ell_val.reshape(-1),
         (np.repeat(np.arange(nv), ell_idx.shape[1]), ell_idx.reshape(-1))),
        shape=(nv, nv)).tocsr()
    dinv = np.asarray(cheb.dinv)
    acc_inv = np.asarray(cheb.acc_inv)
    agg = np.asarray(cheb.agg_id)
    p_mat = sp.coo_matrix((np.ones(nv), (np.arange(nv), agg)),
                          shape=(nv, cheb.num_aggregates)).tocsr()

    def precond_np(r):
      z = dinv * r + p_mat @ (acc_inv @ (p_mat.T @ r))
      return z - z.mean() if cheb.has_nullspace else z

    rng = np.random.default_rng(11)
    b = rng.standard_normal(nv)
    want, _ = _cheb_solve_np(lambda v: a_csr @ v, precond_np, b,
                             float(cheb.lam_min), float(cheb.lam_max),
                             cheb.degree, cheb.has_nullspace)
    got = np.asarray(cheb.solve(jnp.asarray(b))) / float(cheb.scale)
    np.testing.assert_allclose(got, want, rtol=1e-12, atol=1e-13)

  @pytest.mark.smoke
  def test_degree_is_bounded(self):
    """The aggregation two-grid keeps the verified degree modest — the
    whole point vs bare-Jacobi Chebyshev (degree O(1/h))."""
    premesh, bcs = _cavity(n=16)         # nv = 289
    cheb, _, _, _ = _build_both(premesh, bcs, tol=1e-2)
    assert cheb.degree <= 40


class TestInsideSchwarz:

  @pytest.mark.smoke
  def test_auto_switches_above_cap(self):
    premesh, bcs = _cavity(n=6)
    sem = StokesSEM.create(premesh, boundary_conditions=bcs, order=3)
    import warnings
    with warnings.catch_warnings():
      # A degree-cap warning here means the spectral bounds broke (the
      # round-7 PCG-breakdown regression) — fail loudly, not silently.
      warnings.simplefilter('error', RuntimeWarning)
      M = build_schwarz_pressure_solver(sem, premesh, bcs, DT, TIME_ORDER,
                                        coarse='vertex', max_coarse_dofs=10)
    assert M.coarse == 'vertex-cheb'

  def test_iterations_match_dense_vertex(self):
    """Solver-level: Chebyshev coarse within +3 CG iterations of the dense
    vertex coarse on the curved cylinder mesh, same solution."""
    premesh, bcs = _cylinder()
    snap = make_cylinder_snap(premesh, radius=0.05, center=(0.2, 0.2))
    sem = StokesSEM.create(premesh, boundary_conditions=bcs, order=4,
                           coord_transform=snap)
    npn = sem.pressure.pspace.mesh.num_nodes
    rng = np.random.default_rng(3)
    rhs = jnp.asarray(rng.standard_normal(npn))
    matvec = lambda p: sem.E(p, dt=DT, time_order=TIME_ORDER)

    iters = {}
    sols = {}
    for kind in ('vertex', 'vertex-cheb'):
      M = build_schwarz_pressure_solver(sem, premesh, bcs, DT, TIME_ORDER,
                                        coarse=kind)
      x, info = cg(matvec, rhs, M=M, tol=1e-8, maxiter=500)
      iters[kind] = int(info['num_iterations'])
      sols[kind] = np.asarray(x)
    assert iters['vertex-cheb'] <= iters['vertex'] + 3
    np.testing.assert_allclose(
        sols['vertex-cheb'], sols['vertex'],
        atol=1e-5 * float(np.linalg.norm(sols['vertex'])))
