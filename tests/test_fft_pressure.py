"""FFT block-diagonalized pressure Schur solver tests."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from swirlfem_tpu.nse.solver import StokesSEM
from swirlfem_tpu.ops.fft_pressure import (build_fft_pressure_solver,
                                           is_uniform_periodic)
from swirlfem_tpu.utils.box import unit_cube_mesh


@pytest.fixture(scope='module')
def sem():
  pm = unit_cube_mesh(4, ndim=2, periodic_dims=(0, 1))
  return StokesSEM.create(pm, boundary_conditions={}, order=5)


def test_uniform_periodic_detection(sem):
  assert is_uniform_periodic(sem)
  pm2 = unit_cube_mesh(4, ndim=2)  # Dirichlet box: not periodic
  from swirlfem_tpu.core.bc import BCType
  sem2 = StokesSEM.create(pm2, {'boundary': (BCType.DIRICHLET, 0.0)},
                          order=3)
  assert not is_uniform_periodic(sem2)
  assert sem2.fft_pressure_preconditioner(1e-3, 2) is None


def test_fft_solver_inverts_e(sem):
  dt, k = 2e-3, 2
  solve = build_fft_pressure_solver(sem, dt, k)
  rng = np.random.default_rng(0)
  r = jnp.asarray(
      rng.standard_normal(sem.pressure.pspace.mesh.num_nodes))
  x = solve(r)
  resid = sem.E(x, dt=dt, time_order=k) - r
  # Exact up to the constant nullspace component.
  resid = resid - jnp.mean(resid)
  assert float(jnp.abs(resid).max()) < 1e-10


def test_preconditioned_step_matches_and_converges_fast(sem):
  dt, k = 2e-3, 2
  precond = sem.fft_pressure_preconditioner(dt, k)
  assert precond is not None
  rng = np.random.default_rng(1)
  nv = sem.velocity.mesh.num_nodes
  npn = sem.pressure.pspace.mesh.num_nodes
  u0 = jnp.asarray(rng.standard_normal((nv, 2)) * 1e-2)
  p0 = jnp.zeros(npn)
  kwargs = dict(f=0, mu=1e-2, dt=dt, time_order=k, tol=1e-10, atol=1e-10)
  u1, p1, a1 = sem.stokes_one_step([u0, u0], [p0, p0], **kwargs)
  u2, p2, a2 = sem.stokes_one_step([u0, u0], [p0, p0],
                                   pressure_preconditioner=precond, **kwargs)
  np.testing.assert_allclose(np.asarray(u1), np.asarray(u2), atol=1e-9)
  assert int(a2['dp_info']['num_iterations']) <= 3
  assert int(a2['dp_info']['num_iterations']) < int(
      a1['dp_info']['num_iterations'])
