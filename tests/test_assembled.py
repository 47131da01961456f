"""Operator-identity tests for the assembled element-block operators.

The assembled forms (ops.assembled) must equal the matrix-free operators
to rounding — on the CPU float64 oracle backend that means ~1e-10
relative.  Mirrors the reference's operator-identity test style
(``swirl_fem/navier_stokes/navier_stokes_test.py``).
"""

import numpy as np
import jax.numpy as jnp
import pytest

from swirlfem_tpu.core.bc import BCType
from swirlfem_tpu.nse.solver import bdfk_coeffs
from swirlfem_tpu.nse.solver import StokesSEM
from swirlfem_tpu.utils.box import unit_cube_mesh
from swirlfem_tpu.utils.cylinder import cylinder_channel_premesh
from swirlfem_tpu.utils.cylinder import make_cylinder_snap

DT = 1e-3
TIME_ORDER = 2
MU = 1e-3


def _cylinder_sem(order=4):
  premesh = cylinder_channel_premesh(ns=4, nr=3, nx_down=8)
  bcs = {
      'cylinder': (BCType.DIRICHLET, 0.0),
      'walls': (BCType.DIRICHLET, 0.0),
      'inflow': (BCType.DIRICHLET, 0.0),
  }
  snap = make_cylinder_snap(premesh, radius=0.05, center=(0.2, 0.2))
  sem = StokesSEM.create(premesh, boundary_conditions=bcs, order=order,
                         coord_transform=snap)
  return sem, premesh, bcs


def _periodic_sem(n=4, order=4):
  premesh = unit_cube_mesh(n, ndim=2, periodic_dims=(0, 1))
  sem = StokesSEM.create(premesh, boundary_conditions={}, order=order)
  return sem, premesh, {}


class TestBlockSchur:

  @pytest.mark.parametrize('case', ['cylinder', 'periodic'])
  def test_matches_matrix_free_E(self, case):
    if case == 'cylinder':
      sem, premesh, bcs = _cylinder_sem()
    else:
      sem, premesh, bcs = _periodic_sem()
    from swirlfem_tpu.ops.schwarz import build_schwarz_pressure_solver
    M = build_schwarz_pressure_solver(sem, premesh, bcs, DT, TIME_ORDER)
    npn = sem.pressure.pspace.mesh.num_nodes
    rng = np.random.default_rng(0)
    p = jnp.asarray(rng.standard_normal(npn))
    ref = sem.E(p, dt=DT, time_order=TIME_ORDER)
    got = M.fast_matvec(p)
    err = float(jnp.abs(ref - got).max() / jnp.abs(ref).max())
    assert err < 1e-9, err

  def test_dense_fast_matvec(self):
    sem, _, _ = _cylinder_sem()
    dense = sem.dense_pressure_preconditioner(DT, TIME_ORDER)
    npn = sem.pressure.pspace.mesh.num_nodes
    rng = np.random.default_rng(1)
    p = jnp.asarray(rng.standard_normal(npn))
    ref = sem.E(p, dt=DT, time_order=TIME_ORDER)
    got = dense.fast_matvec(p)
    err = float(jnp.abs(ref - got).max() / jnp.abs(ref).max())
    assert err < 1e-9, err


class TestAssembledMixed:
  """sem.D/Dt/E with assembled_ops vs the pure matrix-free operators."""

  def test_divergence_identity(self):
    premesh = cylinder_channel_premesh(ns=4, nr=3, nx_down=8)
    bcs = {
        'cylinder': (BCType.DIRICHLET, 0.0),
        'walls': (BCType.DIRICHLET, 0.0),
        'inflow': (BCType.DIRICHLET, 0.0),
    }
    snap = make_cylinder_snap(premesh, radius=0.05, center=(0.2, 0.2))
    kwargs = dict(boundary_conditions=bcs, order=4, coord_transform=snap)
    sem_a = StokesSEM.create(premesh, use_assembled_ops=True, **kwargs)
    sem_f = StokesSEM.create(premesh, use_assembled_ops=False, **kwargs)
    assert sem_a.assembled_ops is not None
    assert sem_f.assembled_ops is None
    nv = sem_a.velocity.mesh.num_nodes
    npn = sem_a.pressure.pspace.mesh.num_nodes
    rng = np.random.default_rng(4)
    u = jnp.asarray(rng.standard_normal((nv, 2)))
    p = jnp.asarray(rng.standard_normal(npn))
    for name, a, f in [
        ('D', sem_a.D(u), sem_f.D(u)),
        ('Dt', sem_a.Dt(p), sem_f.Dt(p)),
        ('E', sem_a.E(p, dt=DT, time_order=TIME_ORDER),
         sem_f.E(p, dt=DT, time_order=TIME_ORDER)),
    ]:
      err = float(jnp.abs(a - f).max() / jnp.abs(f).max())
      assert err < 1e-11, (name, err)
    # The assembled pair is an exact transpose pair.
    lhs = float(jnp.vdot(sem_a.D(u), p))
    rhs = float(jnp.vdot(u, sem_a.Dt(p)))
    # Dt is row-masked; compare through the masked u.
    um = sem_a.velocity.interior_mask * u
    lhs_m = float(jnp.vdot(sem_a.D(um), p))
    assert abs(lhs_m - rhs) < 1e-10 * max(abs(lhs), 1.0), (lhs_m, rhs)


class TestAssembledHelmholtz:

  @pytest.mark.parametrize('case', ['cylinder', 'periodic'])
  def test_matches_generic_H(self, case):
    if case == 'cylinder':
      sem, _, _ = _cylinder_sem()
    else:
      sem, _, _ = _periodic_sem()
    nv = sem.velocity.mesh.num_nodes
    rng = np.random.default_rng(2)
    u = jnp.asarray(rng.standard_normal((nv, 2)))
    beta_k = float(bdfk_coeffs(TIME_ORDER)[-1])
    ref = (beta_k / DT) * sem.B(u) + MU * sem.A(u)
    got = sem.assembled_viscous_matvec(MU, DT, TIME_ORDER)(u)
    err = float(jnp.abs(ref - got).max() / jnp.abs(ref).max())
    assert err < 1e-9, err

  def test_step_with_assembled_viscous_matches(self):
    sem, premesh, bcs = _cylinder_sem()
    nv = sem.velocity.mesh.num_nodes
    npn = sem.pressure.pspace.mesh.num_nodes
    rng = np.random.default_rng(3)
    mask = np.asarray(sem.velocity.interior_mask)
    u0 = jnp.asarray(rng.standard_normal((nv, 2)) * 1e-2 * mask)
    p0 = jnp.zeros(npn)
    kwargs = dict(mu=MU, dt=DT, time_order=TIME_ORDER, tol=1e-11,
                  project_out_nullspace=False)
    u_a, p_a, _ = sem.stokes_one_step([u0, u0], [p0, p0],
                                      jnp.zeros_like(u0), **kwargs)
    u_b, p_b, _ = sem.stokes_one_step(
        [u0, u0], [p0, p0], jnp.zeros_like(u0),
        viscous_matvec=sem.assembled_viscous_matvec(MU, DT, TIME_ORDER),
        **kwargs)
    assert float(jnp.abs(u_a - u_b).max() / jnp.abs(u_a).max()) < 1e-8
    assert float(jnp.abs(p_a - p_b).max() / jnp.abs(p_a).max()) < 1e-7


if __name__ == '__main__':
  pytest.main([__file__, '-v'])
