"""Element-local FDM viscous preconditioner (ops/fdm_element.py).

The reference has no viscous preconditioner (its tentative-velocity CG
uses the bare exchange projector, ``navier_stokes/navier_stokes.py:431``),
so these tests validate beyond-parity machinery: SPD structure, converged-
solution parity against the default Jacobi projector, iteration-count
reduction on warped/stretched meshes, and partitioned-vs-unpartitioned
step parity with the preconditioner passed through ``spmd_map``.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from swirlfem_tpu.core.bc import BCType
from swirlfem_tpu.nse.solver import StokesSEM
from swirlfem_tpu.ops.fdm_element import build_element_fdm
from swirlfem_tpu.ops.fdm_element import element_fdm_viscous_preconditioner
from swirlfem_tpu.parallel.spmd import device_mesh, spmd_map
from swirlfem_tpu.utils.box import unit_cube_mesh

BCS = {'boundary': (BCType.DIRICHLET, 0.0)}


def _warped_premesh(n, amp=(0.06, 0.04)):
  pm = unit_cube_mesh(n, ndim=2)
  c = np.asarray(pm.node_coords)
  warped = np.stack([c[:, 0] + amp[0] * np.sin(np.pi * c[:, 1]),
                     c[:, 1] + amp[1] * np.sin(2 * np.pi * c[:, 0])], -1)
  # box_info=None: force the generic (non-fast-ops) solver path.
  return pm.replace(node_coords=warped, box_info=None)


@pytest.fixture(scope='module')
def warped_sem():
  return StokesSEM.create(_warped_premesh(12), BCS, order=4)


def _one_step(sem, mu, dt, **kw):
  vc = np.asarray(sem.velocity.mesh.node_coords)
  mask = np.asarray(sem.velocity.interior_mask)
  comps = [np.sin(np.pi * vc[:, 1]) * vc[:, 0] * (1 - vc[:, 0]),
           0.1 * np.cos(np.pi * vc[:, 0])]
  comps += [0.05 * np.sin(np.pi * vc[:, j]) for j in range(2, vc.shape[1])]
  u0 = jnp.asarray(np.stack(comps, -1) * mask)
  p0 = jnp.zeros(sem.pressure.pspace.mesh.num_nodes)
  u, p, aux = sem.stokes_one_step(
      [u0, 0.9 * u0], [p0, p0], jnp.zeros_like(u0), mu=mu, dt=dt,
      time_order=2, tol=1e-10, atol=1e-10, maxiter=2000, **kw)
  return np.asarray(u), int(aux['u_star_info']['num_iterations'])


@pytest.mark.smoke
def test_preconditioner_is_symmetric_psd(warped_sem):
  sem = warped_sem
  fdm = build_element_fdm(sem)
  m = element_fdm_viscous_preconditioner(sem, fdm, mu=1e-2, dt=1e-2,
                                         time_order=2)
  mask = np.asarray(sem.velocity.interior_mask)
  rng = np.random.default_rng(1)
  r1 = jnp.asarray(rng.standard_normal(mask.shape[:1] + (2,))) * mask
  r2 = jnp.asarray(rng.standard_normal(mask.shape[:1] + (2,))) * mask
  a = float(jnp.vdot(r1, m(r2)))
  b = float(jnp.vdot(m(r1), r2))
  assert abs(a - b) <= 1e-12 * abs(a), (a, b)
  assert float(jnp.vdot(r1, m(r1))) > 0.0


@pytest.mark.smoke
def test_same_solution_and_fewer_iterations_on_warped_mesh(warped_sem):
  """Stiffness-dominated regime: ~2x fewer viscous CG iterations, same u."""
  sem = warped_sem
  fdm = build_element_fdm(sem)
  mu, dt = 1e-1, 1e-2  # shift=150, mu*lam_max*g ~ O(10^3): A-dominated
  u_jac, it_jac = _one_step(sem, mu, dt)
  u_fdm, it_fdm = _one_step(sem, mu, dt, viscous_fdm=fdm)
  np.testing.assert_allclose(u_fdm, u_jac, atol=1e-9)
  assert it_fdm <= 0.7 * it_jac, (it_jac, it_fdm)


@pytest.mark.smoke
def test_never_worse_in_mass_dominated_regime(warped_sem):
  """T-weighting collapses to exact assembled Jacobi as mass dominates."""
  sem = warped_sem
  fdm = build_element_fdm(sem)
  _, it_jac = _one_step(sem, 1e-4, 1e-3)       # shift=1500 >> mu lam g
  _, it_fdm = _one_step(sem, 1e-4, 1e-3, viscous_fdm=fdm)
  assert it_fdm <= it_jac + 1, (it_jac, it_fdm)


def test_3d_symmetric_and_step_parity():
  pm = unit_cube_mesh(3, ndim=3).replace(box_info=None)
  sem = StokesSEM.create(pm, BCS, order=3)
  fdm = build_element_fdm(sem)
  m = element_fdm_viscous_preconditioner(sem, fdm, mu=1e-2, dt=1e-2,
                                         time_order=2)
  mask = np.asarray(sem.velocity.interior_mask)
  rng = np.random.default_rng(2)
  r1 = jnp.asarray(rng.standard_normal(mask.shape[:1] + (3,))) * mask
  r2 = jnp.asarray(rng.standard_normal(mask.shape[:1] + (3,))) * mask
  a = float(jnp.vdot(r1, m(r2)))
  b = float(jnp.vdot(m(r1), r2))
  assert abs(a - b) <= 1e-12 * abs(a), (a, b)
  u_jac, _ = _one_step(sem, 1e-2, 1e-2)
  u_fdm, _ = _one_step(sem, 1e-2, 1e-2, viscous_fdm=fdm)
  np.testing.assert_allclose(u_fdm, u_jac, atol=1e-9)


def test_partitioned_step_parity_with_fdm():
  """The ElementFDM pytree shards through spmd_map; the two extra
  exchanges inside M ride the partitioned mesh's collectives, and the
  partitioned step must match the unpartitioned one to f64 tightness."""
  num_parts = 4
  assert jax.device_count() >= num_parts, jax.devices()
  n = 8
  pm = _warped_premesh(n)
  parts = (np.arange(n * n) // (n * n // num_parts)).astype(np.int32)
  mu, dt = 1e-2, 1e-2

  sem_u = StokesSEM.create(pm, BCS, order=3)
  fdm_u = build_element_fdm(sem_u)
  u_exp, _ = _one_step(sem_u, mu, dt, viscous_fdm=fdm_u)

  dmesh = device_mesh('part', num_parts)
  sem_p = StokesSEM.create(pm.replace(partitions=parts), BCS, order=3,
                           axis_name='part', device_mesh=dmesh)
  fdm_p = build_element_fdm(sem_p)
  assert fdm_p.zhat.ndim == 3  # (P, k, k): tiled for sharding

  vc = np.asarray(sem_u.velocity.mesh.node_coords)
  mask = np.asarray(sem_u.velocity.interior_mask)
  u0 = np.stack([np.sin(np.pi * vc[:, 1]) * vc[:, 0] * (1 - vc[:, 0]),
                 0.1 * np.cos(np.pi * vc[:, 0])], -1) * mask
  shard_v = lambda u: sem_p.velocity.mesh.shard_nodal(np.asarray(u))
  shard_p = lambda p: sem_p.pressure.pspace.mesh.shard_nodal(np.asarray(p))
  p0 = np.zeros(sem_u.pressure.pspace.mesh.num_nodes)

  def step(sem, us, ps, f, fdm):
    return sem.stokes_one_step(us, ps, f, mu=mu, dt=dt, time_order=2,
                               tol=1e-10, atol=1e-10, maxiter=2000,
                               viscous_fdm=fdm)

  run = spmd_map(step, dmesh, 'part')
  u_got, _, _ = run(sem_p, [shard_v(u0), shard_v(0.9 * u0)],
                    [shard_p(p0), shard_p(p0)], jnp.zeros_like(shard_v(u0)),
                    fdm_p)
  v_idx = np.asarray(sem_p.velocity.mesh.node_indices)
  valid = v_idx != -1
  err = np.abs(np.asarray(u_got)[valid] - u_exp[v_idx[valid]]).max()
  assert err < 1e-8, err
