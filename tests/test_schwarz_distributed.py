"""Distributed Schwarz vs the single-device Schwarz oracle.

Same pattern as tests/test_parallel.py: 4 virtual CPU devices, partitioned
solver under spmd_map, unpartitioned twin as the float64 oracle.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from swirlfem_tpu.core.bc import BCType
from swirlfem_tpu.nse.solver import StokesSEM
from swirlfem_tpu.ops.schwarz import build_schwarz_pressure_solver
from swirlfem_tpu.ops.schwarz_distributed import build_distributed_schwarz
from swirlfem_tpu.parallel.spmd import device_mesh, spmd_map
from swirlfem_tpu.utils.box import unit_cube_mesh

NUM_PARTS = 4


@pytest.fixture(scope='module')
def dmesh():
  assert jax.device_count() >= NUM_PARTS, jax.devices()
  return device_mesh('part', NUM_PARTS)


def _setup(order=4, n=6, overlap='auto'):
  parts = np.kron(np.array([[0, 1], [2, 3]]), np.ones((n // 2, n // 2),
                                                      dtype=np.int64))
  pm = unit_cube_mesh(n, ndim=2, partitions=parts)
  coords = np.asarray(pm.node_coords)
  # Deformed geometry so no FDM-like structure hides bugs.
  warped = np.stack(
      [coords[:, 0] + 0.06 * np.sin(np.pi * coords[:, 1]),
       coords[:, 1] + 0.04 * np.sin(2 * np.pi * coords[:, 0])], axis=-1)
  pm = pm.replace(node_coords=warped)
  bcs = {'boundary': (BCType.DIRICHLET, 0.0)}
  dt, k = 1e-2, 2
  sem_u = StokesSEM.create(pm.replace(partitions=None), bcs, order=order)
  return pm, bcs, sem_u, dt, k


@pytest.mark.parametrize('overlap', [0, 1])
def test_distributed_apply_matches_unpartitioned(dmesh, overlap):
  pm, bcs, sem_u, dt, k = _setup(overlap=overlap)
  m_u = build_schwarz_pressure_solver(sem_u, pm.replace(partitions=None),
                                      bcs, dt, k, overlap=overlap)
  m_d = build_distributed_schwarz(sem_u, pm, bcs, dt, k, axis_name='part',
                                  overlap=overlap)

  sem_p = StokesSEM.create(pm, bcs, order=4, axis_name='part',
                           device_mesh=dmesh)
  p_idx = np.asarray(sem_p.pressure.pspace.mesh.node_indices)
  npn = sem_u.pressure.pspace.mesh.num_nodes

  rng = np.random.default_rng(0)
  r = rng.standard_normal(npn)
  r_sharded = jnp.asarray(r[np.clip(p_idx, 0, None)]
                          * (p_idx != -1))

  apply_d = spmd_map(lambda m, x: m(x), dmesh, 'part')
  got = np.asarray(apply_d(m_d, r_sharded))
  expected = np.asarray(m_u(jnp.asarray(r)))
  valid = p_idx != -1
  np.testing.assert_allclose(got[valid], expected[p_idx[valid]],
                             rtol=1e-10, atol=1e-12)

  # The distributed assembled E matvec equals the matrix-free oracle E.
  mv_d = spmd_map(lambda m, x: m.fast_matvec(x), dmesh, 'part')
  got_e = np.asarray(mv_d(m_d, r_sharded))
  exp_e = np.asarray(sem_u.E(jnp.asarray(r), dt=dt, time_order=k))
  np.testing.assert_allclose(got_e[valid], exp_e[p_idx[valid]],
                             rtol=1e-9, atol=1e-11)


def test_plain_builder_delegates_partitioned_premesh(dmesh):
  """`ops.schwarz.build_schwarz_pressure_solver` fed a PARTITIONED premesh
  routes to the distributed builder (VERDICT r3 #9: the seam no longer
  raises); the result applies identically to a direct
  `build_distributed_schwarz` call.  A partitioned (stacked-leaf) solver
  passed as the probing oracle is rejected with a descriptive error."""
  pm, bcs, sem_u, dt, k = _setup()
  m_delegated = build_schwarz_pressure_solver(sem_u, pm, bcs, dt, k,
                                              axis_name='part')
  m_direct = build_distributed_schwarz(sem_u, pm, bcs, dt, k,
                                       axis_name='part')
  assert type(m_delegated) is type(m_direct)

  sem_p = StokesSEM.create(pm, bcs, order=4, axis_name='part',
                           device_mesh=dmesh)
  p_idx = np.asarray(sem_p.pressure.pspace.mesh.node_indices)
  npn = sem_u.pressure.pspace.mesh.num_nodes
  rng = np.random.default_rng(11)
  r = rng.standard_normal(npn)
  r_sharded = jnp.asarray(r[np.clip(p_idx, 0, None)] * (p_idx != -1))
  apply_d = spmd_map(lambda m, x: m(x), dmesh, 'part')
  np.testing.assert_allclose(np.asarray(apply_d(m_delegated, r_sharded)),
                             np.asarray(apply_d(m_direct, r_sharded)),
                             rtol=1e-12, atol=1e-14)

  with pytest.raises(ValueError, match='UNPARTITIONED twin'):
    build_schwarz_pressure_solver(sem_p, pm, bcs, dt, k, axis_name='part')


def test_distributed_vertex_coarse_matches_unpartitioned(dmesh):
  """'vertex' coarse (psum of nv floats, the very-large-mesh path)."""
  pm, bcs, sem_u, dt, k = _setup()
  m_u = build_schwarz_pressure_solver(sem_u, pm.replace(partitions=None),
                                      bcs, dt, k, coarse='vertex')
  m_d = build_distributed_schwarz(sem_u, pm, bcs, dt, k, axis_name='part',
                                  coarse='vertex')
  assert m_d.coarse_kind == 'vertex'

  sem_p = StokesSEM.create(pm, bcs, order=4, axis_name='part',
                           device_mesh=dmesh)
  p_idx = np.asarray(sem_p.pressure.pspace.mesh.node_indices)
  npn = sem_u.pressure.pspace.mesh.num_nodes
  rng = np.random.default_rng(2)
  r = rng.standard_normal(npn)
  r_sharded = jnp.asarray(r[np.clip(p_idx, 0, None)] * (p_idx != -1))
  apply_d = spmd_map(lambda m, x: m(x), dmesh, 'part')
  got = np.asarray(apply_d(m_d, r_sharded))
  expected = np.asarray(m_u(jnp.asarray(r)))
  valid = p_idx != -1
  np.testing.assert_allclose(got[valid], expected[p_idx[valid]],
                             rtol=1e-10, atol=1e-12)


def test_distributed_cheb_coarse_matches_unpartitioned(dmesh):
  """'vertex-cheb' coarse (matrix-free Chebyshev, the beyond-dense path):
  partitioned apply equals the unpartitioned twin built with the same
  coarse; only the restriction's summation order differs."""
  pm, bcs, sem_u, dt, k = _setup()
  m_u = build_schwarz_pressure_solver(sem_u, pm.replace(partitions=None),
                                      bcs, dt, k, coarse='vertex-cheb')
  m_d = build_distributed_schwarz(sem_u, pm, bcs, dt, k, axis_name='part',
                                  coarse='vertex-cheb')
  assert m_u.coarse == 'vertex-cheb'
  assert m_d.coarse_kind == 'vertex-cheb'

  sem_p = StokesSEM.create(pm, bcs, order=4, axis_name='part',
                           device_mesh=dmesh)
  p_idx = np.asarray(sem_p.pressure.pspace.mesh.node_indices)
  npn = sem_u.pressure.pspace.mesh.num_nodes
  rng = np.random.default_rng(5)
  r = rng.standard_normal(npn)
  r_sharded = jnp.asarray(r[np.clip(p_idx, 0, None)] * (p_idx != -1))
  apply_d = spmd_map(lambda m, x: m(x), dmesh, 'part')
  got = np.asarray(apply_d(m_d, r_sharded))
  expected = np.asarray(m_u(jnp.asarray(r)))
  valid = p_idx != -1
  np.testing.assert_allclose(got[valid], expected[p_idx[valid]],
                             rtol=1e-8, atol=1e-10)


def test_distributed_vertex_coarse_uneven_partitions(dmesh):
  """Vertex coarse with SENTINEL-padded element slots."""
  n = 6
  parts = np.zeros((n, n), dtype=np.int64)
  parts[2:4, :] = 1
  parts[4, :] = 2
  parts[5, :] = 3                      # sizes 12 / 12 / 6 / 6
  pm = unit_cube_mesh(n, ndim=2, partitions=parts)
  bcs = {'boundary': (BCType.DIRICHLET, 0.0)}
  dt, k = 1e-2, 2
  sem_u = StokesSEM.create(pm.replace(partitions=None), bcs, order=4)
  m_u = build_schwarz_pressure_solver(sem_u, pm.replace(partitions=None),
                                      bcs, dt, k, coarse='vertex')
  m_d = build_distributed_schwarz(sem_u, pm, bcs, dt, k, axis_name='part',
                                  coarse='vertex')
  sem_p = StokesSEM.create(pm, bcs, order=4, axis_name='part',
                           device_mesh=dmesh)
  p_idx = np.asarray(sem_p.pressure.pspace.mesh.node_indices)
  npn = sem_u.pressure.pspace.mesh.num_nodes
  rng = np.random.default_rng(3)
  r = rng.standard_normal(npn)
  r_sharded = jnp.asarray(r[np.clip(p_idx, 0, None)] * (p_idx != -1))
  apply_d = spmd_map(lambda m, x: m(x), dmesh, 'part')
  got = np.asarray(apply_d(m_d, r_sharded))
  expected = np.asarray(m_u(jnp.asarray(r)))
  valid = p_idx != -1
  np.testing.assert_allclose(got[valid], expected[p_idx[valid]],
                             rtol=1e-10, atol=1e-12)


def test_partitioned_step_with_distributed_schwarz(dmesh):
  pm, bcs, sem_u, dt, k = _setup()
  m_d = build_distributed_schwarz(sem_u, pm, bcs, dt, k, axis_name='part')
  sem_p = StokesSEM.create(pm, bcs, order=4, axis_name='part',
                           device_mesh=dmesh)

  vc = np.asarray(sem_u.velocity.mesh.node_coords)
  pc = np.asarray(sem_u.pressure.pspace.mesh.node_coords)
  mask = np.asarray(sem_u.velocity.interior_mask)
  u0 = jnp.asarray(np.stack(
      [np.sin(np.pi * vc[:, 1]) * (1 - vc[:, 0] ** 2),
       np.cos(np.pi * vc[:, 0]) * 0.1], axis=-1) * mask)
  p0 = jnp.asarray(np.sin(pc[:, 0]) * np.cos(pc[:, 1]))
  us, ps = [u0, 0.9 * u0], [p0, 0.9 * p0]

  u_exp, p_exp, _ = sem_u.stokes_one_step(
      us, ps, f=0, mu=1.0, dt=dt, time_order=k, tol=1e-12, atol=1e-12)

  v_idx = np.asarray(sem_p.velocity.mesh.node_indices)
  p_idx = np.asarray(sem_p.pressure.pspace.mesh.node_indices)
  shard_v = lambda u: jnp.asarray(np.asarray(u)[np.clip(v_idx, 0, None)])
  shard_p = lambda p: jnp.asarray(np.asarray(p)[np.clip(p_idx, 0, None)])

  def step(sem, m, us, ps, f):
    return sem.stokes_one_step(us, ps, f, mu=1.0, dt=dt, time_order=k,
                               tol=1e-12, atol=1e-12,
                               pressure_preconditioner=m)

  run = spmd_map(step, dmesh, 'part')
  u_got, p_got, aux = run(sem_p, m_d, [shard_v(u) for u in us],
                          [shard_p(p) for p in ps],
                          jnp.zeros_like(shard_v(u0)))

  valid_v = v_idx != -1
  np.testing.assert_allclose(np.asarray(u_got)[valid_v],
                             np.asarray(u_exp)[v_idx[valid_v]], atol=1e-8)
  # E is singular (enclosed flow): pressures agree up to the constant
  # nullspace component, which depends on the preconditioner.
  valid_p = p_idx != -1
  got_p = np.asarray(p_got)[valid_p]
  exp_p = np.asarray(p_exp)[p_idx[valid_p]]
  np.testing.assert_allclose(got_p - got_p.mean(),
                             exp_p - exp_p.mean(), atol=1e-7)
  # The preconditioner must actually help: far fewer iterations than dofs.
  iters = int(np.asarray(aux['dp_info']['num_iterations']).max())
  assert iters < 60, iters


def test_uneven_partitions_step(dmesh):
  """Padded (SENTINEL) element slots: apply masks + nullspace projector."""
  n = 6
  parts = np.zeros((n, n), dtype=np.int64)
  parts[2:4, :] = 1
  parts[4, :] = 2
  parts[5, :] = 3                      # sizes 12 / 12 / 6 / 6
  pm = unit_cube_mesh(n, ndim=2, partitions=parts)
  bcs = {'boundary': (BCType.DIRICHLET, 0.0)}
  dt, k = 1e-2, 2
  sem_u = StokesSEM.create(pm.replace(partitions=None), bcs, order=4)
  m_d = build_distributed_schwarz(sem_u, pm, bcs, dt, k, axis_name='part')
  sem_p = StokesSEM.create(pm, bcs, order=4, axis_name='part',
                           device_mesh=dmesh)

  vc = np.asarray(sem_u.velocity.mesh.node_coords)
  pc = np.asarray(sem_u.pressure.pspace.mesh.node_coords)
  mask = np.asarray(sem_u.velocity.interior_mask)
  u0 = jnp.asarray(np.stack(
      [np.sin(np.pi * vc[:, 1]) * (1 - vc[:, 0] ** 2),
       np.cos(np.pi * vc[:, 0]) * 0.1], axis=-1) * mask)
  p0 = jnp.asarray(np.sin(pc[:, 0]) * np.cos(pc[:, 1]))
  us, ps = [u0, 0.9 * u0], [p0, 0.9 * p0]
  u_exp, p_exp, _ = sem_u.stokes_one_step(
      us, ps, f=0, mu=1.0, dt=dt, time_order=k, tol=1e-12, atol=1e-12)

  v_idx = np.asarray(sem_p.velocity.mesh.node_indices)
  p_idx = np.asarray(sem_p.pressure.pspace.mesh.node_indices)
  shard_v = lambda u: jnp.asarray(
      np.asarray(u)[np.clip(v_idx, 0, None)] * (v_idx != -1)[..., None])
  shard_p = lambda p: jnp.asarray(
      np.asarray(p)[np.clip(p_idx, 0, None)] * (p_idx != -1))

  def step(sem, m, us, ps, f):
    return sem.stokes_one_step(us, ps, f, mu=1.0, dt=dt, time_order=k,
                               tol=1e-12, atol=1e-12,
                               pressure_preconditioner=m)

  run = spmd_map(step, dmesh, 'part')
  u_got, p_got, aux = run(sem_p, m_d, [shard_v(u) for u in us],
                          [shard_p(p) for p in ps],
                          jnp.zeros_like(shard_v(u0)))
  iters = int(np.asarray(aux['dp_info']['num_iterations']).max())
  assert iters < 60, iters
  valid_v = v_idx != -1
  np.testing.assert_allclose(np.asarray(u_got)[valid_v],
                             np.asarray(u_exp)[v_idx[valid_v]], atol=1e-8)
  valid_p = p_idx != -1
  got_p = np.asarray(p_got)[valid_p]
  exp_p = np.asarray(p_exp)[p_idx[valid_p]]
  np.testing.assert_allclose(got_p - got_p.mean(),
                             exp_p - exp_p.mean(), atol=1e-7)


@pytest.mark.parametrize('overlap', [0, 1])
def test_distributed_3d_apply_matches_unpartitioned(dmesh, overlap):
  """3D hex mesh: distributed apply (incl. overlap-1 sheets) vs oracle."""
  n = 4
  parts = np.zeros((n, n, n), dtype=np.int64)
  parts[2:, :, :] += 2
  parts[:, 2:, :] += 1                 # 2x2x1 blocks of 2x2x4 elements
  pm = unit_cube_mesh(n, ndim=3, partitions=parts)
  bcs = {'boundary': (BCType.DIRICHLET, 0.0)}
  dt, k = 1e-2, 2
  sem_u = StokesSEM.create(pm.replace(partitions=None), bcs, order=3)
  m_u = build_schwarz_pressure_solver(sem_u, pm.replace(partitions=None),
                                      bcs, dt, k, overlap=overlap)
  m_d = build_distributed_schwarz(sem_u, pm, bcs, dt, k, axis_name='part',
                                  overlap=overlap)
  sem_p = StokesSEM.create(pm, bcs, order=3, axis_name='part',
                           device_mesh=device_mesh('part', 4))
  p_idx = np.asarray(sem_p.pressure.pspace.mesh.node_indices)
  npn = sem_u.pressure.pspace.mesh.num_nodes
  rng = np.random.default_rng(5)
  r = rng.standard_normal(npn)
  r_sharded = jnp.asarray(r[np.clip(p_idx, 0, None)] * (p_idx != -1))
  apply_d = spmd_map(lambda m, x: m(x), device_mesh('part', 4), 'part')
  got = np.asarray(apply_d(m_d, r_sharded))
  expected = np.asarray(m_u(jnp.asarray(r)))
  valid = p_idx != -1
  np.testing.assert_allclose(got[valid], expected[p_idx[valid]],
                             rtol=1e-10, atol=1e-12)


def test_distributed_pcg_iteration_parity(dmesh):
  """Distributed PCG iteration count matches the single-device solve."""
  from swirlfem_tpu.linalg.cg import cg, distributed_vdot

  pm, bcs, sem_u, dt, k = _setup()
  m_u = build_schwarz_pressure_solver(sem_u, pm.replace(partitions=None),
                                      bcs, dt, k)
  m_d = build_distributed_schwarz(sem_u, pm, bcs, dt, k, axis_name='part')
  sem_p = StokesSEM.create(pm, bcs, order=4, axis_name='part',
                           device_mesh=dmesh)
  p_idx = np.asarray(sem_p.pressure.pspace.mesh.node_indices)
  npn = sem_u.pressure.pspace.mesh.num_nodes

  rng = np.random.default_rng(1)
  r = rng.standard_normal(npn)
  r = r - r.mean()
  r_sharded = jnp.asarray(r[np.clip(p_idx, 0, None)] * (p_idx != -1))

  x_u, info_u = cg(lambda q: sem_u.E(q, dt=dt, time_order=k),
                   jnp.asarray(r), M=m_u, tol=1e-8)

  def solve_d(m, b):
    return cg(m.fast_matvec, b, M=m, tol=1e-8,
              dot_fn=distributed_vdot('part'))

  run = spmd_map(solve_d, dmesh, 'part')
  x_d, info_d = run(m_d, r_sharded)
  it_u = int(np.asarray(info_u['num_iterations']))
  it_d = int(np.asarray(info_d['num_iterations']).max())
  assert abs(it_d - it_u) <= 2, (it_d, it_u)
  valid = p_idx != -1
  np.testing.assert_allclose(np.asarray(x_d)[valid],
                             np.asarray(x_u)[p_idx[valid]],
                             rtol=1e-5, atol=1e-8)


def test_distributed_projection_warm_start(dmesh):
  """Fischer projection threaded through partitioned steps: parity with
  the single-device projected run + iteration drop by the third step."""
  pm, bcs, sem_u, dt, k = _setup()
  m_d = build_distributed_schwarz(sem_u, pm, bcs, dt, k, axis_name='part')
  sem_p = StokesSEM.create(pm, bcs, order=4, axis_name='part',
                           device_mesh=dmesh)

  vc = np.asarray(sem_u.velocity.mesh.node_coords)
  pc = np.asarray(sem_u.pressure.pspace.mesh.node_coords)
  mask = np.asarray(sem_u.velocity.interior_mask)
  u0 = jnp.asarray(np.stack(
      [np.sin(np.pi * vc[:, 1]) * (1 - vc[:, 0] ** 2),
       np.cos(np.pi * vc[:, 0]) * 0.1], axis=-1) * mask)
  p0 = jnp.asarray(np.sin(pc[:, 0]) * np.cos(pc[:, 1]))

  v_idx = np.asarray(sem_p.velocity.mesh.node_indices)
  p_idx = np.asarray(sem_p.pressure.pspace.mesh.node_indices)
  shard_v = lambda u: jnp.asarray(np.asarray(u)[np.clip(v_idx, 0, None)]
                                  * (v_idx != -1)[..., None])
  shard_p = lambda p: jnp.asarray(np.asarray(p)[np.clip(p_idx, 0, None)]
                                  * (p_idx != -1))

  def rollout(sem, m, us, ps, proj):
    its = []
    for _ in range(3):
      u, p, aux = sem.stokes_one_step(
          us, ps, 0.0 * us[-1], mu=1.0, dt=dt, time_order=k,
          tol=1e-8, pressure_preconditioner=m, projection_state=proj)
      us, ps = [us[-1], u], [ps[-1], p]
      proj = aux['projection_state']
      its.append(aux['dp_info']['num_iterations'])
    return us[-1], ps[-1], jnp.stack(its)

  u_exp, p_exp, its_u = rollout(sem_u, None, [u0, 0.9 * u0],
                                [p0, 0.9 * p0],
                                sem_u.initial_projection_state())

  run = spmd_map(rollout, dmesh, 'part')
  u_got, p_got, its_d = run(sem_p, m_d,
                            [shard_v(u0), shard_v(0.9 * u0)],
                            [shard_p(p0), shard_p(0.9 * p0)],
                            sem_p.initial_projection_state())
  valid_v = v_idx != -1
  np.testing.assert_allclose(np.asarray(u_got)[valid_v],
                             np.asarray(u_exp)[v_idx[valid_v]], atol=1e-6)
  its_d = np.asarray(its_d).max(axis=0)
  # Projection actually warm-starts: step-3 pressure CG beats step 1.
  assert int(its_d[2]) < int(its_d[0]), its_d
  assert int(np.asarray(its_u)[2]) < int(np.asarray(its_u)[0]), its_u


if __name__ == '__main__':
  pytest.main([__file__, '-v'])
