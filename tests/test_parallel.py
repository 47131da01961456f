"""Distributed (shard_map over virtual CPU devices) vs single-device oracles.

Reference test pattern: ``core/premesh_test.py`` /
``core/gather_scatter_test.py`` run partitioned exchange on a faked
N-device host platform; here the same idea validates the TPU-first path:
stacked arrays + NamedSharding placement + shard_map execution.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from swirlfem_tpu.core.bc import BCType
from swirlfem_tpu.core.quadrature import Nodes1D, NodeType
from swirlfem_tpu.core.refine import refine_premesh
from swirlfem_tpu.nse.solver import StokesSEM
from swirlfem_tpu.parallel.spmd import device_mesh, spmd_map
from swirlfem_tpu.utils.box import unit_cube_mesh

NUM_PARTS = 4


@pytest.fixture(scope='module')
def dmesh():
  assert jax.device_count() >= NUM_PARTS, jax.devices()
  return device_mesh('part', NUM_PARTS)


def test_partitioned_exchange_matches_unpartitioned(dmesh):
  parts = np.array([[0, 1], [2, 3]])
  pm = unit_cube_mesh(4, ndim=2, partitions=parts)
  grid = Nodes1D.create(3, NodeType.GAUSS_LOBATTO_LEGENDRE)
  refined = refine_premesh(pm, grid)

  mesh_u = refined.replace(partitions=None).finalize()
  mesh_p = refined.finalize(axis_name='part', device_mesh=dmesh)

  # Random element-local covector values; after scatter + exchange, every
  # copy of a global dof must hold the globally assembled sum.
  rng = np.random.default_rng(0)
  w_local = rng.standard_normal(
      (mesh_u.num_elements, mesh_u.num_nodes_per_element))
  expected = np.asarray(mesh_u.scatter(jnp.asarray(w_local)))

  # Distribute the element-local values to the partitions that own them.
  # Partition p's elements are those with partition id p, in original order.
  parts_per_elem = refined.partitions
  w_stacked = np.stack([
      w_local[parts_per_elem == p] for p in range(NUM_PARTS)])

  def scatter_exchange(m, w):
    return m.exchange(m.scatter(w))

  run = spmd_map(scatter_exchange, dmesh, 'part')
  out = np.asarray(run(mesh_p, jnp.asarray(w_stacked)))
  node_idx = np.asarray(mesh_p.node_indices)
  valid = node_idx != -1
  np.testing.assert_allclose(out[valid], expected[node_idx[valid]],
                             atol=1e-12)


def test_partitioned_stokes_step_matches_unpartitioned(dmesh):
  parts = np.array([[0, 1], [2, 3]])
  pm = unit_cube_mesh(6, ndim=2, periodic_dims=(1,), partitions=parts)
  coords = np.asarray(pm.node_coords)
  stretched = np.stack([2 * coords[:, 0] - 1,
                        2 * np.pi * coords[:, 1] - np.pi], axis=-1)
  pm = pm.replace(node_coords=stretched)
  bcs = {'boundary': (BCType.DIRICHLET, 0.0)}
  order, dt, k = 4, 1e-3, 2

  sem_u = StokesSEM.create(pm.replace(partitions=None), bcs, order=order)
  sem_p = StokesSEM.create(pm, bcs, order=order, axis_name='part',
                           device_mesh=dmesh)

  # Analytic-ish smooth initial data.
  vc = np.asarray(sem_u.velocity.mesh.node_coords)
  pc = np.asarray(sem_u.pressure.pspace.mesh.node_coords)
  u0 = jnp.asarray(np.stack([np.sin(vc[:, 1]) * (1 - vc[:, 0] ** 2),
                             np.cos(np.pi * vc[:, 0]) * 0.1], axis=-1))
  p0 = jnp.asarray(np.sin(pc[:, 0]) * np.cos(pc[:, 1]))
  us = [u0, 0.9 * u0]
  ps = [p0, 0.9 * p0]

  u_exp, p_exp, _ = sem_u.stokes_one_step(
      us, ps, f=0, mu=1.0, dt=dt, time_order=k, tol=1e-12, atol=1e-12)

  # Shard the state by the partitioned meshes' node index maps.
  v_idx = np.asarray(sem_p.velocity.mesh.node_indices)
  p_idx = np.asarray(sem_p.pressure.pspace.mesh.node_indices)

  def shard_v(u):
    return jnp.asarray(np.asarray(u)[np.clip(v_idx, 0, None)])

  def shard_p(p):
    return jnp.asarray(np.asarray(p)[np.clip(p_idx, 0, None)])

  def step(sem, us, ps, f):
    return sem.stokes_one_step(us, ps, f, mu=1.0, dt=dt, time_order=k,
                               tol=1e-12, atol=1e-12)

  run = spmd_map(step, dmesh, 'part')
  u_got, p_got, aux = run(sem_p, [shard_v(u) for u in us],
                          [shard_p(p) for p in ps],
                          jnp.zeros_like(shard_v(u0)))

  valid_v = v_idx != -1
  np.testing.assert_allclose(
      np.asarray(u_got)[valid_v],
      np.asarray(u_exp)[v_idx[valid_v]], atol=1e-8)
  valid_p = p_idx != -1
  np.testing.assert_allclose(
      np.asarray(p_got)[valid_p],
      np.asarray(p_exp)[p_idx[valid_p]], atol=1e-7)
  # CG diagnostics replicated across partitions.
  assert np.asarray(aux['u_star_info']['residual']).max() < 1e-12


def test_slab_periodic_partition_exchange(dmesh):
  """Periodic wrap INSIDE a partition (slab layout of a periodic box).

  Splitting only along axis 0 leaves each partition spanning the full
  axis-1 period, so the periodic images pair up within the partition.
  The reference raises on this (``swirl_fem/core/gather_scatter.py:
  349-353``); the K-slot exchange layout supports it.
  """
  n = 4
  parts = np.repeat(np.arange(2), n // 2)[:, None] * np.ones(
      (1, n), dtype=np.int64)
  pm = unit_cube_mesh(n, ndim=2, periodic_dims=(0, 1), partitions=parts)
  dm2 = device_mesh('part', 2)
  grid = Nodes1D.create(4, NodeType.GAUSS_LOBATTO_LEGENDRE)
  refined = refine_premesh(pm, grid)
  mesh_u = refined.replace(partitions=None).finalize()
  mesh_p = refined.finalize(axis_name='part', device_mesh=dm2)

  rng = np.random.default_rng(1)
  w_local = rng.standard_normal(
      (mesh_u.num_elements, mesh_u.num_nodes_per_element))
  expected = np.asarray(mesh_u.exchange(mesh_u.scatter(jnp.asarray(w_local))))
  parts_flat = refined.partitions
  w_stacked = np.stack([w_local[parts_flat == p] for p in range(2)])
  run = spmd_map(lambda m, w: m.exchange(m.scatter(w)), dm2, 'part')
  out = np.asarray(run(mesh_p, jnp.asarray(w_stacked)))
  node_idx = np.asarray(mesh_p.node_indices)
  valid = node_idx != -1
  np.testing.assert_allclose(out[valid], expected[node_idx[valid]],
                             atol=1e-12)


def test_slab_periodic_partition_step(dmesh):
  """Full NSE step on a channel-periodic box split along the OTHER axis."""
  n = 6
  parts = np.repeat(np.arange(2), n // 2)[:, None] * np.ones(
      (1, n), dtype=np.int64)
  # periodic axis 1 unsplit -> its wrap is intra-partition.
  pm = unit_cube_mesh(n, ndim=2, periodic_dims=(1,), partitions=parts)
  bcs = {'boundary': (BCType.DIRICHLET, 0.0)}
  order, dt, k = 4, 1e-3, 2
  dm2 = device_mesh('part', 2)

  sem_u = StokesSEM.create(pm.replace(partitions=None), bcs, order=order)
  sem_p = StokesSEM.create(pm, bcs, order=order, axis_name='part',
                           device_mesh=dm2)
  vc = np.asarray(sem_u.velocity.mesh.node_coords)
  pc = np.asarray(sem_u.pressure.pspace.mesh.node_coords)
  u0 = jnp.asarray(np.stack(
      [np.sin(2 * np.pi * vc[:, 1]) * (1 - (2 * vc[:, 0] - 1) ** 2),
       np.cos(2 * np.pi * vc[:, 1]) * 0.1], axis=-1))
  p0 = jnp.asarray(np.sin(2 * np.pi * pc[:, 1]) * pc[:, 0])
  us, ps = [u0, 0.9 * u0], [p0, 0.9 * p0]

  u_exp, p_exp, _ = sem_u.stokes_one_step(
      us, ps, f=0, mu=1.0, dt=dt, time_order=k, tol=1e-12, atol=1e-12)

  v_idx = np.asarray(sem_p.velocity.mesh.node_indices)
  p_idx = np.asarray(sem_p.pressure.pspace.mesh.node_indices)
  shard_v = lambda u: jnp.asarray(np.asarray(u)[np.clip(v_idx, 0, None)])
  shard_p = lambda p: jnp.asarray(np.asarray(p)[np.clip(p_idx, 0, None)])

  def step(sem, us, ps, f):
    return sem.stokes_one_step(us, ps, f, mu=1.0, dt=dt, time_order=k,
                               tol=1e-12, atol=1e-12)

  run = spmd_map(step, dm2, 'part')
  u_got, p_got, _ = run(sem_p, [shard_v(u) for u in us],
                        [shard_p(p) for p in ps],
                        jnp.zeros_like(shard_v(u0)))
  valid_v = v_idx != -1
  np.testing.assert_allclose(np.asarray(u_got)[valid_v],
                             np.asarray(u_exp)[v_idx[valid_v]], atol=1e-8)
  valid_p = p_idx != -1
  np.testing.assert_allclose(np.asarray(p_got)[valid_p],
                             np.asarray(p_exp)[p_idx[valid_p]], atol=1e-7)


def test_shard_nodal_conventions(dmesh):
  """mesh.shard_nodal/unshard_nodal: field roundtrip + covector assembly."""
  parts = np.array([[0, 1], [2, 3]])
  pm = unit_cube_mesh(4, ndim=2, periodic_dims=(1,), partitions=parts)
  grid = Nodes1D.create(4, NodeType.GAUSS_LOBATTO_LEGENDRE)
  refined = refine_premesh(pm, grid)
  mesh_p = refined.finalize(axis_name='part', device_mesh=dmesh)
  mesh_u = refined.replace(partitions=None).finalize()

  # Global arrays live in the DEDUPED id space of the partitioned map
  # (which has holes where periodic slave ids were folded away).
  idx_p = np.asarray(mesh_p.node_indices)
  num_global = int(idx_p.max()) + 1
  present = np.zeros(num_global, dtype=bool)
  present[idx_p[idx_p != -1]] = True
  rng = np.random.default_rng(0)
  g = rng.standard_normal((num_global, 2)) * present[:, None]

  sh = mesh_p.shard_nodal(g, 'field')
  np.testing.assert_allclose(mesh_p.unshard_nodal(np.asarray(sh)), g,
                             atol=0)
  # Covector split: exchanging the covector shard reassembles the full
  # values at every copy (= the field shard).
  cov = mesh_p.shard_nodal(g, 'covector')
  ex = spmd_map(lambda m, x: jax.vmap(m.exchange, in_axes=-1, out_axes=-1)(x),
                dmesh, 'part')(mesh_p, cov)
  np.testing.assert_allclose(np.asarray(ex), np.asarray(sh), atol=1e-12)
  with pytest.raises(ValueError):
    mesh_u.shard_nodal(g)


def test_partitioned_step_gradient_matches_unpartitioned(dmesh):
  """Training-path parity: d(loss)/d(forcing scale) through the partitioned
  generic step equals the single-device gradient (and finite differences).

  Exercises the custom_linear_solve TRANSPOSE solves of both CGs under
  shard_map, including the floor-guard checkpoint logic."""
  parts = np.array([[0, 1], [2, 3]])
  pm = unit_cube_mesh(4, ndim=2, partitions=parts)
  coords = np.asarray(pm.node_coords)
  warped = np.stack([coords[:, 0] + 0.05 * np.sin(np.pi * coords[:, 1]),
                     coords[:, 1]], axis=-1)
  pm = pm.replace(node_coords=warped)
  bcs = {'boundary': (BCType.DIRICHLET, 0.0)}
  mu, dt, k = 1.0, 1e-2, 2

  sem_u = StokesSEM.create(pm.replace(partitions=None), bcs, order=4)
  sem_p = StokesSEM.create(pm, bcs, order=4, axis_name='part',
                           device_mesh=dmesh)
  vc = np.asarray(sem_u.velocity.mesh.node_coords)
  mask = np.asarray(sem_u.velocity.interior_mask)
  u0 = jnp.asarray(np.stack(
      [np.sin(np.pi * vc[:, 1]) * vc[:, 0] * (1 - vc[:, 0]),
       np.cos(np.pi * vc[:, 0]) * 0.1], axis=-1) * mask)
  p0 = jnp.zeros(sem_u.pressure.pspace.mesh.num_nodes)

  def loss_u(theta):
    u, _, _ = sem_u.stokes_one_step(
        [u0, 0.9 * u0], [p0, p0], theta * u0, mu=mu, dt=dt, time_order=k,
        tol=1e-12, atol=1e-12)
    return jnp.vdot(u, u)

  v_idx = np.asarray(sem_p.velocity.mesh.node_indices)
  p_idx = np.asarray(sem_p.pressure.pspace.mesh.node_indices)
  valid_v = (v_idx != -1)
  shard_v = lambda u: jnp.asarray(np.asarray(u)[np.clip(v_idx, 0, None)]
                                  * valid_v[..., None])
  shard_p = lambda p: jnp.asarray(np.asarray(p)[np.clip(p_idx, 0, None)]
                                  * (p_idx != -1))
  u0_sh, p0_sh = shard_v(u0), shard_p(p0)
  # Per-copy weights so the distributed loss counts each global dof once.
  mult = np.zeros(sem_u.velocity.mesh.num_nodes)
  np.add.at(mult, v_idx[valid_v], 1.0)
  w_sh = jnp.asarray((valid_v / np.maximum(mult[np.clip(v_idx, 0, None)],
                                           1.0))[..., None])
  # The forcing is a COVECTOR: shared dofs must be split among copies
  # (full values at every copy would double-count in the assembly).
  f_base_sh = w_sh * u0_sh

  def step_loss(sem, us, ps, f, w):
    u, _, _ = sem.stokes_one_step(us, ps, f, mu=mu, dt=dt, time_order=k,
                                  tol=1e-12, atol=1e-12)
    return jax.lax.psum(jnp.vdot(jnp.sqrt(w) * u, jnp.sqrt(w) * u), 'part')

  run = spmd_map(step_loss, dmesh, 'part')

  def loss_p(theta):
    return run(sem_p, [u0_sh, 0.9 * u0_sh], [p0_sh, p0_sh],
               theta * f_base_sh, w_sh)[0]

  theta = 0.2
  g_u = float(jax.grad(loss_u)(theta))
  g_p = float(jax.grad(loss_p)(theta))
  eps = 1e-6
  fd = float((loss_u(theta + eps) - loss_u(theta - eps)) / (2 * eps))
  np.testing.assert_allclose(g_u, fd, rtol=1e-6)
  np.testing.assert_allclose(g_p, g_u, rtol=1e-9)


def test_partitioned_step_f32_below_floor(dmesh):
  """f32 partitioned step at tol far below the f32 floor (TPU regime).

  Exercises the full below-floor protection stack: bitwise-consistent
  exchange (copies cannot wander in the redundant kernel), the CG
  breakdown guard, and the true-residual checkpoint guard.  The result
  must be floor-accurate against the f64 oracle, not garbage."""
  parts = np.array([[0, 1], [2, 3]])
  pm = unit_cube_mesh(4, ndim=2, partitions=parts)
  coords = np.asarray(pm.node_coords)
  warped = np.stack([coords[:, 0] + 0.05 * np.sin(np.pi * coords[:, 1]),
                     coords[:, 1]], axis=-1)
  pm = pm.replace(node_coords=warped)
  bcs = {'boundary': (BCType.DIRICHLET, 0.0)}
  mu, dt, k = 1.0, 1e-2, 2

  sem_u = StokesSEM.create(pm.replace(partitions=None), bcs, order=4)
  sem_p64 = StokesSEM.create(pm, bcs, order=4, axis_name='part',
                             device_mesh=dmesh)
  to32 = lambda t: jax.tree.map(
      lambda x: x.astype(jnp.float32)
      if jnp.issubdtype(x.dtype, jnp.floating) else x, t)
  sem_p = to32(sem_p64)

  vc = np.asarray(sem_u.velocity.mesh.node_coords)
  mask = np.asarray(sem_u.velocity.interior_mask)
  u0 = jnp.asarray(np.stack(
      [np.sin(np.pi * vc[:, 1]) * vc[:, 0] * (1 - vc[:, 0]),
       np.cos(np.pi * vc[:, 0]) * 0.1], axis=-1) * mask)
  p0 = jnp.zeros(sem_u.pressure.pspace.mesh.num_nodes)

  u_exp, _, _ = sem_u.stokes_one_step(
      [u0, 0.9 * u0], [p0, p0], 0.0 * u0, mu=mu, dt=dt, time_order=k,
      tol=1e-13, atol=1e-13)

  v_idx = np.asarray(sem_p.velocity.mesh.node_indices)
  p_idx = np.asarray(sem_p.pressure.pspace.mesh.node_indices)
  u0_sh = sem_p64.velocity.mesh.shard_nodal(np.asarray(u0)).astype(
      jnp.float32)
  p0_sh = jnp.zeros(p_idx.shape, jnp.float32)

  def step(sem, us, ps, f):
    # tol 1e-12 is far below the attainable f32 floor: the solve must
    # stop at the floor and return the best iterate.
    return sem.stokes_one_step(us, ps, f, mu=mu, dt=dt, time_order=k,
                               tol=1e-12, atol=1e-12)

  run = spmd_map(step, dmesh, 'part')
  u_got, _, _ = run(sem_p, [u0_sh, jnp.float32(0.9) * u0_sh],
                    [p0_sh, p0_sh], jnp.zeros_like(u0_sh))
  valid_v = v_idx != -1
  err = np.abs(np.asarray(u_got)[valid_v]
               - np.asarray(u_exp)[v_idx[valid_v]]).max()
  scale = np.abs(np.asarray(u_exp)).max()
  assert err < 2e-4 * max(scale, 1.0), (err, scale)


def test_partitioned_3d_step_matches_unpartitioned(dmesh):
  """Full 3D NSE step on a partitioned hex mesh vs the single-device
  oracle (the 3D distributed generic path end-to-end)."""
  n = 4
  parts = np.zeros((n, n, n), dtype=np.int64)
  parts[2:, :, :] += 2
  parts[:, 2:, :] += 1
  pm = unit_cube_mesh(n, ndim=3, partitions=parts)
  bcs = {'boundary': (BCType.DIRICHLET, 0.0)}
  order, dt, k = 3, 1e-2, 2

  sem_u = StokesSEM.create(pm.replace(partitions=None), bcs, order=order)
  sem_p = StokesSEM.create(pm, bcs, order=order, axis_name='part',
                           device_mesh=dmesh)
  vc = np.asarray(sem_u.velocity.mesh.node_coords)
  pc = np.asarray(sem_u.pressure.pspace.mesh.node_coords)
  mask = np.asarray(sem_u.velocity.interior_mask)
  u0 = jnp.asarray(np.stack(
      [np.sin(np.pi * vc[:, 1]) * vc[:, 0] * (1 - vc[:, 0]),
       np.cos(np.pi * vc[:, 2]) * 0.1,
       np.sin(np.pi * vc[:, 0]) * vc[:, 2] * (1 - vc[:, 2]) * 0.2],
      axis=-1) * mask)
  p0 = jnp.asarray(np.sin(pc[:, 0]) * np.cos(pc[:, 1]) * pc[:, 2])
  us, ps = [u0, 0.9 * u0], [p0, 0.9 * p0]

  u_exp, p_exp, _ = sem_u.stokes_one_step(
      us, ps, f=0, mu=1.0, dt=dt, time_order=k, tol=1e-11, atol=1e-11)

  v_idx = np.asarray(sem_p.velocity.mesh.node_indices)
  p_idx = np.asarray(sem_p.pressure.pspace.mesh.node_indices)
  shard_v = lambda u: sem_p.velocity.mesh.shard_nodal(np.asarray(u))
  shard_p = lambda p: sem_p.pressure.pspace.mesh.shard_nodal(np.asarray(p))

  def step(sem, us, ps, f):
    return sem.stokes_one_step(us, ps, f, mu=1.0, dt=dt, time_order=k,
                               tol=1e-11, atol=1e-11)

  run = spmd_map(step, dmesh, 'part')
  u_got, p_got, _ = run(sem_p, [shard_v(u) for u in us],
                        [shard_p(p) for p in ps],
                        jnp.zeros_like(shard_v(u0)))
  valid_v = v_idx != -1
  np.testing.assert_allclose(np.asarray(u_got)[valid_v],
                             np.asarray(u_exp)[v_idx[valid_v]], atol=1e-7)
  valid_p = p_idx != -1
  got_p = np.asarray(p_got)[valid_p]
  exp_p = np.asarray(p_exp)[p_idx[valid_p]]
  np.testing.assert_allclose(got_p - got_p.mean(),
                             exp_p - exp_p.mean(), atol=1e-6)


@pytest.mark.smoke
def test_spmd_map_psum():
  dmesh = device_mesh('x', 8)
  f = spmd_map(lambda v: jax.lax.psum(v, 'x'), dmesh, 'x')
  out = np.asarray(f(jnp.arange(8.0)))
  np.testing.assert_allclose(out, np.full(8, 28.0))


def test_repartition_element_fields(dmesh):
  """Crystal-routed load rebalancing matches host re-grouping exactly."""
  from swirlfem_tpu.parallel.repartition import partition_layout
  from swirlfem_tpu.parallel.repartition import repartition_element_fields

  rng = np.random.default_rng(3)
  num_elements = 37  # deliberately uneven across 4 partitions
  old_parts = rng.integers(0, NUM_PARTS, num_elements)
  new_parts = rng.integers(0, NUM_PARTS, num_elements)

  old_ids, old_counts = partition_layout(old_parts, NUM_PARTS)
  data = rng.standard_normal((num_elements, 5))
  # Stack fields into the old layout (canonical ascending-gid order).
  stacked = np.zeros((NUM_PARTS, old_ids.shape[1], 5))
  for p in range(NUM_PARTS):
    stacked[p, :old_counts[p]] = data[old_ids[p, :old_counts[p]]]

  fields = {'u': jnp.asarray(stacked), 'w': jnp.asarray(2.0 * stacked)}
  out, counts = repartition_element_fields(
      dmesh, 'part', old_parts, new_parts, fields)

  new_ids, new_counts = partition_layout(new_parts, NUM_PARTS)
  np.testing.assert_array_equal(np.asarray(counts), new_counts)
  for p in range(NUM_PARTS):
    got = np.asarray(out['u'])[p, :new_counts[p]]
    np.testing.assert_allclose(got, data[new_ids[p, :new_counts[p]]],
                               atol=0)
    got_w = np.asarray(out['w'])[p, :new_counts[p]]
    np.testing.assert_allclose(got_w,
                               2.0 * data[new_ids[p, :new_counts[p]]],
                               atol=0)
