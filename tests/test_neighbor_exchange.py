"""Neighbor-limited exchange (matched ppermute rounds) vs the psum oracle.

The psum-based exchange reproduces the reference's communication pattern
(``swirl_fem/core/gather_scatter.py:241-248``: allreduce over ALL shared
dofs); the neighbor schedule must match it to rounding while moving only
interface-proportional payloads, and must preserve the bitwise
copy-consistency that distributed CG depends on.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from swirlfem_tpu.core import topology
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


def _exchange_case(refined, dmesh, num_parts, seed=0, mode='neighbors'):
  """Runs scatter+exchange in neighbor/owner mode; returns
  (out, oracle, mesh)."""
  mesh_u = refined.replace(partitions=None).finalize()
  mesh_n = refined.finalize(axis_name='part', device_mesh=dmesh,
                            exchange_mode=mode)
  assert mesh_n.exchange_neighbors is not None

  rng = np.random.default_rng(seed)
  w_local = rng.standard_normal(
      (mesh_u.num_elements, mesh_u.num_nodes_per_element))
  expected = np.asarray(mesh_u.exchange(mesh_u.scatter(jnp.asarray(w_local))))
  parts_per_elem = refined.partitions
  w_stacked = np.stack([
      w_local[parts_per_elem == p] for p in range(num_parts)])
  run = spmd_map(lambda m, w: m.exchange(m.scatter(w)), dmesh, 'part')
  out = np.asarray(run(mesh_n, jnp.asarray(w_stacked)))
  return out, expected, mesh_n


def _assert_exchange_parity(out, expected, mesh_n):
  node_idx = np.asarray(mesh_n.node_indices)
  valid = node_idx != -1
  np.testing.assert_allclose(out[valid], expected[node_idx[valid]],
                             atol=1e-12)
  # Bitwise copy-consistency: every copy of a shared dof must hold the
  # IDENTICAL bits (the fixed sharer-ordinal summation order), or CG's
  # beta chain amplifies the discrepancy once a solve hits its floor.
  flat_ids = node_idx[valid]
  flat_vals = out[valid]
  order = np.argsort(flat_ids, kind='stable')
  ids, vals = flat_ids[order], flat_vals[order]
  starts = np.searchsorted(ids, np.unique(ids))
  firsts = vals[starts][np.searchsorted(np.unique(ids), ids)]
  np.testing.assert_array_equal(vals, firsts)


def test_neighbor_exchange_matches_psum_2d(dmesh):
  parts = np.array([[0, 1], [2, 3]])
  pm = unit_cube_mesh(4, ndim=2, partitions=parts)
  grid = Nodes1D.create(4, NodeType.GAUSS_LOBATTO_LEGENDRE)
  refined = refine_premesh(pm, grid)
  out, expected, mesh_n = _exchange_case(refined, dmesh, NUM_PARTS)
  _assert_exchange_parity(out, expected, mesh_n)
  nt = mesh_n.exchange_neighbors
  # 2x2 blocks: 4 edge pairs + 2 diagonal (corner) pairs, K=4 at the center.
  assert nt.num_ordinals == 4
  assert nt.neighbor_payload < nt.psum_payload


def test_neighbor_exchange_periodic_intra_partition(dmesh):
  """Slab layout of a doubly periodic box: the unsplit axis wraps INSIDE
  each partition (K-slot ragged layout) while the split axis wraps across
  the first/last partitions — both must survive neighbor mode."""
  n = 4
  parts = np.repeat(np.arange(NUM_PARTS), n // NUM_PARTS if n >= NUM_PARTS
                    else 1)[:n][:, None] * np.ones((1, n), dtype=np.int64)
  pm = unit_cube_mesh(n, ndim=2, periodic_dims=(0, 1), partitions=parts)
  grid = Nodes1D.create(4, NodeType.GAUSS_LOBATTO_LEGENDRE)
  refined = refine_premesh(pm, grid)
  out, expected, mesh_n = _exchange_case(refined, dmesh, NUM_PARTS, seed=1)
  _assert_exchange_parity(out, expected, mesh_n)


def test_neighbor_exchange_3d_corners(dmesh):
  """3D 4-way partitioning with edge/corner dofs shared by >2 partitions."""
  n = 4
  parts = np.zeros((n, n, n), dtype=np.int64)
  parts[n // 2:, :, :] += 2
  parts[:, n // 2:, :] += 1
  pm = unit_cube_mesh(n, ndim=3, partitions=parts)
  grid = Nodes1D.create(3, NodeType.GAUSS_LOBATTO_LEGENDRE)
  refined = refine_premesh(pm, grid)
  out, expected, mesh_n = _exchange_case(refined, dmesh, NUM_PARTS, seed=2)
  _assert_exchange_parity(out, expected, mesh_n)
  assert mesh_n.exchange_neighbors.num_ordinals == 4


def test_neighbor_step_and_gradient_match_unpartitioned(dmesh):
  """Full NSE step + training-path gradient with neighbor-mode exchange
  inside every CG iteration, vs the single-device oracle."""
  parts = np.array([[0, 1], [2, 3]])
  pm = unit_cube_mesh(4, ndim=2, partitions=parts)
  coords = np.asarray(pm.node_coords)
  warped = np.stack([coords[:, 0] + 0.05 * np.sin(np.pi * coords[:, 1]),
                     coords[:, 1]], axis=-1)
  pm = pm.replace(node_coords=warped)
  bcs = {'boundary': (BCType.DIRICHLET, 0.0)}
  mu, dt, k = 1.0, 1e-2, 2

  sem_u = StokesSEM.create(pm.replace(partitions=None), bcs, order=4)
  sem_n = StokesSEM.create(pm, bcs, order=4, axis_name='part',
                           device_mesh=dmesh, exchange_mode='neighbors')
  assert sem_n.velocity.mesh.exchange_neighbors is not None

  vc = np.asarray(sem_u.velocity.mesh.node_coords)
  mask = np.asarray(sem_u.velocity.interior_mask)
  u0 = jnp.asarray(np.stack(
      [np.sin(np.pi * vc[:, 1]) * vc[:, 0] * (1 - vc[:, 0]),
       np.cos(np.pi * vc[:, 0]) * 0.1], axis=-1) * mask)
  p0 = jnp.zeros(sem_u.pressure.pspace.mesh.num_nodes)

  u_exp, p_exp, _ = sem_u.stokes_one_step(
      [u0, 0.9 * u0], [p0, p0], 0.0 * u0, mu=mu, dt=dt, time_order=k,
      tol=1e-12, atol=1e-12)

  v_idx = np.asarray(sem_n.velocity.mesh.node_indices)
  p_idx = np.asarray(sem_n.pressure.pspace.mesh.node_indices)
  u0_sh = sem_n.velocity.mesh.shard_nodal(np.asarray(u0))
  p0_sh = jnp.zeros(p_idx.shape)

  def step(sem, us, ps, f):
    return sem.stokes_one_step(us, ps, f, mu=mu, dt=dt, time_order=k,
                               tol=1e-12, atol=1e-12)

  run = spmd_map(step, dmesh, 'part')
  u_got, p_got, _ = run(sem_n, [u0_sh, 0.9 * u0_sh], [p0_sh, p0_sh],
                        jnp.zeros_like(u0_sh))
  valid_v, valid_p = v_idx != -1, p_idx != -1
  np.testing.assert_allclose(np.asarray(u_got)[valid_v],
                             np.asarray(u_exp)[v_idx[valid_v]], atol=1e-8)
  np.testing.assert_allclose(np.asarray(p_got)[valid_p],
                             np.asarray(p_exp)[p_idx[valid_p]], atol=1e-7)

  # Gradient through the neighbor-mode distributed solve (ppermute
  # transposes inside the custom_linear_solve transpose solves).
  f_base_sh = sem_n.velocity.mesh.shard_nodal(np.asarray(u0), 'covector')

  def loss_u(theta):
    u, _, _ = sem_u.stokes_one_step(
        [u0, 0.9 * u0], [p0, p0], theta * u0, mu=mu, dt=dt, time_order=k,
        tol=1e-12, atol=1e-12)
    return jnp.vdot(u, u)

  mult = np.zeros(sem_u.velocity.mesh.num_nodes)
  np.add.at(mult, v_idx[valid_v], 1.0)
  w_sh = jnp.asarray((valid_v / np.maximum(mult[np.clip(v_idx, 0, None)],
                                           1.0))[..., None])

  def step_loss(sem, us, ps, f, w):
    u, _, _ = sem.stokes_one_step(us, ps, f, mu=mu, dt=dt, time_order=k,
                                  tol=1e-12, atol=1e-12)
    return jax.lax.psum(jnp.vdot(jnp.sqrt(w) * u, jnp.sqrt(w) * u), 'part')

  run_l = spmd_map(step_loss, dmesh, 'part')

  def loss_n(theta):
    return run_l(sem_n, [u0_sh, 0.9 * u0_sh], [p0_sh, p0_sh],
                 theta * f_base_sh, w_sh)[0]

  theta = 0.2
  g_u = float(jax.grad(loss_u)(theta))
  g_n = float(jax.grad(loss_n)(theta))
  np.testing.assert_allclose(g_n, g_u, rtol=1e-9)


def test_neighbor_payload_scaling():
  """On a slab-partitioned box the psum payload grows with P while the
  neighbor payload stays interface-proportional."""
  n, num_parts = 16, 8
  parts = np.repeat(np.arange(num_parts), n // num_parts)[:, None] * np.ones(
      (1, n), dtype=np.int64)
  pm = unit_cube_mesh(n, ndim=2, partitions=parts)
  grid = Nodes1D.create(5, NodeType.GAUSS_LOBATTO_LEGENDRE)
  refined = refine_premesh(pm, grid)
  mesh_n = refined.finalize(axis_name='part', exchange_mode='neighbors')
  nt = mesh_n.exchange_neighbors
  # 7 interior interfaces x 65 dofs each = 455 shared dofs; each partition
  # talks to <=2 neighbors of 65 dofs each.
  assert nt.psum_payload == 455, nt.psum_payload
  assert nt.neighbor_payload == 130, nt.neighbor_payload
  assert len(nt.perms) == 2


def test_build_neighbor_exchange_unpartitioned_returns_none():
  gi = np.arange(5, dtype=np.int32)
  assert topology.build_neighbor_exchange(gi, None) is None
  assert topology.build_owner_exchange(gi, None) is None


# ---- Owner-based two-round exchange (VERDICT r4 #5) ----


def test_owner_exchange_matches_psum_2d(dmesh):
  """The 2-collective owner schedule vs the psum oracle, incl. the K=4
  center corner, plus copy-IDENTITY of every shared total."""
  parts = np.array([[0, 1], [2, 3]])
  pm = unit_cube_mesh(4, ndim=2, partitions=parts)
  grid = Nodes1D.create(4, NodeType.GAUSS_LOBATTO_LEGENDRE)
  refined = refine_premesh(pm, grid)
  out, expected, mesh_n = _exchange_case(refined, dmesh, NUM_PARTS,
                                         mode='owner')
  _assert_exchange_parity(out, expected, mesh_n)
  ot = mesh_n.exchange_neighbors
  assert isinstance(ot, topology.OwnerExchange)
  assert ot.num_ordinals == 4
  # A dof with K sharers moves 2(K-1) values instead of K(K-1): the true
  # (ragged) payload is bounded by 2(K_max - 1) per shared dof.
  assert ot.true_payload <= 2 * (ot.num_ordinals - 1) * ot.psum_payload


def test_owner_exchange_periodic_intra_partition(dmesh):
  n = 4
  parts = np.repeat(np.arange(NUM_PARTS), n // NUM_PARTS if n >= NUM_PARTS
                    else 1)[:n][:, None] * np.ones((1, n), dtype=np.int64)
  pm = unit_cube_mesh(n, ndim=2, periodic_dims=(0, 1), partitions=parts)
  grid = Nodes1D.create(4, NodeType.GAUSS_LOBATTO_LEGENDRE)
  refined = refine_premesh(pm, grid)
  out, expected, mesh_n = _exchange_case(refined, dmesh, NUM_PARTS, seed=1,
                                         mode='owner')
  _assert_exchange_parity(out, expected, mesh_n)


def test_owner_exchange_3d_corners(dmesh):
  n = 4
  parts = np.zeros((n, n, n), dtype=np.int64)
  parts[n // 2:, :, :] += 2
  parts[:, n // 2:, :] += 1
  pm = unit_cube_mesh(n, ndim=3, partitions=parts)
  grid = Nodes1D.create(3, NodeType.GAUSS_LOBATTO_LEGENDRE)
  refined = refine_premesh(pm, grid)
  out, expected, mesh_n = _exchange_case(refined, dmesh, NUM_PARTS, seed=2,
                                         mode='owner')
  _assert_exchange_parity(out, expected, mesh_n)
  assert mesh_n.exchange_neighbors.num_ordinals == 4


def test_owner_step_and_gradient_match_unpartitioned(dmesh):
  """Full NSE step + gradient with the owner-mode exchange inside every CG
  iteration (all_to_all transposes to all_to_all inside the
  custom_linear_solve transpose solves)."""
  parts = np.array([[0, 1], [2, 3]])
  pm = unit_cube_mesh(4, ndim=2, partitions=parts)
  coords = np.asarray(pm.node_coords)
  warped = np.stack([coords[:, 0] + 0.05 * np.sin(np.pi * coords[:, 1]),
                     coords[:, 1]], axis=-1)
  pm = pm.replace(node_coords=warped)
  bcs = {'boundary': (BCType.DIRICHLET, 0.0)}
  mu, dt, k = 1.0, 1e-2, 2

  sem_u = StokesSEM.create(pm.replace(partitions=None), bcs, order=4)
  sem_n = StokesSEM.create(pm, bcs, order=4, axis_name='part',
                           device_mesh=dmesh, exchange_mode='owner')
  assert isinstance(sem_n.velocity.mesh.exchange_neighbors,
                    topology.OwnerExchange)

  vc = np.asarray(sem_u.velocity.mesh.node_coords)
  mask = np.asarray(sem_u.velocity.interior_mask)
  u0 = jnp.asarray(np.stack(
      [np.sin(np.pi * vc[:, 1]) * vc[:, 0] * (1 - vc[:, 0]),
       np.cos(np.pi * vc[:, 0]) * 0.1], axis=-1) * mask)
  p0 = jnp.zeros(sem_u.pressure.pspace.mesh.num_nodes)

  u_exp, p_exp, _ = sem_u.stokes_one_step(
      [u0, 0.9 * u0], [p0, p0], 0.0 * u0, mu=mu, dt=dt, time_order=k,
      tol=1e-12, atol=1e-12)

  v_idx = np.asarray(sem_n.velocity.mesh.node_indices)
  p_idx = np.asarray(sem_n.pressure.pspace.mesh.node_indices)
  u0_sh = sem_n.velocity.mesh.shard_nodal(np.asarray(u0))
  p0_sh = jnp.zeros(p_idx.shape)

  def step(sem, us, ps, f):
    return sem.stokes_one_step(us, ps, f, mu=mu, dt=dt, time_order=k,
                               tol=1e-12, atol=1e-12)

  run = spmd_map(step, dmesh, 'part')
  u_got, p_got, _ = run(sem_n, [u0_sh, 0.9 * u0_sh], [p0_sh, p0_sh],
                        jnp.zeros_like(u0_sh))
  valid_v, valid_p = v_idx != -1, p_idx != -1
  np.testing.assert_allclose(np.asarray(u_got)[valid_v],
                             np.asarray(u_exp)[v_idx[valid_v]], atol=1e-8)
  np.testing.assert_allclose(np.asarray(p_got)[valid_p],
                             np.asarray(p_exp)[p_idx[valid_p]], atol=1e-7)

  f_base_sh = sem_n.velocity.mesh.shard_nodal(np.asarray(u0), 'covector')

  def loss_u(theta):
    u, _, _ = sem_u.stokes_one_step(
        [u0, 0.9 * u0], [p0, p0], theta * u0, mu=mu, dt=dt, time_order=k,
        tol=1e-12, atol=1e-12)
    return jnp.vdot(u, u)

  mult = np.zeros(sem_u.velocity.mesh.num_nodes)
  np.add.at(mult, v_idx[valid_v], 1.0)
  w_sh = jnp.asarray((valid_v / np.maximum(mult[np.clip(v_idx, 0, None)],
                                           1.0))[..., None])

  def step_loss(sem, us, ps, f, w):
    u, _, _ = sem.stokes_one_step(us, ps, f, mu=mu, dt=dt, time_order=k,
                                  tol=1e-12, atol=1e-12)
    return jax.lax.psum(jnp.vdot(jnp.sqrt(w) * u, jnp.sqrt(w) * u), 'part')

  run_l = spmd_map(step_loss, dmesh, 'part')

  def loss_n(theta):
    return run_l(sem_n, [u0_sh, 0.9 * u0_sh], [p0_sh, p0_sh],
                 theta * f_base_sh, w_sh)[0]

  theta = 0.2
  g_u = float(jax.grad(loss_u)(theta))
  g_n = float(jax.grad(loss_n)(theta))
  np.testing.assert_allclose(g_n, g_u, rtol=1e-9)


def test_owner_payload_vs_pairwise():
  """Owner traffic accounting: 2 collective rounds always; true payload
  <= the pairwise schedule's for K>2 sharer groups (corners)."""
  parts = np.array([[0, 1], [2, 3]])
  pm = unit_cube_mesh(4, ndim=2, partitions=parts)
  grid = Nodes1D.create(4, NodeType.GAUSS_LOBATTO_LEGENDRE)
  refined = refine_premesh(pm, grid)
  mesh_o = refined.finalize(axis_name='part', exchange_mode='owner')
  mesh_n = refined.finalize(axis_name='part', exchange_mode='neighbors')
  ot, nt = mesh_o.exchange_neighbors, mesh_n.exchange_neighbors
  # Pairwise: every pair round-trips its shared list -> 2x per-device sum
  # of pair widths aggregated over pairs; owner: 2(K-1) values per dof.
  pairwise_total = 2 * sum(
      int((np.asarray(r) != topology.SENTINEL).sum())
      for r in nt.send_ranks)
  assert ot.true_payload <= pairwise_total
  assert len(nt.perms) >= 3  # >= 3 colored rounds on the 2x2 block...
  # ...vs always exactly 2 collectives for the owner schedule (the claim
  # the ICI cost model charges: latency ~ 2 rounds per exchange).
