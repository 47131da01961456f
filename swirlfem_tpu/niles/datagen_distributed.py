"""Distributed DNS data generation: Kolmogorov flow on a device mesh.

The single-device datagen (``niles/datagen.py``, reference parity
``swirl_fem/niles/datagen/datagen.py:48-196``) runs the whole element grid
on one chip.  This module shards the SAME workload over a 1D device-mesh
axis via :class:`swirlfem_tpu.nse.distributed.DistributedStokesBox`: states
stay in element-local E-last form sharded by element slabs, each time step
runs the ppermute-halo fractional step with the slab-decomposed exact FDM
solves, and whole cycles execute in one dispatch (a ``lax.scan`` over the
sharded step).  Snapshots are gathered to the host once per cycle and
written to the same HDF5 shard format the input pipeline reads.

This is the framework's large-mesh scaling story applied to its production
data workload: the reference can only generate DNS on one accelerator
(its ``jax.pmap`` domain decomposition is never wired into datagen).
"""

from __future__ import annotations

import os
import time

from absl import logging
import jax
import jax.numpy as jnp
import numpy as np

from swirlfem_tpu.niles import datagen
from swirlfem_tpu.nse import solver as navier_stokes
from swirlfem_tpu.nse.distributed import DistributedStokesBox
from swirlfem_tpu.parallel.spmd import device_mesh
from swirlfem_tpu.utils.box import unit_cube_mesh


def make_distributed_step_fn(dist: DistributedStokesBox,
                             cfg: datagen.DatagenConfig):
  """Jitted whole-cycle advance on sharded el states.

  Mirrors ``datagen.make_step_fn``'s el-mode branch: extrapolated
  dealiased convection + Kolmogorov body forcing - drag, assembled as a
  mass-weighted el covector, then the distributed fractional step with
  exact FDM solves.
  """
  sem = dist.sem
  cfg_mu = 1.0 / cfg.reynolds_number
  ext = [float(c) for c in navier_stokes.extk_coeffs(k=cfg.time_order - 1)]
  tmap = jax.tree_util.tree_map

  info = sem.fast_ops.vinfo
  kk = info.order + 1
  n = info.num_elements_per_dim
  eshape = (n,) * info.ndim
  coords = sem.velocity.mesh.node_coords
  wmass_el = dist._put_el(  # pylint: disable=protected-access
      sem.fast_ops.wmass.reshape((kk,) * info.ndim + eshape))
  fbody_el = dist.velocity_to_el(
      (jnp.sin(2 * jnp.pi * cfg.forcing_wavenumber * coords[..., 1]),))[0]

  step = dist.make_step(mu=cfg_mu, dt=cfg.dt, time_order=cfg.time_order,
                        tol=1e-5, atol=1e-4, preconditioner='fdm',
                        exact_solves=True)
  conv = dist.make_advection()

  @jax.jit
  def advance(us, ps, cus):
    """One cycle in one dispatch, returning strided snapshot frames."""

    def body(carry, _):
      us, ps, cus = carry
      cu = tmap(lambda *xs: sum(e * x for e, x in zip(ext[::-1], xs[::-1])),
                *cus)
      f_el = datagen.kolmogorov_el_forcing(cfg, wmass_el, fbody_el,
                                           us[-1], cu)
      u, p, _ = step(list(us), list(ps), f_el)
      return (us[1:] + (u,), ps[1:] + (p,), cus[1:] + (conv(u),)), None

    def outer(carry, _):
      carry, _ = jax.lax.scan(body, carry, None, length=cfg.snapshot_every)
      us, ps, _ = carry
      return carry, (us[-1], ps[-1])

    carry, frames = jax.lax.scan(
        outer, (us, ps, cus), None,
        length=cfg.num_steps_per_cycle // cfg.snapshot_every)
    return carry, frames

  return advance


def run_simulation_distributed(workdir: str,
                               cfg: datagen.DatagenConfig | None = None,
                               axis_name: str = 'space',
                               num_devices: int | None = None):
  """Full distributed DNS run; shard format matches `datagen`."""
  import h5py

  cfg = cfg or datagen.DatagenConfig()
  num_devices = num_devices or jax.device_count()
  dmesh = device_mesh(axis_name, num_devices)

  premesh = unit_cube_mesh(cfg.resolution, ndim=2, periodic_dims=(0, 1))
  with jax.default_device(jax.local_devices(backend='cpu')[0]):
    sem = navier_stokes.StokesSEM.create(
        premesh, boundary_conditions={}, order=cfg.order,
        use_pallas_kernels=jax.devices()[0].platform == 'tpu')
  dist = DistributedStokesBox(sem, dmesh, axis_name)
  dx = datagen.min_node_spacing(sem.velocity.mesh)
  logging.info('distributed mesh: %d nodes over %d devices, dx=%f',
               sem.velocity.mesh.num_nodes, num_devices, dx)

  u0 = datagen.u_init(sem.velocity.mesh.node_coords)
  if cfg.seed:
    key = jax.random.PRNGKey(cfg.seed)
    u0 = u0 + 1e-3 * jax.random.normal(key, u0.shape, u0.dtype)
  u0_el = dist.velocity_to_el((u0[:, 0], u0[:, 1]))
  p0_el = dist.pressure_to_el(
      jnp.zeros(sem.pressure.pspace.mesh.num_nodes,
                dtype=sem.velocity.mesh.node_coords.dtype))
  conv = dist.make_advection()
  c0 = conv(u0_el)
  us = tuple(u0_el for _ in range(cfg.time_order))
  ps = tuple(p0_el for _ in range(cfg.time_order))
  cus = tuple(c0 for _ in range(cfg.time_order))

  advance = make_distributed_step_fn(dist, cfg)
  os.makedirs(workdir, exist_ok=True)
  num_frames = cfg.num_steps_per_cycle // cfg.snapshot_every

  def u_np(u_el):
    return np.stack([np.asarray(c)
                     for c in dist.velocity_from_el(u_el)], axis=-1)

  for cycle in range(cfg.num_cycles):
    start_step = cycle * cfg.num_steps_per_cycle
    t = start_step * cfg.dt
    frames = {'t': [t], 'u': [u_np(us[-1])],
              'p': [np.asarray(dist.pressure_from_el(ps[-1]))]}
    start_time = time.time()
    (us, ps, cus), (u_frames, p_frames) = advance(us, ps, cus)
    jax.block_until_ready(p_frames)
    logging.info('one cycle walltime %f seconds', time.time() - start_time)
    for i in range(num_frames):
      t += cfg.snapshot_every * cfg.dt
      frames['t'].append(t)
      frames['u'].append(
          u_np(jax.tree_util.tree_map(lambda x: x[i], u_frames)))
      frames['p'].append(np.asarray(dist.pressure_from_el(
          jax.tree_util.tree_map(lambda x: x[i], p_frames))))
    end_step = start_step + cfg.num_steps_per_cycle
    path = os.path.join(
        workdir,
        f'{cfg.split}_kolmogorov_grid_{cfg.resolution}_order_{cfg.order}'
        f'_step_{start_step}_{end_step}.h5')
    with h5py.File(path, 'w') as f:
      for key, val in frames.items():
        f[key] = np.stack(val)
    logging.info('wrote %s', path)
    cfl = float(max(np.abs(np.asarray(c)).max()
                    for c in dist.velocity_from_el(us[-1]))) * cfg.dt / dx
    logging.info('cycle %d: CFL %f', cycle, cfl)
  logging.info('distributed datagen complete')
