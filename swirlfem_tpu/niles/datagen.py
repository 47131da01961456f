"""DNS data generation: 2D Kolmogorov flow on the doubly periodic square.

Parity target: reference ``swirl_fem/niles/datagen/datagen.py`` (workload
:48-56, forcing :69-75, cycle loop :105-196): order-8 spectral elements on a
64x64 grid at Re 20,000, BDF3, dt 1e-4, snapshots every `snapshot_every`
steps written to HDF5 cycle files with CFL logging.  (Note: the reference's
``_solve_one_step`` unpacks a 2-tuple from the 3-tuple ``stokes_one_step``
— datagen.py:101-102 — which is fixed here.)

Shards are written in the format the input pipeline reads: ``u``
(frames, num_nodes, ndim), ``p`` (frames, num_pnodes), ``t`` (frames,).
"""

from __future__ import annotations

import dataclasses
import functools
import os
import time

from absl import logging
import jax
import jax.numpy as jnp
import numpy as np

from swirlfem_tpu.nse import solver as navier_stokes
from swirlfem_tpu.utils.box import unit_cube_mesh


@dataclasses.dataclass(frozen=True)
class DatagenConfig:
  resolution: int = 64          # elements per dimension
  order: int = 8
  time_order: int = 3
  reynolds_number: float = 20000.0
  num_cycles: int = 500
  num_steps_per_cycle: int = 500
  dt: float = 1e-4
  drag_coeff: float = 0.05  # reference kolmogorov_re_1000.py:47
  forcing_wavenumber: float = 4.0
  snapshot_every: int = 10
  split: str = 'train'
  seed: int = 0  # perturbs the initial condition (ensemble generation)
  # Cycles advanced BEFORE the first written snapshot (spin-up past the
  # laminar transient so shards hold developed turbulence).  The reference
  # datagen writes from the cold start (`datagen.py:105-196`) and leaves
  # transient-frame handling to the consumer; a warmup knob keeps the
  # shards statistically homogeneous instead.  Physical time offset
  # ``warmup_cycles * num_steps_per_cycle * dt`` is reflected in the
  # written ``t`` values and shard step ranges.
  warmup_cycles: int = 0


def u_init(x, l: float = 2.0):
  """Initial Kolmogorov velocity field (Taylor-Green-like)."""
  u0 = jnp.cos(2 * l * jnp.pi * x[..., 0]) * jnp.sin(2 * l * jnp.pi * x[..., 1])
  u1 = -jnp.sin(2 * l * jnp.pi * x[..., 0]) * jnp.cos(2 * l * jnp.pi * x[..., 1])
  return jnp.stack([u0, u1], axis=-1)


def forcing(cfg: DatagenConfig, x, u):
  f0 = jnp.sin(2 * jnp.pi * cfg.forcing_wavenumber * x[..., 1])
  return jnp.stack([f0, jnp.zeros_like(f0)], axis=-1) - cfg.drag_coeff * u


def kolmogorov_el_forcing(cfg: DatagenConfig, wmass_el, fbody_el, u, cu):
  """Mass-weighted el-form forcing covector: body force - drag, minus the
  extrapolated convection.  Shared by the single-device and distributed
  datagen step builders so the physics cannot drift between them."""
  ux, uy = u
  return (wmass_el * (fbody_el - cfg.drag_coeff * ux) - cu[0],
          wmass_el * (-cfg.drag_coeff * uy) - cu[1])


def min_node_spacing(mesh) -> float:
  """Minimum distance between nodes within any element (CFL scale)."""
  coords = np.asarray(mesh.element_coords())
  dx = np.inf
  for x in coords:
    pair = np.linalg.norm(x[:, None, :] - x[None, :, :], axis=-1)
    np.fill_diagonal(pair, np.inf)
    dx = min(dx, pair.min())
  return float(dx)


def make_step_fn(sem, cfg: DatagenConfig):
  """Jitted scan of `snapshot_every` steps between snapshots.

  On fully-periodic structured boxes the states travel in element-local
  E-last form ACROSS steps (``sem.stokes_one_step_el``) with the el-native
  exact FDM inverses for both solves: zero layout transforms and 0-1 CG
  iterations per step.  Elsewhere: per-component flat nodal tuples
  ((N, 2) arrays pad 64x in TPU memory) through the nodal fast path, or
  (N, d) arrays through the generic path.
  """
  mu = 1.0 / cfg.reynolds_number
  ext = [float(c) for c in navier_stokes.extk_coeffs(k=cfg.time_order - 1)]
  coords = sem.velocity.mesh.node_coords
  tmap = jax.tree_util.tree_map
  el_mode = sem.fast_ops is not None and sem._fully_periodic  # pylint: disable=protected-access

  if el_mode:
    ops = sem.fast_ops
    info = ops.vinfo
    kk = info.order + 1
    n = info.num_elements_per_dim
    eshape = (n,) * info.ndim
    num_e = n ** info.ndim
    wmass_el = ops.wmass.reshape((kk,) * info.ndim + eshape)
    fbody_el = sem.velocity_to_el(
        (jnp.sin(2 * jnp.pi * cfg.forcing_wavenumber * coords[..., 1]),))[0]
    vp_el, pp_el = sem.fdm_el_preconditioners(mu, cfg.dt, cfg.time_order)

    def conv_el(ut):
      flat = [c.reshape((kk,) * info.ndim + (num_e,)) for c in ut]
      outs = ops.convection_el(*flat)
      return tuple(o.reshape((kk,) * info.ndim + eshape) for o in outs)

    def one_step(us, ps, cus):
      cu = tmap(lambda *xs: sum(e * x for e, x in zip(ext[::-1], xs[::-1])),
                *cus)
      f_el = kolmogorov_el_forcing(cfg, wmass_el, fbody_el, us[-1], cu)
      u, p, _ = sem.stokes_one_step_el(
          list(us), list(ps), f_el, mu=mu, dt=cfg.dt,
          time_order=cfg.time_order, tol=1e-5, atol=1e-4,
          pressure_preconditioner_el=pp_el, viscous_preconditioner_el=vp_el,
          exact_solves=True)
      return u, p, conv_el(u)

  else:
    precond = sem.best_pressure_preconditioner(cfg.dt, cfg.time_order)
    vprecond = sem.fdm_viscous_preconditioner(mu, cfg.dt, cfg.time_order)
    md = (sem.velocity_mass_diag[..., 0]
          if sem.fast_ops is not None else None)
    fbody_x = jnp.sin(2 * jnp.pi * cfg.forcing_wavenumber * coords[..., 1])

    def one_step(us, ps, cus):
      cu = tmap(lambda *xs: sum(e * x for e, x in zip(ext[::-1], xs[::-1])),
                *cus)
      ux, uy = us[-1]
      f = (md * (fbody_x - cfg.drag_coeff * ux) - cu[0],
           md * (-cfg.drag_coeff * uy) - cu[1])
      u, p, _ = sem.stokes_one_step(
          list(us), list(ps), f, mu=mu, dt=cfg.dt,
          time_order=cfg.time_order, tol=1e-5, atol=1e-4,
          pressure_preconditioner=precond, viscous_preconditioner=vprecond)
      return u, p, sem._fast_C(u)  # pylint: disable=protected-access

    if sem.fast_ops is None:
      def one_step(us, ps, cus):  # noqa: F811 - generic fallback
        cu = sum(e * c for e, c in zip(ext[::-1], cus[::-1]))
        f = forcing(cfg, coords, us[-1])
        f = -cu + sem.B(f)
        u, p, _ = sem.stokes_one_step(
            list(us), list(ps), f, mu=mu, dt=cfg.dt,
            time_order=cfg.time_order, tol=1e-5, atol=1e-4,
            pressure_preconditioner=precond)
        return u, p, sem.C(u)

  @jax.jit
  def advance(us, ps, cus):
    """Runs a whole cycle in ONE dispatch, returning strided snapshots.

    Host->device dispatch through a tunneled TPU costs ~20 ms per jitted
    call; at 0.5 ms/step it would dominate unless amortized.  The outer
    scan emits one (u, p) frame every `snapshot_every` steps.
    """
    def body(carry, _):
      us, ps, cus = carry
      u, p, cu = one_step(us, ps, cus)
      return (us[1:] + (u,), ps[1:] + (p,), cus[1:] + (cu,)), None

    def outer(carry, _):
      carry, _ = jax.lax.scan(body, carry, None, length=cfg.snapshot_every)
      us, ps, _ = carry
      return carry, (us[-1], ps[-1])

    carry, frames = jax.lax.scan(
        outer, (us, ps, cus), None,
        length=cfg.num_steps_per_cycle // cfg.snapshot_every)
    return carry, frames

  advance.el_mode = el_mode
  return advance


def one_cycle(sem, cfg: DatagenConfig, advance, start_step, us, ps, cus,
              workdir: str):
  """Runs one cycle, writing snapshot frames to an HDF5 shard."""
  import h5py

  el_mode = getattr(advance, 'el_mode', False)

  def u_np(u):
    if el_mode:
      u = sem.velocity_from_el(u)
    return np.stack([np.asarray(c) for c in u], axis=-1) if isinstance(
        u, tuple) else np.asarray(u)

  def p_np(p):
    return np.asarray(sem.pressure_from_el(p) if el_mode else p)

  t = start_step * cfg.dt
  us_init_u, ps_init_p = us[-1], ps[-1]
  start_time = time.time()
  (us, ps, cus), (u_frames, p_frames) = advance(us, ps, cus)
  jax.block_until_ready(p_frames)
  wall = time.time() - start_time
  logging.info('one cycle walltime %f seconds', wall)
  num_frames = cfg.num_steps_per_cycle // cfg.snapshot_every
  frames = {'t': [t], 'u': [u_np(us_init_u)], 'p': [p_np(ps_init_p)]}
  for i in range(num_frames):
    t += cfg.snapshot_every * cfg.dt
    frames['t'].append(t)
    frames['u'].append(u_np(jax.tree_util.tree_map(lambda x: x[i], u_frames)))
    frames['p'].append(p_np(p_frames[i]))

  end_step = start_step + cfg.num_steps_per_cycle
  path = os.path.join(
      workdir,
      f'{cfg.split}_kolmogorov_grid_{cfg.resolution}_order_{cfg.order}'
      f'_step_{start_step}_{end_step}.h5')
  with h5py.File(path, 'w') as f:
    for key, val in frames.items():
      f[key] = np.stack(val)
  logging.info('wrote %s', path)
  return us, ps, cus, wall


def run_simulation(workdir: str, cfg: DatagenConfig | None = None):
  """Full DNS run: `num_cycles` cycles of `num_steps_per_cycle` steps.

  Returns the list of per-cycle device walltimes (seconds, excluding the
  host-side HDF5 write), for throughput reporting."""
  cfg = cfg or DatagenConfig()
  premesh = unit_cube_mesh(cfg.resolution, ndim=2, periodic_dims=(0, 1))
  # Build host-side (eager dispatch to a tunneled TPU is latency-bound),
  # then move the solver to the default device in one transfer.
  device = jax.devices()[0]
  with jax.default_device(jax.local_devices(backend='cpu')[0]):
    sem = navier_stokes.StokesSEM.create(
        premesh, boundary_conditions={}, order=cfg.order,
        use_pallas_kernels=device.platform != 'cpu')
  if device.platform != 'cpu':
    # One pytree-level device_put: per-leaf puts each pay the ~20 ms
    # tunneled dispatch latency.
    sem = jax.device_put(sem, device)
  dx = min_node_spacing(sem.velocity.mesh)
  logging.info('mesh: %d nodes, %d elements, dx=%f',
               sem.velocity.mesh.num_nodes, sem.velocity.mesh.num_elements,
               dx)

  u0 = u_init(sem.velocity.mesh.node_coords)
  if cfg.seed:
    # Small divergence-free-ish perturbation to decorrelate ensemble runs.
    key = jax.random.PRNGKey(cfg.seed)
    u0 = u0 + 1e-3 * jax.random.normal(key, u0.shape, u0.dtype)
  p0 = jnp.zeros(sem.pressure.pspace.mesh.num_nodes,
                 dtype=sem.velocity.mesh.node_coords.dtype)
  advance = make_step_fn(sem, cfg)
  if advance.el_mode:
    u0 = sem.velocity_to_el((u0[:, 0], u0[:, 1]))
    p0 = sem.pressure_to_el(p0)
    ops, info = sem.fast_ops, sem.fast_ops.vinfo
    num_e = info.num_elements_per_dim ** info.ndim
    kk = info.order + 1
    flat = [c.reshape((kk,) * info.ndim + (num_e,)) for c in u0]
    c0 = tuple(o.reshape(u0[0].shape) for o in ops.convection_el(*flat))
  elif sem.fast_ops is not None:
    u0 = (u0[:, 0], u0[:, 1])
    c0 = sem._fast_C(u0)
  else:
    c0 = sem.C(u0)
  us = tuple(u0 for _ in range(cfg.time_order))
  ps = tuple(p0 for _ in range(cfg.time_order))
  cus = tuple(c0 for _ in range(cfg.time_order))

  os.makedirs(workdir, exist_ok=True)
  for w in range(cfg.warmup_cycles):
    (us, ps, cus), _ = advance(us, ps, cus)
  if cfg.warmup_cycles:
    jax.block_until_ready(ps[-1])
    logging.info('warmup: %d cycles (t = %f) discarded', cfg.warmup_cycles,
                 cfg.warmup_cycles * cfg.num_steps_per_cycle * cfg.dt)
  cycle_walls = []
  for cycle in range(cfg.warmup_cycles, cfg.warmup_cycles + cfg.num_cycles):
    us, ps, cus, wall = one_cycle(sem, cfg, advance,
                                  cycle * cfg.num_steps_per_cycle, us, ps,
                                  cus, workdir)
    cycle_walls.append(wall)
    u_last = (sem.velocity_from_el(us[-1]) if advance.el_mode
              else us[-1])
    cfl = float(max(np.abs(np.asarray(c)).max() for c in u_last)
                if isinstance(u_last, tuple)
                else np.abs(np.asarray(u_last)).max()) * cfg.dt / dx
    logging.info('cycle %d: CFL %f', cycle, cfl)
  logging.info('datagen complete')
  return cycle_walls


def main(argv=None):
  from absl import app, flags
  del argv
  FLAGS = flags.FLAGS
  run_simulation(FLAGS.workdir)


if __name__ == '__main__':
  from absl import app, flags
  flags.DEFINE_string('workdir', None, 'Output directory for HDF5 shards.')
  flags.mark_flags_as_required(['workdir'])
  app.run(main)
