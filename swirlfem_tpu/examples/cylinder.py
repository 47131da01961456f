"""Flow past a cylinder: Karman vortex shedding (Schaefer-Turek 2D-2/2D-3).

The classical unstructured benchmark: channel 2.2 x 0.41 with a cylinder
of diameter 0.1 at (0.2, 0.2); parabolic inflow with mean velocity 1.0
gives Re = 100, where the wake sheds vortices at Strouhal number
St = f D / U ~ 0.30 (confined-cylinder value; Schaefer & Turek 1996).

Exercises the framework's fully unstructured path end to end: the
programmatic O-grid mesh (utils.cylinder), curved-boundary snapping,
non-homogeneous Dirichlet lift, mixed Dirichlet/Neumann (do-nothing
outflow) boundaries, and the generic covector operators — the geometries
the structured fast path cannot take.  BASELINE.md lists cylinder runs
among the validation targets (the reference itself ships only the Gmsh
reader for such meshes; no cylinder example exists upstream).
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np

from swirlfem_tpu.core.bc import BCType
from swirlfem_tpu.nse.solver import extk_coeffs
from swirlfem_tpu.nse.solver import StokesSEM
from swirlfem_tpu.utils.cylinder import cylinder_channel_premesh
from swirlfem_tpu.utils.cylinder import make_cylinder_snap

RADIUS = 0.05
CENTER = (0.2, 0.2)
HEIGHT = 0.41
MEAN_VELOCITY = 1.0  # Re = U * D / nu = 100 at nu = 1e-3


def make_cylinder_sem(order: int = 5, ns: int = 6, nr: int = 4,
                      nx_down: int = 14) -> StokesSEM:
  premesh = cylinder_channel_premesh(ns=ns, nr=nr, nx_down=nx_down)
  bcs = {
      'cylinder': (BCType.DIRICHLET, 0.0),
      'walls': (BCType.DIRICHLET, 0.0),
      'inflow': (BCType.DIRICHLET, 0.0),
      # 'outflow' unmasked: natural (do-nothing) outflow.
  }
  snap = make_cylinder_snap(premesh, radius=RADIUS, center=CENTER)
  return StokesSEM.create(premesh, boundary_conditions=bcs, order=order,
                          coord_transform=snap)


def inflow_boundary_field(sem: StokesSEM,
                          mean_velocity: float = MEAN_VELOCITY) -> jax.Array:
  """Parabolic inflow profile on the x=0 plane, zero elsewhere."""
  coords = np.asarray(sem.velocity.mesh.node_coords)
  on_inflow = np.asarray(
      sem.velocity.mesh.physical_masks['inflow']) > 0
  y = coords[:, 1]
  profile = 6.0 * mean_velocity * y * (HEIGHT - y) / HEIGHT ** 2
  ub = np.zeros_like(coords)
  ub[:, 0] = np.where(on_inflow, profile, 0.0)
  return jnp.asarray(ub)


def probe_index(sem: StokesSEM,
                point: tuple[float, float] = (0.35, 0.2)) -> int:
  """Nearest velocity node to a wake probe point."""
  coords = np.asarray(sem.velocity.mesh.node_coords)
  return int(np.argmin(np.sum((coords - np.asarray(point)) ** 2, axis=-1)))


def run_cylinder(sem: StokesSEM, reynolds: float = 100.0, dt: float = 2e-3,
                 num_steps: int = 100, time_order: int = 2,
                 tol: float = 1e-6, probe: int | None = None):
  """Time-steps from rest; returns (u, p, probe trace of cross-stream u_y).

  The impulsive start plus the asymmetric probe geometry triggers shedding
  after the initial transient (a few hundred convective steps at Re 100).
  """
  nv = sem.velocity.mesh.num_nodes
  npn = sem.pressure.pspace.mesh.num_nodes
  dtype = sem.velocity.mesh.node_coords.dtype
  u0 = jnp.zeros((nv, 2), dtype=dtype)
  p0 = jnp.zeros(npn, dtype=dtype)
  u_boundary = inflow_boundary_field(sem).astype(dtype)
  ext = [float(c) for c in extk_coeffs(k=time_order - 1)]
  if probe is None:
    probe = probe_index(sem)

  us = [u0 for _ in range(time_order)]
  ps = [p0 for _ in range(time_order)]
  cus = [sem.C(u + u_boundary) for u in us]
  mu = MEAN_VELOCITY * 2 * RADIUS / reynolds
  # Exact dense Schur inverse: pressure CG needs ~2000 iterations/step
  # unpreconditioned on this mesh (measured), O(1) with it.
  precond = sem.dense_pressure_preconditioner(dt, time_order)

  @jax.jit
  def step(us, ps, cus):
    cu = sum(ext[-i] * cus[-i] for i in range(1, len(ext) + 1))
    u, p, aux = sem.stokes_one_step(
        list(us), list(ps), -cu, mu=mu, dt=dt, time_order=time_order,
        u_boundary=u_boundary, tol=tol, atol=tol * 1e-2,
        pressure_preconditioner=precond, project_out_nullspace=False)
    return (us[1:] + [u - u_boundary], ps[1:] + [p],
            cus[1:] + [sem.C(u)]), u[probe, 1]

  trace = []
  for _ in range(num_steps):
    (us, ps, cus), v_probe = step(us, ps, cus)
    trace.append(float(v_probe))
  return us[-1] + u_boundary, ps[-1], np.asarray(trace)


def strouhal_number(trace: np.ndarray, dt: float,
                    mean_velocity: float = MEAN_VELOCITY) -> float:
  """St = f D / U from the dominant FFT peak of the probe trace tail.

  Hann window + log-parabolic peak interpolation: the raw argmax snaps to
  the FFT bin grid (bin width in St units = D / (U T_tail) — 0.016 for a
  10 s window), which alone can move St outside the 0.295-0.305
  benchmark interval.
  """
  tail = trace[len(trace) // 2:]
  tail = tail - tail.mean()
  freqs = np.fft.rfftfreq(len(tail), d=dt)
  spectrum = np.abs(np.fft.rfft(tail * np.hanning(len(tail))))
  k = int(np.argmax(spectrum[1:])) + 1
  f = freqs[k]
  if 1 <= k < len(spectrum) - 1 and spectrum[k - 1] > 0 and spectrum[k + 1] > 0:
    a, b, c = np.log(spectrum[k - 1: k + 2])
    denom = a - 2 * b + c
    if denom < 0:  # genuine local max
      f = (k + 0.5 * (a - c) / denom) * (freqs[1] - freqs[0])
  return float(f * 2 * RADIUS / mean_velocity)


def run_cylinder_scan(sem: StokesSEM, reynolds: float = 100.0,
                      dt: float = 2.5e-4, num_steps: int = 40000,
                      steps_per_dispatch: int = 200, time_order: int = 2,
                      tol: float = 1e-5, probe: int | None = None,
                      perturb: float = 1e-2, log_every: int | None = None,
                      kick_amplitude: float = 0.3,
                      kick_steps: int = 12000,
                      compute_forces: bool = False,
                      pressure_preconditioner=None,
                      use_assembled_viscous: bool = False,
                      use_projection: bool = True,
                      checkpoint_path: str | None = None,
                      checkpoint_every: int = 20,
                      alpha: float = 0.05):
  """Long shedding run: `steps_per_dispatch` steps per jitted dispatch.

  Returns ``(u, p, trace)`` with the full per-step probe trace of the
  cross-stream velocity — or, with ``compute_forces=True``,
  ``(u, p, trace, forces)`` where `forces` is the per-step ``(steps, 2)``
  consistent-flux reaction force on the cylinder (Schaefer-Turek
  coefficients: ``C = 2 F / (rho Ubar^2 D)`` with ``Ubar = 1``,
  ``D = 0.1``), computed inside the scan from the unmasked momentum
  residual at the wall rows (see `reaction_force`).  A transient
  cross-stream kick force seeds the Karman mode.  States are
  per-component nodal tuples; designed for f32 single-chip runs (~6
  ms/step at the order-5 reference mesh).

  `num_steps` must be a multiple of `steps_per_dispatch` (a trailing
  partial chunk would trigger a second full XLA compile for its
  different static scan length).

  ``pressure_preconditioner``: override the default dense Schur inverse
  (e.g. ``sem.schwarz_pressure_preconditioner(...)`` for meshes beyond
  the dense range).

  CFL WARNING (hard-won): the extrapolated-convection BDF scheme needs
  ``u_max * dt / dx_min <~ 0.7``.  Above it the instability does NOT
  blow up visibly — the modal filter and solve guards absorb it — it
  silently suppresses the convection physics near the cylinder and the
  wake stays attached/steady at any Reynolds number (measured: CFL 2.4 at
  dt=1e-3 on the order-5 mesh gave an unconditionally steady creeping-
  flow-like wake; dt=2.5e-4 sheds at St=0.29, matching Schaefer-Turek's
  0.295-0.305).  This function asserts the limit using the actual mesh
  spacing.
  """
  from swirlfem_tpu.niles.datagen import min_node_spacing
  dx = min_node_spacing(sem.velocity.mesh)
  cfl = 2.2 * MEAN_VELOCITY * dt / dx  # u_max ~ 2.2 * mean in this flow
  assert cfl < 0.75, (
      f'CFL {cfl:.2f} too large: reduce dt below '
      f'{0.7 * dx / (2.2 * MEAN_VELOCITY):.1e}')
  if num_steps % steps_per_dispatch:
    raise ValueError(
        f'num_steps={num_steps} is not a multiple of '
        f'steps_per_dispatch={steps_per_dispatch}: the trailing '
        f'{num_steps % steps_per_dispatch} steps would be silently dropped')

  nv = sem.velocity.mesh.num_nodes
  npn = sem.pressure.pspace.mesh.num_nodes
  dtype = sem.velocity.mesh.node_coords.dtype
  coords = np.asarray(sem.velocity.mesh.node_coords)
  u_boundary = inflow_boundary_field(sem).astype(dtype)
  ext = [float(c) for c in extk_coeffs(k=time_order - 1)]
  if probe is None:
    probe = probe_index(sem)
  mu = MEAN_VELOCITY * 2 * RADIUS / reynolds

  # Perturbation: a localized swirl behind the cylinder, zero on boundaries.
  mask = np.asarray(sem.velocity.interior_mask)[:, 0]
  bump = perturb * np.exp(
      -(((coords[:, 0] - 0.3) / 0.05) ** 2
        + ((coords[:, 1] - 0.22) / 0.05) ** 2))
  u0 = jnp.asarray(np.stack([np.zeros_like(bump), bump * mask], axis=-1),
                   dtype=dtype)

  us = tuple(u0 for _ in range(time_order))
  ps = tuple(jnp.zeros(npn, dtype=dtype) for _ in range(time_order))
  # Convection covectors are stored UNMASKED: the step's forcing masks the
  # Dirichlet rows, while the reaction force needs exactly those rows.
  vel = sem.velocity

  def raw_convection(u):
    return vel.scatter(vel.C_local(vel.gather(u)))

  cus = tuple(raw_convection(u + u_boundary) for u in us)
  precond = pressure_preconditioner
  if precond is None:
    precond = sem.dense_pressure_preconditioner(dt, time_order)

  # Transient asymmetric kick: on fine meshes the initial perturbation
  # decays during the impulsive-start transient before the wake
  # instability can amplify it (the symmetric steady wake is a valid but
  # unstable solution); a small cross-stream body force behind the
  # cylinder for the first `kick_steps` steps seeds the Karman mode, then
  # shuts off.
  kick = kick_amplitude * np.exp(
      -(((coords[:, 0] - 0.3) / 0.05) ** 2
        + ((coords[:, 1] - 0.2) / 0.05) ** 2)) * mask
  f_kick = sem.B(jnp.asarray(
      np.stack([np.zeros_like(kick), kick], axis=-1), dtype=dtype))

  if use_assembled_viscous:
    # Assembled element-block H apply inside the viscous CG
    # (ops.assembled): equal to rounding, fewer kernel launches — but the
    # O(n^{2d}) block FLOPs lose to the sum-factorized chain at both
    # benchmark meshes (measured: 37.0 vs 32.6 ms/step at 912 el order 6;
    # also slower at 228 el order 5), so it stays opt-in.
    viscous_matvec = sem.assembled_viscous_matvec(mu, dt, time_order)
  else:
    viscous_matvec = None

  imask = sem.velocity.interior_mask
  # Fischer successive-rhs projection (linalg.projection): warm-start both
  # solves from the span of previous increments; in steady shedding cuts
  # the viscous CG to ~1-2 iterations.
  proj0 = sem.initial_projection_state() if use_projection else None

  @jax.jit
  def chunk(step0, us, ps, cus, proj):
    def body(carry, k):
      us, ps, cus, proj = carry
      cu = sum(ext[-i] * cus[-i] for i in range(1, len(ext) + 1))
      f = -imask * cu + jnp.where(step0 + k < kick_steps, 1.0, 0.0) * f_kick
      u, p, aux = sem.stokes_one_step(
          list(us), list(ps), f, mu=mu, dt=dt, time_order=time_order,
          alpha=alpha,
          u_boundary=u_boundary, tol=tol, atol=tol * 1e-2,
          pressure_preconditioner=precond, viscous_matvec=viscous_matvec,
          project_out_nullspace=False, projection_state=proj)
      carry = (us[1:] + (u - u_boundary,), ps[1:] + (p,),
               cus[1:] + (raw_convection(u),),
               aux.get('projection_state', proj))
      out = u[probe, 1]
      if compute_forces:
        full = [w + u_boundary for w in us] + [u]
        out = (out, reaction_force(sem, full, p, 0.0, mu=mu, dt=dt,
                                   convection=cu))
      return carry, out
    return jax.lax.scan(body, (us, ps, cus, proj),
                        jnp.arange(steps_per_dispatch))

  import time as _time
  trace, forces = [], []
  carry = (us, ps, cus, proj0)
  start_chunk = 0
  # Chunk-level checkpoint/resume: through the tunneled TPU the worker can
  # crash mid-campaign (observed twice on 150k-step runs); with a
  # checkpoint path a relaunched process resumes at the last saved chunk
  # instead of restarting the whole run.
  if checkpoint_path and os.path.exists(checkpoint_path):
    ck = np.load(checkpoint_path)
    if 'steps_per_dispatch' in ck and (
        int(ck['steps_per_dispatch']) != steps_per_dispatch):
      raise ValueError(
          f'checkpoint was written with steps_per_dispatch='
          f'{int(ck["steps_per_dispatch"])}, resume requested '
          f'{steps_per_dispatch}; chunk indices would misalign')
    start_chunk = int(ck['chunk'])
    carry = (tuple(jnp.asarray(a) for a in ck['us']),
             tuple(jnp.asarray(a) for a in ck['ps']),
             tuple(jnp.asarray(a) for a in ck['cus']), proj0)
    trace = [ck['trace']] if ck['trace'].size else []
    forces = [ck['forces']] if ck['forces'].size else []
    # The projection history is NOT checkpointed: it only warm-starts CG
    # (stop_gradient'ed, never changes solutions), so a resume simply
    # rebuilds it from scratch over the next few chunks.
    print(f'resuming from checkpoint at chunk {start_chunk} '
          f'({start_chunk * steps_per_dispatch} steps)', flush=True)
  t0 = _time.time()
  for i in range(start_chunk, num_steps // steps_per_dispatch):
    carry, tr = chunk(jnp.int32(i * steps_per_dispatch), *carry)
    if compute_forces:
      tr, fr = tr
      forces.append(np.asarray(fr))
    trace.append(np.asarray(tr))
    if log_every and (i + 1) % log_every == 0:
      done = (i + 1 - start_chunk) * steps_per_dispatch
      print(f'step {(i + 1) * steps_per_dispatch}: '
            f'probe={trace[-1][-1]:+.4f} '
            f'({(_time.time() - t0) / done * 1e3:.1f} ms/step)', flush=True)
    if checkpoint_path and (i + 1) % checkpoint_every == 0:
      tmp = checkpoint_path + '.tmp.npz'
      with open(tmp, 'wb') as fh:
        np.savez(fh, chunk=i + 1, steps_per_dispatch=steps_per_dispatch,
                 us=np.stack([np.asarray(a) for a in carry[0]]),
                 ps=np.stack([np.asarray(a) for a in carry[1]]),
                 cus=np.stack([np.asarray(a) for a in carry[2]]),
                 trace=np.concatenate(trace),
                 forces=(np.concatenate(forces) if forces
                         else np.zeros((0, 2))))
      os.replace(tmp, checkpoint_path)
  us, ps = carry[0], carry[1]
  out = (us[-1] + u_boundary, ps[-1], np.concatenate(trace))
  if compute_forces:
    out = out + (np.concatenate(forces),)
  return out


def reaction_force(sem: StokesSEM, us, p, f=0.0, *, mu: float, dt: float,
                   group: str = 'cylinder', convection=None):
  """Discrete reaction force the fluid exerts on a Dirichlet boundary.

  The consistent (Babuska-Miller / "consistent flux") force evaluation: at
  Dirichlet nodes the row-elided momentum equations are not enforced, and
  their UNMASKED residual is exactly the nodal reaction covector — the
  traction the wall exerts on the fluid, with no surface quadrature needed.
  The force ON the body is its negative, summed over the group's nodes:

      F = - sum_{wall nodes} [B du/dt + C_ext + mu A u - D^T p - f]

  Args:
    us: BDF velocity history, newest (the just-computed step) LAST, each a
      nodal ``(N, d)`` array INCLUDING the boundary lift; ``len(us) - 1``
      is the BDF order, so pass one more state than ``stokes_one_step``
      consumes.
    p: the pressure produced by the same step.
    f: the external-forcing covector EXCLUDING convection (unmasked rows
      matter; a row-masked covector loses its wall contribution to F).
    convection: optional explicit unmasked convection covector.  By default
      the scheme-consistent extrapolation the step used is rebuilt from the
      old states ``us[:-1]`` (reference navier_stokes.py:423-434 pairs
      extrapolated convection with the BDF solve the same way).

  Returns the d-vector force; Schaefer-Turek drag/lift coefficients are
  ``C = 2 F / (rho Ubar^2 D)``.
  """
  from swirlfem_tpu.nse.solver import bdfk_coeffs

  vel = sem.velocity
  k = len(us) - 1
  if k < 1:
    raise ValueError('us must hold the BDF history plus the new state')
  coeffs = [float(c) for c in bdfk_coeffs(k)]
  dudt = sum(c * u for c, u in zip(coeffs, us)) / dt

  if convection is None:
    ext = [float(c) for c in extk_coeffs(k=k - 1)] if k > 1 else [1.0]
    convection = sum(
        e * vel.scatter(vel.C_local(vel.gather(u)))
        for e, u in zip(ext, us[:-1]))

  b_term = vel.scatter(vel.B_local(vel.gather(dudt)))
  a_term = vel.scatter(vel.A_local(vel.gather(us[-1])))
  dt_term = vel.scatter(sem.Dt_local(sem.pressure.gather(p)))
  residual = b_term + convection + mu * a_term - dt_term
  if not (isinstance(f, (int, float)) and f == 0):
    residual = residual - f

  on_wall = jnp.asarray(
      np.asarray(sem.velocity.mesh.physical_masks[group]) > 0)
  return -jnp.sum(jnp.where(on_wall[:, None], residual, 0.0), axis=0)
