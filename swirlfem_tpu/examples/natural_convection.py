"""Differentially heated square cavity: the de Vahl Davis benchmark.

Natural convection of a Boussinesq fluid in the unit square: the left
wall is held hot, the right wall cold, the horizontal walls are
adiabatic, and buoyancy drives a recirculating flow whose wall heat
transfer (the Nusselt number) is the classic quantitative benchmark
(G. de Vahl Davis, "Natural convection of air in a square cavity: a
bench mark numerical solution", IJNMF 3 (1983) 249-264).

Non-dimensionalization (kappa-based: lengths by the cavity side L,
velocities by kappa/L, time by L^2/kappa):

    du/dt + (u . grad) u = -grad p + Pr lap(u) + Ra Pr theta e_y
    dtheta/dt + u . grad theta = lap(theta)

with theta = +1/2 at x=0, theta = -1/2 at x=1, d theta/dn = 0 on the
horizontal walls, and no-slip velocity everywhere.  The mean Nusselt
number is computed two independent ways:

  * the volume identity  Nu = int (u_x theta - d theta/dx) dA, evaluated
    spectrally on the dealiasing (overintegration) rule — at the pure
    conduction solution theta = 1/2 - x this gives exactly 1;
  * the consistent discrete wall flux: the unmasked steady residual
    ``kappa A(theta) + C(theta, u)`` summed over a wall's Dirichlet rows
    equals the boundary integral ``int d theta/dn ds`` of the discrete
    solution (the same reaction trick ``examples/cylinder.py``'s force
    functional uses) — superconvergent and mesh-consistent.

Reference parity: google-research/swirl-fem has no scalar transport, no
buoyancy coupling, and no heat-transfer example (its NSE treats only the
momentum equation, ``navier_stokes/navier_stokes.py:350-458``); this
module is beyond-parity capability built on `nse/scalar.ScalarTransport`
composed with `nse/solver.StokesSEM`.

Cross-validation: an INDEPENDENT second-order finite-difference solver of
the same problem (vorticity-streamfunction, Thom walls — shares no code,
variables, or discretization with this framework) lives in
``experiments/fd_cavity_oracle.py``; its Richardson-extrapolated Ra-1e4
Nusselt (2.2444) agrees with this module (2.2448) and the literature.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from swirlfem_tpu.core.bc import BCType
from swirlfem_tpu.core.fespace import grad
from swirlfem_tpu.nse.scalar import ScalarTransport
from swirlfem_tpu.nse.solver import extk_coeffs
from swirlfem_tpu.nse.solver import StokesSEM
from swirlfem_tpu.utils.box import unit_cube_mesh

# Benchmark mean-Nusselt values (de Vahl Davis 1983, Table I; the
# commonly quoted bench-mark solution column).
BENCHMARK_NU = {1e3: 1.118, 1e4: 2.243, 1e5: 4.519, 1e6: 8.800}

# Modern high-accuracy values (Le Quere 1991 pseudo-spectral for 1e5/1e6;
# grid-converged consensus for 1e3/1e4) — the de Vahl Davis 1983 numbers
# carry ~0.1-1% extrapolation error at the higher Ra.
ACCURATE_NU = {1e3: 1.1178, 1e4: 2.2448, 1e5: 4.5216, 1e6: 8.8252}


def create_cavity(n_el: int = 8, order: int = 6, dtype=jnp.float64,
                  grading: float = 0.0):
  """Builds the flow solver + scalar transport for the heated cavity.

  Args:
    grading: wall clustering strength in [0, 1).  Applies the smooth
      map ``x -> x - s sin(2 pi x) / (2 pi)`` to both axes, shrinking
      wall-adjacent elements by ``(1 - s)`` — needed at high Ra where
      the vertical boundary layers thin like ``Ra^(-1/4)``.

  Returns ``(sem, st, theta_lift)`` where `theta_lift` is the conduction
  profile ``1/2 - x`` carrying the hot/cold wall values (the natural
  static Dirichlet lift: it is also the exact zero-Ra solution).
  """
  premesh = unit_cube_mesh(n_el, ndim=2, face_groups=True)
  transform = None
  if grading:
    if not 0.0 <= grading < 1.0:
      raise ValueError(f'grading must be in [0, 1), got {grading}')

    def transform(pm):
      x = pm.node_coords
      return x - grading * np.sin(2 * np.pi * x) / (2 * np.pi)

  sem = StokesSEM.create(
      premesh,
      boundary_conditions={'boundary': (BCType.DIRICHLET, 0.0)},
      order=order, coord_transform=transform)
  st = ScalarTransport.create(
      sem, {'xlo': (BCType.DIRICHLET, 0.5),
            'xhi': (BCType.DIRICHLET, -0.5)})
  coords = np.asarray(sem.velocity.mesh.node_coords)
  theta_lift = jnp.asarray(0.5 - coords[:, 0], dtype=dtype)
  return sem, st, theta_lift


def nusselt_volume(sem: StokesSEM, u: jax.Array, theta: jax.Array):
  """Mean Nusselt via the volume identity ``int (u_x theta - theta_x)``.

  Evaluated on the dealiasing rule so the degree-2N product is integrated
  accurately.  `theta` is the FULL temperature field.
  """
  ov = sem.velocity.overint_space
  uq = ov.vector_function(sem.velocity.gather(u))
  tq = ov.scalar_function(sem.velocity.mesh.gather(theta))

  def integrand(x):
    return uq(x)[..., 0] * tq(x) - grad(tq)(x)[..., 0]

  return ov.integrate(integrand)


def nusselt_wall(sem: StokesSEM, st: ScalarTransport, u: jax.Array,
                 theta: jax.Array, group: str = 'xlo'):
  """Mean Nusselt from the consistent discrete wall flux.

  At steady state the unmasked residual ``A(theta) + C(theta, u)`` (kappa
  is 1 in these units) vanishes on interior rows and equals the weak
  boundary flux ``int (d theta / dn) v ds`` on wall rows; summing over a
  wall's rows tests with v = 1 there.  The outward normal makes this
  ``-int theta_x dy = +Nu`` on the hot wall and ``-Nu`` on the cold wall.
  """
  mesh = st.mesh
  th_local = mesh.gather(theta)
  flux = mesh.scatter(st.A_local(th_local)) + mesh.scatter(
      st.C_local(th_local, sem.velocity.gather(u)))
  mask = jnp.asarray(mesh.physical_masks[group], dtype=theta.dtype)
  return jnp.vdot(mask, flux)


def default_dt(sem: StokesSEM, ra: float) -> float:
  """CFL-style step: peak velocity scales like ~0.25 sqrt(Ra) kappa/L."""
  from swirlfem_tpu.niles.datagen import min_node_spacing
  dx = min_node_spacing(sem.velocity.mesh)
  u_est = max(2.0, 0.3 * float(np.sqrt(ra)))
  return float(0.4 * dx / u_est)


def run_cavity(ra: float, pr: float = 0.71, n_el: int = 8, order: int = 6,
               *, dt: float | None = None, max_steps: int = 200_000,
               steps_per_dispatch: int = 200, steady_tol: float = 1e-6,
               tol: float = 1e-9, dtype=jnp.float64, grading: float = 0.0,
               verbose: bool = False):
  """Marches the heated cavity to steady state; returns fields + Nusselt.

  Steadiness is declared when the max temperature change per unit time
  drops below ``steady_tol * Ra^(1/2)`` (the velocity scale — d theta/dt
  balances u . grad theta, so this bounds the residual convection).

  Returns a dict with ``u``, ``theta`` (full field), ``p``,
  ``nu_volume``, ``nu_hot``, ``nu_cold``, ``u_max``, ``steps``.
  """
  device = jax.devices()[0]
  if device.platform != 'cpu':
    # Build host-side (eager dispatch to a tunneled TPU is latency-bound),
    # then move everything in one pytree-level transfer — the same
    # pattern as niles.datagen.run_simulation.
    with jax.default_device(jax.local_devices(backend='cpu')[0]):
      sem, st, th_b = create_cavity(n_el, order, dtype, grading=grading)
  else:
    sem, st, th_b = create_cavity(n_el, order, dtype, grading=grading)
  if dt is None:
    dt = default_dt(sem, ra)
  # Exact FDM direct solves: the cavity (uniform or wall-graded) is a
  # per-axis tensor-product box, so the viscous, pressure-Schur, and
  # scalar Helmholtz operators are all exactly separable — each CG then
  # certifies convergence in 0-2 iterations instead of O(100) Jacobi-
  # preconditioned iterations (ops.fdm_pressure).
  vprecond = sem.fdm_viscous_preconditioner(pr, dt, 2)
  pprecond = sem.fdm_pressure_preconditioner(dt, 2)
  sprecond = st.fdm_preconditioner(sem, 1.0, dt, 2)
  if device.platform != 'cpu':
    sem, st, th_b = jax.device_put((sem, st, th_b), device)
  nv = sem.velocity.mesh.num_nodes
  u0 = jnp.zeros((nv, 2), dtype=dtype)
  p0 = jnp.zeros(sem.pressure.pspace.mesh.num_nodes, dtype=dtype)
  ey = jnp.asarray([0.0, 1.0], dtype=dtype)

  ext = [float(c) for c in extk_coeffs(k=1)]

  @functools.partial(jax.jit, static_argnames=('n',))
  def advance(us, ps, thetas, cus, n):
    def body(carry, _):
      us, ps, thetas, cus = carry
      # Momentum advection enters through the forcing covector, EXT2-
      # extrapolated from the convection history — `stokes_one_step` is
      # the LINEAR Stokes update (same convention as niles/datagen.py and
      # examples/cylinder.py).  Omitting it solves Stokes+buoyancy: at
      # Ra 1e3 the inertial terms are negligible (Nu matches to 5 digits
      # either way) but at Ra 1e4 they carry 1.3% of Nu (2.2748 vs the
      # grid-converged 2.2448 — confirmed against the independent FD
      # oracle in experiments/fd_cavity_oracle.py).
      cu = sum(e * c for e, c in zip(ext[::-1], cus[::-1]))
      f = sem.B((ra * pr) * thetas[-1][:, None] * ey) - cu
      # alpha=0: the modal stabilization filter is artificial dissipation
      # — harmless for turbulent statistics but a Nu bias on this steady
      # laminar benchmark.
      u, p, _ = sem.stokes_one_step(
          list(us), list(ps), f, mu=pr, dt=dt, time_order=2, alpha=0.0,
          tol=tol, atol=tol, viscous_preconditioner=vprecond,
          pressure_preconditioner=pprecond)
      th, _ = st.one_step(list(thetas), [us[-1], u], kappa=1.0, dt=dt,
                          time_order=2, theta_boundary=th_b, tol=tol,
                          preconditioner=sprecond)
      return ((us[-1], u), (ps[-1], p), (thetas[-1], th),
              (cus[-1], sem.C(u))), None
    carry, _ = jax.lax.scan(body, (us, ps, thetas, cus), None, length=n)
    return carry

  us, ps, thetas = (u0, u0), (p0, p0), (th_b, th_b)
  cus = (sem.C(u0), sem.C(u0))
  steps = 0
  rate_tol = steady_tol * max(1.0, float(np.sqrt(ra)))
  dispatch_walls = []  # first entry includes the jit compile
  import time as _time
  while steps < max_steps:
    th_prev = thetas[-1]
    t0 = _time.perf_counter()
    us, ps, thetas, cus = advance(us, ps, thetas, cus, steps_per_dispatch)
    rate = float(jnp.abs(thetas[-1] - th_prev).max()) / (
        steps_per_dispatch * dt)  # forces sync: wall covers the dispatch
    dispatch_walls.append(_time.perf_counter() - t0)
    steps += steps_per_dispatch
    if verbose:
      print(f'step {steps}: d(theta)/dt {rate:.3e} '
            f'(target {rate_tol:.1e})', flush=True)
    if rate < rate_tol:
      break
  # Steady-state per-step cost: exclude the compile-bearing first dispatch.
  if len(dispatch_walls) > 1:
    ms_per_step_steady = (1e3 * sum(dispatch_walls[1:])
                          / (steps_per_dispatch * (len(dispatch_walls) - 1)))
  else:
    ms_per_step_steady = 1e3 * dispatch_walls[0] / steps_per_dispatch

  u, theta = us[-1], thetas[-1]
  return {
      'u': u, 'theta': theta, 'p': ps[-1], 'dt': dt, 'steps': steps,
      'steady_rate': rate, 'ms_per_step_steady': ms_per_step_steady,
      'nu_volume': float(nusselt_volume(sem, u, theta)),
      'nu_hot': float(nusselt_wall(sem, st, u, theta, 'xlo')),
      'nu_cold': float(-nusselt_wall(sem, st, u, theta, 'xhi')),
      'u_max': float(jnp.abs(u).max()),
      'sem': sem, 'st': st,
  }
