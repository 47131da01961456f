"""Taylor-Green vortex: full nonlinear NSE validation (BASELINE.md target).

The 2D Taylor-Green vortex

    u = ( cos(kx) sin(ky), -sin(kx) cos(ky) ) e^{-2 nu k^2 t}
    p = -1/4 (cos(2kx) + cos(2ky)) e^{-4 nu k^2 t}

is an exact solution of incompressible Navier-Stokes on the periodic square
(the convection term is exactly balanced by the pressure gradient).  We roll
the full solver forward with extrapolated advection (the datagen/NiLES
scheme) and check the velocity error and kinetic-energy decay rate against
the closed form.
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from swirlfem_tpu.nse.solver import extk_coeffs, StokesSEM
from swirlfem_tpu.utils.box import unit_cube_mesh

K = 2 * np.pi
NU = 0.02
DT = 2e-3
ORDER = 7
TIME_ORDER = 2


def _analytic(coords, pcoords, t):
  x, y = np.asarray(coords).T
  decay = np.exp(-2 * NU * K**2 * t)
  u = np.stack([np.cos(K * x) * np.sin(K * y),
                -np.sin(K * x) * np.cos(K * y)], axis=-1) * decay
  xp, yp = np.asarray(pcoords).T
  p = -0.25 * (np.cos(2 * K * xp) + np.cos(2 * K * yp)) * decay**2
  return jnp.asarray(u), jnp.asarray(p)


@pytest.fixture(scope='module')
def sem():
  pm = unit_cube_mesh(4, ndim=2, periodic_dims=(0, 1))
  return StokesSEM.create(pm, boundary_conditions={}, order=ORDER)


def test_taylor_green_rollout(sem):
  vc = sem.velocity.mesh.node_coords
  pc = sem.pressure.pspace.mesh.node_coords
  states = [_analytic(vc, pc, i * DT) for i in range(TIME_ORDER)]
  us = tuple(s[0] for s in states)
  ps = tuple(s[1] for s in states)
  cus = tuple(sem.C(u) for u in us)
  ext = [float(c) for c in extk_coeffs(k=TIME_ORDER - 1)]

  @jax.jit
  def step(us, ps, cus):
    cu = sum(ext[-i] * cus[-i] for i in range(1, len(ext) + 1))
    f = -cu
    u, p, _ = sem.stokes_one_step(
        list(us), list(ps), f, mu=NU, dt=DT, time_order=TIME_ORDER,
        tol=1e-11, atol=1e-11)
    return us[1:] + (u,), ps[1:] + (p,), cus[1:] + (sem.C(u),)

  num_steps = 10
  energies = []
  for _ in range(num_steps):
    us, ps, cus = step(us, ps, cus)
    energies.append(float(jnp.vdot(us[-1], sem.B(us[-1]))))

  t_end = (TIME_ORDER - 1 + num_steps) * DT
  u_exact, _ = _analytic(vc, pc, t_end)
  err = float(jnp.abs(us[-1] - u_exact).max())
  assert err < 5e-4, err

  # Kinetic-energy decay rate matches 4 nu k^2.
  rate = np.log(energies[-1] / energies[0]) / ((num_steps - 1) * DT)
  np.testing.assert_allclose(rate, -4 * NU * K**2, rtol=2e-2)

  # Divergence stays spectrally small.
  div = float(jnp.abs(sem.D(us[-1])).max())
  assert div < 1e-8, div


def test_taylor_green_3d_extruded_rollout():
  """Quantitative 3D NSE validation: the 2D vortex extruded along z.

  ``u = (TG2D(x, y), 0)`` with z-independent data solves the 3D equations
  exactly (w = 0, nothing depends on z), so the full 3D pipeline —
  3D operators, hex pressure solve, 3D dealiased convection — is checked
  against the closed form, including that the spanwise velocity and
  z-gradients stay at solver tolerance.
  """
  order, dt, nu, time_order = 5, 2e-3, 0.05, 2
  pm = unit_cube_mesh(3, ndim=3, periodic_dims=(0, 1, 2))
  sem3 = StokesSEM.create(pm, boundary_conditions={}, order=order)
  vc = np.asarray(sem3.velocity.mesh.node_coords)
  pc = np.asarray(sem3.pressure.pspace.mesh.node_coords)

  def ana(t):
    x, y = vc[:, 0], vc[:, 1]
    decay = np.exp(-2 * nu * K**2 * t)
    u = np.stack([np.cos(K * x) * np.sin(K * y),
                  -np.sin(K * x) * np.cos(K * y),
                  np.zeros_like(x)], axis=-1) * decay
    xp, yp = pc[:, 0], pc[:, 1]
    p = -0.25 * (np.cos(2 * K * xp) + np.cos(2 * K * yp)) * decay**2
    return jnp.asarray(u), jnp.asarray(p)

  states = [ana(i * dt) for i in range(time_order)]
  us = tuple(s[0] for s in states)
  ps = tuple(s[1] for s in states)
  cus = tuple(sem3.C(u) for u in us)
  ext = [float(c) for c in extk_coeffs(k=time_order - 1)]

  @jax.jit
  def step(us, ps, cus):
    cu = sum(ext[-i] * cus[-i] for i in range(1, len(ext) + 1))
    u, p, _ = sem3.stokes_one_step(
        list(us), list(ps), -cu, mu=nu, dt=dt, time_order=time_order,
        tol=1e-11, atol=1e-11)
    return us[1:] + (u,), ps[1:] + (p,), cus[1:] + (sem3.C(u),)

  num_steps = 5
  for _ in range(num_steps):
    us, ps, cus = step(us, ps, cus)

  t_end = (time_order - 1 + num_steps) * dt
  u_exact, _ = ana(t_end)
  err = float(jnp.abs(us[-1] - u_exact).max())
  # Spatial (spectral) error dominates: measured 9.5e-3 / 3.0e-3 / 6.2e-4
  # at orders 4/5/6 on the 3^3 mesh.
  assert err < 5e-3, err
  # The spanwise component stays at solver tolerance (exactly 0
  # analytically; measured ~3e-11).
  assert float(jnp.abs(us[-1][:, 2]).max()) < 1e-9
  div = float(jnp.abs(sem3.D(us[-1])).max())
  assert div < 1e-7, div


def test_taylor_green_spectral_convergence():
  """BASELINE.md row: spectral (exponential-in-order) spatial convergence.

  Rolls the full nonlinear solver at orders 3 / 5 / 7 on the same 4x4
  periodic mesh with a fixed small dt, so the terminal error is dominated
  by the spatial discretization; each +2 in order must cut the error by
  at least 8x (exponential, not low-order-polynomial, decay).
  """
  dt, num_steps = 2e-3, 4

  def run(order):
    pm = unit_cube_mesh(4, ndim=2, periodic_dims=(0, 1))
    semo = StokesSEM.create(pm, boundary_conditions={}, order=order)
    vc = semo.velocity.mesh.node_coords
    pc = semo.pressure.pspace.mesh.node_coords
    states = [_analytic(vc, pc, i * dt) for i in range(TIME_ORDER)]
    us = tuple(s[0] for s in states)
    ps = tuple(s[1] for s in states)
    cus = tuple(semo.C(u) for u in us)
    ext = [float(c) for c in extk_coeffs(k=TIME_ORDER - 1)]

    @jax.jit
    def step(us, ps, cus):
      cu = sum(ext[-i] * cus[-i] for i in range(1, len(ext) + 1))
      u, p, _ = semo.stokes_one_step(
          list(us), list(ps), -cu, mu=NU, dt=dt, time_order=TIME_ORDER,
          tol=1e-12, atol=1e-12)
      return us[1:] + (u,), ps[1:] + (p,), cus[1:] + (semo.C(u),)

    for _ in range(num_steps):
      us, ps, cus = step(us, ps, cus)
    t_end = (TIME_ORDER - 1 + num_steps) * dt
    u_exact, _ = _analytic(vc, pc, t_end)
    return float(jnp.abs(us[-1] - u_exact).max())

  errs = [run(order) for order in (3, 5, 7)]
  assert errs[0] > 8 * errs[1] > 64 * errs[2], errs


def test_taylor_green_dt_convergence(sem):
  """Halving dt reduces the terminal error ~4x (second-order scheme)."""
  vc = sem.velocity.mesh.node_coords
  pc = sem.pressure.pspace.mesh.node_coords

  # Use a larger viscosity so the O(dt^2) temporal error clears the
  # spectral floor while dt stays safely below the advective CFL limit
  # (dt >= ~8e-3 is marginally unstable at this resolution).
  nu = 0.1

  def _ana(t):
    x, y = np.asarray(vc).T
    decay = np.exp(-2 * nu * K**2 * t)
    u = np.stack([np.cos(K * x) * np.sin(K * y),
                  -np.sin(K * x) * np.cos(K * y)], axis=-1) * decay
    xp, yp = np.asarray(pc).T
    p = -0.25 * (np.cos(2 * K * xp) + np.cos(2 * K * yp)) * decay**2
    return jnp.asarray(u), jnp.asarray(p)

  def run(dt, num_steps):
    states = [_ana(i * dt) for i in range(TIME_ORDER)]
    us = tuple(s[0] for s in states)
    ps = tuple(s[1] for s in states)
    cus = tuple(sem.C(u) for u in us)
    ext = [float(c) for c in extk_coeffs(k=TIME_ORDER - 1)]

    @jax.jit
    def step(us, ps, cus):
      cu = sum(ext[-i] * cus[-i] for i in range(1, len(ext) + 1))
      u, p, _ = sem.stokes_one_step(
          list(us), list(ps), -cu, mu=nu, dt=dt, time_order=TIME_ORDER,
          tol=1e-12, atol=1e-12)
      return us[1:] + (u,), ps[1:] + (p,), cus[1:] + (sem.C(u),)

    for _ in range(num_steps):
      us, ps, cus = step(us, ps, cus)
    t_end = (TIME_ORDER - 1 + num_steps) * dt
    u_exact, _ = _ana(t_end)
    return float(jnp.abs(us[-1] - u_exact).max())

  e_coarse = run(4e-3, 4)
  e_fine = run(2e-3, 8)
  assert e_fine < 0.35 * e_coarse, (e_coarse, e_fine)


def test_taylor_green_3d_energy_balance():
  """Full 3D TGV on the el-form fast path: the energy budget closes.

  For the triply periodic box, -dE/dt must equal the resolved viscous
  dissipation eps = mu <|grad u|^2> up to time-discretization and
  under-resolution error.  Right after the BDF startup transient the
  balance holds to ~1e-4 relative; it degrades smoothly as the cascade
  steepens beyond this deliberately coarse grid — both regimes are
  asserted, plus the exact initial dissipation of the analytic field
  (eps(0) = nu <|omega|^2> = 0.75 nu).
  """
  from swirlfem_tpu.examples import taylor_green_3d as tg

  re = 400.0
  r = tg.run_tgv(re=re, n_el=4, order=4, t_end=0.3, dt=2e-3,
                 dtype=jnp.float64, steps_per_chunk=50, tol=1e-9)
  ke, diss, dedt = r['ke'], r['dissipation'], r['dedt']
  assert abs(ke[0] - 0.125) < 2e-3, ke[0]           # KE(0) = 1/8
  assert abs(diss[0] - 0.75 / re) < 2e-5, diss[0]   # eps(0) = 0.75 nu
  assert np.all(np.diff(ke) < 0)                    # monotone decay
  rel = np.abs(dedt - diss) / diss
  window = rel[10:60]
  assert np.median(window) < 2e-3, np.median(window)
  assert window.max() < 2e-2, window.max()
