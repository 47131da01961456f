"""Fast-diagonalization pressure solver: exactness + solver integration.

The FDM inverse must reproduce E^{-1} exactly (to rounding) on uniform
boxes for every per-axis BC combination, in 2D and 3D — geometries the
block-FFT solver cannot handle (it needs full periodicity and 2D).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from swirlfem_tpu.core.bc import BCType
from swirlfem_tpu.nse.solver import StokesSEM
from swirlfem_tpu.ops.fdm_pressure import build_fdm_pressure_solver
from swirlfem_tpu.ops.fdm_pressure import is_uniform_box
from swirlfem_tpu.utils.box import unit_cube_mesh

DIRICHLET = {'boundary': (BCType.DIRICHLET, 0.0)}


def _make(ndim, periodic_dims, bcs, n=6, order=4):
  pm = unit_cube_mesh(n, ndim=ndim, periodic_dims=periodic_dims)
  return StokesSEM.create(pm, boundary_conditions=bcs, order=order)


CASES = [
    ('2d_periodic', 2, (0, 1), {}, 6, 4),
    ('2d_cavity', 2, (), DIRICHLET, 6, 4),
    ('2d_channel', 2, (0,), DIRICHLET, 6, 4),
    ('3d_periodic', 3, (0, 1, 2), {}, 3, 3),
    ('3d_cavity', 3, (), DIRICHLET, 3, 3),
]


@pytest.mark.parametrize('name,ndim,pdims,bcs,n,order', CASES)
def test_fdm_inverts_schur_operator(name, ndim, pdims, bcs, n, order):
  sem = _make(ndim, pdims, bcs, n=n, order=order)
  assert is_uniform_box(sem)
  dt, time_order = 1e-3, 2
  solve = build_fdm_pressure_solver(sem, dt, time_order)
  assert solve.has_nullspace  # enclosed / periodic: constant pressure mode

  rng = np.random.default_rng(0)
  r = rng.standard_normal(sem.pressure.pspace.mesh.num_nodes)
  r = r - r.mean()
  back = np.array(sem.E(solve(jnp.asarray(r)), dt=dt, time_order=time_order))
  back = back - back.mean()
  np.testing.assert_allclose(back, r, atol=1e-10 * np.abs(r).max())


def test_fdm_rejects_nonseparable_mesh():
  # A warp mixing the axes (x-shift depending on y) breaks separability.
  pm = unit_cube_mesh(4, ndim=2)
  coords = np.asarray(pm.node_coords).copy()
  coords[:, 0] += 0.05 * np.sin(np.pi * coords[:, 0]) * coords[:, 1]
  pm = pm.replace(node_coords=coords)
  sem = StokesSEM.create(pm, boundary_conditions=DIRICHLET, order=3)
  from swirlfem_tpu.ops.fdm_pressure import is_separable_box
  assert not is_uniform_box(sem)
  assert not is_separable_box(sem)
  assert sem.fdm_pressure_preconditioner(1e-3, 2) is None


def _graded_cavity(n=5, order=4, grading=0.4):
  from swirlfem_tpu.examples.natural_convection import create_cavity
  sem, st, _ = create_cavity(n_el=n, order=order, grading=grading)
  return sem, st


def test_fdm_exact_on_graded_box():
  # Per-axis grading keeps the operators exactly separable: the FDM
  # inverse must still be exact (not just spectrally close) on the
  # wall-clustered cavity mesh used at high Ra.
  from swirlfem_tpu.ops.fdm_pressure import is_separable_box
  sem, _ = _graded_cavity()
  assert not is_uniform_box(sem)
  assert is_separable_box(sem)
  dt, time_order = 1e-3, 2

  solve = build_fdm_pressure_solver(sem, dt, time_order)
  rng = np.random.default_rng(0)
  r = rng.standard_normal(sem.pressure.pspace.mesh.num_nodes)
  r = r - r.mean()
  back = np.array(sem.E(solve(jnp.asarray(r)), dt=dt, time_order=time_order))
  back = back - back.mean()
  np.testing.assert_allclose(back, r, atol=1e-9 * np.abs(r).max())

  from swirlfem_tpu.nse.solver import bdfk_coeffs
  from swirlfem_tpu.ops.fdm_pressure import build_fdm_helmholtz_solver
  mu = 3e-3
  hsolve = build_fdm_helmholtz_solver(sem, time_order)
  beta_k = float(bdfk_coeffs(time_order)[-1])
  nv = sem.velocity.mesh.num_nodes
  raw = rng.standard_normal((nv, 2))
  mult = sem.velocity.vspace.mesh.exchange(sem.velocity.diag_qqt)
  u = sem.velocity.exchange(jnp.asarray(raw)) / mult[:, None]
  u = sem.velocity.interior_mask * u
  r = (beta_k / dt) * sem.B(u) + mu * sem.A(u)
  x = jnp.stack([hsolve(r[:, j], mu, dt) for j in range(2)], axis=-1)
  np.testing.assert_allclose(np.asarray(x), np.asarray(u),
                             atol=1e-10 * float(jnp.abs(u).max()))


def test_cavity_pressure_converges_in_one_iteration():
  sem = _make(2, (), DIRICHLET, n=6, order=4)
  dt, time_order = 2e-3, 2
  precond = sem.best_pressure_preconditioner(dt, time_order)
  assert precond is not None

  from swirlfem_tpu.examples.cavity import lid_boundary_field
  ub = lid_boundary_field(sem)
  nv = sem.velocity.mesh.num_nodes
  u0 = jnp.zeros((nv, 2))
  p0 = jnp.zeros(sem.pressure.pspace.mesh.num_nodes)

  _, _, aux = jax.jit(lambda: sem.stokes_one_step(
      [u0, u0], [p0, p0], -sem.C(ub), mu=1e-2, dt=dt,
      time_order=time_order, u_boundary=ub, tol=1e-8, atol=1e-10,
      pressure_preconditioner=precond))()
  # Richardson sweeps + CG certification: a handful total, vs O(100) plain.
  assert int(aux['dp_info']['num_iterations']) <= 3


def test_best_preconditioner_prefers_fdm_when_periodic():
  sem = _make(2, (0, 1), {}, n=6, order=4)
  precond = sem.best_pressure_preconditioner(1e-3, 2)
  # FDM is preferred even where FFT applies (f32 accuracy); the FFT path
  # would expose its Jacobi companion diagonal.
  assert precond is not None
  assert not hasattr(precond, 'jacobi_diag_el')


@pytest.mark.parametrize('name,ndim,pdims,bcs,n,order', CASES)
def test_fdm_helmholtz_inverts_viscous_operator(name, ndim, pdims, bcs, n,
                                                order):
  from swirlfem_tpu.nse.solver import bdfk_coeffs
  from swirlfem_tpu.ops.fdm_pressure import build_fdm_helmholtz_solver

  sem = _make(ndim, pdims, bcs, n=n, order=order)
  mu, dt, time_order = 3e-3, 1e-3, 2
  solve = build_fdm_helmholtz_solver(sem, time_order)
  beta_k = float(bdfk_coeffs(time_order)[-1])

  rng = np.random.default_rng(0)
  nv = sem.velocity.mesh.num_nodes
  raw = rng.standard_normal((nv, ndim))
  mult = sem.velocity.vspace.mesh.exchange(sem.velocity.diag_qqt)
  u = sem.velocity.exchange(jnp.asarray(raw)) / mult[:, None]
  u = sem.velocity.interior_mask * u  # continuous, Dirichlet-masked
  r = (beta_k / dt) * sem.B(u) + mu * sem.A(u)
  x = jnp.stack([solve(r[:, j], mu, dt) for j in range(ndim)], axis=-1)
  np.testing.assert_allclose(np.asarray(x), np.asarray(u),
                             atol=1e-11 * float(jnp.abs(u).max()))


def test_viscous_seed_zero_iterations():
  sem = _make(2, (0, 1), {}, n=8, order=6)
  mu, dt, time_order = 1e-3, 1e-3, 2
  vprecond = sem.fdm_viscous_preconditioner(mu, dt, time_order)
  assert vprecond is not None
  vc = np.asarray(sem.velocity.mesh.node_coords)
  u0 = tuple(jnp.asarray(np.sin(2 * np.pi * vc[:, 1 - j]))
             for j in range(2))
  p0 = jnp.zeros(sem.pressure.pspace.mesh.num_nodes)

  u_ref, p_ref, _ = sem.stokes_one_step(
      [u0, u0], [p0, p0], 0, mu=mu, dt=dt, time_order=time_order, tol=1e-12)
  u, p, aux = sem.stokes_one_step(
      [u0, u0], [p0, p0], 0, mu=mu, dt=dt, time_order=time_order, tol=1e-12,
      viscous_preconditioner=vprecond)
  assert int(aux['u_star_info']['num_iterations']) == 0
  for j in range(2):
    np.testing.assert_allclose(np.asarray(u[j]), np.asarray(u_ref[j]),
                               atol=1e-10)
  np.testing.assert_allclose(np.asarray(p), np.asarray(p_ref), atol=1e-9)


def test_exact_solves_el_step_matches_certified():
  from swirlfem_tpu.utils.box import unit_cube_mesh as ucm
  sem = _make(2, (0, 1), {}, n=8, order=5)
  mu, dt, to = 1e-3, 1e-3, 2
  vp_el, pp_el = sem.fdm_el_preconditioners(mu, dt, to)
  vc = np.asarray(sem.velocity.mesh.node_coords)
  u0 = tuple(jnp.asarray(np.sin(2 * np.pi * vc[:, 1 - j])) for j in range(2))
  us_el = sem.velocity_to_el(u0)
  p_el = sem.pressure_to_el(jnp.zeros(sem.pressure.pspace.mesh.num_nodes))
  f_el = tuple(jnp.zeros_like(c) for c in us_el)
  kwargs = dict(mu=mu, dt=dt, time_order=to, tol=1e-11,
                pressure_preconditioner_el=pp_el,
                viscous_preconditioner_el=vp_el)
  u_ref, p_ref, _ = sem.stokes_one_step_el(
      [us_el, us_el], [p_el, p_el], f_el, **kwargs)
  u, p, aux = sem.stokes_one_step_el(
      [us_el, us_el], [p_el, p_el], f_el, exact_solves=True, **kwargs)
  for j in range(2):
    np.testing.assert_allclose(np.asarray(u[j]), np.asarray(u_ref[j]),
                               atol=1e-10)
  np.testing.assert_allclose(np.asarray(p), np.asarray(p_ref), atol=1e-9)
  assert int(aux['u_star_info']['num_iterations']) == 0

  # Gradients flow through the exact-direct solves too.
  def loss(theta):
    f = tuple(theta * c for c in us_el)
    u, _, _ = sem.stokes_one_step_el(
        [us_el, us_el], [p_el, p_el], f, exact_solves=True, **kwargs)
    return sum(jnp.vdot(w, w) for w in u)
  g = jax.grad(loss)(0.1)
  eps = 1e-6
  fd = (loss(0.1 + eps) - loss(0.1 - eps)) / (2 * eps)
  np.testing.assert_allclose(np.asarray(g), np.asarray(fd), rtol=1e-6)
