"""NSE validation ladder against the analytic decaying Stokes vortex.

Modeled on the reference test sequence
(``navier_stokes/navier_stokes_test.py:79-358``): operator identities ->
BDF residual -> fractional-step identities -> CG solve -> full step.  The
oracle is the classical decaying Stokes eigenfunction on
[-1, 1] x [-pi, pi] (periodic in y, no-slip in x): with mu solving
``k tanh(k) + mu tan(mu) = 0`` and ``sigma = -nu (k^2 + mu^2)``,

  u = Re{ e^(sigma t + i k y) [f(x), g(x)] },  p = Re{ e^(...) h(x) }

is an exact unsteady Stokes solution with div(u) = 0.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import scipy.optimize

from swirlfem_tpu.core.bc import BCType
from swirlfem_tpu.linalg.cg import cg
from swirlfem_tpu.nse.solver import bdfk_coeffs, extk_coeffs, StokesSEM
from swirlfem_tpu.utils.box import unit_cube_mesh

K = 1.0
ORDER = 7
DT = 1e-3
TIME_ORDER = 3


def _vortex_params(k=K, viscosity=1.0):
  mu = scipy.optimize.newton(lambda x: k * np.tanh(k) + x * np.tan(x), np.pi)
  sigma = -viscosity * (k**2 + mu**2)
  return mu, sigma


def _vortex_solution(vcoords, pcoords, t, k=K, viscosity=1.0):
  mu, sigma = _vortex_params(k, viscosity)
  x_v, y_v = np.asarray(vcoords).T
  x_p, y_p = np.asarray(pcoords).T
  f = np.cos(mu) * np.cosh(k * x_v) - np.cosh(k) * np.cos(mu * x_v)
  g = (1j / k) * (k * np.cos(mu) * np.sinh(k * x_v)
                  + mu * np.cosh(k) * np.sin(mu * x_v))
  h = -(sigma / k) * np.cos(mu) * np.sinh(k * x_p)
  lead_v = np.exp(sigma * t) * np.exp(1j * k * y_v)
  lead_p = np.exp(sigma * t) * np.exp(1j * k * y_p)
  u = np.stack([np.real(lead_v * f), np.real(lead_v * g)], axis=-1)
  p = np.real(lead_p * h)
  return jnp.asarray(u), jnp.asarray(p)


@pytest.fixture(scope='module')
def sem():
  premesh = unit_cube_mesh(9, ndim=2, periodic_dims=(1,))
  coords = np.asarray(premesh.node_coords)
  stretched = np.stack([2 * coords[:, 0] - 1,
                        2 * np.pi * coords[:, 1] - np.pi], axis=-1)
  premesh = premesh.replace(node_coords=stretched)
  return StokesSEM.create(
      premesh, boundary_conditions={'boundary': (BCType.DIRICHLET, 0.0)},
      order=ORDER)


def _states(sem, n, t0=0.0, dt=DT):
  vc = sem.velocity.mesh.node_coords
  pc = sem.pressure.pspace.mesh.node_coords
  return list(zip(*[_vortex_solution(vc, pc, t0 + i * dt) for i in range(n)]))


def test_bdf_ext_coefficients():
  np.testing.assert_allclose(bdfk_coeffs(1), [-1.0, 1.0], atol=1e-12)
  np.testing.assert_allclose(bdfk_coeffs(2), [0.5, -2.0, 1.5], atol=1e-12)
  np.testing.assert_allclose(
      bdfk_coeffs(3), [-1 / 3, 1.5, -3.0, 11 / 6], atol=1e-12)
  np.testing.assert_allclose(extk_coeffs(1), [-1.0, 2.0], atol=1e-12)
  np.testing.assert_allclose(extk_coeffs(2), [1.0, -3.0, 3.0], atol=1e-12)


def test_mesh_sizes(sem):
  assert sem.velocity.mesh.num_elements == 81
  # Periodic images are identified through node_indices, not merged.
  assert sem.velocity.mesh.num_nodes == (9 * ORDER + 1) ** 2
  # Discontinuous pressure: private nodes per element.
  assert sem.pressure.pspace.mesh.num_nodes == 81 * (ORDER - 1) ** 2


@pytest.mark.smoke
def test_momentum_residual(sem):
  """B du/dt + A u - D^T p = 0 for the analytic eigenfunction."""
  (u,), (p,) = _states(sem, 1)
  _, sigma = _vortex_params()
  residual = sem.velocity.exchange(sem.B(sigma * u) + sem.A(u) - sem.Dt(p))
  assert np.abs(np.asarray(residual)).max() < 1e-7


def test_divergence_free(sem):
  (u,), _ = _states(sem, 1)
  assert np.abs(np.asarray(sem.D(u))).max() < 1e-10


def test_bdf_momentum_residual(sem):
  us, ps = _states(sem, TIME_ORDER + 1)
  du_dt = sum(c * u for c, u in zip(bdfk_coeffs(TIME_ORDER), us)) / DT
  residual = sem.velocity.exchange(
      sem.B(du_dt) + sem.A(us[-1]) - sem.Dt(ps[-1]))
  assert np.abs(np.asarray(residual)).max() < 1e-7


def _fractional_step_pieces(sem):
  us, ps = _states(sem, TIME_ORDER + 1)
  us, u_new = list(us[:-1]), us[-1]
  ps, p_new = list(ps[:-1]), ps[-1]
  ext = extk_coeffs(1)
  p_ext = sum(ext[-i] * ps[-i] for i in range(1, len(ext) + 1))
  coeffs = bdfk_coeffs(TIME_ORDER)
  beta_hist, beta_k = coeffs[:-1], coeffs[-1]
  f = -sum(c * u for c, u in zip(beta_hist, us)) / DT
  b = sem.B(f) + sem.Dt(p_ext)
  H = lambda w: (beta_k / DT) * sem.B(w) + sem.A(w)
  Q = lambda w: (DT / beta_k) * sem.Bi(w)
  return us, ps, u_new, p_new, p_ext, b, H, Q


def test_fractional_step_identity(sem):
  """H u - D^T dp = b exactly (coupled form)."""
  _, _, u_new, p_new, p_ext, b, H, _ = _fractional_step_pieces(sem)
  dp = p_new - p_ext
  err = sem.velocity.exchange(H(u_new) - sem.Dt(dp) - b)
  assert np.abs(np.asarray(err)).max() < 1e-7


def test_fractional_step_splitting_error(sem):
  """Replacing D^T dp by H Q D^T dp costs O(dt^2)."""
  _, _, u_new, p_new, p_ext, b, H, Q = _fractional_step_pieces(sem)
  dp = p_new - p_ext
  err = sem.velocity.exchange(H(u_new) - H(Q(sem.Dt(dp))) - b)
  assert np.abs(np.asarray(err)).max() < 10 * DT**2


def test_fractional_step_cg_solve(sem):
  _, _, u_new, p_new, p_ext, b, H, Q = _fractional_step_pieces(sem)
  u_star, _ = cg(H, b, M=sem.velocity.exchange, tol=1e-15)
  residual = sem.velocity.exchange(H(u_star) - b)
  assert np.abs(np.asarray(residual)).max() < 1e-12
  dp = p_new - p_ext
  err = u_star - u_new + Q(sem.Dt(dp))
  assert np.abs(np.asarray(err)).max() < 5 * DT**2


def test_stokes_one_step(sem):
  us, ps = _states(sem, TIME_ORDER + 1)
  us, u_expected = list(us[:-1]), us[-1]
  ps, p_expected = list(ps[:-1]), ps[-1]
  u, p, aux = sem.stokes_one_step(
      us, ps, f=0, mu=1, dt=DT, time_order=TIME_ORDER, alpha=0.05,
      project_out_nullspace=True, tol=1e-12, atol=1e-12)
  assert np.abs(np.asarray(u - u_expected)).max() < 5 * DT**2
  assert np.abs(np.asarray(p - p_expected)).max() < 50 * DT**2
  assert float(aux['u_star_info']['residual']) < 1e-7
  assert float(aux['dp_info']['residual']) < 1e-7


def test_vorticity_closed_form(sem):
  """Vorticity matches d(u1)/dx - d(u0)/dy for a periodic field.

  (The field must respect the mesh's y-periodicity: vorticity averages all
  copies of each dof, including periodic images.)"""
  coords = np.asarray(sem.velocity.mesh.node_coords)
  u = jnp.asarray(np.stack([np.sin(coords[:, 1]),
                            np.sin(np.pi * coords[:, 0])], axis=-1))
  w = sem.vorticity(u)
  expected = np.pi * np.cos(np.pi * coords[:, 0]) - np.cos(coords[:, 1])
  np.testing.assert_allclose(np.asarray(w), expected, atol=1e-6)
