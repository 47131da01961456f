"""Independent finite-difference oracle for the heated-cavity benchmark.

Completely independent discretization of the de Vahl Davis problem to
arbitrate the spectral-element result: second-order central differences
on a uniform grid in the vorticity-streamfunction formulation (Thom
no-slip vorticity, backward-Euler semi-implicit march whose fixed point
is the exact steady second-order discrete system), marched to steady
state on a grid ladder with Richardson extrapolation of the mean hot-wall
Nusselt number.

Shares NOTHING with swirlfem_tpu's solver: different variables
(vorticity/streamfunction vs velocity/pressure), different spatial
discretization (FD2 vs spectral elements), different time scheme
(BE vs BDF2 fractional step), different linear algebra (scipy sparse LU
vs matrix-free CG).  Agreement between the two is strong evidence both
solve the stated PDE; disagreement localizes a formulation bug.

Equations (kappa-scaled, theta in [-1/2, 1/2], Pr = 0.71):
    omega_t + u omega_x + v omega_y = Pr lap(omega) + Ra Pr theta_x
    theta_t + u theta_x + v theta_y = lap(theta)
    lap(psi) = -omega,  u = psi_y,  v = -psi_x
BCs: psi = 0 and no-slip on all walls (Thom), theta = +-1/2 on the
vertical walls, adiabatic horizontal walls (mirrored stencil).

Run: python experiments/fd_cavity_oracle.py --ra 1e4 --grids 64 128 256
"""

import argparse
import json
import time

import numpy as np
import scipy.sparse as sp
import scipy.sparse.linalg as spla


def lap1d(n, h):
  """1D Laplacian on n interior points, Dirichlet ends (values in rhs)."""
  main = -2.0 * np.ones(n)
  off = np.ones(n - 1)
  return sp.diags([off, main, off], [-1, 0, 1]) / h**2


def run_case(ra, n, pr=0.71, t_end=3.0, cfl=0.6, steady_tol=1e-8,
             verbose=False):
  """Marches an (n+1)^2-node cavity to steady state; returns Nusselt data.

  Fully explicit FTCS march (forward Euler, central differences): the
  standard stable pairing with Thom's explicit wall vorticity.  dt obeys
  both the diffusive limit h^2/(4 max(1, Pr)) and the advective CFL; the
  fixed point of the march is the exact steady second-order system.
  """
  h = 1.0 / n
  x = np.linspace(0.0, 1.0, n + 1)
  ni = n - 1  # interior count per axis

  # psi: interior x interior, Dirichlet 0 -> plain Kronecker Laplacian.
  li = lap1d(ni, h)
  ii = sp.identity(ni)
  lap_dir = sp.csr_matrix(sp.kron(li, ii) + sp.kron(ii, li))
  psi_lu = spla.splu(sp.csc_matrix(-lap_dir))

  u_max_est = max(2.0, 0.35 * np.sqrt(ra))
  dt = min(cfl * h / u_max_est, 0.2 * h**2 / max(1.0, pr))

  # -- state ----------------------------------------------------------------
  nf = n + 1
  theta = np.tile(0.5 - x[:, None], (1, nf))    # (nf, nf) conduction start
  theta[0], theta[-1] = 0.5, -0.5
  omega = np.zeros((nf, nf))

  num_steps = int(round(t_end / dt))
  check_every = max(200, int(round(0.02 / dt)))
  t0 = time.time()
  for step in range(1, num_steps + 1):
    # 1. streamfunction + velocities (psi = 0 on walls).
    psi = np.zeros((nf, nf))
    psi[1:-1, 1:-1] = psi_lu.solve(
        omega[1:-1, 1:-1].reshape(-1)).reshape(ni, ni)
    u = np.zeros((nf, nf))  # u = dpsi/dy
    v = np.zeros((nf, nf))  # v = -dpsi/dx
    u[:, 1:-1] = (psi[:, 2:] - psi[:, :-2]) / (2 * h)
    v[1:-1, :] = -(psi[2:, :] - psi[:-2, :]) / (2 * h)

    # 2. Thom wall vorticity: omega_w = -2 psi_1 / h^2 (no-slip walls).
    omega[0, :] = -2.0 * psi[1, :] / h**2
    omega[-1, :] = -2.0 * psi[-2, :] / h**2
    omega[:, 0] = -2.0 * psi[:, 1] / h**2
    omega[:, -1] = -2.0 * psi[:, -2] / h**2

    # 3. theta update: interior + adiabatic y-walls (mirrored stencil).
    thx = (theta[2:, :] - theta[:-2, :]) / (2 * h)          # (ni, nf)
    thy = np.zeros((ni, nf))
    thy[:, 1:-1] = (theta[1:-1, 2:] - theta[1:-1, :-2]) / (2 * h)
    lap_th = np.empty((ni, nf))
    lap_th[:, 1:-1] = (
        theta[2:, 1:-1] + theta[:-2, 1:-1] + theta[1:-1, 2:]
        + theta[1:-1, :-2] - 4 * theta[1:-1, 1:-1]) / h**2
    # adiabatic walls: ghost = mirror.
    lap_th[:, 0] = (theta[2:, 0] + theta[:-2, 0] + 2 * theta[1:-1, 1]
                    - 4 * theta[1:-1, 0]) / h**2
    lap_th[:, -1] = (theta[2:, -1] + theta[:-2, -1] + 2 * theta[1:-1, -2]
                     - 4 * theta[1:-1, -1]) / h**2
    dtheta = -u[1:-1, :] * thx - v[1:-1, :] * thy + lap_th
    theta_new = theta.copy()
    theta_new[1:-1, :] += dt * dtheta

    # 4. omega update (interior; buoyancy central in x).
    adv_w = (u[1:-1, 1:-1] * (omega[2:, 1:-1] - omega[:-2, 1:-1])
             + v[1:-1, 1:-1] * (omega[1:-1, 2:] - omega[1:-1, :-2])) / (2 * h)
    lap_w = (omega[2:, 1:-1] + omega[:-2, 1:-1] + omega[1:-1, 2:]
             + omega[1:-1, :-2] - 4 * omega[1:-1, 1:-1]) / h**2
    buoy = ra * pr * (theta_new[2:, 1:-1] - theta_new[:-2, 1:-1]) / (2 * h)
    omega[1:-1, 1:-1] += dt * (-adv_w + pr * lap_w + buoy)

    rate = np.abs(theta_new - theta).max() / dt
    theta = theta_new
    if step % check_every == 0:
      if verbose:
        print(f'  n={n} step {step}/{num_steps} t={step*dt:.3f} '
              f'd(theta)/dt={rate:.2e} ({time.time()-t0:.0f} s)', flush=True)
      if rate < steady_tol * max(1.0, np.sqrt(ra)):
        break

  # -- Nusselt --------------------------------------------------------------
  # 2nd-order one-sided flux at the hot wall, trapezoid in y.
  dthdx_wall = (-3 * theta[0, :] + 4 * theta[1, :] - theta[2, :]) / (2 * h)
  nu_hot = -np.trapezoid(dthdx_wall, dx=h)
  dthdx_wall_c = (3 * theta[-1, :] - 4 * theta[-2, :] + theta[-3, :]) / (2 * h)
  nu_cold = -np.trapezoid(dthdx_wall_c, dx=h)
  # Volume identity int (u theta - theta_x).
  dthdx = np.gradient(theta, h, axis=0)
  nu_vol = np.trapezoid(np.trapezoid(u * theta - dthdx, dx=h, axis=1), dx=h)
  return {
      'n': n, 'dt': dt, 'steps': step, 'steady_rate': float(rate),
      'nu_hot': float(nu_hot), 'nu_cold': float(nu_cold),
      'nu_volume': float(nu_vol),
      'u_max': float(max(np.abs(u).max(), np.abs(v).max())),
      'wall_s': round(time.time() - t0, 1),
  }


def main():
  ap = argparse.ArgumentParser()
  ap.add_argument('--ra', type=float, default=1e4)
  ap.add_argument('--grids', type=int, nargs='*', default=[64, 128, 256])
  ap.add_argument('--t_end', type=float, default=3.0)
  ap.add_argument('--out', default=None)
  args = ap.parse_args()

  cases = []
  for ngrid in args.grids:
    r = run_case(args.ra, ngrid, t_end=args.t_end, verbose=True)
    print(f"n={ngrid}: Nu_hot {r['nu_hot']:.6f} Nu_cold {r['nu_cold']:.6f} "
          f"Nu_vol {r['nu_volume']:.6f} u_max {r['u_max']:.4f} "
          f"steps {r['steps']} ({r['wall_s']} s)", flush=True)
    cases.append(r)

  result = {'ra': args.ra, 'cases': cases}
  if len(cases) >= 2 and cases[-1]['n'] == 2 * cases[-2]['n']:
    # Richardson (2nd order): Nu = Nu_h2 + (Nu_h2 - Nu_h)/3.
    nu = cases[-1]['nu_hot'] + (cases[-1]['nu_hot'] - cases[-2]['nu_hot']) / 3
    result['nu_richardson'] = nu
    print(f'Richardson-extrapolated Nu: {nu:.6f}')
  if args.out:
    with open(args.out, 'w') as fh:
      json.dump(result, fh, indent=2)
    print(f'wrote {args.out}')


if __name__ == '__main__':
  main()
