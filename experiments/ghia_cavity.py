"""Lid-driven cavity centerline validation vs Ghia, Ghia & Shin (1982).

The canonical SEM validation case (VERDICT r3 #8): unit square, no-slip
walls, unit lid (non-leaky: corner nodes held at zero so the lid field
stays compatible with the side walls), time-stepped to steady state at
Re 100 and Re 1000.  The steady centerline profiles u(0.5, y) and
v(x, 0.5) are compared against the 129x129 multigrid solution tabulated by
Ghia et al., J. Comput. Phys. 48 (1982), Tables I-II — the standard
literature oracle for this flow (Ghia's own data carry ~1-2% error vs
spectral benchmarks at Re 1000, which sets the tolerance).

Reference framework parity: the reference ships the cavity only as a
3-step smoke test (``swirl_fem/navier_stokes/navier_stokes_test.py``);
steady-state literature validation is beyond-parity evidence.

Run (TPU):  python experiments/ghia_cavity.py
Run (CPU):  python experiments/ghia_cavity.py --cpu --re 100 --order 4 \
    --n_el 8 --t_end 10
Writes ``experiments/ghia_cavity_result.json``.
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# Ghia, Ghia & Shin (1982), Table I: u through the vertical centerline.
GHIA_Y = [0.0000, 0.0547, 0.0625, 0.0703, 0.1016, 0.1719, 0.2813, 0.4531,
          0.5000, 0.6172, 0.7344, 0.8516, 0.9531, 0.9609, 0.9688, 0.9766,
          1.0000]
GHIA_U = {
    100: [0.00000, -0.03717, -0.04192, -0.04775, -0.06434, -0.10150,
          -0.15662, -0.21090, -0.20581, -0.13641, 0.00332, 0.23151,
          0.68717, 0.73722, 0.78871, 0.84123, 1.00000],
    1000: [0.00000, -0.18109, -0.20196, -0.22220, -0.29730, -0.38289,
           -0.27805, -0.10648, -0.06080, 0.05702, 0.18719, 0.33304,
           0.46604, 0.51117, 0.57492, 0.65928, 1.00000],
}
# Table II: v through the horizontal centerline.
GHIA_X = [0.0000, 0.0625, 0.0703, 0.0781, 0.0938, 0.1563, 0.2266, 0.2344,
          0.5000, 0.8047, 0.8594, 0.9063, 0.9453, 0.9531, 0.9609, 0.9688,
          1.0000]
GHIA_V = {
    100: [0.00000, 0.09233, 0.10091, 0.10890, 0.12317, 0.16077, 0.17507,
          0.17527, 0.05454, -0.24533, -0.22445, -0.16914, -0.10313,
          -0.08864, -0.07391, -0.05906, 0.00000],
    1000: [0.00000, 0.27485, 0.29012, 0.30353, 0.32627, 0.37095, 0.33075,
           0.32235, 0.02526, -0.31966, -0.42665, -0.51550, -0.39188,
           -0.33714, -0.27669, -0.21388, 0.00000],
}


def run_case(re, n_el, order, dt, t_end, steps_per_chunk, steady_tol,
             verbose=False):
  import jax
  import jax.numpy as jnp
  import numpy as np

  from swirlfem_tpu.core.bc import BCType
  from swirlfem_tpu.nse.solver import extk_coeffs, StokesSEM
  from swirlfem_tpu.utils.box import unit_cube_mesh

  device = jax.devices()[0]
  build_dev = (jax.local_devices(backend='cpu')[0]
               if device.platform != 'cpu' else device)
  with jax.default_device(build_dev):
    premesh = unit_cube_mesh(n_el, ndim=2)
    sem = StokesSEM.create(
        premesh, boundary_conditions={'boundary': (BCType.DIRICHLET, 0.0)},
        order=order)
    time_order = 2
    precond = sem.best_pressure_preconditioner(dt, time_order)
    vprecond = sem.fdm_viscous_preconditioner(1.0 / re, dt, time_order)
  sem = jax.device_put(sem, device)

  coords = np.asarray(sem.velocity.mesh.node_coords)
  dtype = coords.dtype
  # Non-leaky unit lid: u = (1, 0) on y = 1 except the two corner nodes.
  on_lid = np.abs(coords[:, 1] - 1.0) < 1e-12
  corner = on_lid & ((coords[:, 0] < 1e-12) | (coords[:, 0] > 1 - 1e-12))
  ub = np.zeros_like(coords)
  ub[:, 0] = np.where(on_lid & ~corner, 1.0, 0.0)
  u_boundary = jax.device_put(jnp.asarray(ub, dtype=dtype), device)

  nv = sem.velocity.mesh.num_nodes
  npn = sem.pressure.pspace.mesh.num_nodes
  u0 = jnp.zeros((nv, 2), dtype=dtype)
  p0 = jnp.zeros(npn, dtype=dtype)
  ext = [float(c) for c in extk_coeffs(k=time_order - 1)]

  us = (u0,) * time_order
  ps = (p0,) * time_order
  cus = tuple(sem.C(u + u_boundary) for u in us)

  @jax.jit
  def advance(us, ps, cus):
    def body(carry, _):
      us, ps, cus = carry
      cu = sum(ext[-i] * cus[-i] for i in range(1, len(ext) + 1))
      u, p, _ = sem.stokes_one_step(
          list(us), list(ps), -cu, mu=1.0 / re, dt=dt,
          time_order=time_order, u_boundary=u_boundary, tol=0.0, atol=1e-8,
          pressure_preconditioner=precond, viscous_preconditioner=vprecond)
      return (us[1:] + (u - u_boundary,), ps[1:] + (p,),
              cus[1:] + (sem.C(u),)), None
    (us, ps, cus), _ = jax.lax.scan(body, (us, ps, cus), None,
                                    length=steps_per_chunk)
    return us, ps, cus

  num_chunks = max(1, int(round(t_end / (dt * steps_per_chunk))))
  t0 = time.time()
  steady_residual = None
  steps_run = 0
  for i in range(num_chunks):
    u_prev = us[-1]
    us, ps, cus = advance(us, ps, cus)
    steps_run += steps_per_chunk
    # Steady-state residual ||du/dt||_inf on the interior field.
    steady_residual = float(
        jnp.abs(us[-1] - u_prev).max() / (dt * steps_per_chunk))
    if verbose:
      print(f'  t {(i + 1) * steps_per_chunk * dt:7.2f}  '
            f'|du/dt| {steady_residual:.3e}  '
            f'wall {time.time() - t0:.1f} s', flush=True)
    if not np.isfinite(steady_residual):
      raise FloatingPointError(f'cavity Re {re} blew up at chunk {i}')
    if steady_residual < steady_tol:
      break
  wall = time.time() - t0

  u = np.asarray(us[-1] + u_boundary)

  def centerline(axis):
    """Profile of u[axis] along the centerline {x_axis = 0.5}.

    axis=0: u_x through the vertical line x = 0.5 (Ghia Table I);
    axis=1: u_y through the horizontal line y = 0.5 (Ghia Table II).
    """
    sel = np.abs(coords[:, axis] - 0.5) < 1e-12
    pos = coords[sel, 1 - axis]
    vals = u[sel, axis]
    order_idx = np.argsort(pos)
    pos, vals = pos[order_idx], vals[order_idx]
    uniq, inv = np.unique(np.round(pos, 12), return_inverse=True)
    avg = np.zeros_like(uniq)
    cnt = np.zeros_like(uniq)
    np.add.at(avg, inv, vals)
    np.add.at(cnt, inv, 1.0)
    return uniq, avg / cnt

  y_line, u_line = centerline(axis=0)   # u(0.5, y)
  x_line, v_line = centerline(axis=1)   # v(x, 0.5)
  u_at = np.interp(GHIA_Y, y_line, u_line)
  v_at = np.interp(GHIA_X, x_line, v_line)
  ghia_u = np.asarray(GHIA_U[int(re)])
  ghia_v = np.asarray(GHIA_V[int(re)])
  # Skip the boundary rows (imposed values, trivially exact).
  err_u = np.abs(u_at[1:-1] - ghia_u[1:-1])
  err_v = np.abs(v_at[1:-1] - ghia_v[1:-1])
  return {
      're': re, 'n_el': n_el, 'order': order, 'dt': dt,
      'steps': steps_run, 'wall_s': round(wall, 1),
      'steady_residual': steady_residual,
      'u_centerline': {'y': GHIA_Y, 'computed': u_at.tolist(),
                       'ghia': ghia_u.tolist()},
      'v_centerline': {'x': GHIA_X, 'computed': v_at.tolist(),
                       'ghia': ghia_v.tolist()},
      'max_err_u': float(err_u.max()),
      'rms_err_u': float(np.sqrt((err_u ** 2).mean())),
      'max_err_v': float(err_v.max()),
      'rms_err_v': float(np.sqrt((err_v ** 2).mean())),
  }


def main():
  ap = argparse.ArgumentParser()
  ap.add_argument('--cpu', action='store_true')
  ap.add_argument('--re', type=float, nargs='*', default=[100.0, 1000.0])
  ap.add_argument('--n_el', type=int, default=16)
  ap.add_argument('--order', type=int, default=7)
  ap.add_argument('--dt', type=float, default=1e-3)
  ap.add_argument('--t_end', type=float, default=80.0)
  ap.add_argument('--steps_per_chunk', type=int, default=1000)
  ap.add_argument('--steady_tol', type=float, default=2e-5)
  ap.add_argument('--out', default='experiments/ghia_cavity_result.json')
  args = ap.parse_args()

  import jax
  if args.cpu:
    jax.config.update('jax_platforms', 'cpu')
  cache_dir = os.path.join(os.path.dirname(os.path.dirname(
      os.path.abspath(__file__))), '.jax_cache')
  jax.config.update('jax_compilation_cache_dir', cache_dir)

  results = {'device': str(jax.devices()[0]), 'cases': []}
  for re in args.re:
    print(f'Re {re}:', flush=True)
    r = run_case(re, args.n_el, args.order, args.dt, args.t_end,
                 args.steps_per_chunk, args.steady_tol, verbose=True)
    results['cases'].append(r)
    print(f'Re {re}: rms err u {r["rms_err_u"]:.4f}  v {r["rms_err_v"]:.4f}'
          f'  (max {r["max_err_u"]:.4f}/{r["max_err_v"]:.4f}), '
          f'{r["steps"]} steps in {r["wall_s"]} s', flush=True)
    tmp = args.out + '.tmp'
    with open(tmp, 'w') as fh:
      json.dump(results, fh, indent=1)
    os.replace(tmp, args.out)
  print(f'wrote {args.out}')


if __name__ == '__main__':
  main()
