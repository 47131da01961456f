"""Filter-strength A/B on the small cylinder mesh (VERDICT r4 #3).

The Schaefer-Turek 2D-2 force history misses its bands asymmetrically at
every resolution tried (Cl_max ~1.5-4% LOW, Cd_max drifting HIGH with
resolution) while St stays in band — a systematic amplitude bias, not
noise.  The one dissipation knob applied every step at all resolutions
is the modal low-pass filter (``StokesSEM.filter``, nek-style alpha
blend of the order-(N-1) projection, default alpha = 0.05).  Its
per-unit-TIME damping rate scales as alpha/dt, and the campaigns run at
CFL-limited dt — so the effective high-mode dissipation is large and
resolution-dependent.

This A/B sweeps alpha on the 228-element order-6 mesh (the round-3
configuration that measured Cl_max = 0.951, ~10 ms/step on chip, so a
full 56k-step shedding run costs ~10 minutes per point) and reports
St / Cd_max / Cl_max per alpha.  If d(Cl_max)/d(alpha) < 0 with the
band recovered at smaller alpha, the production campaign adopts it.

Writes ``experiments/cylinder_filter_ab.json``.
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
  ap = argparse.ArgumentParser()
  ap.add_argument('--order', type=int, default=6)
  ap.add_argument('--num_steps', type=int, default=56000)
  ap.add_argument('--alphas', type=float, nargs='*',
                  default=[0.05, 0.02, 0.01, 0.0])
  ap.add_argument('--tol', type=float, default=1e-5)
  args = ap.parse_args()

  import jax
  jax.config.update('jax_compilation_cache_dir', os.path.join(
      os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
      '.jax_cache'))
  import numpy as np

  from swirlfem_tpu.examples import cylinder as cyl
  from swirlfem_tpu.niles.datagen import min_node_spacing

  t0 = time.time()
  with jax.default_device(jax.local_devices(backend='cpu')[0]):
    sem_cpu = cyl.make_cylinder_sem(order=args.order)
  sem = jax.device_put(sem_cpu, jax.devices()[0])
  dx = min_node_spacing(sem.velocity.mesh)
  dt = float(0.65 * dx / 2.2)
  steps = (args.num_steps // 400) * 400
  print(f'mesh: {sem.velocity.mesh.num_elements} el order {args.order}, '
        f'dt {dt:.2e}, {steps} steps/point '
        f'({time.time() - t0:.0f} s setup)', flush=True)

  out = {'mesh_elements': int(sem.velocity.mesh.num_elements),
         'order': args.order, 'dt': dt, 'num_steps': steps,
         'benchmark': {'St': [0.295, 0.305], 'Cd_max': [3.22, 3.24],
                       'Cl_max': [0.99, 1.01]},
         'points': []}
  for alpha in args.alphas:
    t0 = time.time()
    try:
      u, p, trace, forces = cyl.run_cylinder_scan(
          sem, reynolds=100.0, dt=dt, num_steps=steps,
          steps_per_dispatch=400, tol=args.tol, compute_forces=True,
          kick_steps=12000, alpha=alpha)
      tail = slice(int(0.6 * steps), None)
      coeffs = 2.0 * forces / (2 * cyl.RADIUS)
      cd, cl = coeffs[tail, 0], coeffs[tail, 1]
      point = {
          'alpha': alpha,
          'St': cyl.strouhal_number(trace, dt),
          'Cd_max': float(cd.max()), 'Cd_mean': float(cd.mean()),
          'Cl_min': float(cl.min()), 'Cl_max': float(cl.max()),
          'finite': bool(np.isfinite(forces).all()),
          'wall_s': round(time.time() - t0, 1),
      }
    except Exception as e:  # pylint: disable=broad-except
      point = {'alpha': alpha, 'error': f'{type(e).__name__}: {e}'}
    print(json.dumps(point), flush=True)
    out['points'].append(point)
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        'cylinder_filter_ab.json')
    with open(path + '.tmp', 'w') as fh:
      json.dump(out, fh, indent=1)
    os.replace(path + '.tmp', path)
  print('wrote cylinder_filter_ab.json')


if __name__ == '__main__':
  main()
