"""Limit-cycle saturation + force-noise diagnosis (VERDICT r4 #3).

The filter A/B (cylinder_filter_ab.json) ruled the modal filter OUT:
alpha 0.05 -> 0.02 moves Cl_max by -0.7% on the 228-el order-6 mesh.
Remaining hypotheses for the band misses:

* **Cl_max low = unsaturated limit cycle.**  The order-7 campaign ran
  7.7 s physical (~9 shedding periods of analysis window after a 30k-step
  kick); a supercritical-Hopf amplitude can still be growing there.  This
  runs the SMALL mesh ~30 physical seconds (~90 periods) and reports the
  PER-PERIOD Cl peaks — if they still grow late, the production number
  was read too early.
* **Cd_max high = f32 dudt noise on the peak statistic.**  The force's
  BDF du/dt term differences O(1) states over dt: per-sample noise
  ~eps/dt inflates a max over 10^5 samples.  Cd_max-Cd_mean measured
  0.073 at order 7 vs the benchmark's ~0.03 physical oscillation.  This
  reports raw vs smoothed (one-period 10-91 percentile-robust and
  low-pass) peak values.

Writes ``experiments/cylinder_saturation.json`` (+ forces npz in /tmp).
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def per_period_peaks(sig, period_samples):
  import numpy as np
  k = int(len(sig) // period_samples)
  rows = []
  for i in range(k):
    w = sig[int(i * period_samples):int((i + 1) * period_samples)]
    rows.append(float(w.max()))
  return rows


def main():
  ap = argparse.ArgumentParser()
  ap.add_argument('--order', type=int, default=6)
  ap.add_argument('--num_steps', type=int, default=160000)
  ap.add_argument('--alpha', type=float, default=0.05)
  ap.add_argument('--tol', type=float, default=1e-5)
  args = ap.parse_args()

  import jax
  jax.config.update('jax_compilation_cache_dir', os.path.join(
      os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
      '.jax_cache'))
  import numpy as np

  from swirlfem_tpu.examples import cylinder as cyl
  from swirlfem_tpu.niles.datagen import min_node_spacing

  with jax.default_device(jax.local_devices(backend='cpu')[0]):
    sem_cpu = cyl.make_cylinder_sem(order=args.order)
  sem = jax.device_put(sem_cpu, jax.devices()[0])
  dx = min_node_spacing(sem.velocity.mesh)
  dt = float(0.65 * dx / 2.2)
  steps = (args.num_steps // 400) * 400
  print(f'{sem.velocity.mesh.num_elements} el order {args.order}, dt '
        f'{dt:.2e}, {steps} steps = {steps * dt:.1f} s physical', flush=True)

  t0 = time.time()
  u, p, trace, forces = cyl.run_cylinder_scan(
      sem, reynolds=100.0, dt=dt, num_steps=steps, steps_per_dispatch=400,
      tol=args.tol, compute_forces=True, kick_steps=12000, alpha=args.alpha)
  wall = time.time() - t0
  np.savez('/tmp/cyl_saturation_forces.npz', trace=trace, forces=forces,
           dt=dt)

  st = cyl.strouhal_number(trace, dt)
  period = 2 * cyl.RADIUS / (st * 1.0) / dt  # samples per shedding period
  coeffs = 2.0 * forces / (2 * cyl.RADIUS)
  cd, cl = coeffs[:, 0], coeffs[:, 1]
  tail = slice(int(0.6 * steps), None)

  # Low-pass: box filter over ~1/8 period kills grid-dt noise, keeps the
  # St-frequency physics (>10x separation).
  w = max(int(period // 8), 1)
  ker = np.ones(w) / w
  cd_s = np.convolve(cd, ker, mode='same')
  cl_s = np.convolve(cl, ker, mode='same')

  out = {
      'mesh_elements': int(sem.velocity.mesh.num_elements),
      'order': args.order, 'dt': dt, 'num_steps': steps, 'alpha': args.alpha,
      'physical_seconds': steps * dt,
      'St': st,
      'ms_per_step': round(1e3 * wall / steps, 3),
      'raw': {'Cd_max': float(cd[tail].max()),
              'Cd_mean': float(cd[tail].mean()),
              'Cl_min': float(cl[tail].min()),
              'Cl_max': float(cl[tail].max())},
      'smoothed': {'window_samples': w,
                   'Cd_max': float(cd_s[tail].max()),
                   'Cl_min': float(cl_s[tail].min()),
                   'Cl_max': float(cl_s[tail].max())},
      'per_period_cl_peaks': per_period_peaks(cl_s[int(12000):], period),
      'per_period_cd_peaks': per_period_peaks(cd_s[int(12000):], period),
      'benchmark': {'St': [0.295, 0.305], 'Cd_max': [3.22, 3.24],
                    'Cl_max': [0.99, 1.01]},
  }
  path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                      'cylinder_saturation.json')
  with open(path + '.tmp', 'w') as fh:
    json.dump(out, fh, indent=1)
  os.replace(path + '.tmp', path)
  print(json.dumps({k: out[k] for k in ('St', 'raw', 'smoothed')}))
  print(f'wrote {path} ({wall:.0f} s)')


if __name__ == '__main__':
  main()
