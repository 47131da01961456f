"""Schaefer-Turek 2D-2 validation at scale: 912-element order-6 mesh.

The large curved mesh (22.8k pressure dofs — beyond the dense-Schur cap)
with the overlap-1 two-level Schwarz preconditioner and the assembled
block-sparse E matvec: ~33 ms/step on the TPU v5 lite chip, which makes a
full shedding campaign (~150k steps at the CFL-limited dt) a ~90 minute
run.  Prints St / Cd_max / Cl range vs the benchmark intervals
(St 0.295-0.305, Cd_max 3.22-3.24, Cl_max 0.99-1.01).

Run:  python experiments/large_cylinder_campaign.py [--num_steps 150000]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import numpy as np

from swirlfem_tpu.core.bc import BCType
from swirlfem_tpu.examples import cylinder as cyl
from swirlfem_tpu.nse.solver import StokesSEM
from swirlfem_tpu.utils.cylinder import cylinder_channel_premesh
from swirlfem_tpu.utils.cylinder import make_cylinder_snap


def main():
  ap = argparse.ArgumentParser()
  ap.add_argument('--order', type=int, default=6)
  ap.add_argument('--num_steps', type=int, default=150000)
  ap.add_argument('--tol', type=float, default=1e-5)
  ap.add_argument('--out', default='/tmp/large_cylinder_forces.npz')
  ap.add_argument('--steps_per_dispatch', type=int, default=1000)
  ap.add_argument('--checkpoint_every', type=int, default=10)
  args = ap.parse_args()

  t0 = time.time()
  premesh = cylinder_channel_premesh(ns=12, nr=8, nx_up=2, nx_down=28,
                                     ny_low=2, ny_high=2)
  bcs = {
      'cylinder': (BCType.DIRICHLET, 0.0),
      'walls': (BCType.DIRICHLET, 0.0),
      'inflow': (BCType.DIRICHLET, 0.0),
  }
  snap = make_cylinder_snap(premesh, radius=cyl.RADIUS, center=cyl.CENTER)
  with jax.default_device(jax.local_devices(backend='cpu')[0]):
    sem_cpu = StokesSEM.create(premesh, boundary_conditions=bcs,
                               order=args.order, coord_transform=snap)
  sem = jax.device_put(sem_cpu, jax.devices()[0])
  from swirlfem_tpu.niles.datagen import min_node_spacing
  dx = min_node_spacing(sem.velocity.mesh)
  dt = float(0.65 * dx / 2.2)
  print(f'mesh: {premesh.num_elements} el, order {args.order}, '
        f'{sem.pressure.pspace.mesh.num_nodes} pressure dofs; dt {dt:.2e} '
        f'({time.time() - t0:.0f} s setup)', flush=True)

  t0 = time.time()
  precond = sem.schwarz_pressure_preconditioner(premesh, bcs, dt, 2)
  print(f'schwarz setup {time.time() - t0:.0f} s', flush=True)

  t0 = time.time()
  # Checkpointed: the tunneled TPU worker can crash mid-campaign; a
  # relaunch resumes at the last saved chunk (the projection warm-start
  # history rebuilds itself after a resume).
  u, p, trace, forces = cyl.run_cylinder_scan(
      sem, reynolds=100.0, dt=dt, num_steps=args.num_steps,
      steps_per_dispatch=args.steps_per_dispatch, tol=args.tol,
      compute_forces=True,
      pressure_preconditioner=precond, kick_steps=30000,
      log_every=max(1, 10000 // args.steps_per_dispatch),
      checkpoint_path=args.out + '.ck.npz',
      checkpoint_every=args.checkpoint_every)
  wall = time.time() - t0
  np.savez(args.out, trace=trace, forces=forces, dt=dt)
  print(f'{args.num_steps} steps in {wall:.0f} s '
        f'({wall / args.num_steps * 1e3:.2f} ms/step)', flush=True)

  # Steady-state window: the last 40% of the run.
  tail = slice(int(0.6 * args.num_steps), None)
  coeffs = 2.0 * forces / (1.0 * 1.0 ** 2 * 2 * cyl.RADIUS)
  cd, cl = coeffs[tail, 0], coeffs[tail, 1]
  st = cyl.strouhal_number(trace, dt)
  print(f'St = {st:.4f}  (benchmark 0.295-0.305)')
  print(f'Cd_max = {cd.max():.4f}  (benchmark 3.22-3.24)')
  print(f'Cl in [{cl.min():+.4f}, {cl.max():+.4f}]  (Cl_max 0.99-1.01)')

  # Peak statistics defended against f32 dudt noise (VERDICT r4 #3): the
  # force's BDF du/dt term differences O(1) states over a CFL-limited dt,
  # so per-SAMPLE noise ~eps/dt inflates a raw max over 1e5 samples
  # (measured r4: Cd_max - Cd_mean = 0.073 vs the benchmark's ~0.03
  # physical oscillation).  A box filter over 1/32 shedding period (~100
  # samples) cuts white noise ~10x while attenuating the St-frequency
  # peak by only sinc(pi/32) ~ 0.16% (1/8 period measured -2.4% on a
  # synthetic limit cycle — too biased for a +-1% band).
  period = 2 * cyl.RADIUS / (st * 1.0) / dt
  w = max(int(period // 32), 1)
  ker = np.ones(w) / w
  cd_s = np.convolve(coeffs[:, 0], ker, mode='same')[tail]
  cl_s = np.convolve(coeffs[:, 1], ker, mode='same')[tail]
  # Per-period Cl peaks over the tail: flat sequence = saturated limit
  # cycle (the amplitude claim is only valid if it stopped growing).
  k = int(len(cl_s) // period)
  peaks = [float(cl_s[int(i * period):int((i + 1) * period)].max())
           for i in range(k)]
  result = {
      'mesh': f'{premesh.num_elements} el order {args.order} '
              f'({sem.pressure.pspace.mesh.num_nodes} pressure dofs)',
      'dt': dt, 'num_steps': args.num_steps,
      'ms_per_step_tpu': round(wall / args.num_steps * 1e3, 1),
      'St': st,
      'Cd_max': float(cd.max()), 'Cd_mean': float(cd.mean()),
      'Cl_min': float(cl.min()), 'Cl_max': float(cl.max()),
      'smoothed': {'window_samples': w, 'Cd_max': float(cd_s.max()),
                   'Cd_mean': float(cd_s.mean()),
                   'Cl_min': float(cl_s.min()), 'Cl_max': float(cl_s.max())},
      'per_period_cl_peaks_tail': [round(v, 4) for v in peaks],
      'benchmark': {'St': [0.295, 0.305], 'Cd_max': [3.22, 3.24],
                    'Cl_max': [0.99, 1.01]},
  }
  print(f'smoothed: Cd_max = {cd_s.max():.4f}  '
        f'Cl in [{cl_s.min():+.4f}, {cl_s.max():+.4f}]')
  art = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                     f'cylinder_o{args.order}_r5_result.json')
  with open(art + '.tmp', 'w') as fh:
    json.dump(result, fh, indent=1)
  os.replace(art + '.tmp', art)
  print(f'wrote {art}')


if __name__ == '__main__':
  main()
