"""Reference headline workload end-to-end: Kolmogorov DNS datagen on TPU.

Runs the reference's data-generation campaign at its exact physics
configuration — 2D Kolmogorov flow, 64x64 order-8 spectral elements
(263k velocity nodes), Re 20,000, BDF3, dt 1e-4
(``swirl_fem/niles/datagen/datagen.py:48-56``) — through
`niles.datagen.run_simulation` and records per-cycle walltimes and the
derived ms/step + DOF-throughput.  The reference logs per-cycle walltime
but publishes no numbers (BASELINE.md); this artifact is our measured
number for the full campaign on one chip.

Default here is the full 250,000-step campaign (500 cycles x 500 steps)
with sparse snapshots (one per cycle) so the tunnel readback is not the
bottleneck being measured; pass --snapshot_every 10 for the reference's
IO cadence.

Run:  python experiments/datagen_throughput.py [--cycles 500]
"""

import argparse
import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
  ap = argparse.ArgumentParser()
  ap.add_argument('--cycles', type=int, default=500)
  ap.add_argument('--steps_per_cycle', type=int, default=500)
  ap.add_argument('--snapshot_every', type=int, default=500)
  ap.add_argument('--resolution', type=int, default=64)
  ap.add_argument('--order', type=int, default=8)
  ap.add_argument('--workdir', default='/tmp/datagen_throughput')
  ap.add_argument('--keep_shards', action='store_true')
  ap.add_argument('--out', default='experiments/datagen_throughput_result.json')
  args = ap.parse_args()

  import jax
  from swirlfem_tpu.niles.datagen import DatagenConfig, run_simulation

  cfg = DatagenConfig(
      resolution=args.resolution, order=args.order,
      num_cycles=args.cycles, num_steps_per_cycle=args.steps_per_cycle,
      snapshot_every=args.snapshot_every)
  dev = jax.devices()[0]
  print(f'device: {dev.device_kind} ({dev.platform}); '
        f'{cfg.resolution}x{cfg.resolution} order {cfg.order}, '
        f'Re {cfg.reynolds_number:.0f}, dt {cfg.dt}, '
        f'{cfg.num_cycles} x {cfg.num_steps_per_cycle} steps', flush=True)

  shutil.rmtree(args.workdir, ignore_errors=True)
  t0 = time.time()
  walls = run_simulation(args.workdir, cfg)
  total = time.time() - t0

  steps = cfg.num_cycles * cfg.num_steps_per_cycle
  # Cycle 0 includes compilation; steady throughput is the later-cycle
  # median.
  steady = sorted(walls[1:] or walls)[len(walls[1:] or walls) // 2]
  num_nodes = (cfg.resolution * cfg.order + 1) ** 2
  ms_per_step = 1e3 * steady / cfg.num_steps_per_cycle
  result = {
      'device': dev.device_kind, 'platform': dev.platform,
      'resolution': cfg.resolution, 'order': cfg.order,
      'reynolds': cfg.reynolds_number, 'dt': cfg.dt,
      'num_steps': steps, 'snapshot_every': cfg.snapshot_every,
      'velocity_nodes': num_nodes,
      'total_wall_s': round(total, 1),
      'compile_cycle_s': round(walls[0], 2),
      'steady_cycle_s': round(steady, 3),
      'ms_per_step': round(ms_per_step, 4),
      'steps_per_s': round(1e3 / ms_per_step, 1),
      'velocity_dof_steps_per_s': 2 * num_nodes * 1e3 / ms_per_step,
      'cycle_walls': [round(w, 3) for w in walls],
  }
  with open(args.out, 'w') as fh:
    json.dump(result, fh, indent=2)
  print(json.dumps({k: v for k, v in result.items() if k != 'cycle_walls'},
                   indent=2), flush=True)
  if not args.keep_shards:
    shutil.rmtree(args.workdir, ignore_errors=True)


if __name__ == '__main__':
  main()
