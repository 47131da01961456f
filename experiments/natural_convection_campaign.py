"""de Vahl Davis heated-cavity benchmark ladder: Ra 1e3 .. 1e6.

Marches the Boussinesq cavity (examples/natural_convection.py) to steady
state at each Rayleigh number and records the three independent mean-
Nusselt estimators against the published benchmark values (de Vahl Davis
1983).  Writes a JSON artifact for the round notes.

Run (CPU, f64):  python experiments/natural_convection_campaign.py
Run (TPU, f32):  python experiments/natural_convection_campaign.py --tpu

The reference has no scalar transport or heat-transfer benchmark; this
campaign is beyond-parity validation evidence.
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# Per-Ra discretization: boundary layers thin like Ra^(-1/4), so the mesh
# grows and grades toward the walls up the ladder.
CONFIGS = {
    1e3: dict(n_el=6, order=5, grading=0.0),
    1e4: dict(n_el=8, order=6, grading=0.0),
    1e5: dict(n_el=8, order=7, grading=0.3),
    1e6: dict(n_el=12, order=7, grading=0.5),
}


def main():
  ap = argparse.ArgumentParser()
  ap.add_argument('--tpu', action='store_true',
                  help='run on the default (TPU) backend in float32')
  ap.add_argument('--ras', type=float, nargs='*',
                  default=[1e3, 1e4, 1e5, 1e6])
  ap.add_argument('--max_steps', type=int, default=400_000)
  ap.add_argument('--out',
                  default='experiments/natural_convection_result.json')
  args = ap.parse_args()

  import jax
  if not args.tpu:
    jax.config.update('jax_platforms', 'cpu')
    jax.config.update('jax_enable_x64', True)
  import jax.numpy as jnp
  from swirlfem_tpu.examples import natural_convection as nc

  dtype = jnp.float32 if args.tpu else jnp.float64
  tol = 3e-6 if args.tpu else 1e-9
  platform = jax.devices()[0].platform
  print(f'backend: {platform}, dtype {jnp.dtype(dtype).name}', flush=True)

  results = {'platform': platform, 'dtype': jnp.dtype(dtype).name,
             'cases': []}
  for ra in args.ras:
    cfg = CONFIGS[ra]
    t0 = time.time()
    r = nc.run_cavity(ra, dtype=dtype, tol=tol, max_steps=args.max_steps,
                      verbose=True, **cfg)
    wall = time.time() - t0
    nu_bench = nc.BENCHMARK_NU.get(ra)
    nu_acc = nc.ACCURATE_NU.get(ra)
    case = {
        'ra': ra, **cfg, 'steps': r['steps'], 'dt': r['dt'],
        'wall_s': round(wall, 1),
        'ms_per_step': round(1e3 * wall / r['steps'], 3),
        'ms_per_step_steady': round(r['ms_per_step_steady'], 3),
        'nu_volume': r['nu_volume'], 'nu_hot': r['nu_hot'],
        'nu_cold': r['nu_cold'], 'u_max': r['u_max'],
        'steady_rate': r['steady_rate'], 'nu_benchmark': nu_bench,
        'nu_accurate': nu_acc,
    }
    if nu_acc:
      case['nu_rel_err'] = abs(r['nu_volume'] - nu_acc) / nu_acc
    results['cases'].append(case)
    print(f"Ra {ra:.0e}: Nu {r['nu_volume']:.4f} "
          f"(bench {nu_bench}), hot {r['nu_hot']:.4f} "
          f"cold {r['nu_cold']:.4f}, u_max {r['u_max']:.2f}, "
          f"{r['steps']} steps in {wall:.0f} s", flush=True)

  # Atomic publish: a timeout mid-dump must not leave a truncated artifact
  # that the re-entrant campaign chain would then skip forever.
  tmp = args.out + '.tmp'
  with open(tmp, 'w') as fh:
    json.dump(results, fh, indent=2)
  os.replace(tmp, args.out)
  print(f'wrote {args.out}')


if __name__ == '__main__':
  main()
