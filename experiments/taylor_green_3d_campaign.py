"""3D Taylor-Green vortex Re-1600 DNS campaign on one TPU chip.

The canonical transitional-turbulence validation case (High-Order CFD
Workshop C3.5).  Community reference: 512^3 dealiased pseudo-spectral,
peak kinetic-energy dissipation rate ~0.0122 at t ~ 8.2-9.0.

Runs a resolution ladder (default 16^3 and 32^3 elements at order 7 =
128^3 / 256^3 effective GLL resolution) through the el-form fast path
with exact FDM solves and the fused 3D Pallas stiffness kernel, and
records per-step kinetic energy + both dissipation measures (resolved
eps and -dE/dt).  Writes a JSON artifact with the curves (subsampled)
and the peaks.

Run (TPU):  python experiments/taylor_green_3d_campaign.py
Run (CPU smoke):  python experiments/taylor_green_3d_campaign.py --cpu \
    --cases 8:4 --t_end 1.0 --re 400
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
  ap = argparse.ArgumentParser()
  ap.add_argument('--cpu', action='store_true')
  ap.add_argument('--re', type=float, default=1600.0)
  ap.add_argument('--t_end', type=float, default=20.0)
  ap.add_argument('--cases', nargs='*', default=['16:7', '32:7'],
                  help='n_el:order pairs')
  ap.add_argument('--alpha', type=float, default=0.0,
                  help='modal filter strength (0 = none; DNS default)')
  ap.add_argument('--time_order', type=int, default=2)
  ap.add_argument('--dt', type=float, default=None,
                  help='time step override (default: CFL-derived)')
  ap.add_argument('--subsample', type=int, default=4,
                  help='keep every k-th point of the recorded curves')
  ap.add_argument('--out',
                  default='experiments/taylor_green_3d_result.json')
  args = ap.parse_args()

  import jax
  if args.cpu:
    jax.config.update('jax_platforms', 'cpu')
  import jax.numpy as jnp
  from swirlfem_tpu.examples import taylor_green_3d as tg

  on_tpu = jax.devices()[0].platform != 'cpu'
  dtype = jnp.float32
  results = {'re': args.re, 't_end': args.t_end, 'alpha': args.alpha,
             'time_order': args.time_order,
             'device': str(jax.devices()[0]), 'cases': []}
  for case in args.cases:
    n_el, order = (int(v) for v in case.split(':'))
    t0 = time.time()
    r = tg.run_tgv(re=args.re, n_el=n_el, order=order, t_end=args.t_end,
                   time_order=args.time_order, alpha=args.alpha, dt=args.dt,
                   dtype=dtype, use_pallas=on_tpu,
                   steps_per_chunk=250 if on_tpu else 25, verbose=True)
    wall = time.time() - t0
    s = slice(None, None, args.subsample)
    num_dofs = 3 * ((order + 1) * n_el) ** 3  # el-form dof count

    # One-line HBM budget (VERDICT r3 #3): what the chunked advance keeps
    # resident — slim solver pytree (after StokesSEM.slim_for_el_step)
    # vs the full one, plus the donated time-stepping carry.
    def tree_gib(t):
      return round(sum(x.nbytes for x in jax.tree_util.tree_leaves(t)
                       if hasattr(x, 'nbytes')) / 2**30, 3)

    sem = r['sem']
    carry_fields = 3 * args.time_order * 2  # us + cus comps
    field_gib = (order + 1) ** 3 * n_el ** 3 * 4 / 2**30
    p_gib = (order - 1) ** 3 * n_el ** 3 * 4 / 2**30
    hbm_budget = {
        'solver_full_gib': tree_gib(sem),
        'solver_slim_gib': tree_gib(sem.slim_for_el_step()),
        'carry_gib': round(carry_fields * field_gib
                           + args.time_order * p_gib, 3),
        'per_field_gib': round(field_gib, 3),
        'carry_donated': True,
    }

    case_out = {
        'n_el': n_el, 'order': order,
        'hbm_budget': hbm_budget,
        'effective_resolution': (order + 1) * n_el,
        'num_dofs': num_dofs,
        'dt': r['dt'], 'steps': r['steps'],
        'wall_s': round(wall, 1),
        'ms_per_step': round(1e3 * r['wall_s'] / r['steps'], 3),
        'peak_dissipation': r['peak_dissipation'],
        'peak_dissipation_time': r['peak_dissipation_time'],
        'peak_dedt': r['peak_dedt'],
        'peak_dedt_time': r['peak_dedt_time'],
        'ke_final': float(r['ke'][-1]),
        # Solve-convergence telemetry (VERDICT r4 #4): the advance caps
        # maxiter=100 as a stall guard; prove it inert on the healthy path.
        'cg_max_iters': r['cg_max_iters'],
        'cg_max_resid': r['cg_max_resid'],
        'cg_iters_per_chunk': r['cg_iters_per_chunk'],
        'cg_resid_per_chunk': r['cg_resid_per_chunk'],
        'cg_maxiter_cap': 100,
        'cg_cap_inert': bool(r['cg_max_iters'] < 100),
        't': r['t'][s].tolist(),
        'ke': r['ke'][s].tolist(),
        'dissipation': r['dissipation'][s].tolist(),
        'dedt': r['dedt'][s].tolist(),
    }
    results['cases'].append(case_out)
    print(f"n {n_el} order {order}: peak eps {r['peak_dissipation']:.5f} "
          f"at t {r['peak_dissipation_time']:.2f} "
          f"(-dE/dt peak {r['peak_dedt']:.5f} at {r['peak_dedt_time']:.2f}), "
          f"{r['steps']} steps in {wall:.0f} s", flush=True)
    tmp = args.out + '.tmp'
    with open(tmp, 'w') as fh:
      json.dump(results, fh, indent=2)
    os.replace(tmp, args.out)  # atomic: no truncated artifact on timeout
  print(f'wrote {args.out}')


if __name__ == '__main__':
  main()
