"""Distributed two-level Schwarz at scale (VERDICT r1 #9).

A 128x128-element (16,384-element, >16k) order-4 cavity on the 8-virtual-
device CPU mesh: pressure-Poisson solve inside one full partitioned NSE
step with (a) no preconditioner and (b) the distributed overlap-0 Schwarz
with the 'vertex' Q1 coarse (one psum of nv floats per apply instead of
the p1dg all_gather of P*E*nc floats).  The mesh uses the neighbor-limited
exchange, so the per-CG-iteration velocity exchange payload is also
recorded.

Two-level Schwarz has no reference counterpart (beyond parity); this
experiment keeps the scaling story honest with measured iteration counts
and collective-payload accounting, written to
``experiments/schwarz_scale_result.json``.

Usage: python experiments/schwarz_scale.py [--n 128] [--order 4]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ['XLA_FLAGS'] = (os.environ.get('XLA_FLAGS', '')
                           + ' --xla_force_host_platform_device_count=8')

import jax  # noqa: E402

jax.config.update('jax_platforms', 'cpu')
jax.config.update('jax_enable_x64', True)

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

NUM_PARTS = 8


def main():
  ap = argparse.ArgumentParser()
  ap.add_argument('--n', type=int, default=128)
  ap.add_argument('--order', type=int, default=4)
  ap.add_argument('--tol', type=float, default=1e-8)
  ap.add_argument('--coarse', default='vertex',
                  choices=['vertex', 'vertex-cheb'],
                  help='dense Q1 inverse vs matrix-free Chebyshev '
                       '(ops.coarse_cheb; O(nnz) setup/memory)')
  ap.add_argument('--out', default='schwarz_scale_result.json')
  ap.add_argument('--skip-unpreconditioned', action='store_true')
  args = ap.parse_args()

  from swirlfem_tpu.core.bc import BCType
  from swirlfem_tpu.nse.solver import StokesSEM
  from swirlfem_tpu.ops.schwarz_distributed import build_distributed_schwarz
  from swirlfem_tpu.parallel.spmd import device_mesh, spmd_map
  from swirlfem_tpu.utils.box import unit_cube_mesh
  from swirlfem_tpu.utils.partition import edge_cut, partition

  n, order = args.n, args.order
  dt, k, mu = 1e-2, 2, 1e-3
  bcs = {'boundary': (BCType.DIRICHLET, 0.0)}
  result = {'elements': n * n, 'order': order, 'partitions': NUM_PARTS}

  t0 = time.time()
  pm0 = unit_cube_mesh(n, ndim=2)
  # Deformed geometry: no FDM-like structure for the preconditioner to
  # hide behind, and the generic (element-contiguous DG) refine path.
  coords = np.asarray(pm0.node_coords)
  warped = np.stack(
      [coords[:, 0] + 0.06 * np.sin(np.pi * coords[:, 1]),
       coords[:, 1] + 0.04 * np.sin(2 * np.pi * coords[:, 0])], axis=-1)
  # box_info=None: the Schwarz builders need the generic refine path's
  # element-contiguous DG pressure numbering, not the structured grid's.
  pm0 = pm0.replace(node_coords=warped, box_info=None)
  parts = partition(pm0, NUM_PARTS)
  pm = pm0.replace(partitions=parts)
  result['edge_cut'] = edge_cut(pm0, parts)
  print(f'partitioned {n}x{n}: edge_cut={result["edge_cut"]}', flush=True)

  sem_u = StokesSEM.create(pm0, bcs, order=order)
  print(f'unpartitioned twin built ({time.time()-t0:.0f}s)', flush=True)

  t1 = time.time()
  m_d = build_distributed_schwarz(
      sem_u, pm, bcs, dt, k, axis_name='part', overlap=0, coarse=args.coarse,
      max_coarse_dofs=(n + 1) ** 2 + 1)
  result['schwarz_setup_seconds'] = round(time.time() - t1, 1)
  result['coarse'] = {
      'kind': m_d.coarse_kind,
      'coarse_dofs': int(m_d.coarse_nv),
      'cheb_degree': (None if m_d.cheb is None else int(m_d.cheb.degree)),
      # per-apply collective payloads (floats)
      'vertex_psum_floats': int(m_d.coarse_nv),
      'p1dg_all_gather_floats_hypothetical':
          NUM_PARTS * n * n * (2 ** 2),
  }
  print(f'distributed Schwarz built ({result["schwarz_setup_seconds"]}s)',
        flush=True)

  dmesh = device_mesh('part', NUM_PARTS)
  t2 = time.time()
  sem_p = StokesSEM.create(pm, bcs, order=order, axis_name='part',
                           device_mesh=dmesh, exchange_mode='neighbors')
  nt = sem_p.velocity.mesh.exchange_neighbors
  result['velocity_exchange'] = {
      'mode': 'neighbors' if nt is not None else 'psum',
      'psum_payload_floats': None if nt is None else int(nt.psum_payload),
      'neighbor_payload_floats':
          None if nt is None else int(nt.neighbor_payload),
      'rounds': None if nt is None else len(nt.perms),
  }
  print(f'partitioned solver built ({time.time()-t2:.0f}s); '
        f'exchange {result["velocity_exchange"]}', flush=True)

  # Smooth cavity-like initial state.
  vc = np.asarray(sem_u.velocity.mesh.node_coords)
  mask = np.asarray(sem_u.velocity.interior_mask)
  u0 = np.stack([np.sin(np.pi * vc[:, 1]) * vc[:, 0] * (1 - vc[:, 0]),
                 0.1 * np.cos(np.pi * vc[:, 0])], axis=-1) * mask
  u0_sh = sem_p.velocity.mesh.shard_nodal(u0)
  p_idx = np.asarray(sem_p.pressure.pspace.mesh.node_indices)
  p0_sh = jnp.zeros(p_idx.shape)

  from swirlfem_tpu.ops.fdm_element import build_element_fdm
  fdm_p = build_element_fdm(sem_p)

  def step(sem, us, ps, f, m, fdm):
    return sem.stokes_one_step(us, ps, f, mu=mu, dt=dt, time_order=k,
                               tol=args.tol, atol=args.tol, maxiter=2000,
                               pressure_preconditioner=m, viscous_fdm=fdm)

  # Third variant: Schwarz pressure + element-FDM viscous (ops/fdm_element)
  # — the viscous CG is what dominates once the pressure is preconditioned.
  base = ('schwarz_vertex_cheb' if args.coarse == 'vertex-cheb'
          else 'schwarz_vertex')
  variants = [(base + '_fdm', m_d, fdm_p), (base, m_d, None)]
  if not args.skip_unpreconditioned:
    variants.append(('unpreconditioned', None, None))
  for label, m, fdm in variants:
    run = spmd_map(step, dmesh, 'part')
    t3 = time.time()
    u_got, _, aux = run(sem_p, [u0_sh, 0.9 * u0_sh], [p0_sh, p0_sh],
                        jnp.zeros_like(u0_sh), m, fdm)
    jax.block_until_ready(u_got)
    t_first = time.time() - t3
    t4 = time.time()
    u_got, _, aux = run(sem_p, [u0_sh, 0.9 * u0_sh], [p0_sh, p0_sh],
                        jnp.zeros_like(u0_sh), m, fdm)
    jax.block_until_ready(u_got)
    result[label] = {
        'pressure_iters': int(np.asarray(aux['dp_info']['num_iterations'])
                              .max()),
        'pressure_residual': float(np.asarray(aux['dp_info']['residual'])
                                   .max()),
        'viscous_iters': int(np.asarray(aux['u_star_info']['num_iterations'])
                             .max()),
        'step_seconds_compiled': round(time.time() - t4, 2),
        'step_seconds_first': round(t_first, 2),
        'finite': bool(np.isfinite(np.asarray(u_got)).all()),
    }
    print(f'{label}: {result[label]}', flush=True)

  out = os.path.join(os.path.dirname(os.path.abspath(__file__)), args.out)
  with open(out, 'w') as f:
    json.dump(result, f, indent=1)
  print(json.dumps(result))


if __name__ == '__main__':
  main()
