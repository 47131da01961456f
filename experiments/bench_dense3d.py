"""Chip A/B: fused vs dense congruent 3D stiffness kernels (VERDICT r3 #4).

Times the three congruent-elements implementations on the 16^3 order-7
3-component workload (same as bench.py's 3D section):

  * fused sum-factorized (no factor streams)     — r3 baseline, 41 GDOF/s
  * dense (k^3, k^3) MXU matmul, f32 (HIGHEST)
  * dense (k^3, k^3) MXU matmul, bf16x3          — error-gated vs f64

and prints GDOF/s + roofline fractions per kernel.  Writes
``experiments/dense3d_ab.json``.

Usage: python experiments/bench_dense3d.py [--n_el 16] [--order 7]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
  ap = argparse.ArgumentParser()
  ap.add_argument('--n_el', type=int, default=16)
  ap.add_argument('--order', type=int, default=7)
  ap.add_argument('--chain', type=int, default=500)
  ap.add_argument('--cpu', action='store_true')
  args = ap.parse_args()

  import jax
  if args.cpu:
    jax.config.update('jax_platforms', 'cpu')
  cache = os.path.join(os.path.dirname(os.path.dirname(
      os.path.abspath(__file__))), '.jax_cache')
  jax.config.update('jax_compilation_cache_dir', cache)
  import jax.numpy as jnp
  import numpy as np

  from swirlfem_tpu.nse.solver import StokesSEM
  from swirlfem_tpu.ops.pallas_stiffness3d import _uniform_amat3d_np
  from swirlfem_tpu.utils.box import unit_cube_mesh

  device = jax.devices()[0]
  on_tpu = device.platform != 'cpu'
  n_el, order = args.n_el, args.order
  kk = order + 1
  with jax.default_device(jax.local_devices(backend='cpu')[0]):
    sem = StokesSEM.create(
        unit_cube_mesh(n_el, ndim=3, periodic_dims=(0, 1, 2)), {},
        order=order, use_pallas_kernels=on_tpu)
    sem = jax.tree.map(
        lambda x: (x.astype(jnp.float32)
                   if jnp.issubdtype(x.dtype, jnp.floating) else x), sem)
  ops = jax.device_put(sem.fast_ops, device)
  assert ops.c_uniform is not None

  rng = np.random.default_rng(2)
  us = tuple(
      jax.device_put(jnp.asarray(
          rng.standard_normal((kk,) * 3 + (n_el ** 3,)), jnp.float32),
          device) for _ in range(3))
  num_dofs = 3 * kk ** 3 * n_el ** 3
  pts = kk ** 3 * n_el ** 3
  chain = args.chain if on_tpu else 4

  a64 = _uniform_amat3d_np(ops.c_uniform, ops.w1, ops.dmat)
  ref64 = a64 @ np.asarray(us[0], np.float64).reshape(kk ** 3, -1)
  scale = float(np.abs(ref64).max())

  def timeit(ops_v):
    @jax.jit
    def run(u):
      return jax.lax.fori_loop(
          0, chain, lambda i, v: ops_v.stiffness_el_multi(v), u)
    jax.block_until_ready(run(us))
    times = []
    for _ in range(5):
      t0 = time.perf_counter()
      jax.block_until_ready(run(us))
      times.append((time.perf_counter() - t0) / chain)
    times.sort()
    return times[len(times) // 2], times

  variants = [
      ('fused', ops.replace(use_uniform_kernel=True)),
      ('pair_bf16x3', ops.replace(uniform_kernel_impl='pair')),
      ('dense_f32', ops.replace(uniform_kernel_impl='dense')),
      ('dense_bf16x3', ops.replace(uniform_kernel_impl='dense',
                                   kernel_precision='bf16x3')),
      # General (warped-mesh) path variants, measured on the same box with
      # the factor fields streamed (VERDICT r4 #2 A/B).
      ('general_fused', ops.replace(use_uniform_kernel=False)),
      ('general_pair_bf16x3', ops.replace(use_uniform_kernel=False,
                                          general_kernel_impl='pair')),
      ('general_pairs2_bf16x3', ops.replace(use_uniform_kernel=False,
                                            general_kernel_impl='pairs2')),
      ('general_pairs4_bf16x3', ops.replace(use_uniform_kernel=False,
                                            general_kernel_impl='pairs4')),
  ]
  out = {'workload': f'3D {n_el}^3 elements order {order}, 3 components',
         'num_dofs': num_dofs, 'device': str(device), 'kernels': []}
  for name, ops_v in variants:
    try:
      got = ops_v.stiffness_el_multi(us)
      err = float(np.abs(np.asarray(got[0], np.float64)
                         .reshape(kk ** 3, -1) - ref64).max()) / scale
      t, times = timeit(ops_v)
      entry = {'kernel': name, 'gdofs': round(num_dofs / t / 1e9, 3),
               'apply_ms': round(t * 1e3, 4),
               'times_ms': [round(v * 1e3, 4) for v in times],
               'rel_err_vs_f64': err}
      if name == 'fused':
        entry['bytes_per_apply'] = 3 * 2 * pts * 4
      else:
        entry['bytes_per_apply'] = 3 * 2 * pts * 4
        entry['flops_per_apply'] = 3 * 2 * kk ** 3 * pts
      print(f'{name:14s} {entry["gdofs"]:8.2f} GDOF/s  '
            f'{entry["apply_ms"]:.4f} ms  err {err:.2e}', flush=True)
      out['kernels'].append(entry)
    except Exception as e:  # pylint: disable=broad-except
      print(f'{name}: FAILED {type(e).__name__}: {e}', flush=True)
      out['kernels'].append({'kernel': name,
                             'error': f'{type(e).__name__}: {e}'})
  # --- Affine (graded + sheared) mesh section: the (6, E)-coefficient
  # kernel vs the general fused/pair kernels on the SAME warped-but-
  # affine geometry (per-element parallelepipeds).  Roofline: only
  # in+out fields stream (~102 GDOF/s on v5e) vs the general kernels'
  # 12-field 51.2.
  with jax.default_device(jax.local_devices(backend='cpu')[0]):
    pm = unit_cube_mesh(n_el, ndim=3, periodic_dims=(0, 1, 2))
    coords = np.asarray(pm.node_coords).copy()
    coords[:, 0] = coords[:, 0] + 0.15 * coords[:, 0] ** 2
    coords[:, 1] = coords[:, 1] + 0.10 * coords[:, 1] ** 2
    coords[:, 0] += 0.3 * coords[:, 1] + 0.1 * coords[:, 2]
    coords[:, 1] += 0.2 * coords[:, 2]
    sem_a = StokesSEM.create(pm.replace(node_coords=coords), {},
                             order=order, use_pallas_kernels=on_tpu)
    sem_a = jax.tree.map(
        lambda x: (x.astype(jnp.float32)
                   if jnp.issubdtype(x.dtype, jnp.floating) else x), sem_a)
  ops_a = jax.device_put(sem_a.fast_ops, device)
  out['affine'] = {'detected': ops_a.g_affine is not None, 'kernels': []}
  if ops_a.g_affine is not None:
    ref_a = jax.block_until_ready(
        ops_a.replace(use_pallas=False).stiffness_el_multi(us))
    scale_a = max(float(np.abs(np.asarray(r, np.float64)).max())
                  for r in ref_a)
    for name, ops_v in (
        ('affine_general_fused', ops_a.replace(use_uniform_kernel=False)),
        ('affine_pair_coeffs_bf16x3',
         ops_a.replace(use_uniform_kernel=False, use_affine_kernel=True)),
    ):
      try:
        got = ops_v.stiffness_el_multi(us)
        err = max(
            float(np.abs(np.asarray(g, np.float64)
                         - np.asarray(r, np.float64)).max()) / scale_a
            for g, r in zip(got, ref_a))
        t, times = timeit(ops_v)
        entry = {'kernel': name, 'gdofs': round(num_dofs / t / 1e9, 3),
                 'apply_ms': round(t * 1e3, 4),
                 'times_ms': [round(v * 1e3, 4) for v in times],
                 'rel_err_vs_f32_einsum': err}
        print(f'{name:26s} {entry["gdofs"]:8.2f} GDOF/s  '
              f'{entry["apply_ms"]:.4f} ms  err {err:.2e}', flush=True)
        out['affine']['kernels'].append(entry)
      except Exception as e:  # pylint: disable=broad-except
        print(f'{name}: FAILED {type(e).__name__}: {e}', flush=True)
        out['affine']['kernels'].append(
            {'kernel': name, 'error': f'{type(e).__name__}: {e}'})

  path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                      'dense3d_ab.json')
  with open(path + '.tmp', 'w') as fh:
    json.dump(out, fh, indent=1)
  os.replace(path + '.tmp', path)
  print(f'wrote {path}')


if __name__ == '__main__':
  main()
