"""Live A/B: congruent-elements (uniform) stiffness kernel vs the stacked
affine kernel at the headline geometry (2D 64x64 elements, order 8 GLL).

For each kernel x precision, reports steady-state apply time (chained
fori_loop, 3000 applies/dispatch), GDOF/s, and max relative error vs the
f64 operator oracle computed on the host.

Run (TPU):  python experiments/bench_uniform_kernel.py
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N_ELEMS = 64
ORDER = 8


def main():
  import jax
  import jax.numpy as jnp
  import numpy as np

  from swirlfem_tpu.nse.solver import StokesSEM
  from swirlfem_tpu.ops import sem2d
  from swirlfem_tpu.ops.pallas_stiffness import (
      _uniform_amat_np, stiffness_el_pallas_affine,
      stiffness_el_pallas_uniform)
  from swirlfem_tpu.utils.box import unit_cube_mesh

  on_tpu = jax.devices()[0].platform == 'tpu'
  dtype = jnp.float32
  with jax.default_device(jax.local_devices(backend='cpu')[0]):
    premesh = unit_cube_mesh(N_ELEMS, ndim=2, periodic_dims=(0, 1))
    sem = StokesSEM.create(premesh, boundary_conditions={}, order=ORDER,
                           use_pallas_kernels=on_tpu)
    sem = jax.tree.map(
        lambda x: (x.astype(dtype)
                   if jnp.issubdtype(x.dtype, jnp.floating) else x), sem)
  device = jax.devices()[0]
  sem = jax.tree.map(lambda x: jax.device_put(x, device), sem)
  ops = sem.fast_ops
  assert ops.c_uniform is not None, 'headline box must be congruent'
  n = ORDER + 1
  num_e = N_ELEMS ** 2
  num_dofs = 2 * n * n * num_e

  rng = np.random.default_rng(0)
  us_np = [rng.standard_normal((n, n, num_e)) for _ in range(2)]
  us = tuple(jax.device_put(jnp.asarray(u, dtype), device) for u in us_np)

  # f64 oracle on the host: out = A64 @ u per component.
  a64 = _uniform_amat_np(ops.c_uniform, ops.wq2d, ops.dmat)
  refs = [(a64 @ u.reshape(n * n, num_e)).reshape(n, n, num_e)
          for u in us_np]
  scale = max(np.abs(r).max() for r in refs)

  def timeit(fn, chain=3000, iters=2):
    @jax.jit
    def run(us):
      return jax.lax.fori_loop(0, chain, lambda i, v: fn(v), us)
    out = run(us)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
      out = run(us)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters / chain

  results = {'device': str(device), 'num_dofs': num_dofs, 'cases': []}
  cases = [
      ('affine', 'HIGHEST', lambda us: stiffness_el_pallas_affine(
          us, ops.g_affine, ops.wq2d, ops.dmat)),
      ('affine', 'bf16x3', lambda us: stiffness_el_pallas_affine(
          us, ops.g_affine, ops.wq2d, ops.dmat, precision='bf16x3')),
      ('uniform', 'HIGHEST', lambda us: stiffness_el_pallas_uniform(
          us, ops.c_uniform, ops.wq2d, ops.dmat)),
      ('uniform', 'bf16x3', lambda us: stiffness_el_pallas_uniform(
          us, ops.c_uniform, ops.wq2d, ops.dmat, precision='bf16x3')),
  ]
  # Element-tile sweep on the uniform kernel.  Hypothesis was that tiles
  # smaller than num_e let Pallas double-buffer DMA against compute across
  # grid steps; MEASURED (v5e, logs_r2_tpu/uniform_tile_sweep.log): the
  # single-step grid (tile_e = num_e = 4096) is fastest — 11.72 us vs
  # 12.99 us at 1024/2048 and 14.51 us at 256.  At this size the kernel is
  # HBM-bound and Mosaic already overlaps the streamed (n*n, tile_e) input
  # blocks; extra grid steps only add per-step launch/index overhead.  The
  # tile_e=4096 default stands.
  for tile in (256, 512, 1024, 2048):
    cases.append((f'uniform_tile{tile}', 'HIGHEST',
                  lambda us, tile=tile: stiffness_el_pallas_uniform(
                      us, ops.c_uniform, ops.wq2d, ops.dmat, tile_e=tile)))
  for kernel, prec, fn in cases:
    got = fn(us)
    err = max(
        float(np.abs(np.asarray(g, np.float64) - r).max()) / scale
        for g, r in zip(got, refs))
    t = timeit(fn) if on_tpu else timeit(fn, chain=3, iters=1)
    case = {'kernel': kernel, 'precision': prec,
            'apply_us': round(t * 1e6, 2),
            'gdofs': round(num_dofs / t / 1e9, 2),
            'rel_err_vs_f64': float(f'{err:.3g}')}
    results['cases'].append(case)
    print(json.dumps(case), flush=True)

  out_path = 'experiments/uniform_kernel_ab.json'
  with open(out_path, 'w') as fh:
    json.dump(results, fh, indent=2)
  print(f'wrote {out_path}')


if __name__ == '__main__':
  main()
