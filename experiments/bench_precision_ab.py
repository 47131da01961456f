"""A/B: MXU matmul precision x element tile for the affine stiffness kernel.

The affine-element kernel (`ops/pallas_stiffness.py:stiffness_el_pallas_affine`)
is all-MXU: one stacked (3n^2, n^2) x (n^2, TE) matmul per component.  On
v5e the MXU is natively bf16; f32 ``Precision.HIGHEST`` is a multi-pass
emulation, so precision is a real throughput knob:

  * HIGHEST — full f32-accurate passes (the default everywhere);
  * HIGH    — fewer bf16 passes, ~1e-7-relative extra rounding;
  * DEFAULT — single bf16 pass (inputs truncated), ~1e-3 relative.

This experiment measures steady-state GDOF/s and max relative error vs a
float64 host oracle for each (precision, tile_e) on the bench workload
(2D 64x64 elements, order 8 — the Kolmogorov datagen geometry), so the
default can be chosen from data, not guesswork.  The accuracy gate for
using anything below HIGHEST inside CG: the f32 representation floor of
the operator output is ~1e-6 relative already.

Usage: python experiments/bench_precision_ab.py  (requires the live TPU)
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import _probe_tpu, _timeit_chained, N_ELEMS, ORDER  # noqa: E402


def main():
  device_kind = _probe_tpu()
  if device_kind is None:
    print(json.dumps({'error': 'tpu_unavailable'}))
    return

  import jax
  import jax.numpy as jnp
  import numpy as np
  from swirlfem_tpu.nse.solver import StokesSEM
  from swirlfem_tpu.ops import sem2d
  from swirlfem_tpu.ops.pallas_stiffness import stiffness_el_pallas_affine
  from swirlfem_tpu.utils.box import unit_cube_mesh

  dtype = jnp.float32
  premesh = unit_cube_mesh(N_ELEMS, ndim=2, periodic_dims=(0, 1))
  with jax.default_device(jax.local_devices(backend='cpu')[0]):
    sem = StokesSEM.create(premesh, boundary_conditions={}, order=ORDER,
                           use_pallas_kernels=True)
    sem = jax.tree.map(
        lambda x: (x.astype(dtype)
                   if jnp.issubdtype(x.dtype, jnp.floating) else x), sem)
  device = jax.devices()[0]
  sem = jax.tree.map(lambda x: jax.device_put(x, device), sem)
  ops = sem.fast_ops
  assert ops.g_affine is not None, 'bench box must be affine'

  mesh = sem.velocity.mesh
  rng = np.random.default_rng(0)
  ut = tuple(jnp.asarray(rng.standard_normal(mesh.num_nodes), dtype)
             for _ in range(2))
  ut_el = tuple(jax.device_put(sem2d.nodal_to_el(u, ops.vinfo), device)
                for u in ut)
  n = ORDER + 1
  num_e = N_ELEMS * N_ELEMS
  num_dofs = mesh.num_nodes * 2

  # Float64 host oracle: y = c11 (M11 u) + c12 (M12 u) + c22 (M22 u),
  # built by the kernel's own stack constructor (numpy f64 — jnp would
  # truncate to f32 without x64).
  from swirlfem_tpu.ops.pallas_stiffness import _affine_mstack_np
  mstack64 = _affine_mstack_np(ops.wq2d, ops.dmat)
  n2 = n * n
  c64 = np.asarray(ops.g_affine, np.float64)
  want = []
  for u in ut_el:
    u64 = np.asarray(u, np.float64).reshape(n2, num_e)
    y = np.asarray(mstack64 @ u64)
    want.append(c64[0] * y[:n2] + c64[1] * y[n2:2 * n2] + c64[2] * y[2 * n2:])
  wmax = max(np.abs(w).max() for w in want)

  results = []
  # Mosaic supports DEFAULT (1 bf16 pass) and HIGHEST (f32 emulation);
  # Precision.HIGH raises NotImplementedError.  'bf16x3' is this repo's
  # manual 3-pass middle ground (_kernel_affine_mm3).
  for prec_name in ('DEFAULT', 'bf16x3', 'HIGHEST'):
    precision = (prec_name if prec_name == 'bf16x3'
                 else getattr(jax.lax.Precision, prec_name))
    for tile_e in (1024, 2048, 4096):
      def apply_fn(ut_el, tile_e=tile_e, precision=precision):
        return stiffness_el_pallas_affine(
            ut_el, ops.g_affine, ops.wq2d, ops.dmat, tile_e=tile_e,
            precision=precision)
      got = jax.jit(apply_fn)(ut_el)
      err = max(
          float(np.abs(np.asarray(g, np.float64).reshape(n2, num_e) - w)
                .max()) for g, w in zip(got, want)) / wmax
      t = _timeit_chained(apply_fn, ut_el, chain=3000, iters=2)
      row = {'precision': prec_name, 'tile_e': tile_e,
             'apply_us': round(t * 1e6, 2),
             'gdofs': round(num_dofs / t / 1e9, 2),
             'rel_err_vs_f64': float(f'{err:.3g}')}
      results.append(row)
      print(json.dumps(row), flush=True)

  best = min(results, key=lambda r: r['apply_us'])
  print(json.dumps({'best': best, 'device': device_kind}))


if __name__ == '__main__':
  main()
