"""A/B harness for 2D stiffness-apply kernel variants on the live TPU.

The headline apply (order 8, 64x64 elements, f32) measures ~26% of HBM
peak; the component-batched kernel ties the per-component one despite 30%
fewer HBM bytes, so the kernel is COMPUTE-limited: its (9, TE) row ops
underuse the VPU (81 scalar-FMA accumulations for the xi contraction) and
the MXU (9x9 x 9x512 matmuls for eta).  This script times every candidate
formulation at several element-tile widths and checks each against the
XLA einsum oracle, so kernel work is driven by measurements instead of
guesses.

Run: python experiments/bench_stiffness_kernels.py [--order 8] [--nelems 64]
"""

import argparse
import functools
import sys
import time

sys.path.insert(0, '.')

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from swirlfem_tpu.core.bc import BCType  # noqa: F401 (import check)
from swirlfem_tpu.nse.solver import StokesSEM
from swirlfem_tpu.ops import pallas_stiffness, sem2d
from swirlfem_tpu.utils.box import unit_cube_mesh

HP = jax.lax.Precision.HIGHEST


def _kernel_stacked(dstack_ref, dstack_t_ref, u_ref, g_ref, out_ref):
  """Both derivative stages as ONE (2n^2, n^2) matmul each.

  dstack = [Dxi; Deta] (2n^2, n^2) maps u -> [ur; us]; the pointwise
  geometric stage maps [ur; us] -> [fa; fb]; dstack_t = [Dxi^T Deta^T]
  (n^2, 2n^2) maps [fa; fb] -> out.  g_ref carries [G11; G12; G22]
  stacked along sublanes, (3n^2, TE).
  """
  n2 = u_ref.shape[0]
  dt = u_ref.dtype
  rs = jnp.dot(dstack_ref[:], u_ref[:], precision=HP,
               preferred_element_type=dt)               # (2n^2, TE)
  ur, us = rs[:n2], rs[n2:]
  g11, g12, g22 = g_ref[:n2], g_ref[n2:2 * n2], g_ref[2 * n2:]
  fa = g11 * ur + g12 * us
  fb = g12 * ur + g22 * us
  fab = jnp.concatenate([fa, fb], axis=0)               # (2n^2, TE)
  out_ref[:] = jnp.dot(dstack_t_ref[:], fab, precision=HP,
                       preferred_element_type=dt)


def stiffness_stacked(u, g11, g12, g22, dmat, *, tile_e=512):
  n = u.shape[0]
  num_e = u.shape[2]
  if num_e % tile_e:
    tile_e = num_e
  d_np = np.asarray(dmat)
  eye = np.eye(n)
  dxi = np.kron(d_np, eye)
  deta = np.kron(eye, d_np)
  dstack = jnp.asarray(np.concatenate([dxi, deta], 0), dtype=u.dtype)
  dstack_t = jnp.asarray(np.concatenate([dxi.T, deta.T], 1), dtype=u.dtype)
  g = jnp.concatenate([x.reshape(n * n, num_e) for x in (g11, g12, g22)], 0)

  grid = (num_e // tile_e,)
  block = pl.BlockSpec((n * n, tile_e), lambda i: (0, i),
                       memory_space=pltpu.VMEM)
  gblock = pl.BlockSpec((3 * n * n, tile_e), lambda i: (0, i),
                        memory_space=pltpu.VMEM)
  dspec = pl.BlockSpec((2 * n * n, n * n), lambda i: (0, 0),
                       memory_space=pltpu.VMEM)
  dtspec = pl.BlockSpec((n * n, 2 * n * n), lambda i: (0, 0),
                        memory_space=pltpu.VMEM)
  out = pl.pallas_call(
      _kernel_stacked,
      out_shape=jax.ShapeDtypeStruct((n * n, num_e), u.dtype),
      grid=grid,
      in_specs=[dspec, dtspec, block, gblock],
      out_specs=block,
  )(dstack, dstack_t, u.reshape(n * n, num_e), g)
  return out.reshape(n, n, num_e)


def _kernel_mmrows(d_ref, u_ref, g11_ref, g12_ref, g22_ref, out_ref):
  """Variant: eta stage as one (n, n) @ (n, n*TE) matmul via row regroup.

  The (n^2, TE) tile is regrouped into n row-blocks of (n, TE); the eta
  contraction for row-block a is d @ block_a — batched as ONE matmul by
  concatenating blocks along lanes: (n, n) @ (n, n*TE).  The xi stage
  stays scalar-FMA rows (they vectorize over full (n, TE) tiles).
  """
  d = d_ref[:]
  n = d.shape[0]
  ub = [u_ref[a * n:(a + 1) * n] for a in range(n)]     # each (n, TE)
  wide = jnp.concatenate(ub, axis=1)                    # (n, n*TE)
  us_wide = jnp.dot(d, wide, precision=HP, preferred_element_type=wide.dtype)
  te = ub[0].shape[1]
  us = [us_wide[:, a * te:(a + 1) * te] for a in range(n)]
  ur = [sum(d_ref[a, m] * ub[m] for m in range(n)) for a in range(n)]
  fa = [g11_ref[a * n:(a + 1) * n] * ur[a]
        + g12_ref[a * n:(a + 1) * n] * us[a] for a in range(n)]
  fb = [g12_ref[a * n:(a + 1) * n] * ur[a]
        + g22_ref[a * n:(a + 1) * n] * us[a] for a in range(n)]
  fb_wide = jnp.concatenate(fb, axis=1)
  t2_wide = jnp.dot(d.T, fb_wide, precision=HP,
                    preferred_element_type=fb_wide.dtype)
  for m in range(n):
    t1 = sum(d_ref[a, m] * fa[a] for a in range(n))
    out_ref[m * n:(m + 1) * n] = t1 + t2_wide[:, m * te:(m + 1) * te]


def stiffness_mmrows(u, g11, g12, g22, dmat, *, tile_e=512):
  n = u.shape[0]
  num_e = u.shape[2]
  if num_e % tile_e:
    tile_e = num_e
  d = jnp.asarray(dmat, dtype=u.dtype)
  grid = (num_e // tile_e,)
  block = pl.BlockSpec((n * n, tile_e), lambda i: (0, i),
                       memory_space=pltpu.VMEM)
  dspec = pl.BlockSpec((n, n), lambda i: (0, 0), memory_space=pltpu.VMEM)
  flat = lambda x: x.reshape(n * n, num_e)
  out = pl.pallas_call(
      _kernel_mmrows,
      out_shape=jax.ShapeDtypeStruct((n * n, num_e), u.dtype),
      grid=grid,
      in_specs=[dspec] + [block] * 4,
      out_specs=block,
  )(d, flat(u), flat(g11), flat(g12), flat(g22))
  return out.reshape(n, n, num_e)


def _timeit(fn, args, chain=300, iters=3):
  """Times `chain` dependent applies per dispatch, `iters` dispatches
  pipelined with a single final block — the ~20 ms tunneled host->device
  round trip is paid once per measurement, not once per dispatch."""
  @jax.jit
  def run(args):
    return jax.lax.fori_loop(
        0, chain, lambda i, v: fn(v), args)

  out = run(args)
  jax.block_until_ready(out)
  t0 = time.perf_counter()
  for _ in range(iters):
    out = run(out)
  jax.block_until_ready(out)
  return (time.perf_counter() - t0) / (chain * iters)


def main():
  ap = argparse.ArgumentParser()
  ap.add_argument('--order', type=int, default=8)
  ap.add_argument('--nelems', type=int, default=64)
  ap.add_argument('--chain', type=int, default=300)
  args = ap.parse_args()

  dtype = jnp.float32
  with jax.default_device(jax.local_devices(backend='cpu')[0]):
    premesh = unit_cube_mesh(args.nelems, ndim=2, periodic_dims=(0, 1))
    sem = StokesSEM.create(premesh, boundary_conditions={}, order=args.order)
    sem = jax.tree.map(
        lambda x: (x.astype(dtype)
                   if jnp.issubdtype(x.dtype, jnp.floating) else x), sem)
  device = jax.devices()[0]
  ops = jax.tree.map(lambda x: jax.device_put(x, device), sem.fast_ops)
  k = args.order + 1
  num_e = args.nelems ** 2
  rng = np.random.default_rng(0)
  u2 = tuple(
      jax.device_put(jnp.asarray(rng.standard_normal((k, k, num_e)), dtype),
                     device) for _ in range(2))
  g11, g12, g22, dmat = ops.g11, ops.g12, ops.g22, ops.dmat
  num_dofs = 2 * k * k * num_e
  # HBM bytes per 2-component apply at f32 (per-component factor reads
  # unless noted), and the 819 GB/s v5e bound.
  bytes_pc = 2 * 5 * k * k * num_e * 4
  bytes_batched = 7 * k * k * num_e * 4
  print(f'order {args.order}, {num_e} elements, {num_dofs} el-dofs; '
        f'SOL(per-comp reads) {bytes_pc / 819e9 * 1e6:.1f} us, '
        f'SOL(batched reads) {bytes_batched / 819e9 * 1e6:.1f} us')

  oracle = tuple(ops.replace(use_pallas=False).stiffness_el(u) for u in u2)
  oracle = jax.tree.map(np.asarray, oracle)

  def check(name, fn):
    got = jax.tree.map(np.asarray, fn(u2))
    err = max(
        np.abs(g - o).max() / (np.abs(o).max() + 1e-30)
        for g, o in zip(got, oracle))
    assert err < 1e-5, (name, err)

  variants = {}
  variants['xla_einsum'] = lambda us: tuple(
      ops.replace(use_pallas=False).stiffness_el(u) for u in us)
  for tile in (256, 512, 1024, 2048):
    variants[f'rows_pc_t{tile}'] = functools.partial(
        lambda us, t: tuple(
            pallas_stiffness.stiffness_el_pallas(
                u, g11, g12, g22, dmat, tile_e=t) for u in us), t=tile)
    variants[f'rows_batched_t{tile}'] = functools.partial(
        lambda us, t: pallas_stiffness.stiffness_el_pallas_batched(
            us, g11, g12, g22, dmat, tile_e=t), t=tile)
    variants[f'kron_t{tile}'] = functools.partial(
        lambda us, t: tuple(
            pallas_stiffness.stiffness_el_pallas_kron(
                u, g11, g12, g22, dmat, tile_e=t) for u in us), t=tile)
    variants[f'stacked_t{tile}'] = functools.partial(
        lambda us, t: tuple(
            stiffness_stacked(u, g11, g12, g22, dmat, tile_e=t)
            for u in us), t=tile)
    variants[f'mmrows_t{tile}'] = functools.partial(
        lambda us, t: tuple(
            stiffness_mmrows(u, g11, g12, g22, dmat, tile_e=t)
            for u in us), t=tile)

  results = {}
  for name, fn in variants.items():
    try:
      check(name, fn)
      t = _timeit(fn, u2, chain=args.chain)
    except Exception as e:  # pylint: disable=broad-except
      print(f'{name:24s} FAILED: {type(e).__name__}: {str(e)[:120]}')
      continue
    results[name] = t
    print(f'{name:24s} {t * 1e6:8.1f} us  {num_dofs / t / 1e9:7.2f} GDOF/s')

  best = min(results, key=results.get)
  print(f'\nbest: {best} at {results[best] * 1e6:.1f} us '
        f'({num_dofs / results[best] / 1e9:.2f} GDOF/s)')


if __name__ == '__main__':
  main()
