"""A/B the component-batched Pallas stiffness against per-component launches.

Run on a real TPU.  Expected: ~30% less HBM traffic per 2-component apply
(the three geometric-factor fields are read once) in the bandwidth-bound
regime, plus one fewer launch -- see ops/pallas_stiffness.py.

    python experiments/bench_batched_stiffness.py [--order 8] [--n 64]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def timeit_chained(apply_fn, args, chain=300, iters=3):
  @jax.jit
  def run(args):
    def body(c, _):
      out = apply_fn(c)
      return out, ()
    out, _ = jax.lax.scan(body, args, None, length=chain)
    return out

  args = jax.device_put(args, jax.devices()[0])
  out = run(args)
  jax.block_until_ready(out)
  best = np.inf
  for _ in range(iters):
    t0 = time.time()
    out = run(args)
    jax.block_until_ready(out)
    best = min(best, (time.time() - t0) / chain)
  return best


def main():
  ap = argparse.ArgumentParser()
  ap.add_argument('--order', type=int, default=8)
  ap.add_argument('--n', type=int, default=64)
  args = ap.parse_args()

  from swirlfem_tpu.nse.solver import StokesSEM
  from swirlfem_tpu.utils.box import unit_cube_mesh

  with jax.default_device(jax.local_devices(backend='cpu')[0]):
    sem = StokesSEM.create(unit_cube_mesh(args.n, ndim=2,
                                          periodic_dims=(0, 1)),
                           {}, order=args.order, use_pallas_kernels=True)
    sem = jax.tree.map(
        lambda x: (x.astype(jnp.float32)
                   if jnp.issubdtype(x.dtype, jnp.floating) else x), sem)
  sem = jax.device_put(sem, jax.devices()[0])
  ops = sem.fast_ops
  k = args.order + 1
  num_e = args.n * args.n
  rng = np.random.default_rng(0)
  ut = tuple(jnp.asarray(rng.standard_normal((k, k, num_e)), jnp.float32)
             for _ in range(2))

  ref = tuple(ops.stiffness_el(u) for u in ut)
  got = ops.stiffness_el_multi(ut)
  err = max(float(jnp.abs(g - r).max() / (jnp.abs(r).max() + 1e-30))
            for g, r in zip(got, ref))
  print(f'batched vs per-component max rel err: {err:.2e}')
  assert err < 1e-4, err

  t_per = timeit_chained(lambda u: tuple(ops.stiffness_el(c) for c in u), ut)
  t_bat = timeit_chained(ops.stiffness_el_multi, ut)
  dofs = 2 * k * k * num_e
  print(f'per-component: {t_per * 1e3:.3f} ms  '
        f'({dofs / t_per / 1e9:.2f} GDOF/s)')
  print(f'batched:       {t_bat * 1e3:.3f} ms  '
        f'({dofs / t_bat / 1e9:.2f} GDOF/s)  '
        f'[{t_per / t_bat:.2f}x]')


if __name__ == '__main__':
  main()
