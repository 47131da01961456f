"""HBM accounting for the 3D TGV step at 32^3 elements order 7 (VERDICT r3 #3).

The r2 campaign's 32^3:7 rung died in RESOURCE_EXHAUSTED; this probe
quantifies where the HBM goes before any fix:

  * bytes of the solver pytree (geometric fields, tables) on device;
  * bytes of the time-stepping carry (us, ps, cus histories);
  * the compiled chunk executable's own accounting
    (``compiled.memory_analysis()``: argument / output / temp / alias);
  * live ``memory_stats()`` before and after one small chunk.

Usage:  python experiments/tgv_mem_probe.py [--n_el 32] [--order 7]
        [--steps 10] [--run]
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def tree_bytes(tree):
  return sum(x.nbytes for x in jax.tree_util.tree_leaves(tree)
             if hasattr(x, 'nbytes'))


def fmt(n):
  return f'{n / 2**30:.3f} GiB'


def device_stats(device, tag):
  try:
    s = device.memory_stats()
    if s is None:
      print(f'[{tag}] memory_stats: None (axon)', flush=True)
      return {}
    print(f'[{tag}] in_use {fmt(s.get("bytes_in_use", 0))}  '
          f'peak {fmt(s.get("peak_bytes_in_use", 0))}  '
          f'limit {fmt(s.get("bytes_limit", 0))}', flush=True)
    return s
  except Exception as e:  # pylint: disable=broad-except
    print(f'[{tag}] memory_stats unavailable: {e}', flush=True)
    return {}


def main():
  ap = argparse.ArgumentParser()
  ap.add_argument('--n_el', type=int, default=32)
  ap.add_argument('--order', type=int, default=7)
  ap.add_argument('--steps', type=int, default=10)
  ap.add_argument('--run', action='store_true',
                  help='also execute one chunk (not just compile)')
  ap.add_argument('--cpu', action='store_true')
  args = ap.parse_args()
  if args.cpu:
    jax.config.update('jax_platforms', 'cpu')

  cache_dir = os.path.join(os.path.dirname(os.path.dirname(
      os.path.abspath(__file__))), '.jax_cache')
  jax.config.update('jax_compilation_cache_dir', cache_dir)

  from swirlfem_tpu.examples import taylor_green_3d as tg

  device = jax.devices()[0]
  on_tpu = device.platform != 'cpu'
  device_stats(device, 'start')

  if on_tpu:
    with jax.default_device(jax.local_devices(backend='cpu')[0]):
      sem = tg.create_tgv(args.n_el, args.order, jnp.float32,
                          use_pallas=True)
    sem = jax.device_put(sem, device)
  else:
    sem = tg.create_tgv(args.n_el, args.order, jnp.float32)
  jax.block_until_ready(sem)
  print(f'solver pytree: {fmt(tree_bytes(sem))}', flush=True)
  big = sorted(((x.nbytes, jax.tree_util.keystr(p)) for p, x in
                jax.tree_util.tree_leaves_with_path(sem)
                if hasattr(x, 'nbytes')), key=lambda t: -t[0])[:20]
  for nb, p in big:
    print(f'  {fmt(nb):>12}  {p}')
  device_stats(device, 'solver on device')

  mu = 1.0 / 1600.0
  dt = tg.default_dt(sem)
  advance, conv_el = tg.make_advance(sem, mu=mu, dt=dt, time_order=2,
                                     steps_per_chunk=args.steps, tol=1e-5)
  u0 = tg.tgv_initial(sem)
  m = sem.fast_ops.pinfo.order + 1
  n = sem.fast_ops.pinfo.num_elements_per_dim
  p0 = jnp.zeros((m,) * 3 + (n,) * 3, dtype=jnp.float32)
  cu0 = conv_el(u0)
  us, ps, cus = (u0,) * 2, (p0,) * 2, (cu0,) * 2
  jax.block_until_ready((us, ps, cus))
  print(f'carry (us+ps+cus): {fmt(tree_bytes((us, ps, cus)))}', flush=True)
  device_stats(device, 'carry on device')

  # Compile-only analysis: the executable's own memory plan.
  import time
  t0 = time.time()
  lowered = jax.jit(lambda s, u, p, c: tg.make_advance(
      s, mu=mu, dt=dt, time_order=2, steps_per_chunk=args.steps,
      tol=1e-5)[0](u, p, c))
  # reuse the advance closure directly (it is already jitted inside)
  from swirlfem_tpu.examples.taylor_green_3d import make_advance  # noqa
  adv_fn = advance  # calls the inner jitted advance_fn(sem, us, ps, cus)
  # Trace/compile via AOT on the inner jitted function for memory_analysis.
  inner = None
  for cell in getattr(adv_fn, '__closure__', []) or []:
    v = cell.cell_contents
    if callable(v) and hasattr(v, 'lower'):
      inner = v
  if inner is not None:
    sem_slim = sem.slim_for_el_step()
    print(f'slim solver pytree: {fmt(tree_bytes(sem_slim))}', flush=True)
    lw = inner.lower(sem_slim, us, ps, cus)
    comp = lw.compile()
    print(f'compile: {time.time() - t0:.1f} s', flush=True)
    try:
      ma = comp.memory_analysis()
      print(json.dumps({
          'argument': fmt(ma.argument_size_in_bytes),
          'output': fmt(ma.output_size_in_bytes),
          'temp': fmt(ma.temp_size_in_bytes),
          'alias': fmt(ma.alias_size_in_bytes),
          'generated_code': fmt(ma.generated_code_size_in_bytes),
          'total_nonalias': fmt(ma.argument_size_in_bytes
                                + ma.output_size_in_bytes
                                + ma.temp_size_in_bytes
                                - ma.alias_size_in_bytes),
      }, indent=1), flush=True)
    except Exception as e:  # pylint: disable=broad-except
      print(f'memory_analysis unavailable: {e}', flush=True)
  else:
    print('could not find inner jitted advance for AOT analysis', flush=True)

  if args.run:
    t0 = time.time()
    (us, ps, cus), (ke_c, diss_c) = advance(us, ps, cus)
    ke_c = np.asarray(ke_c)
    print(f'ran {args.steps} steps in {time.time() - t0:.1f} s; '
          f'ke[-1] {ke_c[-1]:.6f}', flush=True)
    device_stats(device, 'after chunk')


if __name__ == '__main__':
  main()
