"""A/B: FDM transform-matmul precision on the full NSE step (live TPU).

The flagship datagen step (2D 64x64 order 8, el-native exact FDM solves)
spends its time in dense 1D-transform matmuls executed at
``Precision.HIGHEST`` (f32-accurate multi-pass MXU emulation).  XLA's
``Precision.HIGH`` (bf16x3) halves the MXU passes at ~6e-6 relative
rounding — meaningful for f32 DNS datagen, where the state already
carries ~1e-6 rounding per step, but it does mean the "exact direct
solves" are exact only to bf16x3 level.

Measures ms/step for HIGHEST vs HIGH and the state divergence between
the two trajectories after ``--steps`` steps (relative L_inf on u).

Usage: python experiments/bench_step_precision.py [--steps 1000]
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import _probe_tpu, _timeit, N_ELEMS, ORDER  # noqa: E402


def main():
  ap = argparse.ArgumentParser()
  ap.add_argument('--steps', type=int, default=1000)
  args = ap.parse_args()

  device_kind = _probe_tpu()
  if device_kind is None:
    print(json.dumps({'error': 'tpu_unavailable'}))
    return

  import jax
  import jax.numpy as jnp
  import numpy as np
  from swirlfem_tpu.nse.solver import StokesSEM
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

  mesh = sem.velocity.mesh
  vc = np.asarray(mesh.node_coords)
  u0 = tuple(jnp.asarray(np.sin(2 * np.pi * vc[:, 1 - j]), dtype)
             for j in range(2))
  u0_el = jax.jit(sem.velocity_to_el)(u0)
  p0_el = jnp.zeros((ORDER - 1,) * 2 + (N_ELEMS,) * 2, dtype)
  zero_f = tuple(jnp.zeros_like(c) for c in u0_el)
  chunk = 500

  def make_stepper(precision):
    with jax.default_device(jax.local_devices(backend='cpu')[0]):
      vpre, ppre = sem.fdm_el_preconditioners(1e-4, 1e-4, time_order=2,
                                              precision=precision)

    @jax.jit
    def some_steps(us, ps):
      def body(carry, _):
        us, ps = carry
        u, p, _ = sem.stokes_one_step_el(
            list(us), list(ps), zero_f, mu=dtype(1e-4), dt=dtype(1e-4),
            time_order=2, tol=1e-5, atol=1e-6, maxiter=300,
            pressure_preconditioner_el=ppre,
            viscous_preconditioner_el=vpre, exact_solves=True)
        return ((us[1], u), (ps[1], p)), None
      carry, _ = jax.lax.scan(body, (us, ps), None, length=chunk)
      return carry

    return some_steps

  n_chunks = max(1, round(args.steps / chunk))
  steps_run = n_chunks * chunk
  result = {'workload': f'2D {N_ELEMS}x{N_ELEMS} order {ORDER}, '
                        f'{steps_run} steps', 'device': device_kind}
  finals = {}
  for name in ('HIGHEST', 'HIGH'):
    stepper = make_stepper(getattr(jax.lax.Precision, name))
    t = _timeit(stepper, (u0_el, u0_el), (p0_el, p0_el), iters=2) / chunk
    us, ps = (u0_el, u0_el), (p0_el, p0_el)
    for _ in range(n_chunks):
      us, ps = stepper(us, ps)
    finals[name] = jax.device_get(us[1])
    result[name] = {'ms_per_step': round(t * 1e3, 4)}
    print(json.dumps({name: result[name]}), flush=True)

  ref = np.stack([np.asarray(c, np.float64) for c in finals['HIGHEST']])
  got = np.stack([np.asarray(c, np.float64) for c in finals['HIGH']])
  result['rel_linf_drift'] = float(
      f"{np.abs(got - ref).max() / (np.abs(ref).max() + 1e-30):.4g}")
  result['speedup'] = round(
      result['HIGHEST']['ms_per_step'] / result['HIGH']['ms_per_step'], 3)
  print(json.dumps(result))


if __name__ == '__main__':
  main()
