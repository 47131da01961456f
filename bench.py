"""Benchmark: spectral-element operator throughput on TPU.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

Headline metric: stiffness operator apply throughput in GDOF/s (nodal
points x vector components per second) on the Kolmogorov datagen workload
geometry (2D, 64x64 elements, order 8 GLL — reference
``niles/datagen/datagen.py:48-56``), f32 on the attached TPU chip, using the
E-last element-operator fast path (ops/sem2d.py).

``vs_baseline``: speedup over the *reference algorithm* on identical
hardware — the full-Kronecker einsum operator apply that
google-research/swirl-fem uses (``core/interpolation.py:246-292``,
O(N^{2d}) flops/element vs our O(N^{d+1})), in the reference's (E, nper, k)
data layout.  The reference publishes no performance numbers (BASELINE.md),
so its own algorithm at parity precision is the honest baseline.

Timing methodology: K dependent applications chained inside one jitted
fori_loop (measures steady-state device throughput; the ~10-20 ms
host->device dispatch of a jitted call through the tunneled TPU is
amortized over K=300 applies / 100 NSE steps, matching how production
loops batch whole cycles per dispatch).
"""

import json
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from swirlfem_tpu.core.fespace import PRECISION
from swirlfem_tpu.nse.solver import StokesSEM
from swirlfem_tpu.ops import sem2d
from swirlfem_tpu.utils.box import unit_cube_mesh

N_ELEMS = 64
ORDER = 8
DTYPE = jnp.float32


def _timeit(fn, *args, iters=3, warmup=1):
  for _ in range(warmup):
    out = fn(*args)
  jax.block_until_ready(out)
  start = time.perf_counter()
  for _ in range(iters):
    out = fn(*args)
  jax.block_until_ready(out)
  return (time.perf_counter() - start) / iters


def _timeit_chained(apply_fn, u, chain=10, iters=3):
  @jax.jit
  def run(u):
    return jax.lax.fori_loop(0, chain, lambda i, v: apply_fn(v), u)

  return _timeit(run, u, iters=iters) / chain


def _kron_stiffness(sem):
  """Reference-algorithm baseline: full Kronecker einsum stiffness apply in
  the reference's (E, nodes, components) layout."""
  vspace = sem.velocity.vspace
  grad_mats = jnp.asarray(
      vspace.interpolator.interpolation_matrix_grad(), dtype=DTYPE)
  invjacs = vspace.invjacs
  jacdets = vspace.jacdets
  weights = jnp.asarray(vspace.quadrature.weights_nd(2), dtype=DTYPE)

  def apply_a(u):
    u_local = sem.velocity.gather(u)
    ref_grads = jnp.einsum('qnd,enk->eqdk', grad_mats, u_local,
                           precision=PRECISION)
    phys = jnp.einsum('eqdk,eqjd->eqjk', ref_grads, invjacs,
                      precision=PRECISION)
    scaled = jnp.einsum('eqjk,eq,q->eqjk', phys, jacdets, weights,
                        precision=PRECISION)
    back = jnp.einsum('eqjk,eqjd->eqdk', scaled, invjacs,
                      precision=PRECISION)
    out_local = jnp.einsum('qnd,eqdk->enk', grad_mats, back,
                           precision=PRECISION)
    return sem.velocity.interior_mask * sem.velocity.scatter(out_local)

  return apply_a


def main():
  premesh = unit_cube_mesh(N_ELEMS, ndim=2, periodic_dims=(0, 1))
  # Build on the host CPU backend: eager per-op dispatch to a tunneled TPU
  # is latency-bound, and setup math wants f64 anyway.
  with jax.default_device(jax.local_devices(backend='cpu')[0]):
    sem = StokesSEM.create(premesh, boundary_conditions={}, order=ORDER,
                           use_pallas_kernels=True)
    sem = jax.tree.map(
        lambda x: (x.astype(DTYPE)
                   if jnp.issubdtype(x.dtype, jnp.floating) else x), sem)
  device = jax.devices()[0]
  sem = jax.tree.map(lambda x: jax.device_put(x, device), sem)

  mesh = sem.velocity.mesh
  num_dofs = mesh.num_nodes * mesh.ndim
  rng = np.random.default_rng(0)
  ut = tuple(
      jax.device_put(jnp.asarray(rng.standard_normal(mesh.num_nodes), DTYPE),
                     device) for _ in range(2))

  mask = jnp.squeeze(sem.velocity.interior_mask, -1)

  def apply_fast_nodal(ut):
    return tuple(mask * a for a in sem._fast_stiffness(ut))  # pylint: disable=protected-access

  # Correctness cross-check against the reference-algorithm baseline (f32).
  u2 = jnp.stack(ut, axis=-1)
  ref = _kron_stiffness(sem)(u2)
  try:
    got = jnp.stack(apply_fast_nodal(ut), axis=-1)
    jax.block_until_ready(got)
  except Exception as e:  # pylint: disable=broad-except
    # Escape hatch: if the component-batched Mosaic kernel fails to
    # compile on this chip, fall back to per-component launches.
    print(f'batched stiffness kernel failed ({type(e).__name__}); '
          'falling back to per-component launches', file=sys.stderr)
    sem = sem.replace(
        fast_ops=sem.fast_ops.replace(batch_components=False))
    got = jnp.stack(apply_fast_nodal(ut), axis=-1)
  err = float(jnp.abs(ref - got).max() / (jnp.abs(ref).max() + 1e-30))
  assert err < 1e-3, f'fast vs reference-algorithm mismatch: {err}'

  # Hot-loop form: element-local E-last states, as iterated inside CG
  # (layout conversions happen once per solve, not per apply).
  ops = sem.fast_ops
  ut_el = tuple(sem2d.nodal_to_el(u, ops.vinfo) for u in ut)

  def apply_fast(ut_el):
    return tuple(ops.stiffness_el(w) for w in ut_el)

  t_fast = _timeit_chained(apply_fast, ut_el, chain=300)
  t_kron = _timeit_chained(_kron_stiffness(sem), u2, chain=4)
  gdofs = num_dofs / t_fast / 1e9

  # Secondary: NSE wall-clock per step.  States stay in el (E-last) form
  # ACROSS steps and both solves use the el-native exact FDM inverses, so
  # the step runs with zero layout conversions (each costs ~0.3 ms of pure
  # kernel-launch overhead through the tunnel).
  vc = np.asarray(mesh.node_coords)
  u0 = tuple(
      jax.device_put(jnp.asarray(np.sin(2 * np.pi * vc[:, 1 - j]), DTYPE),
                     device) for j in range(2))
  with jax.default_device(jax.local_devices(backend='cpu')[0]):
    vprecond_el, pprecond_el = sem.fdm_el_preconditioners(
        1e-4, 1e-4, time_order=2)
  u0_el = jax.jit(sem.velocity_to_el)(u0)
  p0_el = jax.device_put(
      jnp.zeros((ORDER - 1,) * 2 + (N_ELEMS,) * 2, DTYPE), device)
  zero_f = tuple(jnp.zeros_like(c) for c in u0_el)

  # 100 steps per dispatch: the ~20 ms tunneled host->device dispatch
  # otherwise dominates a ~0.5 ms step (production runs batch whole cycles
  # per dispatch the same way, niles/datagen.py advance).
  STEPS = 100

  @jax.jit
  def some_steps(us, ps):
    def body(carry, _):
      us, ps = carry
      u, p, _ = sem.stokes_one_step_el(
          list(us), list(ps), zero_f, mu=DTYPE(1e-4), dt=DTYPE(1e-4),
          time_order=2, tol=1e-5, atol=1e-6, maxiter=300,
          pressure_preconditioner_el=pprecond_el,
          viscous_preconditioner_el=vprecond_el, exact_solves=True)
      return ((us[1], u), (ps[1], p)), None
    carry, _ = jax.lax.scan(body, (us, ps), None, length=STEPS)
    return carry

  t_step = _timeit(some_steps, (u0_el, u0_el), (p0_el, p0_el),
                   iters=2) / STEPS

  result = {
      'metric': 'stiffness_apply_throughput',
      'value': round(gdofs, 4),
      'unit': 'GDOF/s',
      'vs_baseline': round(t_kron / t_fast, 4),
      'details': {
          'workload': f'2D {N_ELEMS}x{N_ELEMS} elements, order {ORDER} GLL',
          'num_dofs': num_dofs,
          'fast_ms': round(t_fast * 1e3, 4),
          'kron_baseline_ms': round(t_kron * 1e3, 4),
          'nse_step_ms': round(t_step * 1e3, 4),
          'device': str(jax.devices()[0]),
      },
  }
  print(json.dumps(result), flush=True)


if __name__ == '__main__':
  main()
