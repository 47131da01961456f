"""Benchmark: spectral-element operator throughput on TPU.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

Headline metric: sum-factorized stiffness operator apply throughput in
GDOF/s (nodal points x vector components per second) on the Kolmogorov
datagen workload geometry (2D, 64x64 elements, order 8 GLL — reference
``niles/datagen/datagen.py:48-56``), f32 on the attached TPU chip.

``vs_baseline``: speedup over the *reference algorithm* on identical
hardware — the full-Kronecker einsum operator apply that
google-research/swirl-fem uses (``core/interpolation.py:246-292``,
O(N^{2d}) flops/element vs our O(N^{d+1})).  The reference publishes no
performance numbers (BASELINE.md), so its own algorithm at parity precision
is the honest baseline.

Also reports NSE wall-clock per stokes_one_step as a secondary detail.
"""

import functools
import json
import time

import jax
import jax.numpy as jnp
import numpy as np

from swirlfem_tpu.core.bc import BCType
from swirlfem_tpu.core.fespace import PRECISION
from swirlfem_tpu.nse.solver import StokesSEM
from swirlfem_tpu.utils.box import unit_cube_mesh

N_ELEMS = 64
ORDER = 8
DTYPE = jnp.float32


def _timeit(fn, *args, iters=20, warmup=3):
  for _ in range(warmup):
    out = fn(*args)
  jax.block_until_ready(out)
  start = time.perf_counter()
  for _ in range(iters):
    out = fn(*args)
  jax.block_until_ready(out)
  return (time.perf_counter() - start) / iters


def _timeit_chained(apply_fn, u, chain=50, iters=5):
  """Times `apply_fn` by chaining `chain` dependent applications inside one
  jitted fori_loop: measures steady-state device throughput rather than
  host->device dispatch latency (which dominates through a tunneled TPU)."""

  @jax.jit
  def run(u):
    return jax.lax.fori_loop(0, chain, lambda i, v: apply_fn(v), u)

  t = _timeit(run, u, iters=iters, warmup=2)
  return t / chain


def _kron_stiffness(sem):
  """Reference-algorithm oracle: full Kronecker einsum stiffness apply."""
  vspace = sem.velocity.vspace
  interp = vspace.interpolator
  grad_mats = jnp.asarray(interp.interpolation_matrix_grad(), dtype=DTYPE)
  invjacs = vspace.invjacs
  jacdets = vspace.jacdets
  weights = jnp.asarray(
      vspace.quadrature.weights_nd(2), dtype=DTYPE)

  def apply_a(u):
    u_local = sem.velocity.gather(u)  # (E, n^d, k)
    # Reference-style: one big (q^d, n^d, d) einsum per element per
    # component — O(N^{2d}) flops (core/interpolation.py:260-261 TODO).
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
    sem = StokesSEM.create(premesh, boundary_conditions={}, order=ORDER)
    sem = jax.tree.map(
        lambda x: (x.astype(DTYPE)
                   if jnp.issubdtype(x.dtype, jnp.floating) else x), sem)
  # One bulk transfer to the benchmark device.
  device = jax.devices()[0]
  sem = jax.tree.map(lambda x: jax.device_put(x, device), sem)

  mesh = sem.velocity.mesh
  num_dofs = mesh.num_nodes * mesh.ndim
  rng = np.random.default_rng(0)
  u = jnp.asarray(rng.standard_normal((mesh.num_nodes, mesh.ndim)),
                  dtype=DTYPE)

  apply_sumfact = jax.jit(sem.A)
  apply_kron = jax.jit(_kron_stiffness(sem))

  # Correctness cross-check (f32 tolerance).
  ref = apply_kron(u)
  got = apply_sumfact(u)
  err = float(jnp.abs(ref - got).max() / (jnp.abs(ref).max() + 1e-30))
  assert err < 1e-3, f'sum-factorized vs kron mismatch: {err}'

  t_sumfact = _timeit_chained(sem.A, u)
  t_kron = _timeit_chained(_kron_stiffness(sem), u, chain=10)

  gdofs = num_dofs / t_sumfact / 1e9

  # Secondary: one NSE step wall-clock (fixed 20 CG iteration cap so the
  # measurement is iteration-count independent).
  vc = np.asarray(mesh.node_coords)
  u0 = jnp.asarray(
      np.stack([np.sin(2 * np.pi * vc[:, 1]), np.sin(2 * np.pi * vc[:, 0])],
               axis=-1), dtype=DTYPE)
  pc = np.asarray(sem.pressure.pspace.mesh.node_coords)
  p0 = jnp.zeros(pc.shape[0], dtype=DTYPE)

  @jax.jit
  def ten_steps(us, ps):
    def body(carry, _):
      us, ps = carry
      u, p, _ = sem.stokes_one_step(
          list(us), list(ps), f=jnp.zeros_like(us[-1]),
          mu=DTYPE(1e-4), dt=DTYPE(1e-4), time_order=2, tol=1e-5)
      return ((us[1], u), (ps[1], p)), None
    carry, _ = jax.lax.scan(body, (us, ps), None, length=10)
    return carry

  t_step = _timeit(ten_steps, (u0, u0), (p0, p0), iters=3, warmup=1) / 10

  result = {
      'metric': 'stiffness_apply_throughput',
      'value': round(gdofs, 4),
      'unit': 'GDOF/s',
      'vs_baseline': round(t_kron / t_sumfact, 4),
      'details': {
          'workload': f'2D {N_ELEMS}x{N_ELEMS} elements, order {ORDER} GLL',
          'num_dofs': num_dofs,
          'sumfact_ms': round(t_sumfact * 1e3, 4),
          'kron_baseline_ms': round(t_kron * 1e3, 4),
          'nse_step_ms': round(t_step * 1e3, 4),
          'device': str(jax.devices()[0]),
      },
  }
  print(json.dumps(result))


if __name__ == '__main__':
  main()
