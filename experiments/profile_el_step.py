"""Stage-level profile of the 2D periodic el-form NSE step (VERDICT r4 #8).

The bench's NSE step (64x64 elements order 8, exact FDM inverses, states
in el form across steps) measures ~0.50 ms while the headline stiffness
apply is 9.3 us — so the step is ~50 apply-equivalents and the question
is where they go.  This times each stage of ``stokes_step_el`` CHAINED
in its own jitted scan (feeding outputs back as inputs — identical-input
chains can hit the tunnel's result cache) and the full step alongside,
then prints a stage table + writes ``experiments/el_step_profile.json``.

Stages: BDF mass rhs, viscous FDM inverse (both components), modal
filter, E-operator apply (div Q grad), pressure FDM preconditioner
apply, exchange (pallas + XLA forms), full stokes_one_step_el.
"""

import functools
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N_ELEMS = 64
ORDER = 8


def main():
  import jax
  jax.config.update('jax_compilation_cache_dir', os.path.join(
      os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
      '.jax_cache'))
  import jax.numpy as jnp
  import numpy as np

  from swirlfem_tpu.nse.solver import StokesSEM
  from swirlfem_tpu.ops import sem2d
  from swirlfem_tpu.utils.box import unit_cube_mesh

  device = jax.devices()[0]
  on_tpu = device.platform != 'cpu'
  dtype = jnp.float32
  with jax.default_device(jax.local_devices(backend='cpu')[0]):
    sem = StokesSEM.create(
        unit_cube_mesh(N_ELEMS, ndim=2, periodic_dims=(0, 1)),
        boundary_conditions={}, order=ORDER, use_pallas_kernels=on_tpu)
    sem = jax.tree.map(
        lambda x: (x.astype(dtype)
                   if jnp.issubdtype(x.dtype, jnp.floating) else x), sem)
    vp_el, pp_el = sem.fdm_el_preconditioners(1e-4, 1e-4, time_order=2)
  sem = jax.device_put(sem, device)
  ops = sem.fast_ops
  vinfo, pinfo = ops.vinfo, ops.pinfo
  mod = sem2d
  kk, mm, n = ORDER + 1, ORDER - 1, N_ELEMS
  rng = np.random.default_rng(0)

  u_el = tuple(jax.device_put(jnp.asarray(
      rng.standard_normal((kk, kk, n, n)), dtype)) for _ in range(2))
  p_el = jax.device_put(jnp.asarray(
      rng.standard_normal((mm, mm, n, n)), dtype))

  steps = 300 if on_tpu else 3
  results = {}

  def timeit(name, fn, init):
    @jax.jit
    def chain(c):
      def body(c, _):
        out = fn(c)
        # renormalize so long chains neither overflow nor underflow
        return jax.tree.map(
            lambda x: x / (1e-30 + jnp.sqrt(jnp.mean(x * x))), out), None
      c, _ = jax.lax.scan(body, c, None, length=steps)
      return c
    out = jax.block_until_ready(chain(init))
    ts = []
    for _ in range(5):
      t0 = time.perf_counter()
      out = jax.block_until_ready(chain(out))
      ts.append((time.perf_counter() - t0) / steps)
    ts.sort()
    ms = ts[len(ts) // 2] * 1e3
    results[name] = round(ms, 5)
    print(f'{name:34s} {ms:8.4f} ms', flush=True)
    return ms

  flat = lambda w: w.reshape(kk, kk, n * n)
  unflat = lambda w: w.reshape(kk, kk, n, n)
  pflat = lambda w: w.reshape(mm, mm, n * n)

  # Stage: component-batched stiffness apply (the headline kernel).
  timeit('stiffness_el_multi (2 comps)',
         lambda us: tuple(unflat(w) for w in
                          ops.stiffness_el_multi(tuple(flat(c)
                                                       for c in us))), u_el)
  # Stage: viscous FDM inverse, both components.
  timeit('viscous FDM inverse (2 comps)', lambda us: vp_el(us), u_el)
  # Stage: pressure FDM/exact preconditioner apply.
  timeit('pressure precond apply', lambda p: pp_el(p), p_el)
  # Stage: exchange (QQ^T) — pallas fused and XLA roll forms.
  if on_tpu:
    timeit('exchange_el pallas (1 field)',
           lambda w: mod.exchange_el(w, vinfo, use_pallas=True), u_el[0])
  timeit('exchange_el XLA (1 field)',
         lambda w: mod.exchange_el(w, vinfo), u_el[0])
  # Stage: E operator = div (dt/b) M^-1 exch grad.
  wmass = ops.wmass

  def e_apply(p):
    gx, gy = ops.gradient_el(pflat(p))
    diag_i = 1.0 / mod.exchange_el(unflat(wmass * jnp.ones_like(gx)).astype(
        dtype), vinfo).reshape(kk, kk, n * n)
    qx = diag_i * mod.exchange_el(unflat(gx), vinfo).reshape(kk, kk, -1)
    qy = diag_i * mod.exchange_el(unflat(gy), vinfo).reshape(kk, kk, -1)
    return pflat(ops.divergence_el(qx, qy)).reshape(mm, mm, n, n)

  timeit('E apply (div Qt grad)', e_apply, p_el)
  # Stage: modal filter (interp down/up + exchange + blend).
  grid = sem.velocity.mesh.gridpoints_1d
  from swirlfem_tpu.core.quadrature import Nodes1D
  from swirlfem_tpu.core.tensor import BarycentricInterpolator
  low = Nodes1D.create(grid.num_points - 1, grid.node_type)
  down = BarycentricInterpolator(1, grid, low)
  up = BarycentricInterpolator(1, low, grid)
  blend = jnp.asarray(
      up.interpolation_matrix() @ down.interpolation_matrix(), dtype)

  def filt(w):
    fw = ops.interp_all(blend, flat(w))
    return 0.95 * w + 0.05 * unflat(fw)

  timeit('modal filter (1 comp, no exch)', filt, u_el[0])

  # Full step (the bench configuration).
  zero_f = tuple(jnp.zeros_like(c) for c in u_el)
  ps2 = (p_el, p_el)
  us2 = (u_el, u_el)

  def full(carry):
    us2, ps2 = carry
    u, p, _ = sem.stokes_one_step_el(
        list(us2), list(ps2), zero_f, mu=dtype(1e-4), dt=dtype(1e-4),
        time_order=2, tol=1e-5, atol=1e-6, maxiter=300,
        pressure_preconditioner_el=pp_el, viscous_preconditioner_el=vp_el,
        exact_solves=True)
    return ((us2[1], u), (ps2[1], p))

  timeit('FULL stokes_one_step_el', full, (us2, ps2))

  path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                      'el_step_profile.json')
  results['workload'] = f'2D {N_ELEMS}x{N_ELEMS} order {ORDER}'
  results['device'] = str(device)
  with open(path + '.tmp', 'w') as fh:
    json.dump(results, fh, indent=1)
  os.replace(path + '.tmp', path)
  print(f'wrote {path}')


if __name__ == '__main__':
  main()
