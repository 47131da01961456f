"""Bisect the large-cylinder step cost: which piece is slow IN COMPOSITION.

Micro applies are fast (E 3.3 ms, M 0.95 ms) and iteration counts are low
(pressure 10-12, viscous 7), yet the full step measures ~670 ms — ~8x the
sum of parts.  This times each sub-solve chained in its own scan to find
where composition goes pathological.

Run: python experiments/bisect_step_cost.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from swirlfem_tpu.core.bc import BCType
from swirlfem_tpu.examples import cylinder as cyl
from swirlfem_tpu.linalg.cg import cg
from swirlfem_tpu.nse.solver import bdfk_coeffs
from swirlfem_tpu.nse.solver import StokesSEM
from swirlfem_tpu.utils.cylinder import cylinder_channel_premesh
from swirlfem_tpu.utils.cylinder import make_cylinder_snap


def timed_scan(fn, init, steps=20, name=''):
  """Time fn chained `steps` times in one jitted scan (dependent chain)."""

  @jax.jit
  def chain(c):
    def body(c, _):
      return fn(c), None
    out, _ = jax.lax.scan(body, c, None, length=steps)
    return out

  out = chain(init)
  jax.block_until_ready(out)
  t0 = time.perf_counter()
  out = chain(init)
  jax.block_until_ready(out)
  ms = (time.perf_counter() - t0) / steps * 1e3
  print(f'{name:48s} {ms:9.2f} ms/step')
  return ms


def main():
  order = 6
  premesh = cylinder_channel_premesh(ns=12, nr=8, nx_up=2, nx_down=28,
                                     ny_low=2, ny_high=2)
  bcs = {
      'cylinder': (BCType.DIRICHLET, 0.0),
      'walls': (BCType.DIRICHLET, 0.0),
      'inflow': (BCType.DIRICHLET, 0.0),
  }
  snap = make_cylinder_snap(premesh, radius=cyl.RADIUS, center=cyl.CENTER)
  with jax.default_device(jax.local_devices(backend='cpu')[0]):
    sem_cpu = StokesSEM.create(premesh, boundary_conditions=bcs, order=order,
                               coord_transform=snap,
                               use_assembled_ops=False)
  sem = jax.device_put(sem_cpu, jax.devices()[0])

  from swirlfem_tpu.niles.datagen import min_node_spacing
  dx = min_node_spacing(sem.velocity.mesh)
  dt = float(0.65 * dx / 2.2)
  time_order = 2
  mu = 1e-3
  tol, atol = 1e-5, 1e-7

  t0 = time.time()
  precond = sem.schwarz_pressure_preconditioner(premesh, bcs, dt, time_order)
  print(f'setup done ({time.time() - t0:.1f} s schwarz)')

  npn = sem.pressure.pspace.mesh.num_nodes
  nv = sem.velocity.mesh.num_nodes
  dtype = sem.velocity.mesh.node_coords.dtype
  rng = np.random.default_rng(0)
  p = jnp.asarray(rng.standard_normal(npn), dtype) * 1e-3
  u = jnp.asarray(rng.standard_normal((nv, 2)), dtype) * 1e-3

  beta_k = float(bdfk_coeffs(time_order)[-1])
  diag_h = sem._viscous_jacobi_diag(mu, dt, time_order)
  imask = sem.velocity.interior_mask

  def hmv(w):
    return imask * ((beta_k / dt) * sem.B(w) + mu * sem.A(w))

  emv = lambda q: sem.E(q, dt=dt, time_order=time_order)

  # 1. pressure CG alone (rescale result so the chain doesn't converge
  #    trivially: normalize each output).
  def pstep(q):
    x, info = cg(emv, q, tol=tol, atol=atol, M=precond)
    return x / (1e-30 + jnp.linalg.norm(x)) * jnp.linalg.norm(q)

  timed_scan(pstep, p, name='pressure CG solve (tol 1e-5, Schwarz M)')

  # 2. viscous CG alone.
  def vstep(w):
    x, info = cg(hmv, imask * w, tol=tol, atol=atol,
                 M=lambda y: sem.velocity.exchange(y) / diag_h[:, None])
    return x / (1e-30 + jnp.linalg.norm(x)) * jnp.linalg.norm(w)

  timed_scan(vstep, u, name='viscous CG solve (tol 1e-5, Jacobi M)')

  # 3. fixed-iteration pressure CG (maxiter-bounded, no early exit).
  def pstep_fixed(q):
    x, info = cg(emv, q, tol=0.0, atol=0.0, maxiter=12, M=precond)
    return x / (1e-30 + jnp.linalg.norm(x)) * jnp.linalg.norm(q)

  timed_scan(pstep_fixed, p, name='pressure CG, exactly 12 iters')

  # 4. full stokes_one_step in a scan (the real composition).
  u_boundary = cyl.inflow_boundary_field(sem).astype(dtype)
  us = tuple(jnp.zeros((nv, 2), dtype) for _ in range(time_order))
  ps = tuple(jnp.zeros(npn, dtype) for _ in range(time_order))

  def sstep(carry):
    us, ps = carry
    unew, pnew, aux = sem.stokes_one_step(
        list(us), list(ps), jnp.zeros((nv, 2), dtype), mu=mu, dt=dt,
        time_order=time_order, u_boundary=u_boundary, tol=tol, atol=atol,
        pressure_preconditioner=precond, project_out_nullspace=False)
    return (us[1:] + (unew - u_boundary,), ps[1:] + (pnew,))

  timed_scan(sstep, (us, ps), name='full stokes_one_step')

  # 5. stokes_one_step without the pressure preconditioner (plain CG
  #    pressure; will iterate a lot, but times the no-Schwarz composition).
  def sstep_noM(carry):
    us, ps = carry
    unew, pnew, aux = sem.stokes_one_step(
        list(us), list(ps), jnp.zeros((nv, 2), dtype), mu=mu, dt=dt,
        time_order=time_order, u_boundary=u_boundary, tol=tol, atol=atol,
        maxiter=40, project_out_nullspace=False)
    return (us[1:] + (unew - u_boundary,), ps[1:] + (pnew,))

  timed_scan(sstep_noM, (us, ps), name='stokes_one_step, no Schwarz, maxiter 40')

  # 6. same as 4 but 60 steps (scan length effect).
  timed_scan(sstep, (us, ps), steps=60, name='full stokes_one_step, 60-step scan')

  # 7. the profile script's exact body: convection covector carry + forcing.
  ext = [float(c) for c in cyl.extk_coeffs(k=time_order - 1)]

  def raw_cu(w):
    return sem.velocity.scatter(sem.velocity.C_local(sem.velocity.gather(w)))

  cus = tuple(raw_cu(w + u_boundary) for w in us)

  def sstep_cu(carry):
    us, ps, cus = carry
    cu = sum(ext[-i] * cus[-i] for i in range(1, len(ext) + 1))
    unew, pnew, aux = sem.stokes_one_step(
        list(us), list(ps), -imask * cu, mu=mu, dt=dt,
        time_order=time_order, u_boundary=u_boundary, tol=tol, atol=atol,
        pressure_preconditioner=precond, project_out_nullspace=False)
    return (us[1:] + (unew - u_boundary,), ps[1:] + (pnew,),
            cus[1:] + (raw_cu(unew),))

  timed_scan(sstep_cu, (us, ps, cus), name='stokes_one_step + convection carry')


if __name__ == '__main__':
  main()
