"""Profile the large (912-element, order-6) cylinder step on TPU.

Breaks the ~96 ms/step (round-3 number, overlap-1 Schwarz) into its
components to target round-4 optimization: operator applies inside the
pressure CG, the Schwarz preconditioner apply, the viscous solve, and
the once-per-step operators (convection, filter, D/Dt).

Run:  python experiments/profile_large_cylinder.py [--order 6]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from swirlfem_tpu.examples import cylinder as cyl
from swirlfem_tpu.nse.solver import StokesSEM


def timed(fn, *args, iters=100, name=''):
  """Steady-state per-call time: chain `iters` dependent applies in one jit."""

  @jax.jit
  def chain(x):
    def body(c, _):
      return fn(c), None
    out, _ = jax.lax.scan(body, x, None, length=iters)
    return out

  x = jax.tree.map(lambda a: a, args[0]) if args else None
  out = chain(x)
  jax.block_until_ready(out)
  t0 = time.perf_counter()
  out = chain(x)
  jax.block_until_ready(out)
  dt_ms = (time.perf_counter() - t0) / iters * 1e3
  print(f'{name:40s} {dt_ms:8.3f} ms/apply')
  return dt_ms


def main():
  ap = argparse.ArgumentParser()
  ap.add_argument('--order', type=int, default=6)
  ap.add_argument('--ns', type=int, default=12)
  ap.add_argument('--nr', type=int, default=8)
  ap.add_argument('--nx_down', type=int, default=28)
  ap.add_argument('--steps', type=int, default=60)
  ap.add_argument('--tol', type=float, default=1e-5)
  ap.add_argument('--no-hmv', action='store_true',
                  help='disable the assembled viscous matvec in the step')
  ap.add_argument('--no-fastmv', action='store_true',
                  help='disable the assembled pressure E matvec in the step')
  ap.add_argument('--skip-micro', action='store_true')
  ap.add_argument('--no-assembled', action='store_true',
                  help='build the solver without assembled D/Dt blocks')
  ap.add_argument('--overlap', default='auto')
  ap.add_argument('--projection', action='store_true',
                  help='Fischer successive-rhs projection in the step')
  ap.add_argument('--viscous-fdm', action='store_true',
                  help='element-local FDM viscous preconditioner '
                       '(ops/fdm_element.py) instead of Jacobi')
  args = ap.parse_args()

  from swirlfem_tpu.utils.cylinder import cylinder_channel_premesh
  from swirlfem_tpu.utils.cylinder import make_cylinder_snap
  from swirlfem_tpu.core.bc import BCType

  t0 = time.time()
  premesh = cylinder_channel_premesh(ns=args.ns, nr=args.nr, nx_up=2,
                                     nx_down=args.nx_down, ny_low=2,
                                     ny_high=2)
  bcs = {
      'cylinder': (BCType.DIRICHLET, 0.0),
      'walls': (BCType.DIRICHLET, 0.0),
      'inflow': (BCType.DIRICHLET, 0.0),
  }
  snap = make_cylinder_snap(premesh, radius=cyl.RADIUS, center=cyl.CENTER)
  with jax.default_device(jax.local_devices(backend='cpu')[0]):
    sem_cpu = StokesSEM.create(
        premesh, boundary_conditions=bcs, order=args.order,
        coord_transform=snap,
        use_assembled_ops=False if args.no_assembled else 'auto')
  sem = jax.device_put(sem_cpu, jax.devices()[0])
  print(f'mesh: {premesh.num_elements} elements, order {args.order}, '
        f'{sem.pressure.pspace.mesh.num_nodes} pressure dofs, '
        f'{sem.velocity.mesh.num_nodes} velocity nodes '
        f'({time.time() - t0:.1f} s setup)')

  from swirlfem_tpu.niles.datagen import min_node_spacing
  dx = min_node_spacing(sem.velocity.mesh)
  dt = float(0.65 * dx / 2.2)
  print(f'dx_min {dx:.2e} -> dt {dt:.2e}')
  time_order = 2
  mu = 1e-3

  t0 = time.time()
  overlap = args.overlap if args.overlap == 'auto' else int(args.overlap)
  precond = sem.schwarz_pressure_preconditioner(premesh, bcs, dt, time_order,
                                                overlap=overlap)
  print(f'schwarz setup: {time.time() - t0:.1f} s')
  if args.no_fastmv and hasattr(precond, 'fast_matvec'):
    del precond.fast_matvec

  # -- individual pieces ------------------------------------------------------
  npn = sem.pressure.pspace.mesh.num_nodes
  nv = sem.velocity.mesh.num_nodes
  dtype = sem.velocity.mesh.node_coords.dtype
  p = jnp.asarray(np.random.default_rng(0).standard_normal(npn), dtype)
  u = jnp.asarray(np.random.default_rng(1).standard_normal((nv, 2)), dtype)
  ut = tuple(u[..., i] for i in range(2))

  hmv = None if args.no_hmv else sem.assembled_viscous_matvec(
      mu, dt, time_order)
  if not args.skip_micro:
    timed(lambda q: sem.E(q, dt=dt, time_order=time_order), p,
          name='E apply (D Q Dt composition)')
    fast_mv = getattr(precond, 'fast_matvec', None)
    if fast_mv is not None:
      timed(fast_mv, p, name='E apply (assembled block-sparse)')
    timed(precond, p, name='Schwarz M apply')
    inner_mv = fast_mv or (lambda q: sem.E(q, dt=dt, time_order=time_order))
    timed(lambda q: precond(inner_mv(q)), p,
          name='E + M (one CG iteration core)')
    if hmv is not None:
      timed(hmv, u, name='H apply (assembled)')
    timed(lambda q: sem.D(sem.Dt(q)), p, name='D(Dt(.)) (no Q)')
    timed(sem.Bi, u, name='Bi apply (2 exchanges)')
    timed(sem.A, u, name='A apply (stiffness)')
    beta = 1.0
    timed(lambda w: sem.velocity.interior_mask * (
        beta * sem.velocity_mass_diag * w) + mu * sem.A(w), u,
          name='H apply (viscous matvec)')
    timed(sem.C, u, name='C apply (convection)')
    timed(lambda w: sem.filter(w), u, name='filter')

  # -- full step --------------------------------------------------------------
  u_boundary = cyl.inflow_boundary_field(sem).astype(dtype)
  us = tuple(jnp.zeros((nv, 2), dtype) for _ in range(time_order))
  ps = tuple(jnp.zeros(npn, dtype) for _ in range(time_order))
  cus = tuple(sem.velocity.scatter(
      sem.velocity.C_local(sem.velocity.gather(w + u_boundary)))
      for w in us)
  ext = [float(c) for c in cyl.extk_coeffs(k=time_order - 1)]
  imask = sem.velocity.interior_mask

  proj0 = sem.initial_projection_state() if args.projection else None
  fdm = None
  if args.viscous_fdm:
    from swirlfem_tpu.ops.fdm_element import build_element_fdm
    fdm = jax.device_put(build_element_fdm(sem_cpu), jax.devices()[0])

  @jax.jit
  def chunk(carry):
    def body(c, _):
      us, ps, cus, proj = c
      cu = sum(ext[-i] * cus[-i] for i in range(1, len(ext) + 1))
      u, pnew, aux = sem.stokes_one_step(
          list(us), list(ps), -imask * cu, mu=mu, dt=dt,
          time_order=time_order, u_boundary=u_boundary, tol=args.tol,
          atol=args.tol * 1e-2, pressure_preconditioner=precond,
          viscous_matvec=hmv, viscous_fdm=fdm, project_out_nullspace=False,
          projection_state=proj)
      c = (us[1:] + (u - u_boundary,), ps[1:] + (pnew,),
           cus[1:] + (sem.velocity.scatter(
               sem.velocity.C_local(sem.velocity.gather(u))),),
           aux.get('projection_state', proj))
      return c, (aux['u_star_info']['num_iterations'],
                 aux['dp_info']['num_iterations'])
    return jax.lax.scan(body, carry, None, length=args.steps)

  # Commit the initial carry to the device: otherwise call 2's inputs
  # (committed outputs of call 1) key a fresh jit cache entry and the
  # "steady-state" timing silently measures a second XLA compile.
  carry = jax.device_put((us, ps, cus, proj0), jax.devices()[0])
  t0 = time.time()
  carry, its = chunk(carry)
  jax.block_until_ready(carry)
  print(f'compile+first chunk: {time.time() - t0:.1f} s')
  for k in (2, 3):
    t0 = time.time()
    carry, its = chunk(carry)
    jax.block_until_ready(carry)
    ms = (time.time() - t0) / args.steps * 1e3
    vits, pits = jax.device_get(its)
    print(f'full step (chunk {k}): {ms:.2f} ms/step  '
          f'(viscous its {vits.mean():.1f}, pressure its {pits.mean():.1f})')


if __name__ == '__main__':
  main()
