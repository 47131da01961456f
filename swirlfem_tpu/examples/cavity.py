"""Lid-driven cavity: non-homogeneous Dirichlet NSE example.

The classical benchmark: unit square, no-slip walls, lid moving with
u = (1, 0) along the top boundary.  Demonstrates the boundary-lift path of
`stokes_one_step` (``u_boundary``): the solve runs on the homogeneous
interior with the lifted boundary field folded into the right-hand side.

BASELINE.md lists 2D cavity runs among the validation targets; the test
suite drives this module to a steady-ish state and checks the primary
vortex signature.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from swirlfem_tpu.core.bc import BCType
from swirlfem_tpu.nse.solver import extk_coeffs, StokesSEM
from swirlfem_tpu.utils.box import unit_cube_mesh


def make_cavity(num_elements: int = 8, order: int = 5) -> StokesSEM:
  premesh = unit_cube_mesh(num_elements, ndim=2)
  return StokesSEM.create(
      premesh, boundary_conditions={'boundary': (BCType.DIRICHLET, 0.0)},
      order=order)


def lid_boundary_field(sem: StokesSEM, lid_speed: float = 1.0) -> jax.Array:
  """Velocity field equal to (lid_speed, 0) on the lid, zero elsewhere.

  The lid is the y = 1 wall; the regularized profile tapers to zero at the
  corners (u = lid_speed * x^2 (1-x)^2 * 16-normalized) to avoid the corner
  singularity of the classical discontinuous lid.
  """
  coords = np.asarray(sem.velocity.mesh.node_coords)
  on_lid = np.abs(coords[:, 1] - 1.0) < 1e-12
  x = coords[:, 0]
  profile = 16.0 * (x * (1.0 - x)) ** 2  # peaks at 1 in the middle
  ub = np.zeros_like(coords)
  ub[:, 0] = np.where(on_lid, lid_speed * profile, 0.0)
  return jnp.asarray(ub)


def run_cavity(sem: StokesSEM, reynolds: float = 100.0, dt: float = 2e-3,
               num_steps: int = 50, time_order: int = 2):
  """Time-steps the cavity from rest; returns (u, p, aux history)."""
  nv = sem.velocity.mesh.num_nodes
  npn = sem.pressure.pspace.mesh.num_nodes
  dtype = sem.velocity.mesh.node_coords.dtype
  u0 = jnp.zeros((nv, 2), dtype=dtype)
  p0 = jnp.zeros(npn, dtype=dtype)
  u_boundary = lid_boundary_field(sem).astype(dtype)
  ext = [float(c) for c in extk_coeffs(k=time_order - 1)]

  us = [u0 for _ in range(time_order)]
  ps = [p0 for _ in range(time_order)]
  cus = [sem.C(u + u_boundary) for u in us]
  # Exact FDM inverse of the Schur operator: the pressure correction
  # converges in 1 iteration instead of O(order * num_elements).
  precond = sem.best_pressure_preconditioner(dt, time_order)
  vprecond = sem.fdm_viscous_preconditioner(1.0 / reynolds, dt, time_order)

  @jax.jit
  def step(us, ps, cus):
    cu = sum(ext[-i] * cus[-i] for i in range(1, len(ext) + 1))
    u, p, aux = sem.stokes_one_step(
        list(us), list(ps), -cu, mu=1.0 / reynolds, dt=dt,
        time_order=time_order, u_boundary=u_boundary, tol=1e-8, atol=1e-10,
        pressure_preconditioner=precond, viscous_preconditioner=vprecond)
    # The interior solve returns u including the boundary lift; advect the
    # full field.
    return (us[1:] + [u - u_boundary], ps[1:] + [p],
            cus[1:] + [sem.C(u)]), aux

  aux = None
  for _ in range(num_steps):
    (us, ps, cus), aux = step(us, ps, cus)
  return us[-1] + u_boundary, ps[-1], aux
