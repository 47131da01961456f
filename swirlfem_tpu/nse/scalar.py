"""Passive-scalar advection-diffusion transport on the velocity space.

    d theta / dt + (u . grad) theta = kappa lap(theta) + q

Semi-implicit BDFk/EXTk companion to the momentum step, using the exact
scheme structure of the velocity solve (reference context:
``swirl_fem/navier_stokes/navier_stokes.py:350-458`` treats only the
momentum equation; the reference has NO scalar transport — this is
beyond-parity capability enabling heat-transfer / Boussinesq setups):

  * implicit Helmholtz ``H = (beta_k/dt) B + kappa A`` on the order-N GLL
    space shared with the velocity (same mesh, same geometric factors),
    solved by CG under ``lax.custom_linear_solve`` so the step is
    differentiable end-to-end like the velocity solve;
  * dealiased convection ``int (u . grad theta) v`` evaluated on the
    overintegration rule and extrapolated explicitly with EXTk;
  * homogeneous Dirichlet by row elision (the `interior_mask` convention),
    non-homogeneous via a boundary-lift field, Neumann (insulated) as the
    natural do-nothing condition.

Boussinesq pairing: add ``alpha_g * theta[:, None] * e_gravity`` to the
velocity forcing of ``StokesSEM.stokes_one_step`` and feed the updated
velocities back into `ScalarTransport.one_step` — both steps share the
history conventions (oldest first, trailing-aligned EXT coefficients).
"""

from __future__ import annotations

from typing import Sequence

import flax.struct
import jax
from jax import lax
import jax.numpy as jnp

from swirlfem_tpu.core.bc import dirichlet_interior_mask
from swirlfem_tpu.core.fespace import grad, inner
from swirlfem_tpu.linalg.cg import cg
from swirlfem_tpu.nse.solver import bdfk_coeffs
from swirlfem_tpu.nse.solver import extk_coeffs
from swirlfem_tpu.nse.solver import StokesSEM


@flax.struct.dataclass
class ScalarTransport:
  """Scalar operator algebra + one transport step.

  Shares the velocity space (mesh, quadrature, overintegration rule) of an
  existing `StokesSEM`; carries the scalar's OWN boundary-condition mask
  and assembled lumped mass, so thermal boundary conditions are
  independent of the velocity's.
  """

  velocity: 'StokesVelocity'      # the StokesSEM.velocity it was built from
  interior_mask: jax.Array        # (num_nodes,) 1.0 interior / 0.0 Dirichlet
  mass_diag: jax.Array            # assembled scalar lumped mass (unmasked)
  axis_name: str | None = flax.struct.field(pytree_node=False, default=None)

  @classmethod
  def create(cls, sem: StokesSEM, boundary_conditions) -> 'ScalarTransport':
    """Builds the scalar space on ``sem``'s velocity mesh.

    On a partitioned sem the returned struct carries stacked per-partition
    leaves — pass it through ``spmd_map`` alongside the solver, exactly
    like the `StokesSEM` itself.

    Args:
      sem: the flow solver (its velocity space is reused).
      boundary_conditions: mapping of physical-group name to
        ``(BCType, value)`` for the SCALAR (independent of the flow BCs);
        groups not listed get the natural (insulated/Neumann) condition.
    """
    vel = sem.velocity
    mesh = vel.mesh
    mask = jnp.asarray(
        dirichlet_interior_mask(mesh, boundary_conditions or {}))

    def md(vel):
      def l(t, v):
        return lambda x: t(x) * v(x)
      ones = jnp.ones(vel.mesh.elements.shape,
                      dtype=vel.mesh.node_coords.dtype)
      t = vel.vspace.scalar_function(ones)
      v = vel.vspace.scalar_function(None)
      return vel.mesh.scatter(vel.vspace.local_covector(l, (t, v)))

    if sem.axis_name is not None:
      mass_diag = jax.vmap(md)(vel)
    else:
      mass_diag = md(vel)
    return cls(velocity=vel, interior_mask=mask, mass_diag=mass_diag,
               axis_name=sem.axis_name)

  @property
  def mesh(self):
    return self.velocity.mesh

  def fdm_preconditioner(self, sem: StokesSEM, kappa, dt,
                         time_order: int):
    """Exact FDM inverse of the scalar Helmholtz operator, separable boxes.

    The scalar operator ``(beta_k/dt) B + kappa A`` lives on the same
    grid as the viscous Helmholtz operator, only with the scalar's OWN
    Dirichlet mask (e.g. heated cavity: thermal walls on x only), so the
    same per-axis fast diagonalization applies (ops.fdm_pressure).
    Returns ``r -> H_theta^{-1} r`` to seed `one_step`'s CG (which then
    certifies convergence in 0-2 iterations), or None off separable
    boxes / inseparable thermal masks.
    """
    from swirlfem_tpu.ops.fdm_pressure import _axis_masks
    from swirlfem_tpu.ops.fdm_pressure import build_fdm_helmholtz_solver
    from swirlfem_tpu.ops.fdm_pressure import is_separable_box
    if not is_separable_box(sem):
      return None
    if _axis_masks(sem, interior_mask=self.interior_mask) is None:
      return None
    solve = build_fdm_helmholtz_solver(sem, time_order,
                                       interior_mask=self.interior_mask)
    return lambda r: solve(r, kappa, dt)

  def _dot(self, a, b):
    d = jnp.vdot(a, b, precision=lax.Precision.HIGHEST)
    if self.axis_name is not None:
      d = lax.psum(d, axis_name=self.axis_name)
    return d

  # -- operators (row-masked, matching the StokesSEM conventions) ----------

  def B(self, th):
    """Scalar lumped mass (diagonal on collocated GLL)."""
    return self.interior_mask * self.mass_diag * th

  def A_local(self, th_local):
    def a(t, v):
      return lambda x: inner(grad(t)(x), grad(v)(x))
    t = self.velocity.vspace.scalar_function(th_local)
    v = self.velocity.vspace.scalar_function(None)
    return self.velocity.vspace.local_covector(a, (t, v))

  def A(self, th):
    """Scalar stiffness ``int grad(theta) . grad(v)``."""
    return self.interior_mask * self.mesh.scatter(
        self.A_local(self.mesh.gather(th)))

  def C_local(self, th_local, u_local):
    """Dealiased scalar convection ``int (u . grad theta) v`` on the
    overintegration rule (same dealiasing as the velocity's trilinear
    form)."""
    def c(u, t, v):
      return lambda x: jnp.einsum('eqi,eqi,eq->eq', u(x), grad(t)(x), v(x),
                                  precision=lax.Precision.HIGHEST)
    u = self.velocity.overint_space.vector_function(u_local)
    t = self.velocity.overint_space.scalar_function(th_local)
    v = self.velocity.overint_space.scalar_function(None)
    return self.velocity.overint_space.local_covector(c, (u, t, v))

  def C(self, th, u):
    """Convection of ``th`` by nodal velocity ``u`` of shape (N, ndim)."""
    return self.interior_mask * self.mesh.scatter(
        self.C_local(self.mesh.gather(th), self.velocity.gather(u)))

  # -- time step -------------------------------------------------------------

  def one_step(self, thetas: Sequence[jax.Array], us: Sequence[jax.Array],
               *, kappa: float, dt: float, time_order: int,
               forcing: jax.Array | None = None,
               theta_boundary: jax.Array | None = None,
               tol: float = 1e-8, atol: float = 0.0,
               maxiter: int | None = None,
               preconditioner=None):
    """One BDFk/EXTk transport step.

    Args:
      thetas: the ``time_order`` most recent scalar fields, OLDEST first
        (a shorter history degrades the scheme order, BDF1 cold start —
        same convention as ``stokes_one_step``).  These are the FULL
        fields, including any non-homogeneous boundary values; the
        returned field is full as well, so the output feeds straight
        back into the history.
      us: velocity fields aligned with ``thetas`` (us[-1] = current).
      kappa: diffusivity.
      forcing: nodal source ``q`` (applied through the mass matrix).
      theta_boundary: non-homogeneous Dirichlet lift — a static nodal
        field carrying the boundary values (its interior extension is
        arbitrary).  Internally the solve runs on the homogeneous
        remainder ``theta - theta_boundary`` and the lift is added back
        before returning.
      preconditioner: optional ``r -> ~H^{-1} r`` seeding the CG with an
        initial guess (see `fdm_preconditioner`); with an exact inverse
        the solve certifies convergence in 0-2 iterations.  Gradients via
        ``custom_linear_solve`` are unaffected (x0 only changes the CG
        path, not its limit).

    Returns:
      ``(theta, info)`` with the CG diagnostics dict.
    """
    k = min(time_order, len(thetas))
    coeffs = [float(c) for c in bdfk_coeffs(k)]
    beta_hist, beta_k = coeffs[:-1], coeffs[-1]
    hist = thetas[-k:]

    def h_op(t):
      return (beta_k / dt) * self.B(t) + kappa * self.A(t)

    rhs = -self.B(sum(c * t for c, t in zip(beta_hist, hist)) / dt)
    if forcing is not None:
      rhs = rhs + self.B(forcing)

    # EXTk extrapolated dealiased convection (trailing-aligned history,
    # as in examples/cylinder.py and niles/datagen.py).  The history is
    # already full (boundary values included), so it feeds the trilinear
    # form directly.
    n_ext = min(k, len(us))
    if n_ext > 1:
      ext = [float(c) for c in extk_coeffs(k=n_ext - 1)]
    else:
      ext = [1.0]
    conv = sum(ext[-i] * self.C(thetas[-i], us[-i])
               for i in range(1, len(ext) + 1))
    rhs = rhs - conv

    if theta_boundary is not None:
      # Lift correction for the homogeneous solve.  The BDF sum already
      # carries the full history, so with a STATIC lift the mass parts of
      # the correction cancel exactly (all BDF coefficients sum to zero:
      # the scheme annihilates constants-in-time); subtracting the full
      # ``h_op(theta_boundary)`` keeps that cancellation explicit while
      # also removing the ``kappa A theta_b`` stiffness term the
      # homogeneous operator cannot see.
      rhs = rhs - h_op(theta_boundary)
    rhs = self.interior_mask * rhs

    # Mass-Jacobi continuity projector: SPD, constant across dof copies.
    d = self.mesh.exchange((beta_k / dt) * self.mass_diag)
    dinv = jnp.where(d > 0, 1.0 / jnp.where(d > 0, d, 1.0), 0.0)
    m_op = lambda r: dinv * self.mesh.exchange(r)

    def solve(matvec, b):
      b = self.interior_mask * b
      x0 = None if preconditioner is None else preconditioner(b)
      return cg(matvec, b, x0=x0, M=m_op, tol=tol, atol=atol,
                dot_fn=self._dot, maxiter=maxiter)

    theta, info = lax.custom_linear_solve(h_op, rhs, solve=solve,
                                          symmetric=True, has_aux=True)
    if theta_boundary is not None:
      theta = theta + theta_boundary
    return theta, info
