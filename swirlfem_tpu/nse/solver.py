"""Spectral-element fractional-step incompressible Navier-Stokes solver.

Parity target: reference ``swirl_fem/navier_stokes/navier_stokes.py``
(StokesPressure :97, StokesVelocity :143, StokesSEM :248, stokes_one_step
:350, filter :460, vorticity :484), implementing the P_N - P_{N-2}
pressure-projection scheme of Deville, Fischer & Mund (2002):

* velocity on order-N Gauss-Lobatto-Legendre nodes (collocated GLL
  quadrature => diagonal mass matrix),
* pressure on discontinuous order-(N-2) Gauss-Legendre nodes,
* BDF-k time discretization with extrapolated pressure,
* dealiased convection on an overintegrated GLL rule,
* modal low-pass filter stabilization,
* pressure-Schur solve E = D Q D^T by matrix-free CG with nullspace
  projection.

Every operator is a `local_covector` transpose of a bilinear/trilinear form,
evaluated sum-factorized; both CG solves run under
``lax.custom_linear_solve`` so the whole step is differentiable (this is
what the NiLES solver-in-the-loop training relies on).
"""

from __future__ import annotations

from collections.abc import Sequence
from functools import partial
from typing import Any

import flax.struct
import jax
from jax import lax
from jax import vmap
import jax.numpy as jnp
import numpy as np

from swirlfem_tpu.core.bc import BCType
from swirlfem_tpu.core.bc import dirichlet_interior_mask
from swirlfem_tpu.core.fespace import div
from swirlfem_tpu.core.fespace import FiniteElementSpace
from swirlfem_tpu.core.fespace import grad
from swirlfem_tpu.core.fespace import inner
from swirlfem_tpu.core.mesh import Mesh
from swirlfem_tpu.core.quadrature import interpolation_grad_matrix_1d
from swirlfem_tpu.core.quadrature import interpolation_matrix_1d
from swirlfem_tpu.core.quadrature import Nodes1D
from swirlfem_tpu.core.quadrature import NodeType
from swirlfem_tpu.core.quadrature import Quadrature1D
from swirlfem_tpu.core.refine import refine_premesh
from swirlfem_tpu.core.premesh import Premesh
from swirlfem_tpu.core.tensor import BarycentricInterpolator
from swirlfem_tpu.core import topology
from swirlfem_tpu.linalg.cg import cg
from swirlfem_tpu.linalg.cg import near_exact_solve

# pylint: disable=invalid-name


def extk_coeffs(k: int) -> np.ndarray:
  """Order-k extrapolation coefficients (reference navier_stokes.py:49-58).

  Interpolates through k+1 equispaced history samples and evaluates one step
  beyond the last sample.
  """
  grid = Nodes1D.create(num_points=k + 1, node_type=NodeType.NEWTON_COTES)
  h = 2.0 / k
  target = Nodes1D.create_single_point(1.0 + h)
  return interpolation_matrix_1d(grid, target).reshape(-1)


def bdfk_coeffs(k: int) -> np.ndarray:
  """Order-k backward differentiation coefficients, scaled per unit step.

  ``sum_j coeffs[j] * u(t_j) / dt`` approximates ``du/dt`` at the last
  sample; `coeffs[-1]` multiplies the newest sample (reference
  navier_stokes.py:61-70).
  """
  grid = Nodes1D.create(num_points=k + 1, node_type=NodeType.NEWTON_COTES)
  target = Nodes1D.create_single_point(1.0)
  h = 2.0 / k
  return interpolation_grad_matrix_1d(grid, target).reshape(-1) * h


@flax.struct.dataclass
class StokesProjection:
  """Solve-history pair for `stokes_one_step(projection_state=...)`.

  Thread through the time-loop carry: pass in, read the updated value from
  ``aux['projection_state']``.  See `linalg.projection`.
  """

  viscous: Any
  pressure: Any


def _pressure_project_out_nullspace(sem: 'StokesSEM', p: jax.Array):
  """Removes the constant (all-ones) nullspace component from p.

  E = D Q D^T is symmetric in the *euclidean* inner product, so its range is
  the euclidean orthogonal complement of span{1}; the projector must be the
  euclidean-orthogonal one to keep PCG's <r, M r> positive.  (The reference
  uses a mass-weighted — oblique — projection, navier_stokes.py:73-78, which
  makes the preconditioner asymmetric and lets CG lose positivity near
  convergence.)
  """
  w = sem.pressure.exchange(p)
  q = sem._pressure_ones(p)
  return w - (sem.dot(q, w) / sem.dot(q, q)) * q


@flax.struct.dataclass
class StokesPressure:
  """Discontinuous Gauss-Legendre pressure space of order N-2."""

  pspace: FiniteElementSpace

  @classmethod
  def create(cls, premesh: Premesh, quadrature: Quadrature1D,
             order: int, axis_name: str | None = None,
             device_mesh=None, coord_transform=None,
             exchange_mode: str = 'auto') -> 'StokesPressure':
    gridpoints = Nodes1D.create(num_points=order - 1,
                                node_type=NodeType.GAUSS_LEGENDRE)
    refined = refine_premesh(premesh, gridpoints_1d=gridpoints)
    if coord_transform is not None:
      refined = refined.replace(node_coords=coord_transform(refined))
    pmesh = refined.finalize(axis_name=axis_name, device_mesh=device_mesh,
                             exchange_mode=exchange_mode)
    make = lambda m: FiniteElementSpace.create(m, quadrature)
    if premesh.is_partitioned():
      make = jax.vmap(make)
    return cls(pspace=make(pmesh))

  def gather(self, p):
    return self.pspace.mesh.gather(p)

  def scatter(self, p_local):
    return self.pspace.mesh.scatter(p_local)

  def exchange(self, p):
    return self.pspace.mesh.exchange(p)

  def B(self, p):
    """Pressure mass operator."""
    def l(u, v):
      return lambda x: u(x) * v(x)
    u = self.pspace.scalar_function(self.gather(p))
    v = self.pspace.scalar_function(None)
    return self.scatter(self.pspace.local_covector(l, (u, v)))


@flax.struct.dataclass
class StokesVelocity:
  """Continuous Gauss-Lobatto-Legendre velocity space of order N."""

  vspace: FiniteElementSpace
  overint_space: FiniteElementSpace
  interior_mask: jax.Array
  diag_qqt: jax.Array

  @classmethod
  def create(cls, premesh: Premesh, order: int, boundary_conditions,
             num_convection_overint_nodes: int = 2,
             axis_name: str | None = None,
             device_mesh=None,
             coord_transform=None,
             exchange_mode: str = 'auto') -> 'StokesVelocity':
    gridpoints = Nodes1D.create(num_points=order + 1,
                                node_type=NodeType.GAUSS_LOBATTO_LEGENDRE)
    refined = refine_premesh(premesh, gridpoints_1d=gridpoints)
    if coord_transform is not None:
      # Curved-boundary hook: e.g. snap refined nodes onto a true circle
      # (utils.cylinder.snap_cylinder_boundary), fixing the polygonal
      # geometry left by corner-interpolating refinement.
      refined = refined.replace(node_coords=coord_transform(refined))
    vmesh = refined.finalize(axis_name=axis_name, device_mesh=device_mesh,
                             exchange_mode=exchange_mode)
    overint_grid = Nodes1D.create(
        num_points=gridpoints.num_points + num_convection_overint_nodes,
        node_type=NodeType.GAUSS_LOBATTO_LEGENDRE)

    def build(mesh):
      vspace = FiniteElementSpace.create(
          mesh, Quadrature1D.create_from_nodes_1d(gridpoints))
      overint_space = FiniteElementSpace.create(
          mesh, Quadrature1D.create_from_nodes_1d(overint_grid))
      diag_qqt = mesh.scatter(
          jnp.ones(mesh.elements.shape, dtype=mesh.node_coords.dtype))
      return vspace, overint_space, diag_qqt

    if premesh.is_partitioned():
      vspace, overint_space, diag_qqt = jax.vmap(build)(vmesh)
    else:
      vspace, overint_space, diag_qqt = build(vmesh)
    # Stacked masks broadcast over the partition axis automatically.
    interior_mask = jnp.asarray(
        dirichlet_interior_mask(vmesh, boundary_conditions))[..., None]
    return cls(vspace=vspace, overint_space=overint_space,
               interior_mask=interior_mask, diag_qqt=diag_qqt)

  @property
  def mesh(self) -> Mesh:
    return self.vspace.mesh

  @property
  def local_shape(self):
    return (self.mesh.num_elements, self.mesh.num_nodes_per_element,
            self.mesh.ndim)

  def gather(self, u):
    return vmap(self.mesh.gather, in_axes=-1, out_axes=-1)(u)

  def scatter(self, u_local):
    return vmap(self.mesh.scatter, in_axes=-1, out_axes=-1)(u_local)

  def exchange(self, u):
    return vmap(self.mesh.exchange, in_axes=-1, out_axes=-1)(u)

  def A_local(self, u_local):
    """Vector stiffness: form ``int grad(u) : grad(v)``."""
    def a(u, v):
      return lambda x: inner(grad(u)(x), grad(v)(x))
    u = self.vspace.vector_function(u_local)
    v = self.vspace.vector_function(None)
    return self.vspace.local_covector(a, (u, v))

  def B_local(self, u_local):
    """Vector mass: form ``int u . v`` (diagonal on collocated GLL)."""
    def l(u, v):
      return lambda x: inner(u(x), v(x))
    u = self.vspace.vector_function(u_local)
    v = self.vspace.vector_function(None)
    return self.vspace.local_covector(l, (u, v))

  def C_local(self, u_local):
    """Dealiased convection: trilinear ``int (u . grad) u . v`` on the
    overintegrated rule (reference navier_stokes.py:238-245)."""
    def c(u, w, v):
      return lambda x: jnp.einsum(
          'eqi,eqij,eqj->eq', u(x), grad(w)(x), v(x),
          precision=lax.Precision.HIGHEST)
    u = self.overint_space.vector_function(u_local)
    v = self.overint_space.vector_function(None)
    return self.overint_space.local_covector(c, (u, u, v))

  def C(self, u):
    return self.interior_mask * self.scatter(self.C_local(self.gather(u)))


@flax.struct.dataclass
class StokesSEM:
  """Operator algebra + fractional-step update for the NSE system."""

  velocity: StokesVelocity
  pressure: StokesPressure
  velocity_mass_diag: jax.Array
  axis_name: str | None = flax.struct.field(pytree_node=False, default=None)
  # E-last fast operator core (structured 2D/3D boxes; see ops.sem2d/sem3d).
  fast_ops: Any | None = None
  # Assembled mixed-divergence blocks (unstructured meshes; ops.assembled):
  # D/Dt/E become single batched block matmuls instead of ~15-kernel
  # matrix-free chains (TPU steps at these sizes are kernel-count bound).
  assembled_ops: Any | None = None

  @classmethod
  def create(cls, premesh: Premesh, boundary_conditions, order: int,
             num_convection_overint_nodes: int = 2,
             axis_name: str | None = None,
             device_mesh=None,
             use_pallas_kernels: bool = False,
             kernel_precision: str = 'highest',
             unstructured_el_ops: bool = False,
             use_assembled_ops: bool | str = 'auto',
             coord_transform=None,
             exchange_mode: str = 'auto') -> 'StokesSEM':
    if premesh.order != 1:
      raise ValueError(f'expected an order-1 premesh, got {premesh.order}')
    quadrature = Quadrature1D.create(
        num_points=order + 1,
        quadrature_type=NodeType.GAUSS_LOBATTO_LEGENDRE)
    # The geometry transform must shape BOTH spaces: with mismatched
    # velocity/pressure jacobians, D and D^T stop being exact adjoints and
    # the Schur operator goes (slightly) nonsymmetric — enough to break
    # near-null modes of any exact inverse (measured 2e-3 asymmetry with a
    # velocity-only curved-boundary snap).
    pressure = StokesPressure.create(premesh, quadrature, order,
                                     axis_name=axis_name,
                                     device_mesh=device_mesh,
                                     coord_transform=coord_transform,
                                     exchange_mode=exchange_mode)
    velocity = StokesVelocity.create(premesh, order, boundary_conditions,
                                     num_convection_overint_nodes,
                                     axis_name=axis_name,
                                     device_mesh=device_mesh,
                                     coord_transform=coord_transform,
                                     exchange_mode=exchange_mode)

    def mass_diag(vel: StokesVelocity):
      ones = jnp.ones(vel.local_shape, dtype=vel.mesh.node_coords.dtype)
      return vel.scatter(vel.B_local(ones))

    if premesh.is_partitioned():
      velocity_mass_diag = jax.vmap(mass_diag)(velocity)
    else:
      velocity_mass_diag = mass_diag(velocity)

    if coord_transform is not None and not premesh.is_partitioned():
      # Isoparametric geometry on curved meshes: the pressure space's own
      # geometric map (an order-(N-2) interpolant of the curved transform)
      # differs from the velocity's order-N one, which breaks the exact
      # adjointness of D and D^T (measured 2.6e-3 Schur asymmetry on the
      # cylinder mesh).  Both spaces integrate on the same GLL rule, so
      # adopting the velocity geometry for the pressure quadrature makes
      # the mixed forms exact transposes again.  (Latent upstream too:
      # reference navier_stokes.py:313-338 has the same split geometry.)
      pressure = pressure.replace(pspace=pressure.pspace.replace(
          invjacs=velocity.vspace.invjacs,
          jacdets=velocity.vspace.jacdets,
          quad_coords=velocity.vspace.quad_coords))

    fast_ops = None
    if not premesh.is_partitioned() and premesh.ndim in (2, 3):
      structured = (velocity.mesh.structured is not None
                    and pressure.pspace.mesh.structured is not None)
      if premesh.ndim == 2 and (structured or unstructured_el_ops):
        # The E-last element operators are geometry-agnostic: on
        # structured boxes they pair with index-free layout transforms,
        # on unstructured meshes with gather/scatter transforms.
        # Unstructured is OPT-IN: measured on the 228-element cylinder
        # mesh (TPU v5e) the el path loses 5x to the generic operators —
        # at benchmark mesh sizes the step is kernel-launch-bound and the
        # extra per-apply layout transforms dominate; the generic path's
        # fused (E, Q, d, k) einsums win despite their lane padding.
        from swirlfem_tpu.ops.sem2d import build_sem2d_ops
        fast_ops = build_sem2d_ops(
            velocity, pressure,
            use_pallas=use_pallas_kernels and structured,
            kernel_precision=kernel_precision)
      elif premesh.ndim == 3 and structured:
        from swirlfem_tpu.ops.sem3d import build_sem3d_ops
        fast_ops = build_sem3d_ops(velocity, pressure)
        if use_pallas_kernels:
          fast_ops = fast_ops.replace(use_pallas=True)
    sem = cls(velocity=velocity, pressure=pressure,
              velocity_mass_diag=velocity_mass_diag, axis_name=axis_name,
              fast_ops=fast_ops)
    if use_assembled_ops == 'auto':
      # Unstructured meshes (no structured fast path) below a block-memory
      # cap; structured boxes already run the el-form/FDM path.
      pmesh_f = sem.pressure.pspace.mesh
      vmesh_f = sem.velocity.vspace.mesh
      entries = (premesh.num_elements * pmesh_f.num_nodes_per_element
                 * vmesh_f.num_nodes_per_element * premesh.ndim)
      use_assembled_ops = (fast_ops is None
                           and not premesh.is_partitioned()
                           and entries <= 16_000_000)
    if use_assembled_ops:
      if premesh.is_partitioned() or fast_ops is not None:
        raise ValueError('use_assembled_ops requires an unpartitioned mesh '
                         'without the structured fast path')
      from swirlfem_tpu.ops.assembled import build_assembled_mixed
      sem = sem.replace(assembled_ops=build_assembled_mixed(sem))
    return sem

  # -- distributed-aware inner product --------------------------------------

  def dot(self, a, b):
    # HIGHEST precision: TPU f32 reductions otherwise truncate to bf16,
    # which corrupts CG coefficients (see linalg.cg._highest_vdot).
    d = jnp.vdot(a, b, precision=lax.Precision.HIGHEST)
    if self.axis_name is not None:
      d = lax.psum(d, axis_name=self.axis_name)
    return d

  def initial_projection_state(self, k_viscous: int = 4,
                               k_pressure: int = 8) -> StokesProjection:
    """Empty Fischer solve-history for ``stokes_one_step``.

    K sizes trade memory (``2 K`` state-sized vectors per solve) against
    guess quality; BDF time stepping saturates around 4-8 entries.
    """
    from swirlfem_tpu.linalg.projection import ProjectionState
    nv = self.velocity.mesh.num_nodes
    npn = self.pressure.pspace.mesh.num_nodes
    d = self.velocity.mesh.ndim
    dtype = self.velocity_mass_diag.dtype
    state = StokesProjection(
        viscous=ProjectionState.create(jnp.zeros((nv, d), dtype), k_viscous),
        pressure=ProjectionState.create(jnp.zeros(npn, dtype), k_pressure))
    if self.axis_name is not None:
      # Stacked per-partition histories, ready to pass through spmd_map.
      num_p = self.velocity.mesh.node_coords.shape[0]
      state = jax.tree.map(
          lambda x: jnp.tile(x, (num_p,) + (1,) * x.ndim), state)
    return state

  def _pressure_ones(self, like):
    """Valid-pressure-dof indicator (the constant-nullspace direction).

    Equals ones on unpartitioned meshes; on partitioned meshes the
    SENTINEL-padded slots of smaller partitions are zeroed so nullspace
    projections neither count them nor write into them.
    """
    valid = self.pressure.pspace.mesh.node_indices != topology.SENTINEL
    return valid.astype(like.dtype).reshape(jnp.shape(like))

  # -- operators -------------------------------------------------------------

  def B(self, u):
    """Velocity mass (diagonal, row-masked)."""
    return self.velocity.interior_mask * self.velocity_mass_diag * u

  def Bi(self, u):
    """Lumped inverse velocity mass: 1/exchange(diag) after exchange.

    The assembled diagonal is zero at SENTINEL-padded slots of unevenly
    partitioned meshes; guard the reciprocal so no NaN (0 * inf) leaks
    into CG dot products.
    """
    d = self.velocity.exchange(self.velocity_mass_diag)
    diag = jnp.where(d > 0, 1.0 / jnp.where(d > 0, d, 1.0), 0.0)
    return diag * self.velocity.exchange(u)

  def A(self, u):
    """Velocity stiffness (row-masked)."""
    return self.velocity.interior_mask * self.velocity.scatter(
        self.velocity.A_local(self.velocity.gather(u)))

  def C(self, u):
    if self.fast_ops is not None:
      mask = self.velocity.interior_mask
      out = self._fast_C(tuple(u[..., i] for i in range(u.shape[-1])))
      return mask * jnp.stack(out, axis=-1)
    return self.velocity.C(u)

  def D_local(self, u_local):
    """Mixed divergence form ``b(v, q) = int div(v) q`` acting on v."""
    def b(v, q):
      return lambda x: div(v)(x) * q(x)
    v = self.velocity.vspace.vector_function(u_local)
    q = self.pressure.pspace.scalar_function(None)
    return self.pressure.pspace.local_covector(b, (v, q))

  def Dt_local(self, p_local):
    """The transposed mixed form acting on q."""
    def b(v, q):
      return lambda x: div(v)(x) * q(x)
    v = self.velocity.vspace.vector_function(None)
    q = self.pressure.pspace.scalar_function(p_local)
    return self.velocity.vspace.local_covector(b, (v, q))

  def D(self, u):
    """Divergence: velocity -> pressure."""
    if self.assembled_ops is not None:
      return self.assembled_ops.D(self.velocity.vspace.mesh,
                                  self.pressure.pspace.mesh, u)
    return self.pressure.scatter(self.D_local(self.velocity.gather(u)))

  def Dt(self, p):
    """Gradient (transpose of D): pressure -> velocity, row-masked."""
    if self.assembled_ops is not None:
      return self.assembled_ops.Dt(self.velocity.vspace.mesh,
                                   self.pressure.pspace.mesh,
                                   self.velocity.interior_mask, p)
    return self.velocity.interior_mask * self.velocity.scatter(
        self.Dt_local(self.pressure.gather(p)))

  def Q(self, u, dt, time_order: int):
    """Q = (dt / beta_k) B^-1."""
    beta_k = float(bdfk_coeffs(time_order)[-1])
    return (dt / beta_k) * self.Bi(u)

  def E(self, p, dt, time_order: int):
    """Pressure Schur operator E = D Q D^T."""
    return self.D(self.Q(self.Dt(p), dt=dt, time_order=time_order))

  # -- E-last fast path -------------------------------------------------------

  @property
  def _elops(self):
    """The dimension-matched element-operator module (sem2d / sem3d)."""
    if self.velocity.mesh.ndim == 3:
      from swirlfem_tpu.ops import sem3d
      return sem3d
    from swirlfem_tpu.ops import sem2d
    return sem2d

  @property
  def _structured_fast(self) -> bool:
    """Structured fast path: index-free transforms + roll exchange."""
    return self.fast_ops is not None and self.fast_ops.vinfo is not None

  # Layout transforms between flat nodal arrays and E-last element-local
  # ``(q, .., q, E)`` blocks.  Structured boxes use the index-free
  # reshapes; unstructured meshes go through the mesh gather/scatter
  # tables.  `*_cov` transposes sum covector copies (direct-stiffness).

  def _v_el(self, u):
    if self._structured_fast:
      return self._elops.nodal_to_el(u, self.fast_ops.vinfo)
    mesh = self.velocity.vspace.mesh
    q = mesh.order + 1
    return jnp.moveaxis(mesh.gather(u), 0, -1).reshape(
        (q,) * mesh.ndim + (mesh.num_elements,))

  def _v_el_cov(self, w):
    if self._structured_fast:
      return self._elops.el_to_nodal(w, self.fast_ops.vinfo)
    mesh = self.velocity.vspace.mesh
    return mesh.scatter(
        jnp.moveaxis(w.reshape(-1, mesh.num_elements), -1, 0))

  def _p_el(self, p):
    if self._structured_fast:
      return self._elops.nodal_to_el(p, self.fast_ops.pinfo)
    mesh = self.pressure.pspace.mesh
    q = mesh.order + 1
    return jnp.moveaxis(mesh.gather(p), 0, -1).reshape(
        (q,) * mesh.ndim + (mesh.num_elements,))

  def _p_el_cov(self, w):
    if self._structured_fast:
      return self._elops.el_to_nodal(w, self.fast_ops.pinfo)
    mesh = self.pressure.pspace.mesh
    return mesh.scatter(
        jnp.moveaxis(w.reshape(-1, mesh.num_elements), -1, 0))

  def _fast_stiffness(self, ut):
    ops = self.fast_ops
    a_el = ops.stiffness_el_multi(tuple(self._v_el(u) for u in ut))
    return tuple(self._v_el_cov(a) for a in a_el)

  def _fast_D(self, ut):
    comps = [self._v_el(u) for u in ut]
    return self._p_el_cov(self.fast_ops.divergence_el(*comps))

  def _fast_Dt(self, p):
    mask = jnp.squeeze(self.velocity.interior_mask, -1)
    outs = self.fast_ops.gradient_el(self._p_el(p))
    return tuple(mask * self._v_el_cov(o) for o in outs)

  def _fast_C(self, ut):
    comps = [self._v_el(u) for u in ut]
    outs = self.fast_ops.convection_el(*comps)
    return tuple(self._v_el_cov(o) for o in outs)

  def _fast_filter(self, ut, alpha):
    from swirlfem_tpu.core.quadrature import interpolation_matrix_1d
    ops = self.fast_ops
    grid = self.velocity.mesh.gridpoints_1d
    low = Nodes1D.create(grid.num_points - 1, grid.node_type)
    blend = jnp.asarray(
        interpolation_matrix_1d(low, grid)
        @ interpolation_matrix_1d(grid, low), dtype=ut[0].dtype)
    vmesh = self.velocity.vspace.mesh
    mult = vmesh.exchange(self.velocity.diag_qqt)
    outs = []
    for u in ut:
      el = self._v_el(u)
      f = ops.interp_all(blend, el)
      avg = vmesh.exchange(self._v_el_cov(f)) / mult
      outs.append((1.0 - alpha) * u + alpha * avg)
    return tuple(outs)

  def _stokes_one_step_el(self, us, ps, f, mu, dt, time_order, alpha,
                          pressure_preconditioner, project_out_nullspace,
                          tol, atol, maxiter, as_tuple_input,
                          viscous_preconditioner=None):
    """Fractional step with CG fully in element-local (k,k,n,n) form.

    Fully-periodic structured boxes only: the continuity projector QQ^T is
    per-axis passes of rolls over the element axes (`exchange_el`) — no
    layout transforms or index ops inside the CG loops at all.  Inputs are
    converted once at entry and back once at exit.
    """
    mod = self._elops
    ops = self.fast_ops
    vinfo, pinfo = ops.vinfo, ops.pinfo
    d = vinfo.ndim
    n = vinfo.num_elements_per_dim
    kk = vinfo.order + 1
    mm = pinfo.order + 1
    eshape = (n,) * d
    num_e = n ** d

    def v_in(u):  # nodal flat -> (k,) * d + (n,) * d
      return mod.nodal_to_el(u, vinfo).reshape((kk,) * d + eshape)

    ones_el = jnp.ones((kk,) * d + (num_e,), dtype=us[-1][0].dtype)
    grid_mult = mod.el_to_nodal(ones_el, vinfo)

    def v_out(w):  # continuous el rep -> nodal flat (average grid copies)
      flat = w.reshape((kk,) * d + (num_e,))
      return mod.el_to_nodal(flat, vinfo) / grid_mult

    def p_in(p):
      return mod.nodal_to_el(p, pinfo).reshape((mm,) * d + eshape)

    def p_out(w):
      return mod.el_to_nodal(w.reshape((mm,) * d + (num_e,)), pinfo)

    us_el = [tuple(v_in(c) for c in u) for u in us]
    ps_el = [p_in(p) for p in ps]
    # `f` is a nodal covector: its value must be *partitioned* among the
    # grid copies (each nodal image carries partial sums already), not
    # duplicated, so that per-dof totals are preserved in the el rep.
    f_el = tuple(v_in(c / grid_mult) for c in f)

    vp_el = None
    if viscous_preconditioner is not None:
      def vp_el(rt):  # el covector tuple -> el solution tuple
        outs = []
        for w in rt:
          r_nodal = mod.el_to_nodal(w.reshape((kk,) * d + (num_e,)), vinfo)
          outs.append(v_in(viscous_preconditioner(r_nodal)))
        return tuple(outs)

    u, p_el, aux = stokes_step_el(
        mod, ops, us_el, ps_el, f_el, mu=mu, dt=dt, time_order=time_order,
        alpha=alpha, exch=lambda w: mod.exchange_el(w, vinfo), dot=self.dot,
        grid_1d=self.velocity.mesh.gridpoints_1d,
        pressure_preconditioner=pressure_preconditioner,
        project_out_nullspace=project_out_nullspace,
        tol=tol, atol=atol, maxiter=maxiter, eshape=eshape,
        viscous_preconditioner=vp_el)
    u = tuple(v_out(w) for w in u)
    p = p_out(p_el)
    if not as_tuple_input:
      u = jnp.stack(u, axis=-1)
    return u, p, aux

  @property
  def _mult_nodal(self):
    # Nodal copy-multiplicity including periodic images (cached per trace).
    vmesh = self.velocity.vspace.mesh
    return vmesh.exchange(self.velocity.diag_qqt)

  @property
  def _fully_periodic(self) -> bool:
    mask = np.asarray(self.velocity.interior_mask)
    return bool((mask == 1).all()) and not self.velocity.mesh.physical_masks

  def _stokes_one_step_fast(self, us, ps, f, mu, dt, time_order, alpha,
                            u_boundary, pressure_preconditioner,
                            project_out_nullspace, tol, atol, maxiter,
                            viscous_preconditioner=None):
    """Fractional step on component-tuple states in E-last element layout.

    Identical math to the generic path; nodal fields travel as flat
    per-component arrays so no (N, 2) lane padding enters the CG loops.
    """
    vmesh = self.velocity.vspace.mesh
    mask = jnp.squeeze(self.velocity.interior_mask, -1)
    md = self.velocity_mass_diag[:, 0]

    def tup(u):
      if isinstance(u, tuple):
        return u
      return tuple(u[..., i] for i in range(u.shape[-1]))

    as_tuple_input = isinstance(us[-1], tuple)
    us = [tup(u) for u in us]
    ps = list(ps)
    if isinstance(f, (int, float)) and f == 0:
      f = tuple(jnp.zeros_like(c) for c in us[-1])
    else:
      f = tup(f)
    if u_boundary is not None:
      u_boundary = tup(u_boundary)

    if u_boundary is None and self._structured_fast and self._fully_periodic:
      # Fully-periodic boxes: run CG entirely in element-local form
      # (roll-based exchange; zero layout transforms per iteration).
      _s2 = self._elops
      pinfo = self.fast_ops.pinfo
      precond_el = None
      if pressure_preconditioner is not None:
        dd = pinfo.ndim
        mm = pinfo.order + 1
        nn = pinfo.num_elements_per_dim

        def precond_el(p_el):  # wrap a nodal preconditioner for el states
          p_nodal = _s2.el_to_nodal(
              p_el.reshape((mm,) * dd + (nn ** dd,)), pinfo)
          out = pressure_preconditioner(p_nodal)
          return _s2.nodal_to_el(out, pinfo).reshape((mm,) * dd + (nn,) * dd)

      u, p, aux = self._stokes_one_step_el(
          us, ps, f, mu, dt, time_order, alpha, precond_el,
          project_out_nullspace, tol, atol, maxiter, as_tuple_input,
          viscous_preconditioner=viscous_preconditioner)
      return u, p, aux

    tmap = jax.tree_util.tree_map
    if pressure_preconditioner is None and project_out_nullspace:
      pressure_preconditioner = partial(_pressure_project_out_nullspace,
                                        self)

    if len(ps) >= 2:
      ext = [float(c) for c in extk_coeffs(k=1)]
      p_ext = sum(ext[-i] * ps[-i] for i in range(1, len(ext) + 1))
    else:
      p_ext = ps[-1]
    f = tmap(lambda a, b: a + b, f, self._fast_Dt(p_ext))

    coeffs = [float(c) for c in bdfk_coeffs(time_order)]
    beta_hist, beta_k = coeffs[:-1], coeffs[-1]

    def B_t(ut):
      return tuple(mask * md * u for u in ut)

    def H_t(ut):
      a = self._fast_stiffness(ut)
      return tuple(mask * ((beta_k / dt) * md * u + mu * av)
                   for u, av in zip(ut, a))

    hist = tmap(lambda *xs: sum(c * x for c, x in zip(beta_hist, xs)) / dt,
                *us)
    f = tmap(lambda a, b: a - b, f, B_t(hist))
    if u_boundary is not None:
      f = tmap(lambda a, b: a - b, f, H_t(u_boundary))

    # Jacobi-preconditioned continuity projector for the viscous solve:
    # M(r) = exchange(r) / diag(H) with the assembled diagonal (constant
    # across dof copies, so it commutes with QQ^T and M stays symmetric).
    diag_a = self._v_el_cov(self.fast_ops.stiffness_diag_el())
    diag_h = vmesh.exchange((beta_k / dt) * md + mu * diag_a)

    def exch_t(ut):
      return tuple(vmesh.exchange(u) / diag_h for u in ut)

    def vsolve(matvec, rhs):
      rhs = tuple(mask * r for r in rhs)
      x0 = (None if viscous_preconditioner is None
            else tuple(viscous_preconditioner(r) for r in rhs))
      return cg(matvec, rhs, x0=x0, M=exch_t, tol=tol, atol=atol,
                dot_fn=self.dot, maxiter=maxiter)

    u_star, u_info = lax.custom_linear_solve(
        H_t, f, solve=vsolve, symmetric=True, has_aux=True)
    if u_boundary is not None:
      u_star = tmap(lambda a, b: a + b, u_star, u_boundary)

    u_star = self._fast_filter(u_star, alpha)

    diag_i = 1.0 / vmesh.exchange(md)

    def Q_t(ut):
      return tuple((dt / beta_k) * diag_i * vmesh.exchange(u) for u in ut)

    def E_fast(p):
      return self._fast_D(Q_t(self._fast_Dt(p)))

    def psolve(matvec, rhs):
      # Enclosed/periodic flow: E is singular with a constant nullspace;
      # project the rhs onto range(E).  With outflow E is nonsingular and
      # projecting would corrupt dp by the mean mass-flux imbalance.
      matvec = getattr(pressure_preconditioner, 'fast_matvec', None) or matvec
      if project_out_nullspace:
        ones = jnp.ones_like(rhs)
        rhs = rhs - (self.dot(ones, rhs) / self.dot(ones, ones)) * ones
      if getattr(pressure_preconditioner, 'near_exact', False):
        # An f32-applied near-exact inverse is not numerically PSD
        # (measured: <r, M r> < 0 at the first stopping test, dp = 0,
        # exponential divergence growth); see linalg.cg.near_exact_solve.
        return near_exact_solve(matvec, rhs, pressure_preconditioner,
                                tol=tol, atol=atol, dot_fn=self.dot,
                                maxiter=maxiter)
      return cg(matvec, rhs, M=pressure_preconditioner, tol=tol, atol=atol,
                dot_fn=self.dot, maxiter=maxiter)

    neg_du = -self._fast_D(u_star)
    dp, p_info = lax.custom_linear_solve(
        E_fast, neg_du, solve=psolve, symmetric=True, has_aux=True)

    u = tmap(lambda a, b: a + b, u_star, Q_t(self._fast_Dt(dp)))
    p = p_ext + dp
    aux = {'u_star_info': u_info, 'dp_info': p_info}
    if not as_tuple_input:
      u = jnp.stack(u, axis=-1)
    return u, p, aux

  # -- time stepping ----------------------------------------------------------

  def stokes_one_step(
      self, us: Sequence[jax.Array], ps: Sequence[jax.Array], f: jax.Array,
      mu: float, dt: float, time_order: int, alpha: float = 0.05,
      u_boundary: jax.Array | None = None,
      pressure_preconditioner=None,
      viscous_preconditioner=None,
      viscous_matvec=None,
      viscous_fdm=None,
      project_out_nullspace: bool = True,
      tol: float = 1e-8, atol: float = 0.0,
      maxiter: int | None = None,
      projection_state=None,
  ) -> tuple[jax.Array, jax.Array, Any]:
    """Advances the (linear) Stokes system by one BDF-k step.

    Fractional-step scheme (reference navier_stokes.py:350-458):
      1. tentative velocity: H(u*) = b with H = (beta_k/dt) B + mu A,
         b = f + D^T(p_ext) - B(sum_j beta_j u^{n-j}) / dt,
      2. filter-based stabilization of u*,
      3. pressure correction: D Q D^T (dp) = -D u*,
      4. u^{n+1} = u* + Q D^T dp;  p^{n+1} = p_ext + dp.

    Nonlinear convection enters through `f` (extrapolated advection), as in
    the reference datagen/training paths.

    ``viscous_matvec``: optional replacement for the H apply *inside* the
    viscous CG only (e.g. ``assembled_viscous_matvec``, one batched block
    matmul instead of the sum-factorized kernel chain); must equal H to
    rounding.  Generic (non-fast-ops) path only.

    ``viscous_fdm``: optional :class:`ops.fdm_element.ElementFDM` (from
    ``build_element_fdm(sem.velocity.mesh)``) enabling the element-local
    FDM additive-Schwarz preconditioner for the viscous CG — the warped/
    unstructured-mesh upgrade of the Jacobi projector.  A pytree: pass it
    through ``spmd_map`` alongside the solver on partitioned meshes.
    Generic path only.

    ``projection_state``: optional `StokesProjection` (see
    ``initial_projection_state``) enabling Fischer successive-rhs
    projection: both solves start from the A-optimal guess in the span of
    previous solution increments, solved as the shifted system
    ``x = x0 + A^{-1}(b - A x0)`` so converged results (and gradients via
    ``custom_linear_solve``) are unchanged.  The updated state is returned
    in ``aux['projection_state']`` — thread it through the time loop
    carry.  Generic path only.
    """
    if self.fast_ops is not None:
      if projection_state is not None:
        raise NotImplementedError(
            'projection_state is for the generic path; the structured fast '
            'path uses exact FDM solves')
      if viscous_fdm is not None:
        raise NotImplementedError(
            'viscous_fdm is for the generic path; the structured fast path '
            'already uses exact FDM solves')
      return self._stokes_one_step_fast(
          us, ps, f, mu, dt, time_order, alpha, u_boundary,
          pressure_preconditioner, project_out_nullspace, tol, atol, maxiter,
          viscous_preconditioner=viscous_preconditioner)
    if pressure_preconditioner is None and project_out_nullspace:
      pressure_preconditioner = partial(_pressure_project_out_nullspace, self)

    # Linear pressure extrapolation; degrades to zeroth order when only one
    # history entry is available (BDF1 cold start).
    if len(ps) >= 2:
      # Python-float coefficients stay weakly typed (no f64 promotion).
      ext = [float(c) for c in extk_coeffs(k=1)]
      p_ext = sum(ext[-i] * ps[-i] for i in range(1, len(ext) + 1))
    else:
      p_ext = ps[-1]
    f = f + self.Dt(p_ext)

    coeffs = [float(c) for c in bdfk_coeffs(time_order)]
    beta_hist, beta_k = coeffs[:-1], coeffs[-1]
    H = lambda u: (beta_k / dt) * self.B(u) + mu * self.A(u)
    f = f - self.B(sum(c * u for c, u in zip(beta_hist, us)) / dt)
    if u_boundary is not None:
      f = f - H(u_boundary)

    # H is singular on Dirichlet rows (row elision), so project the rhs onto
    # its range before solving.  This matters for the *transpose* solve of
    # custom_linear_solve: downstream cotangents (e.g. through `filter`)
    # carry boundary components which would otherwise make CG run away
    # along the null space and corrupt gradients.
    # Jacobi-preconditioned continuity projector M(r) = exchange(r)/diag(H)
    # (assembled diagonal; constant across dof copies so M stays symmetric)
    # — same construction as the structured fast path, built here from the
    # generic geometric factors.  Cuts the viscous CG ~2-4x vs the plain
    # exchange projector on unstructured meshes.  With `viscous_fdm`,
    # upgrade to the element-local FDM additive Schwarz (ops/fdm_element):
    # same exchange-projector role, but local solves are per-element
    # separable spectral inverses — cuts the viscous CG a further ~2-3x on
    # warped/unstructured meshes where no exact FDM structure exists.
    if viscous_fdm is not None:
      from swirlfem_tpu.ops.fdm_element import (
          element_fdm_viscous_preconditioner)
      m_viscous = element_fdm_viscous_preconditioner(
          self, viscous_fdm, mu, dt, time_order)
    else:
      diag_h = self._viscous_jacobi_diag(mu, dt, time_order)
      m_viscous = lambda r: self.velocity.exchange(r) / diag_h[:, None]

    def vsolve(matvec, rhs):
      if viscous_matvec is not None:
        matvec = viscous_matvec
      rhs = self.velocity.interior_mask * rhs
      x0 = None
      if viscous_preconditioner is not None:
        x0 = jnp.stack([viscous_preconditioner(rhs[..., j])
                        for j in range(rhs.shape[-1])], axis=-1)
      return cg(matvec, rhs, x0=x0, M=m_viscous,
                tol=tol, atol=atol_v, dot_fn=self.dot, maxiter=maxiter)

    # Fischer successive-rhs projection: x = x0 + H^{-1}(b - H x0) with the
    # A-optimal x0 from the solve history.  H x0 comes free from the stored
    # operator images; x0 is stop_gradient'ed (it only changes the CG path,
    # not its limit, so gradients via custom_linear_solve stay exact).
    atol_v = atol
    if projection_state is not None:
      from swirlfem_tpu.linalg.projection import project_guess
      from swirlfem_tpu.linalg.projection import update_history
      b_v = self.velocity.interior_mask * f
      x0v, ax0v = project_guess(projection_state.viscous, b_v, self.dot)
      x0v = lax.stop_gradient(x0v)
      f = f - lax.stop_gradient(ax0v)
      # Anchor the stopping test to the ORIGINAL rhs: CG's relative test on
      # the shifted system would otherwise keep iterating to tol * ||b -
      # H x0|| — same iteration count, no payoff from the guess.  The
      # relative term stays as a floor so the transpose (gradient) solves,
      # whose rhs scale is unrelated, remain safe.
      mb = self.velocity.exchange(b_v) / diag_h[:, None]
      sv = lax.stop_gradient(self.dot(b_v, mb))
      atol_v = jnp.sqrt(jnp.maximum(tol * tol * sv, atol * atol))

    u_star, u_info = lax.custom_linear_solve(
        H, f, solve=vsolve, symmetric=True, has_aux=True)
    if projection_state is not None:
      u_star = u_star + x0v
      new_viscous = update_history(
          projection_state.viscous, lax.stop_gradient(u_star), x0v,
          viscous_matvec if viscous_matvec is not None else H, self.dot,
          ax0=ax0v)
    if u_boundary is not None:
      u_star = u_star + u_boundary

    u_star = self.filter(u_star, alpha=alpha)

    # Project the pressure rhs onto range(E) (remove the constant nullspace
    # component) for the same reason as above; done with the plain
    # mean-removal projector regardless of the preconditioner in use.
    def psolve(matvec, rhs):
      # Preconditioners built from probing/assembly carry the assembled
      # block-sparse E apply (ops.assembled): equal to rounding, ~15x
      # fewer kernel launches than the matrix-free chain.
      matvec = getattr(pressure_preconditioner, 'fast_matvec', None) or matvec
      if project_out_nullspace:
        # Valid-dof indicator, not ones: on unevenly partitioned meshes
        # SENTINEL-padded slots would otherwise receive a -mean offset the
        # CG can never reduce (E maps them to zero).
        ones = self._pressure_ones(rhs)
        rhs = rhs - (self.dot(ones, rhs) / self.dot(ones, ones)) * ones
      if getattr(pressure_preconditioner, 'near_exact', False):
        return near_exact_solve(matvec, rhs, pressure_preconditioner,
                                tol=tol, atol=atol_p, dot_fn=self.dot,
                                maxiter=maxiter)
      return cg(matvec, rhs, M=pressure_preconditioner, tol=tol, atol=atol_p,
                dot_fn=self.dot, maxiter=maxiter)

    b_p = -self.D(u_star)
    e_matvec = (getattr(pressure_preconditioner, 'fast_matvec', None)
                or partial(self.E, dt=dt, time_order=time_order))
    atol_p = atol
    if projection_state is not None:
      # History entries are mean-free (rhs is projected, E preserves
      # range(E)), so the coefficient dots are insensitive to b's mean.
      x0p, ax0p = project_guess(projection_state.pressure, b_p, self.dot)
      x0p = lax.stop_gradient(x0p)
      # Stopping anchored to the ORIGINAL (projected) rhs, as for vsolve.
      bp0 = b_p
      if project_out_nullspace:
        q = self._pressure_ones(bp0)
        bp0 = bp0 - (self.dot(q, bp0) / self.dot(q, q)) * q
      if getattr(pressure_preconditioner, 'near_exact', False):
        sp = self.dot(bp0, bp0)
      elif pressure_preconditioner is not None:
        sp = self.dot(bp0, pressure_preconditioner(bp0))
      else:
        sp = self.dot(bp0, bp0)
      sp = lax.stop_gradient(sp)
      atol_p = jnp.sqrt(jnp.maximum(tol * tol * sp, atol * atol))
      b_p = b_p - lax.stop_gradient(ax0p)

    dp, p_info = lax.custom_linear_solve(
        partial(self.E, dt=dt, time_order=time_order), b_p,
        solve=psolve, symmetric=True, has_aux=True)
    aux = {'u_star_info': u_info, 'dp_info': p_info}
    if projection_state is not None:
      dp = dp + x0p
      new_pressure = update_history(
          projection_state.pressure, lax.stop_gradient(dp), x0p, e_matvec,
          self.dot, ax0=ax0p)
      aux['projection_state'] = projection_state.replace(
          viscous=new_viscous, pressure=new_pressure)

    u = u_star + self.Q(self.Dt(dp), dt=dt, time_order=time_order)
    p = p_ext + dp
    return u, p, aux

  def fft_pressure_preconditioner(self, dt, time_order: int):
    """Near-exact FFT pressure preconditioner for uniform periodic boxes.

    Returns a preconditioner callable for `stokes_one_step` (block-FFT
    inverse of E composed with the nullspace projection), or None when the
    mesh is not a uniform fully-periodic structured 2D box.  With it, the
    pressure CG converges in O(1) iterations.  See ops.fft_pressure.
    """
    from swirlfem_tpu.ops.fft_pressure import (build_fft_pressure_solver,
                                               is_uniform_periodic)
    if not is_uniform_periodic(self):
      return None
    solve = build_fft_pressure_solver(self, dt, time_order)

    def precondition(p):
      w = solve(p)
      ones = jnp.ones_like(w)
      return w - (self.dot(ones, w) / self.dot(ones, ones)) * ones

    precondition.jacobi_diag_el = solve.jacobi_diag_el
    precondition.near_exact = True
    return precondition

  def fdm_pressure_preconditioner(self, dt, time_order: int):
    """Exact fast-diagonalization pressure preconditioner, uniform boxes.

    Covers any per-axis mix of Dirichlet and periodic velocity BCs (cavity,
    channel) in 2D and 3D — geometries where the block-FFT solver does not
    apply — via per-axis generalized eigendecompositions of the exactly
    separable Schur operator (see ops.fdm_pressure).  Returns None when
    the mesh is not a uniform axis-aligned box with separable BCs.
    """
    from swirlfem_tpu.ops.fdm_pressure import build_fdm_pressure_solver
    from swirlfem_tpu.ops.fdm_pressure import is_separable_box
    if not is_separable_box(self):
      return None
    solve = build_fdm_pressure_solver(self, dt, time_order)
    if not solve.has_nullspace:
      return solve

    def precondition(p):
      w = solve(p)
      ones = jnp.ones_like(w)
      return w - (self.dot(ones, w) / self.dot(ones, ones)) * ones

    return precondition

  def slim_for_el_step(self) -> 'StokesSEM':
    """Memory-slim copy for the el-form fast path (`stokes_one_step_el`).

    The generic-path geometric fields (per-quadrature-point inverse
    Jacobians, Jacobian determinants, quadrature coordinates, nodal mesh
    tables) are never read by the el-form step — it runs entirely on the
    E-last `fast_ops` factor fields — yet at 32^3 elements order 7 they
    hold ~4.3 GiB of the solver pytree's 6.4 GiB on device.  This returns
    a copy with those leaves dropped (None) and, on congruent-elements
    boxes, the constant-per-element inverse-Jacobian fields ``kinv`` /
    ``kinv_o`` compressed to broadcastable ``(d, d, 1, ..., 1)`` views
    (another ~1.7 GiB at that size; every consumer multiplies them
    pointwise, so numpy broadcasting keeps the operators identical).

    Call on the CONCRETE host-side solver after building preconditioners,
    then pass the result as the jit argument of the time loop.  The slim
    copy supports `stokes_one_step_el` + the el-form operator/diagnostic
    surface only; nodal-path methods will fail on the dropped leaves.
    """
    assert self._structured_fast, 'slim_for_el_step needs the el fast path'

    def slim_space(space):
      # Zero-row placeholders (not None): shape-derived metadata like
      # ``Mesh.ndim`` / dtype queries keep working, at zero bytes.
      m = space.mesh
      return space.replace(
          invjacs=None, jacdets=None, quad_coords=None,
          mesh=m.replace(
              node_coords=jnp.zeros((0,) + m.node_coords.shape[1:],
                                    dtype=m.node_coords.dtype),
              elements=jnp.zeros((0,) + m.elements.shape[1:],
                                 dtype=m.elements.dtype)))

    velocity = self.velocity.replace(
        vspace=slim_space(self.velocity.vspace),
        overint_space=slim_space(self.velocity.overint_space),
        diag_qqt=None)
    pressure = self.pressure.replace(
        pspace=slim_space(self.pressure.pspace))
    ops = self.fast_ops
    if ops is not None and getattr(ops, 'c_uniform', None) is not None:
      def compress(field):
        f = np.asarray(field)
        # Noise-averaged constant: on a genuinely congruent box the
        # per-point values differ only by f32-coordinate representation
        # noise through the interpolation pipeline (measured 8e-5
        # relative for kinv, 1.8e-4 for the overintegration-grid kinv_o
        # at 16^3:7), so the mean is strictly more accurate than any one
        # sample.  Tolerance matches the congruence-detection rel_tol
        # (sem3d.build_sem3d_ops): 1e-3 for f32 coords, 1e-9 for f64.
        mean = f.mean(axis=tuple(range(2, f.ndim)), keepdims=True)
        scale = float(np.abs(f).max())
        coord_eps = float(np.finfo(f.dtype).eps)
        rel_tol = 1e-3 if coord_eps > 1e-10 else 1e-9
        if not np.allclose(f, mean, atol=rel_tol * scale, rtol=0):
          return field  # graded after all: keep the full field
        return jnp.asarray(mean, dtype=field.dtype)

      ops = ops.replace(kinv=compress(ops.kinv),
                        kinv_o=compress(ops.kinv_o))
    return self.replace(velocity=velocity, pressure=pressure,
                        velocity_mass_diag=None, fast_ops=ops)

  def stokes_one_step_el(self, us_el, ps_el, f_el, *, mu, dt,
                         time_order: int, alpha: float = 0.05,
                         tol: float = 1e-8, atol: float = 0.0,
                         maxiter: int | None = None,
                         pressure_preconditioner_el=None,
                         viscous_preconditioner_el=None,
                         project_out_nullspace: bool = True,
                         exact_solves: bool = False):
    """One fractional step on element-local (E-last) states, no transforms.

    The hot-path API for fully-periodic structured boxes: velocity states
    are per-component tuples of ``(k,)*d + (n,)*d`` arrays and pressures
    ``(m,)*d + (n,)*d`` arrays, kept in el form ACROSS steps — with the
    el-native FDM solvers (`fdm_el_preconditioners`) the whole step runs
    with zero nodal<->el layout conversions (measured ~0.3 ms per
    conversion on TPU; the nodal-API step pays ~8 of them per call).
    """
    assert self._structured_fast
    # The periodicity check reads array VALUES (interior_mask), so it can
    # only run when self is concrete; when the solver pytree is a jit
    # ARGUMENT (big-mesh callers pass it that way so the geometric fields
    # are program parameters, not baked literals — see
    # examples/taylor_green_3d.make_advance) the caller has already
    # validated it on the concrete solver.
    if not isinstance(self.velocity.interior_mask, jax.core.Tracer):
      assert self._fully_periodic
    mod = self._elops
    vinfo = self.fast_ops.vinfo
    eshape = (vinfo.num_elements_per_dim,) * vinfo.ndim
    use_pallas = bool(getattr(self.fast_ops, 'use_pallas', False))
    if use_pallas:
      exch = lambda w: mod.exchange_el(w, vinfo, use_pallas=True)
    else:
      exch = lambda w: mod.exchange_el(w, vinfo)
    return stokes_step_el(
        mod, self.fast_ops, list(us_el), list(ps_el), f_el, mu=mu, dt=dt,
        time_order=time_order, alpha=alpha,
        exch=exch, dot=self.dot,
        grid_1d=self.velocity.mesh.gridpoints_1d,
        pressure_preconditioner=pressure_preconditioner_el,
        project_out_nullspace=project_out_nullspace,
        tol=tol, atol=atol, maxiter=maxiter, eshape=eshape,
        viscous_preconditioner=viscous_preconditioner_el,
        exact_solves=exact_solves)

  def fdm_el_preconditioners(self, mu, dt, time_order: int,
                             precision=lax.Precision.HIGHEST):
    """El-native exact FDM inverses for `stokes_one_step_el`.

    Returns ``(viscous_el, pressure_el)`` callables on el-form states
    (component tuple / single array), or ``(None, None)`` off uniform
    boxes.  The duplicate-node fold is baked into the transform matrices
    (ops.fdm_pressure), so applications are pure dense contractions.
    ``precision`` sets the transform-matmul MXU precision: HIGHEST
    (default, f32-accurate) or HIGH (XLA bf16x3, ~6e-6 relative — the
    solves stop being bit-exact direct inverses; acceptable for f32 DNS
    datagen where the state already carries ~1e-6 rounding.  A/B:
    experiments/bench_step_precision.py).
    """
    from swirlfem_tpu.ops.fdm_pressure import build_fdm_helmholtz_solver_el
    from swirlfem_tpu.ops.fdm_pressure import build_fdm_pressure_solver_el
    from swirlfem_tpu.ops.fdm_pressure import is_separable_box
    if not is_separable_box(self):
      return None, None
    sv = build_fdm_helmholtz_solver_el(self, time_order, precision=precision)
    sp = build_fdm_pressure_solver_el(self, dt, time_order,
                                      precision=precision)

    def viscous_el(rt):
      return tuple(sv(r, mu, dt) for r in rt)

    if not sp.has_nullspace:
      return viscous_el, sp

    def pressure_el(r):
      w = sp(r)
      ones = jnp.ones_like(w)
      return w - (self.dot(ones, w) / self.dot(ones, ones)) * ones

    return viscous_el, pressure_el

  def velocity_to_el(self, u):
    """Nodal component tuple / (N, d) array -> el-form component tuple."""
    mod = self._elops
    vinfo = self.fast_ops.vinfo
    d = vinfo.ndim
    kk = vinfo.order + 1
    eshape = (vinfo.num_elements_per_dim,) * d
    comps = (u if isinstance(u, tuple)
             else tuple(u[..., i] for i in range(u.shape[-1])))
    return tuple(
        mod.nodal_to_el(c, vinfo).reshape((kk,) * d + eshape) for c in comps)

  def velocity_from_el(self, u_el):
    """El-form component tuple -> nodal tuple (grid-copy averaged)."""
    mod = self._elops
    vinfo = self.fast_ops.vinfo
    d = vinfo.ndim
    kk = vinfo.order + 1
    num_e = vinfo.num_elements_per_dim ** d
    ones = jnp.ones((kk,) * d + (num_e,), dtype=u_el[0].dtype)
    grid_mult = mod.el_to_nodal(ones, vinfo)
    return tuple(
        mod.el_to_nodal(w.reshape((kk,) * d + (num_e,)), vinfo) / grid_mult
        for w in u_el)

  def pressure_to_el(self, p):
    mod = self._elops
    pinfo = self.fast_ops.pinfo
    d = pinfo.ndim
    mm = pinfo.order + 1
    eshape = (pinfo.num_elements_per_dim,) * d
    return mod.nodal_to_el(p, pinfo).reshape((mm,) * d + eshape)

  def pressure_from_el(self, p_el):
    mod = self._elops
    pinfo = self.fast_ops.pinfo
    d = pinfo.ndim
    mm = pinfo.order + 1
    num_e = pinfo.num_elements_per_dim ** d
    return mod.el_to_nodal(p_el.reshape((mm,) * d + (num_e,)), pinfo)

  def forcing_to_el(self, f):
    """Nodal covector tuple -> el covector (values split among copies)."""
    mod = self._elops
    vinfo = self.fast_ops.vinfo
    d = vinfo.ndim
    kk = vinfo.order + 1
    num_e = vinfo.num_elements_per_dim ** d
    eshape = (vinfo.num_elements_per_dim,) * d
    ones = jnp.ones((kk,) * d + (num_e,), dtype=f[0].dtype)
    grid_mult = mod.el_to_nodal(ones, vinfo)
    return tuple(
        mod.nodal_to_el(c / grid_mult, vinfo).reshape((kk,) * d + eshape)
        for c in f)

  def _viscous_jacobi_diag(self, mu, dt, time_order: int):
    """Assembled diag((beta_k/dt) B + mu A) on the nodes (generic path)."""
    vspace = self.velocity.vspace
    gradmat = jnp.asarray(vspace.interpolator.interpolation_matrix_grad(),
                          dtype=vspace.jacdets.dtype)            # (Q, n, d)
    weights = jnp.asarray(
        vspace.quadrature.weights_nd(self.velocity.mesh.ndim),
        dtype=vspace.jacdets.dtype)
    # Physical gradient of basis n at quad q: g[e,q,j,n].
    g = jnp.einsum('qnd,eqjd->eqjn', gradmat, vspace.invjacs,
                   precision=lax.Precision.HIGHEST)
    diag_a_local = jnp.einsum('eqjn,eqjn,eq,q->en', g, g, vspace.jacdets,
                              weights, precision=lax.Precision.HIGHEST)
    beta_k = float(bdfk_coeffs(time_order)[-1])
    diag = ((beta_k / dt) * self.velocity_mass_diag[..., 0]
            + mu * self.velocity.mesh.scatter(diag_a_local))
    diag = self.velocity.vspace.mesh.exchange(diag)
    # Padded (SENTINEL) slots of unevenly partitioned meshes assemble to
    # zero; 1 there keeps M(r) = exchange(r)/diag NaN-free (r is 0 there).
    return jnp.where(diag > 0, diag, 1.0)

  def fdm_viscous_preconditioner(self, mu, dt, time_order: int):
    """Exact FDM inverse of the viscous Helmholtz operator, uniform boxes.

    Returns a per-component nodal callable ``r -> H^{-1} r`` (mu, dt
    bound; the eigenbasis itself is mu/dt-independent) used to seed the
    viscous CG, which then certifies convergence in 0-2 iterations.  None
    when the mesh is not a uniform separable box.
    """
    from swirlfem_tpu.ops.fdm_pressure import build_fdm_helmholtz_solver
    from swirlfem_tpu.ops.fdm_pressure import is_separable_box
    if not is_separable_box(self):
      return None
    solve = build_fdm_helmholtz_solver(self, time_order)
    return lambda r: solve(r, mu, dt)

  def assembled_viscous_matvec(self, mu, dt, time_order: int):
    """Assembled element-block H apply for the viscous CG (unstructured).

    One ``(E, n^d, n^d)`` batched matmul between a gather and a scatter,
    equal to the generic ``mask ((beta_k/dt) B + mu A)`` to rounding but
    with ~4x fewer kernel launches per CG iteration — see ops.assembled.
    Pass as ``stokes_one_step(viscous_matvec=...)``.
    """
    from swirlfem_tpu.ops.assembled import build_helmholtz_matvec
    return build_helmholtz_matvec(self, mu, dt, time_order)

  def dense_pressure_preconditioner(self, dt, time_order: int,
                                    max_dofs: int = 20000):
    """Exact dense Schur inverse for small (unstructured) meshes.

    Assembles E column-by-column and pseudo-inverts on the host; applied
    as one dense MXU matvec.  None above `max_dofs` pressure dofs.  See
    ops.dense_schur.
    """
    from swirlfem_tpu.ops.dense_schur import build_dense_pressure_solver
    solve = build_dense_pressure_solver(self, dt, time_order,
                                        max_dofs=max_dofs)
    if solve is None:
      return None
    solve.near_exact = True
    if not solve.has_nullspace:
      # Nonsingular E (outflow present): the pinv IS the inverse; no
      # projection.  Callers should pass project_out_nullspace=False.
      return solve

    def precondition(p):
      w = solve(p)
      ones = jnp.ones_like(w)
      return w - (self.dot(ones, w) / self.dot(ones, ones)) * ones

    precondition.has_nullspace = True
    precondition.near_exact = True
    precondition.fast_matvec = solve.fast_matvec
    return precondition

  def schwarz_pressure_preconditioner(self, premesh, boundary_conditions,
                                      dt, time_order: int,
                                      coarse: str = 'auto',
                                      max_coarse_dofs: int = 16000,
                                      overlap='auto'):
    """Two-level additive Schwarz pressure preconditioner (unstructured).

    The scalable preconditioner for unstructured meshes beyond the dense
    inverse's range: exact element-diagonal Schur blocks (graph-colored
    probing, batched block matmul apply) plus a Galerkin coarse solve —
    see ops.schwarz.  SPD by construction, so it plugs into plain PCG
    (no `near_exact` handling needed).

    Args:
      premesh: the ORDER-1 premesh this sem was created from.
      boundary_conditions: the same mapping given to ``create`` (detects
        do-nothing outflow, i.e. whether E is nonsingular).
      coarse: 'p1dg' | 'vertex' | 'auto' (see ops.schwarz).
    """
    from swirlfem_tpu.ops.schwarz import build_schwarz_pressure_solver
    solve = build_schwarz_pressure_solver(
        self, premesh, boundary_conditions, dt, time_order,
        coarse=coarse, max_coarse_dofs=max_coarse_dofs, overlap=overlap)
    if not solve.has_nullspace:
      return solve

    def precondition(p):
      w = solve(p)
      ones = jnp.ones_like(w)
      return w - (self.dot(ones, w) / self.dot(ones, ones)) * ones

    precondition.has_nullspace = True
    precondition.fast_matvec = solve.fast_matvec
    return precondition

  def best_pressure_preconditioner(self, dt, time_order: int):
    """The strongest pressure preconditioner available for this geometry.

    Uniform boxes (any per-axis Dirichlet/periodic mix, 2D/3D) get the FDM
    inverse — preferred over the block-FFT one even where both apply,
    because its dense HIGHEST-precision transforms keep the applied
    inverse accurate to f32 rounding (measured: 1 pressure iteration per
    step in developed f32 flow, vs 10-13 for the f32-FFT path whose
    spectral noise defeats the Richardson sweeps).  Non-uniform periodic
    2D boxes would get the FFT inverse; everything else None (projected
    CG).
    """
    precond = self.fdm_pressure_preconditioner(dt, time_order)
    if precond is None:
      precond = self.fft_pressure_preconditioner(dt, time_order)
    if precond is None:
      precond = self.dense_pressure_preconditioner(dt, time_order)
    # Unstructured meshes beyond the dense range: use
    # `schwarz_pressure_preconditioner` (needs the order-1 premesh and the
    # boundary-condition mapping, so it cannot be selected automatically
    # here).
    return precond

  def filter(self, u, alpha: float = 0.05):
    """Modal low-pass stabilization: restrict to order N-1 and back, blend.

    Reference parity: navier_stokes.py:460-482.
    """
    grid = self.velocity.mesh.gridpoints_1d
    low = Nodes1D.create(num_points=grid.num_points - 1,
                         node_type=grid.node_type)
    down = BarycentricInterpolator(self.velocity.mesh.ndim, grid, low)
    up = BarycentricInterpolator(self.velocity.mesh.ndim, low, grid)
    u_local = self.velocity.gather(u)  # (E, n^d, k)
    moved = jnp.moveaxis(u_local, -1, 1)
    filtered = jnp.moveaxis(up.interpolate(down.interpolate(moved)), 1, -1)
    # Average over *all* copies of each dof — including periodic images and
    # partition copies (exchange) — so the filtered field stays continuous.
    # (Dividing by the local multiplicity only, as the reference does at
    # navier_stokes.py:480-481, leaves O(alpha) jumps across periodic seams
    # which poison the pressure solve.)
    total = self.velocity.exchange(self.velocity.scatter(filtered))
    mult = self.velocity.vspace.mesh.exchange(self.velocity.diag_qqt)
    # Multiplicity is 0 at SENTINEL-padded slots (uneven partitions); 0/0
    # NaNs there would poison the following step's dot products.
    averaged = total / jnp.where(mult > 0, mult, 1.0)[:, None]
    return (1.0 - alpha) * u + alpha * averaged

  def vorticity(self, u):
    """Scalar vorticity of a 2D velocity field at the nodes."""
    uq = self.velocity.vspace.vector_function(self.velocity.gather(u))

    def w(x):
      g = grad(uq)(x)  # (E, Q, j, k) = d u_k / d x_j
      return g[..., 0, 1] - g[..., 1, 0]

    vort_local = self.velocity.vspace.evaluate(w)
    vmesh = self.velocity.mesh
    total = vmesh.exchange(vmesh.scatter(vort_local))
    return total / vmesh.exchange(self.velocity.diag_qqt)


def stokes_step_el(mod, ops, us_el, ps_el, f_el, *, mu, dt, time_order,
                   alpha, exch, dot, grid_1d, pressure_preconditioner,
                   project_out_nullspace, tol, atol, maxiter, eshape,
                   viscous_preconditioner=None, exact_solves=False):
  """One fractional step fully in element-local (E-last) form.

  The communication-parameterized core of the structured fast path: all
  states are element-local arrays shaped ``(k,)*d + eshape`` (velocity,
  k = order+1) or ``(m,)*d + eshape`` (pressure), where `eshape` is the
  (possibly device-local) element-grid shape.  All inter-element coupling
  flows through `exch` (direct-stiffness summation QQ^T in el form) and all
  reductions through `dot`; passing halo-exchange/psum versions of these
  runs the identical step distributed under ``shard_map`` (see
  `nse.distributed`), with zero layout transforms or index ops inside the
  CG loops.

  Args:
    mod: dimension-matched element-operator module (ops.sem2d / ops.sem3d).
    ops: `Sem2DOps`/`Sem3DOps` whose factor fields cover exactly the
      `eshape` element block (flattened E axis last).
    us_el: velocity history, list of per-component tuples of el arrays.
    ps_el: pressure history, list of el arrays.
    f_el: forcing covector, per-component tuple of el arrays.
    exch: QQ^T in el form over the full (global) element grid.
    dot: inner product; must include the cross-partition psum when
      distributed.
    grid_1d: velocity `Nodes1D` (builds the modal-filter blend matrix).
    pressure_preconditioner: optional callable on el-shaped pressure.
    eshape: element-grid shape held by this shard.

  Returns:
    ``(u_el, p_el, aux)`` in the same el representation as the inputs.
  """
  d = ops.vinfo.ndim
  kk = ops.vinfo.order + 1
  mm = ops.pinfo.order + 1
  num_e = int(np.prod(eshape))
  tmap = jax.tree_util.tree_map

  wmass = ops.wmass.reshape((kk,) * d + eshape)
  mult = exch(jnp.ones((kk,) * d + eshape, dtype=wmass.dtype))

  def flat(w):
    return w.reshape((kk,) * d + (num_e,))

  def unflat(w):
    return w.reshape((kk,) * d + eshape)

  def div_el(ut):
    return ops.divergence_el(*[flat(c) for c in ut]).reshape(
        (mm,) * d + eshape)

  def grad_el(p):
    outs = ops.gradient_el(p.reshape((mm,) * d + (num_e,)))
    return tuple(unflat(o) for o in outs)

  if len(ps_el) >= 2:
    ext = [float(c) for c in extk_coeffs(k=1)]
    p_ext = sum(ext[-i] * ps_el[-i] for i in range(1, len(ext) + 1))
  else:
    p_ext = ps_el[-1]
  f_el = tmap(lambda a, b: a + b, f_el, grad_el(p_ext))

  coeffs = [float(c) for c in bdfk_coeffs(time_order)]
  beta_hist, beta_k = coeffs[:-1], coeffs[-1]

  def H_t(ut):
    a_el = ops.stiffness_el_multi(tuple(flat(w) for w in ut))
    return tuple((beta_k / dt) * wmass * w + mu * unflat(a)
                 for w, a in zip(ut, a_el))

  hist = tmap(lambda *xs: sum(c * x for c, x in zip(beta_hist, xs)) / dt,
              *us_el)
  f_el = tmap(lambda a, b: a - wmass * b, f_el, hist)

  diag_h = exch((beta_k / dt) * wmass
                + mu * unflat(ops.stiffness_diag_el()))

  def M_t(rt):
    return tuple(exch(r) / diag_h for r in rt)

  def vsolve(matvec, rhs):
    # An exact FDM inverse seeds CG's initial iterate: the solve becomes a
    # direct application + a 0-iteration convergence certificate (or a
    # couple of polish iterations at f32 rounding level).
    if exact_solves and viscous_preconditioner is not None:
      # Trust the direct inverse outright (H is mass-dominated: its FDM
      # apply is accurate to rounding even in f32) and skip the
      # certificate matvec + dots — they cost more kernels than the solve.
      x = viscous_preconditioner(rhs)
      zero = jnp.zeros((), dtype=jnp.result_type(
          *jax.tree_util.tree_leaves(rhs)))
      return x, {'residual': zero, 'num_iterations': jnp.int32(0)}
    x0 = None if viscous_preconditioner is None else viscous_preconditioner(
        rhs)
    return cg(matvec, rhs, x0=x0, M=M_t, tol=tol, atol=atol, dot_fn=dot,
              maxiter=maxiter)

  u_star, u_info = lax.custom_linear_solve(
      H_t, f_el, solve=vsolve, symmetric=True, has_aux=True)

  # Modal filter in el form (exchange-averaged).
  if alpha:
    low = Nodes1D.create(grid_1d.num_points - 1, grid_1d.node_type)
    blend = jnp.asarray(
        interpolation_matrix_1d(low, grid_1d)
        @ interpolation_matrix_1d(grid_1d, low), dtype=wmass.dtype)

    def filt(w):
      fw = unflat(ops.interp_all(blend, flat(w)))
      return (1.0 - alpha) * w + alpha * exch(fw) / mult

    u_star = tuple(filt(w) for w in u_star)

  diag_i = 1.0 / exch(wmass)

  def Q_t(ut):
    return tuple((dt / beta_k) * diag_i * exch(w) for w in ut)

  def E_fast(p):
    return div_el(Q_t(grad_el(p)))

  had_preconditioner = pressure_preconditioner is not None
  if pressure_preconditioner is None and project_out_nullspace:
    def pressure_preconditioner(p):  # noqa: F811 - local default
      ones = jnp.ones_like(p)
      return p - (dot(ones, p) / dot(ones, ones)) * ones

  def psolve(matvec, rhs):
    if project_out_nullspace:
      ones = jnp.ones_like(rhs)
      rhs = rhs - (dot(ones, rhs) / dot(ones, ones)) * ones
    if exact_solves and had_preconditioner:
      # One direct application + a true-residual check; a second defect
      # sweep fires only when f32 noise left the residual above tolerance.
      # No CG machinery at all.
      x = pressure_preconditioner(rhs)
      r = rhs - matvec(x)
      rr = dot(r, r)
      thr = jnp.maximum(jnp.square(tol) * dot(rhs, rhs), jnp.square(atol))

      def again(args):
        x, r = args
        x2 = x + pressure_preconditioner(r)
        return x2, rhs - matvec(x2)

      x, r = lax.cond(rr > thr, again, lambda args: args, (x, r))
      return x, {'residual': dot(r, r), 'num_iterations': jnp.int32(1)}
    if not had_preconditioner:
      return cg(matvec, rhs, M=pressure_preconditioner, tol=tol, atol=atol,
                dot_fn=dot, maxiter=maxiter)
    # Near-exact inverses cannot be used as CG preconditioners in finite
    # precision (see linalg.cg.near_exact_solve — developed here for the
    # block-FFT inverse, where the f32-applied M broke the M-weighted
    # quadratic forms near convergence and blew up the integration).
    return near_exact_solve(matvec, rhs, pressure_preconditioner, tol=tol,
                            atol=atol, dot_fn=dot, maxiter=maxiter)

  dp, p_info = lax.custom_linear_solve(
      E_fast, -div_el(u_star), solve=psolve, symmetric=True, has_aux=True)

  u = tmap(lambda a, b: a + b, u_star, Q_t(grad_el(dp)))
  p_el = p_ext + dp
  aux = {'u_star_info': u_info, 'dp_info': p_info}
  return u, p_el, aux
