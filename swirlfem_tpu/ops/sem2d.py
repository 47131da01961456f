"""E-last element-operator core for 2D structured spectral elements.

The TPU memory system tiles the last two array axes to (8 sublanes, 128
lanes).  Any element-local array with trailing axes of size (order+1) ~ 9
is padded ~14x in HBM, and nodal arrays shaped (N, 2) are padded 64x; the
measured cost of the generic operator apply was ~100x speed-of-light purely
from layout.  This module keeps all element-local data in ``(n, n, E)``
("E-last") layout — elements ride the 128-lane axis — and implements the
classical Deville-Fischer-Mund factorized operator algebra directly:

    A u = D_xi^T (G11 D_xi u + G12 D_eta u) + D_eta^T (G12 D_xi u + G22 D_eta u)

with geometric factor fields G_ab = w_q |J| (J^-1 J^-T)_ab precomputed in
E-last layout, plus the mixed divergence/gradient coupling to the
discontinuous Gauss-Legendre pressure space and the overintegrated
convection form.  Every contraction is a small-matrix einsum whose output
keeps E last; XLA fuses the pointwise geometric factors into the GEMMs.

Velocity fields travel through the hot loop as *component tuples* of flat
nodal arrays ``(u_x, u_y)`` (1D arrays have no padding), converted to/from
the public ``(N, 2)`` layout only at API boundaries.

Used by `StokesSEM` as a fast path when the velocity mesh is a structured
2D box (see core.structured); validated against the generic
`local_covector` operators in tests.
"""

from __future__ import annotations

import flax.struct
import jax
from jax import lax
import jax.numpy as jnp
import numpy as np

from swirlfem_tpu.core.structured import StructuredInfo

PRECISION = lax.Precision.HIGHEST


# -- layout transforms -------------------------------------------------------


def nodal_to_el(u: jax.Array, info: StructuredInfo) -> jax.Array:
  """Flat nodal ``(num_nodes,)`` -> element-local ``(n, n, E)`` (E-last)."""
  n, p = info.num_elements_per_dim, info.order
  if not info.continuous:
    k = p + 1
    g = u.reshape(n, k, n, k)
    return g.transpose(1, 3, 0, 2).reshape(k, k, n * n)
  big = n * p + 1
  g = u.reshape(big, big)
  # axis 0 split: rows (n, p) + the closing row of each element.
  head0 = g[:-1].reshape(n, p, big)
  last0 = g[1:].reshape(n, p, big)[:, p - 1:p]
  s0 = jnp.concatenate([head0, last0], axis=1)  # (n, p+1, big)
  head1 = s0[:, :, :-1].reshape(n, p + 1, n, p)
  last1 = s0[:, :, 1:].reshape(n, p + 1, n, p)[..., p - 1:p]
  s1 = jnp.concatenate([head1, last1], axis=3)  # (n, p+1, n, p+1)
  return s1.transpose(1, 3, 0, 2).reshape(p + 1, p + 1, n * n)


def exchange_el(w: jax.Array, info: StructuredInfo,
                use_pallas: bool = False) -> jax.Array:
  """Direct-stiffness summation (Q Q^T) in element-local form, periodic box.

  Input/output ``(k, k, n, n)`` with element axes last (k = order+1 local
  nodes, n elements per dim).  Shared element-boundary copies are summed
  with two sequential axis passes of rolls (the second pass propagates edge
  sums so corners receive all four contributions); periodic wraparound is
  the roll itself.  No gathers, no scatters.  With `use_pallas` (TPU), the
  whole exchange runs as ONE fused kernel (ops.pallas_exchange) instead of
  ~8 XLA slice/concat kernels — the dominant launch-overhead saving in the
  el-state NSE step.
  """
  if use_pallas and w.ndim == 4:
    from swirlfem_tpu.ops.pallas_exchange import exchange2d_pallas
    return exchange2d_pallas(w)
  k = info.order + 1
  p = k - 1
  # axis 1 (local axis 1 <-> element axis 3).
  s = w[:, p] + jnp.roll(w[:, 0], -1, axis=-1)
  w = w.at[:, p].set(s)
  w = w.at[:, 0].set(jnp.roll(s, 1, axis=-1))
  # axis 0 (local axis 0 <-> element axis 2).
  s = w[p] + jnp.roll(w[0], -1, axis=-2)
  w = w.at[p].set(s)
  w = w.at[0].set(jnp.roll(s, 1, axis=-2))
  return w


def multiplicity_el(info: StructuredInfo, dtype=jnp.float32) -> jax.Array:
  """Copy-count of each element-local node on the periodic box."""
  k = info.order + 1
  n = info.num_elements_per_dim
  ones = jnp.ones((k, k, n, n), dtype=dtype)
  return exchange_el(ones, info)


def el_to_nodal(w: jax.Array, info: StructuredInfo) -> jax.Array:
  """Transpose of `nodal_to_el`: sums overlapping element boundaries."""
  n, p = info.num_elements_per_dim, info.order
  if not info.continuous:
    k = p + 1
    return w.reshape(k, k, n, n).transpose(2, 0, 3, 1).reshape(-1)
  big = n * p + 1
  k = p + 1
  s1 = w.reshape(k, k, n, n).transpose(2, 0, 3, 1)  # (n, p+1, n, p+1)

  def combine_last(x):  # (..., n, p+1) -> (..., n*p + 1)
    lead = x.shape[:-2]
    main = x[..., :p].reshape(lead + (n * p,))
    blk = jnp.concatenate(
        [jnp.zeros(lead + (n, p - 1), x.dtype), x[..., p:p + 1]], axis=-1
    ) if p > 1 else x[..., p:p + 1]
    shifted = blk.reshape(lead + (n * p,))
    zero = jnp.zeros(lead + (1,), x.dtype)
    return (jnp.concatenate([main, zero], axis=-1)
            + jnp.concatenate([zero, shifted], axis=-1))

  out = combine_last(s1)                   # (n, k, big): eta combined
  out = combine_last(jnp.moveaxis(out, 2, 0))  # (big_eta, big_xi)
  return out.T.reshape(-1)


# -- factor container --------------------------------------------------------


@flax.struct.dataclass
class Sem2DOps:
  """Precomputed E-last operator factors for one structured 2D SEM setup.

  Static 1D matrices (numpy, hashable by content id) and E-last geometric
  factor fields.  All `_v` fields live on the velocity GLL points, `_o`
  fields on the overintegration GLL points.
  """

  # geometric factors at velocity GLL points, (n, n, E)
  g11: jax.Array
  g12: jax.Array
  g22: jax.Array
  wmass: jax.Array                     # w_q |J|
  kinv: jax.Array                      # (2, 2, n, n, E): K[j, i] = dxi_i/dx_j
  # overintegration fields, (m_o, m_o, E)
  wmass_o: jax.Array
  kinv_o: jax.Array                    # (2, 2, m_o, m_o, E)
  # static 1D matrices
  dmat: np.ndarray = flax.struct.field(pytree_node=False)     # (n, n) GLL diff
  interp_p: np.ndarray = flax.struct.field(pytree_node=False)  # (n, m_p) GL->GLL
  interp_o: np.ndarray = flax.struct.field(pytree_node=False)  # (m_o, n)
  interp_o_grad: np.ndarray = flax.struct.field(pytree_node=False)  # (m_o, n)
  vinfo: StructuredInfo = flax.struct.field(pytree_node=False)
  pinfo: StructuredInfo = flax.struct.field(pytree_node=False)
  # Route the stiffness apply through the fused Pallas kernel
  # (ops.pallas_stiffness); requires a TPU backend.
  use_pallas: bool = flax.struct.field(pytree_node=False, default=False)
  # Component-batched stiffness launches (stiffness_el_multi); flip off to
  # fall back to per-component launches without rebuilding the operators.
  batch_components: bool = flax.struct.field(pytree_node=False, default=True)
  # Affine-element fast path: when every element's metric is constant
  # (G_ab = wq (x) c_ab, detected at build time), `g_affine` holds the
  # per-element scalars [c11; c12; c22] of shape (3, E) and `wq2d` the
  # (n, n) quadrature-weight diagonal; the Pallas stiffness then streams
  # ~2.2x fewer HBM bytes.  None on non-affine (curved/warped) meshes.
  g_affine: jax.Array | None = None
  wq2d: np.ndarray | None = flax.struct.field(pytree_node=False,
                                              default=None)
  # Congruent-elements fast path: when every element of an affine mesh
  # shares the SAME metric scalars (any uniform box — e.g. the reference
  # datagen geometry), the element operator is one static dense matrix
  # and the apply is a single (n^2, n^2) MXU matmul per component at 1/3
  # the stacked affine kernel's flops (`stiffness_el_pallas_uniform`).
  # The shared (c11, c12, c22) as a static hashable tuple; None otherwise.
  c_uniform: tuple | None = flax.struct.field(pytree_node=False,
                                              default=None)
  # MXU precision of the affine Pallas kernel: 'highest' (default,
  # f32-accurate, ~1.4e-7 rel), 'bf16x3' (three bf16 passes, ~6e-6 rel,
  # measured 1.6x faster on v5e — for loose-tolerance production runs), or
  # 'default' (single bf16 pass, ~3e-3 rel, 2.6x — preconditioner-grade
  # only).  Measured: experiments/bench_precision_ab.py.
  kernel_precision: str = flax.struct.field(pytree_node=False,
                                            default='highest')

  def _affine_precision(self):
    import jax.lax as _lax
    return {'highest': _lax.Precision.HIGHEST, 'bf16x3': 'bf16x3',
            'default': _lax.Precision.DEFAULT}[self.kernel_precision]

  # -- 1D contractions (axis 0 = xi, axis 1 = eta; E last) ----------------

  def _m(self, mat):
    return jnp.asarray(mat, dtype=self.wmass.dtype)

  @staticmethod
  def _ax0(mat, u):
    return jnp.einsum('qn,nje->qje', mat, u, precision=PRECISION)

  @staticmethod
  def _ax1(mat, u):
    return jnp.einsum('qn,jne->jqe', mat, u, precision=PRECISION)

  def interp_all(self, mat, u):
    """Applies a 1D matrix along every local axis (tensor-product map)."""
    m = self._m(mat)
    return self._ax1(m, self._ax0(m, u))

  # -- scalar element operators -------------------------------------------

  def stiffness_el(self, u: jax.Array) -> jax.Array:
    """A_local on one component, (n, n, E) -> (n, n, E)."""
    if self.use_pallas:
      if self.c_uniform is not None:
        from swirlfem_tpu.ops.pallas_stiffness import (
            stiffness_el_pallas_uniform)
        return stiffness_el_pallas_uniform(
            (u,), self.c_uniform, self.wq2d, self.dmat,
            precision=self._affine_precision())[0]
      if self.g_affine is not None:
        from swirlfem_tpu.ops.pallas_stiffness import (
            stiffness_el_pallas_affine)
        return stiffness_el_pallas_affine(
            (u,), self.g_affine, self.wq2d, self.dmat,
            precision=self._affine_precision())[0]
      # The row-unrolled kernel.  `stiffness_el_pallas_kron` measures ~11%
      # faster standalone but blows up XLA compile time when traced inside
      # the NSE-step scan, so it stays opt-in.
      from swirlfem_tpu.ops.pallas_stiffness import stiffness_el_pallas
      return stiffness_el_pallas(u, self.g11, self.g12, self.g22, self.dmat)
    d = self._m(self.dmat)
    ur = self._ax0(d, u)
    us = self._ax1(d, u)
    a = self.g11 * ur + self.g12 * us
    b = self.g12 * ur + self.g22 * us
    return self._ax0(d.T, a) + self._ax1(d.T, b)

  def stiffness_el_multi(self, us):
    """A_local on a tuple of components (one fused launch under Pallas).

    The component-batched kernel reads the three geometric-factor fields
    once for all components (~30% less HBM traffic at 2 components in the
    bandwidth-bound regime) — see `stiffness_el_pallas_batched`.  On
    affine meshes the factors are three scalar rows instead of fields
    (`stiffness_el_pallas_affine`, ~2.2x less traffic).
    """
    if self.use_pallas and self.batch_components and len(us) > 1:
      if self.c_uniform is not None:
        from swirlfem_tpu.ops.pallas_stiffness import (
            stiffness_el_pallas_uniform)
        return stiffness_el_pallas_uniform(us, self.c_uniform, self.wq2d,
                                           self.dmat,
                                           precision=self._affine_precision())
      if self.g_affine is not None:
        from swirlfem_tpu.ops.pallas_stiffness import (
            stiffness_el_pallas_affine)
        return stiffness_el_pallas_affine(us, self.g_affine, self.wq2d,
                                          self.dmat,
                                          precision=self._affine_precision())
      from swirlfem_tpu.ops.pallas_stiffness import stiffness_el_pallas_batched
      return stiffness_el_pallas_batched(us, self.g11, self.g12, self.g22,
                                         self.dmat)
    return tuple(self.stiffness_el(u) for u in us)

  def stiffness_diag_el(self) -> jax.Array:
    """Element-local diagonal of the stiffness operator, (n, n, E).

    diag(A)_(i,j) = sum_q D[q,i]^2 G11[q,j] + sum_r D[r,j]^2 G22[i,r]
                    + 2 D[i,i] D[j,j] G12[i,j]   (tensor-product closed form).
    Assembled (scattered + exchanged) it yields the Jacobi preconditioner
    diagonal for the viscous Helmholtz solve.
    """
    d = self._m(self.dmat)
    d2 = d * d
    t1 = jnp.einsum('qi,qje->ije', d2, self.g11, precision=PRECISION)
    t2 = jnp.einsum('rj,ire->ije', d2, self.g22, precision=PRECISION)
    dd = jnp.diagonal(d)
    cross = 2.0 * dd[:, None, None] * dd[None, :, None] * self.g12
    return t1 + t2 + cross

  def phys_grad_el(self, u: jax.Array):
    """Physical gradient at GLL points: returns (du/dx, du/dy)."""
    d = self._m(self.dmat)
    ur = self._ax0(d, u)
    us = self._ax1(d, u)
    k = self.kinv
    return (k[0, 0] * ur + k[0, 1] * us, k[1, 0] * ur + k[1, 1] * us)

  def divergence_el(self, ux: jax.Array, uy: jax.Array) -> jax.Array:
    """Pressure-space covector of int div(u) q: (n,n,E)x2 -> (m,m,E)."""
    gx = self.phys_grad_el(ux)[0]
    gy = self.phys_grad_el(uy)[1]
    w = self.wmass * (gx + gy)
    ipt = self._m(self.interp_p).T  # (m, n)
    return self._ax1(ipt, self._ax0(ipt, w))

  def gradient_el(self, p: jax.Array):
    """Velocity-space covector of int div(v) p: (m,m,E) -> 2 x (n,n,E)."""
    ip = self._m(self.interp_p)
    q = self.wmass * self._ax1(ip, self._ax0(ip, p))
    d = self._m(self.dmat)
    k = self.kinv
    outs = []
    for j in range(2):
      outs.append(self._ax0(d.T, k[j, 0] * q) + self._ax1(d.T, k[j, 1] * q))
    return tuple(outs)

  def convection_el(self, ux: jax.Array, uy: jax.Array):
    """Covector of the dealiased trilinear form int (u . grad u) . v."""
    io = self._m(self.interp_o)
    ig = self._m(self.interp_o_grad)
    uxo = self._ax1(io, self._ax0(io, ux))
    uyo = self._ax1(io, self._ax0(io, uy))
    ko, wo = self.kinv_o, self.wmass_o
    outs = []
    for comp in (ux, uy):
      # grad of comp at overint points (reference-space).
      tr = self._ax1(io, self._ax0(ig, comp))
      ts = self._ax1(ig, self._ax0(io, comp))
      dx = ko[0, 0] * tr + ko[0, 1] * ts
      dy = ko[1, 0] * tr + ko[1, 1] * ts
      conv = wo * (uxo * dx + uyo * dy)
      outs.append(self._ax1(io.T, self._ax0(io.T, conv)))
    return tuple(outs)


def build_sem2d_ops(velocity, pressure, use_pallas: bool = False,
                    kernel_precision: str = 'highest') -> Sem2DOps:
  """Builds E-last factors from the generic spaces (host/setup time).

  Works for ANY 2D mesh — the element operators only consume per-element
  geometric factor fields.  On structured boxes ``vinfo``/``pinfo``
  additionally enable the index-free layout transforms and the roll-based
  el exchange; on unstructured meshes they are None and the solver pairs
  the same operators with index-based gather/scatter transforms.

  Args:
    velocity: `StokesVelocity` with a 2D GLL mesh (collocated quadrature:
      vspace quad points == mesh gridpoints).
    pressure: `StokesPressure` with the matching GL pressure mesh.
  """
  if kernel_precision not in ('highest', 'bf16x3', 'default'):
    raise ValueError(f'unknown kernel_precision {kernel_precision!r}; '
                     "expected 'highest' | 'bf16x3' | 'default'")
  vspace = velocity.vspace
  vinfo = vspace.mesh.structured
  pinfo = pressure.pspace.mesh.structured
  num_elems = vspace.num_elements
  assert vspace.mesh.ndim == 2

  def to_el(arr):  # (E, Q) -> (n_q, n_q, E), lexicographic quad order
    q = int(round(np.sqrt(arr.shape[1])))
    return jnp.moveaxis(arr.reshape(num_elems, q, q), 0, -1)

  # invjacs (E, Q, 2, 2): [j, i] = dxi_i / dx_j.
  def kinv_of(space):
    q = int(round(np.sqrt(space.invjacs.shape[1])))
    k = jnp.moveaxis(space.invjacs.reshape(num_elems, q, q, 2, 2), 0, -1)
    return jnp.moveaxis(k, (2, 3), (0, 1))  # (2, 2, q, q, E)

  wq_v = jnp.asarray(
      vspace.quadrature.weights_nd(2), dtype=vspace.jacdets.dtype)
  wmass = to_el(vspace.jacdets * wq_v[None, :])
  kinv = kinv_of(vspace)

  # G_ab = W * sum_j K[j,a] K[j,b].
  g11 = wmass * (kinv[0, 0] ** 2 + kinv[1, 0] ** 2)
  g12 = wmass * (kinv[0, 0] * kinv[0, 1] + kinv[1, 0] * kinv[1, 1])
  g22 = wmass * (kinv[0, 1] ** 2 + kinv[1, 1] ** 2)

  ospace = velocity.overint_space
  wq_o = jnp.asarray(
      ospace.quadrature.weights_nd(2), dtype=ospace.jacdets.dtype)
  wmass_o = to_el(ospace.jacdets * wq_o[None, :])
  kinv_o = kinv_of(ospace)

  # Affine-element detection from EXACT host-side geometry: an element
  # map is affine iff its nodes are an affine image of the reference
  # nodes.  Fitting x = x0 + J xi per element in f64 and thresholding the
  # residual (relative to the element size) is robust where thresholding
  # the device geometric-factor fields is not — differentiating O(1)
  # coordinates across 1/n-size elements amplifies the f32 coordinate
  # roundoff by ~n (measured: 5.6e-4 relative metric noise on an exactly
  # uniform 64x64 box).  When affine, G_ab = wq (x) c_ab with
  # c_ab = |det J| (J^-1 J^-T)_ab one f64-exact scalar per element — both
  # FASTER (the Pallas stiffness skips streaming three factor fields,
  # see stiffness_el_pallas_affine) and more accurate than the noisy
  # pointwise fields.
  nq = int(round(np.sqrt(vspace.jacdets.shape[1])))
  wq2d = np.asarray(vspace.quadrature.weights_nd(2),
                    dtype=np.float64).reshape(nq, nq)
  g_affine = None
  coords = np.asarray(vspace.mesh.node_coords, dtype=np.float64)
  el_coords = coords[np.asarray(vspace.mesh.elements)]   # (E, k^2, 2)
  grid = np.asarray(vspace.mesh.gridpoints_1d.points, dtype=np.float64)
  k1 = grid.shape[0]
  xi = np.stack([np.repeat(grid, k1), np.tile(grid, k1)], axis=-1)
  phi = np.concatenate([np.ones((k1 * k1, 1)), xi], axis=1)  # (k^2, 3)
  params = np.linalg.pinv(phi) @ el_coords                # (E, 3, 2)
  resid = np.abs(phi @ params - el_coords).max(axis=(1, 2))  # (E,)
  jac = np.swapaxes(params[:, 1:, :], 1, 2)               # (E, 2, 2) dx/dxi
  h = np.linalg.norm(jac, axis=(1, 2)) + 1e-300
  # Coordinates of an exactly affine mesh stored at absolute positions
  # ~O(1) carry rounding ~eps, which is ~eps/h relative to the element
  # size — e.g. ~9e-6 for f32 coords on a 64x64 unit box.  Residuals at
  # that level are representation noise, not curvature (and are below
  # the f32 geometric-factor pipeline's own noise); genuine curvature
  # shows up at >~1e-2.
  coord_eps = float(jnp.finfo(vspace.mesh.node_coords.dtype).eps)
  rel_tol = 1e-4 if coord_eps > 1e-10 else 1e-9
  c_uniform = None
  if float((resid / h).max()) <= rel_tol:
    det = np.abs(np.linalg.det(jac))
    jinv = np.linalg.inv(jac)
    met = np.einsum('eaj,ebj->eab', jinv, jinv) * det[:, None, None]
    c_np = np.stack([met[:, 0, 0], met[:, 0, 1], met[:, 1, 1]])  # (3, E)
    g_affine = jnp.asarray(c_np, dtype=g11.dtype)
    # Congruent elements: all metric scalars identical (f64 check).  Same
    # representation-noise argument as the affine snap above: f32-stored
    # coordinates of an exactly uniform box perturb per-element metrics by
    # ~eps/h ~ 1e-5 relative, so agreement within `rel_tol` is roundoff,
    # not grading — and the MEAN scalars are more accurate than any
    # per-element noisy value.  The shared scalars become one static
    # dense element operator — see `stiffness_el_pallas_uniform`.
    c0 = c_np[:, :1]
    scale = np.abs(c0).max()
    if np.abs(c_np - c0).max() <= rel_tol * scale:
      c_uniform = tuple(float(v) for v in c_np.mean(axis=1))

  from swirlfem_tpu.core.quadrature import (interpolation_grad_matrix_1d,
                                            interpolation_matrix_1d,
                                            differentiation_matrix_1d)
  vgrid = vspace.mesh.gridpoints_1d
  pgrid = pressure.pspace.mesh.gridpoints_1d
  ogrid = ospace.quadrature.nodes
  return Sem2DOps(
      g11=g11, g12=g12, g22=g22, wmass=wmass, kinv=kinv,
      wmass_o=wmass_o, kinv_o=kinv_o,
      dmat=differentiation_matrix_1d(vgrid),
      interp_p=interpolation_matrix_1d(pgrid, vgrid),
      interp_o=interpolation_matrix_1d(vgrid, ogrid),
      interp_o_grad=interpolation_grad_matrix_1d(vgrid, ogrid),
      vinfo=vinfo, pinfo=pinfo, use_pallas=use_pallas,
      g_affine=g_affine, wq2d=wq2d, c_uniform=c_uniform,
      kernel_precision=kernel_precision)
