"""E-last element-operator core for 3D structured spectral elements.

Same design as `ops.sem2d` (see its docstring for the TPU layout
rationale), one dimension up: element-local data lives in ``(k, k, k, E)``
("E-last") layout with ``E = n^3`` riding the 128-lane axis, and the
Deville-Fischer-Mund factorized operator algebra becomes

    A u = sum_ab D_a^T ( G_ab D_b u ),   a, b in {xi, eta, zeta}

with six symmetric geometric factor fields G_ab.  All contractions are
1D-matrix einsums along a local axis; XLA fuses the pointwise factors.

Parity target: the reference applies these forms via generic per-element
quadrature loops (swirl_fem/core/fespace.py local_covector); here they are
factorized for the MXU, O(N^4) per element instead of O(N^6).
"""

from __future__ import annotations

import flax.struct
import jax
from jax import lax
import jax.numpy as jnp
import numpy as np

from swirlfem_tpu.core.structured import _scatter_axis
from swirlfem_tpu.core.structured import StructuredInfo

PRECISION = lax.Precision.HIGHEST


# -- layout transforms -------------------------------------------------------


def nodal_to_el(u: jax.Array, info: StructuredInfo) -> jax.Array:
  """Flat nodal ``(num_nodes,)`` -> element-local ``(k, k, k, E)`` (E-last)."""
  n, p = info.num_elements_per_dim, info.order
  k = p + 1
  if not info.continuous:
    g = u.reshape(n, k, n, k, n, k)
    return g.transpose(1, 3, 5, 0, 2, 4).reshape(k, k, k, n ** 3)
  big = n * p + 1
  out = u.reshape(big, big, big)
  # Split one grid axis at a time into an (element, local) axis pair; after
  # processing axes 0..a-1 the layout is (e0, l0, ..., grid_a, ...), so grid
  # axis a sits at position 2a.
  for axis in range(3):
    node_axis = 2 * axis
    g = jnp.moveaxis(out, node_axis, 0)
    head = g[:-1].reshape((n, p) + g.shape[1:])
    last = g[1:].reshape((n, p) + g.shape[1:])[:, p - 1:p]
    split = jnp.concatenate([head, last], axis=1)  # (n, p+1, rest)
    out = jnp.moveaxis(split, (0, 1), (node_axis, node_axis + 1))
  # (e0, l0, e1, l1, e2, l2) -> (l0, l1, l2, e0, e1, e2)
  return out.transpose(1, 3, 5, 0, 2, 4).reshape(k, k, k, n ** 3)


def el_to_nodal(w: jax.Array, info: StructuredInfo) -> jax.Array:
  """Transpose of `nodal_to_el`: sums overlapping element boundaries."""
  n, p = info.num_elements_per_dim, info.order
  k = p + 1
  if not info.continuous:
    return w.reshape(k, k, k, n, n, n).transpose(3, 0, 4, 1, 5, 2).reshape(-1)
  out = w.reshape(k, k, k, n, n, n).transpose(3, 0, 4, 1, 5, 2)
  for axis in reversed(range(3)):
    node_axis = 2 * axis
    moved = jnp.moveaxis(out, (node_axis, node_axis + 1), (0, 1))
    combined = _scatter_axis(moved, n, p)  # (n*p + 1, rest)
    out = jnp.moveaxis(combined, 0, node_axis)
  return out.reshape(-1)


def exchange_el(w: jax.Array, info: StructuredInfo,
                use_pallas: bool = False) -> jax.Array:
  """Direct-stiffness summation (Q Q^T) in element-local form, periodic box.

  Input/output ``(k, k, k, n, n, n)``; three sequential axis passes of rolls
  (later passes propagate face sums so edges and corners receive all
  contributions); periodic wraparound is the roll itself.

  ``use_pallas`` is accepted for signature parity with the 2D module
  (`sem2d.exchange_el`, used interchangeably by the el-form step in
  `nse.solver`): there is no fused 3D exchange kernel yet, so the
  roll-based XLA path runs either way.
  """
  del use_pallas
  p = info.order
  # local axis 2 <-> element axis -1.
  s = w[:, :, p] + jnp.roll(w[:, :, 0], -1, axis=-1)
  w = w.at[:, :, p].set(s)
  w = w.at[:, :, 0].set(jnp.roll(s, 1, axis=-1))
  # local axis 1 <-> element axis -2.
  s = w[:, p] + jnp.roll(w[:, 0], -1, axis=-2)
  w = w.at[:, p].set(s)
  w = w.at[:, 0].set(jnp.roll(s, 1, axis=-2))
  # local axis 0 <-> element axis -3.
  s = w[p] + jnp.roll(w[0], -1, axis=-3)
  w = w.at[p].set(s)
  w = w.at[0].set(jnp.roll(s, 1, axis=-3))
  return w


def multiplicity_el(info: StructuredInfo, dtype=jnp.float32) -> jax.Array:
  """Copy-count of each element-local node on the periodic box."""
  k = info.order + 1
  n = info.num_elements_per_dim
  ones = jnp.ones((k, k, k, n, n, n), dtype=dtype)
  return exchange_el(ones, info)


# -- factor container --------------------------------------------------------


@flax.struct.dataclass
class Sem3DOps:
  """Precomputed E-last operator factors for one structured 3D SEM setup."""

  # geometric factors at velocity GLL points, (k, k, k, E)
  g11: jax.Array
  g12: jax.Array
  g13: jax.Array
  g22: jax.Array
  g23: jax.Array
  g33: jax.Array
  wmass: jax.Array                     # w_q |J|
  kinv: jax.Array                      # (3, 3, k, k, k, E): K[j,i]=dxi_i/dx_j
  # overintegration fields, (m_o, m_o, m_o, E)
  wmass_o: jax.Array
  kinv_o: jax.Array                    # (3, 3, m_o, m_o, m_o, E)
  # static 1D matrices
  dmat: np.ndarray = flax.struct.field(pytree_node=False)
  interp_p: np.ndarray = flax.struct.field(pytree_node=False)  # (k, m_p)
  interp_o: np.ndarray = flax.struct.field(pytree_node=False)  # (m_o, k)
  interp_o_grad: np.ndarray = flax.struct.field(pytree_node=False)
  vinfo: StructuredInfo = flax.struct.field(pytree_node=False)
  pinfo: StructuredInfo = flax.struct.field(pytree_node=False)
  # Route the stiffness apply through the fused Pallas kernel
  # (ops.pallas_stiffness3d): one HBM read of inputs + the six factor
  # fields instead of XLA's materialized einsum intermediates — measured
  # 3.3x on a v5e at order 7 (9.4 -> 31 GDOF/s, 61% of HBM peak).
  use_pallas: bool = flax.struct.field(pytree_node=False, default=False)
  # Congruent axis-aligned elements: G_aa(q, e) = c_aa * w_i w_j w_k for
  # every element with zero cross factors (detected in f64 at build).
  # The congruent kernel (pallas_stiffness3d.stiffness3d_el_pallas_uniform)
  # streams NO factor fields (in+out traffic only) and runs every zeta
  # contraction — At = D^T W D and the W scaling both — as (k, k) MXU
  # matmuls with static python-float coefficients: measured 32.9 vs 26.2
  # GDOF/s for the general fused kernel at 16^3 order 7 on a v5e (an
  # earlier variant using (k, 1)-broadcast sublane weight multiplies
  # lowered ~60x SLOWER under Mosaic — keep weight stages as matmuls).
  c_uniform: tuple | None = flax.struct.field(pytree_node=False,
                                              default=None)
  w1: object = flax.struct.field(pytree_node=False, default=None)
  # Affine (constant-Jacobian-per-element) meshes: the six factor fields
  # collapse to per-element coefficients G_ab = w(q) * C_ab(e), stored as
  # one (6, E) array — the affine pair kernel streams these 6 floats per
  # element instead of six (k^3, E) fields (detected in build_sem3d_ops;
  # 3D analogue of sem2d's g_affine).  Opt-in (bf16x3 accuracy class)
  # via use_affine_kernel; the default keeps the exact-f32 general path.
  g_affine: jax.Array | None = None
  use_affine_kernel: bool = flax.struct.field(pytree_node=False,
                                              default=False)
  use_uniform_kernel: bool = flax.struct.field(pytree_node=False,
                                               default=True)
  # Congruent-kernel implementation: 'fused' = sum-factorized VPU+MXU mix
  # (stiffness3d_el_pallas_uniform); 'dense' = ONE static (k^3, k^3) MXU
  # matmul per block (stiffness3d_el_pallas_dense) — ~10x the flops but
  # zero VPU work, sitting at the v5e machine balance, so it reaches the
  # HBM roofline where the fused kernel measures compute-latency bound
  # (VERDICT r3 #4).  Chip A/B: experiments/bench_dense3d.py.
  uniform_kernel_impl: str = flax.struct.field(pytree_node=False,
                                               default='fused')
  # MXU precision for the dense congruent kernel: None/'highest' = full
  # f32 (6 bf16 passes), 'bf16x3' = three passes (~2-3e-5 relative at
  # k = 8 vs the f64 element operator).
  kernel_precision: object = flax.struct.field(pytree_node=False,
                                               default=None)
  # General (warped-mesh) kernel implementation: 'fused' = sum-factorized
  # VPU+MXU mix (stiffness3d_el_pallas), 'pair' = (eta, zeta) merged on
  # the sublane axis with stacked (2k^2, k^2) bf16x3 MXU derivative
  # matmuls per xi-slab (stiffness3d_el_pallas_pair_general) — the
  # VERDICT-r4 #2 restructuring; same HBM traffic, MXU instead of
  # VPU-chain latency.  'pair' is bf16x3 (~1e-5 relative); the default
  # stays the exact-f32 'fused' so accuracy-critical paths are unchanged
  # — opt in via ops.replace(general_kernel_impl='pair').
  general_kernel_impl: str = flax.struct.field(pytree_node=False,
                                               default='fused')

  # -- 1D contractions (axes 0..2 = xi, eta, zeta; E last) -----------------

  def _m(self, mat):
    return jnp.asarray(mat, dtype=self.wmass.dtype)

  @staticmethod
  def _ax0(mat, u):
    return jnp.einsum('qn,njke->qjke', mat, u, precision=PRECISION)

  @staticmethod
  def _ax1(mat, u):
    return jnp.einsum('qn,inke->iqke', mat, u, precision=PRECISION)

  @staticmethod
  def _ax2(mat, u):
    return jnp.einsum('qn,ijne->ijqe', mat, u, precision=PRECISION)

  def interp_all(self, mat, u):
    """Applies a 1D matrix along every local axis (tensor-product map)."""
    m = self._m(mat)
    return self._ax2(m, self._ax1(m, self._ax0(m, u)))

  # -- scalar element operators -------------------------------------------

  def _ref_grad(self, u):
    d = self._m(self.dmat)
    return self._ax0(d, u), self._ax1(d, u), self._ax2(d, u)

  def _gs(self):
    return (self.g11, self.g12, self.g13, self.g22, self.g23, self.g33)

  def stiffness_el(self, u: jax.Array) -> jax.Array:
    """A_local on one component, (k, k, k, E) -> (k, k, k, E)."""
    if self.use_pallas:
      if self.c_uniform is not None and self.use_uniform_kernel:
        from swirlfem_tpu.ops.pallas_stiffness3d import (
            stiffness3d_el_pallas_uniform)
        return stiffness3d_el_pallas_uniform(
            (u,), self.c_uniform, self.w1, self.dmat)[0]
      if self.g_affine is not None and self.use_affine_kernel:
        from swirlfem_tpu.ops.pallas_stiffness3d import (
            stiffness3d_el_pallas_pair_affine)
        return stiffness3d_el_pallas_pair_affine(
            (u,), self.g_affine, self.w1, self.dmat)[0]
      if self.general_kernel_impl == 'pair':
        from swirlfem_tpu.ops.pallas_stiffness3d import (
            stiffness3d_el_pallas_pair_general)
        return stiffness3d_el_pallas_pair_general(
            (u,), self._gs(), self.dmat)[0]
      from swirlfem_tpu.ops.pallas_stiffness3d import stiffness3d_el_pallas
      return stiffness3d_el_pallas((u,), self._gs(), self.dmat)[0]
    d = self._m(self.dmat)
    ur, us, ut = self._ref_grad(u)
    a = self.g11 * ur + self.g12 * us + self.g13 * ut
    b = self.g12 * ur + self.g22 * us + self.g23 * ut
    c = self.g13 * ur + self.g23 * us + self.g33 * ut
    return self._ax0(d.T, a) + self._ax1(d.T, b) + self._ax2(d.T, c)

  def stiffness_el_multi(self, us):
    """A_local on all components in one component-batched pass.

    Stacking the components guarantees the six geometric-factor fields
    stream from HBM once per apply instead of once per component (the
    per-component loop leaves that reuse to XLA fusion luck): at C=3,
    order 7, that is 18 -> 6 factor-field reads — ~2x less HBM traffic
    for this bandwidth-bound operator.  (The 2D analogue is the batched
    Pallas kernel in `ops.pallas_stiffness`.)
    """
    if self.use_pallas:
      if self.c_uniform is not None and self.use_uniform_kernel:
        if self.uniform_kernel_impl == 'pair':
          from swirlfem_tpu.ops.pallas_stiffness3d import (
              stiffness3d_el_pallas_pair)
          return stiffness3d_el_pallas_pair(us, self.c_uniform, self.w1,
                                            self.dmat)
        if self.uniform_kernel_impl == 'dense':
          from swirlfem_tpu.ops.pallas_stiffness3d import (
              stiffness3d_el_pallas_dense)
          precision = (PRECISION if self.kernel_precision in (None, 'highest')
                       else self.kernel_precision)
          return stiffness3d_el_pallas_dense(us, self.c_uniform, self.w1,
                                             self.dmat, precision=precision)
        from swirlfem_tpu.ops.pallas_stiffness3d import (
            stiffness3d_el_pallas_uniform)
        return stiffness3d_el_pallas_uniform(us, self.c_uniform, self.w1,
                                             self.dmat)
      if self.g_affine is not None and self.use_affine_kernel:
        from swirlfem_tpu.ops.pallas_stiffness3d import (
            stiffness3d_el_pallas_pair_affine)
        return stiffness3d_el_pallas_pair_affine(us, self.g_affine,
                                                 self.w1, self.dmat)
      if self.general_kernel_impl == 'pair':
        from swirlfem_tpu.ops.pallas_stiffness3d import (
            stiffness3d_el_pallas_pair_general)
        return stiffness3d_el_pallas_pair_general(us, self._gs(), self.dmat)
      if self.general_kernel_impl == 'pairz':
        from swirlfem_tpu.ops.pallas_stiffness3d import (
            stiffness3d_el_pallas_pairz_general)
        return stiffness3d_el_pallas_pairz_general(us, self._gs(), self.dmat)
      if self.general_kernel_impl in ('pairs2', 'pairs4'):
        from swirlfem_tpu.ops.pallas_stiffness3d import (
            stiffness3d_el_pallas_pairs_general)
        return stiffness3d_el_pallas_pairs_general(
            us, self._gs(), self.dmat,
            superslab=int(self.general_kernel_impl[-1]))
      from swirlfem_tpu.ops.pallas_stiffness3d import stiffness3d_el_pallas
      return stiffness3d_el_pallas(us, self._gs(), self.dmat)
    if len(us) == 1:
      return (self.stiffness_el(us[0]),)
    d = self._m(self.dmat)
    u = jnp.stack(us)  # (C, k, k, k, E)
    ax0 = lambda m, w: jnp.einsum('qn,cnjke->cqjke', m, w,
                                  precision=PRECISION)
    ax1 = lambda m, w: jnp.einsum('qn,cinke->ciqke', m, w,
                                  precision=PRECISION)
    ax2 = lambda m, w: jnp.einsum('qn,cijne->cijqe', m, w,
                                  precision=PRECISION)
    ur, uss, ut = ax0(d, u), ax1(d, u), ax2(d, u)
    a = self.g11 * ur + self.g12 * uss + self.g13 * ut
    b = self.g12 * ur + self.g22 * uss + self.g23 * ut
    c = self.g13 * ur + self.g23 * uss + self.g33 * ut
    out = ax0(d.T, a) + ax1(d.T, b) + ax2(d.T, c)
    return tuple(out[i] for i in range(len(us)))

  def stiffness_diag_el(self) -> jax.Array:
    """Element-local diagonal of the stiffness operator (closed form)."""
    d = self._m(self.dmat)
    d2 = d * d
    t1 = jnp.einsum('qi,qjke->ijke', d2, self.g11, precision=PRECISION)
    t2 = jnp.einsum('rj,irke->ijke', d2, self.g22, precision=PRECISION)
    t3 = jnp.einsum('sk,ijse->ijke', d2, self.g33, precision=PRECISION)
    dd = jnp.diagonal(d)
    di = dd[:, None, None, None]
    dj = dd[None, :, None, None]
    dk = dd[None, None, :, None]
    cross = 2.0 * (di * dj * self.g12 + di * dk * self.g13
                   + dj * dk * self.g23)
    return t1 + t2 + t3 + cross

  def phys_grad_el(self, u: jax.Array):
    """Physical gradient at GLL points: (du/dx, du/dy, du/dz)."""
    ur, us, ut = self._ref_grad(u)
    k = self.kinv
    return tuple(k[j, 0] * ur + k[j, 1] * us + k[j, 2] * ut
                 for j in range(3))

  def divergence_el(self, ux, uy, uz) -> jax.Array:
    """Pressure-space covector of int div(u) q."""
    w = self.wmass * (self.phys_grad_el(ux)[0] + self.phys_grad_el(uy)[1]
                      + self.phys_grad_el(uz)[2])
    ipt = self._m(self.interp_p).T  # (m, k)
    return self._ax2(ipt, self._ax1(ipt, self._ax0(ipt, w)))

  def gradient_el(self, p: jax.Array):
    """Velocity-space covector of int div(v) p: (m,m,m,E) -> 3x(k,k,k,E)."""
    q = self.wmass * self.interp_all(self.interp_p, p)
    d = self._m(self.dmat)
    k = self.kinv
    outs = []
    for j in range(3):
      outs.append(self._ax0(d.T, k[j, 0] * q) + self._ax1(d.T, k[j, 1] * q)
                  + self._ax2(d.T, k[j, 2] * q))
    return tuple(outs)

  def convection_el(self, ux, uy, uz):
    """Covector of the dealiased trilinear form int (u . grad u) . v."""
    io = self._m(self.interp_o)
    ig = self._m(self.interp_o_grad)
    uo = tuple(self.interp_all(io, c) for c in (ux, uy, uz))
    ko, wo = self.kinv_o, self.wmass_o
    outs = []
    for comp in (ux, uy, uz):
      # reference-space gradient of comp at the overintegration points.
      tr = self._ax2(io, self._ax1(io, self._ax0(ig, comp)))
      ts = self._ax2(io, self._ax1(ig, self._ax0(io, comp)))
      tt = self._ax2(ig, self._ax1(io, self._ax0(io, comp)))
      conv = wo * sum(
          uo[j] * (ko[j, 0] * tr + ko[j, 1] * ts + ko[j, 2] * tt)
          for j in range(3))
      outs.append(self.interp_all(io.T, conv))
    return tuple(outs)


def build_sem3d_ops(velocity, pressure) -> Sem3DOps:
  """Builds E-last factors from the generic spaces (host/setup time)."""
  vspace = velocity.vspace
  vinfo = vspace.mesh.structured
  pinfo = pressure.pspace.mesh.structured
  assert vinfo is not None and pinfo is not None and vinfo.ndim == 3
  num_elems = vinfo.num_elements_per_dim ** 3

  def qdim(size):
    q = int(round(size ** (1.0 / 3.0)))
    assert q ** 3 == size, (q, size)
    return q

  def to_el(arr):  # (E, Q) -> (q, q, q, E), lexicographic quad order
    q = qdim(arr.shape[1])
    return jnp.moveaxis(arr.reshape(num_elems, q, q, q), 0, -1)

  def kinv_of(space):
    q = qdim(space.invjacs.shape[1])
    k = jnp.moveaxis(space.invjacs.reshape(num_elems, q, q, q, 3, 3), 0, -1)
    return jnp.moveaxis(k, (3, 4), (0, 1))  # (3, 3, q, q, q, E)

  wq_v = jnp.asarray(
      vspace.quadrature.weights_nd(3), dtype=vspace.jacdets.dtype)
  wmass = to_el(vspace.jacdets * wq_v[None, :])
  kinv = kinv_of(vspace)

  # G_ab = W * sum_j K[j,a] K[j,b].
  def gfield(a, b):
    return wmass * sum(kinv[j, a] * kinv[j, b] for j in range(3))

  ospace = velocity.overint_space
  wq_o = jnp.asarray(
      ospace.quadrature.weights_nd(3), dtype=ospace.jacdets.dtype)
  wmass_o = to_el(ospace.jacdets * wq_o[None, :])
  kinv_o = kinv_of(ospace)

  from swirlfem_tpu.core.quadrature import (interpolation_grad_matrix_1d,
                                            interpolation_matrix_1d,
                                            differentiation_matrix_1d)
  vgrid = vspace.mesh.gridpoints_1d
  pgrid = pressure.pspace.mesh.gridpoints_1d
  ogrid = ospace.quadrature.nodes

  g_diag = [gfield(a, a) for a in range(3)]
  g_off = [gfield(0, 1), gfield(0, 2), gfield(1, 2)]

  # Congruent-elements detection (same representation-noise rationale as
  # `sem2d.build_sem2d_ops`): an axis-aligned box of identical elements
  # has G_aa = c_aa * w(q) with zero cross factors; f32-stored
  # coordinates perturb the factors by ~eps/h relative, so agreement
  # within rel_tol is roundoff, not warp/grading.
  from swirlfem_tpu.core.quadrature import Quadrature1D
  w1 = np.asarray(Quadrature1D.create_from_nodes_1d(vgrid).weights,
                  dtype=np.float64)
  k = w1.shape[0]
  wq3 = (w1[:, None, None] * w1[None, :, None] * w1[None, None, :])[..., None]
  coord_eps = float(jnp.finfo(vspace.mesh.node_coords.dtype).eps)
  # f32 tolerance: the invjac pipeline noise is ~eps/h relative, which at
  # 16^3 elements order 7 measures ~1.2e-4 — genuine grading/warp shows
  # at >1e-2, so 1e-3 cleanly separates representation noise from
  # geometry (and the mean scalars are more accurate than any noisy
  # per-point value).
  rel_tol = 1e-3 if coord_eps > 1e-10 else 1e-9
  c_uniform = None
  # Per-axis-pair shear gate: |G_ab| must vanish relative to
  # sqrt(|G_aa|_max * |G_bb|_max) for ITS axes, not the single largest
  # diagonal factor — a high-aspect-ratio box otherwise lets real shear on
  # the small axes hide under the big axis' scale (advisor r3).
  diag_max = [float(np.abs(np.asarray(g)).max()) for g in g_diag]
  off_pairs = ((0, 1), (0, 2), (1, 2))
  if all(float(np.abs(np.asarray(g)).max())
         <= rel_tol * np.sqrt(diag_max[a] * diag_max[b])
         for g, (a, b) in zip(g_off, off_pairs)):
    cs = []
    for g in g_diag:
      c_field = np.asarray(g, dtype=np.float64) / wq3
      c = float(c_field.mean())
      if float(np.abs(c_field - c).max()) > rel_tol * abs(c):
        break
      cs.append(c)
    if len(cs) == 3:
      c_uniform = tuple(cs)

  # Affine-elements detection (constant Jacobian per ELEMENT, but not the
  # same across elements / not axis-aligned): every factor field is
  # G_ab(q, e) = w(q) * C_ab(e), so G/w must be constant WITHIN each
  # element to representation noise.  Then only the 6 x E coefficient
  # matrix streams from HBM (stiffness3d_el_pallas_pair_affine) — 3D
  # analogue of the 2D `g_affine` path.  Covers sheared/graded
  # parallelepiped meshes (straight-sided hex imports); curved elements
  # (e.g. cylinder O-grids) fail the gate and keep the general kernel.
  g_affine = None
  if c_uniform is None:
    fields = [g_diag[0], g_off[0], g_off[1], g_diag[1], g_off[2], g_diag[2]]
    hs = [np.asarray(g, dtype=np.float64) / wq3 for g in fields]
    hd_max = [np.abs(hs[i]).max() for i in (0, 3, 5)]
    scale_of = ((0, 0), (0, 1), (0, 2), (1, 1), (1, 2), (2, 2))
    rows = []
    for h, (a, b) in zip(hs, scale_of):
      c_e = h.mean(axis=(0, 1, 2))
      scale = float(np.sqrt(hd_max[a] * hd_max[b]))
      if float(np.abs(h - c_e).max()) > rel_tol * scale:
        rows = None
        break
      rows.append(c_e)
    if rows is not None:
      g_affine = jnp.asarray(np.stack(rows), dtype=wmass.dtype)

  return Sem3DOps(
      g_affine=g_affine,
      g11=g_diag[0], g12=g_off[0], g13=g_off[1],
      g22=g_diag[1], g23=g_off[2], g33=g_diag[2],
      wmass=wmass, kinv=kinv, wmass_o=wmass_o, kinv_o=kinv_o,
      dmat=differentiation_matrix_1d(vgrid),
      interp_p=interpolation_matrix_1d(pgrid, vgrid),
      interp_o=interpolation_matrix_1d(vgrid, ogrid),
      interp_o_grad=interpolation_grad_matrix_1d(vgrid, ogrid),
      vinfo=vinfo, pinfo=pinfo, c_uniform=c_uniform, w1=w1)
