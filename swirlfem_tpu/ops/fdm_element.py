"""Element-local FDM (fast-diagonalization) viscous preconditioner.

Overlap-0 additive Schwarz whose local solves are per-element separable
fast-diagonalization inverses built from volume-averaged metric
coefficients — the classical spectral-element Helmholtz preconditioner
(Deville-Fischer-Mund ch. 7; Lynch-Rice-Thomas 1964 local solves).  Works on ANY quad/hex mesh:
warped, unstructured, partitioned — unlike :mod:`ops.fdm_pressure`'s
*global* FDM solver, which is exact but requires a uniform separable box.

Reference parity anchor: google-research/swirl-fem has no viscous
preconditioner at all — its tentative-velocity CG runs with the bare
exchange projector (``navier_stokes/navier_stokes.py:431-438``).  This
module is beyond-parity machinery targeting the viscous Helmholtz solve
``H = (beta_k/dt) B + mu A``, which dominates partitioned step cost once
the pressure solve is Schwarz-preconditioned (see NOTES_ROUND6 item 9).

Construction.  Replace each element's true metric by its volume-weighted
average (the separable model; exact on any axis-aligned box):

    rho(e)  = <jacdet>_w                      (mass coefficient)
    g_a(e)  = <jacdet * sum_j (dr_a/dx_j)^2>_w  (per-axis stiffness coeff)

    H_e ~ (beta_k/dt) rho (x)_a Mhat
          + mu sum_a g_a Shat_a (x)_{b!=a} Mhat_b

where ``Mhat = diag(w_gll)`` and ``Shat = D^T Mhat D`` are the 1D
reference mass/stiffness on [-1, 1].  With the single shared generalized
eigenbasis ``Shat zhat = Mhat zhat diag(lam)``, ``zhat^T Mhat zhat = I``,

    H_e^{-1} ~ (x zhat) diag( 1 / (rho beta_k/dt
               + mu sum_a g_a lam_{i_a}) ) (x zhat)^T

i.e. ALL elements share the eigenbasis and differ only by a diagonal —
the apply is d batched (k, k) matmuls over every element (the exact MXU
shape of the sum-factorized stiffness apply) plus one per-element
diagonal multiply.  Setup is one k x k host eigenproblem plus weighted
averages of the already-computed geometric factors.

Assembly (symmetric weighted additive Schwarz, SPD on the continuous
interior subspace, copy-consistent output — the round-5 CG lesson):

    M = P E Q^T T (o+_e Hhat_e^{-1}) T Q E P,
    T_e(q) = sqrt( dhat_e(q) / (D(q) c(q)) )

with ``Q``/``Q^T`` the element gather/scatter, ``E = Q Q^T`` the exchange
(cross-partition + periodic copy summation), ``P`` the Dirichlet interior
mask, and ``T`` a per-element-slot diagonal weight built from the model
diagonal ``dhat_e = diag(Hhat_e)``, the exchange-assembled true diagonal
``D``, and the dof multiplicity ``c``.  Every factor is symmetric, so M
is; the outer E makes the output identical across dof copies so CG
cannot wander in the redundant kernel.

Why this T (diagonal correction + diagonal partition of unity): the
averaged model cannot see within-element metric variation, which on
curved/stretched elements (cylinder boundary layers) would make a plain
counting-weighted Schwarz *worse* than exact-diagonal Jacobi in
mass-dominated (small-dt) regimes.  With this T, in the mass-dominated
limit ``Hhat_e^{-1} -> diag(1/dhat_e)`` exactly (the collocated-GLL mass
is diagonal and the eigenbasis complete), so

    M -> sum_e T^2 / dhat = sum_e 1/(D c) = 1/D

— the exact assembled Jacobi projector, including across element-size
jumps where counting weights would overweight small-element local
solves.  In stiffness-dominated regimes the spectral local solves kick
in.  Measured on warped cavities and the cylinder channel: never worse
than Jacobi, ~2x fewer viscous CG iterations wherever the stiffness
term matters (large dt, low Re, fine meshes, stretched elements).

``mu``/``dt``/``time_order`` enter only through the diagonal, so one
setup serves every viscosity and step size (they may be traced values).
"""

from __future__ import annotations

import flax.struct
import jax
from jax import lax
import jax.numpy as jnp
import numpy as np

from swirlfem_tpu.core.quadrature import differentiation_matrix_1d
from swirlfem_tpu.core.quadrature import Quadrature1D

_HP = lax.Precision.HIGHEST


@flax.struct.dataclass
class ElementFDM:
  """Static data of the element-local FDM preconditioner.

  A pytree, so it passes through ``spmd_map`` like the mesh itself: on a
  partitioned solver every leaf carries a leading partition axis (``zhat``
  and ``lam`` are tiled) and each shard sees its per-partition view.

  Attributes:
    zhat: ``(k, k)`` shared M-orthonormal GLL eigenbasis.
    lam: ``(k,)`` reference-element eigenvalues (ascending, lam[0] ~ 0).
    rho: ``(num_elements,)`` volume-weighted mean jacdet (mass coeff).
    g: ``(num_elements, ndim)`` averaged per-axis stiffness coefficients.
    dtrue_mass: ``(num_elements, k^d)`` diag of the true element mass B_e.
    dtrue_stiff: ``(num_elements, k^d)`` diag of the true element
      stiffness A_e.
    wq_nd: ``(k^d,)`` tensor-product GLL weights (model mass diagonal).
    sdiag_nd: ``(ndim, k^d)`` per-axis model stiffness diagonals
      ``diag(Shat)_{i_a} * prod_{b!=a} w_{i_b}``.
  """

  zhat: jax.Array
  lam: jax.Array
  rho: jax.Array
  g: jax.Array
  dtrue_mass: jax.Array
  dtrue_stiff: jax.Array
  wq_nd: jax.Array
  sdiag_nd: jax.Array

  def inverse_diag(self, mu, dt, beta_k):
    """Per-element spectral inverse diagonal, shape (E, k, ..., k)."""
    d = self.g.shape[-1]
    lam = self.lam
    k = lam.shape[0]
    denom = (beta_k / dt) * self.rho.reshape((-1,) + (1,) * d)
    for a in range(d):
      lam_a = lam.reshape((1,) + (1,) * a + (k,) + (1,) * (d - 1 - a))
      denom = denom + mu * self.g[:, a].reshape((-1,) + (1,) * d) * lam_a
    return 1.0 / denom                                   # (E, k, .., k)


def build_element_fdm(sem) -> ElementFDM:
  """Builds :class:`ElementFDM` from a solver's velocity space.

  Host-side float64 setup: one k x k generalized eigenproblem plus
  volume-weighted averages of the velocity space's geometric factors
  (``jacdets``/``invjacs`` at the collocated GLL points); call outside
  ``jit`` on concrete arrays.  Works for unpartitioned and partitioned
  (stacked, sentinel-padded) solvers alike.
  """
  import scipy.linalg

  vspace = sem.velocity.vspace
  mesh = sem.velocity.mesh
  grid = mesh.gridpoints_1d
  k = grid.num_points
  d = mesh.ndim

  w1 = np.asarray(Quadrature1D.create_from_nodes_1d(grid).weights,
                  dtype=np.float64)
  dmat = np.asarray(differentiation_matrix_1d(grid), dtype=np.float64)
  s_hat = dmat.T @ np.diag(w1) @ dmat
  sq = np.sqrt(w1)
  lam, y = scipy.linalg.eigh(s_hat / sq[:, None] / sq[None, :])
  zhat = y / sq[:, None]                        # zhat^T diag(w1) zhat = I
  lam = np.maximum(lam, 0.0)                    # clip the ~0 Neumann mode

  # Volume-weighted average metric per element.  The velocity space is
  # collocated (quadrature = the GLL grid points), so jacdets/invjacs are
  # (..., E, Q=k^d) / (..., E, Q, d, d) with invjacs[..., j, a] = dr_a/dx_j
  # (core/fespace.py geometric factors).  Sentinel-padded element rows of
  # partitioned meshes produce garbage averages; those contributions are
  # masked inside gather/scatter and by the multiplicity weighting, and
  # the maximum() below keeps their diagonals finite.
  jacdets = np.asarray(vspace.jacdets, dtype=np.float64)   # (..., E, Q)
  invjacs = np.asarray(vspace.invjacs, dtype=np.float64)   # (..., E, Q, d, d)
  wq = w1  # tensor-product quadrature weights, flattened lexicographically
  for _ in range(d - 1):
    wq = (wq[..., None] * w1).reshape(-1)
  wsum = wq.sum()
  rho = np.einsum('...eq,q->...e', jacdets, wq) / wsum
  gaa = np.einsum('...eqja,...eqja->...eqa', invjacs, invjacs)
  g = np.einsum('...eqa,...eq,q->...ea', gaa, jacdets, wq) / wsum
  rho = np.maximum(rho, 1e-30)
  g = np.maximum(g, 0.0)

  # True element diagonals for the diagonal correction.  Collocated GLL:
  # local node n == quadrature point q, so diag(B_e) = jacdet * w and
  # diag(A_e)_n = sum_{q,j} (grad phi_n)_j(q)^2 jacdet_q w_q.  Chunked
  # over elements to bound the (E, Q, d, n) intermediate.
  gradmat = np.asarray(vspace.interpolator.interpolation_matrix_grad(),
                       dtype=np.float64)                 # (Q, n, d)
  dtrue_mass = jacdets * wq
  flat_jd = jacdets.reshape((-1,) + jacdets.shape[-2:])
  flat_ij = invjacs.reshape((-1,) + invjacs.shape[-4:])
  dstiff = np.empty_like(flat_jd)
  for part in range(flat_jd.shape[0]):
    for lo in range(0, flat_jd.shape[1], 512):
      sl = slice(lo, lo + 512)
      gp = np.einsum('qnd,eqjd->eqjn', gradmat, flat_ij[part, sl])
      dstiff[part, sl] = np.einsum('eqjn,eqjn,eq,q->en', gp, gp,
                                   flat_jd[part, sl], wq)
  dtrue_stiff = dstiff.reshape(jacdets.shape)

  sdiag = np.diag(s_hat)
  sdiag_nd = []
  for a in range(d):
    vecs = [w1] * d
    vecs[a] = sdiag
    acc = vecs[0]
    for v in vecs[1:]:
      acc = (acc[..., None] * v).reshape(-1)
    sdiag_nd.append(acc)
  sdiag_nd = np.stack(sdiag_nd)                          # (d, k^d)

  dtype = np.asarray(mesh.node_coords).dtype
  zhat = np.asarray(zhat, dtype=dtype)
  lam = np.asarray(lam, dtype=dtype)
  wq_nd = np.asarray(wq, dtype=dtype)
  sdiag_nd = np.asarray(sdiag_nd, dtype=dtype)
  lead = jacdets.shape[:-2]                     # () or (P,)
  if lead:  # partitioned: tile the shared tensors so spmd_map shards them
    zhat = np.broadcast_to(zhat, lead + zhat.shape).copy()
    lam = np.broadcast_to(lam, lead + lam.shape).copy()
    wq_nd = np.broadcast_to(wq_nd, lead + wq_nd.shape).copy()
    sdiag_nd = np.broadcast_to(sdiag_nd, lead + sdiag_nd.shape).copy()
  return ElementFDM(zhat=jnp.asarray(zhat), lam=jnp.asarray(lam),
                    rho=jnp.asarray(rho.astype(dtype)),
                    g=jnp.asarray(g.astype(dtype)),
                    dtrue_mass=jnp.asarray(dtrue_mass.astype(dtype)),
                    dtrue_stiff=jnp.asarray(dtrue_stiff.astype(dtype)),
                    wq_nd=jnp.asarray(wq_nd),
                    sdiag_nd=jnp.asarray(sdiag_nd))


def _tensor_apply(z, x, d):
  """Contracts ``z`` along each of the d tensor axes of (E, k, .., k, C)."""
  for a in range(d):
    x = jnp.moveaxis(
        jnp.tensordot(z, x, axes=([1], [1 + a]), precision=_HP), 0, 1 + a)
  return x


def element_fdm_viscous_preconditioner(sem, fdm: ElementFDM, mu, dt,
                                       time_order: int):
  """Returns the CG preconditioner ``M(r)`` for the viscous solve.

  ``r`` is the (possibly unassembled) nodal residual covector of shape
  ``(num_nodes, ndim)``; the result is a continuous (copy-consistent)
  interior vector.  Symmetric and PSD by construction (module docstring),
  so it is safe inside plain CG.  Usable under ``shard_map`` — the two
  exchanges ride the mesh's neighbor-limited collectives.
  """
  from swirlfem_tpu.nse.solver import bdfk_coeffs

  mesh = sem.velocity.mesh
  d = mesh.ndim
  k = mesh.gridpoints_1d.num_points
  beta_k = float(bdfk_coeffs(time_order)[-1])
  shift = beta_k / dt
  dinv = fdm.inverse_diag(mu, dt, beta_k)              # (E, k, .., k)

  # Per-slot weight T_e(q) = sqrt(dhat_e(q) / (D(q) c(q))): dhat is the
  # model diagonal, D the exchange-assembled true diagonal, c the dof
  # multiplicity.  Combines the diagonal correction D_e^{-1/2} (module
  # docstring) with a diagonally-weighted partition of unity, so that in
  # the mass-dominated limit (where Hhat_e^{-1} = diag(1/dhat_e) exactly,
  # the eigenbasis being complete) the whole Schwarz sum collapses to
  # sum_e T^2 / dhat = 1/(D c) * c = 1/D — the exact assembled Jacobi
  # projector, including across element-size jumps where plain counting
  # weights would overweight small-element local solves.
  d_true = shift * fdm.dtrue_mass + mu * fdm.dtrue_stiff    # (E, k^d)
  d_hat = (shift * fdm.rho[:, None] * fdm.wq_nd[None, :]
           + mu * jnp.einsum('ea,aq->eq', fdm.g, fdm.sdiag_nd,
                             precision=_HP))
  counts = mesh.exchange(mesh.scatter(
      jnp.ones(mesh.elements.shape, dtype=dinv.dtype)))
  d_asm = mesh.exchange(mesh.scatter(d_true))
  dc = mesh.gather(d_asm * counts)                          # (E, k^d)
  t_w = jnp.where(dc > 0, jnp.sqrt(d_hat / jnp.where(dc > 0, dc, 1.0)), 0.0)
  mask = sem.velocity.interior_mask                    # (n, 1)

  def apply_m(r):
    y = sem.velocity.exchange(r)
    yl = sem.velocity.gather(y) * t_w[..., None]       # (E, k^d, C)
    yl = yl.reshape((yl.shape[0],) + (k,) * d + (yl.shape[-1],))
    yl = _tensor_apply(fdm.zhat.T, yl, d)
    yl = yl * dinv[..., None]
    yl = _tensor_apply(fdm.zhat, yl, d)
    yl = yl.reshape((yl.shape[0], -1, yl.shape[-1])) * t_w[..., None]
    y = sem.velocity.scatter(yl)
    return mask * sem.velocity.exchange(y)

  return apply_m
