"""Assembled element-block operators for unstructured meshes.

At benchmark mesh sizes (hundreds to a few thousand elements) a TPU NSE
step is *kernel-count* bound, not FLOP bound: the matrix-free operator
applies are chains of ~15 small gather/einsum/scatter kernels at ~0.1 ms
launch overhead each (measured 3.05 ms per pressure-Schur apply on the
912-element order-6 cylinder mesh — the dominant cost of the step).  This
module collapses each hot operator into ONE batched block matmul plus a
gather, trading a few extra MFLOPs (which the MXU does for free at these
sizes) for an order-of-magnitude fewer kernel launches.

Two operators are assembled:

* **Block-sparse pressure Schur** ``E = D Q D^T``: the pressure space is
  discontinuous, so E's *rows* partition by element, and E couples only
  vertex-adjacent element pairs.  The exact blocks come from the same
  graph-colored probing pass the two-level Schwarz preconditioner runs
  (`ops.schwarz`); assembly here is pure layout.  The apply is
  ``gather neighbor dofs -> one (E, m^d, K m^d) batched matmul``.

* **Element Helmholtz** ``H = (beta_k/dt) B + mu A`` on the continuous
  velocity space: the element blocks are assembled directly from the
  geometric factors (no probing needed; on collocated GLL the element
  mass is diagonal), and the apply is the standard direct-stiffness
  ``gather -> (E, n^d, n^d) batched matmul -> scatter`` — identical math
  to the sum-factorized `local_covector` path, ~4x the FLOPs, a fraction
  of the kernels.

The reference has no counterpart (its operators are always matrix-free
Kronecker einsums, ``swirl_fem/core/fespace.py:406-471``); on CPUs the
matrix-free form wins, on TPUs at these sizes the assembled form does.
Both assemble in float64 on the host (f32 assembly noise lesson from
`ops.dense_schur`) and apply in the solver dtype at HIGHEST precision.
"""

from __future__ import annotations

import flax.struct
import jax
from jax import lax
import jax.numpy as jnp
import numpy as np


def build_block_schur_matvec(pairs, adj, elements: np.ndarray,
                             num_nodes: int, pmesh, dtype):
  """Block-sparse assembled ``E`` apply from probed neighbor-pair blocks.

  Args:
    pairs: ``pairs[(a, b)][i, j] = E[(a, i), (b, j)]`` for every ordered
      vertex-adjacent pair plus diagonals (from
      ``ops.schwarz._probe_element_blocks`` with ``adj`` given).
    adj: vertex-sharing element adjacency (list of sets).
    elements: ``(E, m^d)`` pressure element->node table.
    num_nodes: number of pressure nodes.
    pmesh: the pressure mesh (used only for its scatter when the
      element table is not an iota).
    dtype: apply dtype (blocks are stored in this dtype).

  Returns:
    ``matvec(p)`` computing ``E p`` as one gather + one batched matmul.
  """
  num_e, mloc = elements.shape
  nbrs = [sorted(adj[e]) for e in range(num_e)]
  width = 1 + max((len(x) for x in nbrs), default=0)
  nbr_table = np.full((num_e, width), -1, dtype=np.int64)
  nbr_table[:, 0] = np.arange(num_e)
  rowblocks = np.zeros((num_e, mloc, width, mloc))
  for e in range(num_e):
    rowblocks[e, :, 0, :] = pairs[(e, e)]
    for k, n in enumerate(nbrs[e], start=1):
      nbr_table[e, k] = n
      rowblocks[e, :, k, :] = pairs[(e, n)]

  rb = jnp.asarray(
      np.ascontiguousarray(rowblocks.reshape(num_e, mloc, width * mloc)),
      dtype=dtype)
  nbr_dev = jnp.asarray(np.clip(nbr_table, 0, None))
  valid = jnp.asarray((nbr_table >= 0).astype(np.float32)[..., None])
  elements_dev = jnp.asarray(elements)
  el_is_iota = bool(
      np.array_equal(elements.reshape(-1), np.arange(num_nodes)))

  hp = lax.Precision.HIGHEST

  def matvec(p):
    if el_is_iota:
      p_el = p.reshape(num_e, mloc)
    else:
      p_el = p[elements_dev]
    pn = p_el[nbr_dev] * valid.astype(p_el.dtype)      # (E, K, m^d)
    y = jnp.einsum('eiv,ev->ei', rb, pn.reshape(num_e, -1).astype(rb.dtype),
                   precision=hp).astype(p.dtype)
    if el_is_iota:
      return y.reshape(-1)
    # DG pressure: element rows are disjoint, so scatter-add == write.
    return pmesh.scatter(y)

  return matvec


def assemble_element_helmholtz(sem, mu, dt, time_order: int) -> np.ndarray:
  """Float64 element blocks of ``H = (beta_k/dt) B + mu A``, ``(E, n, n)``.

  Assembled from the velocity space's geometric factors:
  ``A_e[m, n] = sum_q w_q |J| (grad phi_m . grad phi_n)(q)`` with physical
  gradients ``g = G^T (invjac)``; the collocated-GLL element mass is the
  diagonal ``w_q |J|_q``.  Equal (to rounding) to the matrix-free
  ``scatter(A_local(gather(.)))`` operator of `nse.solver.StokesSEM.A`.
  """
  from swirlfem_tpu.nse.solver import bdfk_coeffs

  vspace = sem.velocity.vspace
  gradmat = np.asarray(vspace.interpolator.interpolation_matrix_grad(),
                       dtype=np.float64)                       # (Q, n, d)
  weights = np.asarray(vspace.quadrature.weights_nd(sem.velocity.mesh.ndim),
                       dtype=np.float64)                       # (Q,)
  invjacs = np.asarray(vspace.invjacs, dtype=np.float64)       # (E, Q, j, i)
  jacdets = np.asarray(vspace.jacdets, dtype=np.float64)       # (E, Q)
  # Physical gradient of basis n along j at quad q.
  g = np.einsum('qnd,eqjd->eqjn', gradmat, invjacs)
  a_e = np.einsum('eqjm,eqjn,eq,q->emn', g, g, jacdets, weights,
                  optimize=True)
  beta_k = float(bdfk_coeffs(time_order)[-1])
  h_e = mu * a_e
  # The generic `StokesSEM.B` is the LUMPED mass diag(B_local(ones)), i.e.
  # element row sums — equal to the diagonal on collocated GLL, but match
  # it exactly for any quadrature.
  interp = np.asarray(vspace.interpolator.interpolation_matrix(),
                      dtype=np.float64)                        # (Q, n)
  m_e = np.einsum('qm,qn,eq,q->emn', interp, interp, jacdets, weights,
                  optimize=True)
  idx = np.arange(h_e.shape[1])
  h_e[:, idx, idx] += (beta_k / dt) * m_e.sum(axis=-1)
  return h_e


def assemble_divergence_blocks(sem) -> np.ndarray:
  """Float64 element blocks of the mixed form ``b(v, q) = int div(v) q``.

  Returns ``(E, m^d, n^d, d)`` with ``D_e[i, n, k] = sum_q w_q |J|_q
  psi_i(q) (d phi_n / d x_k)(q)`` — the element action of `StokesSEM.D`;
  its transpose is exactly `StokesSEM.Dt` (the assembled pair is an exact
  adjoint pair by construction, unlike two separately-rounded
  matrix-free applies).  Uses the isoparametric shared geometry (both
  spaces integrate on the velocity GLL rule).
  """
  vspace = sem.velocity.vspace
  pspace = sem.pressure.pspace
  ndim = sem.velocity.mesh.ndim
  gradmat = np.asarray(vspace.interpolator.interpolation_matrix_grad(),
                       dtype=np.float64)                       # (Q, n, d)
  pinterp = np.asarray(pspace.interpolator.interpolation_matrix(),
                       dtype=np.float64)                       # (Q, m)
  weights = np.asarray(vspace.quadrature.weights_nd(ndim), dtype=np.float64)
  # As in the generic `D`: the divergence uses the VELOCITY space's
  # inverse Jacobians, the integration measure the PRESSURE space's
  # (identical arrays under isoparametric sharing on curved meshes, equal
  # to rounding on bilinear-geometry meshes).
  invjacs = np.asarray(vspace.invjacs, dtype=np.float64)       # (E, Q, j, i)
  jacdets = np.asarray(pspace.jacdets, dtype=np.float64)       # (E, Q)
  g = np.einsum('qnd,eqjd->eqjn', gradmat, invjacs)  # phys grad, dir j
  return np.einsum('qi,eqkn,eq,q->eink', pinterp, g, jacdets, weights,
                   optimize=True)


@flax.struct.dataclass
class AssembledMixed:
  """Assembled mixed-divergence blocks, held as a `StokesSEM` pytree field.

  A pytree so ``jax.device_put(sem, device)`` moves the blocks along with
  the rest of the solver state.  ``D``/``Dt`` are exact transposes of the
  same block tensor.
  """

  # Flattened (E, m^d, n^d * d): the 3D batched-matmul layout XLA lowers
  # to one clean kernel (the 4D `eink` einsum forms lower pathologically).
  d_blocks: jax.Array
  ndim: int = flax.struct.field(pytree_node=False, default=2)
  el_is_iota: bool = flax.struct.field(pytree_node=False, default=False)

  def D(self, vmesh, pmesh, u):
    """Divergence: velocity ``(N, d)`` or tuple -> pressure ``(Np,)``."""
    hp = lax.Precision.HIGHEST
    comps = (u if isinstance(u, tuple)
             else tuple(u[..., i] for i in range(u.shape[-1])))
    num_e = self.d_blocks.shape[0]
    u_el = jnp.stack([vmesh.gather(c) for c in comps], axis=-1)  # (E, n, d)
    y = jnp.einsum('eiv,ev->ei', self.d_blocks,
                   u_el.reshape(num_e, -1).astype(self.d_blocks.dtype),
                   precision=hp).astype(u_el.dtype)
    if self.el_is_iota:
      return y.reshape(-1)
    # DG pressure: element rows are disjoint, so scatter-add == write.
    return pmesh.scatter(y)

  def Dt(self, vmesh, pmesh, mask, p):
    """Gradient (exact transpose of D): pressure -> velocity, row-masked."""
    hp = lax.Precision.HIGHEST
    num_e, mloc = self.d_blocks.shape[:2]
    if self.el_is_iota:
      p_el = p.reshape(num_e, mloc)
    else:
      p_el = pmesh.gather(p)
    y = jnp.einsum('eiv,ei->ev', self.d_blocks,
                   p_el.astype(self.d_blocks.dtype),
                   precision=hp).astype(p.dtype)
    y = y.reshape(num_e, -1, self.ndim)
    return mask * jnp.stack(
        [vmesh.scatter(y[..., k]) for k in range(y.shape[-1])], axis=-1)


def build_assembled_mixed(sem) -> AssembledMixed:
  """Assembles the mixed blocks for `sem` (float64 host, solver dtype)."""
  blocks = assemble_divergence_blocks(sem)          # (E, m^d, n^d, d)
  num_e, mloc = blocks.shape[:2]
  ndim = blocks.shape[-1]
  pmesh = sem.pressure.pspace.mesh
  dtype = sem.velocity_mass_diag.dtype
  el_is_iota = bool(np.array_equal(
      np.asarray(pmesh.elements).reshape(-1), np.arange(pmesh.num_nodes)))
  return AssembledMixed(
      d_blocks=jnp.asarray(
          np.ascontiguousarray(blocks.reshape(num_e, mloc, -1)), dtype=dtype),
      ndim=ndim, el_is_iota=el_is_iota)


def build_helmholtz_matvec(sem, mu, dt, time_order: int):
  """Assembled viscous matvec: per-component tuple or ``(N, d)`` arrays.

  Returns a callable equal (to rounding) to the generic
  ``u -> mask * ((beta_k/dt) B u + mu A u)`` but applied as one
  ``(E, n^d, n^d)`` batched matmul between a gather and a scatter.
  """
  h_e = assemble_element_helmholtz(sem, mu, dt, time_order)
  vmesh = sem.velocity.vspace.mesh
  dtype = sem.velocity_mass_diag.dtype
  hb = jnp.asarray(np.ascontiguousarray(h_e), dtype=dtype)
  hp = lax.Precision.HIGHEST
  mask1 = jnp.squeeze(sem.velocity.interior_mask, -1)

  def apply_component(u):
    u_el = vmesh.gather(u)                                   # (E, n^d)
    y = jnp.einsum('emn,en->em', hb, u_el.astype(hb.dtype),
                   precision=hp).astype(u.dtype)
    return mask1 * vmesh.scatter(y)

  def matvec(u):
    if isinstance(u, tuple):
      return tuple(apply_component(c) for c in u)
    return jnp.stack([apply_component(u[..., i])
                      for i in range(u.shape[-1])], axis=-1)

  return matvec
