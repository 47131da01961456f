"""Distributed two-level Schwarz pressure preconditioner (partitioned meshes).

The partitioned counterpart of `ops.schwarz`: the same exact probed local
blocks + probed Galerkin coarse solve, applied per-partition under
``shard_map`` with neighbor-limited communication.  Setup (probing, f64
block inversion, coarse assembly) runs on an UNPARTITIONED host twin of the
solver — it is identical math to the single-device setup, and mesh setup is
host-side in this framework anyway — and the resulting operators are then
*sharded by partition* into a pytree the user passes through ``spmd_map``
as the ``pressure_preconditioner`` argument of ``stokes_one_step``.

Communication per apply (all sized by the partition *interface*, not the
mesh):

* one ``all_gather`` of the interface pressure dofs (the one-layer halo the
  overlapping locals and the block-sparse E matvec read from neighbor
  partitions),
* one ``psum`` of interface-sized overlap contributions written back to
  their owners (the transpose of the halo gather; absent with overlap=0),
* one ``all_gather`` of the per-element coarse residual (``nc`` floats per
  element).

This replaces the reference's psum-over-all-shared-dofs exchange pattern
(``swirl_fem/core/gather_scatter.py:241-248``) with interface-proportional
collectives, and the reference has no pressure preconditioner at all
(``swirl_fem/navier_stokes/navier_stokes.py:449-452``).

The returned `DistributedSchwarz` is a flax.struct pytree whose leaves
carry a leading partition axis: pass it *as an argument* into the
``spmd_map``-wrapped step (like the partitioned `StokesSEM` itself) so each
device receives its shard.  It is callable (`M(r)`) and exposes
``fast_matvec`` (the distributed assembled block-sparse ``E`` apply) plus
``has_nullspace``, matching the single-device preconditioner protocol.
"""

from __future__ import annotations

from typing import Any

import flax.struct
import jax
from jax import lax
import jax.numpy as jnp
import numpy as np

from swirlfem_tpu.core import topology
from swirlfem_tpu.core.quadrature import interpolation_matrix_1d
from swirlfem_tpu.core.quadrature import Nodes1D
from swirlfem_tpu.core.quadrature import NodeType
from swirlfem_tpu.ops import schwarz as _schwarz


@flax.struct.dataclass
class DistributedSchwarz:
  """Per-partition Schwarz apply; leaves have a leading partition axis.

  Inside ``spmd_map`` each partition sees its own slice (the leading axis
  is consumed by shard_map + vmap).  All index tables point into the
  concatenated buffer ``[local r (n_loc) | all-gathered interface (P * I) |
  zero pad (1)]``.
  """

  # -- locals ---------------------------------------------------------------
  binv: jax.Array          # (E, next, next) inverted (extended) blocks
  ext_buf_idx: jax.Array   # (E, next) gather index into the concat buffer
  w_ext: jax.Array         # (E, next) count weights (0 at dead slots)
  ext_local_idx: jax.Array  # (E, next) scatter index into (n_loc + 1)
  ext_contrib_idx: jax.Array  # (E, next) scatter index into (P * I + 1)
  # -- interface ------------------------------------------------------------
  iface_idx: jax.Array     # (I,) local dof index of each interface slot
  iface_valid: jax.Array   # (I,) 1.0 where the slot is real
  # -- coarse ---------------------------------------------------------------
  stencil: jax.Array       # (mloc, nc) per-element coarse prolongation
  # p1dg: (E * nc, P * E * nc) inverse rows for this partition's coarse
  # dofs; vertex: (nv_max, nv) inverse rows for this partition's vertices.
  inv_c_rows: jax.Array
  valid_el: jax.Array      # (E,) 1.0 for real (non-padded) elements
  # -- assembled block-sparse E (fast_matvec) --------------------------------
  rb: jax.Array            # (E, mloc, width * mloc) row blocks
  nbr_buf_idx: jax.Array   # (E, width * mloc) gather into the concat buffer
  # -- vertex coarse only (None under p1dg) -----------------------------------
  cvid_scatter: Any = None  # (E, nc) global vertex id (nv = dead slot)
  cvid_gather: Any = None   # (E, nc) index into this partition's inv rows
  # -- vertex-cheb coarse only: matrix-free Chebyshev solve (ops.coarse_cheb),
  # leaves tiled over partitions; every partition runs the identical
  # replicated solve after the one nv-sized psum (deterministic, tiny).
  cheb: Any = None
  # -- static ---------------------------------------------------------------
  axis_name: str = flax.struct.field(pytree_node=False, default='part')
  overlap: int = flax.struct.field(pytree_node=False, default=1)
  has_nullspace: bool = flax.struct.field(pytree_node=False, default=True)
  num_partitions: int = flax.struct.field(pytree_node=False, default=1)
  iface_size: int = flax.struct.field(pytree_node=False, default=0)
  mloc: int = flax.struct.field(pytree_node=False, default=0)
  coarse_kind: str = flax.struct.field(pytree_node=False, default='p1dg')
  coarse_nv: int = flax.struct.field(pytree_node=False, default=0)

  def _halo_buffer(self, r):
    iface = r[self.iface_idx] * self.iface_valid.astype(r.dtype)
    allif = lax.all_gather(iface, self.axis_name)          # (P, I)
    return jnp.concatenate(
        [r, allif.reshape(-1), jnp.zeros(1, dtype=r.dtype)])

  def _coarse_apply(self, r_el):
    hp = lax.Precision.HIGHEST
    rc_el = jnp.einsum('nc,en->ec', self.stencil,
                       r_el.astype(self.stencil.dtype), precision=hp)
    rc_el = rc_el * self.valid_el[:, None].astype(rc_el.dtype)
    if self.coarse_kind in ('vertex', 'vertex-cheb'):
      # Assembled Q1 restriction: scatter-add into the nv-sized vertex
      # vector, one psum (size nv, vs all_gather of P*E*nc for p1dg),
      # then this partition's inverse rows + gather-prolongation.
      rc = jnp.zeros(self.coarse_nv + 1, dtype=rc_el.dtype)
      rc = rc.at[self.cvid_scatter].add(rc_el)[:self.coarse_nv]
      rc = lax.psum(rc, self.axis_name)
      if self.coarse_kind == 'vertex-cheb':
        yc_full = self.cheb.solve(rc).astype(rc.dtype)      # (nv,)
        yc_pad = jnp.concatenate([yc_full, jnp.zeros(1, yc_full.dtype)])
        yc_el = yc_pad[self.cvid_scatter]                   # (E, nc)
      else:
        yc_v = jnp.matmul(self.inv_c_rows, rc, precision=hp)  # (nv_max,)
        yc_el = yc_v[self.cvid_gather]                      # (E, nc)
    else:
      all_rc = lax.all_gather(rc_el, self.axis_name)       # (P, E, nc)
      yc = jnp.matmul(self.inv_c_rows, all_rc.reshape(-1), precision=hp)
      yc_el = yc.reshape(r_el.shape[0], -1)                # (E, nc)
    return jnp.einsum('nc,ec->en', self.stencil, yc_el, precision=hp)

  def __call__(self, r):
    hp = lax.Precision.HIGHEST
    num_e = self.binv.shape[0]
    n_loc = r.shape[0]
    r_el = r.reshape(num_e, self.mloc)
    cy = self._coarse_apply(r_el)                          # (E, mloc)
    cy = cy * self.valid_el[:, None].astype(cy.dtype)
    buf = self._halo_buffer(r)
    w = self.w_ext.astype(self.binv.dtype)
    r_ext = buf[self.ext_buf_idx].astype(self.binv.dtype) * w
    y_ext = jnp.einsum('epq,eq->ep', self.binv, r_ext, precision=hp) * w
    # Contributions to locally-owned dofs (incl. this partition's neighbor
    # elements) land directly; remote-owned ones are summed back to their
    # owner's interface slots with one psum.
    y = jnp.zeros(n_loc + 1, dtype=y_ext.dtype)
    y = y.at[self.ext_local_idx].add(y_ext)[:n_loc]
    if self.overlap:
      p_total = self.num_partitions * self.iface_size
      contrib = jnp.zeros(p_total + 1, dtype=y_ext.dtype)
      contrib = contrib.at[self.ext_contrib_idx].add(y_ext)[:p_total]
      total = lax.psum(contrib, self.axis_name)
      mine = lax.dynamic_slice(
          total, (lax.axis_index(self.axis_name) * self.iface_size,),
          (self.iface_size,))
      y = y.at[self.iface_idx].add(mine * self.iface_valid.astype(y.dtype))
    return (y + cy.reshape(-1).astype(y.dtype)).astype(r.dtype)

  def fast_matvec(self, p):
    """Distributed assembled block-sparse ``E p`` (one halo all_gather)."""
    hp = lax.Precision.HIGHEST
    buf = self._halo_buffer(p)
    pn = buf[self.nbr_buf_idx].astype(self.rb.dtype)       # (E, width*mloc)
    y = jnp.einsum('eiv,ev->ei', self.rb, pn, precision=hp)
    y = y * self.valid_el[:, None].astype(y.dtype)
    return y.reshape(-1).astype(p.dtype)


def build_distributed_schwarz(sem_u, premesh, boundary_conditions,
                              dt: float, time_order: int, axis_name: str,
                              coarse: str = 'auto',
                              max_coarse_dofs: int = 16000,
                              overlap='auto') -> DistributedSchwarz:
  """Distributed Schwarz preconditioner for a partitioned pressure solve.

  Args:
    sem_u: the UNPARTITIONED twin `StokesSEM` (same premesh with
      ``partitions=None``, same order/BCs/coord_transform) — supplies the
      float64 operator for probing, exactly as the single-device setup.
    premesh: the order-1 premesh WITH ``partitions`` (the one the
      partitioned solver was created from).
    boundary_conditions: as given to ``StokesSEM.create``.
    axis_name: the shard_map axis of the partitioned solver.
    coarse: ``'p1dg'`` (per-element bilinear GL Galerkin coarse; one
      all_gather of ``P * E * nc`` floats per apply) | ``'vertex'``
      (continuous Q1 FEM coarse on the order-1 vertices; one psum of
      ``nv`` floats per apply — the very-large-mesh choice, as in
      `ops.schwarz`) | ``'vertex-cheb'`` (same Q1 coarse solved
      matrix-free by fixed-degree Chebyshev, `ops.coarse_cheb` — O(nnz)
      setup/memory; same nv-sized psum) | ``'auto'`` (p1dg while its
      dimension fits ``max_coarse_dofs``).
    max_coarse_dofs: cap on the dense coarse inverse ('auto' switch); a
      vertex coarse larger than this switches to vertex-cheb.
    overlap: 0 | 1 | 'auto' (1 in 2D, 0 otherwise), as in `ops.schwarz`.

  Returns:
    A `DistributedSchwarz` pytree (leaves stacked over partitions): pass it
    through ``spmd_map`` into ``stokes_one_step`` as the
    ``pressure_preconditioner``.
  """
  if not premesh.is_partitioned():
    raise ValueError('premesh must be partitioned')
  if coarse not in ('auto', 'p1dg', 'vertex', 'vertex-cheb'):
    raise ValueError(f'unknown coarse space {coarse!r}')

  pmesh = sem_u.pressure.pspace.mesh
  d = premesh.ndim
  m = pmesh.order + 1
  mloc = m ** d
  num_e = premesh.num_elements
  npn = pmesh.num_nodes
  dtype = sem_u.velocity_mass_diag.dtype
  rdtype = np.float32 if dtype == jnp.float32 else np.float64

  elements = np.asarray(pmesh.elements)
  if not np.array_equal(elements.reshape(-1), np.arange(npn)):
    raise NotImplementedError('expected element-contiguous DG pressure dofs')

  uid = _schwarz._vertex_unique_ids(premesh)
  el_uid = uid[premesh.elements]
  adj = _schwarz._element_adjacency(el_uid)
  if overlap == 'auto':
    overlap = 1 if d == 2 else 0

  # -- probing on the unpartitioned twin (identical to ops.schwarz) ---------
  matvec_batch = _schwarz._matvec64(sem_u, dt, time_order)
  colors2 = _schwarz._distance2_coloring(adj)
  diag_blocks, pairs = _schwarz._probe_element_blocks(
      matvec_batch, elements, colors2, npn, adj=adj)
  if overlap:
    if overlap != 1:
      raise NotImplementedError('only overlap=1 extended locals')
    ext_nodes, ext_owner, ext_local = _schwarz._extended_tables(
        el_uid, elements, m, d)
    blocks = _schwarz._extended_blocks(pairs, adj, ext_owner, ext_local)
    count = np.zeros(npn)
    np.add.at(count, ext_nodes[ext_nodes >= 0], 1.0)
    wglob = 1.0 / np.sqrt(np.maximum(count, 1.0))
    w_ext = np.where(ext_nodes >= 0, wglob[np.clip(ext_nodes, 0, None)], 0.0)
  else:
    own = np.arange(mloc)
    ext_nodes = elements.copy()
    ext_owner = np.repeat(np.arange(num_e)[:, None], mloc, axis=1)
    ext_local = np.broadcast_to(own, (num_e, mloc)).copy()
    blocks = diag_blocks
    w_ext = np.ones((num_e, mloc))
  binv = np.linalg.inv(blocks)
  binv = 0.5 * (binv + np.swapaxes(binv, 1, 2))
  next_loc = binv.shape[1]

  has_nullspace = not _schwarz._has_outflow(premesh, boundary_conditions, uid)

  # -- coarse (p1dg probed Galerkin or Q1 vertex FEM, as in ops.schwarz) -----
  nv = int(uid.max()) + 1
  if coarse == 'auto':
    coarse = 'p1dg' if (2 ** d) * num_e <= max_coarse_dofs else 'vertex'
  cheb_u = None
  if coarse == 'p1dg':
    stencil, inv_c = _schwarz._p1dg_coarse(matvec_batch, elements, adj,
                                           colors2, pmesh, d, npn,
                                           has_nullspace)
  else:
    stencil = _schwarz._vertex_stencil(pmesh, d)
    if coarse == 'vertex-cheb' or nv > max_coarse_dofs:
      # Beyond the dense-inverse range: matrix-free Chebyshev coarse
      # (O(nnz) setup/memory; see ops.coarse_cheb).  Same nv-sized psum
      # per apply; the solve itself is replicated local work.
      from swirlfem_tpu.ops.coarse_cheb import build_cheb_vertex_coarse
      cheb_u = build_cheb_vertex_coarse(
          premesh.replace(partitions=None), boundary_conditions, uid,
          el_uid, nv, dt, time_order, has_nullspace, rdtype=rdtype)
      inv_c = None
      coarse = 'vertex-cheb'
    else:
      inv_c = _schwarz._vertex_coarse_inverse(
          premesh.replace(partitions=None), boundary_conditions, uid,
          el_uid, nv, dt, time_order, has_nullspace)
  nc = stencil.shape[1]

  # -- partition layout -------------------------------------------------------
  rows = topology.group_by_partitions(premesh.partitions)   # (P, E_max)
  num_p, e_max = rows.shape
  n_loc = e_max * mloc
  valid_el = (rows != topology.SENTINEL)
  part_of = np.asarray(premesh.partitions)
  pos_in_part = np.zeros(num_e, dtype=np.int64)
  for q in range(num_p):
    sel = rows[q][valid_el[q]]
    pos_in_part[sel] = np.arange(len(sel))

  def to_part_flat(gdof):
    g, j = divmod(int(gdof), mloc)
    return int(part_of[g]), int(pos_in_part[g] * mloc + j)

  # Interface sets: q-local dofs read by any other partition — the halo of
  # the extended locals plus whole vertex-neighbor elements (fast_matvec).
  iface_sets: list[set[int]] = [set() for _ in range(num_p)]
  for p in range(num_p):
    for g in rows[p][valid_el[p]]:
      for slot, gdof in enumerate(ext_nodes[g]):
        if gdof < 0:
          continue
        q, lf = to_part_flat(gdof)
        if q != p:
          iface_sets[q].add(lf)
      for nb in adj[g]:
        q = int(part_of[nb])
        if q != p:
          base = int(pos_in_part[nb]) * mloc
          iface_sets[q].update(range(base, base + mloc))
  iface_lists = [sorted(s) for s in iface_sets]
  iface_n = max((len(s) for s in iface_lists), default=0)
  iface_n = max(iface_n, 1)
  iface_idx = np.zeros((num_p, iface_n), dtype=np.int64)
  iface_valid = np.zeros((num_p, iface_n))
  iface_pos = [dict() for _ in range(num_p)]
  for q in range(num_p):
    for i, lf in enumerate(iface_lists[q]):
      iface_idx[q, i] = lf
      iface_valid[q, i] = 1.0
      iface_pos[q][lf] = i

  # Buffer layout per partition p: [local (n_loc) | iface (P * I) | zero].
  dead_buf = n_loc + num_p * iface_n
  dead_local = n_loc
  dead_contrib = num_p * iface_n

  ext_buf_idx = np.full((num_p, e_max, next_loc), dead_buf, dtype=np.int64)
  w_ext_p = np.zeros((num_p, e_max, next_loc))
  ext_local_idx = np.full((num_p, e_max, next_loc), dead_local,
                          dtype=np.int64)
  ext_contrib_idx = np.full((num_p, e_max, next_loc), dead_contrib,
                            dtype=np.int64)
  binv_p = np.tile(np.eye(next_loc), (num_p, e_max, 1, 1))
  valid_el_f = valid_el.astype(np.float64)

  for p in range(num_p):
    for l, g in enumerate(rows[p][valid_el[p]]):
      binv_p[p, l] = binv[g]
      for slot, gdof in enumerate(ext_nodes[g]):
        if gdof < 0:
          continue
        q, lf = to_part_flat(gdof)
        w_ext_p[p, l, slot] = w_ext[g, slot]
        if q == p:
          ext_buf_idx[p, l, slot] = lf
          ext_local_idx[p, l, slot] = lf
        else:
          ext_buf_idx[p, l, slot] = n_loc + q * iface_n + iface_pos[q][lf]
          ext_contrib_idx[p, l, slot] = q * iface_n + iface_pos[q][lf]

  # -- assembled block-sparse E, partition-sharded ----------------------------
  nbrs_sorted = [sorted(adj[e]) for e in range(num_e)]
  width = 1 + max((len(x) for x in nbrs_sorted), default=0)
  rb = np.zeros((num_p, e_max, mloc, width * mloc))
  nbr_buf_idx = np.full((num_p, e_max, width * mloc), dead_buf,
                        dtype=np.int64)
  for p in range(num_p):
    for l, g in enumerate(rows[p][valid_el[p]]):
      cols = [g] + nbrs_sorted[g]
      for k, n in enumerate(cols):
        rb[p, l, :, k * mloc:(k + 1) * mloc] = pairs[(g, n)]
        q = int(part_of[n])
        base = int(pos_in_part[n]) * mloc
        for j in range(mloc):
          if q == p:
            nbr_buf_idx[p, l, k * mloc + j] = base + j
          else:
            nbr_buf_idx[p, l, k * mloc + j] = (
                n_loc + q * iface_n + iface_pos[q][base + j])

  # -- coarse inverse rows, partition-sharded ---------------------------------
  cvid_scatter = cvid_gather = None
  if coarse == 'p1dg':
    # Column order follows the all_gathered (q, l, i) layout; padded
    # element slots get zero columns/rows.
    perm_cols = np.full(num_p * e_max * nc, -1, dtype=np.int64)
    for q in range(num_p):
      for l, g in enumerate(rows[q][valid_el[q]]):
        for i in range(nc):
          perm_cols[(q * e_max + l) * nc + i] = g * nc + i
    inv_c_rows = np.zeros((num_p, e_max * nc, num_p * e_max * nc))
    col_valid = perm_cols >= 0
    for p in range(num_p):
      for l, g in enumerate(rows[p][valid_el[p]]):
        block = inv_c[g * nc:(g + 1) * nc]                  # (nc, E*nc)
        inv_c_rows[p, l * nc:(l + 1) * nc][:, col_valid] = (
            block[:, perm_cols[col_valid]])
  elif coarse == 'vertex-cheb':
    # Matrix-free coarse: every partition runs the replicated Chebyshev
    # solve on the psum-assembled rc, then gathers its elements' vertex
    # values straight by global id (dead slot nv for padded elements).
    inv_c_rows = np.zeros((num_p, 1, 1))
    cvid_scatter = np.full((num_p, e_max, nc), nv, dtype=np.int64)
    for p in range(num_p):
      for l, g in enumerate(rows[p][valid_el[p]]):
        cvid_scatter[p, l] = el_uid[g]
  else:
    # Vertex coarse: each partition keeps the inverse rows of the unique
    # vertices its elements touch; restriction scatters into the global
    # nv-sized vector (dead slot nv for padded elements) and one psum
    # assembles it; prolongation gathers from the local rows.
    part_vids = []
    for p in range(num_p):
      els = rows[p][valid_el[p]]
      part_vids.append(np.unique(el_uid[els]) if len(els) else
                       np.zeros(0, dtype=el_uid.dtype))
    nv_max = max(1, max(len(v) for v in part_vids))
    inv_c_rows = np.zeros((num_p, nv_max, nv))
    cvid_scatter = np.full((num_p, e_max, nc), nv, dtype=np.int64)
    cvid_gather = np.zeros((num_p, e_max, nc), dtype=np.int64)
    for p in range(num_p):
      vids = part_vids[p]
      inv_c_rows[p, :len(vids)] = inv_c[vids]
      pos = {int(v): i for i, v in enumerate(vids)}
      for l, g in enumerate(rows[p][valid_el[p]]):
        cvid_scatter[p, l] = el_uid[g]
        cvid_gather[p, l] = [pos[int(v)] for v in el_uid[g]]

  def dev(x, dt_=None):
    return jnp.asarray(np.ascontiguousarray(x),
                       dtype=dt_ if dt_ is not None else None)

  return DistributedSchwarz(
      binv=dev(binv_p, rdtype),
      ext_buf_idx=dev(ext_buf_idx),
      w_ext=dev(w_ext_p, rdtype),
      ext_local_idx=dev(ext_local_idx),
      ext_contrib_idx=dev(ext_contrib_idx),
      iface_idx=dev(iface_idx),
      iface_valid=dev(iface_valid, rdtype),
      stencil=dev(np.tile(stencil, (num_p, 1, 1)), rdtype),
      inv_c_rows=dev(inv_c_rows, rdtype),
      valid_el=dev(valid_el_f, rdtype),
      cvid_scatter=None if cvid_scatter is None else dev(cvid_scatter),
      cvid_gather=None if cvid_gather is None else dev(cvid_gather),
      cheb=None if cheb_u is None else jax.tree.map(
          lambda x: jnp.broadcast_to(x, (num_p,) + x.shape), cheb_u),
      rb=dev(rb, rdtype),
      nbr_buf_idx=dev(nbr_buf_idx),
      axis_name=axis_name,
      overlap=int(overlap),
      has_nullspace=has_nullspace,
      num_partitions=num_p,
      iface_size=iface_n,
      mloc=mloc,
      coarse_kind=coarse,
      coarse_nv=nv)
