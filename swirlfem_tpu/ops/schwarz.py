"""Two-level Schwarz pressure preconditioner for large unstructured meshes.

The pressure Schur operator ``E = D Q D^T`` of the P_N-P_{N-2} method is
spectrally a (scaled) Poisson operator.  On unstructured meshes beyond the
dense-inverse range (`ops.dense_schur`, ~20k dofs) the classical answer is
two-level additive Schwarz (Fischer JCP 1997; nek5000's pressure
preconditioner):

    M = sum_e R_e^T (E_ee)^{-1} R_e  +  R_c^T (R_c E R_c^T)^{+} R_c

* **Local solves**: the *exact* element-diagonal blocks ``E_ee`` of the
  Schur operator, extracted by graph-colored probing — elements are
  colored so no two vertex-adjacent elements share a color, and one
  batched ``E`` apply per (color, local basis) pair reads off entire block
  columns for every element of that color at once (≈ ``colors * m^d``
  operator applies total, independent of mesh size).  Blocks are inverted
  in float64 on the host and applied as one batched ``(E, m^d, m^d)``
  matmul.  The pressure space is discontinuous, so the element blocks are
  disjoint and this term is block-diagonal SPD — the optimal zero-overlap
  local solve, with none of the FDM approximation error on deformed or
  high-aspect elements.

* **Coarse solve** (kills the global/low-frequency modes CG is slowest
  on): a Galerkin restriction ``A_c = R_c E R_c^T`` onto a coarse space,
  assembled by the same colored-probing trick (distance-2 coloring, since
  the readout spreads to vertex-neighbor elements) and densely
  (pseudo-)inverted in float64.  Two coarse spaces:

  - ``'p1dg'`` (default): per-element bi/trilinear Gauss-Legendre
    pressure, dimension ``2^d * E`` — the p-multigrid-flavored choice;
  - ``'vertex'``: continuous Q1 on the order-1 premesh vertices,
    dimension = #vertices — smaller, used automatically when the p1dg
    space would exceed ``max_coarse_dofs``.

Both terms are SPD by construction, so the sum plugs into plain PCG — no
`near_exact` handling needed (unlike the exact inverses,
``linalg.cg.near_exact_solve``).

In 2D the local solves extend one GL layer into the face neighbors by
default (``overlap=1``): the exact *extended* blocks are assembled from
the same probing pass (plus recorded neighbor-pair blocks) and added
with count-weighted symmetric scaling — the full overlapping method of
Fischer (1997).

Measured on the Schaefer-Turek cylinder mesh (order 5, 228 elements, 3648
pressure dofs, tol 1e-7): plain projected CG 1250 iterations; FDM-local +
FEM-vertex coarse 106; exact blocks + vertex Galerkin 70; exact blocks +
p1dg Galerkin 48; with overlap-1 locals **23** (54x).  The reference has
no counterpart (its pressure CG is unpreconditioned,
``swirl_fem/navier_stokes/navier_stokes.py:449-452``).  Unlike the dense
inverse, setup cost and memory scale linearly with the element count.
"""

from __future__ import annotations

import jax
from jax import lax
import jax.numpy as jnp
import numpy as np

from swirlfem_tpu.core.bc import BCType
from swirlfem_tpu.core.quadrature import interpolation_matrix_1d
from swirlfem_tpu.core.quadrature import Nodes1D
from swirlfem_tpu.core.quadrature import NodeType


def _vertex_unique_ids(premesh):
  """Premesh vertex id -> dense unique id (periodic images folded)."""
  from swirlfem_tpu.core import topology
  node_indices = topology.unique_node_indices(
      np.arange(premesh.num_nodes, dtype=np.int32), premesh.periodic_links)
  _, uid = np.unique(node_indices, return_inverse=True)
  return uid.astype(np.int32)


def _element_adjacency(el_uid: np.ndarray) -> list[set[int]]:
  """Vertex-sharing element adjacency (E couples exactly these pairs)."""
  num_e = len(el_uid)
  vert2el: dict[int, list[int]] = {}
  for e in range(num_e):
    for v in el_uid[e]:
      vert2el.setdefault(int(v), []).append(e)
  adj = [set() for _ in range(num_e)]
  for els in vert2el.values():
    for a in els:
      for b in els:
        if a != b:
          adj[a].add(b)
  return adj


def _greedy_coloring(adj: list[set[int]]) -> np.ndarray:
  colors = -np.ones(len(adj), dtype=np.int64)
  for e in range(len(adj)):
    used = {colors[nb] for nb in adj[e]}
    c = 0
    while c in used:
      c += 1
    colors[e] = c
  return colors


def _distance2_coloring(adj: list[set[int]]) -> np.ndarray:
  adj2 = [set(a) for a in adj]
  for e, nbrs in enumerate(adj):
    for nb in nbrs:
      adj2[e] |= adj[nb]
    adj2[e].discard(e)
  return _greedy_coloring(adj2)


def _boundary_vertices(elements: np.ndarray, uid: np.ndarray,
                       ndim: int) -> np.ndarray:
  """Unique vertex ids on the domain boundary (faces used exactly once)."""
  idx = np.arange(2 ** ndim)
  faces = []
  for a in range(ndim):
    stride = 2 ** (ndim - 1 - a)
    for side in (0, 1):
      sel = idx[(idx // stride) % 2 == side]
      faces.append(np.sort(uid[elements[:, sel]], axis=1))
  faces = np.concatenate(faces, axis=0)
  _, inv, counts = np.unique(faces, axis=0, return_inverse=True,
                             return_counts=True)
  on_boundary = faces[counts[inv] == 1]
  return np.unique(on_boundary)


def _has_outflow(premesh, boundary_conditions, uid) -> bool:
  """True when some boundary vertex has no Dirichlet velocity BC."""
  dirichlet_vertices = set()
  for name, bc in (boundary_conditions or {}).items():
    bc_type = bc[0] if isinstance(bc, (tuple, list)) else bc
    if bc_type == BCType.DIRICHLET and name in premesh.physical_groups:
      dirichlet_vertices.update(
          uid[np.unique(premesh.physical_groups[name].reshape(-1))].tolist())
  boundary = _boundary_vertices(premesh.elements, uid, premesh.ndim)
  return bool(set(boundary.tolist()) - dirichlet_vertices)


def _matvec64(sem, dt: float, time_order: int):
  """Float64 host-side ``E`` apply (f32 probing noise would corrupt the
  inverted blocks — same lesson as ops.dense_schur)."""
  cpu = jax.local_devices(backend='cpu')[0]

  def _to64(x):
    if hasattr(x, 'dtype') and jnp.issubdtype(x.dtype, jnp.floating):
      return np.asarray(x, np.float64)
    return x

  with jax.default_device(cpu), jax.enable_x64(True):
    sem64 = jax.tree.map(_to64, jax.device_put(sem, cpu))

  def matvec(p):
    return sem64.E(p, dt=dt, time_order=time_order)

  def matvec_batch(ps, batch_size=32):
    with jax.default_device(cpu), jax.enable_x64(True):
      out = lax.map(matvec, jnp.asarray(ps, np.float64),
                    batch_size=min(batch_size, len(ps)))
    return np.asarray(out)

  return matvec_batch


def _probe_element_blocks(matvec_batch, elements: np.ndarray,
                          colors: np.ndarray, num_nodes: int,
                          adj: list[set[int]] | None = None):
  """Exact diagonal blocks ``E_ee`` via colored probing, float64.

  With `adj` given (requires a DISTANCE-2 coloring so neighbor readouts
  do not collide), also returns the off-diagonal neighbor-pair blocks
  ``pairs[(n, e)][i, j] = E[(n, i), (e, j)]`` for every vertex-adjacent
  ordered pair — the raw material for overlapping (extended) local
  blocks.
  """
  num_e, mloc = elements.shape
  blocks = np.zeros((num_e, mloc, mloc))
  pairs: dict[tuple[int, int], np.ndarray] = {}
  eye = np.eye(mloc)
  for c in range(int(colors.max()) + 1):
    sel = np.where(colors == c)[0]
    probes = np.zeros((mloc, num_nodes))
    probes[:, elements[sel]] = eye[:, None, :]
    out = matvec_batch(probes)               # (mloc, num_nodes)
    blocks[sel] = out[:, elements[sel]].transpose(1, 2, 0)
    if adj is not None:
      for e in sel:
        pairs[(e, e)] = blocks[e]
        for n in adj[e]:
          pairs[(n, e)] = out[:, elements[n]].T
  if adj is not None:
    return blocks, pairs
  return blocks


def _face_adjacency_2d(el_uid: np.ndarray):
  """Conforming-face adjacency with orientation for 2D quad meshes.

  Returns ``nbr[e][(a, s)] = (n, a_n, s_n, flip)`` for each element side
  (axis ``a``, end ``s``): the neighbor element, the neighbor's matching
  side, and whether the shared tangential direction is reversed.
  Corner indices are lexicographic with axis 0 slowest, so side (0, s)
  has corners ``(2s, 2s + 1)`` and side (1, s) corners ``(s, 2 + s)``,
  both listed in increasing tangential order.
  """
  side_corners = {(0, 0): (0, 1), (0, 1): (2, 3),
                  (1, 0): (0, 2), (1, 1): (1, 3)}
  by_face: dict[tuple, list] = {}
  for e in range(len(el_uid)):
    for (a, s), (clo, chi) in side_corners.items():
      ua, ub = int(el_uid[e, clo]), int(el_uid[e, chi])
      by_face.setdefault(tuple(sorted((ua, ub))), []).append(
          (e, a, s, (ua, ub)))
  nbr = [dict() for _ in range(len(el_uid))]
  for entries in by_face.values():
    if len(entries) != 2:
      continue  # boundary face (or nonconforming: unsupported)
    (e1, a1, s1, t1), (e2, a2, s2, t2) = entries
    flip = t1[0] != t2[0]
    nbr[e1][(a1, s1)] = (e2, a2, s2, flip)
    nbr[e2][(a2, s2)] = (e1, a1, s1, flip)
  return nbr


def _extended_index_tables(el_uid: np.ndarray, elements: np.ndarray, m: int):
  """Overlap-1 extended dof tables for 2D quad meshes.

  Extended locals per element: the ``m^2`` own GL dofs followed by the
  four one-layer strips gathered from face neighbors (each ``m`` dofs,
  listed in the owner's tangential order; -1 where the side is a domain
  boundary).  Returns ``(ext_nodes, ext_owner, ext_local)`` each shaped
  ``(E, m^2 + 4m)``: global pressure dof id, owner element (or -1), and
  the dof's local index within its owner.
  """
  num_e = len(elements)
  nbr = _face_adjacency_2d(el_uid)
  next_loc = m * m + 4 * m
  ext_nodes = -np.ones((num_e, next_loc), dtype=np.int64)
  ext_owner = -np.ones((num_e, next_loc), dtype=np.int64)
  ext_local = np.zeros((num_e, next_loc), dtype=np.int64)
  own = np.arange(m * m)
  for e in range(num_e):
    ext_nodes[e, :m * m] = elements[e]
    ext_owner[e, :m * m] = e
    ext_local[e, :m * m] = own
    for side_idx, (a, s) in enumerate(((0, 0), (0, 1), (1, 0), (1, 1))):
      if (a, s) not in nbr[e]:
        continue
      n, a_n, s_n, flip = nbr[e][(a, s)]
      # Neighbor's GL layer adjacent to the shared face: local indices
      # with axis a_n pinned at its near end, tangential running free.
      pin = (m - 1) if s_n == 1 else 0
      t = np.arange(m)
      if a_n == 0:
        layer = pin * m + t          # i0 = pin, i1 = t
      else:
        layer = t * m + pin          # i0 = t, i1 = pin
      if flip:
        layer = layer[::-1]
      sl = slice(m * m + side_idx * m, m * m + (side_idx + 1) * m)
      ext_nodes[e, sl] = elements[n][layer]
      ext_owner[e, sl] = n
      ext_local[e, sl] = layer
  return ext_nodes, ext_owner, ext_local


def _face_adjacency_3d(el_uid: np.ndarray):
  """Conforming-face adjacency for 3D hex meshes.

  Returns ``nbr[e][(a, s)] = (n, a_n, s_n)`` for each element face (axis
  ``a``, end ``s``): the neighbor element and its matching face, paired by
  the sorted unique ids of the four face corners.  No orientation
  transform is recorded: the extended tables are permutation-invariant
  (see `_extended_index_tables_3d`).  Corner indices are lexicographic
  with axis 0 slowest.
  """
  num_e = len(el_uid)
  d = 3

  def face_corner_ids(e, a, s):
    t1, t2 = [ax for ax in range(d) if ax != a]
    ids = []
    for p in (0, 1):
      for q in (0, 1):
        bits = [0] * d
        bits[a], bits[t1], bits[t2] = s, p, q
        ids.append(int(el_uid[e, bits[0] * 4 + bits[1] * 2 + bits[2]]))
    return ids

  by_face: dict[tuple, list] = {}
  for e in range(num_e):
    for a in range(d):
      for s in (0, 1):
        by_face.setdefault(tuple(sorted(face_corner_ids(e, a, s))),
                           []).append((e, a, s))
  nbr = [dict() for _ in range(num_e)]
  for entries in by_face.values():
    if len(entries) != 2:
      continue  # boundary face (or nonconforming: unsupported)
    (e1, a1, s1), (e2, a2, s2) = entries
    nbr[e1][(a1, s1)] = (e2, a2, s2)
    nbr[e2][(a2, s2)] = (e1, a1, s1)
  return nbr


def _extended_index_tables_3d(el_uid: np.ndarray, elements: np.ndarray,
                              m: int):
  """Overlap-1 extended dof tables for 3D hex meshes.

  Extended locals per element: the ``m^3`` own GL dofs followed by six
  one-layer ``m^2`` sheets gathered from face neighbors (-1 where the
  face is a domain boundary).  Returns ``(ext_nodes, ext_owner,
  ext_local)`` each shaped ``(E, m^3 + 6 m^2)``.

  Unlike the 2D builder no tangential-orientation matching is needed:
  the GL pressure dofs are element-owned (discontinuous), each extended
  slot is the self-consistent triple ``ext_nodes = elements[ext_owner]
  [ext_local]``, and every consumer (`_extended_blocks`, the count
  weights, the batched solve + scatter-add) is invariant to the order of
  slots within a sheet — so the neighbor sheet is listed in the
  neighbor's own natural order.
  """
  num_e = len(elements)
  nbr = _face_adjacency_3d(el_uid)
  next_loc = m ** 3 + 6 * m * m
  ext_nodes = -np.ones((num_e, next_loc), dtype=np.int64)
  ext_owner = -np.ones((num_e, next_loc), dtype=np.int64)
  ext_local = np.zeros((num_e, next_loc), dtype=np.int64)
  own = np.arange(m ** 3)
  grid = np.indices((m, m))
  for e in range(num_e):
    ext_nodes[e, :m ** 3] = elements[e]
    ext_owner[e, :m ** 3] = e
    ext_local[e, :m ** 3] = own
    for f_idx, (a, s) in enumerate(
        ((0, 0), (0, 1), (1, 0), (1, 1), (2, 0), (2, 1))):
      if (a, s) not in nbr[e]:
        continue
      n, a_n, s_n = nbr[e][(a, s)]
      # Neighbor's GL sheet adjacent to the shared face: its normal axis
      # pinned at the near end, tangential axes running free.
      pin = (m - 1) if s_n == 1 else 0
      t1n, t2n = [ax for ax in range(3) if ax != a_n]
      coords = [None, None, None]
      coords[a_n] = np.full((m, m), pin)
      coords[t1n] = grid[0]
      coords[t2n] = grid[1]
      layer = (coords[0] * m * m + coords[1] * m + coords[2]).reshape(-1)
      sl = slice(m ** 3 + f_idx * m * m, m ** 3 + (f_idx + 1) * m * m)
      ext_nodes[e, sl] = elements[n][layer]
      ext_owner[e, sl] = n
      ext_local[e, sl] = layer
  return ext_nodes, ext_owner, ext_local


def _extended_tables(el_uid: np.ndarray, elements: np.ndarray, m: int,
                     d: int):
  """Overlap-1 extended tables, dispatched on dimension (2D strips or 3D
  sheets); used by both the single-device and distributed builders."""
  if d == 2:
    return _extended_index_tables(el_uid, elements, m)
  if d == 3:
    return _extended_index_tables_3d(el_uid, elements, m)
  raise NotImplementedError(f'overlap=1 is supported in 2D/3D only (d={d})')


def _extended_blocks(pairs, adj, ext_owner: np.ndarray,
                     ext_local: np.ndarray) -> np.ndarray:
  """Exact extended blocks ``E[ext(e), ext(e)]`` from the pair blocks.

  Entries between dofs owned by non-adjacent elements are structurally
  zero (E couples only vertex-sharing elements).  Missing (boundary)
  slots get an identity row/column so the batched inverse is harmless;
  their rhs is zero-padded so they contribute nothing.
  """
  num_e, next_loc = ext_owner.shape
  out = np.zeros((num_e, next_loc, next_loc))
  for e in range(num_e):
    owners = ext_owner[e]
    locs = ext_local[e]
    groups: dict[int, np.ndarray] = {}
    for p, o in enumerate(owners):
      groups.setdefault(int(o), []).append(p)
    for op_, ps in groups.items():
      if op_ < 0:
        continue
      ps = np.asarray(ps)
      for oq, qs in groups.items():
        if oq < 0:
          continue
        qs_arr = np.asarray(qs)
        if op_ == oq:
          blk = pairs[(op_, oq)]
        elif oq in adj[op_]:
          blk = pairs.get((op_, oq))
          if blk is None:
            continue
        else:
          continue
        out[e][np.ix_(ps, qs_arr)] = blk[np.ix_(locs[ps], locs[qs_arr])]
    dead = np.where(owners < 0)[0]
    out[e, dead, :] = 0.0
    out[e, :, dead] = 0.0
    out[e, dead, dead] = 1.0
  return out


def _probe_galerkin_coarse(matvec_batch, elements: np.ndarray,
                           adj: list[set[int]], colors2: np.ndarray,
                           stencil: np.ndarray, num_nodes: int) -> np.ndarray:
  """Galerkin coarse matrix ``A_c[(e',j),(e,i)] = phi_{e',j}^T E phi_{e,i}``
  for per-element coarse dofs with prolongation `stencil` ``(mloc, nc)``,
  assembled with distance-2 colored probes."""
  num_e, mloc = elements.shape
  nc = stencil.shape[1]
  a_c = np.zeros((num_e * nc, num_e * nc))
  # owner[e'] = the probed element whose neighborhood contains e'.
  for c in range(int(colors2.max()) + 1):
    sel = np.where(colors2 == c)[0]
    probes = np.zeros((nc, num_nodes))
    np.add.at(probes, (slice(None), elements[sel]),
              np.broadcast_to(stencil.T[:, None, :], (nc, len(sel), mloc)))
    out = matvec_batch(probes)               # (nc, num_nodes)
    owner = -np.ones(num_e, dtype=np.int64)
    for e in sel:
      owner[e] = e
      for nb in adj[e]:
        owner[nb] = e
    readers = np.where(owner >= 0)[0]
    # y restricted to coarse dofs of reader elements: (nc_probe, nr, nc).
    y = np.einsum('pen,nj->pej', out[:, elements[readers]], stencil)
    rows = readers[:, None] * nc + np.arange(nc)[None, :]       # (nr, nc)
    cols = owner[readers][:, None] * nc + np.arange(nc)[None, :]
    # Entry A[(e', j), (owner(e'), i)] = y[i, e', j]; each written once.
    for i in range(nc):
      a_c[rows, cols[:, i:i + 1]] = y[i]
  return a_c


def _coarse_element_stiffness(premesh) -> np.ndarray:
  """Q1 element stiffness matrices ``(E, 2^d, 2^d)``, float64 on host."""
  from swirlfem_tpu.core.fespace import FiniteElementSpace
  from swirlfem_tpu.core.fespace import grad, inner
  from swirlfem_tpu.core.quadrature import Quadrature1D

  cmesh = premesh.finalize()
  quad = Quadrature1D.create(num_points=2,
                             quadrature_type=NodeType.GAUSS_LEGENDRE)
  cpu = jax.local_devices(backend='cpu')[0]
  with jax.default_device(cpu), jax.enable_x64(True):
    cmesh64 = jax.tree.map(
        lambda x: (jnp.asarray(np.asarray(x), np.float64)
                   if hasattr(x, 'dtype')
                   and jnp.issubdtype(x.dtype, jnp.floating) else x), cmesh)
    space = FiniteElementSpace.create(cmesh64, quad)

    def a_local(u_local):
      def form(u, v):
        return lambda x: inner(grad(u)(x), grad(v)(x))
      u = space.scalar_function(u_local)
      v = space.scalar_function(None)
      return space.local_covector(form, (u, v))

    nper = premesh.num_nodes_per_element
    num_e = premesh.num_elements
    basis = jnp.eye(nper, dtype=jnp.float64)
    cols = jax.vmap(
        lambda e: a_local(jnp.broadcast_to(e, (num_e, nper))))(basis)
  return np.asarray(cols).transpose(1, 0, 2)  # (E, 2^d, 2^d)


def _p1dg_coarse(matvec_batch, elements: np.ndarray, adj, colors2,
                 pmesh, d: int, npn: int, has_nullspace: bool):
  """(stencil, inv_c) of the per-element bilinear GL Galerkin coarse,
  shared by the single-device and distributed builders."""
  lo = Nodes1D.create(2, NodeType.GAUSS_LEGENDRE)
  jc1 = np.asarray(interpolation_matrix_1d(lo, pmesh.gridpoints_1d))
  stencil = jc1
  for _ in range(d - 1):
    stencil = np.kron(stencil, jc1)            # (m^d, 2^d)
  a_c = _probe_galerkin_coarse(matvec_batch, elements, adj, colors2,
                               stencil, npn)
  a_c = 0.5 * (a_c + a_c.T)
  if has_nullspace:
    inv_c, _ = _pinv_psd(a_c)
  else:
    inv_c = np.linalg.inv(a_c)
  return stencil, inv_c


def _vertex_stencil(pmesh, d: int) -> np.ndarray:
  """Q1 vertex -> order-(n-2) GL prolongation stencil ``(m^d, 2^d)``."""
  corner_grid = Nodes1D.create(2, NodeType.NEWTON_COTES)
  j1 = np.asarray(interpolation_matrix_1d(corner_grid, pmesh.gridpoints_1d))
  stencil = j1
  for _ in range(d - 1):
    stencil = np.kron(stencil, j1)             # (m^d, 2^d)
  return stencil


def _outflow_vertices(premesh, boundary_conditions, uid) -> np.ndarray:
  """Boundary vertices NOT covered by a Dirichlet physical group — the
  do-nothing-outflow set that gets Dirichlet rows in the coarse operator."""
  boundary = _boundary_vertices(premesh.elements, uid, premesh.ndim)
  dirichlet_vertices = set()
  for name, bc in (boundary_conditions or {}).items():
    bc_type = bc[0] if isinstance(bc, (tuple, list)) else bc
    if bc_type == BCType.DIRICHLET and name in premesh.physical_groups:
      dirichlet_vertices.update(
          uid[np.unique(
              premesh.physical_groups[name].reshape(-1))].tolist())
  return np.asarray(sorted(set(boundary.tolist()) - dirichlet_vertices),
                    dtype=np.int64)


def _vertex_coarse_coo(premesh, boundary_conditions, uid, el_uid, nv: int,
                       has_nullspace: bool, *, ground_vertex0: bool):
  """COO triplets of the Q1 vertex coarse operator, float64.

  Shared by the sparse-LU dense inverse (`_vertex_coarse_inverse`) and the
  matrix-free Chebyshev solve (`ops.coarse_cheb`) so both paths assemble
  the bit-identical operator.  Pinned vertices (do-nothing outflow, plus
  vertex 0 when ``ground_vertex0`` grounds a singular operator) get
  symmetric row/col elimination with a ``diag_ref`` Dirichlet diagonal.

  Returns ``(rows, cols, data, diag_ref)``.
  """
  s_el = _coarse_element_stiffness(premesh)
  nc = el_uid.shape[1]
  rows = np.repeat(el_uid[:, :, None], nc, axis=2).reshape(-1)
  cols = np.repeat(el_uid[:, None, :], nc, axis=1).reshape(-1)
  data = s_el.reshape(-1).astype(np.float64)
  diag_ref = float(data[rows == cols].sum() / nv) or 1.0
  if has_nullspace:
    pinned = (np.array([0], dtype=np.int64) if ground_vertex0
              else np.zeros(0, dtype=np.int64))
  else:
    pinned = _outflow_vertices(premesh, boundary_conditions, uid)
  if len(pinned):
    keep = ~(np.isin(rows, pinned) | np.isin(cols, pinned))
    rows = np.concatenate([rows[keep], pinned])
    cols = np.concatenate([cols[keep], pinned])
    data = np.concatenate([data[keep], np.full(len(pinned), diag_ref)])
  return rows, cols, data, diag_ref


def _vertex_coarse_inverse(premesh, boundary_conditions, uid, el_uid,
                           nv: int, dt: float, time_order: int,
                           has_nullspace: bool) -> np.ndarray:
  """Dense inverse of the Q1 FEM vertex coarse operator, float64.

  ``E ~ (dt/beta_k) * Laplacian``: the FEM coarse operator needs the scale
  the probed Galerkin one inherits automatically.  With a do-nothing
  outflow the vertex operator gets Dirichlet rows on the outflow vertices
  (matching E's nonsingularity) instead of the pseudo-inverse.
  """
  from swirlfem_tpu.nse.solver import bdfk_coeffs
  beta_k = float(bdfk_coeffs(time_order)[-1])
  s_el = _coarse_element_stiffness(premesh)

  def outflow_vertices():
    return _outflow_vertices(premesh, boundary_conditions, uid)

  if nv <= 2048:
    # Dense path (small coarse spaces; bit-identical to the original).
    a_c = np.zeros((nv, nv))
    np.add.at(a_c, (el_uid[:, :, None], el_uid[:, None, :]), s_el)
    if has_nullspace:
      inv_c, _ = _pinv_psd(a_c)
    else:
      outflow = outflow_vertices()
      diag_ref = float(np.mean(np.diag(a_c))) or 1.0
      a_c[outflow, :] = 0.0
      a_c[:, outflow] = 0.0
      a_c[outflow, outflow] = diag_ref
      inv_c = np.linalg.inv(a_c)
    return (beta_k / dt) * inv_c

  # Large coarse spaces: the O(nv^3) dense eigh/inv dominates Schwarz setup
  # (measured 25 min at nv = 16,641).  The coarse operator is a sparse Q1
  # stiffness matrix: sparse-LU factorize once, then back-substitute for
  # the identity columns (seconds).  For the singular (enclosed) case the
  # eigh pseudo-inverse is computed as a grounded solve:
  # pinv(A) = P A_g^{-1} Z P, where P projects out the constant mode, Z
  # zeroes the grounded entry and A_g is A with vertex 0's row/col
  # replaced by a Dirichlet row.  This is EXACT (not just spectrally
  # equivalent): rows i != 0 of A y = P r hold by construction, and row 0
  # follows because the singular stiffness has zero row sums, so the
  # residual sum over the other rows forces it.
  import scipy.sparse as sp
  import scipy.sparse.linalg as spla

  rows, cols, data, _ = _vertex_coarse_coo(
      premesh, boundary_conditions, uid, el_uid, nv, has_nullspace,
      ground_vertex0=True)
  a_g = sp.coo_matrix((data, (rows, cols)), shape=(nv, nv)).tocsc()
  lu = spla.splu(a_g)

  inv_c = np.empty((nv, nv))
  block = 4096
  for lo in range(0, nv, block):
    hi = min(lo + block, nv)
    rhs = np.zeros((nv, hi - lo))
    rhs[np.arange(lo, hi), np.arange(hi - lo)] = 1.0
    if has_nullspace:
      rhs -= 1.0 / nv
      rhs[0, :] = 0.0  # Z: the grounded row's equation is redundant
    inv_c[:, lo:hi] = lu.solve(rhs)
  if has_nullspace:
    inv_c -= inv_c.mean(axis=0, keepdims=True)
    inv_c = 0.5 * (inv_c + inv_c.T)  # symmetrize rounding asymmetry
  return (beta_k / dt) * inv_c


def _pinv_psd(a: np.ndarray, rcond: float = 1e-10) -> tuple[np.ndarray, bool]:
  """Eigh-based pseudo-inverse; returns (inverse, had_nullspace)."""
  lam, z = np.linalg.eigh(a)
  cut = rcond * float(np.abs(lam).max())
  null = np.abs(lam) <= cut
  inv_l = np.where(~null, 1.0 / np.where(null, 1.0, lam), 0.0)
  return (z * inv_l) @ z.T, bool(null.any())


def build_schwarz_pressure_solver(sem, premesh, boundary_conditions,
                                  dt: float, time_order: int,
                                  coarse: str = 'auto',
                                  max_coarse_dofs: int = 16000,
                                  overlap='auto', axis_name: str = 'part'):
  """Returns an SPD callable ``M(r) ~ E^{-1} r`` on nodal pressure arrays.

  Args:
    sem: the `StokesSEM` (supplies the operator for probing and dtypes).
    premesh: the ORDER-1 premesh the sem was created from (vertex
      connectivity drives coloring and the vertex coarse space).
    boundary_conditions: the mapping given to ``StokesSEM.create``
      (detects do-nothing outflow => E nonsingular, no projection).
    coarse: ``'p1dg'`` | ``'vertex'`` | ``'vertex-cheb'`` | ``'auto'``
      (p1dg when its dimension fits ``max_coarse_dofs``, else vertex).
    max_coarse_dofs: cap on the dense coarse inverse.  A vertex coarse
      space larger than this switches to the matrix-free Chebyshev solve
      (`ops.coarse_cheb`) — O(nnz) setup/memory instead of O(nv^2) —
      which ``coarse='vertex-cheb'`` also forces explicitly.
    overlap: 0 = element-diagonal blocks; 1 = true overlapping Schwarz
      — each local domain extends one GL layer into its face neighbors,
      with the exact extended blocks assembled from the probing pass and
      count-weighted symmetric addition (measured 48 -> 23 iterations on
      the cylinder mesh, Fischer's classical ~2x).  'auto' = 1 in 2D,
      0 in 3D — 3D overlap-1 is supported but opt-in: the extended
      blocks grow to ``(m^3 + 6 m^2)^2`` floats per element.

  The result has ``.has_nullspace`` (True for enclosed/periodic flow:
  pair with the nullspace projection, as for the other preconditioners).
  """
  if premesh.order != 1:
    raise ValueError(f'expected the order-1 premesh, got {premesh.order}')
  if premesh.is_partitioned():
    # Partitioned premesh: delegate to the distributed builder (same exact
    # probed local blocks + coarse spaces, leaves stacked over partitions
    # for use under spmd_map).  ``sem`` must then be the UNPARTITIONED twin
    # — the float64 probing oracle — exactly as `build_distributed_schwarz`
    # documents; ``axis_name`` names the shard_map axis of the partitioned
    # solver the result will precondition.
    if np.asarray(sem.velocity.mesh.node_coords).ndim != 2:
      raise ValueError(
          'partitioned premesh requires the UNPARTITIONED twin StokesSEM '
          '(create it from premesh.replace(partitions=None)); got a solver '
          'with stacked/partitioned leaves')
    from swirlfem_tpu.ops.schwarz_distributed import build_distributed_schwarz
    return build_distributed_schwarz(
        sem, premesh, boundary_conditions, dt, time_order,
        axis_name=axis_name, coarse=coarse,
        max_coarse_dofs=max_coarse_dofs, overlap=overlap)

  pmesh = sem.pressure.pspace.mesh
  d = premesh.ndim
  m = pmesh.order + 1
  mloc = m ** d
  num_e = premesh.num_elements
  npn = pmesh.num_nodes
  dtype = sem.velocity_mass_diag.dtype
  rdtype = np.float32 if dtype == jnp.float32 else np.float64

  uid = _vertex_unique_ids(premesh)
  el_uid = uid[premesh.elements]             # (E, 2^d)
  nv = int(uid.max()) + 1
  adj = _element_adjacency(el_uid)
  elements = np.asarray(pmesh.elements)      # (E, m^d)

  matvec_batch = _matvec64(sem, dt, time_order)

  # -- local: exact (extended) element blocks --------------------------------
  # Probing always runs with a distance-2 coloring and neighbor readout:
  # the recorded pair blocks feed both the overlap-1 extended locals and
  # the assembled block-sparse E matvec (ops.assembled) that replaces the
  # ~15-kernel matrix-free apply inside the pressure CG.
  if overlap == 'auto':
    overlap = 1 if d == 2 else 0
  ext_nodes = None
  colors2_local = _distance2_coloring(adj)
  diag_blocks, pairs = _probe_element_blocks(matvec_batch, elements,
                                             colors2_local, npn, adj=adj)
  if overlap:
    if overlap != 1:
      raise NotImplementedError('only overlap=1 extended locals')
    ext_nodes, ext_owner, ext_local = _extended_tables(
        el_uid, elements, m, d)
    blocks = _extended_blocks(pairs, adj, ext_owner, ext_local)
    # Count-weighted symmetric addition: W = 1/sqrt(#domains per dof),
    # applied on both sides of each local inverse (keeps M SPD while
    # normalizing the ~3x interface over-counting of plain addition).
    count = np.zeros(npn)
    np.add.at(count, ext_nodes[ext_nodes >= 0], 1.0)
    w = 1.0 / np.sqrt(np.maximum(count, 1.0))
    w_ext = np.where(ext_nodes >= 0, w[np.clip(ext_nodes, 0, None)], 0.0)
  else:
    blocks = diag_blocks
  binv = np.linalg.inv(blocks)
  binv = 0.5 * (binv + np.swapaxes(binv, 1, 2))  # exact symmetry per block

  # -- coarse ----------------------------------------------------------------
  if coarse == 'auto':
    coarse = 'p1dg' if (2 ** d) * num_e <= max_coarse_dofs else 'vertex'
  has_nullspace = not _has_outflow(premesh, boundary_conditions, uid)

  cheb = None
  if coarse == 'p1dg':
    stencil, inv_c = _p1dg_coarse(matvec_batch, elements, adj,
                                  colors2_local, pmesh, d, npn,
                                  has_nullspace)
    coarse_rows = None                       # per-element contiguous dofs
  elif coarse in ('vertex', 'vertex-cheb'):
    stencil = _vertex_stencil(pmesh, d)
    coarse_rows = jnp.asarray(el_uid)
    if coarse == 'vertex-cheb' or nv > max_coarse_dofs:
      # Beyond the dense-inverse range: matrix-free Chebyshev coarse solve
      # (O(nnz) setup/memory instead of O(nv^2); see ops.coarse_cheb).
      from swirlfem_tpu.ops.coarse_cheb import build_cheb_vertex_coarse
      cheb = build_cheb_vertex_coarse(
          premesh, boundary_conditions, uid, el_uid, nv, dt, time_order,
          has_nullspace, rdtype=rdtype)
      inv_c = None
      coarse = 'vertex-cheb'
    else:
      inv_c = _vertex_coarse_inverse(premesh, boundary_conditions, uid,
                                     el_uid, nv, dt, time_order,
                                     has_nullspace)
  else:
    raise ValueError(f'unknown coarse space {coarse!r}')

  # -- device constants ------------------------------------------------------
  hp = lax.Precision.HIGHEST
  binv_dev = jnp.asarray(np.ascontiguousarray(binv, dtype=rdtype))
  inv_c_dev = (None if inv_c is None else
               jnp.asarray(np.ascontiguousarray(inv_c, dtype=rdtype)))
  stencil_dev = jnp.asarray(np.ascontiguousarray(stencil, dtype=rdtype))
  elements_dev = jnp.asarray(elements)
  el_is_iota = bool(
      np.array_equal(elements.reshape(-1), np.arange(npn)))
  if overlap:
    ext_idx_dev = jnp.asarray(np.clip(ext_nodes, 0, None))
    w_ext_dev = jnp.asarray(np.ascontiguousarray(w_ext, dtype=rdtype))

  def _coarse_apply(r_el):
    rc_el = jnp.einsum('nc,en->ec', stencil_dev,
                       r_el.astype(stencil_dev.dtype), precision=hp)
    if coarse_rows is None:
      rc = rc_el.reshape(-1)
    else:
      rc = jnp.zeros(nv, dtype=rc_el.dtype).at[coarse_rows].add(rc_el)
    if cheb is not None:
      yc = cheb.solve(rc).astype(rc.dtype)
    else:
      yc = jnp.matmul(inv_c_dev, rc, precision=hp)
    if coarse_rows is None:
      yc_el = yc.reshape(num_e, -1)
    else:
      yc_el = yc[coarse_rows]
    return jnp.einsum('nc,ec->en', stencil_dev, yc_el, precision=hp)

  def solve(r):
    if el_is_iota:
      r_el = r.reshape(num_e, mloc)
    else:
      r_el = r[elements_dev]
    cy = _coarse_apply(r_el)
    if overlap:
      # Overlapping locals: gather extended (own + neighbor-layer) rhs,
      # weighted batched block solve, weighted scatter-add back.
      r_ext = r[ext_idx_dev].astype(binv_dev.dtype) * w_ext_dev
      y_ext = jnp.einsum('epq,eq->ep', binv_dev, r_ext,
                         precision=hp) * w_ext_dev
      y_loc = jnp.zeros(npn, dtype=y_ext.dtype).at[ext_idx_dev].add(y_ext)
      if el_is_iota:
        yc_nodal = cy.reshape(-1)
      else:
        yc_nodal = pmesh.scatter(cy)
      return (y_loc + yc_nodal).astype(r.dtype)
    t = jnp.einsum('eij,ej->ei', binv_dev, r_el.astype(binv_dev.dtype),
                   precision=hp)
    y = (t + cy).astype(r.dtype)
    if el_is_iota:
      return y.reshape(-1)
    return pmesh.scatter(y)

  solve.has_nullspace = has_nullspace
  solve.coarse = coarse
  # Assembled block-sparse E from the same probing pass: the CG matvec
  # becomes one gather + one batched matmul (see ops.assembled docstring;
  # measured 3.05 -> ~0.2 ms per apply on the 912-element cylinder mesh).
  from swirlfem_tpu.ops.assembled import build_block_schur_matvec
  solve.fast_matvec = build_block_schur_matvec(
      pairs, adj, elements, npn, pmesh, rdtype)
  return solve
