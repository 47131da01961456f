"""Structured-box fast path: index-free gather/scatter via reshapes.

On TPUs, gathers/scatters cost ~O(rows) regardless of row width (each row is
an independent DMA), so the generic ``u[elements]`` gather of a quarter
million rows costs milliseconds even though it moves only a few MB.  For
*structured* box meshes — the Kolmogorov/NiLES flagship workloads — the
element<->node maps have tensor-product strides, and both `gather` and
`scatter` can be written as slices, reshapes and concatenations that XLA
compiles to dense copies (microseconds).

The key constructions, along one axis with `n` elements of order `p`
(global line of ``N = n*p + 1`` nodes):

* gather: element-local lines ``(n, p+1)`` are the ``(n, p)`` reshape of
  ``line[:-1]`` concatenated with each next element's first node
  (``line[1:]`` reshaped ``(n, p)``, last column).
* scatter (the exact transpose): place columns ``[:p]`` back as the
  ``(n*p,)`` prefix, and add column ``p`` at positions ``p, 2p, ...`` —
  expressed as the flat reshape of a zero block whose last column holds the
  values, offset by one.

`structured_box_premesh` builds the refined premesh directly in grid
(lexicographic) node numbering and attaches a hashable `StructuredInfo` that
`Mesh` uses to dispatch these fast paths.  Continuous (GLL / Newton-Cotes)
and discontinuous (GL: private nodes per element, gather/scatter are pure
reshapes) families are supported; periodicity still flows through the
generic `exchange` (it touches only the seam dofs).
"""

from __future__ import annotations

import dataclasses
import itertools

import jax
import jax.numpy as jnp
import numpy as np

from swirlfem_tpu.core.premesh import Premesh
from swirlfem_tpu.core.quadrature import Nodes1D


@dataclasses.dataclass(frozen=True)
class StructuredInfo:
  """Static descriptor of a structured box mesh (hashable)."""

  num_elements_per_dim: int
  order: int
  ndim: int
  continuous: bool

  @property
  def nodes_per_dim(self) -> int:
    if self.continuous:
      return self.num_elements_per_dim * self.order + 1
    return self.num_elements_per_dim * (self.order + 1)


# ---------------------------------------------------------------------------
# Index-free gather / scatter
# ---------------------------------------------------------------------------


def _scatter_axis(w: jax.Array, n: int, p: int) -> jax.Array:
  """Transpose of the axis split: (n, p+1, ...) -> (n*p + 1, ...).

  Overlapping element-boundary contributions are summed.
  """
  rest = w.shape[2:]
  main = w[:, :p].reshape((n * p,) + rest)
  zeros_col = jnp.zeros((n, p - 1) + rest, dtype=w.dtype) if p > 1 else None
  last_col = w[:, p:p + 1]
  block = (jnp.concatenate([zeros_col, last_col], axis=1)
           if zeros_col is not None else last_col)
  shifted = block.reshape((n * p,) + rest)
  zero = jnp.zeros((1,) + rest, dtype=w.dtype)
  return (jnp.concatenate([main, zero], axis=0)
          + jnp.concatenate([zero, shifted], axis=0))


def structured_gather(u: jax.Array, info: StructuredInfo) -> jax.Array:
  """Nodal ``(num_nodes,)`` -> element-local ``(E, (p+1)^d)``; no indexing."""
  n, p, d = info.num_elements_per_dim, info.order, info.ndim
  if not info.continuous:
    k = p + 1
    # Private nodes: flat order is already (elements x local), grid-major.
    g = u.reshape((n, k) * d)
    # axes: (e0, l0, e1, l1, ...) -> (e0, e1, ..., l0, l1, ...)
    perm = tuple(range(0, 2 * d, 2)) + tuple(range(1, 2 * d, 2))
    return g.transpose(perm).reshape(n**d, k**d)
  out = u.reshape((n * p + 1,) * d)
  # Split one grid axis at a time into (element, local) axis pairs.  After
  # processing axes 0..k-1 the layout is (e0, l0, ..., e_{k-1}, l_{k-1},
  # node_k, ...), so grid axis k sits at position 2k.
  for axis in range(d):
    node_axis = 2 * axis
    g = jnp.moveaxis(out, node_axis, 0)
    head = g[:-1].reshape((n, p) + g.shape[1:])
    last = g[1:].reshape((n, p) + g.shape[1:])[:, p - 1:p]
    split = jnp.concatenate([head, last], axis=1)  # (n, p+1, rest)
    out = jnp.moveaxis(split, (0, 1), (node_axis, node_axis + 1))
  # (e0, l0, e1, l1, ...) -> (e0, e1, ..., l0, l1, ...)
  perm = (tuple(range(0, 2 * d, 2)) + tuple(range(1, 2 * d, 2)))
  return out.transpose(perm).reshape(n**d, (p + 1)**d)


def structured_scatter(w: jax.Array, info: StructuredInfo) -> jax.Array:
  """Element-local ``(E, (p+1)^d)`` -> nodal; exact transpose of gather."""
  n, p, d = info.num_elements_per_dim, info.order, info.ndim
  k = p + 1
  if not info.continuous:
    w = w.reshape((n,) * d + (k,) * d)
    perm = tuple(itertools.chain.from_iterable((i, d + i) for i in range(d)))
    return w.transpose(perm).reshape(-1)
  # Interleave to (e0, l0, e1, l1, ...).
  w = w.reshape((n,) * d + (k,) * d)
  perm = tuple(itertools.chain.from_iterable((i, d + i) for i in range(d)))
  out = w.transpose(perm)
  for axis in reversed(range(d)):
    node_axis = 2 * axis
    moved = jnp.moveaxis(out, (node_axis, node_axis + 1), (0, 1))
    combined = _scatter_axis(moved, n, p)  # (n*p+1, rest)
    out = jnp.moveaxis(combined, 0, node_axis)
  return out.reshape(-1)


# ---------------------------------------------------------------------------
# Structured refined premesh construction
# ---------------------------------------------------------------------------


def _connectivity(info: StructuredInfo, periodic_dims, face_groups=False):
  """Elements, boundary groups and periodic links for a structured grid.

  With ``face_groups``, each non-periodic side additionally gets its own
  physical group (``xlo``/``xhi``/...), matching
  ``utils.box.unit_cube_mesh(face_groups=True)`` — per-side boundary
  conditions (e.g. the heated cavity's thermal walls) then keep the
  structured fast path.
  """
  n, p, ndim = info.num_elements_per_dim, info.order, info.ndim
  nodes_per_dim = info.nodes_per_dim
  stride = p if info.continuous else p + 1
  shape = (nodes_per_dim,) * ndim

  elements = np.empty((n**ndim, (p + 1)**ndim), dtype=np.int32)
  for e, cell in enumerate(itertools.product(range(n), repeat=ndim)):
    axis_ids = [c * stride + np.arange(p + 1) for c in cell]
    local = np.stack(np.meshgrid(*axis_ids, indexing='ij'),
                     axis=-1).reshape(-1, ndim)
    elements[e] = np.ravel_multi_index(local.T, shape)

  def face_ids(axis, last):
    fixed = nodes_per_dim - 1 if last else 0
    others = [np.arange(nodes_per_dim)] * (ndim - 1)
    mesh_ids = np.meshgrid(*others, indexing='ij') if others else []
    idx = []
    for k_ in range(ndim):
      if k_ == axis:
        idx.append(np.full((nodes_per_dim,) * (ndim - 1), fixed))
      else:
        idx.append(mesh_ids[k_ if k_ < axis else k_ - 1])
    return np.ravel_multi_index([i.reshape(-1) for i in idx], shape)

  physical_groups = {}
  periodic_links = None
  if info.continuous:
    boundary, links = [], []
    for axis in range(ndim):
      first, last = face_ids(axis, False), face_ids(axis, True)
      if axis in periodic_dims:
        links.append(np.stack([first, last], axis=0)[None])
      else:
        boundary.append(first[None])
        boundary.append(last[None])
        if face_groups:
          name = 'xyz'[axis]
          physical_groups[name + 'lo'] = first[None]
          physical_groups[name + 'hi'] = last[None]
    if boundary:
      physical_groups['boundary'] = np.concatenate(boundary, axis=0)
    if links:
      periodic_links = np.concatenate(links, axis=0).astype(np.int32)
  return elements, physical_groups, periodic_links


def structured_box_premesh(
    num_elements_per_dim: int,
    gridpoints_1d: Nodes1D,
    ndim: int = 2,
    a: float = 0.0,
    b: float = 1.0,
    periodic_dims=(),
) -> tuple[Premesh, StructuredInfo]:
  """Refined box premesh in grid numbering + its `StructuredInfo`.

  Equivalent (up to node numbering) to ``refine_premesh(unit_cube_mesh(n),
  gridpoints_1d)`` but with lexicographic node layout enabling index-free
  gather/scatter.
  """
  n = num_elements_per_dim
  p = gridpoints_1d.num_points - 1
  info = StructuredInfo(num_elements_per_dim=n, order=p, ndim=ndim,
                        continuous=gridpoints_1d.is_continuous())
  ref = gridpoints_1d.points  # on [-1, 1]
  h = (b - a) / n
  lows = a + h * np.arange(n)
  per_elem = lows[:, None] + (ref[None, :] + 1.0) * (h / 2.0)  # (n, p+1)
  if info.continuous:
    coords_1d = np.concatenate([per_elem[:, :p].reshape(-1), [float(b)]])
  else:
    coords_1d = per_elem.reshape(-1)
  grids = np.meshgrid(*([coords_1d] * ndim), indexing='ij')
  node_coords = np.stack(grids, axis=-1).reshape(-1, ndim)

  elements, physical_groups, periodic_links = _connectivity(
      info, tuple(periodic_dims))
  premesh = Premesh.create(
      node_coords=node_coords,
      elements=elements,
      gridpoints_1d=gridpoints_1d,
      physical_groups=physical_groups,
      periodic_links=periodic_links).replace(structured=info)
  return premesh, info


def structured_refine(premesh: Premesh, gridpoints_1d: Nodes1D) -> Premesh:
  """Fast-path p-refinement for box premeshes, in grid numbering.

  Works for arbitrarily deformed (conforming) box premeshes: refined node
  coordinates are interpolated per element from the order-1 corner
  coordinates and assembled onto the global grid (shared facets coincide).
  """
  n, periodic_dims = premesh.box_info
  p = gridpoints_1d.num_points - 1
  d = premesh.ndim
  info = StructuredInfo(num_elements_per_dim=n, order=p, ndim=d,
                        continuous=gridpoints_1d.is_continuous())
  face_groups = any(name != 'boundary'
                    for name in (premesh.physical_groups or {}))
  from swirlfem_tpu.core.quadrature import interpolation_matrix_1d
  interp = interpolation_matrix_1d(premesh.gridpoints_1d, gridpoints_1d)
  corners = np.asarray(premesh.node_coords)[np.asarray(premesh.elements)]
  vals = corners.reshape((premesh.num_elements,) + (2,) * d + (d,))
  for axis in range(1, 1 + d):
    vals = np.moveaxis(np.tensordot(interp, vals, axes=([1], [axis])),
                       0, axis)
  stride = p if info.continuous else p + 1
  coords = np.zeros((info.nodes_per_dim,) * d + (d,))
  for e, cell in enumerate(itertools.product(range(n), repeat=d)):
    slices = tuple(slice(c * stride, c * stride + p + 1) for c in cell)
    coords[slices] = vals[e]

  elements, physical_groups, periodic_links = _connectivity(
      info, tuple(periodic_dims), face_groups=face_groups)
  return Premesh.create(
      node_coords=coords.reshape(-1, d),
      elements=elements,
      gridpoints_1d=gridpoints_1d,
      physical_groups=physical_groups,
      periodic_links=periodic_links).replace(structured=info)
