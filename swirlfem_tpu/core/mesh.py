"""Device-resident mesh for spectral/finite element simulations.

Parity target: reference ``swirl_fem/core/mesh.py`` (Mesh :30-179).  A `Mesh`
holds device arrays (node coordinates, element connectivity, global node ids,
physical masks, exchange gather indices) plus static metadata (order, the 1D
node family, exchange unique indices, and the partition axis name).

Distribution model (TPU-first): a partitioned mesh is a *stacked* pytree with
a leading partition axis, placed with ``jax.device_put`` +
``NamedSharding(P(axis_name))`` over a ``jax.sharding.Mesh`` — not with
``jax.pmap`` as in the reference (``core/premesh.py:216``).  Solver code runs
under ``shard_map`` (see :mod:`swirlfem_tpu.parallel.spmd`), where each shard
sees the per-partition view and `exchange` performs the cross-partition
``lax.psum``.
"""

from __future__ import annotations

from collections.abc import Mapping

import flax.struct
import jax
from jax import vmap
import jax.numpy as jnp
import numpy as np

from swirlfem_tpu.core import topology
from swirlfem_tpu.core.quadrature import Nodes1D
from swirlfem_tpu.core.quadrature import NodeType


def _default_gridpoints(num_nodes_per_element: int, ndim: int) -> Nodes1D:
  num_points = int(round(num_nodes_per_element ** (1.0 / ndim)))
  return Nodes1D.create(num_points=num_points, node_type=NodeType.NEWTON_COTES)


@flax.struct.dataclass
class Mesh:
  """An N-dimensional tensor-product (quad/hex) mesh.

  Elements are deformed ndim-cubes of uniform order; nodes within an element
  are in lexicographic tensor order (axis 0 slowest), so each element has
  ``(order + 1) ** ndim`` nodes.

  Attributes:
    node_coords: ``(num_nodes, ndim)`` node coordinates.
    elements: ``(num_elements, nodes_per_element)`` node ids per element.
    node_indices: ``(num_nodes,)`` globally-unique id of each local node;
      ``arange`` when unpartitioned/non-periodic.
    order: polynomial order (static).
    gridpoints_1d: the 1D node family on the reference element (static).
    physical_masks: name -> boolean ``(num_nodes,)`` mask of nodes belonging
      to that physical group.
    exchange_gather_indices: positions of shared local nodes (see
      :func:`swirlfem_tpu.core.topology.exchange`).
    exchange_unique_indices: static map gathered-position -> shared-dof slot.
    axis_name: collective axis name when partitioned (static).
  """

  node_coords: jax.Array
  elements: jax.Array
  node_indices: jax.Array
  order: int = flax.struct.field(pytree_node=False)
  gridpoints_1d: Nodes1D = flax.struct.field(pytree_node=False)
  physical_masks: Mapping[str, jax.Array] = flax.struct.field(
      default_factory=dict)
  exchange_gather_indices: jax.Array | None = None
  exchange_unique_indices: np.ndarray | None = flax.struct.field(
      pytree_node=False, default=None)
  axis_name: str | None = flax.struct.field(pytree_node=False, default=None)
  # Optional neighbor-limited exchange schedule (matched ppermute rounds
  # instead of a full psum over all shared dofs; see core.topology).
  exchange_neighbors: topology.NeighborExchange | None = None
  # Static transpose-gather tables (TPU fast paths; see core.topology).
  scatter_copies: jax.Array | None = None
  exchange_scatter_slots: jax.Array | None = None
  # Structured-grid descriptor enabling index-free gather/scatter
  # (see core.structured); None for unstructured meshes.
  structured: object | None = flax.struct.field(pytree_node=False,
                                                default=None)

  @classmethod
  def create(cls, node_coords, elements, node_indices=None, gridpoints_1d=None,
             physical_masks=None, exchange_gather_indices=None,
             exchange_unique_indices=None, axis_name=None,
             structured=None, exchange_neighbors=None) -> 'Mesh':
    node_coords = jnp.asarray(node_coords)
    ndim = node_coords.shape[-1]
    nper = np.shape(elements)[-1]
    if gridpoints_1d is None:
      gridpoints_1d = _default_gridpoints(nper, ndim)
    if nper != gridpoints_1d.num_points**ndim:
      raise ValueError(
          f'nodes per element {nper} != {gridpoints_1d.num_points}^{ndim}')
    num_nodes = node_coords.shape[-2]
    if node_indices is None:
      node_indices = jnp.arange(num_nodes, dtype=jnp.int32)

    # Host-side transpose-gather tables: scatter as dense gather + sum
    # instead of TPU scatter-adds.  Structured meshes dispatch to the
    # index-free grid scatter and never consult the table — skip building
    # it (a (num_nodes, 2^d) device array plus a host argsort per build).
    elements_np = np.asarray(elements)
    if structured is not None:
      copies = None
    elif elements_np.ndim == 2:
      copies = topology.scatter_copies(elements_np, num_nodes)
    else:  # stacked (P, E, nper)
      per_part = [topology.scatter_copies(e, num_nodes) for e in elements_np]
      width = max(c.shape[1] for c in per_part)
      copies = np.stack([
          np.pad(c, ((0, 0), (0, width - c.shape[1])),
                 constant_values=topology.SENTINEL) for c in per_part])

    slots = None
    if exchange_gather_indices is not None:
      gi = np.asarray(exchange_gather_indices)
      if gi.ndim == 1:
        slots = topology.exchange_scatter_slots(gi, num_nodes)
      else:
        slots = np.stack([topology.exchange_scatter_slots(row, num_nodes)
                          for row in gi])

    return cls(
        node_coords=node_coords,
        elements=jnp.asarray(elements),
        node_indices=jnp.asarray(node_indices),
        order=gridpoints_1d.num_points - 1,
        gridpoints_1d=gridpoints_1d,
        physical_masks={k: jnp.asarray(v)
                        for k, v in (physical_masks or {}).items()},
        exchange_gather_indices=(None if exchange_gather_indices is None
                                 else jnp.asarray(exchange_gather_indices)),
        exchange_unique_indices=exchange_unique_indices,
        axis_name=axis_name,
        scatter_copies=None if copies is None else jnp.asarray(copies),
        exchange_scatter_slots=(None if slots is None
                                else jnp.asarray(slots)),
        structured=structured,
        exchange_neighbors=exchange_neighbors,
    )

  @property
  def ndim(self) -> int:
    return self.node_coords.shape[-1]

  @property
  def num_nodes(self) -> int:
    return self.node_coords.shape[-2]

  @property
  def num_elements(self) -> int:
    return self.elements.shape[-2]

  @property
  def num_nodes_per_element(self) -> int:
    return self.elements.shape[-1]

  def gather(self, u: jax.Array) -> jax.Array:
    """Nodal ``(num_nodes,)`` -> element-local ``(E, nodes_per_element)``."""
    if u.shape != (self.num_nodes,):
      raise ValueError(f'expected shape ({self.num_nodes},), got {u.shape}')
    if self.structured is not None:
      from swirlfem_tpu.core import structured as _structured
      return _structured.structured_gather(u, self.structured)
    return topology.gather(u, self.elements, fill_value=0.0)

  def scatter(self, u_local: jax.Array) -> jax.Array:
    """Element-local -> nodal, summing contributions of shared nodes."""
    if self.structured is not None:
      from swirlfem_tpu.core import structured as _structured
      return _structured.structured_scatter(u_local, self.structured)
    if self.scatter_copies is not None:
      return topology.scatter_via_copies(u_local, self.scatter_copies)
    return topology.scatter(u_local, self.elements, num_nodes=self.num_nodes)

  def element_coords(self) -> jax.Array:
    """Node coordinates arranged per element: ``(E, nodes_per_element, d)``."""
    return vmap(self.gather, in_axes=-1, out_axes=-1)(self.node_coords)

  def exchange(self, u: jax.Array) -> jax.Array:
    """Applies Q Q^T: sums all copies of each shared degree of freedom."""
    return topology.exchange(
        u,
        gather_indices=self.exchange_gather_indices,
        unique_indices=self.exchange_unique_indices,
        axis_name=self.axis_name,
        scatter_slots=self.exchange_scatter_slots,
        neighbors=self.exchange_neighbors)

  def shard_nodal(self, values: np.ndarray, kind: str = 'field'):
    """Stacked per-partition shards of a GLOBAL nodal array (host-side).

    Only meaningful on a partitioned mesh, whose `node_indices` is the
    stacked ``(P, n_local)`` local->global map.  Two sharding conventions
    exist and mixing them up silently corrupts distributed solves:

    * ``kind='field'``: consistent fields (velocity/pressure STATES) —
      every copy of a shared dof receives the full value.
    * ``kind='covector'``: assembled quantities (FORCINGS, rhs) — shared
      dofs are split among copies by multiplicity so the distributed
      assembly (``exchange``) reproduces the global covector; passing a
      full-value shard here double-counts shared dofs.

    `values` has shape ``(num_global_nodes, ...)``; the result prepends
    the partition axis, with SENTINEL-padded slots zeroed.  Pass the
    result through ``spmd_map`` like every other partitioned array.
    """
    idx = np.asarray(self.node_indices)
    if idx.ndim != 2:
      raise ValueError('shard_nodal requires a partitioned mesh')
    if kind not in ('field', 'covector'):
      raise ValueError(f"kind must be 'field' or 'covector', got {kind!r}")
    values = np.asarray(values)
    valid = idx != topology.SENTINEL
    out = values[np.clip(idx, 0, None)]
    w = valid.astype(values.dtype)
    if kind == 'covector':
      mult = np.zeros(len(values))
      np.add.at(mult, idx[valid], 1.0)
      w = w / np.maximum(mult[np.clip(idx, 0, None)], 1.0)
    return jnp.asarray(out * w.reshape(w.shape + (1,) * (values.ndim - 1)))

  def unshard_nodal(self, shards) -> np.ndarray:
    """Global nodal array from stacked per-partition shards (host-side).

    Copies of a shared dof are averaged (they are equal for consistent
    fields; averaging also tolerates padded-slot zeros being excluded).
    """
    idx = np.asarray(self.node_indices)
    if idx.ndim != 2:
      raise ValueError('unshard_nodal requires a partitioned mesh')
    shards = np.asarray(shards)
    valid = idx != topology.SENTINEL
    num_global = int(idx.max()) + 1
    total = np.zeros((num_global,) + shards.shape[2:], shards.dtype)
    count = np.zeros(num_global)
    np.add.at(total, idx[valid], shards[valid])
    np.add.at(count, idx[valid], 1.0)
    # The deduped global id space may have holes (periodic slave ids are
    # folded into their masters and never appear): leave zeros there.
    return total / np.maximum(count, 1.0).reshape(
        (-1,) + (1,) * (shards.ndim - 2))
