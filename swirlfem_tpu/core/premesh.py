"""Host-side staging mesh (numpy) that finalizes into a device `Mesh`.

Parity target: reference ``swirl_fem/core/premesh.py`` (Premesh :37-222).  A
`Premesh` stages connectivity, physical groups, periodic links and an
optional element partitioning; `finalize()` builds the static exchange
indices and produces a device-resident :class:`swirlfem_tpu.core.mesh.Mesh`.

TPU-first difference from the reference: the partitioned finalize does *not*
use ``jax.pmap`` placement (reference ``premesh.py:216``).  It builds stacked
``(num_partitions, ...)`` arrays and, when given a ``jax.sharding.Mesh``,
places them with ``jax.device_put`` + ``NamedSharding(P(axis_name))`` so the
mesh composes with ``jit``/``shard_map`` programs over ICI.
"""

from __future__ import annotations

import dataclasses
from collections.abc import Mapping

import jax
import numpy as np

from swirlfem_tpu.core import topology
from swirlfem_tpu.core.mesh import Mesh
from swirlfem_tpu.core.quadrature import Nodes1D
from swirlfem_tpu.core.quadrature import NodeType


def _group_mask(facets: np.ndarray, node_indices: np.ndarray,
                periodic_links=None) -> np.ndarray:
  """Boolean mask over `node_indices` of membership in the facet node set.

  Facet ids are folded through the periodic dedup first: `node_indices`
  holds POST-dedup ids, so a group node whose id was remapped to its
  periodic master would otherwise silently drop out of the mask (and its
  Dirichlet BC) whenever the master is not itself in the group.
  """
  members = np.unique(np.asarray(facets).reshape(-1))
  members = topology.unique_node_indices(members, periodic_links)
  return np.isin(node_indices, members)


@dataclasses.dataclass(frozen=True)
class Premesh:
  """Staging representation of a mesh, all host-side numpy.

  Attributes:
    order: polynomial order of the elements.
    gridpoints_1d: 1D node family on the reference element.
    node_coords: ``(num_nodes, ndim)`` coordinates.
    elements: ``(num_elements, (order+1)^ndim)`` node ids, lexicographic
      tensor order within each element.
    physical_groups: name -> ``(num_facets, nodes_per_facet)`` facet node ids
      (used for boundary conditions).
    periodic_links: ``(num_pairs, 2, nodes_per_facet)`` parallel arrays of
      node ids identified periodically, or None.
    partitions: ``(num_elements,)`` partition id per element, or None.
  """

  order: int
  gridpoints_1d: Nodes1D
  node_coords: np.ndarray
  elements: np.ndarray
  physical_groups: Mapping[str, np.ndarray]
  periodic_links: np.ndarray | None = None
  partitions: np.ndarray | None = None
  # Structured-box metadata (see core.structured): `box_info` marks an
  # order-1 box premesh as (num_elements_per_dim, periodic_dims) enabling
  # fast-path refinement; `structured` marks a refined premesh whose node
  # numbering is the lexicographic grid (index-free gather/scatter).
  box_info: tuple | None = None
  structured: object | None = None

  @classmethod
  def create(cls, node_coords, elements, order=None, gridpoints_1d=None,
             physical_groups=None, periodic_links=None,
             partitions=None) -> 'Premesh':
    node_coords = np.asarray(node_coords)
    elements = np.asarray(elements)
    ndim = node_coords.shape[-1]
    nper = elements.shape[-1]
    if gridpoints_1d is None:
      num_points = int(round(nper ** (1.0 / ndim)))
      gridpoints_1d = Nodes1D.create(num_points=num_points,
                                     node_type=NodeType.NEWTON_COTES)
    if nper != gridpoints_1d.num_points**ndim:
      raise ValueError(
          f'nodes per element {nper} != {gridpoints_1d.num_points}^{ndim}')
    if order is None:
      order = gridpoints_1d.num_points - 1
    return cls(order=order, gridpoints_1d=gridpoints_1d,
               node_coords=node_coords, elements=elements,
               physical_groups=dict(physical_groups or {}),
               periodic_links=periodic_links, partitions=partitions)

  @property
  def ndim(self) -> int:
    return self.node_coords.shape[-1]

  @property
  def num_nodes(self) -> int:
    return self.node_coords.shape[-2]

  @property
  def num_elements(self) -> int:
    return len(self.elements)

  @property
  def num_nodes_per_element(self) -> int:
    return self.elements.shape[-1]

  def is_partitioned(self) -> bool:
    return self.partitions is not None

  def replace(self, **kwargs) -> 'Premesh':
    return dataclasses.replace(self, **kwargs)

  def finalize(self, axis_name: str | None = None,
               device_mesh: jax.sharding.Mesh | None = None,
               exchange_mode: str = 'auto') -> Mesh:
    """Builds exchange indices and returns a device `Mesh`.

    Args:
      axis_name: collective axis name; required when partitioned.
      device_mesh: optional ``jax.sharding.Mesh`` containing `axis_name`.
        When given, the partitioned mesh arrays are placed with
        ``NamedSharding(P(axis_name))``; otherwise they remain replicated
        stacked arrays (still usable under ``shard_map`` in tests).
      exchange_mode: cross-partition reduction strategy — ``'psum'`` (full
        allreduce over all shared dofs, the reference's pattern),
        ``'neighbors'`` (matched ppermute rounds among sharing partitions
        only; see :class:`swirlfem_tpu.core.topology.NeighborExchange`),
        ``'owner'`` (the TWO-round owner-based schedule — one all_to_all
        of contributions to each dof's owner, one all_to_all of totals
        back; see :class:`swirlfem_tpu.core.topology.OwnerExchange`),
        or ``'auto'`` (neighbors when it at least halves the payload of a
        large psum).
    """
    if exchange_mode not in ('auto', 'psum', 'neighbors', 'owner'):
      raise ValueError(f'unknown exchange_mode: {exchange_mode!r}')
    if not self.is_partitioned():
      node_indices = topology.unique_node_indices(
          np.arange(self.num_nodes, dtype=np.int32), self.periodic_links)
      gather_idx, uniq = topology.exchange_indices(node_indices)
      masks = {name: _group_mask(facets, node_indices,
                                 self.periodic_links)
               for name, facets in self.physical_groups.items()}
      return Mesh.create(
          node_coords=self.node_coords,
          elements=self.elements,
          node_indices=node_indices,
          gridpoints_1d=self.gridpoints_1d,
          physical_masks=masks,
          exchange_gather_indices=gather_idx,
          exchange_unique_indices=uniq,
          structured=self.structured)

    if not axis_name:
      raise ValueError('a partitioned premesh requires an axis_name')

    # Stack per-partition element lists: (P, elems_per_part, nodes_per_elem).
    rows = topology.group_by_partitions(self.partitions)
    stacked = np.where(
        rows[..., None] == topology.SENTINEL, topology.SENTINEL,
        self.elements[np.clip(rows, 0, None)])
    # Partition-local renumbering, then periodic dedup of the global ids.
    # Coordinates must be fetched with the *pre-dedup* ids: the deduped id of
    # a periodic seam node is its image's id, whose coordinates lie on the
    # other side of the domain and would corrupt the element geometry.
    raw_node_indices, local_elements = topology.localize_elements(stacked)
    node_indices = topology.unique_node_indices(raw_node_indices,
                                                self.periodic_links)
    gather_idx, uniq = topology.exchange_indices(node_indices)
    neighbors = None
    # psum payload is known before building the schedule: skip the whole
    # host-side construction when 'auto' would keep psum anyway.
    psum_payload = (int(uniq.max()) + 1 if uniq is not None
                    else gather_idx.shape[-1])
    if exchange_mode == 'owner':
      neighbors = topology.build_owner_exchange(gather_idx, uniq)
    elif exchange_mode == 'neighbors' or (
        exchange_mode == 'auto' and psum_payload >= 4096):
      nt = topology.build_neighbor_exchange(gather_idx, uniq)
      if nt is not None and (
          exchange_mode == 'neighbors'
          or 2 * nt.neighbor_payload <= nt.psum_payload):
        neighbors = nt
    masks = {name: _group_mask(facets, node_indices,
                               self.periodic_links)
             for name, facets in self.physical_groups.items()}
    # Per-partition coordinates; SENTINEL-padded rows point at node 0 (their
    # values are never read because the padded ids do not occur in elements).
    coords = self.node_coords[np.clip(raw_node_indices, 0, None)]

    mesh = Mesh.create(
        node_coords=coords,
        elements=local_elements,
        node_indices=node_indices,
        gridpoints_1d=self.gridpoints_1d,
        physical_masks=masks,
        exchange_gather_indices=gather_idx,
        exchange_unique_indices=uniq,
        axis_name=axis_name,
        exchange_neighbors=neighbors)

    if device_mesh is not None:
      spec = jax.sharding.PartitionSpec(axis_name)
      sharding = jax.sharding.NamedSharding(device_mesh, spec)
      mesh = jax.tree.map(lambda x: jax.device_put(x, sharding), mesh)
    return mesh
