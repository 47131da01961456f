"""Element partitioning for distributed meshes.

Parity target: reference ``swirl_fem/common/mesh_partitioner.py``
(partition :22-53), which builds a node-sharing element adjacency graph and
calls METIS via pymetis.  pymetis is unavailable here, so the default
backend is recursive coordinate bisection (RCB) on element centroids — the
classical geometric partitioner: balanced by construction, contiguous on
well-shaped meshes, and dependency-free.  If pymetis happens to be
importable it is used preferentially (graph partitioning usually cuts fewer
shared dofs on irregular meshes).
"""

from __future__ import annotations

import numpy as np

from swirlfem_tpu.core.premesh import Premesh


def element_adjacency(premesh: Premesh) -> list[list[int]]:
  """Adjacency lists: elements sharing at least one node are neighbors."""
  node_to_elems: dict[int, list[int]] = {}
  for e, row in enumerate(np.asarray(premesh.elements)):
    for n in row.tolist():
      node_to_elems.setdefault(int(n), []).append(e)
  adjacency = [set() for _ in range(premesh.num_elements)]
  for elems in node_to_elems.values():
    for a in elems:
      adjacency[a].update(elems)
  return [sorted(s - {e}) for e, s in enumerate(adjacency)]


def _rcb(centroids: np.ndarray, ids: np.ndarray, num_parts: int,
         out: np.ndarray, next_part: int) -> int:
  """Recursive coordinate bisection; returns the next free partition id."""
  if num_parts == 1:
    out[ids] = next_part
    return next_part + 1
  # Split along the axis of largest extent, proportionally to the part
  # counts (handles non-power-of-2).
  extents = centroids[ids].max(axis=0) - centroids[ids].min(axis=0)
  axis = int(np.argmax(extents))
  left_parts = num_parts // 2
  right_parts = num_parts - left_parts
  k = int(round(len(ids) * left_parts / num_parts))
  order = ids[np.argsort(centroids[ids, axis], kind='stable')]
  next_part = _rcb(centroids, order[:k], left_parts, out, next_part)
  return _rcb(centroids, order[k:], right_parts, out, next_part)


def partition(premesh: Premesh, num_partitions: int) -> np.ndarray:
  """Assigns each element a partition id in ``[0, num_partitions)``."""
  if num_partitions < 1:
    raise ValueError(f'num_partitions must be >= 1, got {num_partitions}')
  if num_partitions == 1:
    return np.zeros(premesh.num_elements, dtype=np.int32)
  try:
    import pymetis  # pytype: disable=import-error
    _, parts = pymetis.part_graph(num_partitions,
                                  adjacency=element_adjacency(premesh))
    return np.asarray(parts, dtype=np.int32)
  except ImportError:
    pass
  centroids = np.asarray(premesh.node_coords)[
      np.asarray(premesh.elements)].mean(axis=1)
  out = np.empty(premesh.num_elements, dtype=np.int32)
  _rcb(centroids, np.arange(premesh.num_elements), num_partitions, out, 0)
  return out
