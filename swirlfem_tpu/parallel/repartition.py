"""On-device element repartitioning via the crystal router.

The scalable-setup/load-rebalancing story the reference designed its
crystal router for but never wired up (``communication/crystal_router.py``
is a tested primitive with no mesh consumer upstream): when the element
partitioning changes — load rebalancing between runs, adaptive
repartitioning, or growing/shrinking the device mesh — the element-local
*field data* (solution history, forcing, diagnostics) moves directly
between devices with one sparse all-to-all instead of a host gather +
re-scatter.

Only index bookkeeping (which global element lives where) stays on the
host; the payload bytes ride ICI.  Receivers restore the canonical local
element order of ``Premesh.finalize`` (global-id ascending within a
partition) with an on-device argsort over the routed global ids, so the
output shards line up with a freshly finalized mesh of the new
partitioning.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from swirlfem_tpu.parallel.crystal_router import crystal_router_setup
from swirlfem_tpu.parallel.spmd import spmd_map


def partition_layout(partitions: np.ndarray, num_partitions: int):
  """Global element ids per partition, padded to the max local count.

  Matches the element ordering of ``Premesh.finalize``: partition p holds
  its elements in ascending global order.  Returns ``(ids, counts)`` with
  ids ``(P, capacity)`` int32 (padded with -1) and counts ``(P,)``.
  """
  partitions = np.asarray(partitions).reshape(-1)
  groups = [np.nonzero(partitions == p)[0] for p in range(num_partitions)]
  counts = np.asarray([len(g) for g in groups], dtype=np.int32)
  capacity = int(counts.max())
  ids = np.full((num_partitions, capacity), -1, dtype=np.int32)
  for p, g in enumerate(groups):
    ids[p, :len(g)] = g
  return ids, counts


def repartition_element_fields(mesh, axis_name, old_partitions,
                               new_partitions, fields):
  """Routes per-element field shards from one partitioning to another.

  Args:
    mesh: 1D ``jax.sharding.Mesh`` whose `axis_name` axis carries the
      partitions.
    old_partitions: (num_global_elements,) current owner of each element.
    new_partitions: (num_global_elements,) new owner of each element.
    fields: pytree of stacked ``(P, old_capacity, ...)`` arrays in the
      canonical local element order of `old_partitions`.

  Returns:
    ``(new_fields, new_counts)``: the same pytree re-sharded and re-ordered
    to the canonical local element order of `new_partitions` (padded to
    its capacity), and the per-partition valid counts.
  """
  num = mesh.shape[axis_name]
  old_ids, old_counts = partition_layout(old_partitions, num)
  new_ids, new_counts = partition_layout(new_partitions, num)
  new_capacity = new_ids.shape[1]

  targets = np.where(old_ids >= 0,
                     np.asarray(new_partitions)[old_ids], 0)
  router = crystal_router_setup(mesh, axis_name)
  payload = dict(gid=jnp.asarray(old_ids), fields=fields)
  n_out, routed, _ = router(jnp.asarray(old_counts), payload,
                            jnp.asarray(targets))
  assert int(np.max(np.asarray(n_out))) <= new_capacity

  def reorder(n, gid, flat_fields):
    """Sorts a received shard into canonical (ascending-gid) order."""
    cap = gid.shape[0]
    valid = jnp.arange(cap) < n
    order = jnp.argsort(jnp.where(valid, gid, np.iinfo(np.int32).max))
    out = [jnp.take(f, order[:new_capacity], axis=0) for f in flat_fields]
    return tuple(out)

  flat, treedef = jax.tree_util.tree_flatten(routed['fields'])
  run = spmd_map(lambda n, gid, ff: reorder(n, gid, ff), mesh, axis_name)
  out = run(n_out, routed['gid'], tuple(flat))
  return jax.tree_util.tree_unflatten(treedef, out), jnp.asarray(new_counts)
