"""Sparse dynamic all-to-all ("crystal router") for distributed mesh setup.

Parity target: reference ``swirl_fem/communication/crystal_router.py``
(crystal_router_setup :36, semantics :57-110): route variable-length
per-device payloads (pytrees sharing one dynamic length) to arbitrary target
devices, returning the received payloads, their count, and (optionally) a
`source` array making the routing invertible.

TPU-first redesign: the reference implements the classical log2(P)
recursive-bisection crystal router (Fox et al. 1988) out of masked selects +
``lax.pshuffle`` rounds.  On TPU, XLA exposes the hardware-native primitive
directly: ``lax.ragged_all_to_all`` moves exactly the bytes that need to
move in one collective over ICI.  The algorithm here is:

  1. stable-sort valid entries by target device,
  2. exchange per-destination counts with one ``all_gather`` (a P x P
     count matrix, from which send/recv offsets are derived),
  3. one ``ragged_all_to_all`` per payload leaf (plus one for the source
     ids).

`crystal_router_spmd` is the jit/shard_map-composable core with a static
output capacity; `crystal_router_setup` wraps it pmap-style over stacked
arrays with the reference's adaptive capacity-doubling host loop (an
intentional host sync, as in the reference's buffer-resize retry,
``crystal_router.py:202-234``).
"""

from __future__ import annotations

import functools
from typing import Any

import jax
from jax import lax
import jax.numpy as jnp
import numpy as np

from swirlfem_tpu.parallel.spmd import spmd_map


def _counts_and_order(n, target, num_devices):
  """Per-destination counts and the stable order sorting valid-by-target."""
  cap = target.shape[0]
  valid = jnp.arange(cap) < n
  # Invalid entries sort to a trailing sentinel bucket.
  key = jnp.where(valid, target, num_devices)
  order = jnp.argsort(key, stable=True)
  counts = jnp.zeros(num_devices, dtype=jnp.int32).at[key].add(
      valid.astype(jnp.int32), mode='drop')
  return counts, order


def ragged_offsets(count_matrix, me):
  """Offset/size vectors for ``lax.ragged_all_to_all`` on device ``me``.

  Pure function of the all-gathered ``(P, P)`` count matrix
  (``count_matrix[src, dst]``), factored out so the ragged plan is
  unit-testable on backends without the collective (XLA:CPU): the
  placement it induces — chunk from src s lands after chunks from lower
  srcs, within-chunk order preserved — must equal the dense fallback's
  compaction order (tests/test_comm.py).

  Returns ``(input_offsets, send_sizes, output_offsets, recv_sizes)``.
  """
  num = count_matrix.shape[0]
  counts = count_matrix[me].astype(jnp.int32)
  recv_sizes = count_matrix[:, me].astype(jnp.int32)
  input_offsets = jnp.concatenate(
      [jnp.zeros(1, jnp.int32), jnp.cumsum(counts)[:-1].astype(jnp.int32)])
  # Where my chunk lands in dst's buffer: after chunks from lower srcs.
  lower_src = jnp.arange(num)[:, None] < me
  output_offsets = jnp.sum(jnp.where(lower_src, count_matrix, 0),
                           axis=0).astype(jnp.int32)
  return input_offsets, counts, output_offsets, recv_sizes


def crystal_router_spmd(n, data, target, *, axis_name, out_capacity,
                        return_source=True, implementation=None):
  """Sparse all-to-all inside an existing shard_map context.

  Args:
    n: per-device valid length (scalar int32).
    data: pytree of ``(capacity, ...)`` arrays; entries ``[0, n)`` are live.
    target: ``(capacity,)`` int32 destination axis indices for live entries.
    axis_name: the mapped axis.
    out_capacity: static size of the receive buffers.  Received entries
      beyond it are dropped — callers should check ``n_out <= out_capacity``
      (`crystal_router_setup` automates this with a retry loop).
    return_source: also return the origin axis index of each received entry.

  Returns:
    ``(n_out, data_out[, source])`` with shapes like the inputs but
    `out_capacity` rows; ordering within a device is unspecified but
    consistent across leaves and `source`.
  """
  if implementation is None:
    implementation = ('ragged' if jax.default_backend() == 'tpu'
                      else 'dense')
  num = int(lax.psum(1, axis_name=axis_name))
  me = lax.axis_index(axis_name)
  cap = target.shape[0]
  counts, order = _counts_and_order(n, target, num)

  # count_matrix[src, dst] on every device.
  count_matrix = lax.all_gather(counts, axis_name)
  input_offsets, send_sizes, output_offsets, recv_sizes = ragged_offsets(
      count_matrix, me)
  n_out = jnp.sum(recv_sizes)

  if implementation == 'ragged':
    def route(leaf):
      sorted_leaf = leaf[order]
      out = jnp.zeros((out_capacity,) + leaf.shape[1:], dtype=leaf.dtype)
      return lax.ragged_all_to_all(
          sorted_leaf, out, input_offsets, send_sizes, output_offsets,
          recv_sizes, axis_name=axis_name)
  elif implementation == 'ppermute':
    # Simulation of the ragged collective's exact data movement with P - 1
    # ppermute rotation rounds, driven by the SAME ``ragged_offsets`` plan:
    # each receiver slices the chunk destined for it out of the rotating
    # send buffer at the sender's input offset and scatters it to its own
    # output offset.  Exercises the send/recv-offset plumbing (not just the
    # plan arithmetic) on backends without ``lax.ragged_all_to_all``
    # (XLA:CPU) at >1 participants; placement is asserted equal to the
    # dense path in tests/test_comm.py.  O(P * capacity) traffic — a test
    # harness, not a production path.
    idx = jnp.arange(cap)

    def _place(out, buf, src):
      # src's plan, recomputed from the replicated count matrix: where my
      # chunk starts in src's sorted buffer and where it lands in mine.
      in_off, send_sz, out_off, _ = ragged_offsets(count_matrix, src)
      start, size, tgt = in_off[me], send_sz[me], out_off[me]
      valid = (idx >= start) & (idx < start + size)
      dest = jnp.where(valid, idx - start + tgt, out_capacity)
      return out.at[dest].set(buf, mode='drop')

    def route(leaf):
      sorted_leaf = leaf[order]
      out = jnp.zeros((out_capacity,) + leaf.shape[1:], dtype=leaf.dtype)
      out = _place(out, sorted_leaf, me)  # local chunk, round 0
      perm = [(i, (i + 1) % num) for i in range(num)]
      buf = sorted_leaf
      for r in range(1, num):
        buf = lax.ppermute(buf, axis_name, perm)
        out = _place(out, buf, (me - r) % num)
      return out
  else:
    # Dense fallback (XLA:CPU has no ragged-all-to-all): bucket entries by
    # destination into a (P, cap) buffer, dense all_to_all, then compact.
    # O(P * cap) buffer - fine for setup-scale traffic.
    dest_of_sorted = jnp.clip(
        jnp.searchsorted(jnp.cumsum(send_sizes), jnp.arange(cap),
                         side='right'), 0, num - 1)
    slot_in_bucket = jnp.arange(cap) - input_offsets[dest_of_sorted]
    sorted_valid = jnp.arange(cap) < n
    # Validity of received rows: row r from src s is live iff
    # r < count_matrix[s, me].
    recv_valid = (jnp.arange(cap)[None, :] < recv_sizes[:, None]).reshape(-1)
    compact_order = jnp.argsort(~recv_valid, stable=True)[:out_capacity]

    def route(leaf):
      sorted_leaf = leaf[order]
      bucket = jnp.zeros((num, cap) + leaf.shape[1:], dtype=leaf.dtype)
      bucket = bucket.at[dest_of_sorted, slot_in_bucket].set(
          jnp.where(
              sorted_valid.reshape((-1,) + (1,) * (leaf.ndim - 1)),
              sorted_leaf, jnp.zeros_like(sorted_leaf)),
          mode='drop')
      received = lax.all_to_all(bucket, axis_name, split_axis=0,
                                concat_axis=0, tiled=False)
      flat = received.reshape((num * cap,) + leaf.shape[1:])
      out = flat[compact_order]
      pad = out_capacity - out.shape[0]
      if pad > 0:
        out = jnp.concatenate(
            [out, jnp.zeros((pad,) + leaf.shape[1:], dtype=leaf.dtype)])
      return out

  data_out = jax.tree_util.tree_map(route, data)
  if not return_source:
    return n_out, data_out
  src_ids = jnp.full(target.shape, me, dtype=jnp.int32)
  source = route(src_ids)
  return n_out, data_out, source


def crystal_router_setup(mesh: jax.sharding.Mesh, axis_name):
  """Returns a host-level crystal router over `axis_name` of `mesh`.

  The returned function takes stacked arrays (leading axis = device axis)
  and performs the exchange, growing the receive capacity by doubling until
  everything fits (host-synced retry, as in the reference).
  """

  @functools.cache
  def compiled(capacity: int, treedef, return_source: bool):
    def run(n, flat_data, target):
      data = jax.tree_util.tree_unflatten(treedef, flat_data)
      return crystal_router_spmd(
          n, data, target, axis_name=axis_name, out_capacity=capacity,
          return_source=return_source)
    return spmd_map(run, mesh, axis_name)

  def crystal_router(n, data, target, return_source: bool = True):
    n = jnp.asarray(n, jnp.int32)
    target = jnp.asarray(target, jnp.int32)
    flat, treedef = jax.tree_util.tree_flatten(data)
    capacity = max(1, int(np.exp2(np.ceil(np.log2(target.shape[1])))))
    while True:
      out = compiled(capacity, treedef, return_source)(n, tuple(flat), target)
      n_out = out[0]
      max_n = int(np.max(np.asarray(n_out)))  # host sync (intentional)
      if max_n <= capacity:
        return out
      capacity = max(capacity * 2, int(np.exp2(np.ceil(np.log2(max_n)))))

  return crystal_router
