"""Exchange (QQ^T) oracles, modeled on ``core/gather_scatter_test.py``."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from swirlfem_tpu.core import topology as topo

pytestmark = pytest.mark.smoke


def test_gather_scatter_roundtrip():
  u = jnp.asarray([1.0, 2.0, 3.0, 4.0])
  idx = np.array([[0, 1], [1, 2], [2, 3]])
  local = topo.gather(u, idx, fill_value=0.0)
  np.testing.assert_allclose(local, [[1, 2], [2, 3], [3, 4]])
  back = topo.scatter(local, idx, num_nodes=4)
  np.testing.assert_allclose(back, [1, 4, 6, 4])


def test_gather_scatter_with_sentinel():
  u = jnp.asarray([1.0, 2.0, 3.0])
  idx = np.array([[0, 1], [2, topo.SENTINEL]])
  local = topo.gather(u, idx, fill_value=0.0)
  np.testing.assert_allclose(local, [[1, 2], [3, 0]])
  back = topo.scatter(jnp.ones_like(local), idx, num_nodes=3)
  np.testing.assert_allclose(back, [1, 1, 1])


def test_unique_node_indices_periodic():
  # Two-element line with ends identified: 0--1--2, link (0, 2).
  links = np.array([[[0], [2]]])
  uniq = topo.unique_node_indices(np.arange(3, dtype=np.int32), links)
  np.testing.assert_array_equal(uniq, [0, 1, 0])


def test_unique_node_indices_transitive_chain():
  # Chain of identifications 0~3, 3~5 collapses to min id 0.
  links = np.array([[[0], [3]], [[3], [5]]])
  uniq = topo.unique_node_indices(np.arange(6, dtype=np.int32), links)
  np.testing.assert_array_equal(uniq, [0, 1, 2, 0, 4, 0])


def test_exchange_unpartitioned_periodic():
  # node ids [0, 1, 2, 0]: first and last are copies of dof 0.
  node_indices = np.array([0, 1, 2, 0], dtype=np.int32)
  gidx, uniq = topo.exchange_indices(node_indices)
  u = jnp.asarray([1.0, 5.0, 7.0, 10.0])
  out = topo.exchange(u, gidx, uniq)
  np.testing.assert_allclose(out, [11.0, 5.0, 7.0, 11.0])


def test_exchange_noop_when_no_shared():
  node_indices = np.arange(4, dtype=np.int32)
  gidx, uniq = topo.exchange_indices(node_indices)
  u = jnp.asarray([1.0, 2.0, 3.0, 4.0])
  out = topo.exchange(u, gidx, uniq)
  np.testing.assert_allclose(out, u)


def test_exchange_partitioned_oracle():
  """Hand-computed 1D partitioned case (reference gather_scatter.py:79-98).

  Three 1D elements over nodes 0..3, partition0 = [[0,1],[1,2]],
  partition1 = [[2,3]]; global node 1 is interior to partition 0, nodes 2
  shared across partitions.
  """
  node_indices = np.array([[0, 1, 2], [2, 3, topo.SENTINEL]], dtype=np.int32)
  gidx, uniq = topo.exchange_indices(node_indices)
  assert uniq is None
  # Only global id 2 is shared; partition 0 holds it at pos 2, partition 1
  # at pos 0.
  np.testing.assert_array_equal(gidx, [[2], [0]])

  us = jnp.asarray([[1.0, 2.0, 3.0], [4.0, 5.0, 0.0]])

  def run(u, g):
    return topo.exchange(u, g, unique_indices=None, axis_name='i')

  out = jax.vmap(run, axis_name='i')(us, jnp.asarray(gidx))
  np.testing.assert_allclose(out, [[1.0, 2.0, 7.0], [7.0, 5.0, 0.0]])


def test_exchange_partitioned_intra_partition_duplicates():
  """Periodic images within one partition: K-slot layout.

  The reference raises on this configuration
  (``swirl_fem/core/gather_scatter.py:349-353``); here slot (r, c) holds
  the c-th local copy of shared dof r with a static segment map, so the
  psum payload stays one float per shared dof.
  """
  node_indices = np.array([[0, 1, 0], [0, 2, 3]], dtype=np.int32)
  gidx, uniq = topo.exchange_indices(node_indices)
  assert gidx.shape == (2, 2)      # one shared dof, two slots
  np.testing.assert_array_equal(uniq, [0, 0])
  us = jnp.asarray([[1.0, 2.0, 4.0], [8.0, 16.0, 32.0]])

  def run(u, g):
    return topo.exchange(u, g, unique_indices=uniq, axis_name='i')

  out = jax.vmap(run, axis_name='i')(us, jnp.asarray(gidx))
  np.testing.assert_allclose(out, [[13.0, 2.0, 13.0], [13.0, 16.0, 32.0]])


def test_group_by_partitions_padding():
  parts = np.array([0, 1, 0, 1, 1])
  rows = topo.group_by_partitions(parts)
  np.testing.assert_array_equal(rows, [[0, 2, topo.SENTINEL], [1, 3, 4]])


def test_localize_elements():
  elements = np.array([[[2, 3], [3, 4]], [[4, 5], [5, 2]]])
  node_indices, local = topo.localize_elements(elements)
  np.testing.assert_array_equal(node_indices, [[2, 3, 4], [2, 4, 5]])
  np.testing.assert_array_equal(local, [[[0, 1], [1, 2]], [[1, 2], [2, 0]]])
