"""Box mesh, p-refinement dedup/orientation, and finalize/exchange tests.

Modeled on ``core/mesh_refiner_test.py`` and ``core/premesh_test.py`` from
the reference: refined shared-facet nodes are created exactly once, interior
node coordinates reconstruct exactly from corner interpolation, and
finalized meshes exchange correctly.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from swirlfem_tpu.core.premesh import Premesh
from swirlfem_tpu.core.quadrature import Nodes1D, NodeType
from swirlfem_tpu.core.refine import refine_premesh
from swirlfem_tpu.utils.box import unit_cube_mesh


def _check_refined_coords(premesh, refined):
  """Every refined element's coords must interpolate its corner coords."""
  from swirlfem_tpu.core.quadrature import interpolation_matrix_1d
  interp = interpolation_matrix_1d(premesh.gridpoints_1d,
                                   refined.gridpoints_1d)
  k = refined.gridpoints_1d.num_points
  ndim = premesh.ndim
  for e in range(premesh.num_elements):
    corners = premesh.node_coords[premesh.elements[e]].reshape(
        (2,) * ndim + (ndim,))
    expected = corners
    for axis in range(ndim):
      expected = np.moveaxis(
          np.tensordot(interp, expected, axes=([1], [axis])), 0, axis)
    got = refined.node_coords[refined.elements[e]].reshape(
        (k,) * ndim + (ndim,))
    np.testing.assert_allclose(got, expected, atol=1e-12)


@pytest.mark.parametrize('ndim,n,order', [(1, 4, 3), (2, 3, 4), (3, 2, 3)])
def test_refine_coords_and_node_count(ndim, n, order):
  pm = unit_cube_mesh(n, ndim=ndim)
  grid = Nodes1D.create(order + 1, NodeType.GAUSS_LOBATTO_LEGENDRE)
  refined = refine_premesh(pm, grid)
  _check_refined_coords(pm, refined)
  # Continuous refinement of a structured box has (n*order + 1)^ndim nodes.
  assert refined.num_nodes == (n * order + 1) ** ndim
  # No duplicate coordinates.
  rounded = np.round(refined.node_coords, 9)
  assert len(np.unique(rounded, axis=0)) == refined.num_nodes


@pytest.mark.smoke
def test_refine_discontinuous_gl():
  pm = unit_cube_mesh(3, ndim=2)
  grid = Nodes1D.create(3, NodeType.GAUSS_LEGENDRE)
  refined = refine_premesh(pm, grid)
  _check_refined_coords(pm, refined)
  # Discontinuous: every element owns all its nodes.
  assert refined.num_nodes == pm.num_elements * 9
  assert refined.physical_groups == {}


def test_refine_boundary_group():
  pm = unit_cube_mesh(3, ndim=2)
  grid = Nodes1D.create(4, NodeType.GAUSS_LOBATTO_LEGENDRE)
  refined = refine_premesh(pm, grid)
  boundary = np.unique(refined.physical_groups['boundary'].reshape(-1))
  # Exactly the nodes on the box boundary, each exactly once.
  coords = refined.node_coords
  on_bdry = np.any((np.abs(coords) < 1e-12) | (np.abs(coords - 1) < 1e-12),
                   axis=1)
  np.testing.assert_array_equal(np.sort(boundary), np.nonzero(on_bdry)[0])


def test_refine_boundary_group_unstructured_path():
  """Same check through the generic (non-box) refiner."""
  pm = unit_cube_mesh(3, ndim=2).replace(box_info=None)
  grid = Nodes1D.create(4, NodeType.GAUSS_LOBATTO_LEGENDRE)
  refined = refine_premesh(pm, grid)
  boundary = refined.physical_groups['boundary']
  assert boundary.shape == (12, 4)  # 12 boundary edges, 4 nodes each
  coords = refined.node_coords[boundary.reshape(-1)]
  on_bdry = np.any((np.abs(coords) < 1e-12) | (np.abs(coords - 1) < 1e-12),
                   axis=1)
  assert on_bdry.all()


@pytest.mark.parametrize('structured', [True, False])
def test_refine_periodic_links_parallel(structured):
  pm = unit_cube_mesh(2, ndim=2, periodic_dims=(0,))
  if not structured:
    pm = pm.replace(box_info=None)
  grid = Nodes1D.create(4, NodeType.GAUSS_LOBATTO_LEGENDRE)
  refined = refine_premesh(pm, grid)
  links = refined.periodic_links
  # Facet granularity differs between the structured (whole-face) and
  # generic (per-element-edge) refiners; pairing semantics are identical.
  assert links.shape == ((1, 2, 7) if structured else (2, 2, 4))
  # Paired nodes must have identical non-periodic coordinates (axis 1).
  a = refined.node_coords[links[:, 0].reshape(-1)]
  b = refined.node_coords[links[:, 1].reshape(-1)]
  np.testing.assert_allclose(a[:, 1], b[:, 1], atol=1e-12)
  np.testing.assert_allclose(np.abs(a[:, 0] - b[:, 0]), 1.0, atol=1e-12)


def test_refine_3d_shared_face_orientation():
  """Two hexes sharing a face: dedup must respect facet orientation."""
  pm = unit_cube_mesh(2, ndim=3)
  grid = Nodes1D.create(4, NodeType.GAUSS_LOBATTO_LEGENDRE)
  refined = refine_premesh(pm, grid)
  _check_refined_coords(pm, refined)


@pytest.mark.smoke
def test_finalize_exchange_periodic():
  pm = unit_cube_mesh(2, ndim=1, periodic_dims=(0,))
  mesh = pm.finalize()
  # Nodes 0 and 2 are periodic images: exchange sums them.
  out = mesh.exchange(jnp.asarray([1.0, 5.0, 10.0]))
  np.testing.assert_allclose(out, [11.0, 5.0, 11.0])


def test_finalize_element_coords():
  pm = unit_cube_mesh(2, ndim=2)
  mesh = pm.finalize()
  ec = mesh.element_coords()
  assert ec.shape == (4, 4, 2)
  np.testing.assert_allclose(np.asarray(ec[0]),
                             [[0, 0], [0, 0.5], [0.5, 0], [0.5, 0.5]])


def test_refine_order1_mesh_required():
  pm = unit_cube_mesh(2, ndim=2)
  refined = refine_premesh(pm, Nodes1D.create(3, NodeType.NEWTON_COTES))
  with pytest.raises(ValueError):
    refine_premesh(refined, Nodes1D.create(4, NodeType.NEWTON_COTES))


def test_structured_path_preserves_custom_groups():
  """A box premesh with CUSTOM physical groups must not take the
  structured fast path (which regenerates groups from box_info and would
  silently drop them)."""
  pm = unit_cube_mesh(4, ndim=2)
  boundary = np.asarray(pm.physical_groups['boundary'])
  coords = np.asarray(pm.node_coords)
  lid = np.array([f for f in boundary
                  if np.allclose(coords[f][:, 1], 1.0)])
  walls = np.array([f for f in boundary
                    if not np.allclose(coords[f][:, 1], 1.0)])
  pm2 = pm.replace(physical_groups={'lid': lid, 'walls': walls})
  grid = Nodes1D.create(4, NodeType.GAUSS_LOBATTO_LEGENDRE)
  mesh = refine_premesh(pm2, grid).finalize()
  assert set(mesh.physical_masks) == {'lid', 'walls'}
  mc = np.asarray(mesh.node_coords)
  lid_mask = np.asarray(mesh.physical_masks['lid'])
  assert lid_mask.any()
  np.testing.assert_allclose(mc[lid_mask.astype(bool), 1], 1.0)
  # Canonical groups still take the fast path (structured numbering).
  assert refine_premesh(pm, grid).structured is not None
  assert refine_premesh(pm2, grid).structured is None


def test_group_mask_folds_periodic_ids():
  """A group node whose id deduped onto its periodic master keeps its
  mask (regression: the mask silently dropped such nodes)."""
  coords = np.array([[0.0], [0.5], [1.0]])
  elements = np.array([[0, 1], [1, 2]], dtype=np.int32)
  links = np.array([[[2], [0]]], dtype=np.int32)  # node 2 ~ node 0
  pm = Premesh.create(node_coords=coords, elements=elements,
                      physical_groups={'right': np.array([[2]])},
                      periodic_links=links)
  mesh = pm.finalize()
  mask = np.asarray(mesh.physical_masks['right']).astype(bool)
  # Node 2's id folded onto node 0; both copies must carry the mask.
  assert mask[2] and mask[0], mask
