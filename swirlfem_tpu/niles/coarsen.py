"""DNS -> LES restriction: the missing resolution bridge of the pipeline.

The published pipeline trains a 12x12 order-4 LES solver against DNS
trajectories generated at 64x64 order-8 (reference ``niles/datagen/
datagen.py:48-56``, ``niles/config/niles.py:76-82``) — but the released
input pipeline feeds raw DNS-resolution shards straight into the coarse
solver, whose gather immediately rejects the 513^2-node fields (the shard
counts hard-coded at ``niles/input_pipeline.py:30-44`` reference an
internally preprocessed dataset that never shipped).  This module supplies
the bridge: EXACT point evaluation of the DNS spectral-element expansion at
the LES mesh nodes on the (doubly) periodic unit box, precomputed as one
gather + weighted reduction per field.

Velocity restricts GLL->GLL, pressure GL->GL (discontinuous: evaluation is
element-local either way).  The tables are host-side numpy; the returned
callables are jax-traceable (a fancy-index gather and an einsum).
"""

from __future__ import annotations

import numpy as np

from swirlfem_tpu.core.quadrature import lagrange_eval_matrix
from swirlfem_tpu.core.quadrature import Nodes1D
from swirlfem_tpu.core.quadrature import NodeType
from swirlfem_tpu.core.refine import refine_premesh
from swirlfem_tpu.utils.box import unit_cube_mesh


def _point_eval_tables(src_mesh, src_grid_size: int, src_nodes1d: Nodes1D,
                       target_coords: np.ndarray, ndim: int):
  """(idx, w): src element-node gather ids and tensor-basis weights such
  that ``field_at_targets = (u[idx] * w).sum(axis=1)`` evaluates the SEM
  expansion of `u` exactly at `target_coords` (unit box, uniform grid)."""
  x = np.asarray(target_coords, dtype=np.float64)
  n = src_grid_size
  cell = np.clip(np.floor(x * n).astype(np.int64), 0, n - 1)
  xi = 2.0 * (x * n - cell) - 1.0                    # per-axis ref coords

  # Element id of each cell from element centers (robust to any element
  # ordering convention).
  elements = np.asarray(src_mesh.elements)
  centers = np.asarray(src_mesh.node_coords)[elements].mean(axis=1)
  ccell = np.clip(np.floor(centers * n).astype(np.int64), 0, n - 1)
  eid_of_cell = np.full((n,) * ndim, -1, dtype=np.int64)
  eid_of_cell[tuple(ccell.T)] = np.arange(len(elements))
  assert (eid_of_cell >= 0).all(), 'uniform box expected'
  eid = eid_of_cell[tuple(cell.T)]                   # (n_targets,)

  # Tensor-product Lagrange basis at the per-axis reference coordinates
  # (lexicographic, axis 0 slowest — the element-local node convention).
  ws = [lagrange_eval_matrix(src_nodes1d, xi[:, a]) for a in range(ndim)]
  w = ws[0]
  for a in range(1, ndim):
    w = (w[:, :, None] * ws[a][:, None, :]).reshape(len(x), -1)
  idx = elements[eid]                                # (n_targets, k^d)
  return idx.astype(np.int32), w


def make_restriction(dns_grid_size: int, dns_order: int, config):
  """Returns ``fn({'u', 'p', ...}) -> dict`` restricting DNS windows to the
  LES meshes of `config` (element_grid_size/order), leaving other keys and
  leading (batch/window) axes untouched."""
  ndim = config.ndim
  periodic = tuple(range(ndim))

  dns_v_nodes = Nodes1D.create(dns_order + 1,
                               NodeType.GAUSS_LOBATTO_LEGENDRE)
  dns_p_nodes = Nodes1D.create(dns_order - 1, NodeType.GAUSS_LEGENDRE)
  dns_pm = unit_cube_mesh(dns_grid_size, ndim=ndim, periodic_dims=periodic)
  dns_v_mesh = refine_premesh(dns_pm, dns_v_nodes).finalize()
  dns_p_mesh = refine_premesh(dns_pm, dns_p_nodes).finalize()

  les_pm = unit_cube_mesh(config.element_grid_size, ndim=ndim,
                          periodic_dims=periodic)
  les_v_mesh = refine_premesh(
      les_pm, Nodes1D.create(config.order + 1,
                             NodeType.GAUSS_LOBATTO_LEGENDRE)).finalize()
  les_p_mesh = refine_premesh(
      les_pm, Nodes1D.create(config.order - 1,
                             NodeType.GAUSS_LEGENDRE)).finalize()

  idx_v, w_v = _point_eval_tables(
      dns_v_mesh, dns_grid_size, dns_v_nodes,
      np.asarray(les_v_mesh.node_coords), ndim)
  idx_p, w_p = _point_eval_tables(
      dns_p_mesh, dns_grid_size, dns_p_nodes,
      np.asarray(les_p_mesh.node_coords), ndim)

  n_dns_v = dns_v_mesh.num_nodes
  n_dns_p = dns_p_mesh.num_nodes

  def apply_u(vals):
    # (..., n_dns_v, ndim) -> (..., n_les_v, ndim)
    g = np.take(np.asarray(vals), idx_v, axis=-2)   # (..., n_t, k^d, d)
    return (g * w_v[..., None].astype(g.dtype)).sum(axis=-2)

  def apply_p(vals):
    # (..., n_dns_p) -> (..., n_les_p)
    g = np.take(np.asarray(vals), idx_p, axis=-1)   # (..., n_t, k^d)
    return (g * w_p.astype(g.dtype)).sum(axis=-1)

  def restrict(window: dict) -> dict:
    out = dict(window)
    if 'u' in out and out['u'].shape[-2] == n_dns_v:
      out['u'] = apply_u(out['u'])
    if 'p' in out and out['p'].shape[-1] == n_dns_p:
      out['p'] = apply_p(out['p'])
    return out

  return restrict
