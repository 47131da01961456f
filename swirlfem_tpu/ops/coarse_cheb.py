"""Matrix-free Chebyshev vertex-coarse solve for two-level Schwarz.

Above the dense-inverse cap (``max_coarse_dofs``) the Q1 vertex coarse
operator can no longer be explicitly (pseudo-)inverted: the stored inverse
is O(nv^2) memory and the sparse-LU back-substitution for its nv identity
columns dominates the whole Schwarz setup (measured 199 s and 2.2 GB at
nv = 16,641 in ``experiments/schwarz_scale.py``; nv = 66k would need 35 GB).
This module solves the coarse system MATRIX-FREE instead:

  * the sparse Q1 stiffness in padded-ELL form, so the device matvec is one
    ``(nv, kmax)`` gather + row reduction — dense, static-shaped, and
    TPU-friendly (no CSR pointer chasing);
  * a fixed-degree Chebyshev semi-iteration.  A fixed polynomial in the
    preconditioned operator keeps the map rhs -> solution LINEAR and
    symmetric positive (semi-)definite — unlike an inner CG, whose iterates
    depend nonlinearly on the rhs and would silently break the outer CG;
  * preconditioned by Jacobi + a plain-aggregation two-grid correction
    (greedy BFS aggregates of ~``agg_size`` vertices; dense
    (pseudo-)inverse of the small aggregated Galerkin operator).  The
    two-grid term bounds the preconditioned condition number by the
    aggregate diameter, so the Chebyshev degree stays O(10) instead of the
    O(sqrt(kappa)) = O(1/h) a bare-Jacobi Chebyshev would need.

Setup is O(nnz): sparse assembly, ~tens of host PCG iterations for
eigenvalue estimates (Ritz values of the PCG tridiagonal), one small dense
inverse, and a measured-contraction verification loop that doubles the
degree until the requested tolerance is actually achieved.

Reference context: the reference has no two-level machinery at all (its
pressure solve is unpreconditioned CG,
``swirl_fem/navier_stokes/navier_stokes.py:449-452``); this extends the
beyond-parity Schwarz stack (`ops/schwarz.py`, `ops/schwarz_distributed.py`)
to meshes beyond the dense-coarse range.
"""

from __future__ import annotations

import math

import flax.struct
import jax
from jax import lax
import jax.numpy as jnp
import numpy as np


@flax.struct.dataclass
class ChebCoarse:
  """Device-side fixed-degree Chebyshev solve of the vertex coarse system.

  ``solve(rc)`` approximates ``scale * pinv(A) @ rc`` (the same contract as
  the dense ``inv_c`` rows it replaces, including the nullspace projection
  for enclosed/periodic flow).
  """

  ell_idx: jax.Array      # (nv, kmax) int32 neighbor ids (self-padded)
  ell_val: jax.Array      # (nv, kmax) matrix entries (0 on padding)
  dinv: jax.Array         # (nv,) inverse diagonal (Jacobi term)
  agg_id: jax.Array       # (nv,) int32 aggregate of each vertex
  acc_inv: jax.Array      # (na, na) dense (pseudo-)inverse of Pt A P
  lam_min: jax.Array      # scalar: spectral bounds of M^{-1} A
  lam_max: jax.Array
  scale: jax.Array        # beta_k / dt (the dense path folded this in)
  degree: int = flax.struct.field(pytree_node=False)
  num_aggregates: int = flax.struct.field(pytree_node=False)
  has_nullspace: bool = flax.struct.field(pytree_node=False)
  # Measured relative residual of one fixed-degree application on a random
  # rhs at setup (the degree-verification loop's achieved contraction).
  verified_rel_residual: float = flax.struct.field(pytree_node=False,
                                                   default=0.0)

  def _matvec(self, x):
    return (self.ell_val * x[self.ell_idx]).sum(axis=1)

  def _precond(self, r):
    """Jacobi + aggregation two-grid correction (symmetric additive)."""
    hp = lax.Precision.HIGHEST
    rc = jax.ops.segment_sum(r, self.agg_id,
                             num_segments=self.num_aggregates)
    yc = jnp.matmul(self.acc_inv, rc, precision=hp)
    z = self.dinv * r + yc[self.agg_id]
    if self.has_nullspace:
      z = z - jnp.mean(z)
    return z

  def solve(self, b):
    """Fixed-polynomial Chebyshev solve; linear and SPD in ``b``."""
    b = b.astype(self.ell_val.dtype)
    if self.has_nullspace:
      b = b - jnp.mean(b)
    theta = 0.5 * (self.lam_max + self.lam_min)
    delta = 0.5 * (self.lam_max - self.lam_min)
    sigma = theta / delta
    z = self._precond(b)
    d = z / theta
    x = d
    rho = 1.0 / sigma
    # Residual maintained LAZILY: body subtracts the PREVIOUS step's A d
    # at its top, so the final (unconsumed) residual update is never
    # computed — degree-1 matvecs total, not degree.
    r = b

    def body(carry, _):
      x, r, d, rho = carry
      r = r - self._matvec(d)
      z = self._precond(r)
      rho_new = 1.0 / (2.0 * sigma - rho)
      d = (rho_new * rho) * d + (2.0 * rho_new / delta) * z
      x = x + d
      return (x, r, d, rho_new), None

    if self.degree > 1:
      (x, r, d, rho), _ = lax.scan(body, (x, r, d, rho), None,
                                   length=self.degree - 1)
    if self.has_nullspace:
      x = x - jnp.mean(x)
    return self.scale * x


def _cheb_solve_np(matvec, precond, b, lam_min: float, lam_max: float,
                   degree: int, project: bool):
  """Numpy twin of `ChebCoarse.solve` (same lazy-residual recurrence).

  Used by the setup-time degree verification; a test pins it against the
  device implementation so the verified degree is the deployed one.
  Returns ``(x, r_lazy)`` where ``r_lazy`` is the residual BEFORE the
  final search-direction update (one matvec short of the true residual,
  exactly as on device).
  """
  if project:
    b = b - b.mean()
  theta = 0.5 * (lam_max + lam_min)
  delta = 0.5 * (lam_max - lam_min)
  sigma = theta / delta
  z = precond(b)
  d = z / theta
  x = d.copy()
  rho = 1.0 / sigma
  r = b.copy()
  for _ in range(degree - 1):
    r = r - matvec(d)
    z = precond(r)
    rho_new = 1.0 / (2.0 * sigma - rho)
    d = (rho_new * rho) * d + (2.0 * rho_new / delta) * z
    x = x + d
    rho = rho_new
  if project:
    x = x - x.mean()
  return x, r


def _aggregate_vertices(indptr: np.ndarray, indices: np.ndarray, nv: int,
                        agg_size: int) -> tuple[np.ndarray, int]:
  """Greedy BFS plain aggregation of the vertex graph.

  Grows each aggregate breadth-first from an unaggregated seed up to
  ``agg_size`` members; a second pass attaches any stragglers to the
  smallest neighboring aggregate (so every vertex is covered and P has
  exactly one 1 per row).
  """
  agg = np.full(nv, -1, dtype=np.int64)
  sizes = []
  na = 0
  for seed in range(nv):
    if agg[seed] >= 0:
      continue
    members = [seed]
    agg[seed] = na
    queue = [seed]
    while queue and len(members) < agg_size:
      u = queue.pop(0)
      for w in indices[indptr[u]:indptr[u + 1]]:
        if agg[w] < 0 and len(members) < agg_size:
          agg[w] = na
          members.append(w)
          queue.append(w)
    sizes.append(len(members))
    na += 1
  # Attach singleton/straggler aggregates to a neighbor (keeps aggregate
  # count near nv/agg_size even on awkward orderings).
  for v in range(nv):
    if sizes[agg[v]] > 1:
      continue
    best = -1
    for w in indices[indptr[v]:indptr[v + 1]]:
      a = agg[w]
      if a != agg[v] and (best < 0 or sizes[a] < sizes[best]):
        best = a
    if best >= 0 and sizes[best] < 4 * agg_size:
      sizes[agg[v]] -= 1
      agg[v] = best
      sizes[best] += 1
  # Compact ids (some may have emptied in the straggler pass).
  used = np.unique(agg)
  remap = np.full(na, -1, dtype=np.int64)
  remap[used] = np.arange(len(used))
  return remap[agg], len(used)


def _csr_to_ell(a_csr) -> tuple[np.ndarray, np.ndarray]:
  """Padded-ELL (idx, val) from CSR; padding gathers the row's own vertex
  with weight 0 (keeps padded gathers local instead of hammering row 0)."""
  nv = a_csr.shape[0]
  counts = np.diff(a_csr.indptr)
  kmax = int(counts.max())
  idx = np.repeat(np.arange(nv, dtype=np.int64)[:, None], kmax, axis=1)
  val = np.zeros((nv, kmax))
  for v in range(nv):
    lo, hi = a_csr.indptr[v], a_csr.indptr[v + 1]
    k = hi - lo
    idx[v, :k] = a_csr.indices[lo:hi]
    val[v, :k] = a_csr.data[lo:hi]
  return idx, val


def _pcg_eig_bounds(matvec, precond, nv: int, has_nullspace: bool,
                    iters: int = 60, seed: int = 0) -> tuple[float, float]:
  """Extremal Ritz values of the PCG (Lanczos) tridiagonal for M^{-1}A."""
  rng = np.random.default_rng(seed)
  b = rng.standard_normal(nv)
  if has_nullspace:
    b -= b.mean()
  x = np.zeros(nv)
  r = b.copy()
  z = precond(r)
  p = z.copy()
  rz = float(r @ z)
  rz0 = rz
  alphas, betas = [], []
  for _ in range(min(iters, nv)):
    ap = matvec(p)
    pap = float(p @ ap)
    if pap <= 0 or rz <= 0:
      break
    alpha = rz / pap
    alphas.append(alpha)
    x += alpha * p
    r -= alpha * ap
    z = precond(r)
    rz_new = float(r @ z)
    # Stop on CONVERGENCE relative to the initial residual: once PCG has
    # converged to rounding level, further Lanczos directions are noise
    # and produce spurious (observed: 1e8x) Ritz values.
    if not np.isfinite(rz_new) or rz_new <= 1e-24 * rz0:
      break
    beta = rz_new / rz
    betas.append(beta)
    rz = rz_new
    p = z + beta * p
  k = len(alphas)
  if k == 0:
    return 1.0, 1.0
  t = np.zeros((k, k))
  for j in range(k):
    t[j, j] = 1.0 / alphas[j] + (betas[j - 1] / alphas[j - 1] if j else 0.0)
    if j + 1 < k and j < len(betas):
      off = math.sqrt(max(betas[j], 0.0)) / alphas[j]
      t[j, j + 1] = t[j + 1, j] = off
  ritz = np.linalg.eigvalsh(t)
  return float(ritz[0]), float(ritz[-1])


def _degree_for(tol: float, lam_min: float, lam_max: float) -> int:
  kappa = max(lam_max / max(lam_min, 1e-30), 1.0 + 1e-12)
  c = (math.sqrt(kappa) - 1.0) / (math.sqrt(kappa) + 1.0)
  if c <= 0.0:
    return 1
  return max(1, math.ceil(math.log(2.0 / tol) / -math.log(c)))


def build_cheb_vertex_coarse(premesh, boundary_conditions, uid, el_uid,
                             nv: int, dt: float, time_order: int,
                             has_nullspace: bool, *, rdtype,
                             tol: float = 1e-2, agg_size: int = 8,
                             max_agg_dofs: int = 2048,
                             max_degree: int = 200) -> ChebCoarse:
  """Host-side O(nnz) setup of the matrix-free vertex coarse solve.

  Same contract as `ops.schwarz._vertex_coarse_inverse` (including the
  do-nothing-outflow Dirichlet rows and the enclosed-flow nullspace
  projection), but returns a `ChebCoarse` instead of a dense matrix.
  ``tol`` is the verified relative residual of one fixed-degree
  application on a random rhs — the degree doubles (up to ``max_degree``)
  until the measured contraction achieves it.
  """
  import scipy.sparse as sp
  from swirlfem_tpu.nse.solver import bdfk_coeffs
  from swirlfem_tpu.ops import schwarz as _schwarz

  beta_k = float(bdfk_coeffs(time_order)[-1])
  # Shared with the sparse-LU dense-inverse path so both coarse solves
  # assemble the bit-identical operator (do-nothing-outflow pinning
  # included).  The singular enclosed case is handled here by projection,
  # not grounding, so vertex 0 stays live.
  rows, cols, data, diag_ref = _schwarz._vertex_coarse_coo(
      premesh, boundary_conditions, uid, el_uid, nv, has_nullspace,
      ground_vertex0=False)

  a_csr = sp.coo_matrix((data, (rows, cols)), shape=(nv, nv)).tocsr()
  a_csr.sum_duplicates()
  a_csr.eliminate_zeros()

  diag = a_csr.diagonal().copy()
  diag[diag <= 0] = diag_ref
  dinv = 1.0 / diag

  # Plain aggregation; grow aggregates if the coarse-coarse space would
  # exceed the dense budget.
  size = max(agg_size, math.ceil(nv / max_agg_dofs))
  while True:
    agg_id, na = _aggregate_vertices(a_csr.indptr, a_csr.indices, nv, size)
    if na <= int(1.25 * max_agg_dofs) or size >= nv:
      break
    size *= 2
  p_mat = sp.coo_matrix(
      (np.ones(nv), (np.arange(nv), agg_id)), shape=(nv, na)).tocsr()
  acc = (p_mat.T @ a_csr @ p_mat).toarray()
  if has_nullspace:
    acc_inv, _ = _schwarz._pinv_psd(acc)
  else:
    acc_inv = np.linalg.inv(acc)
    acc_inv = 0.5 * (acc_inv + acc_inv.T)

  def precond_np(r):
    z = dinv * r + p_mat @ (acc_inv @ (p_mat.T @ r))
    if has_nullspace:
      z = z - z.mean()
    return z

  lam_min, lam_max = _pcg_eig_bounds(
      lambda v: a_csr @ v, precond_np, nv, has_nullspace)
  lam_min *= 0.7   # Ritz values sit inside the true interval
  lam_max *= 1.05
  degree = min(max_degree, _degree_for(tol, lam_min, lam_max))

  # Verified contraction: run the actual fixed-degree recurrence
  # (`_cheb_solve_np`, the pinned numpy twin of `ChebCoarse.solve`) on a
  # random rhs; double the degree until the measured relative residual
  # meets tol (theory can be off when the Ritz bounds are loose).
  rng = np.random.default_rng(1)
  b = rng.standard_normal(nv)
  if has_nullspace:
    b -= b.mean()
  bnorm = float(np.linalg.norm(b))

  def run_cheb(deg):
    x, _ = _cheb_solve_np(lambda v: a_csr @ v, precond_np, b,
                          lam_min, lam_max, deg, has_nullspace)
    return float(np.linalg.norm(b - a_csr @ x)) / bnorm

  rel = run_cheb(degree)
  while degree < max_degree and rel > tol:
    degree = min(max_degree, 2 * degree)
    rel = run_cheb(degree)
  if rel > tol:
    import warnings
    warnings.warn(
        f'cheb vertex coarse: measured contraction {rel:.2e} > tol {tol:.0e}'
        f' at the degree cap {max_degree} — the coarse solve is weaker than'
        ' requested; expect more outer CG iterations (raise max_degree or'
        ' agg quality)', RuntimeWarning, stacklevel=2)

  ell_idx, ell_val = _csr_to_ell(a_csr)
  return ChebCoarse(
      ell_idx=jnp.asarray(ell_idx.astype(np.int32)),
      ell_val=jnp.asarray(ell_val.astype(rdtype)),
      dinv=jnp.asarray(dinv.astype(rdtype)),
      agg_id=jnp.asarray(agg_id.astype(np.int32)),
      acc_inv=jnp.asarray(acc_inv.astype(rdtype)),
      lam_min=jnp.asarray(np.asarray(lam_min, dtype=rdtype)),
      lam_max=jnp.asarray(np.asarray(lam_max, dtype=rdtype)),
      scale=jnp.asarray(np.asarray(beta_k / dt, dtype=rdtype)),
      degree=int(degree),
      num_aggregates=int(na),
      has_nullspace=bool(has_nullspace),
      verified_rel_residual=float(rel),
  )
