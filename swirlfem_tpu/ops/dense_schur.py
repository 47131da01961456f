"""Dense assembled inverse of the pressure Schur operator (small meshes).

Unstructured geometries (cylinder-in-channel etc.) get no separable FDM
structure, and unpreconditioned CG on ``E = D Q D^T`` needs thousands of
iterations (measured 2086/step on the Schaefer-Turek mesh — the reference,
which ships no pressure preconditioner at all, would crawl identically).
For the few-thousand-dof pressure spaces of such benchmark meshes the
TPU-first answer is blunt and exact: assemble E column-by-column (batched
operator applies), pseudo-invert on the host in float64, and apply
``E^{-1}`` as a single dense MXU matvec — an exact preconditioner that
takes the CG to O(1) iterations.

Scaling note: memory is O(N_p^2) (53 MB at 3.6k dofs, f32); beyond ~20k
pressure dofs use domain-decomposed preconditioning instead (the
structured FDM path covers large boxes already).
"""

from __future__ import annotations

import jax
from jax import lax
import jax.numpy as jnp
import numpy as np


def build_dense_pressure_solver(sem, dt: float, time_order: int,
                                max_dofs: int = 20000):
  """Returns ``solve(r) ~= E^{-1} r`` (or None above `max_dofs`).

  Assembly runs batched on the host CPU backend; the inverse is embedded
  as an f32 (or f64) constant applied at HIGHEST precision.
  """
  npn = sem.pressure.pspace.mesh.num_nodes
  if npn > max_dofs:
    return None

  cpu = jax.local_devices(backend='cpu')[0]
  sem_host = jax.device_put(sem, cpu)
  dtype = sem.velocity_mass_diag.dtype

  # Assemble in FLOAT64 regardless of the working dtype: E's smallest
  # eigenvalues sit at ~1e-6 of its norm, i.e. at the level of f32
  # assembly noise — a pinv of an f32-assembled matrix inverts that noise
  # (1e7x amplification along near-null directions) and blows up the time
  # integration (measured).  Same lesson as the FFT symbol assembly.
  def _to64(x):
    if hasattr(x, 'dtype') and jnp.issubdtype(x.dtype, jnp.floating):
      return np.asarray(x, np.float64)
    return x

  with jax.default_device(cpu), jax.enable_x64(True):
    sem64 = jax.tree.map(_to64, sem_host)
    eye = jnp.eye(npn, dtype=np.float64)
    cols = lax.map(
        lambda v: sem64.E(v, dt=dt, time_order=time_order), eye,
        batch_size=min(64, npn))
    e_mat = np.asarray(cols, dtype=np.float64).T  # E(e_i) are columns
  # Symmetrize away assembly rounding, then pseudo-invert (rank-deficient
  # for enclosed flow where the constant-pressure mode is null).
  e_mat = 0.5 * (e_mat + e_mat.T)
  # Nullspace detection: the constant-pressure mode is null exactly when
  # the flow is enclosed (no outflow); with do-nothing outflow E is
  # nonsingular and must NOT be projected.
  ones = np.ones(npn) / np.sqrt(npn)
  scale = float(np.abs(e_mat).max())
  has_nullspace = bool(np.abs(e_mat @ ones).max() < 1e-10 * scale)
  inv = np.linalg.pinv(e_mat, rcond=1e-12, hermitian=True)
  rdtype = np.dtype(np.float32 if dtype == jnp.float32 else np.float64)
  inv = np.ascontiguousarray(inv, dtype=rdtype)

  def solve(r):
    # HIGHEST precision: the default TPU f32 matmul truncates to bf16,
    # which would waste the exactness of the assembled inverse.
    return jnp.matmul(jnp.asarray(inv), r.astype(rdtype),
                      precision=lax.Precision.HIGHEST).astype(r.dtype)

  solve.has_nullspace = has_nullspace

  # The assembled E itself, as one dense matvec: replaces the ~15-kernel
  # matrix-free apply wherever only the operator's *action* is needed
  # (the true-residual recomputation in `linalg.cg.near_exact_solve`).
  e_dev = np.ascontiguousarray(e_mat, dtype=rdtype)

  def fast_matvec(p):
    return jnp.matmul(jnp.asarray(e_dev), p.astype(rdtype),
                      precision=lax.Precision.HIGHEST).astype(p.dtype)

  solve.fast_matvec = fast_matvec
  return solve
