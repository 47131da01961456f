"""FFT block-diagonalization of the pressure Schur operator E = D Q D^T.

On a *uniform, fully periodic* structured box (the Kolmogorov datagen /
NiLES flagship workload), E is translation-invariant over the element grid:
its matrix is block-circulant with (m^2 x m^2) blocks (m = pressure nodes
per dim) coupling only neighboring elements.  A 2D DFT over the element
indices therefore block-diagonalizes it exactly:

    E = (F* (x) I)  diag_k( E_hat(k) )  (F (x) I)

The symbol ``E_hat(k)`` is assembled at setup by applying E to the m^2
delta fields supported on one element (coupling reaches only the 3x3
element neighborhood) and FFT-ing over the element grid; each (m^2, m^2)
block is then inverted on the host (pseudo-inverse at k = 0, where the
constant pressure nullspace lives).

The resulting ``solve(rhs)`` applies E^{-1} with two FFTs and a batched
small matvec — used as the preconditioner for the pressure CG, which then
converges in O(1) iterations instead of O(p * n) (measured 300+ at order 8).
This replaces, for this geometry, what nek5000-class codes need multigrid
for.  Non-uniform or non-periodic meshes fall back to plain projected CG.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from swirlfem_tpu.ops import sem2d


def is_uniform_periodic(sem) -> bool:
  """True if the fast-path mesh is a uniform fully-periodic 2D box."""
  ops = sem.fast_ops
  if ops is None:
    return False
  # All elements identical geometry: the geometric factor fields must be
  # constant along the element axis.
  g = np.asarray(ops.wmass)
  if not np.allclose(g, g[..., :1], rtol=1e-10, atol=1e-12):
    return False
  # Fully periodic: no Dirichlet mask, velocity exchange wraps both axes.
  mask = np.asarray(sem.velocity.interior_mask)
  return bool((mask == 1).all())


def build_fft_pressure_solver(sem, dt: float, time_order: int):
  """Returns ``solve(rhs) ~= E^{-1} rhs`` for uniform periodic 2D meshes.

  The symbol is assembled for ``E0 = D B^{-1} D^T`` (dt-independent) and
  scaled by ``dt / beta_k`` at solve time, so one setup serves any dt.
  """
  from swirlfem_tpu.nse.solver import bdfk_coeffs

  ops = sem.fast_ops
  pinfo = ops.pinfo
  m = pinfo.order + 1
  n = pinfo.num_elements_per_dim
  num_p = sem.pressure.pspace.mesh.num_nodes

  beta_k = float(bdfk_coeffs(time_order)[-1])
  scale = dt / beta_k

  def e0(p):
    # E without the dt/beta_k factor: D diag_i exchange D^T.
    vmesh = sem.velocity.vspace.mesh
    md = sem.velocity_mass_diag[..., 0]
    diag_i = 1.0 / vmesh.exchange(md)
    grad = sem._fast_Dt(p)  # pylint: disable=protected-access
    qv = tuple(diag_i * vmesh.exchange(g) for g in grad)
    return sem._fast_D(qv)  # pylint: disable=protected-access

  # Apply E0 to the m^2 delta fields living on element (0, 0).
  def delta_field(i):
    return jnp.zeros(num_p, sem.velocity_mass_diag.dtype).at[i].set(1.0)

  # Element (0,0) owns the first m entries of each of the first m grid rows:
  # node id = (0*m + li) * (n*m) + (0*m + lj) in the DG grid numbering.
  ids = (np.arange(m)[:, None] * (n * m) + np.arange(m)[None, :]).reshape(-1)
  deltas = jnp.stack([delta_field(int(i)) for i in ids])
  responses = jax.lax.map(jax.jit(e0), deltas)  # (m^2, num_p)

  # (m^2 inputs, m, m, E) -> (m^2, m^2, n, n) coupling over element shifts.
  resp_el = jax.vmap(lambda r: sem2d.nodal_to_el(r, pinfo))(responses)
  resp_el = np.asarray(resp_el).reshape(m * m, m * m, n, n)

  # Symbol: FFT over element shifts.  E(delta on element 0) lands on
  # elements s, so E_hat(k)[j, i] = sum_s resp[i, j, s] exp(-i k.s).
  symbol = np.fft.fft2(resp_el, axes=(2, 3))  # (in, out, k0, k1)
  symbol = np.moveaxis(symbol, (0, 1), (3, 2))  # (k0, k1, out_j, in_i)

  inv = np.empty_like(symbol)
  for a in range(n):
    for b in range(n):
      blk = symbol[a, b]
      if a == 0 and b == 0:
        inv[a, b] = np.linalg.pinv(blk, rcond=1e-10)
      else:
        inv[a, b] = np.linalg.inv(blk)
  inv_dev = jnp.asarray(inv, dtype=jnp.complex64
                        if sem.velocity_mass_diag.dtype == jnp.float32
                        else jnp.complex128)

  def solve(rhs):
    """Applies E^{-1} (with the dt/beta_k scaling) to a nodal pressure."""
    el = sem2d.nodal_to_el(rhs, pinfo)  # (m, m, E)
    grid = el.reshape(m * m, n, n)
    hat = jnp.fft.fft2(grid, axes=(1, 2))
    out_hat = jnp.einsum('abji,iab->jab', inv_dev, hat)
    out = jnp.real(jnp.fft.ifft2(out_hat, axes=(1, 2)))
    out = out.reshape(m, m, n * n).astype(rhs.dtype)
    return sem2d.el_to_nodal(out, pinfo) / scale

  return solve
