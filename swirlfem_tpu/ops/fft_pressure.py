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
  if ops is None or ops.vinfo is None or ops.vinfo.ndim != 2:
    return False  # the block-FFT solver is built for 2D element grids
  # All elements identical geometry: the geometric factor fields must be
  # constant along the element axis (tolerance scaled to the working dtype:
  # f32 setup rounding gives ~1e-9 per-element jitter on a uniform box).
  # Tolerance 1e-3 against a *common* geometric scale: accepts f32 setup
  # rounding on uniform boxes (1.2e-4 relative at 64x64 elements; and g12
  # is mathematically zero there, so its own magnitude is pure noise) while
  # rejecting genuine deformations.  Correctness never depends on this
  # check -- the FFT solve is only a CG preconditioner -- so a borderline
  # accept just costs an extra iteration or two.
  wmass = np.asarray(ops.wmass)
  g11 = np.asarray(ops.g11)
  g12 = np.asarray(ops.g12)
  g22 = np.asarray(ops.g22)
  gscale = max(float(np.abs(g11).max()), float(np.abs(g22).max()))
  checks = [(wmass, float(np.abs(wmass).max())),
            (g11, gscale), (g12, gscale), (g22, gscale)]
  for g, scale in checks:
    if float(np.abs(g - g[..., :1]).max()) > 1e-3 * scale:
      return False
  # Fully periodic: no Dirichlet mask, velocity exchange wraps both axes.
  mask = np.asarray(sem.velocity.interior_mask)
  return bool((mask == 1).all())


def assemble_pressure_symbol(sem, dt: float, time_order: int):
  """Assembles the inverted block-circulant symbol of E on the host.

  Returns ``(inv_re, inv_im, scale, diag_e0)``: the real/imag parts of the
  inverted symbol, shaped ``(n, n, m^2, m^2)`` and indexed
  ``[k0, k1, out_j, in_i]`` (numpy, so jit closures embed them without any
  device fetch); the ``dt / beta_k`` scaling to divide by after applying the
  inverse of ``E0 = D B^{-1} D^T``; and the translation-invariant diagonal
  of ``E0`` restricted to one element (length m^2).
  """
  from swirlfem_tpu.nse.solver import bdfk_coeffs

  ops = sem.fast_ops
  pinfo = ops.pinfo
  m = pinfo.order + 1
  n = pinfo.num_elements_per_dim
  num_p = sem.pressure.pspace.mesh.num_nodes

  beta_k = float(bdfk_coeffs(time_order)[-1])
  scale = dt / beta_k

  # Symbol assembly is a one-time host-side setup: run it on the CPU
  # backend regardless of where `sem` lives (eager dispatch of ~50 small
  # operator applies to a remote TPU is latency-bound: measured 2 minutes
  # via the tunnel vs seconds on host), and in FLOAT64: the small-k blocks
  # of E_hat are near-singular (cond ~ (n p)^2), so inverting an f32-noisy
  # symbol yields a preconditioner that is neither accurate nor symmetric
  # to working precision -- measured CG breakdown (negative <r, M r>) after
  # ~50 iterations instead of O(1) convergence.
  cpu = jax.local_devices(backend='cpu')[0]
  sem_host = jax.device_put(sem, cpu)

  def _to64(x):
    if hasattr(x, 'dtype') and jnp.issubdtype(x.dtype, jnp.floating):
      return np.asarray(x, np.float64)
    return x

  def e0(p):
    # E without the dt/beta_k factor: D diag_i exchange D^T.
    vmesh = sem64.velocity.vspace.mesh
    md = sem64.velocity_mass_diag[..., 0]
    diag_i = 1.0 / vmesh.exchange(md)
    grad = sem64._fast_Dt(p)  # pylint: disable=protected-access
    qv = tuple(diag_i * vmesh.exchange(g) for g in grad)
    return sem64._fast_D(qv)  # pylint: disable=protected-access

  with jax.default_device(cpu), jax.enable_x64(True):
    sem64 = jax.tree.map(_to64, sem_host)

    # Apply E0 to the m^2 delta fields living on element (0, 0).
    def delta_field(i):
      return jnp.zeros(num_p, np.float64).at[i].set(1.0)

    # Element (0,0) owns the first m entries of each of the first m grid
    # rows: node id = (0*m + li) * (n*m) + (0*m + lj) in DG grid numbering.
    ids = (np.arange(m)[:, None] * (n * m)
           + np.arange(m)[None, :]).reshape(-1)
    deltas = jnp.stack([delta_field(int(i)) for i in ids])
    responses = jax.lax.map(jax.jit(e0), deltas)  # (m^2, num_p)

    # (m^2 inputs, m, m, E) -> (m^2, m^2, n, n) coupling over elem shifts.
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
  # Keep the inverse symbol as *real/imag numpy* constants: a complex jax
  # Array captured in a jit closure is fetched back to host at trace time
  # to embed as a constant, and complex device->host transfers are
  # UNIMPLEMENTED through the remote-TPU tunnel.  numpy constants embed
  # without any device fetch, and the complex recombination happens
  # in-trace where XLA:TPU handles complex64 natively.
  rdtype = (np.float32 if sem.velocity_mass_diag.dtype == jnp.float32
            else np.float64)
  inv_re = np.ascontiguousarray(inv.real, dtype=rdtype)
  inv_im = np.ascontiguousarray(inv.imag, dtype=rdtype)
  # diag(E0): the zero-shift self-responses — identical for every element
  # by translation invariance.
  diag_e0 = np.array([resp_el[j, j, 0, 0] for j in range(m * m)],
                     dtype=rdtype)
  return inv_re, inv_im, scale, diag_e0


def build_fft_pressure_solver(sem, dt: float, time_order: int):
  """Returns ``solve(rhs) ~= E^{-1} rhs`` for uniform periodic 2D meshes.

  The symbol is assembled for ``E0 = D B^{-1} D^T`` (dt-independent) and
  scaled by ``dt / beta_k`` at solve time, so one setup serves any dt.
  """
  inv_re, inv_im, scale, diag_e0 = assemble_pressure_symbol(
      sem, dt, time_order)
  ops = sem.fast_ops
  pinfo = ops.pinfo
  m = pinfo.order + 1
  n = pinfo.num_elements_per_dim
  rdtype = inv_re.dtype

  def solve(rhs):
    """Applies E^{-1} (with the dt/beta_k scaling) to a nodal pressure."""
    inv_c = jax.lax.complex(jnp.asarray(inv_re), jnp.asarray(inv_im))
    el = sem2d.nodal_to_el(rhs, pinfo)  # (m, m, E)
    grid = el.reshape(m * m, n, n)
    hat = jnp.fft.fft2(grid, axes=(1, 2))
    out_hat = jnp.einsum('abji,iab->jab', inv_c, hat,
                         precision=jax.lax.Precision.HIGHEST)
    out = jnp.real(jnp.fft.ifft2(out_hat, axes=(1, 2)))
    out = out.reshape(m, m, n * n).astype(rhs.dtype)
    return sem2d.el_to_nodal(out, pinfo) / scale

  # Jacobi companion diagonal: noise-free (no FFT rounding), safe inside CG
  # where the block-FFT inverse is not (see nse.solver psolve).
  solve.jacobi_diag_el = (scale * diag_e0).reshape(m, m)
  return solve
