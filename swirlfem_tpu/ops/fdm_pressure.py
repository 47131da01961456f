"""Fast-diagonalization (FDM) solver for the pressure Schur operator.

On an axis-aligned structured box whose node coordinates are a *per-axis
tensor product* — uniform or graded (e.g. wall-clustered heated-cavity
meshes; the Jacobian is diagonal with each factor a function of its own
axis only) — the P_N-P_{N-2} pressure Schur operator ``E = D Q D^T`` is
exactly separable over the grid axes:

    2D:  E = s * (A1 (x) B2  +  B1 (x) A2)
    3D:  E = s * (A1 (x) B2 (x) B3  +  B1 (x) A2 (x) B3  +  B1 (x) B2 (x) A3)

with per-axis 1D global matrices built from the element factors
(s = dt / beta_k):

    Dg_a = assemble_a( ipt @ diag(w_gll) @ dmat )        # (n*m, Nv_a)
    Mg_a = assemble_a( (h/2) * ipt @ diag(w_gll) )       # (n*m, Nv_a)
    A_a  = Dg_a diag(b_a) Dg_a^T,   B_a = Mg_a diag(b_a) Mg_a^T

where ``b_a = mask_a / assembled_1d_mass_a`` is the (boundary-masked)
lumped inverse velocity mass along axis a — separability of the Dirichlet
mask and of the diagonal mass is what makes this exact.  The classical
fast diagonalization method (Lynch-Rice-Thomas 1964; used by nek5000 as a
local preconditioner) then gives, from the generalized eigenproblems
``A_a Z_a = B_a Z_a diag(lam_a)`` with ``Z_a^T B_a Z_a = I``:

    E^{-1} = (Z1 (x) Z2 ...) diag(1 / sum_a lam_a) (Z1 (x) Z2 ...)^T / s

applied as one dense (n*m x n*m) matmul per axis — batched GEMMs sized for
the MXU (448x448 at the flagship 64-element/order-8 config), with the
constant-pressure nullspace (enclosed flow / fully periodic) removed by
zeroing the near-null eigenmodes.

Compared to `ops.fft_pressure` (block-circulant FFT, fully-periodic 2D
only), FDM covers any per-axis mix of Dirichlet and periodic velocity BCs
— lid-driven cavity, channels — and 3D, at similar cost.  Setup is
host-side float64 (small dense eigenproblems); reference swirl-fem has no
counterpart (it runs unpreconditioned projected CG,
``navier_stokes/navier_stokes.py:449-452``).
"""

from __future__ import annotations

from jax import lax
import jax.numpy as jnp
import numpy as np

from swirlfem_tpu.core.quadrature import differentiation_matrix_1d
from swirlfem_tpu.core.quadrature import interpolation_matrix_1d


def _axis_masks(sem, interior_mask=None):
  """Per-axis interior masks of the velocity grid, or None if inseparable.

  ``interior_mask`` overrides the velocity's own mask — used by the scalar
  transport, whose thermal Dirichlet walls are independent of the flow's
  (e.g. heated cavity: scalar Dirichlet on x-walls only, Neumann on y).
  """
  info = sem.fast_ops.vinfo
  d = info.ndim
  nv = info.nodes_per_dim
  if interior_mask is None:
    mask = np.asarray(sem.velocity.interior_mask)[..., 0]
  else:
    mask = np.asarray(interior_mask).reshape(-1)
  mask = mask.reshape((nv,) * d)
  axis_masks = []
  for a in range(d):
    # Profile along axis a through the most-interior line.
    idx = tuple(np.array([nv // 2]) if b != a else slice(None)
                for b in range(d))
    axis_masks.append(mask[idx].reshape(nv))
  outer = axis_masks[0]
  for m in axis_masks[1:]:
    outer = np.multiply.outer(outer, m)
  if not np.array_equal(outer, mask):
    return None
  return axis_masks


def _periodic_axes(sem):
  """Which grid axes wrap periodically, probed through the mesh exchange.

  The structured velocity grid always carries ``n*p + 1`` nodes per dim;
  a periodic axis links its first and last grid plane as duplicate copies
  summed by QQ^T.  Probing exchange with a delta on the first plane tells
  the two apart robustly (no reliance on premesh metadata surviving into
  the solver).
  """
  info = sem.fast_ops.vinfo
  d = info.ndim
  nv = info.nodes_per_dim
  vmesh = sem.velocity.vspace.mesh
  out = []
  for a in range(d):
    idx = tuple(0 if b == a else nv // 2 for b in range(d))
    delta = np.zeros((nv,) * d, dtype=np.asarray(vmesh.node_coords).dtype)
    delta[idx] = 1.0
    exch = np.asarray(vmesh.exchange(jnp.asarray(delta.reshape(-1))))
    far = tuple(nv - 1 if b == a else nv // 2 for b in range(d))
    out.append(bool(exch.reshape((nv,) * d)[far] != 0))
  return out


def _axis_geometry(sem):
  """Per-axis 1D geometry of a tensor-product box, or None.

  Returns ``(lines, jacs)``: ``lines[a]`` is the (nv,) nodal coordinate
  profile along grid axis a, and ``jacs[a]`` the per-element 1D Jacobian
  profiles ``dx/dxi`` at the GLL nodes, shape (n, p+1).  Valid exactly
  when ``node_coords`` is a tensor product per axis (each coordinate
  component varies only along its own grid axis) — then the Jacobian is
  diagonal with per-axis factors, the GLL-collocated Helmholtz and Schur
  operators are exactly separable, and fast diagonalization is an exact
  inverse even on *graded* (non-uniform) boxes.
  """
  info = sem.fast_ops.vinfo
  d = info.ndim
  nv = info.nodes_per_dim
  n = info.num_elements_per_dim
  p = info.order
  coords = np.asarray(sem.velocity.mesh.node_coords)
  if coords.shape[0] != nv ** d:
    return None
  coords = coords.reshape((nv,) * d + (d,))
  span = max(float(np.ptp(coords)), 1.0)
  tol = 1e3 * float(np.finfo(coords.dtype).eps) * span
  lines = []
  for a in range(d):
    idx = tuple(slice(None) if b == a else slice(0, 1) for b in range(d))
    line = coords[idx + (a,)].reshape(nv).astype(np.float64)
    shape = tuple(nv if b == a else 1 for b in range(d))
    if float(np.abs(coords[..., a] - line.reshape(shape)).max()) > tol:
      return None
    lines.append(line)
  dmat = np.asarray(differentiation_matrix_1d(sem.velocity.mesh.gridpoints_1d))
  jacs = []
  for a in range(d):
    x_el = np.stack([lines[a][e * p:e * p + p + 1] for e in range(n)])
    jac = x_el @ dmat.T                        # (n, p+1): dx/dxi at nodes
    if jac.min() <= 0:
      return None
    jacs.append(jac)
  return lines, jacs


def is_separable_box(sem) -> bool:
  """True when the FDM direct solvers apply exactly.

  Strictly more general than `is_uniform_box`: any per-axis coordinate
  map (e.g. the wall-clustered heated cavity grading) keeps the
  operators exactly separable; only the 1D factor matrices change
  (per-element Jacobian profiles instead of a constant h/2).
  """
  ops = sem.fast_ops
  if ops is None or ops.vinfo is None:
    return False
  if _axis_geometry(sem) is None:
    return False
  return _axis_masks(sem) is not None


def is_uniform_box(sem) -> bool:
  """True for an axis-aligned uniform structured box with separable BCs."""
  ops = sem.fast_ops
  if ops is None or ops.vinfo is None:
    return False
  d = ops.vinfo.ndim
  # All elements identical and axis-aligned: geometric factor fields must
  # be constant along the element axis and the off-diagonal G_ab zero.
  names = (('g11', 'g22'), ('g11', 'g22', 'g33'))[d - 2]
  off = (('g12',), ('g12', 'g13', 'g23'))[d - 2]
  gscale = max(float(np.abs(np.asarray(getattr(ops, nm))).max())
               for nm in names)
  for nm in names:
    g = np.asarray(getattr(ops, nm))
    if float(np.abs(g - g[..., :1]).max()) > 1e-3 * gscale:
      return False
  for nm in off:
    if float(np.abs(np.asarray(getattr(ops, nm))).max()) > 1e-3 * gscale:
      return False
  wmass = np.asarray(ops.wmass)
  if float(np.abs(wmass - wmass[..., :1]).max()) > 1e-3 * np.abs(wmass).max():
    return False
  return _axis_masks(sem) is not None


def _assemble_1d(blocks: np.ndarray, n: int, periodic: bool) -> np.ndarray:
  """Assembles per-element (rows_e, k) 1D factors into a global matrix.

  Row blocks are private per element (DG pressure rows); columns live on
  the continuous velocity line (shared endpoints summed; periodic wraps
  the closing node onto node 0).  ``blocks`` is (m, k) shared by all
  elements, or (n, m, k) per element (graded boxes).
  """
  if blocks.ndim == 2:
    blocks = np.broadcast_to(blocks, (n,) + blocks.shape)
  _, m, k = blocks.shape
  p = k - 1
  ncols = n * p if periodic else n * p + 1
  out = np.zeros((n * m, ncols))
  for e in range(n):
    cols = (e * p + np.arange(k)) % ncols
    out[e * m:(e + 1) * m, cols] += blocks[e]
  return out


def build_fdm_pressure_solver(sem, dt: float, time_order: int,
                              precision=lax.Precision.HIGHEST):
  """Returns ``solve(rhs) ~= E^{-1} rhs`` on uniform boxes (2D/3D, any BCs).

  `rhs` and the result are nodal pressure arrays (DG grid numbering).
  """
  from swirlfem_tpu.nse.solver import bdfk_coeffs

  ops = sem.fast_ops
  vinfo, pinfo = ops.vinfo, ops.pinfo
  d = vinfo.ndim
  n = vinfo.num_elements_per_dim
  p = vinfo.order
  m = pinfo.order + 1

  axis_masks = _axis_masks(sem)
  assert axis_masks is not None, 'BC mask is not separable per axis'
  geom = _axis_geometry(sem)
  assert geom is not None, 'node coordinates are not a per-axis product'
  _, jacs = geom

  beta_k = float(bdfk_coeffs(time_order)[-1])
  scale = dt / beta_k

  vgrid = sem.velocity.mesh.gridpoints_1d
  pgrid = sem.pressure.pspace.mesh.gridpoints_1d
  from swirlfem_tpu.core.quadrature import Quadrature1D
  w1 = np.asarray(
      Quadrature1D.create_from_nodes_1d(vgrid).weights, dtype=np.float64)

  ipt = np.asarray(interpolation_matrix_1d(pgrid, vgrid)).T  # (m, k)
  dmat = np.asarray(differentiation_matrix_1d(vgrid))        # (k, k)

  periodic_axes = _periodic_axes(sem)

  zs, lams = [], []
  import scipy.linalg
  for a in range(d):
    periodic = periodic_axes[a]
    # Work on the line of *unique* velocity nodes: the redundant seam copy
    # of a periodic axis folds onto node 0 (conjugating E by the
    # duplicate-summing exchange yields exactly the wrapped assembly).
    mask_a = np.asarray(axis_masks[a], dtype=np.float64)
    nv = n * p if periodic else n * p + 1
    mask_a = mask_a[:nv]
    # Weak derivative factor int q u' = ipt W dmat — the 1D Jacobian
    # cancels, so the block is geometry-free; the mass factor carries the
    # per-element Jacobian profile (graded boxes stay exactly separable).
    dg = _assemble_1d(ipt @ np.diag(w1) @ dmat, n, periodic)
    mg = _assemble_1d(
        np.einsum('mk,ek->emk', ipt @ np.diag(w1), jacs[a]), n, periodic)
    # Assembled 1D lumped mass (shared endpoints summed / wrapped).
    mass = np.zeros(nv)
    for e in range(n):
      cols = (e * p + np.arange(p + 1)) % nv
      mass[cols] += w1 * jacs[a][e]
    b = mask_a / mass
    A = dg @ np.diag(b) @ dg.T
    B = mg @ np.diag(b) @ mg.T
    lam, z = scipy.linalg.eigh(A, B)  # z^T B z = I
    zs.append(z)
    lams.append(lam)

  # Combined eigenvalues with nullspace (near-zero modes) pseudo-inverted.
  grids = np.meshgrid(*lams, indexing='ij')
  lam_sum = sum(grids)
  lmax = float(np.abs(lam_sum).max())
  null = np.abs(lam_sum) <= 1e-10 * lmax
  inv_lam = np.where(~null, 1.0 / np.where(null, 1.0, lam_sum), 0.0)

  rdtype = (np.float32 if sem.velocity_mass_diag.dtype == jnp.float32
            else np.float64)
  zs = [np.ascontiguousarray(z, dtype=rdtype) for z in zs]
  inv_lam = np.ascontiguousarray(inv_lam / scale, dtype=rdtype)
  npd = n * m

  def _transform(x, mats, transpose):
    # x: (npd,) * d grid; applies mats[a] (or its transpose) along axis a.
    for a, mat in enumerate(mats):
      ma = jnp.asarray(mat)
      if transpose:
        ma = ma.T
      x = jnp.moveaxis(
          jnp.tensordot(ma, x, axes=([1], [a]),
                         precision=precision), 0, a)
    return x

  def solve(rhs):
    """Applies E^{-1} (including the dt/beta_k scaling) to nodal pressure."""
    x = rhs.reshape((npd,) * d)
    h = _transform(x, zs, transpose=True)     # Z^T x
    h = h * jnp.asarray(inv_lam)
    out = _transform(h, zs, transpose=False)  # Z h
    return out.reshape(-1).astype(rhs.dtype)

  # Whether E has a (pseudo-inverted) nullspace: true for enclosed flow
  # (all-Dirichlet) and fully-periodic boxes.  Callers project iff so.
  solve.has_nullspace = bool(null.any())
  return solve


def _assemble_1d_square(blocks: np.ndarray, n: int,
                        periodic: bool) -> np.ndarray:
  """Assembles per-element (k, k) 1D operators onto the global line.

  ``blocks`` is (k, k) shared by all elements or (n, k, k) per element.
  """
  if blocks.ndim == 2:
    blocks = np.broadcast_to(blocks, (n,) + blocks.shape)
  k = blocks.shape[-1]
  p = k - 1
  nv = n * p if periodic else n * p + 1
  out = np.zeros((nv, nv))
  for e in range(n):
    cols = (e * p + np.arange(k)) % nv
    out[np.ix_(cols, cols)] += blocks[e]
  return out


def build_fdm_helmholtz_solver(sem, time_order: int,
                               precision=lax.Precision.HIGHEST,
                               interior_mask=None):
  """Exact FDM solver for the viscous operator H = (beta_k/dt) B + mu A.

  ``interior_mask`` (nodal, optional) overrides the velocity's Dirichlet
  mask: pass the scalar transport's own mask to solve the temperature
  Helmholtz equation ``(beta_k/dt) B + kappa A`` on the same grid with
  independent thermal walls (``solve(r, kappa, dt)``).

  On a uniform box the assembled vector Helmholtz operator is separable
  per axis exactly like the pressure Schur operator (collocated-GLL
  stiffness/lumped mass tensor-factor; the Dirichlet row mask slices per
  axis), so per-axis generalized eigendecompositions ``S_a Z = M_a Z L``
  give

      H^{-1} = (Z1 (x) Z2 ...) diag(1 / (beta_k/dt + mu * sum_a lam_a))
               (Z1 (x) Z2 ...)^T

  The eigenbasis is independent of ``mu`` and ``dt`` — they only shift the
  diagonal — so one setup serves every viscosity/step size, and the
  returned ``solve(r, mu, dt)`` can take traced values.

  `r` is a per-component nodal covector on the (possibly redundant)
  velocity grid; periodic seam copies are folded before and spread after
  the solve.  The result is the continuous solution with zero on Dirichlet
  rows (matching the row-elided system CG solves).
  """
  from swirlfem_tpu.core.quadrature import Quadrature1D
  from swirlfem_tpu.nse.solver import bdfk_coeffs

  ops = sem.fast_ops
  vinfo = ops.vinfo
  d = vinfo.ndim
  n = vinfo.num_elements_per_dim
  p = vinfo.order
  nv_grid = vinfo.nodes_per_dim

  axis_masks = _axis_masks(sem, interior_mask=interior_mask)
  assert axis_masks is not None, 'BC mask is not separable per axis'
  geom = _axis_geometry(sem)
  assert geom is not None, 'node coordinates are not a per-axis product'
  _, jacs = geom
  periodic_axes = _periodic_axes(sem)
  beta_k = float(bdfk_coeffs(time_order)[-1])

  vgrid = sem.velocity.mesh.gridpoints_1d
  w1 = np.asarray(
      Quadrature1D.create_from_nodes_1d(vgrid).weights, dtype=np.float64)
  dmat = np.asarray(differentiation_matrix_1d(vgrid))

  import scipy.linalg
  zs, lams, interiors = [], [], []
  for a in range(d):
    periodic = periodic_axes[a]
    nv = n * p if periodic else n * p + 1
    # Per-element D^T diag(w / J_e) D: the 1D stiffness with the graded
    # Jacobian profile (uniform boxes reduce to (2/h) D^T W D).
    s_el = np.einsum('ik,ek,kj->eij', dmat.T, w1 / jacs[a], dmat)
    s_glob = _assemble_1d_square(s_el, n, periodic)
    mass = np.zeros(nv)
    for e in range(n):
      cols = (e * p + np.arange(p + 1)) % nv
      mass[cols] += w1 * jacs[a][e]
    interior = np.nonzero(np.asarray(axis_masks[a])[:nv] > 0)[0]
    s_int = s_glob[np.ix_(interior, interior)]
    m_int = mass[interior]
    # Generalized eig with diagonal M: fold sqrt(M) in and use plain eigh.
    sq = np.sqrt(m_int)
    lam, y = scipy.linalg.eigh(s_int / sq[:, None] / sq[None, :])
    zs.append(y / sq[:, None])  # Z^T M Z = I
    lams.append(lam)
    interiors.append((interior, nv))

  rdtype = (np.float32 if sem.velocity_mass_diag.dtype == jnp.float32
            else np.float64)
  zs = [np.ascontiguousarray(z, dtype=rdtype) for z in zs]
  grids = np.meshgrid(*lams, indexing='ij')
  lam_sum = np.ascontiguousarray(sum(grids), dtype=rdtype)

  def _fold(x, axis, periodic, nv):
    """Sums the redundant periodic seam copy onto node 0 along `axis`."""
    if not periodic:
      return x
    first = lax.index_in_dim(x, 0, axis=axis, keepdims=True)
    last = lax.index_in_dim(x, nv_grid - 1, axis=axis, keepdims=True)
    rest = lax.slice_in_dim(x, 1, nv, axis=axis)
    return jnp.concatenate([first + last, rest], axis=axis)

  def _spread(x, axis, periodic):
    """Duplicates node 0 back onto the redundant seam slot."""
    if not periodic:
      return x
    first = lax.index_in_dim(x, 0, axis=axis, keepdims=True)
    return jnp.concatenate([x, first], axis=axis)

  def _embed(x, axis, interior, nv):
    """Scatters interior rows into a zero-padded full line along `axis`."""
    if len(interior) == nv:
      return x
    # Dirichlet masks zero a contiguous prefix/suffix: pad with zeros.
    lead, trail = interior[0], nv - 1 - interior[-1]
    assert len(interior) == nv - lead - trail, 'non-contiguous interior'
    pads = [(0, 0)] * x.ndim
    pads[axis] = (int(lead), int(trail))
    return jnp.pad(x, pads)

  def solve(r, mu, dt):
    """Applies H^{-1} to a nodal covector (one velocity component)."""
    x = r.reshape((nv_grid,) * d)
    for a in range(d):
      interior, nv = interiors[a]
      x = _fold(x, a, periodic_axes[a], nv)
      if len(interior) != nv:
        x = lax.slice_in_dim(x, int(interior[0]), int(interior[-1]) + 1,
                             axis=a)
    h = x
    for a, z in enumerate(zs):
      h = jnp.moveaxis(
          jnp.tensordot(jnp.asarray(z).T, h, axes=([1], [a]),
                         precision=precision), 0, a)
    h = h / (beta_k / dt + mu * jnp.asarray(lam_sum))
    for a, z in enumerate(zs):
      h = jnp.moveaxis(
          jnp.tensordot(jnp.asarray(z), h, axes=([1], [a]),
                         precision=precision), 0, a)
    for a in range(d):
      interior, nv = interiors[a]
      h = _embed(h, a, interior, nv)
      h = _spread(h, a, periodic_axes[a])
    return h.reshape(-1).astype(r.dtype)

  return solve


def _el_row_map(n: int, p: int, periodic: bool, interior: np.ndarray):
  """Rows of Z for the el-form line: el slot (e, i) -> unique-node row.

  Folding the duplicate-node map P (el line of n*(p+1) slots -> unique
  line) into the transform matrix makes the FDM solves operate on E-last
  element-local states directly: ``Zel^T x_el`` sums duplicate covector
  copies (P^T) and ``Zel h`` duplicates the continuous result back — no
  layout conversions, no boundary embed/extract (Dirichlet rows of Zel are
  zero by construction).
  """
  nv = n * p if periodic else n * p + 1
  gids = (np.arange(n)[:, None] * p + np.arange(p + 1)[None, :]) % nv
  col_of = np.full(nv, -1)
  col_of[interior] = np.arange(len(interior))
  return gids.reshape(-1), col_of  # (n*(p+1),), (nv,)


def helmholtz_eig_el(sem, time_order: int):
  """Per-axis el-row eigenbases of the separable Helmholtz operator.

  Returns ``(zels, lam_sum, beta_k)``: el-row transform matrices
  ``(n*(p+1), n_interior)`` per axis (duplicate fold + Dirichlet mask
  baked in), and the eigenvalue-sum grid, in the solver's working dtype.
  Shared by the single-chip closure and the sharded distributed solve.
  """
  from swirlfem_tpu.core.quadrature import Quadrature1D
  from swirlfem_tpu.nse.solver import bdfk_coeffs

  ops = sem.fast_ops
  vinfo = ops.vinfo
  d = vinfo.ndim
  n = vinfo.num_elements_per_dim
  p = vinfo.order
  k = p + 1

  axis_masks = _axis_masks(sem)
  assert axis_masks is not None, 'BC mask is not separable per axis'
  geom = _axis_geometry(sem)
  assert geom is not None, 'node coordinates are not a per-axis product'
  _, jacs = geom
  periodic_axes = _periodic_axes(sem)
  beta_k = float(bdfk_coeffs(time_order)[-1])

  vgrid = sem.velocity.mesh.gridpoints_1d
  w1 = np.asarray(
      Quadrature1D.create_from_nodes_1d(vgrid).weights, dtype=np.float64)
  dmat = np.asarray(differentiation_matrix_1d(vgrid))

  import scipy.linalg
  zels, lams = [], []
  for a in range(d):
    periodic = periodic_axes[a]
    nv = n * p if periodic else n * p + 1
    s_el = np.einsum('ik,ek,kj->eij', dmat.T, w1 / jacs[a], dmat)
    s_glob = _assemble_1d_square(s_el, n, periodic)
    mass = np.zeros(nv)
    for e in range(n):
      cols = (e * p + np.arange(p + 1)) % nv
      mass[cols] += w1 * jacs[a][e]
    interior = np.nonzero(np.asarray(axis_masks[a])[:nv] > 0)[0]
    s_int = s_glob[np.ix_(interior, interior)]
    sq = np.sqrt(mass[interior])
    lam, y = scipy.linalg.eigh(s_int / sq[:, None] / sq[None, :])
    z = y / sq[:, None]                      # (n_int, n_int), Z^T M Z = I
    rows, col_of = _el_row_map(n, p, periodic, interior)
    zel = np.zeros((n * k, len(interior)))
    live = col_of[rows] >= 0
    zel[live] = z[col_of[rows[live]]]        # fold P and the mask into Z
    zels.append(zel)
    lams.append(lam)

  rdtype = (np.float32 if sem.velocity_mass_diag.dtype == jnp.float32
            else np.float64)
  zels = [np.ascontiguousarray(z, dtype=rdtype) for z in zels]
  grids = np.meshgrid(*lams, indexing='ij')
  lam_sum = np.ascontiguousarray(sum(grids), dtype=rdtype)
  return zels, lam_sum, beta_k


def build_fdm_helmholtz_solver_el(sem, time_order: int,
                                  precision=lax.Precision.HIGHEST):
  """El-form FDM viscous solve: (k,)*d + eshape covector -> same-shaped.

  Identical math to `build_fdm_helmholtz_solver` with the duplicate-node
  fold baked into per-axis ``Zel`` matrices, so it consumes and produces
  element-local (E-last) states with zero layout transforms — the hot-path
  variant for el-state time stepping.
  """
  ops = sem.fast_ops
  vinfo = ops.vinfo
  d = vinfo.ndim
  n = vinfo.num_elements_per_dim
  k = vinfo.order + 1
  zels, lam_sum, beta_k = helmholtz_eig_el(sem, time_order)

  def solve(r_el, mu, dt):
    """Applies H^{-1}; `r_el` is ``(k,)*d + eshape`` (or flat E last)."""
    eshape = r_el.shape[d:]
    # (k, ..., n, ...) -> per-axis (local, element) line pairs: bring each
    # axis pair together as one n*k line for the matrix contraction.
    x = r_el.reshape((k,) * d + (n,) * d)
    # reorder to (e0, l0, e1, l1, ...) and flatten pairs.
    perm = []
    for a in range(d):
      perm += [d + a, a]
    x = x.transpose(perm).reshape((n * k,) * d)
    for a, z in enumerate(zels):
      x = jnp.moveaxis(
          jnp.tensordot(jnp.asarray(z).T, x, axes=([1], [a]),
                         precision=precision), 0, a)
    x = x / (beta_k / dt + mu * jnp.asarray(lam_sum))
    for a, z in enumerate(zels):
      x = jnp.moveaxis(
          jnp.tensordot(jnp.asarray(z), x, axes=([1], [a]),
                         precision=precision), 0, a)
    x = x.reshape(sum(((n, k) for _ in range(d)), ()))
    inv = []
    for a in range(d):
      inv += [2 * a + 1]
    for a in range(d):
      inv += [2 * a]
    return x.transpose(inv).reshape((k,) * d + eshape).astype(r_el.dtype)

  return solve


def pressure_eig_el(sem, dt: float, time_order: int):
  """Per-axis el-row eigenbases of the separable Schur operator.

  Returns ``(zs, inv_lam, has_nullspace)``: el-row transform matrices
  ``(m*n, m*n)`` per axis (rows in (i, e) order) and the scaled inverted
  eigenvalue grid (near-null modes zeroed), in the working dtype.  Shared
  by the single-chip closure and the sharded distributed solve.
  """
  from swirlfem_tpu.nse.solver import bdfk_coeffs

  ops = sem.fast_ops
  vinfo, pinfo = ops.vinfo, ops.pinfo
  d = vinfo.ndim
  n = vinfo.num_elements_per_dim
  p = vinfo.order
  m = pinfo.order + 1

  axis_masks = _axis_masks(sem)
  geom = _axis_geometry(sem)
  assert geom is not None, 'node coordinates are not a per-axis product'
  _, jacs = geom
  beta_k = float(bdfk_coeffs(time_order)[-1])
  scale = dt / beta_k

  vgrid = sem.velocity.mesh.gridpoints_1d
  pgrid = sem.pressure.pspace.mesh.gridpoints_1d
  from swirlfem_tpu.core.quadrature import Quadrature1D
  w1 = np.asarray(
      Quadrature1D.create_from_nodes_1d(vgrid).weights, dtype=np.float64)
  ipt = np.asarray(interpolation_matrix_1d(pgrid, vgrid)).T
  dmat = np.asarray(differentiation_matrix_1d(vgrid))
  periodic_axes = _periodic_axes(sem)

  import scipy.linalg
  zs, lams = [], []
  for a in range(d):
    periodic = periodic_axes[a]
    mask_a = np.asarray(axis_masks[a], dtype=np.float64)
    nv = n * p if periodic else n * p + 1
    mask_a = mask_a[:nv]
    dg = _assemble_1d(ipt @ np.diag(w1) @ dmat, n, periodic)
    mg = _assemble_1d(
        np.einsum('mk,ek->emk', ipt @ np.diag(w1), jacs[a]), n, periodic)
    mass = np.zeros(nv)
    for e in range(n):
      cols = (e * p + np.arange(p + 1)) % nv
      mass[cols] += w1 * jacs[a][e]
    b = mask_a / mass
    A = dg @ np.diag(b) @ dg.T
    B = mg @ np.diag(b) @ mg.T
    lam, z = scipy.linalg.eigh(A, B)
    # Permute rows from nodal (e*m + i) to el (i, e) order.
    rows = (np.arange(n)[:, None] * m + np.arange(m)[None, :]).T.reshape(-1)
    zs.append(z[rows])  # (m*n el order, n*m)
    lams.append(lam)

  grids = np.meshgrid(*lams, indexing='ij')
  lam_sum = sum(grids)
  lmax = float(np.abs(lam_sum).max())
  null = np.abs(lam_sum) <= 1e-10 * lmax
  inv_lam = np.where(~null, 1.0 / np.where(null, 1.0, lam_sum), 0.0)
  rdtype = (np.float32 if sem.velocity_mass_diag.dtype == jnp.float32
            else np.float64)
  zs = [np.ascontiguousarray(z, dtype=rdtype) for z in zs]
  inv_lam = np.ascontiguousarray(inv_lam / scale, dtype=rdtype)
  return zs, inv_lam, bool(null.any())


def build_fdm_pressure_solver_el(sem, dt: float, time_order: int,
                                 precision=lax.Precision.HIGHEST):
  """El-form FDM pressure solve: ``(m,)*d + eshape`` -> same-shaped.

  The DG pressure has no duplicate nodes, so the el fold is a pure row
  permutation of the nodal `build_fdm_pressure_solver` transforms.
  """
  ops = sem.fast_ops
  vinfo, pinfo = ops.vinfo, ops.pinfo
  d = vinfo.ndim
  n = vinfo.num_elements_per_dim
  m = pinfo.order + 1
  zs, inv_lam, has_null = pressure_eig_el(sem, dt, time_order)

  def solve(r_el):
    eshape = r_el.shape[d:]
    # (i..., e...) el axes -> (i_a, e_a) line pairs per axis.
    x = r_el.reshape((m,) * d + (n,) * d)
    perm = []
    for a in range(d):
      perm += [a, d + a]
    x = x.transpose(perm).reshape((m * n,) * d)
    for a, z in enumerate(zs):
      x = jnp.moveaxis(
          jnp.tensordot(jnp.asarray(z).T, x, axes=([1], [a]),
                         precision=precision), 0, a)
    x = x * jnp.asarray(inv_lam)
    for a, z in enumerate(zs):
      x = jnp.moveaxis(
          jnp.tensordot(jnp.asarray(z), x, axes=([1], [a]),
                         precision=precision), 0, a)
    x = x.reshape(sum(((m, n) for _ in range(d)), ()))
    inv = []
    for a in range(d):
      inv += [2 * a]
    for a in range(d):
      inv += [2 * a + 1]
    return x.transpose(inv).reshape((m,) * d + eshape).astype(r_el.dtype)

  solve.has_nullspace = has_null
  return solve
