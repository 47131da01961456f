"""Distributed structured fast path: the el-form NSE step under shard_map.

Domain decomposition for the structured (box) flagship workloads, designed
for the TPU ICI fabric.  The periodic element grid is slab-sharded along
its first element axis across a named device-mesh axis; the el-form
fractional step (`nse.solver.stokes_step_el`) runs unchanged per shard with

* `exchange_el_halo` as QQ^T: the per-axis roll passes of the single-chip
  exchange, with the roll along the sharded element axis realized as a
  one-face-slab `lax.ppermute` between neighbor devices (periodic
  wraparound = the cyclic permutation riding the ICI torus), and
* psum inner products inside CG,
* a slab-decomposed block-FFT pressure preconditioner: FFT along the local
  element axis, `lax.all_to_all` transpose, FFT along the other axis, apply
  the (k1-sharded) inverted symbol, and back.

Unlike the reference's partitioned path (``swirl_fem/core/premesh.py:216``
pmap placement + psum-over-all-shared-dofs exchange,
``core/gather_scatter.py:241-248``), communication here is
neighbor-limited: each CG iteration moves exactly one element-face slab per
direction over ICI instead of an all-reduce over every shared dof.

Usage:
    sem = StokesSEM.create(periodic_box_premesh, {}, order=8)   # host setup
    dist = DistributedStokesBox(sem, device_mesh, 'space')
    step = dist.make_step(mu=1e-4, dt=1e-4, time_order=3)
    us_el, ps_el = dist.velocity_to_el(u0), dist.pressure_to_el(p0)
    u_el, p_el, aux = step([us_el, us_el], [ps_el, ps_el], f_el)
"""

from __future__ import annotations

import functools

import jax
from jax import lax
from jax import shard_map
import jax.numpy as jnp
from jax.sharding import Mesh
from jax.sharding import NamedSharding
from jax.sharding import PartitionSpec as P
import numpy as np

from swirlfem_tpu.nse import solver as nse_solver


# ---------------------------------------------------------------------------
# Halo exchange in el form
# ---------------------------------------------------------------------------


def dist_roll(x: jax.Array, shift: int, axis: int, axis_name: str):
  """``jnp.roll`` by +-1 along an axis slab-sharded across `axis_name`.

  The local block shifts in place and the face that crosses the shard
  boundary moves to the neighbor device with a cyclic `lax.ppermute`
  (which is also the periodic wraparound).
  """
  psize = lax.axis_size(axis_name)
  axis = axis % x.ndim
  if psize == 1:
    return jnp.roll(x, shift, axis)
  size = x.shape[axis]
  if shift == -1:
    edge = lax.slice_in_dim(x, 0, 1, axis=axis)
    recv = lax.ppermute(edge, axis_name,
                        [((i + 1) % psize, i) for i in range(psize)])
    return jnp.concatenate(
        [lax.slice_in_dim(x, 1, size, axis=axis), recv], axis)
  if shift == 1:
    edge = lax.slice_in_dim(x, size - 1, size, axis=axis)
    recv = lax.ppermute(edge, axis_name,
                        [(i, (i + 1) % psize) for i in range(psize)])
    return jnp.concatenate(
        [recv, lax.slice_in_dim(x, 0, size - 1, axis=axis)], axis)
  raise ValueError(f'only unit shifts are supported, got {shift}')


def exchange_el_halo(w: jax.Array, info, axis_name: str) -> jax.Array:
  """Direct-stiffness summation (QQ^T) in el form, element dim 0 sharded.

  Same sequential per-axis passes as ``ops.sem2d/sem3d.exchange_el`` (later
  passes propagate face sums so edges/corners receive all contributions);
  the pass along the sharded first element axis uses `dist_roll`, so the
  total communication per exchange is two one-face-slab ppermutes.
  """
  d, p = info.ndim, info.order
  for a in reversed(range(d)):
    # Local axis `a` pairs with element axis `d + a`; after indexing away
    # the local axis the element axes are the trailing d axes, so dim a's
    # element axis sits at (a - d) from the end.
    p_idx = (slice(None),) * a + (p,)
    z_idx = (slice(None),) * a + (0,)
    ax = a - d
    if a == 0:
      roll = functools.partial(dist_roll, axis_name=axis_name)
      s = w[p_idx] + roll(w[z_idx], -1, ax)
      w = w.at[p_idx].set(s)
      w = w.at[z_idx].set(roll(s, 1, ax))
    else:
      s = w[p_idx] + jnp.roll(w[z_idx], -1, axis=ax)
      w = w.at[p_idx].set(s)
      w = w.at[z_idx].set(jnp.roll(s, 1, axis=ax))
  return w


# ---------------------------------------------------------------------------
# Slab-decomposed block-FFT pressure preconditioner
# ---------------------------------------------------------------------------


def _sharded_fft_solve(rhs_el, inv_re, inv_im, pinfo, scale, axis_name):
  """Applies E^{-1} to a slab-sharded el-form pressure (2D).

  `rhs_el` is ``(m, m, n_loc, n)``; `inv_re/inv_im` carry this device's
  k1-chunk of the inverted symbol, ``(n, n_loc_k, m^2, m^2)``.  The 2D
  element-grid FFT is slab-decomposed: FFT along the resident axis,
  `all_to_all` transpose over the device axis, FFT along the other.
  """
  m = pinfo.order + 1
  n = pinfo.num_elements_per_dim
  nloc = rhs_el.shape[-2]
  x = rhs_el.reshape(m * m, nloc, n)
  hat = jnp.fft.fft(x, axis=2)                       # k1 (resident axis)
  if nloc != n:
    hat = lax.all_to_all(hat, axis_name, split_axis=2, concat_axis=1,
                         tiled=True)
  hat = jnp.fft.fft(hat, axis=1)                     # k0 (now resident)
  inv_c = lax.complex(jnp.asarray(inv_re), jnp.asarray(inv_im))
  out = jnp.einsum('abji,iab->jab', inv_c, hat,
                   precision=lax.Precision.HIGHEST)
  out = jnp.fft.ifft(out, axis=1)
  if nloc != n:
    out = lax.all_to_all(out, axis_name, split_axis=1, concat_axis=2,
                         tiled=True)
  out = jnp.real(jnp.fft.ifft(out, axis=2)).astype(rhs_el.dtype)
  return out.reshape(m, m, nloc, n) / scale


# ---------------------------------------------------------------------------
# Slab-decomposed FDM solves (exact separable inverses, sharded)
# ---------------------------------------------------------------------------


def _sharded_fdm_pressure_solve(rhs_el, z0r, z1r, inv_lam_loc, axis_name):
  """Applies the FDM E^{-1} to a slab-sharded el-form pressure (2D).

  ``rhs_el``: (m, m, n_loc, n); ``z0r/z1r``: full per-axis el-row
  transforms reshaped (m, n, K); ``inv_lam_loc``: this device's K1-chunk
  of the scaled inverted eigenvalue grid, (K0, K1/P).  One tiled
  all_to_all transpose each way, dense MXU contractions otherwise —
  the sharded sibling of `ops.fdm_pressure.build_fdm_pressure_solver_el`.
  """
  z0 = jnp.asarray(z0r)
  z1 = jnp.asarray(z1r)
  nloc = rhs_el.shape[2]
  full = rhs_el.shape[3]
  # Forward transform along the resident axis pair (i1, e1).
  t = jnp.einsum('bdL,abcd->acL', z1, rhs_el,
                  precision=lax.Precision.HIGHEST)       # (m, n_loc, K1)
  if nloc != full:
    t = lax.all_to_all(t, axis_name, split_axis=2, concat_axis=1,
                       tiled=True)                   # (m, n, K1/P)
  h = jnp.einsum('adK,adb->Kb', z0, t,
                  precision=lax.Precision.HIGHEST)
  h = h * jnp.asarray(inv_lam_loc)
  t = jnp.einsum('adK,Kb->adb', z0, h,
                  precision=lax.Precision.HIGHEST)
  if nloc != full:
    t = lax.all_to_all(t, axis_name, split_axis=1, concat_axis=2,
                       tiled=True)                   # (m, n_loc, K1)
  out = jnp.einsum('bdL,acL->abcd', z1, t,
                   precision=lax.Precision.HIGHEST)
  return out.astype(rhs_el.dtype)


def _sharded_fdm_pressure_solve_3d(rhs_el, z0r, z1r, z2r, inv_lam_loc,
                                   axis_name):
  """3D sibling of `_sharded_fdm_pressure_solve`.

  ``rhs_el``: (m, m, m, n0_loc, n, n); ``z0r/z1r/z2r``: per-axis el-row
  transforms (m, n, K); ``inv_lam_loc``: this device's K2-chunk of the
  scaled inverted eigenvalue grid, (K0, K1, K2/P).  The slab decomposition
  generalizes directly: transform the two resident axis pairs, one tiled
  all_to_all swaps the sharded element axis for the K2 frequency axis,
  transform axis 0, apply the diagonal, and unwind.
  """
  hp = lax.Precision.HIGHEST
  z0, z1, z2 = (jnp.asarray(z) for z in (z0r, z1r, z2r))
  nloc, full = rhs_el.shape[3], z0.shape[1]
  t = jnp.einsum('cfM,abcDef->abDeM', z2, rhs_el, precision=hp)
  t = jnp.einsum('beL,abDeM->aDLM', z1, t, precision=hp)
  if nloc != full:
    t = lax.all_to_all(t, axis_name, split_axis=3, concat_axis=1,
                       tiled=True)                   # (m, n, K1, K2/P)
  h = jnp.einsum('aDK,aDLM->KLM', z0, t, precision=hp)
  h = h * jnp.asarray(inv_lam_loc)
  t = jnp.einsum('aDK,KLM->aDLM', z0, h, precision=hp)
  if nloc != full:
    t = lax.all_to_all(t, axis_name, split_axis=1, concat_axis=3,
                       tiled=True)                   # (m, n0_loc, K1, K2)
  t = jnp.einsum('beL,aDLM->abDeM', z1, t, precision=hp)
  out = jnp.einsum('cfM,abDeM->abcDef', z2, t, precision=hp)
  return out.astype(rhs_el.dtype)


def _sharded_fdm_viscous_solve_3d(r_el, z0r, z1r, z2r, lam_loc, beta_k, mu,
                                  dt, axis_name):
  """3D sibling of `_sharded_fdm_viscous_solve` (one velocity component)."""
  hp = lax.Precision.HIGHEST
  z0, z1, z2 = (jnp.asarray(z) for z in (z0r, z1r, z2r))
  nloc, full = r_el.shape[3], z0.shape[1]
  t = jnp.einsum('cfM,abcDef->abDeM', z2, r_el, precision=hp)
  t = jnp.einsum('beL,abDeM->aDLM', z1, t, precision=hp)
  if nloc != full:
    t = lax.all_to_all(t, axis_name, split_axis=3, concat_axis=1,
                       tiled=True)
  h = jnp.einsum('aDK,aDLM->KLM', z0, t, precision=hp)
  h = h / (beta_k / dt + mu * jnp.asarray(lam_loc))
  t = jnp.einsum('aDK,KLM->aDLM', z0, h, precision=hp)
  if nloc != full:
    t = lax.all_to_all(t, axis_name, split_axis=1, concat_axis=3,
                       tiled=True)
  t = jnp.einsum('beL,aDLM->abDeM', z1, t, precision=hp)
  out = jnp.einsum('cfM,abDeM->abcDef', z2, t, precision=hp)
  return out.astype(r_el.dtype)


def _sharded_fdm_viscous_solve(r_el, z0r, z1r, lam_loc, beta_k, mu, dt,
                               axis_name):
  """Applies the FDM H^{-1} to one slab-sharded el velocity component.

  ``r_el``: (k, k, n_loc, n) covector; ``z0r/z1r``: (k, n, K) el-row
  transforms (duplicate fold + Dirichlet mask baked in); ``lam_loc``:
  K1-chunk of the eigenvalue-sum grid.  The mu/dt shift happens in-trace,
  so one setup serves any viscosity and step size.
  """
  z0 = jnp.asarray(z0r)
  z1 = jnp.asarray(z1r)
  nloc = r_el.shape[2]
  full = r_el.shape[3]
  t = jnp.einsum('bdL,abcd->acL', z1, r_el,
                  precision=lax.Precision.HIGHEST)
  if nloc != full:
    t = lax.all_to_all(t, axis_name, split_axis=2, concat_axis=1,
                       tiled=True)
  h = jnp.einsum('adK,adb->Kb', z0, t,
                 precision=lax.Precision.HIGHEST)
  h = h / (beta_k / dt + mu * jnp.asarray(lam_loc))
  t = jnp.einsum('adK,Kb->adb', z0, h,
                 precision=lax.Precision.HIGHEST)
  if nloc != full:
    t = lax.all_to_all(t, axis_name, split_axis=1, concat_axis=2,
                       tiled=True)
  out = jnp.einsum('bdL,acL->abcd', z1, t,
                   precision=lax.Precision.HIGHEST)
  return out.astype(r_el.dtype)


# ---------------------------------------------------------------------------
# The per-device step body
# ---------------------------------------------------------------------------


def _step_impl(ops, us_el, ps_el, f_el, precond_arrays, *, axis_name, mod,
               mu, dt, time_order, alpha, tol, atol, maxiter, grid_1d,
               scale, precond_kind, exact_solves):
  """Runs inside shard_map: all el states / factor fields are local slabs."""
  info = ops.vinfo
  d = info.ndim
  n = info.num_elements_per_dim
  nloc = us_el[-1][0].shape[d]
  eshape = (nloc,) + (n,) * (d - 1)

  exch = lambda w: exchange_el_halo(w, info, axis_name)

  def dot(a, b):
    return lax.psum(jnp.vdot(a, b, precision=lax.Precision.HIGHEST),
                    axis_name)

  precond = None
  viscous = None
  if precond_kind == 'fft':
    inv_re, inv_im = precond_arrays

    def precond(p_el):
      w = _sharded_fft_solve(p_el, inv_re, inv_im, ops.pinfo, scale,
                             axis_name)
      ones = jnp.ones_like(w)
      return w - (dot(ones, w) / dot(ones, ones)) * ones

  elif precond_kind == 'fdm':
    from swirlfem_tpu.nse.solver import bdfk_coeffs
    beta_k = float(bdfk_coeffs(time_order)[-1])
    if d == 2:
      z0p, z1p, inv_lam, z0v, z1v, lamv = precond_arrays

      def psolve(p_el):
        return _sharded_fdm_pressure_solve(p_el, z0p, z1p, inv_lam,
                                           axis_name)

      def vsolve(r):
        return _sharded_fdm_viscous_solve(r, z0v, z1v, lamv, beta_k, mu,
                                          dt, axis_name)
    else:
      z0p, z1p, z2p, inv_lam, z0v, z1v, z2v, lamv = precond_arrays

      def psolve(p_el):
        return _sharded_fdm_pressure_solve_3d(p_el, z0p, z1p, z2p, inv_lam,
                                              axis_name)

      def vsolve(r):
        return _sharded_fdm_viscous_solve_3d(r, z0v, z1v, z2v, lamv,
                                             beta_k, mu, dt, axis_name)

    def precond(p_el):
      w = psolve(p_el)
      ones = jnp.ones_like(w)
      return w - (dot(ones, w) / dot(ones, ones)) * ones

    def viscous(rt):
      return tuple(vsolve(r) for r in rt)

  return nse_solver.stokes_step_el(
      mod, ops, us_el, ps_el, f_el, mu=mu, dt=dt, time_order=time_order,
      alpha=alpha, exch=exch, dot=dot, grid_1d=grid_1d,
      pressure_preconditioner=precond, project_out_nullspace=True,
      tol=tol, atol=atol, maxiter=maxiter, eshape=eshape,
      viscous_preconditioner=viscous, exact_solves=exact_solves)


# ---------------------------------------------------------------------------
# Host-side factory
# ---------------------------------------------------------------------------


class DistributedStokesBox:
  """Shards a structured fully-periodic `StokesSEM` over a device-mesh axis.

  Setup stays host-side (the full `StokesSEM.create` on CPU); the E-last
  factor fields are placed with NamedSharding along their flattened element
  axis — contiguous chunks of the row-major element grid ARE the slabs of
  the first element axis, so no reshuffling is needed.  States live in el
  form ``(k,)*d + (n,)*d`` sharded at element axis 0; use the
  ``velocity_to_el`` / ``velocity_from_el`` helpers at IO boundaries.
  """

  def __init__(self, sem, device_mesh: Mesh, axis_name: str):
    ops = sem.fast_ops
    if ops is None:
      raise ValueError('DistributedStokesBox needs the structured fast path')
    if not sem._fully_periodic:  # pylint: disable=protected-access
      raise ValueError('only fully-periodic boxes are supported')
    self.sem = sem
    self.mesh = device_mesh
    self.axis_name = axis_name
    self.num_shards = device_mesh.shape[axis_name]
    self.mod = sem._elops  # pylint: disable=protected-access
    info = ops.vinfo
    if info.num_elements_per_dim % self.num_shards:
      raise ValueError(
          f'{info.num_elements_per_dim} element slabs do not split evenly '
          f'over {self.num_shards} devices')
    self.d = info.ndim

    # Factor fields: shard the trailing (flattened-E) axis.
    def spec_of(x):
      return P(*((None,) * (x.ndim - 1) + (axis_name,)))

    self.ops_specs = jax.tree.map(spec_of, ops)
    self.ops = jax.device_put(
        ops, jax.tree.map(lambda s: NamedSharding(device_mesh, s),
                          self.ops_specs))

  def state_spec(self) -> P:
    """PartitionSpec of an el-form state array ((k,)*d + (n,)*d)."""
    return P(*((None,) * self.d + (self.axis_name,)
               + (None,) * (self.d - 1)))

  def _put_el(self, el):
    return jax.device_put(el, NamedSharding(self.mesh, self.state_spec()))

  # -- IO helpers (host boundaries; not for the hot loop) -----------------

  def velocity_to_el(self, u):
    """Nodal (N, d) or component tuple -> sharded el tuple."""
    info = self.sem.fast_ops.vinfo
    comps = (u if isinstance(u, tuple)
             else tuple(u[..., i] for i in range(u.shape[-1])))
    kk = info.order + 1
    shape = (kk,) * self.d + (info.num_elements_per_dim,) * self.d
    return tuple(
        self._put_el(self.mod.nodal_to_el(c, info).reshape(shape))
        for c in comps)

  def velocity_from_el(self, u_el):
    """Sharded el tuple -> nodal component tuple (grid-copy averaged)."""
    info = self.sem.fast_ops.vinfo
    kk = info.order + 1
    num_e = info.num_elements_per_dim ** self.d
    flat_shape = (kk,) * self.d + (num_e,)
    ones = jnp.ones(flat_shape, dtype=u_el[0].dtype)
    grid_mult = self.mod.el_to_nodal(ones, info)
    return tuple(
        self.mod.el_to_nodal(jax.device_get(w).reshape(flat_shape), info)
        / grid_mult for w in u_el)

  def pressure_to_el(self, p):
    info = self.sem.fast_ops.pinfo
    mm = info.order + 1
    shape = (mm,) * self.d + (info.num_elements_per_dim,) * self.d
    return self._put_el(self.mod.nodal_to_el(p, info).reshape(shape))

  def pressure_from_el(self, p_el):
    info = self.sem.fast_ops.pinfo
    mm = info.order + 1
    num_e = info.num_elements_per_dim ** self.d
    return self.mod.el_to_nodal(
        jax.device_get(p_el).reshape((mm,) * self.d + (num_e,)), info)

  # -- step builders -------------------------------------------------------

  def make_step(self, *, mu, dt, time_order, alpha=0.05, tol=1e-8, atol=0.0,
                maxiter=None, preconditioner='fdm', exact_solves=False,
                use_fft_preconditioner=None):
    """Builds the jitted distributed fractional step.

    Returns ``step(us_el, ps_el, f_el) -> (u_el, p_el, aux)`` where
    velocity histories are lists of per-component tuples of sharded el
    arrays, pressures are lists of sharded el arrays, and `f_el` is the
    forcing covector in el form (use `make_advection` + mass-weighted
    nodal forcing to assemble it).

    `preconditioner`: 'fdm' (exact separable inverses for BOTH solves,
    2D and 3D, sharded with one all_to_all transpose each way —
    preferred, and required for `exact_solves`), 'fft' (block-circulant
    pressure inverse, 2D only), or None (plain projected CG).
    `exact_solves` skips the CG certification as in the single-chip el
    path.
    """
    if use_fft_preconditioner is not None:  # legacy knob
      preconditioner = 'fft' if use_fft_preconditioner else None
    precond_arrays = None
    precond_specs = None
    scale = None
    kind = None
    if preconditioner == 'fdm' and self.d in (2, 3):
      from swirlfem_tpu.ops.fdm_pressure import helmholtz_eig_el
      from swirlfem_tpu.ops.fdm_pressure import is_separable_box
      from swirlfem_tpu.ops.fdm_pressure import pressure_eig_el
      if is_separable_box(self.sem):
        d = self.d
        info = self.sem.fast_ops.vinfo
        pinfo = self.sem.fast_ops.pinfo
        n = info.num_elements_per_dim
        m = pinfo.order + 1
        k = info.order + 1
        zs, inv_lam, _ = pressure_eig_el(self.sem, dt, time_order)
        zels, lam_sum, _ = helmholtz_eig_el(self.sem, time_order)
        # el-row orders: pressure (i, e) i-major -> (m, n, K); velocity
        # (e, l) e-major -> transpose to (k, n, K).
        zps = [z.reshape(m, n, -1) for z in zs]
        zvs = [z.reshape(n, k, -1).transpose(1, 0, 2) for z in zels]
        rep = P(None, None, None)
        # Eigenvalue grids sharded along the LAST frequency axis — the
        # one resident after the all_to_all transpose in the solves.
        shard_last = P(*((None,) * (d - 1) + (self.axis_name,)))
        precond_arrays = tuple(zps) + (inv_lam,) + tuple(zvs) + (lam_sum,)
        precond_specs = ((rep,) * d + (shard_last,)) * 2
        precond_arrays = jax.device_put(
            precond_arrays,
            tuple(NamedSharding(self.mesh, s) for s in precond_specs))
        kind = 'fdm'
    elif preconditioner == 'fft' and self.d == 2:
      from swirlfem_tpu.ops.fft_pressure import assemble_pressure_symbol
      from swirlfem_tpu.ops.fft_pressure import is_uniform_periodic
      if is_uniform_periodic(self.sem):
        inv_re, inv_im, scale, _ = assemble_pressure_symbol(
            self.sem, dt, time_order)
        # Shard the symbol along k1 (axis 1): that is the frequency axis
        # resident after the all_to_all transpose in the sharded solve.
        sym_spec = P(None, self.axis_name, None, None)
        precond_arrays = jax.device_put(
            (inv_re, inv_im), NamedSharding(self.mesh, sym_spec))
        precond_specs = (sym_spec,) * 2
        kind = 'fft'
    if exact_solves and kind != 'fdm':
      raise ValueError('exact_solves needs the FDM preconditioner')

    impl = functools.partial(
        _step_impl, axis_name=self.axis_name, mod=self.mod, mu=mu, dt=dt,
        time_order=time_order, alpha=alpha, tol=tol, atol=atol,
        maxiter=maxiter, grid_1d=self.sem.velocity.mesh.gridpoints_1d,
        scale=scale, precond_kind=kind, exact_solves=exact_solves)

    vspec = self.state_spec()
    sharded = shard_map(
        impl, mesh=self.mesh,
        in_specs=(self.ops_specs, vspec, vspec, vspec, precond_specs),
        out_specs=(vspec, vspec, P()),
        check_vma=False)

    def step(us_el, ps_el, f_el):
      return sharded(self.ops, us_el, ps_el, f_el, precond_arrays)

    return jax.jit(step)

  def make_advection(self):
    """Jitted distributed dealiased convection covector, el form -> el form.

    Purely element-local (no communication): returns
    ``conv(u_el_tuple) -> covector el tuple`` for building the
    extrapolated-advection forcing of the nonlinear step.
    """
    vspec = self.state_spec()
    info = self.sem.fast_ops.vinfo
    kk = info.order + 1
    d = self.d

    def impl(ops, ut):
      nloc = ut[0].shape[d]
      eshape = (nloc,) + (info.num_elements_per_dim,) * (d - 1)
      num_e = int(np.prod(eshape))
      flat = lambda w: w.reshape((kk,) * d + (num_e,))
      outs = ops.convection_el(*[flat(c) for c in ut])
      return tuple(o.reshape((kk,) * d + eshape) for o in outs)

    sharded = shard_map(impl, mesh=self.mesh,
                        in_specs=(self.ops_specs, vspec),
                        out_specs=vspec, check_vma=False)
    return jax.jit(lambda ut: sharded(self.ops, ut))
