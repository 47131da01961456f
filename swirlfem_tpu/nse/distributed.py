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
  out = jnp.einsum('abji,iab->jab', inv_c, hat)
  out = jnp.fft.ifft(out, axis=1)
  if nloc != n:
    out = lax.all_to_all(out, axis_name, split_axis=1, concat_axis=2,
                         tiled=True)
  out = jnp.real(jnp.fft.ifft(out, axis=2)).astype(rhs_el.dtype)
  return out.reshape(m, m, nloc, n) / scale


# ---------------------------------------------------------------------------
# The per-device step body
# ---------------------------------------------------------------------------


def _step_impl(ops, us_el, ps_el, f_el, fft_inv, *, axis_name, mod, mu, dt,
               time_order, alpha, tol, atol, maxiter, grid_1d, scale):
  """Runs inside shard_map: all el states / factor fields are local slabs."""
  info = ops.vinfo
  d = info.ndim
  n = info.num_elements_per_dim
  nloc = us_el[-1][0].shape[d]
  eshape = (nloc,) + (n,) * (d - 1)

  exch = lambda w: exchange_el_halo(w, info, axis_name)

  def dot(a, b):
    return lax.psum(jnp.vdot(a, b), axis_name)

  precond = None
  if fft_inv is not None:
    inv_re, inv_im = fft_inv

    def precond(p_el):
      w = _sharded_fft_solve(p_el, inv_re, inv_im, ops.pinfo, scale,
                             axis_name)
      ones = jnp.ones_like(w)
      return w - (dot(ones, w) / dot(ones, ones)) * ones

  return nse_solver.stokes_step_el(
      mod, ops, us_el, ps_el, f_el, mu=mu, dt=dt, time_order=time_order,
      alpha=alpha, exch=exch, dot=dot, grid_1d=grid_1d,
      pressure_preconditioner=precond, project_out_nullspace=True,
      tol=tol, atol=atol, maxiter=maxiter, eshape=eshape)


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
                maxiter=None, use_fft_preconditioner=True):
    """Builds the jitted distributed fractional step.

    Returns ``step(us_el, ps_el, f_el) -> (u_el, p_el, aux)`` where
    velocity histories are lists of per-component tuples of sharded el
    arrays, pressures are lists of sharded el arrays, and `f_el` is the
    forcing covector in el form (use `make_advection` + mass-weighted
    nodal forcing to assemble it).
    """
    fft_inv = None
    scale = None
    if use_fft_preconditioner and self.d == 2:
      from swirlfem_tpu.ops.fft_pressure import assemble_pressure_symbol
      from swirlfem_tpu.ops.fft_pressure import is_uniform_periodic
      if is_uniform_periodic(self.sem):
        inv_re, inv_im, scale, _ = assemble_pressure_symbol(
            self.sem, dt, time_order)
        # Shard the symbol along k1 (axis 1): that is the frequency axis
        # resident after the all_to_all transpose in the sharded solve.
        sym_spec = P(None, self.axis_name, None, None)
        fft_inv = jax.device_put(
            (inv_re, inv_im), NamedSharding(self.mesh, sym_spec))

    impl = functools.partial(
        _step_impl, axis_name=self.axis_name, mod=self.mod, mu=mu, dt=dt,
        time_order=time_order, alpha=alpha, tol=tol, atol=atol,
        maxiter=maxiter, grid_1d=self.sem.velocity.mesh.gridpoints_1d,
        scale=scale)

    vspec = self.state_spec()
    sym_specs = None if fft_inv is None else (
        P(None, self.axis_name, None, None),) * 2
    sharded = shard_map(
        impl, mesh=self.mesh,
        in_specs=(self.ops_specs, vspec, vspec, vspec, sym_specs),
        out_specs=(vspec, vspec, P()),
        check_vma=False)

    def step(us_el, ps_el, f_el):
      return sharded(self.ops, us_el, ps_el, f_el, fft_inv)

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
