"""Distributed structured fast path vs single-device el-form oracles.

Runs on the virtual 8-device CPU platform (conftest), comparing the
slab-sharded halo exchange, the all_to_all-transposed block-FFT pressure
solve, and the full sharded fractional step against the single-device
implementations they must reproduce to rounding.
"""

import functools

import jax
from jax import shard_map
import jax.numpy as jnp
import numpy as np
import pytest

from swirlfem_tpu.nse.distributed import DistributedStokesBox
from swirlfem_tpu.nse.distributed import exchange_el_halo
from swirlfem_tpu.nse.solver import StokesSEM
from swirlfem_tpu.ops import sem2d
from swirlfem_tpu.ops import sem3d
from swirlfem_tpu.parallel.spmd import device_mesh
from swirlfem_tpu.utils.box import unit_cube_mesh

NUM_DEV = 4


@pytest.fixture(scope='module')
def dmesh():
  assert jax.device_count() >= NUM_DEV, jax.devices()
  return device_mesh('space', NUM_DEV)


def _sharded_exchange(dmesh, info, w):
  from jax.sharding import PartitionSpec as P
  d = info.ndim
  spec = P(*((None,) * d + ('space',) + (None,) * (d - 1)))
  run = shard_map(
      functools.partial(exchange_el_halo, info=info, axis_name='space'),
      mesh=dmesh, in_specs=spec, out_specs=spec, check_vma=False)
  return jax.jit(run)(w)


@pytest.mark.parametrize('ndim', [2, 3])
def test_halo_exchange_matches_single_device(dmesh, ndim):
  n, order = 8, 3
  pm = unit_cube_mesh(n, ndim=ndim, periodic_dims=tuple(range(ndim)))
  sem = StokesSEM.create(pm, boundary_conditions={}, order=order)
  info = sem.fast_ops.vinfo
  mod = sem2d if ndim == 2 else sem3d

  rng = np.random.default_rng(0)
  w = jnp.asarray(rng.standard_normal((order + 1,) * ndim + (n,) * ndim))
  expected = mod.exchange_el(w, info)
  got = _sharded_exchange(dmesh, info, w)
  np.testing.assert_allclose(np.asarray(got), np.asarray(expected),
                             atol=1e-13)


def test_sharded_fft_solve_matches_single_device(dmesh):
  from jax.sharding import PartitionSpec as P
  from swirlfem_tpu.nse.distributed import _sharded_fft_solve
  from swirlfem_tpu.ops.fft_pressure import assemble_pressure_symbol
  from swirlfem_tpu.ops.fft_pressure import build_fft_pressure_solver

  n, order = 8, 5
  pm = unit_cube_mesh(n, ndim=2, periodic_dims=(0, 1))
  sem = StokesSEM.create(pm, boundary_conditions={}, order=order)
  pinfo = sem.fast_ops.pinfo
  m = pinfo.order + 1

  dt, time_order = 1e-3, 2
  solve_single = build_fft_pressure_solver(sem, dt, time_order)
  inv_re, inv_im, scale, _ = assemble_pressure_symbol(sem, dt, time_order)

  rng = np.random.default_rng(1)
  rhs = rng.standard_normal(sem.pressure.pspace.mesh.num_nodes)
  rhs -= rhs.mean()
  rhs = jnp.asarray(rhs)
  expected = sem2d.nodal_to_el(solve_single(rhs), pinfo).reshape(
      (m, m, n, n))

  rhs_el = sem2d.nodal_to_el(rhs, pinfo).reshape((m, m, n, n))
  espec = P(None, None, 'space', None)
  sspec = P(None, 'space', None, None)
  run = shard_map(
      functools.partial(_sharded_fft_solve, pinfo=pinfo, scale=scale,
                        axis_name='space'),
      mesh=dmesh, in_specs=(espec, sspec, sspec), out_specs=espec,
      check_vma=False)
  got = jax.jit(run)(rhs_el, jnp.asarray(inv_re), jnp.asarray(inv_im))
  np.testing.assert_allclose(np.asarray(got), np.asarray(expected),
                             atol=1e-11)


def _setup_step_case(n=8, order=4, ndim=2):
  pm = unit_cube_mesh(n, ndim=ndim, periodic_dims=tuple(range(ndim)))
  sem = StokesSEM.create(pm, boundary_conditions={}, order=order)
  vc = np.asarray(sem.velocity.mesh.node_coords)
  u0 = tuple(
      jnp.asarray(np.sin(2 * np.pi * vc[:, (j + 1) % ndim])
                  + 0.3 * np.cos(2 * np.pi * vc[:, j]))
      for j in range(ndim))
  p0 = jnp.zeros(sem.pressure.pspace.mesh.num_nodes)
  f = tuple(jnp.asarray(0.1 * np.cos(2 * np.pi * vc[:, j]))
            for j in range(ndim))
  return sem, u0, p0, f


@pytest.mark.parametrize('ndim,precond,exact', [
    (2, None, False), (2, 'fft', False), (2, 'fdm', False),
    (2, 'fdm', True), (3, None, False), (3, 'fdm', False),
    (3, 'fdm', True)])
def test_sharded_step_matches_single_device(dmesh, ndim, precond, exact):
  n = 8 if ndim == 2 else 4
  order = 4 if ndim == 2 else 3
  sem, u0, p0, f = _setup_step_case(n=n, order=order, ndim=ndim)
  mu, dt, time_order = 1e-2, 1e-3, 2

  u_ref, p_ref, _ = jax.jit(lambda us, ps, f: sem.stokes_one_step(
      us, ps, f, mu=mu, dt=dt, time_order=time_order,
      tol=1e-12))([u0, u0], [p0, p0], f)

  dist = DistributedStokesBox(sem, dmesh, 'space')
  step = dist.make_step(mu=mu, dt=dt, time_order=time_order, tol=1e-12,
                        preconditioner=precond, exact_solves=exact)
  us_el = dist.velocity_to_el(u0)
  ps_el = dist.pressure_to_el(p0)
  f_el = dist.velocity_to_el(f)
  # f is a covector: partition values among grid copies as the solver does.
  info = sem.fast_ops.vinfo
  mod = dist.mod
  kk = info.order + 1
  num_e = info.num_elements_per_dim ** ndim
  grid_mult = mod.el_to_nodal(
      jnp.ones((kk,) * ndim + (num_e,), dtype=u0[0].dtype), info)
  f_el = dist.velocity_to_el(tuple(c / grid_mult for c in f))

  u_el, p_el, aux = step([us_el, us_el], [ps_el, ps_el], f_el)
  u = dist.velocity_from_el(u_el)
  p = dist.pressure_from_el(p_el)

  for j in range(ndim):
    np.testing.assert_allclose(np.asarray(u[j]), np.asarray(u_ref[j]),
                               atol=1e-9)
  np.testing.assert_allclose(np.asarray(p), np.asarray(p_ref), atol=1e-8)
  expect_zero = precond == 'fdm'  # exact viscous seed/solve
  assert (int(aux['u_star_info']['num_iterations']) == 0) == expect_zero


def test_sharded_step_gradient(dmesh):
  """Differentiates through the distributed solve (training-path parity)."""
  sem, u0, p0, _ = _setup_step_case(n=4, order=3, ndim=2)
  mu, dt, time_order = 1e-2, 1e-3, 2

  dist = DistributedStokesBox(sem, dmesh, 'space')
  step = dist.make_step(mu=mu, dt=dt, time_order=time_order, tol=1e-12,
                        use_fft_preconditioner=False)
  us_el = dist.velocity_to_el(u0)
  ps_el = dist.pressure_to_el(p0)

  def loss(theta):
    f_el = jax.tree_util.tree_map(lambda c: theta * c, us_el)
    u_el, _, _ = step([us_el, us_el], [ps_el, ps_el], f_el)
    return sum(jnp.vdot(w, w) for w in u_el)

  g = jax.grad(loss)(0.1)
  eps = 1e-6
  fd = (loss(0.1 + eps) - loss(0.1 - eps)) / (2 * eps)
  np.testing.assert_allclose(np.asarray(g), np.asarray(fd), rtol=1e-5)


def test_distributed_advection_matches_fast_C(dmesh):
  sem, u0, _, _ = _setup_step_case(n=8, order=4, ndim=2)
  expected = sem._fast_C(u0)  # pylint: disable=protected-access

  dist = DistributedStokesBox(sem, dmesh, 'space')
  conv = dist.make_advection()
  out_el = conv(dist.velocity_to_el(u0))
  out = dist.velocity_from_el(out_el)
  # velocity_from_el averages grid copies; _fast_C sums covector copies.
  info = sem.fast_ops.vinfo
  kk = info.order + 1
  num_e = info.num_elements_per_dim ** 2
  grid_mult = dist.mod.el_to_nodal(
      jnp.ones((kk, kk, num_e), dtype=u0[0].dtype), info)
  for j in range(2):
    got = np.asarray(out[j]) * np.asarray(grid_mult)
    np.testing.assert_allclose(got, np.asarray(expected[j]), atol=1e-10)
