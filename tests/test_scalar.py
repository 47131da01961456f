"""Tests for passive-scalar transport (nse.scalar).

Oracle ladder in the reference's style (identity -> scheme -> step):
operator structure (SPD, mask elision, mass parity with quadrature),
then analytic time integration (pure diffusion decay rate, pure
advection translation), then conservation under divergence-free
advection — the property mix a Boussinesq user depends on.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from swirlfem_tpu.core.bc import BCType
from swirlfem_tpu.nse.scalar import ScalarTransport
from swirlfem_tpu.nse.solver import StokesSEM
from swirlfem_tpu.utils.box import unit_cube_mesh


def _periodic_setup(n=8, order=5):
  premesh = unit_cube_mesh(n, ndim=2, periodic_dims=(0, 1))
  sem = StokesSEM.create(premesh, boundary_conditions={}, order=order,
                         use_assembled_ops=False)
  st = ScalarTransport.create(sem, {})
  return sem, st


def _dirichlet_setup(n=6, order=4):
  premesh = unit_cube_mesh(n, ndim=2)
  bcs = {'boundary': (BCType.DIRICHLET, 0.0)}
  sem = StokesSEM.create(premesh, boundary_conditions=bcs, order=order,
                         use_assembled_ops=False)
  st = ScalarTransport.create(sem, bcs)
  return sem, st


class TestOperators:

  @pytest.mark.smoke
  def test_stiffness_spd_and_symmetric(self):
    _, st = _periodic_setup(n=4, order=4)
    npn = st.mesh.num_nodes
    rng = np.random.default_rng(0)
    r1 = jnp.asarray(rng.standard_normal(npn))
    r2 = jnp.asarray(rng.standard_normal(npn))
    a1, a2 = st.A(r1), st.A(r2)
    np.testing.assert_allclose(float(jnp.vdot(r2, a1)),
                               float(jnp.vdot(r1, a2)), rtol=1e-10)
    # PSD with the constant in the kernel (periodic Laplacian).
    assert float(jnp.vdot(r1, a1)) >= -1e-10
    assert float(jnp.abs(st.A(jnp.ones(npn))).max()) < 1e-8

  @pytest.mark.smoke
  def test_mass_integrates_volume(self):
    """sum(B @ 1) = measure of the periodic unit square (each periodic
    node copy holds only its own elements' quadrature contributions, so
    the plain sum over copies IS the integral)."""
    _, st = _periodic_setup(n=4, order=4)
    total = float(jnp.sum(st.B(jnp.ones(st.mesh.num_nodes))))
    np.testing.assert_allclose(total, 1.0, rtol=1e-10)

  @pytest.mark.smoke
  def test_dirichlet_rows_elided(self):
    _, st = _dirichlet_setup()
    mask = np.asarray(st.interior_mask)
    assert (mask == 0).sum() > 0
    rng = np.random.default_rng(1)
    th = jnp.asarray(rng.standard_normal(st.mesh.num_nodes))
    assert float(jnp.abs((st.A(th) + st.B(th))[mask == 0]).max()) == 0.0


class TestAnalytic:

  @pytest.mark.smoke
  def test_pure_diffusion_decay(self):
    """theta = sin(2 pi x): d theta/dt = -kappa (2 pi)^2 theta exactly
    (eigenfunction), so BDF2 reproduces the decay to O(dt^2)."""
    _, st = _periodic_setup(n=8, order=5)
    c = np.asarray(st.mesh.node_coords)
    kappa, dt, steps = 0.05, 2e-3, 40
    th0 = jnp.asarray(np.sin(2 * np.pi * c[:, 0]))
    u0 = jnp.zeros((st.mesh.num_nodes, 2))
    # Exact history: thetas = [theta(-dt), theta(0)], oldest first.
    lam = kappa * (2 * np.pi) ** 2
    thetas = [th0 * np.exp(lam * dt), th0]
    us = [u0, u0]
    # One compile, many cheap calls (eager per-step dispatch dominates
    # runtime on a single-CPU host otherwise).
    step = jax.jit(lambda thetas, us: st.one_step(
        thetas, us, kappa=kappa, dt=dt, time_order=2, tol=1e-12))
    for _ in range(steps):
      th, info = step(thetas, us)
      thetas = [thetas[1], th]
    want = np.asarray(th0) * np.exp(-lam * steps * dt)
    err = np.abs(np.asarray(thetas[1]) - want).max()
    assert err < 5 * dt ** 2, err

  def test_pure_advection_translation(self):
    """Constant velocity on the periodic box translates the profile:
    theta(x, t) = theta0(x - t)."""
    _, st = _periodic_setup(n=8, order=6)
    c = np.asarray(st.mesh.node_coords)
    dt, steps = 2.5e-3, 80                        # travels 0.2 of the box
    th_exact = lambda t: np.sin(2 * np.pi * (c[:, 0] - t))
    u0 = jnp.asarray(np.stack([np.ones(len(c)), np.zeros(len(c))], axis=-1))
    thetas = [jnp.asarray(th_exact(-dt)), jnp.asarray(th_exact(0.0))]
    us = [u0, u0]
    kappa = 1e-8                                  # essentially pure advection
    step = jax.jit(lambda thetas, us: st.one_step(
        thetas, us, kappa=kappa, dt=dt, time_order=2, tol=1e-12))
    for _ in range(steps):
      th, _ = step(thetas, us)
      thetas = [thetas[1], th]
    want = th_exact(steps * dt)
    err = np.abs(np.asarray(thetas[1]) - want).max()
    assert err < 100 * dt ** 2, err               # EXT2/BDF2: O(dt^2)

  def test_conservation_divergence_free(self):
    """Divergence-free advection on the periodic box conserves the total
    scalar content sum(B theta) to solver tolerance."""
    _, st = _periodic_setup(n=6, order=5)
    c = np.asarray(st.mesh.node_coords)
    # Taylor-Green-like solenoidal field.
    u0 = jnp.asarray(np.stack(
        [np.sin(2 * np.pi * c[:, 0]) * np.cos(2 * np.pi * c[:, 1]),
         -np.cos(2 * np.pi * c[:, 0]) * np.sin(2 * np.pi * c[:, 1])],
        axis=-1))
    th0 = jnp.asarray(
        0.5 + 0.3 * np.sin(2 * np.pi * c[:, 0]) * np.sin(2 * np.pi * c[:, 1]))
    total0 = float(jnp.sum(st.mass_diag * th0))
    thetas, us = [th0, th0], [u0, u0]
    dt = 2e-3
    step = jax.jit(lambda thetas, us: st.one_step(
        thetas, us, kappa=1e-3, dt=dt, time_order=2, tol=1e-12))
    for _ in range(25):
      th, _ = step(thetas, us)
      thetas = [thetas[1], th]
    total = float(jnp.sum(st.mass_diag * thetas[1]))
    # Drift floor: div of the INTERPOLATED Taylor-Green field is spectrally
    # small but not zero, so conservation holds to that interpolation level.
    np.testing.assert_allclose(total, total0, rtol=1e-5)

  def test_pure_diffusion_decay_3d(self):
    """The module is dimension-generic: same eigenfunction decay in 3D."""
    premesh = unit_cube_mesh(4, ndim=3, periodic_dims=(0, 1, 2))
    sem = StokesSEM.create(premesh, boundary_conditions={}, order=5,
                           use_assembled_ops=False)
    st = ScalarTransport.create(sem, {})
    c = np.asarray(st.mesh.node_coords)
    kappa, dt, steps = 0.05, 2e-3, 10
    lam = kappa * (2 * np.pi) ** 2
    th0 = jnp.asarray(np.sin(2 * np.pi * c[:, 0]))
    u0 = jnp.zeros((st.mesh.num_nodes, 3))
    thetas = [th0 * np.exp(lam * dt), th0]
    for _ in range(steps):
      th, _ = st.one_step(thetas, [u0, u0], kappa=kappa, dt=dt,
                          time_order=2, tol=1e-12)
      thetas = [thetas[1], th]
    want = np.asarray(th0) * np.exp(-lam * steps * dt)
    err = np.abs(np.asarray(thetas[1]) - want).max()
    assert err < 5 * dt ** 2, err

  def test_partitioned_step_matches_unpartitioned(self):
    """4-partition scalar step under spmd_map vs the single-device oracle
    (same pattern as tests/test_parallel.py's NSE step parity)."""
    from swirlfem_tpu.parallel.spmd import device_mesh, spmd_map
    assert jax.device_count() >= 4
    dmesh = device_mesh('part', 4)
    parts = np.array([[0, 1], [2, 3]])
    pm = unit_cube_mesh(6, ndim=2, partitions=parts)
    bcs = {'boundary': (BCType.DIRICHLET, 0.0)}
    sem_u = StokesSEM.create(pm.replace(partitions=None), bcs, order=4)
    sem_p = StokesSEM.create(pm, bcs, order=4, axis_name='part',
                             device_mesh=dmesh)
    st_u = ScalarTransport.create(sem_u, bcs)
    st_p = ScalarTransport.create(sem_p, bcs)

    vc = np.asarray(sem_u.velocity.mesh.node_coords)
    mask_u = np.asarray(sem_u.velocity.interior_mask)[:, 0]
    th0 = jnp.asarray(
        np.sin(np.pi * vc[:, 0]) * np.sin(np.pi * vc[:, 1]))
    u0 = jnp.asarray(np.stack(
        [np.sin(np.pi * vc[:, 1]) * mask_u, 0.1 * mask_u], axis=-1))
    kw = dict(kappa=1e-2, dt=1e-3, time_order=2, tol=1e-12)
    th_exp, _ = st_u.one_step([th0, th0], [u0, u0], **kw)

    v_idx = np.asarray(sem_p.velocity.mesh.node_indices)
    shard = lambda x: jnp.asarray(np.asarray(x)[np.clip(v_idx, 0, None)]
                                  * (v_idx != -1).astype(np.float64)
                                  .reshape(v_idx.shape + (1,) * (x.ndim - 1)))
    run = spmd_map(
        lambda st, thetas, us: st.one_step(thetas, us, **kw), dmesh, 'part')
    th_got, _ = run(st_p, [shard(th0), shard(th0)], [shard(u0), shard(u0)])
    valid = v_idx != -1
    np.testing.assert_allclose(np.asarray(th_got)[valid],
                               np.asarray(th_exp)[v_idx[valid]], atol=1e-10)

  @pytest.mark.smoke
  def test_differentiable_through_step(self):
    """Gradients flow through the CG solve (custom_linear_solve)."""
    _, st = _periodic_setup(n=4, order=4)
    c = np.asarray(st.mesh.node_coords)
    th0 = jnp.asarray(np.sin(2 * np.pi * c[:, 0]))
    u0 = jnp.zeros((st.mesh.num_nodes, 2))

    def loss(kappa):
      th, _ = st.one_step([th0, th0], [u0, u0], kappa=kappa, dt=1e-3,
                          time_order=2, tol=1e-12)
      return jnp.sum(th ** 2)

    g = jax.grad(loss)(0.05)
    assert np.isfinite(float(g)) and float(g) < 0.0  # diffusion decays theta
