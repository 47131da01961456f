"""Cylinder-in-channel: mesh generation, curved boundary, short NSE run.

Validates the fully unstructured path on the Schaefer-Turek geometry: the
programmatic O-grid mesh has positive Jacobians everywhere after the
blended circle snap, the refined wall nodes sit exactly on the circle, and
a short impulsive-start run stays finite with a developing wake.  (The
long vortex-shedding run with Strouhal validation lives in
examples/cylinder.py and runs on TPU; CPU-f64 suite time forbids it here.)
"""

import jax.numpy as jnp
import numpy as np

from swirlfem_tpu.examples.cylinder import inflow_boundary_field
from swirlfem_tpu.examples.cylinder import make_cylinder_sem
from swirlfem_tpu.examples.cylinder import run_cylinder
from swirlfem_tpu.examples.cylinder import strouhal_number
from swirlfem_tpu.utils.cylinder import cylinder_channel_premesh


def test_premesh_structure():
  pm = cylinder_channel_premesh(ns=4, nr=3, nx_down=10)
  assert pm.ndim == 2 and pm.order == 1
  for name in ('cylinder', 'inflow', 'outflow', 'walls'):
    assert name in pm.physical_groups, name
  # Every cylinder facet is an edge of exactly one element.
  elems = np.asarray(pm.elements)
  edge_set = set()
  for e in elems:
    for pair in ((e[0], e[1]), (e[2], e[3]), (e[0], e[2]), (e[1], e[3])):
      edge_set.add(frozenset(pair))
  for facet in np.asarray(pm.physical_groups['cylinder']):
    assert frozenset(facet.tolist()) in edge_set


def test_curved_boundary_and_positive_jacobians():
  sem = make_cylinder_sem(order=4, ns=4, nr=3, nx_down=10)
  jd = np.asarray(sem.velocity.vspace.jacdets)
  assert jd.min() > 0, jd.min()
  coords = np.asarray(sem.velocity.mesh.node_coords)
  on_cyl = np.asarray(sem.velocity.mesh.physical_masks['cylinder']) > 0
  r = np.linalg.norm(coords[on_cyl] - np.array([0.2, 0.2]), axis=-1)
  np.testing.assert_allclose(r, 0.05, atol=1e-12)
  # The channel-grid interface stayed conforming: outer-square nodes of
  # the ring are untouched, so the mesh has no duplicated near-miss nodes.
  assert sem.velocity.mesh.num_nodes == len(np.unique(
      np.round(coords, 9), axis=0))


def test_short_impulsive_run_stays_finite():
  sem = make_cylinder_sem(order=3, ns=4, nr=3, nx_down=10)
  u, p, trace = run_cylinder(sem, num_steps=6, dt=2e-3, tol=1e-6)
  assert np.isfinite(np.asarray(u)).all()
  assert np.isfinite(np.asarray(p)).all()
  # Flow develops: downstream probe sees nonzero velocity by step 6.
  ux_max = float(jnp.abs(u[:, 0]).max())
  assert ux_max > 0.5, ux_max  # inflow lift dominates early flow
  assert np.isfinite(trace).all()


def test_inflow_profile_mean():
  sem = make_cylinder_sem(order=3, ns=4, nr=3, nx_down=10)
  ub = np.asarray(inflow_boundary_field(sem))
  coords = np.asarray(sem.velocity.mesh.node_coords)
  on_in = np.asarray(sem.velocity.mesh.physical_masks['inflow']) > 0
  y = coords[on_in, 1]
  got = ub[on_in, 0]
  np.testing.assert_allclose(got, 6.0 * y * (0.41 - y) / 0.41 ** 2,
                             atol=1e-12)


def test_strouhal_extraction():
  dt = 1e-2
  t = np.arange(400) * dt
  st_true = 0.3
  f = st_true * 1.0 / 0.1  # St * U / D
  trace = 0.02 * np.sin(2 * np.pi * f * t) + 0.001
  st = strouhal_number(trace, dt)
  np.testing.assert_allclose(st, st_true, rtol=0.06)


def test_dense_schur_preconditioner_exact_and_symmetric():
  """Isoparametric geometry keeps E symmetric on the curved mesh, and the
  assembled dense inverse takes the pressure solve to O(1) iterations."""
  import jax
  from jax import lax
  from swirlfem_tpu.ops.dense_schur import build_dense_pressure_solver

  sem = make_cylinder_sem(order=3, ns=4, nr=3, nx_down=10)
  npn = sem.pressure.pspace.mesh.num_nodes
  cols = lax.map(lambda v: sem.E(v, dt=1e-3, time_order=2), jnp.eye(npn),
                 batch_size=64)
  e = np.asarray(cols).T
  assert np.abs(e - e.T).max() < 1e-13 * np.abs(e).max()

  solve = build_dense_pressure_solver(sem, 1e-3, 2)
  assert not solve.has_nullspace  # do-nothing outflow: E nonsingular
  rng = np.random.default_rng(0)
  r = rng.standard_normal(npn)
  back = np.array(sem.E(solve(jnp.asarray(r)), dt=1e-3, time_order=2))
  np.testing.assert_allclose(back, r, atol=1e-9 * np.abs(r).max())

  # One step: pressure correction converges in O(1) iterations (was ~2000
  # unpreconditioned on this geometry).
  from swirlfem_tpu.examples.cylinder import inflow_boundary_field
  ub = inflow_boundary_field(sem)
  nv = sem.velocity.mesh.num_nodes
  u0 = jnp.zeros((nv, 2))
  p0 = jnp.zeros(npn)
  precond = sem.dense_pressure_preconditioner(1e-3, 2)
  _, _, aux = sem.stokes_one_step(
      [u0, u0], [p0, p0], -sem.C(ub), mu=1e-3, dt=1e-3, time_order=2,
      u_boundary=ub, tol=1e-6, atol=1e-8, pressure_preconditioner=precond,
      project_out_nullspace=False)
  assert int(aux['dp_info']['num_iterations']) <= 3


def test_reaction_force_poiseuille():
  """Consistent-flux wall force on analytic Poiseuille flow.

  Channel [0,1]^2, periodic in x, Dirichlet walls.  The steady profile
  u = (g y (1-y), 0) is driven by the constant body force f_x = 2 mu g;
  at steady state the walls must absorb exactly the injected momentum, so
  the force the fluid exerts on the walls is (integral of f) = (2 mu g, 0).
  The quartic velocity space represents the quadratic profile exactly, so
  the discrete identity holds to roundoff.
  """
  from swirlfem_tpu.core.bc import BCType
  from swirlfem_tpu.examples.cylinder import reaction_force
  from swirlfem_tpu.nse.solver import StokesSEM
  from swirlfem_tpu.utils.box import unit_cube_mesh

  mu, g = 0.3, 1.7
  premesh = unit_cube_mesh(4, ndim=2, periodic_dims=(0,))
  sem = StokesSEM.create(
      premesh, boundary_conditions={'boundary': (BCType.DIRICHLET, 0.0)},
      order=4)
  vel = sem.velocity
  y = np.asarray(vel.mesh.node_coords)[:, 1]
  u = jnp.asarray(np.stack([g * y * (1 - y), np.zeros_like(y)], axis=-1))
  f_field = jnp.asarray(
      np.stack([np.full_like(y, 2 * mu * g), np.zeros_like(y)], axis=-1))
  f_cov = vel.scatter(vel.B_local(vel.gather(f_field)))
  p = jnp.zeros(sem.pressure.pspace.mesh.num_nodes)

  # Steady history: the BDF time-derivative term vanishes identically.
  force = reaction_force(sem, [u, u, u], p, f_cov, mu=mu, dt=0.01,
                         group='boundary')
  np.testing.assert_allclose(
      np.asarray(force), [2 * mu * g, 0.0], rtol=1e-9, atol=1e-11)

  # Pure-pressure check: u = 0, constant p exerts zero net force on the
  # closed opposing-wall pair.
  force_p = reaction_force(
      sem, [jnp.zeros_like(u)] * 2, jnp.full_like(p, 3.25), 0.0,
      mu=mu, dt=0.01, group='boundary')
  np.testing.assert_allclose(np.asarray(force_p), [0.0, 0.0], atol=1e-11)


def test_reaction_force_cylinder_drag_positive():
  """Impulsive-start cylinder: finite force, positive drag."""
  from swirlfem_tpu.examples.cylinder import reaction_force

  sem = make_cylinder_sem(order=3, ns=4, nr=3, nx_down=10)
  mu = 1e-3
  dt = 1e-3
  u_boundary = inflow_boundary_field(sem)
  u, p, _ = run_cylinder(sem, reynolds=100.0, dt=dt, num_steps=8,
                         time_order=2, tol=1e-8)
  # One more step to get a (k+1)-deep consistent history around (u, p).
  us = [u, u]  # impulsive history is not stored by run_cylinder; use
  # a BDF1-consistent pair for a smoke-level check.
  force = reaction_force(sem, us, p, 0.0, mu=mu, dt=dt, group='cylinder')
  force = np.asarray(force)
  assert np.all(np.isfinite(force))
  assert force[0] > 0.0, force  # drag pushes the cylinder downstream


def test_scan_force_trace():
  """run_cylinder_scan(compute_forces=True) yields finite per-step forces
  with positive drag once the inflow is established."""
  from swirlfem_tpu.examples.cylinder import run_cylinder_scan

  sem = make_cylinder_sem(order=3, ns=4, nr=3, nx_down=10)
  u, p, trace, forces = run_cylinder_scan(
      sem, dt=5e-4, num_steps=20, steps_per_dispatch=10,
      compute_forces=True, kick_steps=5)
  assert trace.shape == (20,)
  assert forces.shape == (20, 2)
  assert np.isfinite(forces).all()
  assert forces[-1, 0] > 0.0, forces[-1]  # drag points downstream


def test_scan_checkpoint_resume(tmp_path):
  """A scan interrupted after its first checkpoint resumes at the saved
  chunk and reproduces the uninterrupted trajectory (the failure-recovery
  path for long TPU campaigns where the tunneled worker can crash)."""
  from swirlfem_tpu.examples.cylinder import run_cylinder_scan

  sem = make_cylinder_sem(order=3, ns=4, nr=3, nx_down=10)
  kw = dict(dt=5e-4, steps_per_dispatch=10, compute_forces=True,
            kick_steps=5, use_projection=False, tol=1e-11,
            checkpoint_every=1)
  ck = str(tmp_path / 'scan.ck.npz')

  # Uninterrupted 30-step oracle (no checkpoint file involved).
  _, _, trace_full, forces_full = run_cylinder_scan(
      sem, num_steps=30, **{k: v for k, v in kw.items()
                            if k != 'checkpoint_every'})

  # "Crash" after 10 steps (one chunk), then resume to 30.
  run_cylinder_scan(sem, num_steps=10, checkpoint_path=ck, **kw)
  assert np.load(ck)['chunk'] == 1
  _, _, trace_res, forces_res = run_cylinder_scan(
      sem, num_steps=30, checkpoint_path=ck, **kw)
  assert trace_res.shape == (30,)
  np.testing.assert_allclose(trace_res, trace_full, atol=1e-7)
  np.testing.assert_allclose(forces_res, forces_full, atol=1e-6)


def test_unstructured_fast_path_matches_generic_step():
  """The E-last unstructured fast path must reproduce the generic-operator
  step on the curved cylinder mesh to rounding."""
  from swirlfem_tpu.core.bc import BCType
  from swirlfem_tpu.nse.solver import StokesSEM
  from swirlfem_tpu.utils.cylinder import make_cylinder_snap
  premesh = cylinder_channel_premesh(ns=4, nr=3, nx_down=10)
  bcs = {'cylinder': (BCType.DIRICHLET, 0.0),
         'walls': (BCType.DIRICHLET, 0.0),
         'inflow': (BCType.DIRICHLET, 0.0)}
  snap = make_cylinder_snap(premesh, radius=0.05, center=(0.2, 0.2))
  sem = StokesSEM.create(premesh, boundary_conditions=bcs, order=4,
                         coord_transform=snap, unstructured_el_ops=True)
  assert sem.fast_ops is not None and sem.fast_ops.vinfo is None
  sem_generic = sem.replace(fast_ops=None)
  nv = sem.velocity.mesh.num_nodes
  npn = sem.pressure.pspace.mesh.num_nodes
  rng = np.random.default_rng(0)
  mask = np.asarray(sem.velocity.interior_mask)
  u0 = jnp.asarray(rng.standard_normal((nv, 2)) * 1e-2 * mask)
  ub = inflow_boundary_field(sem)
  p0 = jnp.zeros(npn)
  kwargs = dict(mu=1e-3, dt=5e-4, time_order=2, tol=1e-12,
                project_out_nullspace=False)
  u_f, p_f, _ = sem.stokes_one_step([u0, u0], [p0, p0],
                                    jnp.zeros_like(u0), u_boundary=ub,
                                    **kwargs)
  u_g, p_g, _ = sem_generic.stokes_one_step([u0, u0], [p0, p0],
                                            jnp.zeros_like(u0),
                                            u_boundary=ub, **kwargs)
  np.testing.assert_allclose(np.asarray(u_f), np.asarray(u_g), atol=1e-9)
  np.testing.assert_allclose(np.asarray(p_f), np.asarray(p_g), atol=1e-7)

  # The element operators themselves agree too (A, C, D, Dt).
  u1 = jnp.asarray(rng.standard_normal((nv, 2)))
  p1 = jnp.asarray(rng.standard_normal(npn))
  a_f = jnp.stack(sem._fast_stiffness(tuple(u1[:, j] for j in range(2))),
                  axis=-1) * sem.velocity.interior_mask
  a_g = sem_generic.A(u1)
  np.testing.assert_allclose(np.asarray(a_f), np.asarray(a_g), atol=1e-10)
  np.testing.assert_allclose(np.asarray(sem.C(u1)),
                             np.asarray(sem_generic.C(u1)), atol=1e-10)
  d_f = sem._fast_D(tuple(u1[:, j] for j in range(2)))
  np.testing.assert_allclose(np.asarray(d_f),
                             np.asarray(sem_generic.D(u1)), atol=1e-10)
  dt_f = jnp.stack(sem._fast_Dt(p1), axis=-1)
  np.testing.assert_allclose(np.asarray(dt_f),
                             np.asarray(sem_generic.Dt(p1)), atol=1e-10)
