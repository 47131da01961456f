"""Direct A/B parity against the reference implementation (slow tier).

Every other validation in this suite is against analytic or literature
oracles; these tests run google-research/swirl-fem ITSELF (importable from
``/root/reference``) side by side with this framework on identical
workloads and compare field-for-field.  This is the one check that can
catch a silent semantic divergence (filter blend convention, BC lift,
extrapolation rule) that an analytic O(dt^2) bound cannot see.

Configs are chosen to sidestep the documented latent reference bugs
(COMPONENTS.md "Reference bugs found & fixed here"): affine meshes,
unpartitioned, and — for the exact-match cases — non-periodic.  The
periodic + filter case pins documented bug #3 instead: the reference's
modal filter divides by local multiplicity only, producing O(alpha)
seam jumps, so the two implementations must *disagree* there while ours
stays seam-consistent.

Node numberings differ (structured grid numbering here vs the generic
refiner's ordering there), so fields are matched through node
coordinates.

Reference call surface: ``swirl_fem/navier_stokes/navier_stokes.py:258``
(StokesSEM.create), ``:350`` (stokes_one_step), ``examples/poisson.py:49``.
"""

import sys

import jax.numpy as jnp
import numpy as np
import pytest

REF = '/root/reference'
if REF not in sys.path:
  sys.path.insert(0, REF)

pytestmark = pytest.mark.slow


@pytest.fixture(scope='module')
def ref():
  mods = {}
  from swirl_fem.common import premesh_commons
  from swirl_fem.core.interpolation import Nodes1D, NodeType
  from swirl_fem.core.mesh_refiner import refine_premesh
  from swirl_fem.examples import poisson
  from swirl_fem.navier_stokes import navier_stokes
  mods['box'] = premesh_commons
  mods['Nodes1D'] = Nodes1D
  mods['NodeType'] = NodeType
  mods['refine'] = refine_premesh
  mods['poisson'] = poisson
  mods['ns'] = navier_stokes
  return mods


def match_nodes(coords_from, coords_to):
  """Index map m with ``coords_to[m] == coords_from`` (coordinate keyed)."""
  def keys(c):
    return [tuple(v) for v in np.round(np.asarray(c, dtype=np.float64)
                                       * 1e10).astype(np.int64)]
  lookup = {k: i for i, k in enumerate(keys(coords_to))}
  m = np.asarray([lookup[k] for k in keys(coords_from)], dtype=np.int64)
  assert len(set(m.tolist())) == len(m)
  return m


def test_poisson_matches_reference(ref):
  from swirlfem_tpu.core.quadrature import Nodes1D, NodeType
  from swirlfem_tpu.core.refine import refine_premesh
  from swirlfem_tpu.examples.poisson import BCType, solve_poisson
  from swirlfem_tpu.utils.box import unit_cube_mesh

  n, pts = 6, 5

  def forcing(c):
    return (2 * np.pi**2 * np.sin(np.pi * c[:, 0])
            * np.sin(np.pi * c[:, 1]))

  mesh = refine_premesh(
      unit_cube_mesh(n, ndim=2),
      Nodes1D.create(pts, NodeType.GAUSS_LOBATTO_LEGENDRE)).finalize()
  c = np.asarray(mesh.node_coords)
  u = solve_poisson(mesh, jnp.asarray(forcing(c)),
                    {'boundary': (BCType.DIRICHLET, 0)}, rtol=1e-12)

  rmesh = ref['refine'](
      ref['box'].unit_cube_mesh(n, ndim=2),
      gridpoints_1d=ref['Nodes1D'].create(
          num_points=pts,
          node_type=ref['NodeType'].GAUSS_LOBATTO_LEGENDRE)).finalize()
  rc = np.asarray(rmesh.node_coords)
  ru = ref['poisson'].solve_poisson(
      rmesh, jnp.asarray(forcing(rc)),
      {'boundary': (ref['poisson'].BCType.DIRICHLET, 0)}, rtol=1e-12)

  m = match_nodes(c, rc)
  np.testing.assert_allclose(np.asarray(u), np.asarray(ru)[m],
                             atol=1e-10, rtol=0)


def _stream_ic(c):
  """Divergence-free, wall-compatible IC: u = curl(sin^2 pi x sin^2 pi y)."""
  x, y = c[:, 0], c[:, 1]
  sx, sy = np.sin(np.pi * x), np.sin(np.pi * y)
  ux = sx**2 * 2 * np.pi * sy * np.cos(np.pi * y)
  uy = -2 * np.pi * sx * np.cos(np.pi * x) * sy**2
  return np.stack([ux, uy], axis=-1)


def _make_pair(ref, n, order, periodic=False, bc=True):
  from swirlfem_tpu.core.bc import BCType
  from swirlfem_tpu.nse.solver import StokesSEM
  from swirlfem_tpu.utils.box import unit_cube_mesh

  pdims = (0, 1) if periodic else ()
  bcs = {'boundary': (BCType.DIRICHLET, 0.0)} if bc and not periodic else {}
  rbcs = ({'boundary': (ref['ns'].BCType.DIRICHLET, 0.0)}
          if bc and not periodic else {})
  sem = StokesSEM.create(unit_cube_mesh(n, ndim=2, periodic_dims=pdims),
                         boundary_conditions=bcs, order=order)
  rsem = ref['ns'].StokesSEM.create(
      ref['box'].unit_cube_mesh(n, ndim=2, periodic_dims=pdims),
      boundary_conditions=rbcs, order=order)
  vm = match_nodes(sem.velocity.mesh.node_coords,
                   rsem.velocity.vspace.mesh.node_coords)
  pm = match_nodes(sem.pressure.pspace.mesh.node_coords,
                   rsem.pressure.pspace.mesh.node_coords)
  return sem, rsem, vm, pm


@pytest.mark.parametrize('alpha', [0.0, 0.05])
def test_stokes_steps_match_reference(ref, alpha):
  """N full fractional steps, f64, each implementation fed its own output.

  Exact-match configs: affine non-periodic cavity box, both filter-off
  and filter-on (on a non-periodic mesh the reference's
  local-multiplicity filter normalization agrees with ours).
  """
  n, order, mu, dt, steps = 4, 5, 1e-2, 2e-3, 3
  sem, rsem, vm, pm = _make_pair(ref, n, order)

  c = np.asarray(sem.velocity.mesh.node_coords)
  rc = np.asarray(rsem.velocity.vspace.mesh.node_coords)
  u0 = jnp.asarray(_stream_ic(c))
  ru0 = jnp.asarray(_stream_ic(rc))
  p0 = jnp.zeros(sem.pressure.pspace.mesh.num_nodes)
  rp0 = jnp.zeros(rsem.pressure.pspace.mesh.num_nodes)

  us, ps = [u0, u0], [p0, p0]
  rus, rps = [ru0, ru0], [rp0, rp0]
  for step in range(steps):
    u, p, _ = sem.stokes_one_step(us, ps, 0, mu=mu, dt=dt, time_order=2,
                                  alpha=alpha, tol=1e-13, atol=1e-13)
    zero = jnp.zeros_like(rus[-1])
    ru, rp, _ = rsem.stokes_one_step(rus, rps, zero, mu=mu, dt=dt,
                                     time_order=2, alpha=alpha,
                                     tol=1e-13, atol=1e-13)
    u_np = np.asarray(u)
    ru_np = np.asarray(ru)[vm]
    scale = np.abs(u_np).max()
    np.testing.assert_allclose(u_np, ru_np, atol=1e-9 * scale, rtol=0,
                               err_msg=f'velocity diverged at step {step}')
    # Pressure is defined up to the projected-out constant: compare
    # mean-free (same arbitrary representative on both sides).
    p_np = np.asarray(p)
    rp_np = np.asarray(rp)[pm]
    p_np = p_np - p_np.mean()
    rp_np = rp_np - rp_np.mean()
    pscale = max(np.abs(p_np).max(), 1e-30)
    np.testing.assert_allclose(p_np, rp_np, atol=1e-7 * pscale, rtol=0,
                               err_msg=f'pressure diverged at step {step}')
    us, ps = [us[-1], u], [ps[-1], p]
    rus, rps = [rus[-1], ru], [rps[-1], rp]


def test_lid_driven_boundary_lift_matches_reference(ref):
  """Non-homogeneous Dirichlet via u_boundary: the BC-lift convention."""
  n, order, mu, dt = 4, 4, 1e-2, 2e-3
  sem, rsem, vm, pm = _make_pair(ref, n, order)

  def lid(c):
    # Regularized lid: zero at the corners, so the lift is continuous.
    ub = np.zeros((len(c), 2))
    ub[:, 0] = np.where(np.isclose(c[:, 1], 1.0),
                        np.sin(np.pi * c[:, 0])**2, 0.0)
    return ub

  c = np.asarray(sem.velocity.mesh.node_coords)
  rc = np.asarray(rsem.velocity.vspace.mesh.node_coords)
  ub, rub = jnp.asarray(lid(c)), jnp.asarray(lid(rc))
  nv = sem.velocity.mesh.num_nodes
  u0 = jnp.zeros((nv, 2))
  ru0 = jnp.zeros((rsem.velocity.vspace.mesh.num_nodes, 2))
  p0 = jnp.zeros(sem.pressure.pspace.mesh.num_nodes)
  rp0 = jnp.zeros(rsem.pressure.pspace.mesh.num_nodes)

  u, p, _ = sem.stokes_one_step([u0, u0], [p0, p0], 0, mu=mu, dt=dt,
                                time_order=2, alpha=0.0, u_boundary=ub,
                                tol=1e-13, atol=1e-13)
  zero = jnp.zeros_like(ru0)
  ru, rp, _ = rsem.stokes_one_step([ru0, ru0], [rp0, rp0], zero, mu=mu,
                                   dt=dt, time_order=2, alpha=0.0,
                                   u_boundary=rub, tol=1e-13, atol=1e-13)
  scale = float(jnp.abs(u).max())
  np.testing.assert_allclose(np.asarray(u), np.asarray(ru)[vm],
                             atol=1e-9 * scale, rtol=0)
  p_np = np.asarray(p) - np.asarray(p).mean()
  rp_np = np.asarray(rp)[pm] - np.asarray(rp)[pm].mean()
  np.testing.assert_allclose(p_np, rp_np,
                             atol=1e-7 * max(abs(p_np).max(), 1e-30), rtol=0)


def test_periodic_filter_matches_reference(ref):
  """Fully periodic box, filter on and off: exact A/B agreement.

  Measured here: the reference's filter normalization IS consistent on
  unpartitioned periodic meshes (its deduped node numbering makes
  ``diag_qqt`` count copies across the seam), so both alphas must match
  to rounding.  The documented filter multiplicity bug (COMPONENTS.md
  reference bug #3) manifests only in the PARTITIONED case, where the
  reference's scatter sums local copies without a cross-partition
  exchange — not exercisable in this single-process A/B.
  """
  n, order, mu, dt = 4, 4, 5e-3, 1e-3
  sem, rsem, vm, _ = _make_pair(ref, n, order, periodic=True, bc=False)

  c = np.asarray(sem.velocity.mesh.node_coords)
  rc = np.asarray(rsem.velocity.vspace.mesh.node_coords)

  def ic(c):
    x, y = c[:, 0], c[:, 1]
    return np.stack([np.sin(2 * np.pi * y) + 0.3 * np.cos(4 * np.pi * x),
                     np.sin(2 * np.pi * x)], axis=-1)

  u0, ru0 = jnp.asarray(ic(c)), jnp.asarray(ic(rc))
  p0 = jnp.zeros(sem.pressure.pspace.mesh.num_nodes)
  rp0 = jnp.zeros(rsem.pressure.pspace.mesh.num_nodes)

  def one(alpha):
    u, _, _ = sem.stokes_one_step([u0, u0], [p0, p0], 0, mu=mu, dt=dt,
                                  time_order=2, alpha=alpha,
                                  tol=1e-13, atol=1e-13)
    ru, _, _ = rsem.stokes_one_step([ru0, ru0], [rp0, rp0],
                                    jnp.zeros_like(ru0), mu=mu, dt=dt,
                                    time_order=2, alpha=alpha,
                                    tol=1e-13, atol=1e-13)
    return np.asarray(u), np.asarray(ru)[vm]

  u_a0, ru_a0 = one(0.0)
  scale = np.abs(u_a0).max()
  np.testing.assert_allclose(u_a0, ru_a0, atol=1e-8 * scale, rtol=0)

  u_f, ru_f = one(0.05)
  # Ours: seam slots (the redundant first/last grid planes of the
  # structured periodic numbering) carry identical values.
  nv = int(round(np.sqrt(len(u_f))))
  grid = u_f.reshape(nv, nv, 2)
  np.testing.assert_allclose(grid[0, :], grid[-1, :], atol=1e-11 * scale,
                             rtol=0)
  np.testing.assert_allclose(grid[:, 0], grid[:, -1], atol=1e-11 * scale,
                             rtol=0)
  np.testing.assert_allclose(u_f, ru_f, atol=1e-8 * scale, rtol=0)
