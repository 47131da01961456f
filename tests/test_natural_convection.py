"""Tests for the differentially heated cavity (de Vahl Davis benchmark).

Validation ladder: conduction limit (exact discrete identities) ->
full buoyancy-coupled benchmark at Ra 1e3 against the published mean
Nusselt number, with three independent Nu estimators cross-checked.

Reference parity: the reference has no scalar transport or buoyancy
coupling (``swirl_fem/navier_stokes/navier_stokes.py`` is momentum
only); this exercises beyond-parity capability composed from tested
pieces (`nse/scalar.py` + `nse/solver.py`).
"""

import numpy as np
import jax.numpy as jnp
import pytest

from swirlfem_tpu.examples import natural_convection as nc
from swirlfem_tpu.utils.box import unit_cube_mesh


class TestFaceGroups:

  @pytest.mark.smoke
  def test_face_groups_partition_the_boundary(self):
    pm = unit_cube_mesh(3, ndim=2, face_groups=True)
    names = {'xlo', 'xhi', 'ylo', 'yhi', 'boundary'}
    assert names <= set(pm.physical_groups)
    per_face = sum(len(pm.physical_groups[n]) for n in names - {'boundary'})
    assert per_face == len(pm.physical_groups['boundary']) == 4 * 3

  @pytest.mark.smoke
  def test_face_groups_skip_periodic_dims(self):
    pm = unit_cube_mesh(3, ndim=2, periodic_dims=(0,), face_groups=True)
    assert 'xlo' not in pm.physical_groups
    assert {'ylo', 'yhi'} <= set(pm.physical_groups)

  @pytest.mark.smoke
  def test_face_group_coordinates(self):
    pm = unit_cube_mesh(2, ndim=3, face_groups=True)
    for axis, name in enumerate(['xlo', 'ylo', 'zlo']):
      facets = pm.physical_groups[name]
      coords = pm.node_coords[facets.reshape(-1)]
      np.testing.assert_allclose(coords[:, axis], 0.0, atol=1e-15)


class TestGrading:

  @pytest.mark.smoke
  def test_grading_clusters_at_walls(self):
    sem_u, _, _ = nc.create_cavity(n_el=4, order=3)
    sem_g, _, th_b = nc.create_cavity(n_el=4, order=3, grading=0.5)
    xs_u = np.unique(np.asarray(sem_u.velocity.mesh.node_coords)[:, 0])
    xs_g = np.unique(np.asarray(sem_g.velocity.mesh.node_coords)[:, 0])
    # Same span, smaller first gap, same node count.
    assert xs_g[0] == 0.0 and abs(xs_g[-1] - 1.0) < 1e-12
    assert len(xs_g) == len(xs_u)
    assert xs_g[1] - xs_g[0] < 0.6 * (xs_u[1] - xs_u[0])
    # The lift uses the graded coordinates.
    coords = np.asarray(sem_g.velocity.mesh.node_coords)
    np.testing.assert_allclose(np.asarray(th_b), 0.5 - coords[:, 0],
                               atol=1e-15)


class TestConductionLimit:
  """At Ra = 0 the exact solution is theta = 1/2 - x, u = 0."""

  @pytest.mark.smoke
  def test_conduction_is_a_fixed_point_and_nu_is_one(self):
    sem, st, th_b = nc.create_cavity(n_el=3, order=4)
    nv = sem.velocity.mesh.num_nodes
    u0 = jnp.zeros((nv, 2))
    # One BDF2 transport step from the exact steady history stays put.
    th, info = st.one_step([th_b, th_b], [u0, u0], kappa=1.0, dt=1e-2,
                           time_order=2, theta_boundary=th_b, tol=1e-12)
    np.testing.assert_allclose(np.asarray(th), np.asarray(th_b), atol=1e-10)
    # All three Nusselt estimators give exactly 1 (linear theta is exact).
    np.testing.assert_allclose(float(nc.nusselt_volume(sem, u0, th_b)),
                               1.0, rtol=1e-12)
    np.testing.assert_allclose(float(nc.nusselt_wall(sem, st, u0, th_b,
                                                     'xlo')), 1.0, rtol=1e-10)
    np.testing.assert_allclose(float(-nc.nusselt_wall(sem, st, u0, th_b,
                                                      'xhi')), 1.0, rtol=1e-10)


class TestDeVahlDavis:

  def test_ra_1e3_mean_nusselt(self):
    """Ra 1e3, Pr 0.71: mean Nu vs the published benchmark (1.118).

    Order-5 6x6 spectral elements resolve this smooth flow; the run
    marches ~600 BDF2 steps to steady state (~35 s CPU).  The volume
    identity and both consistent wall fluxes must agree with each other
    far more tightly than with the benchmark — mutual agreement is the
    discrete steady-state identity, benchmark agreement is accuracy.
    """
    r = nc.run_cavity(1e3, n_el=6, order=5, verbose=False)
    nu_bench = nc.BENCHMARK_NU[1e3]
    assert abs(r['nu_volume'] - nu_bench) / nu_bench < 5e-3, r['nu_volume']
    # ... and the modern grid-converged value far more tightly.
    nu_acc = nc.ACCURATE_NU[1e3]
    assert abs(r['nu_volume'] - nu_acc) / nu_acc < 1e-3, r['nu_volume']
    # Steady-state consistency of the three estimators.
    np.testing.assert_allclose(r['nu_hot'], r['nu_volume'], rtol=1e-6)
    np.testing.assert_allclose(r['nu_cold'], r['nu_volume'], rtol=1e-6)
    # de Vahl Davis Table I: peak velocities (kappa-based units).
    # u_max on the vertical mid-plane is 3.649; our global |u| max is a
    # loose upper-bound check that the flow strength is right.
    assert 3.4 < r['u_max'] < 4.2, r['u_max']

  def test_ra_1e4_mean_nusselt(self):
    """Ra 1e4: the convection-sensitive tier of the benchmark.

    Regression guard for the missing-momentum-advection bug: the Stokes+
    buoyancy system (no inertia) converges, spectrally and dt-
    independently, to Nu = 2.2748 — 1.3% off; the full NSE gives the
    grid-converged 2.2448 (arbitrated by the independent second-order FD
    oracle in experiments/fd_cavity_oracle.py, whose Richardson-
    extrapolated value is 2.2444).  A 6x6 order-5 mesh already lands
    within ~1e-5 relative of 2.2448 (measured 2.24479), so the 2e-3
    bound fails for Stokes+buoyancy by 6x while passing honest
    discretizations.
    """
    r = nc.run_cavity(1e4, n_el=6, order=5, verbose=False)
    nu_acc = nc.ACCURATE_NU[1e4]
    assert abs(r['nu_volume'] - nu_acc) / nu_acc < 2e-3, r['nu_volume']
    np.testing.assert_allclose(r['nu_hot'], r['nu_volume'], rtol=1e-4)
    np.testing.assert_allclose(r['nu_cold'], r['nu_volume'], rtol=1e-4)
    # Peak velocity (kappa units): benchmark v_max = 19.617 on the
    # horizontal mid-plane; global |component| max is slightly above.
    assert 19.0 < r['u_max'] < 20.3, r['u_max']
