"""Lid-driven cavity (non-homogeneous Dirichlet) and 3D NSE smoke tests."""

import jax.numpy as jnp
import numpy as np
import pytest

from swirlfem_tpu.core.bc import BCType
from swirlfem_tpu.examples.cavity import (lid_boundary_field, make_cavity,
                                          run_cavity)
from swirlfem_tpu.nse.solver import StokesSEM
from swirlfem_tpu.utils.box import unit_cube_mesh


def test_cavity_develops_primary_vortex():
  sem = make_cavity(num_elements=4, order=4)
  u, p, aux = run_cavity(sem, reynolds=100.0, dt=5e-3, num_steps=30)
  u_np = np.asarray(u)
  coords = np.asarray(sem.velocity.mesh.node_coords)
  assert np.isfinite(u_np).all() and np.isfinite(np.asarray(p)).all()
  # The lid drags fluid: x-velocity just below the lid is positive.
  near_lid = (coords[:, 1] > 0.85) & (coords[:, 1] < 0.99)
  assert u_np[near_lid, 0].mean() > 0.01
  # Return flow near the bottom is negative (primary vortex signature).
  lower = (coords[:, 1] > 0.2) & (coords[:, 1] < 0.5)
  assert u_np[lower, 0].mean() < 0.0
  # No-slip walls: velocity vanishes on the non-lid boundary.
  walls = ((np.abs(coords[:, 0]) < 1e-12) | (np.abs(coords[:, 0] - 1) < 1e-12)
           | (np.abs(coords[:, 1]) < 1e-12))
  assert np.abs(u_np[walls]).max() < 1e-10
  # Single vorticity cell dominates: mean vorticity has a definite sign.
  w = np.asarray(sem.vorticity(u))
  assert w.mean() < 0.0  # clockwise primary vortex for a rightward lid


def test_cavity_boundary_field():
  sem = make_cavity(num_elements=4, order=3)
  ub = np.asarray(lid_boundary_field(sem))
  coords = np.asarray(sem.velocity.mesh.node_coords)
  on_lid = np.abs(coords[:, 1] - 1.0) < 1e-12
  assert np.abs(ub[~on_lid]).max() == 0.0
  assert ub[on_lid, 0].max() > 0.99  # peak lid speed ~ 1


def test_nse_3d_smoke():
  """3D Navier-Stokes: operators consistent, one step runs and is stable."""
  pm = unit_cube_mesh(2, ndim=3, periodic_dims=(0, 1, 2))
  sem = StokesSEM.create(pm, boundary_conditions={}, order=3)
  assert sem.fast_ops is not None  # 3D boxes ride the E-last fast path too

  coords = np.asarray(sem.velocity.mesh.node_coords)
  k = 2 * np.pi
  # 3D Taylor-Green-like divergence-free field.
  u = np.stack([
      np.cos(k * coords[:, 0]) * np.sin(k * coords[:, 1]) * np.sin(
          k * coords[:, 2]),
      -0.5 * np.sin(k * coords[:, 0]) * np.cos(k * coords[:, 1]) * np.sin(
          k * coords[:, 2]),
      -0.5 * np.sin(k * coords[:, 0]) * np.sin(k * coords[:, 1]) * np.cos(
          k * coords[:, 2]),
  ], axis=-1)
  u = jnp.asarray(u)
  div = float(jnp.abs(sem.D(u)).max())
  assert div < 1e-5, div  # spectrally small at order 3, 2^3 elements

  p0 = jnp.zeros(sem.pressure.pspace.mesh.num_nodes)
  u1, p1, aux = sem.stokes_one_step(
      [u, u], [p0, p0], 0, mu=0.05, dt=1e-3, time_order=2,
      tol=1e-8, atol=1e-10)
  assert np.isfinite(np.asarray(u1)).all()
  # Viscous decay: energy strictly decreases from rest-forcing-free state.
  e0 = float(jnp.vdot(u, sem.B(u)))
  e1 = float(jnp.vdot(u1, sem.B(u1)))
  assert 0 < e1 < e0
