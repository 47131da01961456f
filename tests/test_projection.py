"""Fischer successive-rhs projection: correctness + iteration savings.

Solutions must be unchanged (to solver tolerance) with the projection on;
iteration counts must drop substantially once the history warms up.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from swirlfem_tpu.core.bc import BCType
from swirlfem_tpu.linalg.projection import ProjectionState
from swirlfem_tpu.linalg.projection import project_guess, update_history
from swirlfem_tpu.nse.solver import StokesSEM
from swirlfem_tpu.utils.box import unit_cube_mesh
from swirlfem_tpu.utils.cylinder import cylinder_channel_premesh
from swirlfem_tpu.utils.cylinder import make_cylinder_snap


class TestProjectionPrimitive:

  def test_exact_after_k_solves(self):
    """With K >= dim of the rhs subspace, the guess becomes the solution."""
    rng = np.random.default_rng(0)
    n = 40
    a = rng.standard_normal((n, n))
    a = a @ a.T + n * np.eye(n)
    matvec = lambda x: jnp.asarray(a) @ x
    basis = rng.standard_normal((3, n))
    state = ProjectionState.create(jnp.zeros(n), k=4)
    for i in range(3):
      b = jnp.asarray(basis[i])
      x0, ax0 = project_guess(state, b)
      x = x0 + jnp.linalg.solve(jnp.asarray(a), b - ax0)
      state = update_history(state, x, x0, matvec, ax0=ax0)
    # Any rhs in the span of the first three: guess is exact.
    b = jnp.asarray(0.3 * basis[0] - 1.2 * basis[1] + 0.5 * basis[2])
    x0, ax0 = project_guess(state, b)
    res = float(jnp.linalg.norm(b - matvec(x0)) / jnp.linalg.norm(b))
    assert res < 1e-10, res

  def test_degenerate_insert_skipped(self):
    """Re-solving the same rhs must not corrupt the basis."""
    rng = np.random.default_rng(1)
    n = 20
    a = rng.standard_normal((n, n))
    a = a @ a.T + n * np.eye(n)
    matvec = lambda x: jnp.asarray(a) @ x
    b = jnp.asarray(rng.standard_normal(n))
    state = ProjectionState.create(jnp.zeros(n), k=4)
    for _ in range(3):
      x0, ax0 = project_guess(state, b)
      x = x0 + jnp.linalg.solve(jnp.asarray(a), b - ax0)
      state = update_history(state, x, x0, matvec, ax0=ax0)
    assert float(state.valid.sum()) == 1.0
    # Basis stays A-orthonormal.
    g = np.asarray(jax.vmap(lambda x: jax.vmap(
        lambda y: jnp.vdot(x, matvec(y)))(state.xs))(state.xs))
    v = np.asarray(state.valid).astype(bool)
    np.testing.assert_allclose(g[np.ix_(v, v)], np.eye(v.sum()), atol=1e-10)


class TestStokesProjection:

  def _run(self, sem, steps, state, **kw):
    nv = sem.velocity.mesh.num_nodes
    npn = sem.pressure.pspace.mesh.num_nodes
    rng = np.random.default_rng(2)
    mask = np.asarray(sem.velocity.interior_mask)
    u0 = jnp.asarray(rng.standard_normal((nv, 2)) * 1e-2 * mask)
    us, ps = [u0, u0], [jnp.zeros(npn), jnp.zeros(npn)]
    iters = []
    for _ in range(steps):
      u, p, aux = sem.stokes_one_step(
          us, ps, jnp.zeros_like(u0), mu=1e-3, dt=1e-3, time_order=2,
          tol=1e-9, project_out_nullspace=False,
          projection_state=state, **kw)
      state = aux.get('projection_state', state)
      iters.append((int(aux['u_star_info']['num_iterations']),
                    int(aux['dp_info']['num_iterations'])))
      us, ps = [us[1], u], [ps[1], p]
    return u, p, iters

  def test_solution_unchanged(self):
    premesh = cylinder_channel_premesh(ns=4, nr=3, nx_down=8)
    bcs = {
        'cylinder': (BCType.DIRICHLET, 0.0),
        'walls': (BCType.DIRICHLET, 0.0),
        'inflow': (BCType.DIRICHLET, 0.0),
    }
    snap = make_cylinder_snap(premesh, radius=0.05, center=(0.2, 0.2))
    sem = StokesSEM.create(premesh, boundary_conditions=bcs, order=4,
                           coord_transform=snap)
    u_a, p_a, it_a = self._run(sem, 6, None)
    u_b, p_b, it_b = self._run(sem, 6, sem.initial_projection_state())
    assert float(jnp.abs(u_a - u_b).max() / jnp.abs(u_a).max()) < 1e-6
    assert float(jnp.abs(p_a - p_b).max() / jnp.abs(p_a).max()) < 1e-5

  def test_iterations_drop_on_driven_flow(self):
    """Impulsively-started cylinder inflow: warm guesses cut both solves.

    (A decaying random field is the adversarial case for rhs prediction;
    physically driven flows are what the technique is for.)
    """
    from swirlfem_tpu.examples import cylinder as cyl
    sem = cyl.make_cylinder_sem(order=4)
    nv = sem.velocity.mesh.num_nodes
    npn = sem.pressure.pspace.mesh.num_nodes
    dt, k, mu = 2.5e-4, 2, 1e-3
    u_boundary = cyl.inflow_boundary_field(sem)
    imask = sem.velocity.interior_mask
    vel = sem.velocity
    raw_cu = lambda w: vel.scatter(vel.C_local(vel.gather(w)))
    ext = [float(c) for c in cyl.extk_coeffs(k=1)]

    def run(state):
      us = tuple(jnp.zeros((nv, 2)) for _ in range(k))
      ps = tuple(jnp.zeros(npn) for _ in range(k))
      cus = tuple(raw_cu(w + u_boundary) for w in us)
      its = []
      for _ in range(10):
        cu = sum(ext[-i] * cus[-i] for i in range(1, len(ext) + 1))
        u, p, aux = sem.stokes_one_step(
            list(us), list(ps), -imask * cu, mu=mu, dt=dt, time_order=k,
            u_boundary=u_boundary, tol=1e-5, atol=1e-7,
            project_out_nullspace=False, projection_state=state)
        state = aux.get('projection_state', state)
        its.append((int(aux['u_star_info']['num_iterations']),
                    int(aux['dp_info']['num_iterations'])))
        us, ps = us[1:] + (u - u_boundary,), ps[1:] + (p,)
        cus = cus[1:] + (raw_cu(u),)
      return np.asarray(its)

    base = run(None)
    proj = run(sem.initial_projection_state(8, 8))
    # Warm viscous solves converge in a couple of iterations.
    assert proj[-4:, 0].max() <= 2, proj
    # Pressure iteration total over the warm tail drops by >= 25%.
    assert proj[-4:, 1].sum() < 0.75 * base[-4:, 1].sum(), (base, proj)

  def test_under_scan_with_periodic_box(self):
    """The state threads through lax.scan; enclosed-flow nullspace case."""
    premesh = unit_cube_mesh(4, ndim=2, periodic_dims=(0, 1))
    # Deform so the generic (non-fast-ops) path is taken.
    coords = np.asarray(premesh.node_coords)
    warped = coords + 0.05 * np.sin(2 * np.pi * coords[:, ::-1])
    premesh = premesh.replace(node_coords=warped, box_info=None)
    sem = StokesSEM.create(premesh, boundary_conditions={}, order=4)
    assert sem.fast_ops is None
    nv = sem.velocity.mesh.num_nodes
    npn = sem.pressure.pspace.mesh.num_nodes
    rng = np.random.default_rng(3)
    u0 = jnp.asarray(rng.standard_normal((nv, 2)) * 1e-2)
    state = sem.initial_projection_state()

    @jax.jit
    def rollout(u0, state):
      def body(carry, _):
        us, ps, state = carry
        u, p, aux = sem.stokes_one_step(
            list(us), list(ps), jnp.zeros((nv, 2)), mu=1e-2, dt=1e-3,
            time_order=2, tol=1e-9, projection_state=state)
        return ((us[1], u), (ps[1], p), aux['projection_state']), (
            aux['u_star_info']['num_iterations'],
            aux['dp_info']['num_iterations'])
      init = ((u0, u0), (jnp.zeros(npn), jnp.zeros(npn)), state)
      carry, its = jax.lax.scan(body, init, None, length=8)
      return carry, its

    (us, ps, state), (vits, pits) = rollout(u0, state)
    assert not np.isnan(np.asarray(us[-1])).any()
    vits, pits = np.asarray(vits), np.asarray(pits)
    assert vits[-1] <= vits[0], vits
    assert pits[-1] < pits[0], pits
    assert float(np.asarray(state.pressure.valid).sum()) >= 4


if __name__ == '__main__':
  pytest.main([__file__, '-v'])
