"""Unit tests for linalg.cg (matrix-free preconditioned CG).

Reference counterpart: ``swirl_fem/linalg/cg.py`` (no dedicated test file
there; exercised via navier_stokes tests).  Adds the below-floor tolerance
regression: CG asked for a tolerance beneath the attainable rounding floor
must return the floor-accuracy iterate, not one corrupted by the
``alpha = tiny/tiny`` noise steps taken after the floor is reached.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from swirlfem_tpu.linalg.cg import cg

pytestmark = pytest.mark.smoke


def _spd(n, cond, rng):
  q, _ = np.linalg.qr(rng.standard_normal((n, n)))
  lam = np.logspace(0, np.log10(cond), n)
  return (q * lam) @ q.T


class TestCG:

  def test_matches_dense_solve(self):
    rng = np.random.default_rng(0)
    a = _spd(40, 1e4, rng)
    b = rng.standard_normal(40)
    x, info = cg(lambda v: jnp.asarray(a) @ v, jnp.asarray(b), tol=1e-12)
    np.testing.assert_allclose(np.asarray(x), np.linalg.solve(a, b),
                               rtol=1e-7)
    assert int(info['num_iterations']) <= 200  # f64, cond 1e4, tol 1e-12

  def test_preconditioned_pytree(self):
    rng = np.random.default_rng(1)
    a = _spd(30, 1e5, rng)
    d = jnp.asarray(1.0 / np.diag(a))
    b = {'u': jnp.asarray(rng.standard_normal(30))}
    x, info_p = cg(lambda v: {'u': jnp.asarray(a) @ v['u']}, b,
                   M=lambda r: {'u': d * r['u']}, tol=1e-12)
    np.testing.assert_allclose(np.asarray(x['u']),
                               np.linalg.solve(a, np.asarray(b['u'])),
                               rtol=1e-6)
    _, info_u = cg(lambda v: {'u': jnp.asarray(a) @ v['u']}, b, tol=1e-12)
    assert int(info_p['num_iterations']) < int(info_u['num_iterations'])

  @pytest.mark.parametrize('euclidean_stop', [False, True])
  def test_below_floor_tolerance_returns_best_iterate(self, euclidean_stop):
    """tol below the f64 floor: post-floor noise steps must not corrupt x.

    Regression for the distributed viscous solve at tol=1e-12 (u error
    3.5 after 285 post-floor iterations before the best-iterate fix).
    """
    rng = np.random.default_rng(2)
    a = _spd(60, 1e8, rng)
    b = rng.standard_normal(60)
    x, info = cg(lambda v: jnp.asarray(a) @ v, jnp.asarray(b),
                 tol=1e-30, maxiter=5000, euclidean_stop=euclidean_stop)
    res = np.linalg.norm(a @ np.asarray(x) - b) / np.linalg.norm(b)
    # Attainable floor ~ eps * cond(A) ~ 2e-8; corruption would be
    # orders of magnitude above it.
    assert res < 1e-6, (res, int(info['num_iterations']))

  def test_singular_masked_rows(self):
    """Row-elided (Dirichlet-masked) operator: solution stays in range."""
    rng = np.random.default_rng(3)
    a = _spd(20, 1e3, rng)
    mask = np.ones(20)
    mask[:4] = 0.0
    am = a * mask[:, None] * mask[None, :]
    b = rng.standard_normal(20) * mask
    x, _ = cg(lambda v: jnp.asarray(am) @ v, jnp.asarray(b), tol=1e-12)
    x = np.asarray(x)
    assert np.abs(x[:4]).max() == 0.0
    sub = am[4:][:, 4:]
    np.testing.assert_allclose(x[4:], np.linalg.solve(sub, b[4:]),
                               rtol=1e-6)


if __name__ == '__main__':
  pytest.main([__file__, '-v'])
