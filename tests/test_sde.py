"""SDE integrator tests: deterministic limits, noise statistics, adjoint
gradients (modeled on reference ``sde/sdeint_test.py``)."""

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from swirlfem_tpu.sde.flax_sde import nn_sdeint
from swirlfem_tpu.sde.sdeint import brownian_path, sdeint
import pytest


@pytest.mark.smoke
def test_deterministic_exponential_decay():
  """With zero noise, dy = -y dt gives y(1) = y0 e^-1."""
  n = 256
  dw = jnp.zeros(n)
  f = lambda y, t, dw: (-y, 0.0 * dw * y)
  ys = sdeint(f, 1.0, (0.0, 1.0), dw)
  np.testing.assert_allclose(float(ys[-1]), np.exp(-1.0), atol=1e-2)


def test_intermediate_outputs():
  n = 256
  dw = jnp.zeros(n)
  f = lambda y, t, dw: (-y, 0.0 * dw * y)
  ys = sdeint(f, 1.0, (0.0, 0.25, 0.5, 0.75, 1.0), dw)
  assert ys.shape == (4,)
  np.testing.assert_allclose(np.asarray(ys),
                             np.exp(-np.array([0.25, 0.5, 0.75, 1.0])),
                             atol=1e-2)


def test_geometric_bm_statistics():
  """Stratonovich GBM dy = mu y dt + s y o dW has E[y] = y0 e^{mu t}... in
  Stratonovich form e^{mu t + s^2 t / 2}?  Use the exact pathwise solution:
  y = y0 exp(mu t + s W_t) (Stratonovich chain rule)."""
  n, paths = 512, 200
  mu, s = 0.3, 0.4
  keys = jax.random.split(jax.random.PRNGKey(0), paths)

  def run(key):
    dw = brownian_path(key, n, dtype=jnp.float64)
    f = lambda y, t, dw: (mu * y, s * y * dw)
    ys = sdeint(f, 1.0, (0.0, 1.0), dw)
    w1 = jnp.sum(dw)
    exact = jnp.exp(mu + s * w1)
    return ys[-1], exact

  got, exact = jax.vmap(run)(keys)
  # Pathwise agreement of the Euler-Heun scheme with the exact solution.
  np.testing.assert_allclose(np.asarray(got), np.asarray(exact), rtol=0.05)


@pytest.mark.smoke
def test_adjoint_gradient_matches_finite_difference():
  n = 128
  dw = brownian_path(jax.random.PRNGKey(1), n, dtype=jnp.float64)

  def loss(theta):
    f = lambda y, t, dw, theta: (theta * y, 0.3 * y * dw)
    ys = sdeint(f, 1.0, (0.0, 1.0), dw, theta)
    return ys[-1] ** 2

  g = jax.grad(loss)(0.5)
  eps = 1e-5
  fd = (loss(0.5 + eps) - loss(0.5 - eps)) / (2 * eps)
  # The adjoint integrates the continuous-time adjoint SDE with the same
  # step size, so it differs from the exact discrete gradient by O(dt).
  np.testing.assert_allclose(float(g), float(fd), rtol=1e-2)


def test_adjoint_gradient_wrt_y0():
  n = 128
  dw = brownian_path(jax.random.PRNGKey(2), n, dtype=jnp.float64)

  def loss(y0):
    f = lambda y, t, dw: (-y, 0.2 * y * dw)
    return sdeint(f, y0, (0.0, 1.0), dw)[-1]

  g = jax.grad(loss)(1.3)
  eps = 1e-5
  fd = (loss(1.3 + eps) - loss(1.3 - eps)) / (2 * eps)
  np.testing.assert_allclose(float(g), float(fd), rtol=1e-2)


def test_pytree_state():
  n = 64
  dw = jnp.zeros(n)
  f = lambda y, t, dw: ({'a': -y['a'], 'b': 2 * jnp.ones_like(y['b'])},
                        {'a': 0.0 * y['a'] * dw, 'b': 0.0 * y['b'] * dw})
  y0 = {'a': jnp.asarray(1.0), 'b': jnp.zeros(3)}
  ys = sdeint(f, y0, (0.0, 1.0), dw)
  np.testing.assert_allclose(float(ys['a'][-1]), np.exp(-1.0), atol=1e-2)
  np.testing.assert_allclose(np.asarray(ys['b'][-1]), 2.0, atol=1e-9)


class _Dynamics(nn.Module):
  @nn.compact
  def __call__(self, y, t, dw):
    theta = self.param('theta', nn.initializers.constant(-0.8), ())
    return theta * y, 0.1 * y * dw


def test_nn_sdeint_lifted_transform():
  model = nn_sdeint(_Dynamics)()
  dw = brownian_path(jax.random.PRNGKey(3), 64, dtype=jnp.float64)
  y0 = jnp.asarray(1.0)
  params = model.init(jax.random.PRNGKey(4), y0, (0.0, 1.0), dw)
  out = model.apply(params, y0, (0.0, 1.0), dw)
  assert out.shape == (1,)

  def loss(params):
    return model.apply(params, y0, (0.0, 1.0), dw)[-1]

  g = jax.grad(loss)(params)
  theta_grad = g['params']['theta']
  assert np.isfinite(float(theta_grad)) and abs(float(theta_grad)) > 1e-3


class _DictDynamics(nn.Module):
  @nn.compact
  def __call__(self, y, t, dw):
    theta = self.param('theta', nn.initializers.constant(-0.5), ())
    drift = {'a': theta * y['a'], 'b': 2.0 * theta * y['b']}
    diffusion = {'a': 0.1 * y['a'] * dw, 'b': 0.05 * y['b'] * dw}
    return drift, diffusion


def test_nn_sdeint_pytree_state():
  """Init-path dummy output must match the apply-path pytree structure
  (regression: `drift + diffusion` TypeError'd on dict states)."""
  model = nn_sdeint(_DictDynamics)()
  dw = brownian_path(jax.random.PRNGKey(5), 32, dtype=jnp.float64)
  y0 = {'a': jnp.asarray(1.0), 'b': jnp.asarray(2.0)}
  params = model.init(jax.random.PRNGKey(6), y0, (0.0, 1.0), dw)
  out = model.apply(params, y0, (0.0, 1.0), dw)
  assert set(out) == {'a', 'b'}
  assert out['a'].shape == (1,) and out['b'].shape == (1,)

  def loss(params):
    o = model.apply(params, y0, (0.0, 1.0), dw)
    return o['a'][-1] + o['b'][-1]

  g = jax.grad(loss)(params)
  assert np.isfinite(float(g['params']['theta']))
