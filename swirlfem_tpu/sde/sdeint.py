"""Differentiable Euler-Heun Stratonovich SDE integrator with adjoint VJP.

Parity target: reference ``swirl_fem/sde/sdeint.py`` (brownian_path :32,
sdeint :39, adjoint :131-184).  Integrates

    dY_t = mu(Y_t, t) dt + sigma(Y_t, t) o dW_t

with the Euler-Heun scheme under ``lax.scan``, and implements the backward
pass as the adjoint SDE of Li et al. (AISTATS 2020): the augmented system
(state, state-cotangent, parameter-cotangent) is integrated in reverse with
the *same* solver, consuming the same Brownian increments in reverse order.
Memory is O(state), not O(steps x state).

Implementation differences from the reference: the pytree flattening wrapper
is a plain closure instead of a ``jax.extend.linear_util`` transformation,
and no inner ``jax.jit`` (the caller's jit governs compilation).
"""

from __future__ import annotations

from typing import Any, Callable, Sequence

import jax
from jax import lax
from jax.flatten_util import ravel_pytree
import jax.numpy as jnp

State = Any


def brownian_path(rng: jax.Array, n: int, dtype=jnp.float32) -> jax.Array:
  """A standard Brownian increment path on `n` uniform points of [0, 1]."""
  return (jnp.sqrt(1.0 / n) * jax.random.normal(rng, (n,))).astype(dtype)


def sdeint(
    f: Callable[..., tuple[State, State]],
    y0: State,
    ts: Sequence[jax.Array],
    dw: jax.Array,
    *args,
) -> State:
  """Integrates a Stratonovich SDE, returning states at ``ts[1:]``.

  Args:
    f: evaluates drift and diffusion as ``f(y, t, dw_step, *args) ->
      (mu, sigma o dW)`` — note the diffusion output already includes the
      Brownian increment.  Both outputs match the pytree structure of `y0`.
    y0: initial state (pytree).
    ts: increasing times in [0, 1]; ``ts[0]`` is the start, states are
      emitted at each of ``ts[1:]``.  Should be multiples of ``1/len(dw)``.
    dw: Brownian increments over [0, 1], evenly divided among the
      ``len(ts)-1`` output intervals.
    *args: extra (differentiable) parameters passed through to `f`.

  Returns:
    A pytree of stacked states with leading axis ``len(ts) - 1``.
  """
  t0, touts = ts[0], ts[1:]
  segments = dw.reshape((len(touts), -1) + dw.shape[1:])
  tdtype = jnp.result_type(*jax.tree_util.tree_leaves(y0))

  def scan_fn(carry, x):
    y, t = carry
    seg, t_next = x
    y_next = _segment(f, False, y, (t, t_next), seg, *args)
    return (y_next, t_next), y_next

  _, ys = lax.scan(scan_fn, (y0, jnp.asarray(t0, dtype=tdtype)),
                   (segments, jnp.asarray(touts, dtype=tdtype)))
  return ys


def _segment(f, reverse: bool, y0, ts, dw, *args):
  """Integrates one output interval on the flattened state."""
  converted, consts = jax.custom_derivatives.closure_convert(
      f, y0, ts[0], dw[0], *args)
  y0_flat, unravel = ravel_pytree(y0)

  def f_flat(y_flat, t, dw_step, *rest):
    drift, diff = converted(unravel(y_flat), t, dw_step, *rest)
    return ravel_pytree(drift)[0], ravel_pytree(diff)[0]

  out = _integrate(f_flat, reverse, y0_flat, ts, dw, *args, *consts)
  return unravel(out)


def _euler_heun_scan(f, reverse, y0, ts, dw, args):
  # Keep time arithmetic in the state dtype so the scan carry is stable
  # (f32 states must not get promoted by f64 time scalars under x64).
  tdtype = y0.dtype
  t0 = jnp.asarray(ts[0], dtype=tdtype)
  t1 = jnp.asarray(ts[1], dtype=tdtype)
  dt = (t1 - t0) / len(dw)

  def step(carry, dw_step):
    t, x = carry
    drift, diff = f(x, t, dw_step, *args)
    _, diff_heun = f(x + diff, t + dt, dw_step, *args)
    x_new = (x + drift * dt + 0.5 * (diff + diff_heun)).astype(x.dtype)
    # Guard against accumulating outside [t0, t1) under float drift.
    inside = jnp.logical_and(t >= t0, t < t1)
    x_new = jnp.where(inside, x_new, x)
    return (t + dt, x_new), None

  (_, y1), _ = lax.scan(step, (t0, y0), dw, reverse=reverse)
  return y1


from functools import partial as _partial  # noqa: E402


@_partial(jax.custom_vjp, nondiff_argnums=(0, 1))
def _integrate(f, reverse, y0, ts, dw, *args):
  return _euler_heun_scan(f, reverse, y0, ts, dw, args)


def _integrate_fwd(f, reverse, y0, ts, dw, *args):
  y1 = _integrate(f, reverse, y0, ts, dw, *args)
  return y1, (y1, ts, dw, args)


def _is_float0(x):
  return getattr(x, 'dtype', None) == jax.dtypes.float0


def _densify(cotangents, primals):
  """float0 cotangents (int/key primals) -> f32 zeros so they can ride in
  the augmented SDE state."""
  return jax.tree_util.tree_map(
      lambda c, p: (jnp.zeros(jnp.shape(p), jnp.float32)
                    if _is_float0(c) else c), cotangents, primals,
      is_leaf=_is_float0)


def _refloat0(bars, primals):
  """Convert zero cotangents of non-inexact primals back to float0."""
  import numpy as _np
  return jax.tree_util.tree_map(
      lambda b, p: (_np.zeros(jnp.shape(p), jax.dtypes.float0)
                    if not jnp.issubdtype(jnp.asarray(p).dtype, jnp.inexact)
                    else b), bars, primals)


def _integrate_rev(f, reverse, res, y1_bar):
  """Adjoint SDE: integrate (y, y_bar, args_bar) backward in time."""
  y1, ts, dw, args = res

  def aug_f(aug, t, dw_step, *args):
    y, y_bar, _ = aug
    drift_fn = lambda y, *a: f(y, -t, dw_step, *a)[0]
    diff_fn = lambda y, *a: f(y, -t, dw_step, *a)[1]

    drift, drift_vjp = jax.vjp(drift_fn, y, *args)
    d_y, *d_args = _densify(drift_vjp(y_bar), (y,) + args)
    drift_term = (-drift, d_y, tuple(d_args))

    diff, diff_vjp = jax.vjp(diff_fn, y, *args)
    s_y, *s_args = _densify(diff_vjp(y_bar), (y,) + args)
    diff_term = (-diff, s_y, tuple(s_args))
    return drift_term, diff_term

  # Cotangent accumulators: float zeros even for int/key-valued args.
  zeros_args = jax.tree_util.tree_map(
      lambda p: jnp.zeros(
          jnp.shape(p),
          p.dtype if jnp.issubdtype(jnp.asarray(p).dtype, jnp.inexact)
          else jnp.float32), args)
  aug0 = (y1, y1_bar, zeros_args)
  _, y0_bar, args_bar = _segment(
      aug_f, not reverse, aug0, (-ts[1], -ts[0]), dw, *args)
  args_bar = _refloat0(args_bar, args)
  # No gradients for ts or dw.
  return (y0_bar, None, None, *args_bar)


_integrate.defvjp(_integrate_fwd, _integrate_rev)
