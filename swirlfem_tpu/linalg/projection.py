"""Successive-rhs projection: initial guesses from prior solve history.

Fischer's projection technique (P. Fischer, "Projection techniques for
iterative solution of Ax = b with successive right-hand sides", CMAME
1998; standard practice in production spectral-element codes): keep an
A-orthonormal basis of the last K solution increments; for each new rhs
``b`` the A-optimal initial guess in that subspace is

    x0 = sum_i <x_i, b> x_i          (since <x_i, A x_j> = delta_ij)

and CG only solves for the (much smaller) remainder.  In BDF time
stepping, consecutive right-hand sides are strongly correlated, so this
typically halves the iteration count of both the viscous and the
pressure solve at the cost of one extra operator apply per step (to
A-orthonormalize the new increment).

The basis lives in a fixed-size `ProjectionState` pytree (static K,
round-robin replacement) so it threads through ``lax.scan`` carries and
``jax.jit`` unchanged.  The converged *solution* is unaffected (an
initial guess changes the CG path, not its limit), so differentiating
through ``lax.custom_linear_solve`` stays exact.

The reference has no counterpart (every solve starts from zero,
``swirl_fem/linalg/cg.py:30-97``).
"""

from __future__ import annotations

from typing import Callable

import flax.struct
import jax
from jax import lax
import jax.numpy as jnp


def _hdot(a, b):
  return jnp.vdot(a, b, precision=lax.Precision.HIGHEST)


@flax.struct.dataclass
class ProjectionState:
  """A-orthonormal solve history: ``xs[i]`` with ``axs[i] = A xs[i]``.

  ``valid[i]`` flags live entries; `head` is the round-robin write slot.
  """

  xs: jax.Array      # (K, ...) basis vectors
  axs: jax.Array     # (K, ...) their operator images
  valid: jax.Array   # (K,) 0/1 flags
  head: jax.Array    # () int32 next write position

  @classmethod
  def create(cls, like: jax.Array, k: int) -> 'ProjectionState':
    """Empty history of `k` entries shaped like the solution vector."""
    zeros = jnp.zeros((k,) + jnp.shape(like), jnp.result_type(like))
    return cls(xs=zeros, axs=zeros, valid=jnp.zeros(k, zeros.dtype),
               head=jnp.zeros((), jnp.int32))


def project_guess(state: ProjectionState, b: jax.Array,
                  dot_fn: Callable = _hdot):
  """Returns ``(x0, ax0)``: the A-optimal guess in the history subspace."""
  coeff = jax.vmap(lambda x: dot_fn(x, b))(state.xs) * state.valid
  x0 = jnp.tensordot(coeff, state.xs, axes=1)
  ax0 = jnp.tensordot(coeff, state.axs, axes=1)
  return x0, ax0


def update_history(state: ProjectionState, x: jax.Array, x0: jax.Array,
                   matvec: Callable, dot_fn: Callable = _hdot,
                   rel_floor: float = 1e-6,
                   ax0: jax.Array | None = None) -> ProjectionState:
  """A-orthonormalizes the increment ``x - x0`` into the history.

  One `matvec` evaluation.  Increments whose A-norm after orthogonalization
  is below ``rel_floor`` of the full solution's A-norm — numerically
  dependent directions, rounding-level increments from a repeated rhs —
  are skipped: inserting them would fill the history with noise vectors.
  Pass ``ax0`` (free from `project_guess`) so the solution scale
  ``<x, A x>`` costs no extra matvec.
  """
  w = x - x0
  aw = matvec(w)
  if ax0 is None:
    ax0 = jnp.zeros_like(aw)
  ref2 = dot_fn(x, aw + ax0)
  # One modified-Gram-Schmidt pass (the basis is A-orthonormal to rounding,
  # so a single pass suffices).
  coeff = jax.vmap(lambda xi: dot_fn(xi, aw))(state.xs) * state.valid
  w = w - jnp.tensordot(coeff, state.xs, axes=1)
  aw = aw - jnp.tensordot(coeff, state.axs, axes=1)
  nrm2 = dot_fn(w, aw)
  ok = nrm2 > (rel_floor ** 2) * jnp.maximum(ref2, 0)
  ok = ok & (nrm2 > 0)
  inv = jnp.where(ok, lax.rsqrt(jnp.where(nrm2 > 0, nrm2, 1.0)), 0.0)
  w = w * inv
  aw = aw * inv
  k = state.xs.shape[0]
  slot = state.head % k
  xs = jnp.where(ok, state.xs.at[slot].set(w), state.xs)
  axs = jnp.where(ok, state.axs.at[slot].set(aw), state.axs)
  valid = jnp.where(ok, state.valid.at[slot].set(1.0), state.valid)
  head = jnp.where(ok, state.head + 1, state.head)
  return ProjectionState(xs=xs, axs=axs, valid=valid, head=head)
