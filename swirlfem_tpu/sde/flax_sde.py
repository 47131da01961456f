"""Flax linen lifted transform wrapping the SDE integrator.

Parity target: reference ``swirl_fem/sde/flax_nn_sde.py`` (core_sdeint :34,
nn_sdeint :85).  Makes a Module method the drift/diffusion of `sdeint`:

    class Dynamics(nn.Module):
      @nn.compact
      def __call__(self, y, t, dw):
        return drift, diffusion

    integrated = nn_sdeint(Dynamics)(name='sde')(y0, ts, dw)

During linen initialization the inner function is called once directly (to
create parameters) and a dummy stacked output of matching shape is returned;
during apply the real integration runs with the lifted variables/rngs as
differentiable arguments, so gradients flow into module parameters through
the adjoint.
"""

from __future__ import annotations

import functools
from typing import Any, Callable

import jax
import jax.numpy as jnp
from flax.core.lift import CollectionFilter
from flax.core.lift import pack
from flax.core.lift import PRNGSequenceFilter
from flax.linen.transforms import lift_transform

from swirlfem_tpu.sde.sdeint import sdeint

State = Any


def core_sdeint(
    fn: Callable[..., Any],
    variables: CollectionFilter = True,
    rngs: PRNGSequenceFilter = True,
) -> Callable[..., Any]:
  """Functional-core lifted `sdeint` (see `nn_sdeint`)."""

  def inner(scope_fn, repack_fn, variable_groups, rng_groups, *args):

    @functools.wraps(fn)
    def deriv_fn(y, t, dw, variable_groups, rng_groups, *rest):
      scope = scope_fn(variable_groups, rng_groups)
      return fn(scope, y, t, dw, *rest)

    y0, ts, dw, *rest = args
    scope = scope_fn(variable_groups, rng_groups)

    def initializing(s):
      variables = s.variables()
      return 'params' not in variables or not variables['params']

    if all(map(initializing, scope)):
      drift, diffusion = fn(scope, y0, ts[0], dw[0], *rest)
      # Dummy output with the APPLY-path structure: a stacked pytree (one
      # entry per step), leafwise — `drift + diffusion` on the raw pytrees
      # would TypeError on dicts and concatenate tuples.
      out = jax.tree_util.tree_map(
          lambda d, g: jnp.stack([d + g] * (len(ts) - 1)), drift, diffusion)
      return out, repack_fn(scope)

    integrated = sdeint(deriv_fn, y0, ts, dw, variable_groups, rng_groups,
                        *rest)
    return integrated, repack_fn(scope)

  return pack(inner, (variables,), (variables,), (rngs,), name='sdeint')


# Full linen transform: usable as class transform or method transform.
nn_sdeint = functools.partial(lift_transform, core_sdeint)
