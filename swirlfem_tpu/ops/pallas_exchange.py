"""Pallas TPU kernel: fused direct-stiffness summation (QQ^T) in el form.

The roll-based periodic exchange (`ops.sem2d.exchange_el`) lowers under XLA
to ~8 separate kernels (slices, concatenations, dynamic-update-slices) of
which each costs ~0.1 ms of launch overhead — at 4-6 exchanges per NSE
step that is the dominant step cost once both solves are exact direct
inverses.  This kernel performs the whole 2D exchange in ONE launch with
everything resident in VMEM: both sequential axis passes, each a
boundary-face add with `pltpu.roll` along the element axes (the roll is
also the periodic wraparound).

Input/output ``(k, k, n, n)`` with the element grid riding the tiled
(sublane, lane) axes.  The XLA path remains the fallback and oracle.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(w_ref, out_ref):
  k = w_ref.shape[0]
  p = k - 1
  n0, n1 = w_ref.shape[2], w_ref.shape[3]
  # pltpu.roll requires non-negative shifts: roll by -1 == roll by size-1.
  # Pass 1: local axis 1 <-> element axis -1 (lanes).
  for a in range(k):
    s = w_ref[a, p] + pltpu.roll(w_ref[a, 0], n1 - 1, 1)  # (n, n)
    out_ref[a, p] = s
    out_ref[a, 0] = pltpu.roll(s, 1, 1)
    for b in range(1, p):
      out_ref[a, b] = w_ref[a, b]
  # Pass 2: local axis 0 <-> element axis -2 (sublanes), on updated values.
  for b in range(k):
    s = out_ref[p, b] + pltpu.roll(out_ref[0, b], n0 - 1, 0)
    out_ref[p, b] = s
    out_ref[0, b] = pltpu.roll(s, 1, 0)


def exchange2d_pallas(w: jax.Array, *, interpret: bool = False) -> jax.Array:
  """Fused QQ^T on a periodic 2D element grid, ``(k, k, n, n)``."""
  assert w.ndim == 4 and w.shape[0] == w.shape[1], w.shape
  return pl.pallas_call(
      _kernel,
      out_shape=jax.ShapeDtypeStruct(w.shape, w.dtype),
      in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
      out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
      interpret=interpret,
  )(w)
