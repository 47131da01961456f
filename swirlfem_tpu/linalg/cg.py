"""Matrix-free preconditioned conjugate gradients over pytrees.

Parity target: reference ``swirl_fem/linalg/cg.py`` (cg :30-97): fully
on-device (``lax.while_loop``), preconditioner-aware stopping test
(``gamma = <r, M r>``), user-supplied dot product, and a diagnostic info dict
``{'residual', 'num_iterations'}``.  Designed to run under
``lax.custom_linear_solve(..., symmetric=True, has_aux=True)`` so solves are
differentiable via the implicit function theorem, and under ``shard_map``
where the operator/preconditioner embed their own collectives (`dot_fn` must
then perform the cross-partition reduction, e.g. a masked vdot + psum).
"""

from __future__ import annotations

import functools
import operator

from jax import lax
import jax.numpy as jnp
from jax.tree_util import tree_leaves
from jax.tree_util import tree_map


def _highest_vdot(a, b):
  # TPU f32 dot products truncate to bf16 by default; CG's alpha/beta are
  # ratios of these dots and a 1e-2-level error destabilizes long
  # iterations on ill-conditioned systems (measured: f32 cylinder
  # transient diverges on TPU, stable on CPU).
  return jnp.vdot(a, b, precision=lax.Precision.HIGHEST)


def _tree_vdot(a, b, dot_fn):
  return sum(tree_leaves(tree_map(dot_fn, a, b)))


def _axpy(alpha, x, y):
  """y + alpha * x, leafwise."""
  return tree_map(lambda xi, yi: yi + alpha * xi, x, y)


def cg(A, b, x0=None, *, tol=1e-5, atol=0.0, maxiter=None, M=None,
       dot_fn=_highest_vdot, euclidean_stop=False, checkpoint_every=64):
  """Solves ``A x = b`` with preconditioned conjugate gradients.

  Args:
    A: linear operator (pytree -> pytree), symmetric positive definite with
      respect to `dot_fn`.
    b: right-hand side pytree.
    x0: optional initial guess (defaults to zeros).
    tol, atol: convergence when ``s <= max(tol^2 * <b,b>, atol^2)`` where
      the stopping quantity ``s`` is ``gamma = <r, M r>`` (with ``<b, M b>``
      as the reference) by default, or ``<r, r>`` / ``<b, b>`` with
      `euclidean_stop`.
    maxiter: iteration cap (defaults to 10x problem size, as in scipy).
    M: preconditioner (defaults to identity).  In the spectral-element
      setting `M = exchange` doubles as the continuity projector so CG runs
      in the redundant local representation.
    dot_fn: leaf-wise dot product; must include any cross-partition reduction
      when running distributed.
    euclidean_stop: stop on the euclidean residual norm instead of the
      M-weighted one (one extra dot per iteration).  Useful when the caller
      needs a fixed physical tolerance independent of the preconditioner.
    checkpoint_every: cadence of the true-residual floor guard (below).

  Returns:
    ``(x, info)`` with ``info = {'residual': s, 'num_iterations': k}``.

  Rounding-floor guard.  When `tol`/`atol` lie below the attainable
  rounding floor, post-floor iterations take ``alpha = tiny/tiny`` steps
  along noise directions that corrupt the iterate by orders of magnitude,
  while the RECURRENCE residual keeps (falsely) decaying and eventually
  passes the stopping test (measured on the distributed viscous solve at
  tol=1e-12: u error 3.5 after ~200 post-floor iterations, recurrence
  s = 1e-22 vs true residual 1e-12).  Tracking the best recurrence-s
  iterate does not help — the recurrence is the lie.  Instead, every
  `checkpoint_every` iterations the TRUE residual ``b - A x`` is
  recomputed (one extra matvec, ~2% at the default cadence): it updates a
  best-true-iterate register, and a recurrence-vs-truth drift test
  (``s_true > 1e6 * s``) detects the floor and stops the loop.  On exit
  past the first checkpoint, one final true-residual evaluation picks the
  final iterate or the best checkpoint, whichever is truly better.  Short
  solves (fewer than `checkpoint_every` iterations — e.g. warm-started
  viscous solves) skip all of this: zero extra cost, classical behavior.
  """
  if x0 is None:
    x0 = tree_map(jnp.zeros_like, b)
  if maxiter is None:
    maxiter = 10 * sum(leaf.size for leaf in tree_leaves(b))
  if M is None:
    M = lambda x: x

  # Consistent preconditioned stopping test: gamma = <r, M r> is compared
  # against tol^2 <b, M b> (same M-weighted norm).  An euclidean <b, b>
  # reference (as in the reference cg) makes the relative test meaningless
  # when M rescales aggressively (e.g. near-exact preconditioners).
  bs = (_tree_vdot(b, b, dot_fn) if euclidean_stop
        else _tree_vdot(b, M(b), dot_fn))
  threshold = jnp.maximum(jnp.square(tol) * bs, jnp.square(atol))

  r0 = tree_map(operator.sub, b, A(x0))
  z0 = M(r0)
  dtype = jnp.result_type(*tree_leaves(z0))
  gamma0 = _tree_vdot(r0, z0, dot_fn).astype(dtype)
  s0 = (_tree_vdot(r0, r0, dot_fn).astype(dtype) if euclidean_stop
        else gamma0)

  def true_s(x):
    rt = tree_map(operator.sub, b, A(x))
    if euclidean_stop:
      return _tree_vdot(rt, rt, dot_fn).astype(dtype)
    return _tree_vdot(rt, M(rt), dot_fn).astype(dtype)

  def cond(state):
    _, _, _, s, _, k, _, _ = state
    return (s > threshold) & (k < maxiter)

  def body(state):
    x, r, gamma, _, p, k, best_x, s_best = state
    ap = A(p)
    pap = _tree_vdot(p, ap, dot_fn).astype(dtype)
    # Breakdown guard: with a near-exact preconditioner in f32, <r, M r>
    # and <p, A p> reach rounding level close to convergence and can flip
    # sign (the f32-applied M is only symmetric/definite up to
    # eps * cond(A)).  An update with alpha = gamma / (tiny or negative)
    # would corrupt x by orders of magnitude right before the loop exits;
    # instead skip the update and force termination by zeroing gamma.
    safe = (pap > 0) & (gamma > 0)
    alpha = jnp.where(safe, gamma / jnp.where(pap == 0, 1, pap),
                      0).astype(dtype)
    x = _axpy(alpha, p, x)
    r = _axpy(-alpha, ap, r)
    z = M(r)
    gamma_new = jnp.where(safe, _tree_vdot(r, z, dot_fn), 0).astype(dtype)
    if euclidean_stop:
      s = jnp.where(safe, _tree_vdot(r, r, dot_fn), 0).astype(dtype)
    else:
      s = gamma_new
    beta = gamma_new / jnp.where(gamma == 0, 1, gamma)
    p = _axpy(beta, p, z)

    def checkpoint(args):
      best_x, s_best, s = args
      st = true_s(x)
      # A NEGATIVE M-weighted true form is itself a floor signature (an
      # f32 near-exact M is only PSD to rounding): never let it poison
      # the best register — and force the exit below.
      improved = (st >= 0) & (st < s_best)
      best_x = tree_map(lambda bx, xx: jnp.where(improved, xx, bx),
                        best_x, x)
      s_best = jnp.where(improved, st, s_best)
      # Floor signatures: recurrence drifted far below truth, or the true
      # form flipped sign.  Zeroing s exits the loop; the final selection
      # keeps best_x.
      at_floor = (st > 1e6 * jnp.maximum(s, 0)) | (st < 0)
      s = jnp.where(at_floor, jnp.zeros_like(s), s)
      return best_x, s_best, s

    best_x, s_best, s = lax.cond(
        ((k + 1) % checkpoint_every == 0) & safe & (s > threshold),
        checkpoint, lambda args: args, (best_x, s_best, s))
    return x, r, gamma_new, s, p, k + 1, best_x, s_best

  x, _, _, s, _, iters, best_x, s_best = lax.while_loop(
      cond, body, (x0, r0, gamma0, s0, z0, 0, x0, s0))

  def final_select(args):
    x, best_x, s_best, _ = args
    st = true_s(x)
    final_better = st <= s_best
    x = tree_map(lambda xx, bx: jnp.where(final_better, xx, bx), x, best_x)
    # A negative true form means the winner sits at the rounding floor;
    # report 0 rather than a (meaningless) negative residual.
    return x, jnp.maximum(jnp.minimum(st, s_best), 0)

  x, s = lax.cond(iters >= checkpoint_every, final_select,
                  lambda args: (args[0], args[3]), (x, best_x, s_best, s))
  return x, {'residual': s, 'num_iterations': iters}


def distributed_vdot(axis_name: str):
  """A `dot_fn` that sums the local vdot across a collective axis."""
  def _dot(a, b):
    return lax.psum(_highest_vdot(a, b), axis_name=axis_name)
  return _dot


cg_distributed = functools.partial  # alias placeholder (see parallel.spmd)
del cg_distributed


def near_exact_solve(matvec, rhs, apply_inv, *, tol=1e-5, atol=0.0,
                     dot_fn=_highest_vdot, maxiter=None, max_sweeps=8):
  """Solve with a near-exact inverse: Richardson sweeps + CG certificate.

  A near-exact inverse applied in finite precision carries
  ``eps * cond(A)`` noise, so used as a CG *preconditioner* the M-weighted
  quadratic forms (``<r, M r>``, ``<p, A p>``) can reach rounding level —
  or go negative outright (an f32-applied inverse of a cond ~1e5 operator
  is not numerically PSD), breaking the preconditioned iteration at its
  first stopping test.  The robust pattern (developed for the el-form
  pressure solve): monotone-guarded Richardson defect correction with the
  TRUE residual recomputed each sweep (contracts by ``eps * cond`` per
  sweep, no quadratic forms to break), then an unpreconditioned guarded CG
  from the resulting iterate to certify the euclidean tolerance (exits at
  0 iterations when the sweeps already converged).

  Returns ``(x, info)`` like `cg`; `info['num_iterations']` counts sweeps
  plus CG iterations.
  """
  bs = dot_fn(rhs, rhs)
  thr = jnp.maximum(jnp.square(tol) * bs, jnp.square(atol))

  def sweep_cond(state):
    _, _, rr, k = state
    return (rr > thr) & (k < max_sweeps)

  def sweep(state):
    # Accept only residual-reducing updates (4x contraction required): on
    # noise-level rhs the finite-precision sweep gain can degenerate to
    # ~1, and the CG finish is then the better use of those matvecs.
    x, r, rr, k = state
    x_new = x + apply_inv(r)
    r_new = rhs - matvec(x_new)
    rr_new = dot_fn(r_new, r_new)
    better = rr_new < 0.25 * rr
    x = jnp.where(better, x_new, x)
    r = jnp.where(better, r_new, r)
    return (x, r, jnp.where(better, rr_new, rr),
            jnp.where(better, k + 1, jnp.int32(max_sweeps)))

  x, _, _, sweeps = lax.while_loop(
      sweep_cond, sweep, (jnp.zeros_like(rhs), rhs, bs, jnp.int32(0)))
  x, info = cg(matvec, rhs, x0=x, tol=tol, atol=atol, dot_fn=dot_fn,
               maxiter=maxiter)
  return x, {'residual': info['residual'],
             'num_iterations': info['num_iterations'] + sweeps}
