"""Batched projected-Newton box-constrained QP (boxQP).

Solves  min_x  1/2 x^T H x + q^T x   s.t.  lo <= x <= hi   (H PD)

This is the constrained Q-minimization of control-limited DDP (Tassa, Mansard
& Todorov 2014): inside the iLQR backward pass it produces the feedforward
step ``k_t`` respecting the control box, and its clamped-set factorization
gives the feedback rows ``K_t`` (zero on clamped dimensions). SURVEY §2.1
tags the reference's backward-pass constraint handling as clip-only [MED]
with boxQP "possible but [LOW]"; the TPU build ships BOTH (clip-only default,
boxQP via ``ILQRConfig(boxqp=True)``) — a strict superset.

TPU-first design: active-set methods branch on data, which cannot compile.
This is a FIXED-ITERATION projected Newton (SURVEY §7.3 hard-parts row):

- clamped set from the sign of the gradient at the bounds,
- the free-subset Newton system is solved with a *masked* matrix
  ``M = free⊗free * H + diag(clamped)`` — same static shape every iteration,
  Cholesky stays batched,
- projected backtracking line search over a fixed alpha grid with
  ``argmax``-select of the first improving step,
- everything vmappable over (scenario, time) axes; no dynamic shapes.

For m <= ~30 controls this runs entirely in registers/VMEM under vmap.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp


class BoxQPResult(NamedTuple):
    x: jax.Array          # [m] the (approximate) minimizer
    free: jax.Array       # [m] bool, free (not clamped) dimensions
    chol_free: jax.Array  # [m, m] Cholesky factor of the masked free system
    obj: jax.Array        # scalar, final objective value
    iterations: jax.Array # scalar int, Newton iterations actually used


def _objective(H, q, x):
    return 0.5 * x @ (H @ x) + q @ x


def _masked_system(H, free):
    """``M = H`` on free x free, identity on clamped diagonal.

    Solving ``M d = rhs_masked`` yields the Newton step on the free subset
    with exact zeros on clamped dims — the shape-static replacement for
    indexing the free submatrix.
    """
    m = H.shape[-1]
    mask2 = jnp.outer(free, free)
    return jnp.where(mask2, H, 0.0) + jnp.diag(jnp.where(free, 0.0, 1.0))


def boxqp(
    H: jax.Array,
    q: jax.Array,
    lo: jax.Array,
    hi: jax.Array,
    x0: jax.Array | None = None,
    *,
    max_iters: int = 8,
    ls_alphas: int = 8,
    grad_tol: float = 1e-8,
) -> BoxQPResult:
    """Projected-Newton boxQP on a single [m]-dimensional problem.

    ``vmap`` over leading axes for batching. Infinite bounds are handled
    (dimensions with +/-inf bounds simply never clamp).
    """
    m = H.shape[-1]
    dtype = H.dtype
    if x0 is None:
        x0 = jnp.zeros((m,), dtype)
    x_init = jnp.clip(x0, lo, hi)
    alphas = 2.0 ** -jnp.arange(ls_alphas, dtype=dtype)  # 1, 1/2, 1/4, ...

    def newton_iter(carry, _):
        x, done, iters = carry
        g = q + H @ x

        at_lo = (x <= lo) & (g > 0)
        at_hi = (x >= hi) & (g < 0)
        clamped = at_lo | at_hi
        free = ~clamped

        g_free_norm = jnp.linalg.norm(jnp.where(free, g, 0.0))
        converged = (g_free_norm < grad_tol) | ~jnp.any(free)

        M = _masked_system(H, free)
        chol = jnp.linalg.cholesky(M)
        d = -jax.scipy.linalg.cho_solve((chol, True), jnp.where(free, g, 0.0))

        # Projected backtracking line search over the fixed alpha grid.
        cand = jnp.clip(x[None, :] + alphas[:, None] * d[None, :], lo, hi)
        obj_cand = jax.vmap(lambda c: _objective(H, q, c))(cand)
        obj_now = _objective(H, q, x)
        improves = obj_cand < obj_now - 1e-12
        any_improve = jnp.any(improves)
        best = jnp.argmax(improves)  # first (largest) improving alpha
        x_new = jnp.where(any_improve, cand[best], x)

        step_done = done | converged | ~any_improve
        x_out = jnp.where(done | converged, x, x_new)
        iters = iters + jnp.where(done, 0, 1)
        return (x_out, step_done, iters), None

    (x, _, iters), _ = jax.lax.scan(
        newton_iter,
        (x_init, jnp.array(False), jnp.zeros((), jnp.int32)),
        None,
        length=max_iters,
    )

    # Final clamped set + factorization at the solution (for the K rows).
    g = q + H @ x
    clamped = ((x <= lo) & (g > 0)) | ((x >= hi) & (g < 0))
    free = ~clamped
    chol_free = jnp.linalg.cholesky(_masked_system(H, free))
    return BoxQPResult(
        x=x, free=free, chol_free=chol_free, obj=_objective(H, q, x),
        iterations=iters,
    )


def solve_free_system(result: BoxQPResult, rhs: jax.Array) -> jax.Array:
    """Solve ``H_ff X_f = rhs_f`` with zeros on clamped rows.

    Used for the feedback gains: ``K = -solve_free_system(res, Q_ux)`` gives
    the control-limited DDP gains (clamped rows exactly zero).
    """
    rhs_masked = jnp.where(result.free[:, None], rhs, 0.0)
    return jax.scipy.linalg.cho_solve((result.chol_free, True), rhs_masked)
