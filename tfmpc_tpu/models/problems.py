"""LQR problem generators.

Capability parity with reference ``tfmpc/problems.py`` (``make_lqr``,
``make_lqr_linear_navigation``; SURVEY §2.1 — reference mount was empty,
citations are to the upstream layout documented there).

TPU-first notes: generators use ``jax.random`` (not stateful numpy RNG) so
problems can be generated on-device and inside jitted pipelines; outputs are
time-invariant matrices broadcast to ``[T, ...]`` lazily by the caller or
explicitly here to match the solver's time-varying contract.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from tfmpc_tpu.core.types import LQRProblem


def _broadcast_time(problem: LQRProblem, horizon: int) -> LQRProblem:
    """Tile time-invariant (F, f, C, c) to the ``[T, ...]`` contract."""
    tile = lambda a: jnp.broadcast_to(a, (horizon,) + a.shape)
    return LQRProblem(
        F=tile(problem.F),
        f=tile(problem.f),
        C=tile(problem.C),
        c=tile(problem.c),
        C_f=problem.C_f,
        c_f=problem.c_f,
    )


def make_lqr(
    key: jax.Array,
    state_size: int,
    action_size: int,
    horizon: int,
    *,
    stddev: float = 1.0,
    dtype=jnp.float32,
) -> LQRProblem:
    """Random time-invariant LQR problem with PSD cost.

    Mirrors reference ``tfmpc/problems.py::make_lqr``: random ``F, f``; cost
    ``C`` built PSD via ``M @ M^T`` plus a small diagonal (so ``C_uu`` is PD),
    random linear term ``c``.
    """
    kF, kf, kC, kc = jax.random.split(key, 4)
    n, m = state_size, action_size

    F = jax.random.normal(kF, (n, n + m), dtype) * stddev
    f = jax.random.normal(kf, (n,), dtype) * stddev
    M = jax.random.normal(kC, (n + m, n + m), dtype) * stddev
    C = M @ M.T + 1e-2 * jnp.eye(n + m, dtype=dtype)
    c = jax.random.normal(kc, (n + m,), dtype) * stddev

    base = LQRProblem(F=F, f=f, C=C, c=c)
    return _broadcast_time(base, horizon)


def make_lqr_linear_navigation(
    goal: jax.Array, beta: float, horizon: int, *, dtype=jnp.float32
) -> LQRProblem:
    """Linear navigation problem: ``x' = x + u``, cost ``|x - g|^2 + beta |u|^2``.

    Mirrors reference ``tfmpc/problems.py::make_lqr_linear_navigation``
    (SURVEY §3.3): ``F = [I | I]``, ``f = 0``; the quadratic form absorbs the
    ``-2 g^T x`` cross term into ``c`` (the constant ``g^T g`` is dropped from
    the quadratic model but charged in the final cost constant bookkeeping by
    the reference as well — costs here match up to that same constant, which we
    keep by scaling: stage cost = ``(x-g)^T (x-g) + beta u^T u`` exactly via
    ``C = 2*blockdiag(I, beta I)``, ``c = [-2g; 0]`` and a constant; we keep
    the constant implicitly by reporting costs from the env, and the quadratic
    solver sees the same optimizer since constants don't affect argmin).
    """
    goal = jnp.asarray(goal, dtype)
    n = goal.shape[-1]
    m = n

    F = jnp.concatenate([jnp.eye(n, dtype=dtype), jnp.eye(n, dtype=dtype)], axis=1)
    f = jnp.zeros((n,), dtype)
    # 1/2 z^T C z + z^T c  ==  x^T x - 2 g^T x + beta u^T u   (+ g^T g const)
    C = jax.scipy.linalg.block_diag(
        2.0 * jnp.eye(n, dtype=dtype), 2.0 * beta * jnp.eye(m, dtype=dtype)
    )
    c = jnp.concatenate([-2.0 * goal, jnp.zeros((m,), dtype)])
    # Final cost: |x - g|^2 in the same convention.
    C_f = 2.0 * jnp.eye(n, dtype=dtype)
    c_f = -2.0 * goal

    base = LQRProblem(F=F, f=f, C=C, c=c, C_f=C_f, c_f=c_f)
    return _broadcast_time(base, horizon)
