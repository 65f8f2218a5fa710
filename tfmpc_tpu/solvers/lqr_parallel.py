"""Parallel (associative-scan) Riccati backward pass — O(log T) depth.

The reference's Riccati recursion is inherently sequential in t (SURVEY §5
long-context row). This module is the TPU build's long-horizon strategy
(PAPERS.md: "The Parallelization of Riccati Recursion", arXiv 1809.06360;
formulation follows Särkkä & García-Fernández's temporal-parallelization of
LQT, extended here to the stacked ``F/f/C/c`` form with cross terms):

1. Each timestep is condensed into a *conditional value-function element*
   ``e_k = (A, b, C, eta, J)`` representing

       exp(-V_k(x_k | x_{k+1})) ∝ N(x_{k+1}; A x_k + b, C)
                                  * exp(-1/2 x_k^T J x_k + eta^T x_k)

   obtained by completing the square in ``u`` (cross terms eliminated via the
   Schur complement of ``C_uu``).
2. Element composition is associative; a reverse ``lax.associative_scan``
   composes all suffixes in O(log T) depth, yielding the quadratic value
   function ``V_k`` at every timestep simultaneously.
3. The time-indexed gains ``(K_t, k_t)`` are then recovered from ``V_{t+1}``
   for all t in parallel (one batched solve, no recursion).

Exactness: algebraically identical to the sequential recursion (same
fixed point); verified to ~1e-8 in float64 against ``lqr.backward`` in
``tests/test_lqr_parallel.py``. The composition's ``(I + C_i J_j)`` solves
are on [n, n] blocks — singular ``C`` (m < n) is fine since ``C`` never gets
inverted.

When to use: long horizons (reservoir T=500 config, BASELINE config 4) where
the O(T) sequential scan dominates; for T <= ~100 the sequential scan's lower
constant usually wins on a single chip.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from tfmpc_tpu.core.types import (
    LinearModel,
    LQRProblem,
    Policy,
    QuadraticFinal,
    QuadraticModel,
    ValueFunction,
)


def _elements(problem: LQRProblem):
    """Condense every timestep into a conditional value-function element."""
    n = problem.state_size

    def one(F_t, f_t, C_t, c_t):
        F_x = F_t[:, :n]
        F_u = F_t[:, n:]
        C_xx = C_t[:n, :n]
        C_xu = C_t[:n, n:]
        C_ux = C_t[n:, :n]
        C_uu = C_t[n:, n:]
        c_x = c_t[:n]
        c_u = c_t[n:]

        Cuu_inv_Cux = jnp.linalg.solve(C_uu, C_ux)
        Cuu_inv_cu = jnp.linalg.solve(C_uu, c_u)
        Cuu_inv_FuT = jnp.linalg.solve(C_uu, F_u.T)

        A = F_x - F_u @ Cuu_inv_Cux
        b = f_t - F_u @ Cuu_inv_cu
        C = F_u @ Cuu_inv_FuT
        J = C_xx - C_xu @ Cuu_inv_Cux
        eta = -(c_x - C_xu @ Cuu_inv_cu)
        return A, b, 0.5 * (C + C.T), eta, 0.5 * (J + J.T)

    return jax.vmap(one)(problem.F, problem.f, problem.C, problem.c)


def _combine(earlier, later):
    """Associative composition of two (batched) elements, earlier ∘ later."""
    A_i, b_i, C_i, eta_i, J_i = earlier
    A_j, b_j, C_j, eta_j, J_j = later
    n = A_i.shape[-1]
    I = jnp.eye(n, dtype=A_i.dtype)

    # M = (I + C_i J_j)^{-1}; (I + J_j C_i)^{-1} = M^T for symmetric C, J.
    M = jnp.linalg.solve(
        I + jnp.einsum("...ik,...kj->...ij", C_i, J_j),
        jnp.broadcast_to(I, A_i.shape),
    )
    MT = jnp.swapaxes(M, -1, -2)

    dot = lambda a, b: jnp.einsum("...ik,...kj->...ij", a, b)
    mv = lambda a, v: jnp.einsum("...ij,...j->...i", a, v)

    AjM = dot(A_j, M)
    A = dot(AjM, A_i)
    b = mv(AjM, b_i + mv(C_i, eta_j)) + b_j
    C = dot(dot(AjM, C_i), jnp.swapaxes(A_j, -1, -2)) + C_j
    C = 0.5 * (C + jnp.swapaxes(C, -1, -2))

    AiT = jnp.swapaxes(A_i, -1, -2)
    AiTMT = dot(AiT, MT)
    eta = mv(AiTMT, eta_j - mv(J_j, b_i)) + eta_i
    J = dot(dot(AiTMT, J_j), A_i) + J_i
    J = 0.5 * (J + jnp.swapaxes(J, -1, -2))
    return A, b, C, eta, J


def backward_parallel(problem: LQRProblem) -> Tuple[Policy, ValueFunction]:
    """Associative-scan Riccati: same contract as ``lqr.backward``.

    The returned ``ValueFunction.v_0`` (constant terms) is not accumulated by
    the parallel formulation and is returned as zeros; it affects neither the
    policy nor any trajectory/cost output.
    """
    with jax.default_matmul_precision("highest"):
        return _backward_parallel_impl(problem)


def _backward_parallel_impl(problem):
    n = problem.state_size
    T = problem.horizon
    dtype = problem.F.dtype

    A, b, C, eta, J = _elements(problem)

    # Terminal element: V_T(x) = 1/2 x^T C_f x + c_f^T x.
    C_f = problem.C_f if problem.C_f is not None else jnp.zeros((n, n), dtype)
    c_f = problem.c_f if problem.c_f is not None else jnp.zeros((n,), dtype)
    zero_m = jnp.zeros((1, n, n), dtype)
    elems = (
        jnp.concatenate([A, zero_m]),
        jnp.concatenate([b, jnp.zeros((1, n), dtype)]),
        jnp.concatenate([C, zero_m]),
        jnp.concatenate([eta, -c_f[None]]),
        jnp.concatenate([J, C_f[None]]),
    )

    # Suffix composition: out[k] = e_k ∘ e_{k+1} ∘ ... ∘ e_T  -> V_k.
    # With reverse=True the scan reverses, prefix-scans, and reverses back,
    # so the operator receives (later-suffix, earlier) — swap into our
    # (earlier, later) composition.
    _, _, _, eta_all, J_all = jax.lax.associative_scan(
        lambda a, b: _combine(b, a), elems, reverse=True
    )

    V_xx = J_all                     # [T+1, n, n]
    v_x = -eta_all                   # [T+1, n]

    # Recover all gains in parallel from V_{t+1}.
    def gains(F_t, f_t, C_t, c_t, Vn_xx, vn_x):
        FV = F_t.T @ Vn_xx
        Q = C_t + FV @ F_t
        q = c_t + F_t.T @ (Vn_xx @ f_t + vn_x)
        Q_ux = Q[n:, :n]
        Q_uu = Q[n:, n:]
        q_u = q[n:]
        chol = jax.scipy.linalg.cho_factor(Q_uu)
        K = -jax.scipy.linalg.cho_solve(chol, Q_ux)
        k = -jax.scipy.linalg.cho_solve(chol, q_u)
        return K, k

    K, k = jax.vmap(gains)(
        problem.F, problem.f, problem.C, problem.c, V_xx[1:], v_x[1:]
    )

    value = ValueFunction(
        V_xx=V_xx, v_x=v_x, v_0=jnp.zeros((T + 1,), dtype)
    )
    return Policy(K=K, k=k), value


def _constrain_time(arrays, time_axis):
    """Optionally pin [T]-leading tensors to a mesh "time" axis.

    With ``time_axis`` set (``ILQRConfig.time_axis``, under ``jax.set_mesh``)
    the element condensation, the associative scan, and the parallel gains
    recovery all run sharded over the horizon — GSPMD inserts the log-depth
    collectives of the parallel composition (SURVEY §2.3 SP row). No-op
    when unset.
    """
    if time_axis is None:
        return arrays
    from jax.sharding import PartitionSpec

    spec = PartitionSpec(time_axis)
    return tuple(
        jax.lax.with_sharding_constraint(a, spec) for a in arrays
    )


def ilqr_backward_parallel(
    lin: LinearModel,
    quad: QuadraticModel,
    final: QuadraticFinal,
    mu: jax.Array,
    mu_floor: float = 1e-5,
    time_axis=None,
):
    """iLQR backward pass in O(log T) depth via the associative scan.

    Same contract as ``ilqr.backward`` — ``(ok, Policy, dV1, dV2)`` over the
    delta-coordinate linearized models — but the T-sequential Riccati
    recursion becomes the parallel composition above. This is the
    long-horizon path (BASELINE config 4: reservoir T=500, SURVEY §5
    long-context row).

    Two deliberate differences from the sequential pass, both documented and
    pinned by tests:

    - **Regularization style**: mu enters as a Levenberg term on ``l_uu``
      (cost regularization) instead of Tassa's ``V_xx + mu I`` — a
      value-regularized recursion is not expressible as a per-step problem
      transform, while cost regularization keeps the composition exact for
      the modified problem. Both vanish at convergence (mu -> 0), so the two
      passes agree at the solution.
    - **mu_floor**: the element condensation (``_elements``) eliminates ``u``
      through ``C_uu^{-1}``, so ``C_uu = l_uu + max(mu, mu_floor) I`` must be
      invertible. The reference envs all have singular ``l_uu`` (costs are
      linear/absent in ``u``), hence the floor. Its only effect is a slightly
      damped step — the line search and the ``Q_u -> 0`` convergence test are
      unaffected (verified: <1e-4 trajectory deviation vs the sequential pass
      on all env families, tests/test_ilqr_parallel_backward.py).
    """
    with jax.default_matmul_precision("highest"):
        return _ilqr_backward_parallel_impl(
            lin, quad, final, mu, mu_floor, time_axis
        )


def _parallel_value_and_Q(lin, quad, final, mu_eff, time_axis=None):
    """Shared core of the parallel iLQR backward variants.

    Builds the cost-regularized delta-coordinate problem, runs the O(log T)
    value recursion, and returns the per-timestep Q terms everything else
    derives from: ``(policy_unconstrained, Q_u, Q_uu, Q_uu_reg)``.
    """
    T, n = lin.f_x.shape[0], lin.f_x.shape[-1]
    m = lin.f_u.shape[-1]
    dtype = lin.f_x.dtype
    I_m = jnp.eye(m, dtype=dtype)
    l_uu_reg = quad.l_uu + mu_eff * I_m

    # Delta-coordinate LQR problem: dx' = f_x dx + f_u du (zero affine term —
    # the nominal trajectory satisfies the dynamics), quadratized cost.
    F = jnp.concatenate([lin.f_x, lin.f_u], axis=-1)            # [T, n, n+m]
    f = jnp.zeros((T, n), dtype)
    l_xu = jnp.swapaxes(quad.l_ux, -1, -2)
    C = jnp.concatenate(
        [
            jnp.concatenate([quad.l_xx, l_xu], axis=-1),
            jnp.concatenate([quad.l_ux, l_uu_reg], axis=-1),
        ],
        axis=-2,
    )                                                           # [T, n+m, n+m]
    c = jnp.concatenate([quad.l_x, quad.l_u], axis=-1)          # [T, n+m]
    F, f, C, c = _constrain_time((F, f, C, c), time_axis)
    problem = LQRProblem(F=F, f=f, C=C, c=c, C_f=final.l_xx, c_f=final.l_x)

    policy, value = _backward_parallel_impl(problem)

    # Q terms for all timesteps at once (no recursion).
    V1 = value.V_xx[1:]                                         # [T, n, n]
    v1 = value.v_x[1:]                                          # [T, n]
    fuT_V = jnp.einsum("tnm,tnk->tmk", lin.f_u, V1)             # [T, m, n]
    Q_u = quad.l_u + jnp.einsum("tnm,tn->tm", lin.f_u, v1)
    Q_uu = quad.l_uu + jnp.einsum("tmk,tkj->tmj", fuT_V, lin.f_u)
    Q_uu_reg = Q_uu + mu_eff * I_m
    Q_ux = quad.l_ux + jnp.einsum("tmk,tkj->tmj", fuT_V, lin.f_x)
    return policy, Q_u, Q_uu, Q_uu_reg, Q_ux


def _ilqr_backward_parallel_impl(lin, quad, final, mu, mu_floor, time_axis=None):
    dtype = lin.f_x.dtype
    mu_eff = jnp.maximum(jnp.asarray(mu, dtype), jnp.asarray(mu_floor, dtype))
    policy, Q_u, Q_uu, Q_uu_reg, _ = _parallel_value_and_Q(
        lin, quad, final, mu_eff, time_axis
    )

    chol = jnp.linalg.cholesky(Q_uu_reg)
    ok = (
        jnp.all(jnp.isfinite(chol))
        & jnp.all(jnp.isfinite(policy.K))
        & jnp.all(jnp.isfinite(policy.k))
    )

    dV1 = jnp.einsum("tm,tm->", policy.k, Q_u)
    dV2 = 0.5 * jnp.einsum("tm,tmj,tj->", policy.k, Q_uu, policy.k)
    return ok, policy, dV1, dV2


def ilqr_backward_parallel_boxqp(
    lin: LinearModel,
    quad: QuadraticModel,
    final: QuadraticFinal,
    mu: jax.Array,
    bounds,
    Ubar: jax.Array,
    mu_floor: float = 1e-5,
    boxqp_iters: int = 8,
    time_axis=None,
):
    """Control-limited parallel backward: O(log T) value recursion + one
    batched boxQP re-pass for the gains (round-1 VERDICT missing #2: the
    long-horizon constrained config had no parallel path).

    Composition: the quadratic value recursion runs UNconstrained through
    the associative scan (exact for the cost-regularized problem), then the
    per-timestep Q-minimizations are solved as box-constrained QPs for ALL
    timesteps in parallel — ``k_t`` from projected Newton within
    ``[low - ubar_t, high - ubar_t]`` and the clamped rows of ``K_t``
    zeroed, exactly the per-step treatment of the sequential boxQP pass
    (``ilqr.backward`` with ``config.boxqp``; ops/boxqp.py).

    The one approximation vs the sequential pass: the value function does
    not see downstream clamping (sequential control-limited DDP folds the
    clamped-set Quu into V). Soundness is preserved by the machinery around
    it — the line search only accepts descent steps, and with boxQP the
    expected improvement ``-(dV1+dV2)`` (computed from the PROJECTED steps
    below) still vanishes exactly at constrained optima, so the convergence
    test is unaffected. Measured tradeoff (tests/test_ilqr_parallel_backward.py):
    on the weakly-clamped reservoir T=500 config it reaches the sequential
    optimum to 1e-4 relative; on STRONGLY clamped problems (cold-start
    HVAC) it approaches the same optimum (gap -> 6e-6 with iterations) but
    first-order near the boundary — it trades per-iteration O(T) -> O(log T)
    depth for more iterations when many bounds are active. The fused
    sequential Pallas boxQP kernel (batch-padded) remains the fastest
    single-chip config-4 path; this variant is the horizon-SHARDED one.
    """
    with jax.default_matmul_precision("highest"):
        from tfmpc_tpu.ops.boxqp import boxqp as _boxqp, solve_free_system

        dtype = lin.f_x.dtype
        T, m = lin.f_u.shape[0], lin.f_u.shape[-1]
        mu_eff = jnp.maximum(
            jnp.asarray(mu, dtype), jnp.asarray(mu_floor, dtype)
        )
        _, Q_u, Q_uu, Q_uu_reg, Q_ux = _parallel_value_and_Q(
            lin, quad, final, mu_eff, time_axis
        )

        lo = jnp.broadcast_to(bounds.low, (T, m)).astype(dtype) - Ubar
        hi = jnp.broadcast_to(bounds.high, (T, m)).astype(dtype) - Ubar
        res = jax.vmap(
            lambda H, q, l, h: _boxqp(H, q, l, h, max_iters=boxqp_iters)
        )(Q_uu_reg, Q_u, lo, hi)
        k = res.x                                               # [T, m]
        K = -jax.vmap(solve_free_system)(res, Q_ux)             # [T, m, n]

        chol = jnp.linalg.cholesky(Q_uu_reg)
        ok = (
            jnp.all(jnp.isfinite(chol))
            & jnp.all(jnp.isfinite(res.chol_free))
            & jnp.all(jnp.isfinite(K))
            & jnp.all(jnp.isfinite(k))
        )
        dV1 = jnp.einsum("tm,tm->", k, Q_u)
        dV2 = 0.5 * jnp.einsum("tm,tmj,tj->", k, Q_uu, k)
        return ok, Policy(K=K, k=k), dV1, dV2
