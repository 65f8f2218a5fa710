"""Iterative LQR (iLQR) solver, TPU-native.

Capability parity with reference ``tfmpc/solvers/ilqr.py`` (SURVEY §2.1/§3.1:
``start`` nominal rollout, ``derivatives`` batched linearization, regularized
``backward`` with Levenberg-style mu adaptation (Tassa et al. 2012 schedule),
``forward`` with backtracking line search and box-constraint clipping,
``solve`` outer loop until residual < atol). The reference mount was empty;
the algorithm was validated independently (SURVEY Appendix A.2).

TPU-first architecture (not a port — reference used Python loops over
``tf.TensorArray`` and host-side control flow):

- The whole solve is ONE compiled XLA program: outer ``lax.while_loop``,
  backward pass as a reverse ``lax.scan``, the regularization restart as an
  inner ``lax.while_loop``, and the line search evaluated for ALL step sizes
  in parallel (``vmap`` over the alpha grid) with the first accepted alpha
  selected by ``argmax`` over the acceptance mask. Zero host round-trips
  until the result is fetched.
- Scenario batching is an outer ``jax.vmap`` over the entire solve
  (``solve_batch``): every scenario carries its own mu, accepted alpha and
  convergence flag; ``vmap`` of ``while_loop`` gives masked-lane semantics
  automatically (converged lanes coast, cost of wasted FLOPs << ragged
  control flow — SURVEY §7.1 design decision 1).
- Non-PD detection is a Cholesky NaN-probe (``jnp.linalg.cholesky`` yields
  NaNs for indefinite inputs) instead of try/except — data-dependent Python
  branching cannot exist under ``jit``.
- All matmuls run at HIGHEST precision: TPU fp32 matmul defaults to bf16
  passes, which breaks the <1e-4 trajectory-parity target (measured on the
  LQR path; see solvers/lqr.py).
"""

from __future__ import annotations

import dataclasses
import functools
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from tfmpc_tpu.core.types import Policy
from tfmpc_tpu.models.base import Env


@dataclasses.dataclass(frozen=True)
class ILQRConfig:
    """Static solver configuration (hashable; a jit-static argument).

    Mirrors the reference CLI knobs (``--atol``, ``--max-iterations``;
    SURVEY §2.1 CLI row) plus the Tassa-schedule regularization constants.
    """

    atol: float = 1e-4
    max_iterations: int = 100
    mu_init: float = 0.0
    mu_min: float = 1e-6
    mu_max: float = 1e10
    delta_0: float = 2.0
    num_alphas: int = 11
    accept_ratio: float = 0.0  # z-test threshold on actual/expected reduction
    max_backward_restarts: int = 40
    # Control-limited DDP (Tassa et al. 2014): solve the backward-pass
    # Q-minimization as a box-constrained QP (projected Newton) instead of
    # relying on forward-pass clipping alone. Requires env.bounds. The
    # reference only clips [MED]; this is the superset mode (SURVEY §2.1).
    boxqp: bool = False
    boxqp_iters: int = 8
    # Full Differential Dynamic Programming (Jacobson & Mayne 1970): keep the
    # SECOND-order dynamics terms the reference's iLQR drops (SURVEY §2.1 —
    # reference ``tfmpc/solvers/ilqr.py`` linearizes dynamics only). The
    # backward pass adds ``v_x . f_xx / f_ux / f_uu`` contractions
    # (Tassa et al. 2012 eqs. 5c-5e, including the regularized Q-blocks) from
    # ``Env.get_second_order_transition`` — quadratic convergence near the
    # optimum at the price of one extra jacfwd sweep per iteration and a
    # possibly-indefinite Q_uu far from it. Regularization is COMBINED
    # state+control (Tassa's V'+muI plus an iLQG-style mu*I_m directly on
    # Q̃uu): the tensor terms are mu-invariant and f_u can vanish, so state
    # regularization alone cannot always restore PD. Far-from-optimum
    # starts still pay restart-heavy early iterations (the DDP value
    # Hessian itself goes indefinite — textbook DDP behavior); for those,
    # warm-start with a few iLQR iterations and switch:
    #   r = solve_batch(env, x0, config=ILQRConfig(max_iterations=5))
    #   resume(env, state_from_result(r), config=ILQRConfig(ddp=True))
    # Composes with ``boxqp``. With ``use_pallas``, the fused LANE Riccati
    # kernel carries the tensor contractions in-kernel at n,m <= 12
    # (ops/riccati_pallas.py ddp variants — the scan-path DDP backward is
    # a measured 39x cliff); mid dims (12 < n,m <= 48) fall back to the
    # vmapped scan (the mid kernel does not implement the contractions).
    # Exclusion, enforced at trace time (``backward`` raises):
    # ``parallel_backward`` (the associative-scan value recursion composes
    # LINEAR elements; tensor contractions through v_x break the monoid).
    ddp: bool = False
    # Route the batched backward pass through the fused Pallas time-stepping
    # kernel (ops/riccati_pallas.py) where eligible (TPU, small n/m,
    # unconstrained backward). Ignored by the single-scenario path.
    use_pallas: bool = False
    # EXPERIMENTAL, measured SLOWER at the shipped dims — default off.
    # With use_pallas, fuse the linearization into the materialize kernel
    # for envs providing ``lane_derivatives`` and exchange kernel-layout
    # blocks between all stages (no XLA derivatives stage, no transposes).
    # Semantics are pinned equal to the split pipeline
    # (tests/test_fused_derivs.py), but on chip the split pipeline wins
    # (nav B=4096 T=100: 91.8k vs 83.2k solves/s; single fused iteration
    # 2.43 vs 2.26 ms) — inside one compiled program XLA overlaps the
    # cheap linearization fine, re-confirming round-1's "fusion pays for
    # the sequential chain, not the linearization" finding at the
    # pipeline level. Kept as an option for larger-dim lane_derivatives
    # envs where the tradeoff may flip.
    fuse_derivatives: bool = False
    # With use_pallas, the line-search kernel also emits the
    # all-alpha candidate trajectories (ops/rollout_pallas.py::
    # linesearch_costs_traj_pallas), so the accepted trajectory becomes a
    # cheap XLA select instead of a second serial T-chain rollout
    # (rollout_alpha_pallas) — the iteration runs ONE fused rollout chain
    # instead of two. Trades A-times the trajectory HBM writes (cheap at
    # small n/m, where the rollout kernels sit at 1-4% of both rooflines,
    # PARITY.md §6) for dropping the materialize chain. Semantics pinned
    # equal to the two-kernel path (tests/test_rollout_pallas.py).
    # Ignored when fuse_derivatives is set (that path's materialize kernel
    # also emits the linearization).
    # Default None = AUTO by horizon, set by the round-5 chip A/B
    # (benchmarks/emit_traj_ab.py, docs/sweeps/r5_emit_traj.md): the
    # single-chain layout LOSES at T=100 (nav headline 0.90x — the emit
    # kernel's heavy buffered stores cap its time block at 2 vs the costs
    # kernel's 10), TIES at T<=100 boxQP configs (0.98x/1.00x), and WINS
    # at T=500 (reservoir boxQP 1.04x, where dropping the second serial
    # 500-step chain outweighs the slower per-step stores). AUTO enables
    # it from T >= _EMIT_TRAJ_AUTO_MIN_T (250, the measured-crossover
    # midpoint) AND max(n, m) <= _EMIT_TRAJ_AUTO_MAX_DIM (12 — the
    # crossover was measured in the small-dim class; the emit kernel's
    # stores and candidate-trajectory HBM footprint scale with A*(n+m),
    # so it is not extrapolated to mid dims); pass True/False to pin
    # either layout at any shape.
    linesearch_emit_trajectories: Optional[bool] = None
    # O(log T) associative-scan backward pass (solvers/lqr_parallel.py::
    # ilqr_backward_parallel) — the long-horizon path (reservoir T=500,
    # BASELINE config 4). Uses cost-style Levenberg regularization with
    # ``parallel_mu_floor`` (see that function's docstring). Composes with
    # boxqp: the value recursion runs through the associative scan and the
    # gains come from one batched-over-time boxQP re-pass
    # (ilqr_backward_parallel_boxqp).
    parallel_backward: bool = False
    parallel_mu_floor: float = 1e-5
    # Mesh axis name to shard the parallel backward's [T]-leading tensors
    # over (horizon/sequence parallelism; SURVEY §2.3 SP row). Requires
    # ``parallel_backward`` and an active mesh (``jax.set_mesh``) carrying
    # that axis — see parallel/mesh.py::solve_ilqr_time_sharded.
    time_axis: Optional[str] = None
    # KKT projected-gradient stationarity test for box-constrained envs:
    # converged when ||U - clip(U - dJ/dU)||_inf <
    # kkt_atol * max(1, ||dJ/dU||_inf). Recognizes boundary optima that the
    # expected-improvement test cannot (an unconstrained Newton step keeps
    # pointing out of the box there, so -(dV1+dV2) never shrinks and mu
    # would ratchet to the ceiling). Only evaluated when env.bounds is set
    # AND the line search accepted nothing that iteration (the only case
    # where it changes the outcome) — so the extra VJP is skipped on
    # ordinary progressing iterations. The max(1, ||g||_inf) normalizer
    # (round-2 VERDICT weak #5) makes the test RELATIVE at boundary optima,
    # where the clamped coordinates keep ||g||_inf at the env's cost scale:
    # scaling the cost by c scales pg and the threshold together, so
    # reservoir (high_penalty=100) and navigation (unit weights) get the
    # same geometric accuracy from the same default. Interior optima
    # (g -> 0) degrade to the absolute test, which is the regime the
    # residual/expected-improvement criteria already own. The threshold is
    # additionally capped at 10% of the narrowest finite box width so it
    # can never exceed the largest achievable projected gradient (see
    # _kkt_threshold — without the cap, extreme cost scales make the test
    # vacuously true everywhere in the box). Pinned by
    # tests/test_kkt_scaling.py.
    kkt_atol: float = 1e-4

    def alphas(self, dtype=jnp.float32) -> jax.Array:
        """Tassa's line-search schedule: alpha_i = 1.1^(-i^2)."""
        i = jnp.arange(self.num_alphas, dtype=dtype)
        return 1.1 ** (-(i**2))

    def alphas_static(self) -> tuple:
        """The same schedule as compile-time Python floats (for kernels)."""
        return tuple(1.1 ** -float(i * i) for i in range(self.num_alphas))


def _kkt_scale(g, axes=None):
    """Characteristic gradient magnitude for the relative KKT test.

    ``max(1, ||g||_inf)`` over ``axes`` (None = whole array, ``(1, 2)`` =
    per-lane for [B, T, m] batched gradients). See ILQRConfig.kkt_atol.
    """
    return jnp.maximum(1.0, jnp.max(jnp.abs(g), axis=axes))


def _kkt_threshold(config, g, bounds, axes=None):
    """Projected-gradient threshold: relative, but never vacuous.

    ``kkt_atol * max(1, ||g||_inf)``, capped at 10% of the narrowest finite
    box width. Without the cap, a cost scale with ``||g||_inf >= W /
    kkt_atol`` pushes the threshold past the box width — the largest value
    ``||U - clip(U - g)||_inf`` can ever take — and the stationarity test
    passes at EVERY point in the box, converting a routine one-iteration
    line-search stall into a false ``converged=True``. With the cap the
    test always demands the projected gradient be small against the
    feasible set itself; when fp32 noise in ``g`` exceeds 10% of the box
    width no test can certify stationarity, and failing (mu ratchets to the
    ceiling -> ``failed``) is the honest outcome. Infinite-width dims don't
    bound pg (pg = g there), so only finite widths participate; all-infinite
    bounds leave the relative test uncapped.
    """
    width = bounds.high - bounds.low
    finite_w = jnp.min(jnp.where(jnp.isfinite(width), width, jnp.inf))
    return jnp.minimum(config.kkt_atol * _kkt_scale(g, axes), 0.1 * finite_w)


class ILQRResult(NamedTuple):
    """Solve output (all per-scenario when batched).

    Carries the full solver state (``mu``/``delta``/``failed``), so a result
    is also a resumable checkpoint — see ``ilqr_batched.state_from_result``
    and ``utils/checkpoint.py`` (SURVEY §5 checkpoint/resume row).
    """

    states: jax.Array       # [T+1, n]
    actions: jax.Array      # [T, m]
    costs: jax.Array        # [T+1] per-step costs of the final trajectory
    total_cost: jax.Array   # scalar
    iterations: jax.Array   # outer iterations executed
    converged: jax.Array    # bool: residual < atol reached
    residual: jax.Array     # last |cost decrease|
    mu: jax.Array           # final regularization
    delta: jax.Array        # regularization schedule multiplier
    failed: jax.Array       # bool: no progress possible (mu at ceiling)


class ILQRTrace(NamedTuple):
    """Per-iteration solve statistics (leading axis = outer iteration).

    The observability surface of the reference's per-iteration log line
    (iteration #, total cost, residual, mu — SURVEY §5 metrics row), gathered
    fully on device and fetched once after the solve. Entries at iterations
    past a scenario's convergence hold its frozen state.
    """

    J: jax.Array            # [I, ...] total cost after each iteration
    residual: jax.Array     # [I, ...] cost decrease achieved
    mu: jax.Array           # [I, ...] regularization after the mu update
    alpha: jax.Array        # [I, ...] accepted line-search step size
    accepted: jax.Array     # [I, ...] bool: some alpha was accepted
    converged: jax.Array    # [I, ...] bool


class _LoopState(NamedTuple):
    X: jax.Array
    U: jax.Array
    J: jax.Array
    mu: jax.Array
    delta: jax.Array
    iteration: jax.Array
    converged: jax.Array
    failed: jax.Array       # regularization exhausted / no progress possible
    residual: jax.Array


def _increase_mu(mu, delta, config: ILQRConfig):
    """Tassa et al. 2012 regularization increase (SURVEY §2.1 iLQR row)."""
    delta = jnp.maximum(config.delta_0, delta * config.delta_0)
    mu = jnp.maximum(config.mu_min, mu * delta)
    return mu, delta


def _decrease_mu(mu, delta, config: ILQRConfig):
    delta = jnp.minimum(1.0 / config.delta_0, delta / config.delta_0)
    mu_scaled = mu * delta
    mu = jnp.where(mu_scaled >= config.mu_min, mu_scaled, 0.0)
    return mu, delta


def derivatives(env: Env, X: jax.Array, U: jax.Array):
    """Linearize dynamics and quadratize costs along the whole horizon.

    The analogue of reference ``iLQR.derivatives`` (SURVEY §3.1) — one
    ``vmap(jacfwd)`` sweep over all T steps at once, or the env's
    closed-form ``analytic_derivatives`` where provided (an optimization
    hook pinned against the autodiff path by tests).
    """
    analytic = env.analytic_derivatives(X, U)
    if analytic is not None:
        return analytic
    lin = env.get_linear_transition(X[:-1], U, batch=True)
    quad = env.get_quadratic_cost(X[:-1], U, batch=True)
    final = env.get_quadratic_final_cost(X[-1])
    return lin, quad, final


def backward(lin, quad, final, mu, config: ILQRConfig, bounds=None, Ubar=None,
             second=None):
    """Regularized Riccati backward pass over the linearized models.

    Returns ``(ok, policy, dV1, dV2)``. ``ok`` is False when any step's
    regularized ``Quu`` failed the Cholesky PD probe (reference restarts the
    whole backward pass in that case; here the caller's inner while_loop does).
    Regularization is Tassa-style on ``V_xx`` (mu enters via
    ``f_u^T (V' + mu I) f_u``), expected improvement accumulated with the
    UNregularized ``Q_u``/``Q_uu``.

    With ``config.boxqp`` and ``bounds``/``Ubar`` given, the per-step
    Q-minimization is the box-constrained QP of control-limited DDP: ``k_t``
    from projected Newton within ``[low - ubar_t, high - ubar_t]`` and the
    clamped rows of ``K_t`` zeroed (ops/boxqp.py).

    With ``second`` (a ``SecondOrderModel``, [T]-leading), the full-DDP
    contractions ``v_x . f_xx / f_ux / f_uu`` are added to the Q-blocks —
    both the unregularized ones and the regularized ``Q̃uu``/``Q̃ux`` (Tassa
    2012 eqs. 5c-5e put the tensor terms in both). DDP regularization is
    COMBINED: mu enters through V' (as in the iLQR path) AND directly as
    ``mu*I_m`` on ``Q̃uu`` — see the in-step comment and ``ILQRConfig.ddp``
    for why state regularization alone cannot restore PD here.
    """
    n = lin.f_x.shape[-1]
    use_boxqp = config.boxqp and bounds is not None and Ubar is not None
    if config.parallel_backward:
        if second is not None:
            raise ValueError(
                "ddp=True is incompatible with parallel_backward=True: the "
                "associative-scan backward composes LINEAR value-recursion "
                "elements, and the DDP tensor terms depend on v_x mid-"
                "recursion (see ILQRConfig.ddp)."
            )
        if use_boxqp:
            from tfmpc_tpu.solvers.lqr_parallel import (
                ilqr_backward_parallel_boxqp,
            )

            return ilqr_backward_parallel_boxqp(
                lin, quad, final, mu, bounds, Ubar,
                mu_floor=config.parallel_mu_floor,
                boxqp_iters=config.boxqp_iters,
                time_axis=config.time_axis,
            )
        from tfmpc_tpu.solvers.lqr_parallel import ilqr_backward_parallel

        return ilqr_backward_parallel(
            lin, quad, final, mu, mu_floor=config.parallel_mu_floor,
            time_axis=config.time_axis,
        )
    if use_boxqp:
        from tfmpc_tpu.ops.boxqp import boxqp as _boxqp, solve_free_system

    use_ddp = second is not None

    if use_ddp:
        # Stack the three Hessian tensors into ONE [T, n, K] slab at trace
        # time so the per-step contraction is a single v_x @ slab matvec
        # instead of three tiny tensordots (each tiny op in a sequential
        # scan pays full tile-padding + op overhead on TPU; one wider dot
        # amortizes it — measured 8x -> ~2x backward overhead vs iLQR on
        # CPU, and the slab is also one contiguous scan input instead of
        # three strided ones).
        T2, n2 = second.f_xx.shape[0], second.f_xx.shape[1]
        m2 = second.f_uu.shape[2]
        sec_slab = jnp.concatenate(
            [
                second.f_xx.reshape(T2, n2, n2 * n2),
                second.f_ux.reshape(T2, n2, m2 * n2),
                second.f_uu.reshape(T2, n2, m2 * m2),
            ],
            axis=2,
        )

    def step(carry, inputs):
        V_xx, v_x, dV1, dV2, any_fail = carry
        if use_ddp:
            (f_x, f_u, l_x, l_u, l_xx, l_uu, l_ux, u_bar, slab) = inputs
        else:
            f_x, f_u, l_x, l_u, l_xx, l_uu, l_ux, u_bar = inputs

        V_reg = V_xx + mu * jnp.eye(n, dtype=V_xx.dtype)

        fuT_V = f_u.T @ V_xx
        fuT_Vreg = f_u.T @ V_reg

        Q_x = l_x + f_x.T @ v_x
        Q_u = l_u + f_u.T @ v_x
        Q_xx = l_xx + f_x.T @ (V_xx @ f_x)
        Q_uu = l_uu + fuT_V @ f_u
        Q_ux = l_ux + fuT_V @ f_x
        Quu_reg = l_uu + fuT_Vreg @ f_u
        Qux_reg = l_ux + fuT_Vreg @ f_x

        if use_ddp:
            # Full-DDP tensor terms (Tassa 2012 eqs. 5c-5e): contract the
            # next value gradient with the dynamics Hessians (one matvec
            # against the pre-stacked slab, split back into the blocks).
            m_ = f_u.shape[-1]
            q2 = v_x @ slab                       # [n*n + m*n + m*m]
            t_xx = q2[: n * n].reshape(n, n)
            t_ux = q2[n * n: n * n + m_ * n].reshape(m_, n)
            t_uu = q2[n * n + m_ * n:].reshape(m_, m_)
            Q_xx = Q_xx + t_xx
            Q_uu = Q_uu + t_uu
            Q_ux = Q_ux + t_ux
            # Combined state+control Levenberg regularization for DDP
            # (Jacobson/iLQG-style mu on Quu, on top of Tassa's V'+muI):
            # the tensor term v.f_uu is mu-INVARIANT and f_u can vanish
            # (navigation's f_u = lambda(x) I with lambda -> 0 inside
            # deceleration zones), so state regularization alone cannot
            # restore PD there — those lanes would burn the whole restart
            # budget EVERY outer iteration (measured 8x backward cost on
            # CPU, ~4% permanently-failing lanes at any mu). mu enters the
            # regularized blocks only; the dV/expected-improvement blocks
            # keep the unregularized Q_uu exactly like the iLQR path.
            Quu_reg = Quu_reg + t_uu + mu * jnp.eye(m_, dtype=Quu_reg.dtype)
            Qux_reg = Qux_reg + t_ux

        chol = jnp.linalg.cholesky(Quu_reg)
        fail = ~jnp.all(jnp.isfinite(chol))

        if use_boxqp:
            res = _boxqp(
                Quu_reg,
                Q_u,
                bounds.low - u_bar,
                bounds.high - u_bar,
                max_iters=config.boxqp_iters,
            )
            k = res.x
            K = -solve_free_system(res, Qux_reg)
            fail = fail | ~jnp.all(jnp.isfinite(res.chol_free))
        else:
            K = -jax.scipy.linalg.cho_solve((chol, True), Qux_reg)
            k = -jax.scipy.linalg.cho_solve((chol, True), Q_u)

        dV1 = dV1 + k @ Q_u
        dV2 = dV2 + 0.5 * k @ (Q_uu @ k)

        V_next = Q_xx + K.T @ (Q_uu @ K) + K.T @ Q_ux + Q_ux.T @ K
        V_next = 0.5 * (V_next + V_next.T)
        v_next = Q_x + K.T @ (Q_uu @ k) + K.T @ Q_u + Q_ux.T @ k

        return (V_next, v_next, dV1, dV2, any_fail | fail), (K, k)

    zero = jnp.zeros((), lin.f_x.dtype)
    init = (final.l_xx, final.l_x, zero, zero, jnp.array(False))
    if Ubar is None:
        T, m = lin.f_u.shape[0], lin.f_u.shape[-1]
        Ubar = jnp.zeros((T, m), lin.f_x.dtype)
    inputs = (
        lin.f_x, lin.f_u, quad.l_x, quad.l_u, quad.l_xx, quad.l_uu, quad.l_ux,
        Ubar,
    )
    if use_ddp:
        inputs = inputs + (sec_slab,)
    (_, _, dV1, dV2, any_fail), (K, k) = jax.lax.scan(
        step, init, inputs, reverse=True
    )
    return ~any_fail, Policy(K=K, k=k), dV1, dV2


def backward_with_restarts(
    lin, quad, final, mu, delta, config: ILQRConfig, bounds=None, Ubar=None,
    second=None,
):
    """Backward pass wrapped in the reference's restart-on-non-PD loop.

    Reference behavior (SURVEY §3.1 hot loop #1): on a failed PD check,
    increase mu and restart the entire backward pass. Here that is an inner
    ``lax.while_loop`` — still fully on device.
    """

    def attempt(mu):
        return backward(lin, quad, final, mu, config, bounds=bounds,
                        Ubar=Ubar, second=second)

    ok0, policy0, dV10, dV20 = attempt(mu)

    def cond(carry):
        ok, _, _, _, mu, _, tries = carry
        return (~ok) & (mu < config.mu_max) & (tries < config.max_backward_restarts)

    def body(carry):
        ok, policy, dV1, dV2, mu, delta, tries = carry
        mu, delta = _increase_mu(mu, delta, config)
        ok, policy, dV1, dV2 = attempt(mu)
        return (ok, policy, dV1, dV2, mu, delta, tries + 1)

    ok, policy, dV1, dV2, mu, delta, _ = jax.lax.while_loop(
        cond, body, (ok0, policy0, dV10, dV20, mu, delta, jnp.zeros((), jnp.int32))
    )
    return ok, policy, dV1, dV2, mu, delta


def forward(env: Env, X, U, policy: Policy, alpha):
    """Closed-loop rollout with step size ``alpha`` and box clipping.

    Reference ``iLQR.forward`` control law (SURVEY §3.1 hot loop #2):
    ``u = clip(ubar + alpha*k + K (x - xbar), low, high)``.
    Returns (X_new, U_new, J_new) with J forced to +inf on numerical blowup
    so a diverging rollout is always rejected by the line search.
    """

    def step(x, inputs):
        x_bar, u_bar, K_t, k_t = inputs
        u = u_bar + alpha * k_t + K_t @ (x - x_bar)
        u = env.clip(u)
        c = env.cost(x, u)
        x_next = env.transition(x, u)
        return x_next, (x_next, u, c)

    x_T, (X_tail, U_new, costs) = jax.lax.scan(
        step, X[0], (X[:-1], U, policy.K, policy.k)
    )
    X_new = jnp.concatenate([X[0][None], X_tail], axis=0)
    J_new = jnp.sum(costs) + env.final_cost(x_T)
    J_new = jnp.where(jnp.isfinite(J_new), J_new, jnp.inf)
    return X_new, U_new, J_new


def _iteration(env: Env, state: _LoopState, config: ILQRConfig, alphas):
    """One outer iLQR iteration: derivatives -> backward -> line search.

    The three stages carry ``jax.named_scope`` annotations so XProf traces
    (``jax.profiler``) attribute device time to them — the tracing surface
    promised in SURVEY §5 (the reference has none).
    """
    with jax.named_scope("ilqr.derivatives"):
        lin, quad, final = derivatives(env, state.X, state.U)
        second = (
            env.get_second_order_transition(state.X[:-1], state.U, batch=True)
            if getattr(config, "ddp", False) else None
        )
    with jax.named_scope("ilqr.backward"):
        ok, policy, dV1, dV2, mu, delta = backward_with_restarts(
            lin, quad, final, state.mu, state.delta, config,
            bounds=env.bounds, Ubar=state.U, second=second,
        )

    # Parallel line search over the whole alpha grid (SURVEY §7.1 decision 4).
    with jax.named_scope("ilqr.linesearch"):
        X_all, U_all, J_all = jax.vmap(
            lambda a: forward(env, state.X, state.U, policy, a)
        )(alphas)

    expected = -(alphas * dV1 + alphas**2 * dV2)
    z = (state.J - J_all) / jnp.where(expected > 0, expected, 1.0)
    accepted = jnp.where(
        expected > 0.0, z > config.accept_ratio, J_all < state.J
    )
    accepted = accepted & ok  # a failed backward pass accepts nothing

    # Termination criterion #2 (Tassa 2012): the backward pass itself predicts
    # a full-step improvement below atol -> we are at a local optimum. Without
    # this, an optimal trajectory rejects every alpha and mu ratchets to the
    # ceiling instead of reporting convergence.
    at_optimum = ok & (-(dV1 + dV2) < config.atol)

    any_accepted = jnp.any(accepted)
    best = jnp.argmax(accepted)  # first True: largest accepted alpha

    X_new = jnp.where(any_accepted, X_all[best], state.X)
    U_new = jnp.where(any_accepted, U_all[best], state.U)
    J_new = jnp.where(any_accepted, J_all[best], state.J)

    # KKT stationarity on the updated controls (box-constrained envs only).
    # Gated to iterations where NO step was accepted — the only situation
    # where it changes the outcome (an accepted step either keeps converging
    # via the residual test or keeps making progress), so the extra
    # full-rollout VJP is skipped on ordinary progressing iterations
    # (round-1 VERDICT weak #3 / ADVICE).
    if env.bounds is not None:
        with jax.named_scope("ilqr.kkt"):
            def _kkt(_):
                g = jax.grad(env.total_cost, argnums=1)(state.X[0], U_new)
                pg = U_new - env.clip(U_new - g)
                return jnp.max(jnp.abs(pg)) < _kkt_threshold(
                    config, g, env.bounds
                )

            stationary = jax.lax.cond(
                ~any_accepted, _kkt, lambda _: jnp.array(False), None
            )
    else:
        stationary = jnp.array(False)
    at_optimum = at_optimum | stationary

    residual = jnp.where(
        any_accepted, state.J - J_new, jnp.where(at_optimum, 0.0, jnp.inf)
    )

    mu_dec, delta_dec = _decrease_mu(mu, delta, config)
    mu_inc, delta_inc = _increase_mu(mu, delta, config)
    mu_next = jnp.where(any_accepted | at_optimum, mu_dec, mu_inc)
    delta_next = jnp.where(any_accepted | at_optimum, delta_dec, delta_inc)

    converged = at_optimum | (any_accepted & (jnp.abs(residual) < config.atol))
    # No accepted step and regularization already at the ceiling: stuck.
    failed = (~any_accepted) & ~at_optimum & (mu_next >= config.mu_max)

    return _LoopState(
        X=X_new,
        U=U_new,
        J=J_new,
        mu=mu_next,
        delta=delta_next,
        iteration=state.iteration + 1,
        converged=converged,
        failed=state.failed | failed,
        residual=residual,
    )


@functools.partial(jax.jit, static_argnames=("config", "horizon"))
def solve(
    env: Env,
    x0: jax.Array,
    U0: Optional[jax.Array] = None,
    *,
    horizon: Optional[int] = None,
    config: ILQRConfig = ILQRConfig(),
) -> ILQRResult:
    """Solve one trajectory-optimization instance with iLQR.

    Reference ``iLQR.solve`` (SURVEY §3.1): nominal rollout, then iterate
    derivatives -> backward -> forward-line-search until the cost decrease
    drops below ``atol`` or ``max_iterations`` is reached. Everything runs in
    one compiled program under ``lax.while_loop``.

    ``U0`` defaults to zeros (clipped into bounds); pass ``horizon`` instead
    of ``U0`` to use that default.
    """
    with jax.default_matmul_precision("highest"):
        return _solve_impl(env, x0, U0, horizon, config)


def _solve_impl(env, x0, U0, horizon, config):
    if U0 is None:
        if horizon is None:
            raise ValueError("provide either U0 or horizon")
        U0 = jnp.zeros((horizon, env.action_size), x0.dtype)
    U0 = env.clip(U0)

    X0, costs0 = env.rollout(x0, U0)
    J0 = jnp.sum(costs0)
    alphas = config.alphas(x0.dtype)

    init = _LoopState(
        X=X0,
        U=U0,
        J=J0,
        mu=jnp.asarray(config.mu_init, x0.dtype),
        delta=jnp.asarray(1.0, x0.dtype),
        iteration=jnp.zeros((), jnp.int32),
        converged=jnp.array(False),
        failed=jnp.array(False),
        residual=jnp.asarray(jnp.inf, x0.dtype),
    )

    def cond(state: _LoopState):
        return (
            (state.iteration < config.max_iterations)
            & ~state.converged
            & ~state.failed
        )

    final_state = jax.lax.while_loop(
        cond, lambda s: _iteration(env, s, config, alphas), init
    )

    states, costs = env.rollout(x0, final_state.U)
    return ILQRResult(
        states=final_state.X,
        actions=final_state.U,
        costs=costs,
        total_cost=final_state.J,
        iterations=final_state.iteration,
        converged=final_state.converged,
        residual=final_state.residual,
        mu=final_state.mu,
        delta=final_state.delta,
        failed=final_state.failed,
    )


def solve_batch(
    env: Env,
    x0: jax.Array,
    U0: Optional[jax.Array] = None,
    *,
    horizon: Optional[int] = None,
    config: ILQRConfig = ILQRConfig(),
    init_state=None,
    return_trace: bool = False,
):
    """Batched iLQR over a leading scenario axis.

    ``x0``: [B, n]; optional ``U0``: [B, T, m]. Every scenario carries its own
    regularization/line-search state; the fused ``while_loop`` iterates until
    all scenarios converge (SURVEY §7.1 decision 1). This is the throughput
    path behind the >=1000 solves/s north star (BASELINE.md).

    ``init_state`` resumes a checkpointed solve; ``return_trace=True`` also
    returns per-iteration ``ILQRTrace`` statistics (see ilqr_batched.py).

    Implementation lives in ``ilqr_batched.py`` (batch-explicit core, able to
    host the fused Pallas kernels); semantics are pinned to
    ``vmap(solve)`` — see ``solve_batch_vmap``.
    """
    from tfmpc_tpu.solvers import ilqr_batched

    return ilqr_batched.solve_batch(
        env, x0, U0, horizon=horizon, config=config,
        init_state=init_state, return_trace=return_trace,
    )


@functools.partial(jax.jit, static_argnames=("config", "horizon"))
def solve_batch_vmap(
    env: Env,
    x0: jax.Array,
    U0: Optional[jax.Array] = None,
    *,
    horizon: Optional[int] = None,
    config: ILQRConfig = ILQRConfig(),
) -> ILQRResult:
    """Reference batched implementation: literal vmap of the full solve.

    Kept as the semantics oracle for the batch-explicit core (and for any
    env/config combination a fused kernel doesn't cover).
    """
    with jax.default_matmul_precision("highest"):
        if U0 is None:
            return jax.vmap(
                lambda x: _solve_impl(env, x, None, horizon, config)
            )(x0)
        return jax.vmap(
            lambda x, u: _solve_impl(env, x, u, horizon, config)
        )(x0, U0)
