"""Receding-horizon MPC driver over the iLQR solver.

The reference library solves one open-loop trajectory-optimization instance
per run (SURVEY §3.1 — its CLI writes a single trajectory). Closing the loop
— re-planning from the realized state each control step — is the canonical
deployment of these solvers; this module supplies that driver as one
compiled on-device program:

- ``lax.scan`` over control steps; each step warm-starts iLQR from the
  previous plan shifted by one (the standard receding-horizon warm start),
  executes the plan's first action, and advances the true dynamics.
- Batched: a [B, n] batch of closed-loop rollouts runs in one program,
  sharing all the batched-solver machinery (per-scenario mu/line-search
  state, fused Pallas kernels via ``config.use_pallas``).
- Per-step solver effort is bounded by ``config.max_iterations`` (warm
  starts keep it small after the first step — set it low for a real-time
  budget).
- Data-parallel: ``parallel.mesh.mpc_sharded`` runs the closed-loop fleet
  per device shard via ``shard_map`` (the kernel-compatible sharded path —
  a raw pallas_call cannot take GSPMD-sharded operands); outputs stay
  sharded and match the unsharded run exactly
  (tests/test_mpc.py::test_sharded_closed_loop_matches_unsharded).
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from tfmpc_tpu.models.base import Env
from tfmpc_tpu.solvers.ilqr import ILQRConfig
from tfmpc_tpu.solvers.ilqr_batched import _solve_batch_impl, with_kernel_fallback


class MPCResult(NamedTuple):
    """Closed-loop rollout of ``steps`` MPC decisions (batched: leading B).

    states:      [B, steps+1, n] realized closed-loop states
    actions:     [B, steps, m]  executed first-actions of each plan
    costs:       [B, steps]     realized stage costs
    final_cost:  [B]            terminal cost evaluated at states[-1]
    total_cost:  [B]            sum(costs) + final_cost
    plan_cost:   [B, steps]     each re-plan's predicted total cost
    iterations:  [B, steps]     solver iterations used per re-plan
    converged:   [B, steps]     per-step solver convergence
    """

    states: jax.Array
    actions: jax.Array
    costs: jax.Array
    final_cost: jax.Array
    total_cost: jax.Array
    plan_cost: jax.Array
    iterations: jax.Array
    converged: jax.Array


@functools.partial(
    jax.jit, static_argnames=("steps", "plan_horizon", "config")
)
def _run_jit(
    env: Env,
    x0: jax.Array,
    *,
    steps: int,
    plan_horizon: int,
    config: ILQRConfig = ILQRConfig(),
) -> MPCResult:
    single = x0.ndim == 1
    if single:
        x0 = x0[None]
    B = x0.shape[0]
    m = env.action_size

    with jax.default_matmul_precision("highest"):
        U0 = env.clip(jnp.zeros((B, plan_horizon, m), x0.dtype))

        def step(carry, _):
            x, U_warm = carry
            res = _solve_batch_impl(env, x, U_warm, None, config)
            u = res.actions[:, 0]
            cost = jax.vmap(env.cost)(x, u)
            x_next = jax.vmap(env.transition)(x, u)
            # shift-by-one warm start for the next re-plan
            U_next = jnp.concatenate(
                [res.actions[:, 1:], res.actions[:, -1:]], axis=1
            )
            out = (x_next, u, cost, res.total_cost,
                   res.iterations, res.converged)
            return (x_next, U_next), out

        (x_T, _), (X, U, costs, plan_cost, iters, conv) = jax.lax.scan(
            step, (x0, U0), None, length=steps
        )

        # scan stacks on axis 0 = time; move batch first
        tb = lambda a: jnp.swapaxes(a, 0, 1)
        X = jnp.concatenate([x0[:, None], tb(X)], axis=1)
        final = jax.vmap(env.final_cost)(x_T)
        total = jnp.sum(tb(costs), axis=1) + final

    result = MPCResult(
        states=X,
        actions=tb(U),
        costs=tb(costs),
        final_cost=final,
        total_cost=total,
        plan_cost=tb(plan_cost),
        iterations=tb(iters),
        converged=tb(conv),
    )
    if single:
        result = jax.tree_util.tree_map(lambda a: a[0], result)
    return result


def run(
    env: Env,
    x0: jax.Array,
    *,
    steps: int,
    plan_horizon: int,
    config: ILQRConfig = ILQRConfig(),
) -> MPCResult:
    """Closed-loop receding-horizon MPC from ``x0 [B, n]`` (or ``[n]``).

    Each of ``steps`` control steps re-solves a ``plan_horizon`` iLQR
    instance warm-started from the previous plan (shift-by-one, repeat the
    last action), applies the first planned action, and steps the true
    dynamics. Fully on device; returns the realized closed-loop trajectory
    plus per-step solver statistics.

    Like ``ilqr_batched.solve_batch``, the eager entry point degrades to the
    XLA path (with a warning) if the fused kernels fail to compile for a
    user env (``with_kernel_fallback``).
    """
    return with_kernel_fallback(
        lambda cfg: _run_jit(
            env, x0, steps=steps, plan_horizon=plan_horizon, config=cfg
        ),
        config,
        f"mpc.run (env {type(env).__name__})",
    )
