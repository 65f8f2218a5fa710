"""A/B the `linesearch_emit_trajectories` iteration layout on chip.

Two-kernel baseline (costs kernel + accepted-alpha materialize kernel =
TWO serial T-chains per iteration) vs the emit path (ONE chain: the costs
kernel also stores every candidate trajectory and the accepted one becomes
an XLA select — ops/rollout_pallas.linesearch_costs_traj_pallas). At the
small dims where the rollout kernels are latency-bound (PARITY.md §6:
1-4% of both rooflines at n<=6) dropping a whole sequential chain should
dominate the A-times trajectory-write overhead; this tool measures whether
it actually does, per config, so the ILQRConfig default is set by data.

Also sweeps the costs_traj kernel's time block (TB in 1/2/5/10) at the
headline shapes: the planner caps it at 2 by analogy with the
derivs-emitting kernel (heavy buffered stores measured fastest at TB=2,
rollout_pallas.py) — an analogy, not a measurement, until this runs.

Usage: python benchmarks/emit_traj_ab.py [--quick] [--skip-tb]
"""

import _bootstrap  # noqa: F401

import argparse
import json

import jax
import jax.numpy as jnp
import numpy as np

from timing import amortized_ms


def _solve_ab(name, env, x0, horizon, base_cfg, budget_reps, timed=True):
    from tfmpc_tpu.solvers import ilqr

    out = {}
    for label, emit in (("two_kernel", False), ("emit_traj", True)):
        cfg = ilqr.ILQRConfig(
            **{**base_cfg, "linesearch_emit_trajectories": emit}
        )
        res = ilqr.solve_batch(env, x0, horizon=horizon, config=cfg)
        out[label] = {
            "frac_converged": round(
                float(jnp.mean(res.converged.astype("f4"))), 4
            ),
            "mean_cost": float(jnp.mean(res.total_cost)),
        }
        if timed:
            # The amortized scan re-executes the full solve `reps` times —
            # meaningful on chip, unusably slow under CPU interpret (the
            # --quick smoke is parity-only for that reason).
            make = lambda eps: ilqr.solve_batch(
                env, x0 + eps, horizon=horizon, config=cfg
            ).total_cost
            ms, compile_s = amortized_ms(make, reps=budget_reps)
            out[label].update(
                ms_per_solve=round(ms, 3),
                solves_per_s=round(x0.shape[0] / ms * 1e3, 1),
                compile_s=round(compile_s, 1),
            )
    if not timed:
        cost_rel = abs(
            out["emit_traj"]["mean_cost"] - out["two_kernel"]["mean_cost"]
        ) / max(abs(out["two_kernel"]["mean_cost"]), 1e-9)
        print(json.dumps({
            "config": name, **out,
            "mean_cost_rel_dev": float(f"{cost_rel:.2e}"),
            "verdict": "PARITY ONLY (untimed smoke)",
        }))
        return 1.0
    speedup = (
        out["two_kernel"]["ms_per_solve"] / out["emit_traj"]["ms_per_solve"]
    )
    cost_rel = abs(
        out["emit_traj"]["mean_cost"] - out["two_kernel"]["mean_cost"]
    ) / max(abs(out["two_kernel"]["mean_cost"]), 1e-9)
    verdict = "EMIT WINS" if speedup > 1.02 else (
        "TWO-KERNEL WINS" if speedup < 0.98 else "TIE"
    )
    print(json.dumps({
        "config": name, **out,
        "emit_speedup": round(speedup, 3),
        "mean_cost_rel_dev": float(f"{cost_rel:.2e}"),
        "verdict": verdict,
    }))
    return speedup


def _tb_sweep(quick):
    """costs_traj kernel in isolation across time blocks (nav shapes)."""
    from tfmpc_tpu.core.types import Policy
    from tfmpc_tpu.models.navigation import make_navigation
    from tfmpc_tpu.ops.rollout_pallas import linesearch_costs_traj_pallas

    env = make_navigation(
        goal=[8.0, -5.0],
        deceleration={"center": [[3.0, -2.0]], "decay": [2.0]},
    )
    B, T, n, m = (128, 2, 2, 2) if quick else (4096, 100, 2, 2)
    rng = np.random.default_rng(0)
    x0 = jnp.asarray(rng.uniform(-10, 10, size=(B, n)).astype("f4"))
    U = jnp.asarray(rng.uniform(-1, 1, size=(B, T, m)).astype("f4"))
    X, _ = jax.vmap(env.rollout)(x0, U)
    K = jnp.asarray(0.05 * rng.standard_normal((B, T, m, n)).astype("f4"))
    k = jnp.asarray(0.1 * rng.standard_normal((B, T, m)).astype("f4"))
    alphas = tuple(1.1 ** -float(i * i) for i in range(11))

    for tb in (1, 2, 5, 10):
        if T % tb:
            continue
        def make(eps, X, U, K, k):
            J, X_all, U_all = linesearch_costs_traj_pallas(
                env, X + eps, U, Policy(K=K, k=k), alphas, time_block=tb
            )
            # touch every output so no store is dead
            return jnp.sum(J) + jnp.sum(X_all[-1]) + jnp.sum(U_all[-1])
        ms, compile_s = amortized_ms(
            make, reps=2 if quick else 30, operands=(X, U, K, k)
        )
        print(json.dumps({
            "kernel": "costs_traj", "B": B, "T": T, "TB": tb,
            "ms": round(ms, 3), "compile_s": round(compile_s, 1),
        }))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true",
                    help="tiny shapes (CPU smoke test)")
    ap.add_argument("--skip-tb", action="store_true")
    ap.add_argument("--tb-only", action="store_true",
                    help="run only the costs_traj TB sweep (pairs with a "
                         "separate --skip-tb run so a timeout in either "
                         "step loses less data)")
    args = ap.parse_args()
    quick = args.quick
    if quick:
        # --quick is a CPU smoke test; without this it runs on the chip
        # (the axon plugin registers in every process — CLAUDE.md) and
        # contends with whatever measurement is in flight there.
        jax.config.update("jax_platforms", "cpu")

    if args.tb_only:
        _tb_sweep(quick)
        return

    from tfmpc_tpu.models.hvac import make_hvac
    from tfmpc_tpu.models.navigation import make_navigation

    rng = np.random.default_rng(0)
    reps = 2 if quick else 30

    nav = make_navigation(
        goal=[8.0, -5.0],
        deceleration={"center": [[3.0, -2.0]], "decay": [2.0]},
    )
    B = 128 if quick else 4096
    x0 = jnp.asarray(rng.uniform(-10, 10, size=(B, 2)).astype("f4"))
    _solve_ab(
        "nav_headline", nav, x0, 4 if quick else 100,
        dict(atol=1e-4, max_iterations=2 if quick else 50, use_pallas=True),
        reps, timed=not quick,
    )

    adj = [
        [0, 1, 0, 0, 0, 1], [1, 0, 1, 0, 0, 0], [0, 1, 0, 1, 0, 0],
        [0, 0, 1, 0, 1, 0], [0, 0, 0, 1, 0, 1], [1, 0, 0, 0, 1, 0],
    ]
    hvac = make_hvac(adj, is_out=[1, 0, 0, 1, 0, 0],
                     is_hall=[0, 1, 0, 0, 1, 0])
    Bh = 128 if quick else 2048
    x0h = jnp.asarray(rng.uniform(8, 18, size=(Bh, 6)).astype("f4"))
    _solve_ab(
        "hvac6_boxqp", hvac, x0h, 4 if quick else 100,
        dict(atol=1e-3, max_iterations=2 if quick else 30, boxqp=True,
             use_pallas=True),
        reps, timed=not quick,
    )

    if not quick:
        import os
        from tfmpc_tpu.models.registry import load_env
        from tfmpc_tpu.solvers import ilqr  # noqa: F401

        env16 = load_env(os.path.join(
            os.path.dirname(__file__), "..", "configs", "hvac16.json"
        ))
        x16 = jnp.asarray(rng.uniform(8, 18, size=(512, 16)).astype("f4"))
        _solve_ab(
            "hvac16_middim", env16, x16, 50,
            dict(atol=1e-3, max_iterations=40, boxqp=True, use_pallas=True),
            10,
        )

        # Long horizon: T=500 is where the verdict could flip — the emit
        # kernel's time block is capped at 2 (heavy buffered stores) while
        # the costs-only kernel runs TB=10 (+20% measured), so the single
        # chain is slower per step; whether dropping the materialize chain
        # still pays is an empirical question.
        from tfmpc_tpu.models.reservoir import make_reservoir

        envr = make_reservoir(5)
        xr = jnp.asarray(
            rng.uniform(10, 95, size=(1024, envr.state_size)).astype("f4")
        )
        _solve_ab(
            "reservoir_T500", envr, xr, 500,
            dict(atol=1e-3, max_iterations=15, boxqp=True, use_pallas=True),
            5,
        )

    if not args.skip_tb and not quick:
        # TB sweep is timing-only; meaningless (and very slow) on CPU.
        _tb_sweep(quick)


if __name__ == "__main__":
    main()
