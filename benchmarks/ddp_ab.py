"""A/B full second-order DDP (`ILQRConfig.ddp`) vs iLQR on chip.

The superset question the flag exists to answer empirically: DDP keeps the
v_x-contracted dynamics Hessians (Tassa et al. 2012 eqs. 5c-5e) for
quadratic local convergence, at the price of (a) one extra jacfwd Hessian
sweep per iteration and (b) losing the fused Riccati kernel (the backward
drops to the vmapped XLA scan — the rollout/line-search kernels still run).
This measures, per config: outer iterations to converge, converged
fraction, fp32 cost reached, and amortized ms/solve — so the docs can say
WHERE ddp=True pays (iteration-dominated problems) and where it does not
(kernel-dominated ones), with numbers.

Usage: python benchmarks/ddp_ab.py [--quick]
"""

import _bootstrap  # noqa: F401

import argparse
import json

import jax
import jax.numpy as jnp
import numpy as np

from timing import amortized_ms


def _ab(name, env, x0, horizon, base_cfg, reps, timed=True):
    from tfmpc_tpu.solvers import ilqr

    out = {}
    for label, ddp in (("ilqr", False), ("ddp", True)):
        cfg = ilqr.ILQRConfig(**{**base_cfg, "ddp": ddp})
        res = ilqr.solve_batch(env, x0, horizon=horizon, config=cfg)
        out[label] = {
            "frac_converged": round(
                float(jnp.mean(res.converged.astype("f4"))), 4
            ),
            "mean_iterations": round(
                float(jnp.mean(res.iterations.astype("f4"))), 2
            ),
            "mean_cost": float(jnp.mean(res.total_cost)),
        }
        if timed:
            make = lambda eps: ilqr.solve_batch(
                env, x0 + eps, horizon=horizon, config=cfg
            ).total_cost
            ms, compile_s = amortized_ms(make, reps=reps)
            out[label].update(
                ms_per_solve=round(ms, 3),
                solves_per_s=round(x0.shape[0] / ms * 1e3, 1),
                compile_s=round(compile_s, 1),
            )
    cost_rel = abs(out["ddp"]["mean_cost"] - out["ilqr"]["mean_cost"]) / max(
        abs(out["ilqr"]["mean_cost"]), 1e-9
    )
    rec = {
        "config": name, **out,
        "iteration_ratio_ddp_over_ilqr": round(
            out["ddp"]["mean_iterations"]
            / max(out["ilqr"]["mean_iterations"], 1e-9), 3
        ),
        "mean_cost_rel_dev": float(f"{cost_rel:.2e}"),
    }
    if timed:
        rec["wall_ratio_ddp_over_ilqr"] = round(
            out["ddp"]["ms_per_solve"] / out["ilqr"]["ms_per_solve"], 3
        )
    print(json.dumps(rec), flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true",
                    help="tiny shapes, CPU, parity-only (smoke test)")
    args = ap.parse_args()
    quick = args.quick
    if quick:
        jax.config.update("jax_platforms", "cpu")

    from tfmpc_tpu.models.hvac import make_hvac
    from tfmpc_tpu.models.navigation import make_navigation
    from tfmpc_tpu.models.reservoir import make_reservoir

    rng = np.random.default_rng(0)
    reps = 2 if quick else 10

    # Navigation FAR from the goal with tight atol: the most nonlinear
    # regime (deceleration-zone curvature) — where second-order terms have
    # the best shot at cutting iterations.
    nav = make_navigation(
        goal=[8.0, -5.0],
        deceleration={"center": [[3.0, -2.0]], "decay": [2.0]},
    )
    B = 64 if quick else 1024
    x0 = jnp.asarray(rng.uniform(-10, 10, size=(B, 2)).astype("f4"))
    _ab(
        "nav_tight", nav, x0, 4 if quick else 100,
        dict(atol=1e-6, max_iterations=3 if quick else 60, use_pallas=True),
        reps, timed=not quick,
    )

    adj = [[0, 1, 0], [1, 0, 1], [0, 1, 0]]
    hvac = make_hvac(adj, is_out=[1, 0, 1], is_hall=[0, 1, 0])
    Bh = 64 if quick else 512
    x0h = jnp.asarray(rng.uniform(8, 18, size=(Bh, 3)).astype("f4"))
    _ab(
        "hvac3_boxqp", hvac, x0h, 4 if quick else 100,
        dict(atol=1e-3, max_iterations=3 if quick else 40, boxqp=True,
             use_pallas=True),
        reps, timed=not quick,
    )

    if not quick:
        envr = make_reservoir(5)
        xr = jnp.asarray(
            rng.uniform(10, 95, size=(256, envr.state_size)).astype("f4")
        )
        _ab(
            "reservoir_T100", envr, xr, 100,
            dict(atol=1e-3, max_iterations=30, boxqp=True, use_pallas=True),
            reps,
        )


if __name__ == "__main__":
    main()
