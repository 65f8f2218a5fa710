"""Triage the HVAC-16 (suite config 3b) unconverged lanes.

Round-3 VERDICT weak #5: config 3b is the only ladder config below full
convergence (frac_converged 0.982 at B=512, atol=1e-2, max_iterations=20)
and nothing explains or gates it. This tool classifies every unconverged
lane at the suite's exact config:

- ``failed``        — mu escalated to mu_max with no accepted step
                      (a genuine solver failure: would indicate a mid-dim
                      boxQP accuracy seam);
- ``still-iterating`` — neither converged nor failed at the iteration cap:
                      the lane just needs more outer iterations;

then re-solves the SAME x0 batch with progressively larger iteration caps
to find where the tail actually converges, and prints the KKT stationarity
residual of the worst lane (boundary optima legitimately sit at the bound
with nonzero gradient — the projected-gradient KKT residual is the right
optimality measure there, see tests/oracles.py).

Run on chip: PYTHONPATH=/root/.axon_site:/root/repo \
    python benchmarks/hvac16_investigate.py
"""

from __future__ import annotations

import argparse
import json
import os

import _bootstrap  # noqa: F401  (repo root onto sys.path)
import jax
import jax.numpy as jnp
import numpy as np


def main():
    # --batch/--horizon/--caps override the suite config ONLY for cheap
    # CPU smoke runs (pre-flighting the sweep step); the defaults ARE the
    # config-3b numbers the triage is about.
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=512)
    ap.add_argument("--horizon", type=int, default=50)
    ap.add_argument("--caps", default="20,40,80")
    args = ap.parse_args()

    from tfmpc_tpu.models.registry import load_env
    from tfmpc_tpu.solvers import ilqr

    env = load_env(os.path.join(
        os.path.dirname(__file__), "..", "configs", "hvac16.json"
    ))
    B, horizon = args.batch, args.horizon
    caps = [int(c) for c in args.caps.split(",")]
    x0 = jnp.asarray(
        np.random.default_rng(0).uniform(8, 18, size=(B, 16)).astype("f4")
    )

    res_base = None  # the caps[0] result, reused for the KKT triage below
    for max_it in caps:
        cfg = ilqr.ILQRConfig(
            atol=1e-2, max_iterations=max_it, boxqp=True, use_pallas=True
        )
        res = ilqr.solve_batch(env, x0, horizon=horizon, config=cfg)
        if res_base is None:
            res_base = res
        conv = np.asarray(res.converged)
        fail = np.asarray(res.failed)
        resid = np.asarray(res.residual)
        bad = ~conv
        rec = {
            "max_iterations": max_it,
            "frac_converged": round(float(conv.mean()), 4),
            "n_unconverged": int(bad.sum()),
            "n_failed(mu_max)": int(fail.sum()),
            "n_still_iterating": int((bad & ~fail).sum()),
            "worst_residual": (
                round(float(np.abs(resid[bad]).max()), 6) if bad.any()
                else 0.0
            ),
            "unconverged_lanes": np.flatnonzero(bad)[:16].tolist(),
        }
        print(json.dumps(rec), flush=True)
        if not bad.any():
            break

    # KKT stationarity of the worst lane at the base config (the caps[0]
    # solve already run above — byte-identical, no redundant re-solve): is
    # the "unconverged" tail actually at a boundary optimum the
    # cost-decrease residual can't see?
    bad = ~np.asarray(res_base.converged)
    if bad.any():
        idx = np.flatnonzero(bad)
        U = res_base.actions[idx]         # [k, T, m]
        x0b = x0[idx]
        # highest matmul precision: at the TPU default the n=16 matvecs in
        # grad run as bf16 passes and the printed "KKT residual" would
        # measure matmul error, not stationarity (CLAUDE.md invariant)
        with jax.default_matmul_precision("highest"):
            g = jax.jit(
                jax.vmap(jax.grad(env.total_cost, argnums=1))
            )(x0b, U)
        lo, hi = env.bounds.low, env.bounds.high
        kkt = jnp.abs(U - jnp.clip(U - g, lo, hi)).max(axis=(1, 2))
        gmax = jnp.abs(g).max(axis=(1, 2))
        print(json.dumps({
            "unconverged_lane_KKT_residual_max": round(float(kkt.max()), 6),
            "unconverged_lane_KKT_residual_median": round(
                float(jnp.median(kkt)), 6
            ),
            "unconverged_lane_raw_grad_max": round(float(gmax.max()), 4),
        }), flush=True)


if __name__ == "__main__":
    main()
