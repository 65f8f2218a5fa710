"""Per-stage timing of the iLQR pipeline on the current backend.

Remote-TPU dispatch costs ~35 ms per call, which swamps naive timing of
individual jitted stages. This tool loops each stage INSIDE one jit via
``lax.scan`` (with a perturbed carry so XLA cannot hoist the body) and
divides by the rep count — the technique behind every stage number quoted
in the commit history and CLAUDE.md.

Usage: ``python benchmarks/profile_stages.py [--batch 4096] [--horizon 100]``
Prints one JSON line per stage.
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import time

import jax
import jax.numpy as jnp
import numpy as np

REPS = 30


def _timed_loop(make):
    """ms per call of ``make(eps)``, amortized over REPS in-jit iterations."""

    @jax.jit
    def f(eps):
        def body(carry, _):
            return carry + 1e-6, make(carry)

        _, outs = jax.lax.scan(body, eps, None, length=REPS)
        return jnp.sum(outs)

    float(f(jnp.float32(0.0)))  # compile
    t0 = time.perf_counter()
    float(f(jnp.float32(1e-7)))
    return (time.perf_counter() - t0) / REPS * 1e3


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=4096)
    ap.add_argument("--horizon", type=int, default=100)
    args = ap.parse_args()

    from tfmpc_tpu.models.navigation import make_navigation
    from tfmpc_tpu.ops.riccati_pallas import riccati_backward_pallas
    from tfmpc_tpu.ops.rollout_pallas import (
        linesearch_costs_pallas,
        rollout_alpha_pallas,
    )
    from tfmpc_tpu.solvers import ilqr
    from tfmpc_tpu.solvers.ilqr_batched import _derivatives_batched

    env = make_navigation(
        goal=[8.0, -5.0],
        deceleration={"center": [[3.0, -2.0]], "decay": [2.0]},
    )
    B, T = args.batch, args.horizon
    rng = np.random.default_rng(0)
    x0 = jnp.asarray(rng.uniform(-10, 10, size=(B, 2)).astype("f4"))
    U = jnp.asarray(0.1 * rng.normal(size=(B, T, 2)).astype("f4"))
    X = jax.vmap(lambda x, u: env.rollout(x, u)[0])(x0, U)
    mu = jnp.zeros((B,), jnp.float32)
    cfg = ilqr.ILQRConfig(use_pallas=True)
    lin, quad, fin = jax.jit(lambda X, U: _derivatives_batched(env, X, U))(X, U)
    _, pol, _, _ = jax.jit(riccati_backward_pallas)(lin, quad, fin, mu)
    av = jnp.ones((B,), jnp.float32)

    stages = {
        "derivatives (XLA vmap-jacfwd)": lambda e: jnp.sum(
            _derivatives_batched(env, X + e, U)[0].f_x
        ),
        "backward (Pallas Riccati)": lambda e: jnp.sum(
            riccati_backward_pallas(
                dataclasses.replace(lin, f_x=lin.f_x + e), quad, fin, mu
            )[1].k
        ),
        "linesearch (Pallas, all alphas)": lambda e: jnp.sum(
            linesearch_costs_pallas(env, X + e, U, pol, cfg.alphas_static())
        ),
        "materialize (Pallas, accepted alpha)": lambda e: jnp.sum(
            rollout_alpha_pallas(env, X + e, U, pol, av)[2]
        ),
    }
    total = 0.0
    for name, make in stages.items():
        ms = _timed_loop(make)
        total += ms
        print(json.dumps({
            "stage": name, "ms_per_iteration": round(ms, 3),
            "batch": B, "horizon": T,
        }), flush=True)
    print(json.dumps({
        "stage": "TOTAL per outer iLQR iteration",
        "ms_per_iteration": round(total, 3),
        "batch": B, "horizon": T,
    }))


if __name__ == "__main__":
    main()
