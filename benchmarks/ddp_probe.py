"""On-chip stage attribution for the DDP wall-cost gap + hvac3 crash bisect.

Round-5 ddp_ab measured nav DDP at 278x the iLQR wall per solve (after the
slab+combined-regularization fix; 837x before). CPU attribution says the
bare DDP backward is ~equal to the iLQR scan backward — this tool measures
WHERE the chip time goes: (a) the second-order Hessian sweep, (b) the bare
DDP backward, (c) the restart-loop DDP backward, (d) the iLQR equivalents,
all dispatch-amortized.

--bisect: reproduce the hvac3_boxqp TPU-worker crash arm by arm (run LAST;
it kills the worker for ~10 min when it hits).

Usage: python benchmarks/ddp_probe.py [--stages] [--bisect] [--quick]
"""

import _bootstrap  # noqa: F401

import argparse
import json

import jax
import jax.numpy as jnp
import numpy as np

from timing import amortized_ms


def stages(quick):
    from tfmpc_tpu.models.navigation import make_navigation
    from tfmpc_tpu.solvers import ilqr
    from tfmpc_tpu.solvers.ilqr_batched import (
        _backward_batched,
        _backward_restarts_batched,
        _derivatives_batched,
    )

    env = make_navigation(
        goal=[8.0, -5.0],
        deceleration={"center": [[3.0, -2.0]], "decay": [2.0]},
    )
    B, T = (128, 10) if quick else (1024, 100)
    rng = np.random.default_rng(0)
    x0 = jnp.asarray(rng.uniform(-10, 10, size=(B, 2)).astype("f4"))
    U = jnp.asarray(0.1 * rng.standard_normal((B, T, 2)).astype("f4"))
    X = jax.jit(jax.vmap(lambda x, u: env.rollout(x, u)[0]))(x0, U)
    lin, quad, fin = jax.jit(
        lambda X, U: _derivatives_batched(env, X, U)
    )(X, U)
    sec = jax.jit(
        lambda X, U: jax.vmap(
            lambda x, u: env.get_second_order_transition(x, u, batch=True)
        )(X[:, :-1], U)
    )(X, U)
    mu = jnp.zeros((B,), jnp.float32)
    delta = jnp.ones((B,), jnp.float32)
    cfg = ilqr.ILQRConfig()
    reps = 2 if quick else 20

    with jax.default_matmul_precision("highest"):
        cases = {
            "derivatives (first-order)": lambda e, X, U: jnp.sum(
                _derivatives_batched(env, X + e, U)[0].f_x
            ),
            "second-order sweep": lambda e, X, U: jnp.sum(
                jax.vmap(
                    lambda x, u: env.get_second_order_transition(
                        x, u, batch=True
                    )
                )(X[:, :-1] + e, U).f_ux
            ),
            "backward ilqr (bare)": lambda e, X, U: jnp.sum(
                _backward_batched(
                    lin, quad, fin, mu + jnp.abs(e), cfg, None, U
                )[1].k
            ),
            "backward ddp (bare)": lambda e, X, U: jnp.sum(
                _backward_batched(
                    lin, quad, fin, mu + jnp.abs(e), cfg, None, U, second=sec
                )[1].k
            ),
            "backward ilqr (restart loop)": lambda e, X, U: jnp.sum(
                _backward_restarts_batched(
                    lin, quad, fin, mu + jnp.abs(e), delta, cfg, None, U
                )[1].k
            ),
            "backward ddp (restart loop)": lambda e, X, U: jnp.sum(
                _backward_restarts_batched(
                    lin, quad, fin, mu + jnp.abs(e), delta, cfg, None, U,
                    second=sec,
                )[1].k
            ),
        }
        for name, make in cases.items():
            ms, compile_s = amortized_ms(make, reps=reps, operands=(X, U))
            print(json.dumps({
                "stage": name, "ms": round(ms, 3),
                "compile_s": round(compile_s, 1), "B": B, "T": T,
            }), flush=True)


def bisect(quick):
    """hvac3 crash bisect: the ddp_ab hvac3_boxqp config, one arm at a
    time, smallest first. Prints a marker BEFORE each arm so the crash
    point is in the log even when the process dies."""
    from tfmpc_tpu.models.hvac import make_hvac
    from tfmpc_tpu.solvers import ilqr

    adj = [[0, 1, 0], [1, 0, 1], [0, 1, 0]]
    env = make_hvac(adj, is_out=[1, 0, 1], is_hall=[0, 1, 0])
    B = 64 if quick else 512
    rng = np.random.default_rng(0)
    x0 = jnp.asarray(rng.uniform(8, 18, size=(B, 3)).astype("f4"))
    base = dict(atol=1e-3, max_iterations=3 if quick else 40, boxqp=True,
                use_pallas=True)
    T = 4 if quick else 100

    for label, ddp in (("ilqr", False), ("ddp", True)):
        cfg = ilqr.ILQRConfig(**{**base, "ddp": ddp})
        print(json.dumps({"bisect": f"{label} untimed solve..."}), flush=True)
        res = ilqr.solve_batch(env, x0, horizon=T, config=cfg)
        print(json.dumps({
            "bisect": f"{label} untimed ok",
            "frac": float(jnp.mean(res.converged.astype("f4"))),
        }), flush=True)
        print(json.dumps({"bisect": f"{label} amortized..."}), flush=True)
        ms, compile_s = amortized_ms(
            lambda e: ilqr.solve_batch(
                env, x0 + e, horizon=T, config=cfg
            ).total_cost,
            reps=2 if quick else 5,
        )
        print(json.dumps({
            "bisect": f"{label} amortized ok", "ms": round(ms, 3),
            "compile_s": round(compile_s, 1),
        }), flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true")
    ap.add_argument("--stages", action="store_true")
    ap.add_argument("--bisect", action="store_true")
    args = ap.parse_args()
    if args.quick:
        jax.config.update("jax_platforms", "cpu")
    if args.stages or not args.bisect:
        stages(args.quick)
    if args.bisect:
        bisect(args.quick)


if __name__ == "__main__":
    main()
