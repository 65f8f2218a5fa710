"""Mid-dim Riccati kernel vs the vmapped-scan backward, on chip.

The acceptance benchmark for the round-2 mid-dim kernel (VERDICT: "a 16-
and 24-dim env beats the vmapped scan >=10x on chip"): times the backward
pass (unconstrained and boxQP) at several state/action sizes through both
paths and prints the speedup per configuration.

Usage: PYTHONPATH=/root/.axon_site:/root/repo python benchmarks/middim_bench.py
        [--batch 1024] [--horizon 100] [--dims 16,24]
"""

from __future__ import annotations

import argparse
import json

import _bootstrap  # noqa: F401  (repo root onto sys.path)
import jax
import jax.numpy as jnp
import numpy as np

from timing import amortized_ms


def _timed(make, operands=()):
    # Big B*T*d^2 blocks must be operands, not closures: embedded-constant
    # lowering 413s the remote-compile relay (see timing.amortized_ms).
    return amortized_ms(make, reps=10, operands=operands)


def _synthetic(rng, B, T, n, m, dtype=jnp.float32):
    def psd(k, scale):
        A = rng.standard_normal((B, T, k, k)) * scale
        M = np.einsum("btij,btkj->btik", A, A) + 0.5 * np.eye(k)
        return jnp.asarray(M, dtype)

    from tfmpc_tpu.core.types import (
        Bounds, LinearModel, QuadraticFinal, QuadraticModel,
    )

    lin = LinearModel(
        f=jnp.zeros((B, T, n), dtype),
        f_x=jnp.asarray(
            0.9 * np.stack([np.eye(n)] * (B * T)).reshape(B, T, n, n)
            + 0.1 * rng.standard_normal((B, T, n, n)), dtype
        ),
        f_u=jnp.asarray(0.3 * rng.standard_normal((B, T, n, m)), dtype),
    )
    quad = QuadraticModel(
        l=jnp.zeros((B, T), dtype),
        l_x=jnp.asarray(rng.standard_normal((B, T, n)), dtype),
        l_u=jnp.asarray(rng.standard_normal((B, T, m)), dtype),
        l_xx=psd(n, 0.3),
        l_uu=psd(m, 0.3),
        l_ux=jnp.asarray(0.1 * rng.standard_normal((B, T, m, n)), dtype),
    )
    final = QuadraticFinal(
        l=jnp.zeros((B,), dtype),
        l_x=jnp.asarray(rng.standard_normal((B, n)), dtype),
        l_xx=psd(n, 0.3)[:, 0],
    )
    mu = jnp.zeros((B,), dtype)
    bounds = Bounds(
        low=jnp.full((m,), -0.4, dtype), high=jnp.full((m,), 0.4, dtype)
    )
    Ubar = jnp.asarray(0.2 * rng.standard_normal((B, T, m)), dtype)
    return lin, quad, final, mu, bounds, Ubar


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=1024)
    ap.add_argument("--horizon", type=int, default=100)
    ap.add_argument("--dims", default="16,24")
    ap.add_argument("--boxqp-only", action="store_true")
    ap.add_argument("--scan-only", action="store_true",
                    help="Time only the vmapped-scan backward: quantifies "
                         "the dims > MID_DIM_MAX fallback path (no kernel "
                         "exists there, so the scan IS the product path). "
                         "Use a reduced --batch at d >= 64: the synthetic "
                         "linearization is ~5 B*T*d^2 fp32 arrays "
                         "(d=64, B=256, T=100 -> ~2 GB HBM).")
    args = ap.parse_args()

    import dataclasses

    from tfmpc_tpu.ops.riccati_mid_pallas import (
        riccati_backward_mid, riccati_backward_mid_boxqp,
    )
    from tfmpc_tpu.ops.riccati_pallas import (
        riccati_backward_boxqp_pallas, riccati_backward_pallas,
    )
    from tfmpc_tpu.solvers import ilqr

    B, T = args.batch, args.horizon
    rng = np.random.default_rng(0)
    for d in (int(x) for x in args.dims.split(",")):
        n = m = d
        lin, quad, final, mu, bounds, Ubar = _synthetic(rng, B, T, n, m)
        # lin/quad/final/mu/Ubar ride as explicit operands (see _timed).
        variants = []
        if not args.boxqp_only:
            cfg = ilqr.ILQRConfig()
            variants += [
                ("scan", lambda e, li, q, fi, mv, _u: jnp.sum(jax.vmap(
                    lambda l, q2, f2, m2: ilqr.backward(l, q2, f2, m2, cfg)
                )(dataclasses.replace(li, f_x=li.f_x + e), q, fi, mv
                )[1].k)),
            ]
            if not args.scan_only:
                variants += [
                    ("mid-kernel", lambda e, li, q, fi, mv, _u: jnp.sum(
                        riccati_backward_mid(
                            dataclasses.replace(li, f_x=li.f_x + e), q,
                            fi, mv
                        )[1].k)),
                ]
                if d <= 12:
                    # Boundary A/B: at d <= 12 the dispatcher picks the
                    # unrolled lane kernel (MID_DIM_MIN = 13 — an assumption
                    # until this measures it). Both kernels are mechanically
                    # valid here; time them head-to-head.
                    variants += [
                        ("lane-kernel", lambda e, li, q, fi, mv, _u: jnp.sum(
                            riccati_backward_pallas(
                                dataclasses.replace(li, f_x=li.f_x + e), q,
                                fi, mv
                            )[1].k)),
                    ]
        cfgb = ilqr.ILQRConfig(boxqp=True, boxqp_iters=8)
        variants += [
            ("scan-boxqp", lambda e, li, q, fi, mv, u: jnp.sum(jax.vmap(
                lambda l, q2, f2, m2, u2: ilqr.backward(
                    l, q2, f2, m2, cfgb, bounds=bounds, Ubar=u2)
            )(dataclasses.replace(li, f_x=li.f_x + e), q, fi, mv, u
            )[1].k)),
        ]
        if not args.scan_only:
            variants += [
                ("mid-kernel-boxqp", lambda e, li, q, fi, mv, u: jnp.sum(
                    riccati_backward_mid_boxqp(
                        dataclasses.replace(li, f_x=li.f_x + e), q,
                        fi, mv, bounds, u, boxqp_iters=8
                    )[1].k)),
            ]
            if d <= 12:
                variants += [
                    ("lane-kernel-boxqp", lambda e, li, q, fi, mv, u: jnp.sum(
                        riccati_backward_boxqp_pallas(
                            dataclasses.replace(li, f_x=li.f_x + e), q,
                            fi, mv, bounds, u, boxqp_iters=8
                        )[1].k)),
                ]
        times = {}
        for name, make in variants:
            ms, comp = _timed(make, operands=(lin, quad, final, mu, Ubar))
            times[name] = ms
            print(json.dumps({
                "dims": d, "variant": name, "ms_per_backward": round(ms, 3),
                "compile_s": round(comp, 1), "batch": B, "horizon": T,
            }), flush=True)
        for a, b in (("scan", "mid-kernel"), ("scan-boxqp", "mid-kernel-boxqp"),
                     ("lane-kernel", "mid-kernel"),
                     ("lane-kernel-boxqp", "mid-kernel-boxqp")):
            if a in times and b in times:
                print(json.dumps({
                    "dims": d, "speedup": f"{a} / {b}",
                    "x": round(times[a] / times[b], 1),
                }), flush=True)


if __name__ == "__main__":
    main()
