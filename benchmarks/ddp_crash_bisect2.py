"""Finer bisect of the hvac3 DDP amortized-scan TPU-worker crash.

Known (ddp_probe --bisect, 2x reproduced): hvac3_boxqp + ddp=True solves
fine as ONE dispatch, but `amortized_ms` (lax.scan of chained solves in
one jit) crashes the TPU worker. This grid isolates the trigger:
use_pallas (Mosaic rollout kernels inside the big program) x boxqp x
scan depth. Ordered least-likely-to-crash first; prints a marker before
each case so the crash point survives in the log.
"""

import _bootstrap  # noqa: F401

import json
import sys

import jax.numpy as jnp
import numpy as np

from timing import amortized_ms


def main():
    from tfmpc_tpu.models.hvac import make_hvac
    from tfmpc_tpu.solvers import ilqr

    adj = [[0, 1, 0], [1, 0, 1], [0, 1, 0]]
    env = make_hvac(adj, is_out=[1, 0, 1], is_hall=[0, 1, 0])
    B = 512
    rng = np.random.default_rng(0)
    x0 = jnp.asarray(rng.uniform(8, 18, size=(B, 3)).astype("f4"))

    cases = [
        # (label, use_pallas, boxqp, reps)
        ("no_pallas_no_boxqp_r5", False, False, 5),
        ("no_pallas_boxqp_r2", False, True, 2),
        ("no_pallas_boxqp_r5", False, True, 5),
        ("pallas_no_boxqp_r5", True, False, 5),
        ("pallas_boxqp_r2", True, True, 2),
        ("pallas_boxqp_r5", True, True, 5),  # the known-crashing config
    ]
    only = sys.argv[1] if len(sys.argv) > 1 else None
    for label, pallas, boxqp, reps in cases:
        if only and only != label:
            continue
        cfg = ilqr.ILQRConfig(
            atol=1e-3, max_iterations=40, boxqp=boxqp,
            use_pallas=pallas, ddp=True,
        )
        print(json.dumps({"case": label, "status": "running..."}), flush=True)
        ms, compile_s = amortized_ms(
            lambda e: ilqr.solve_batch(
                env, x0 + e, horizon=100, config=cfg
            ).total_cost,
            reps=reps,
        )
        print(json.dumps({
            "case": label, "status": "ok", "ms": round(ms, 3),
            "compile_s": round(compile_s, 1),
        }), flush=True)


if __name__ == "__main__":
    main()
