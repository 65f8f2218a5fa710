"""Chip-verify the mid-dim Riccati kernel's dimension ceiling.

Round-2 ADVICE (medium): MID_DIM_MAX = 48 was never validated on chip —
the double-buffered VMEM working set at the minimum 128-lane block grows
as ~30 d^2 * 128 * 4 B and plausibly exceeds the ~16 MB scoped-VMEM stack
well before d = 48. This probe, run on the real TPU backend, attempts to
compile + execute ``riccati_backward_mid`` / ``riccati_backward_mid_boxqp``
at each dim, checks parity against the scan backward computed on the CPU
backend (fp32, highest matmul precision), and times the kernel amortized
(REPS solves inside one jit). The measured ceiling feeds
``ops/riccati_mid_pallas.mid_kernel_supported`` and MID_DIM_MAX.

Usage:
  PYTHONPATH=/root/.axon_site:/root/repo python benchmarks/mid_vmem_probe.py \
      [--dims 24,28,32,40,48] [--batch 256] [--horizon 20]
"""

from __future__ import annotations

import argparse
import json
import time
import traceback

import _bootstrap  # noqa: F401  (repo root onto sys.path)
import jax
import jax.numpy as jnp
import numpy as np

from timing import amortized_ms

REPS = 5


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--dims", default="24,28,32,40,48")
    ap.add_argument("--batch", type=int, default=256)
    ap.add_argument("--horizon", type=int, default=20)
    ap.add_argument("--skip-unconstrained", action="store_true")
    args = ap.parse_args()

    import dataclasses
    import sys

    sys.path.insert(0, "tests")
    from test_riccati_mid import _synthetic

    from tfmpc_tpu.core.types import Bounds
    from tfmpc_tpu.ops.riccati_mid_pallas import (
        riccati_backward_mid,
        riccati_backward_mid_boxqp,
    )
    from tfmpc_tpu.solvers import ilqr

    assert jax.default_backend() != "cpu", "run this on the TPU backend"
    cpu = jax.devices("cpu")[0]
    B, T = args.batch, args.horizon

    for d in (int(x) for x in args.dims.split(",")):
        n = m = d
        rng = np.random.default_rng(100 + d)
        lin, quad, final, mu = _synthetic(rng, B, T, n, m, dtype=jnp.float32)
        bounds = Bounds(
            low=jnp.full((m,), -0.4, jnp.float32),
            high=jnp.full((m,), 0.4, jnp.float32),
        )
        Ubar = jnp.asarray(0.2 * rng.standard_normal((B, T, m)), jnp.float32)

        # scan reference on the CPU backend (exact fp32 matmuls)
        to_cpu = lambda t: jax.tree_util.tree_map(
            lambda a: jax.device_put(a, cpu), t
        )
        lin_c, quad_c, final_c, mu_c, Ubar_c = (
            to_cpu(lin), to_cpu(quad), to_cpu(final), to_cpu(mu), to_cpu(Ubar)
        )
        cfg = ilqr.ILQRConfig()
        cfgb = ilqr.ILQRConfig(boxqp=True, boxqp_iters=8)
        with jax.default_device(cpu):
            with jax.default_matmul_precision("highest"):
                ok_r, pol_r, _, _ = jax.jit(jax.vmap(
                    lambda l, q, f, mv: ilqr.backward(l, q, f, mv, cfg)
                ))(lin_c, quad_c, final_c, mu_c)
                okb_r, polb_r, _, _ = jax.jit(jax.vmap(
                    lambda l, q, f, mv, u: ilqr.backward(
                        l, q, f, mv, cfgb, bounds=to_cpu(bounds), Ubar=u
                    )
                ))(lin_c, quad_c, final_c, mu_c, Ubar_c)
        ok_r, pol_r = np.asarray(ok_r), jax.device_get(pol_r)
        okb_r, polb_r = np.asarray(okb_r), jax.device_get(polb_r)

        # All B*T*d^2 tensors ride as explicit jit operands (NOT closures):
        # embedded constants at d=48/B=256/T=20 are ~240 MB of HLO and 413
        # the remote-compile relay (round-3 ADVICE; see timing.amortized_ms).
        probe_ops = (lin, quad, final, mu, Ubar)
        variants = []
        if not args.skip_unconstrained:
            variants.append((
                "mid", ok_r, pol_r,
                lambda e, li, q, fi, mv, u: riccati_backward_mid(
                    dataclasses.replace(li, f_x=li.f_x + e), q, fi, mv
                ),
            ))
        variants.append((
            "mid-boxqp", okb_r, polb_r,
            lambda e, li, q, fi, mv, u: riccati_backward_mid_boxqp(
                dataclasses.replace(li, f_x=li.f_x + e), q, fi, mv,
                bounds, u, boxqp_iters=8,
            ),
        ))

        for name, ok_ref, pol_ref, make in variants:
            rec = {"dims": d, "variant": name, "batch": B, "horizon": T}
            try:
                t0 = time.perf_counter()
                ok_k, pol_k, _, _ = jax.jit(make)(
                    jnp.float32(0.0), *probe_ops
                )
                # host fetch = sync (block_until_ready unreliable on axon)
                devK = float(np.max(np.abs(
                    np.asarray(pol_k.K) - np.asarray(pol_ref.K)
                )))
                devk = float(np.max(np.abs(
                    np.asarray(pol_k.k) - np.asarray(pol_ref.k)
                )))
                rec["compile_s"] = round(time.perf_counter() - t0, 1)
                rec["ok_agree"] = bool(np.all(np.asarray(ok_k) == ok_ref))
                rec["max_dev_K"] = devK
                rec["max_dev_k"] = devk
                rec["parity"] = bool(
                    rec["ok_agree"] and devK < 2e-3 and devk < 2e-3
                )

                ms, _ = amortized_ms(
                    lambda e, *ops: make(e, *ops)[1].k,
                    reps=REPS, operands=probe_ops,
                )
                rec["ms_per_backward"] = round(ms, 2)
                rec["status"] = "ok"
            except Exception as e:  # compile OOM / Mosaic failure
                rec["status"] = "fail"
                rec["error"] = f"{type(e).__name__}: {str(e)[:400]}"
                traceback.print_exc()
            print(json.dumps(rec), flush=True)


if __name__ == "__main__":
    main()
