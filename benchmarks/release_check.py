"""One-sweep on-chip verification of every headline claim.

Run on the real TPU backend (see .claude/skills/verify/SKILL.md for the
PYTHONPATH recipe); prints PASS/FAIL per claim and exits nonzero on any
failure. Covers the five BASELINE configs plus the superset features
(MPC driver, LinearSystem == exact LQR).
"""

import sys

import _bootstrap  # noqa: F401  (repo root onto sys.path)
import jax
import jax.numpy as jnp
import numpy as np

from timing import amortized_ms


def main():
    sys.path.insert(0, "tests")  # fp64 NumPy oracles
    # NB: _bootstrap (imported above) promotes the kernel-fallback
    # RuntimeWarning to an error — the release gate fails loud on a kernel
    # regression instead of silently passing with XLA numbers.
    from oracles import ilqr_navigation_oracle_np

    from tfmpc_tpu.models.hvac import make_hvac
    from tfmpc_tpu.models.linear import make_linear_system
    from tfmpc_tpu.models.navigation import make_navigation
    from tfmpc_tpu.models.problems import make_lqr_linear_navigation
    from tfmpc_tpu.models.reservoir import make_reservoir
    from tfmpc_tpu.parallel import mesh as pmesh
    from tfmpc_tpu.solvers import ilqr, lqr, mpc

    checks = []

    # config 1: exact LQR on the linear navigation system
    p = make_lqr_linear_navigation(jnp.array([8.0, -5.0]), beta=0.5, horizon=100)
    s, _, _ = lqr.solve(p, jnp.zeros(2))
    checks.append((
        "config1 LQR final state reaches goal (<1e-4)",
        float(jnp.max(jnp.abs(s[-1] - jnp.array([8.0, -5.0])))) < 1e-4,
    ))

    # config 2: iLQR accuracy vs the independent fp64 oracle, at the
    # HEADLINE horizon (T=100 — round-1 VERDICT: the claim was only
    # evidenced at T<=40).
    _, U_np, _ = ilqr_navigation_oracle_np(
        [8.0, -5.0], [[3.0, -2.0]], [2.0], [0.0, 0.0], 100, atol=1e-10
    )
    env = make_navigation(
        goal=[8.0, -5.0], deceleration={"center": [[3.0, -2.0]], "decay": [2.0]}
    )
    r = ilqr.solve(
        env, jnp.zeros(2), horizon=100,
        config=ilqr.ILQRConfig(atol=1e-10, max_iterations=200),
    )
    dev = float(np.max(np.abs(np.asarray(r.actions) - U_np)))
    checks.append((
        f"config2 control deviation vs fp64 oracle at T=100 <1e-4 "
        f"(measured {dev:.2e})",
        dev < 1e-4,
    ))

    # superset (round 5): full second-order DDP (ILQRConfig.ddp) reaches the
    # SAME fp64-oracle optimum on the nonlinear navigation problem — the
    # tensor terms change the iterates, not the fixed point (first-order
    # conditions are identical; tests/test_ddp.py pins the CPU semantics,
    # this pins the chip).
    r_ddp = ilqr.solve(
        env, jnp.zeros(2), horizon=100,
        config=ilqr.ILQRConfig(atol=1e-10, max_iterations=200, ddp=True),
    )
    dev_ddp = float(np.max(np.abs(np.asarray(r_ddp.actions) - U_np)))
    checks.append((
        f"full-DDP control deviation vs fp64 oracle at T=100 <1e-4 "
        f"(measured {dev_ddp:.2e})",
        bool(r_ddp.converged) and dev_ddp < 1e-4,
    ))

    # config 3: box-constrained HVAC through the fused kernels
    envh = make_hvac(
        [[0, 1, 0], [1, 0, 1], [0, 1, 0]], is_out=[1, 0, 1], is_hall=[0, 1, 0]
    )
    x0h = jnp.asarray(
        np.random.default_rng(0).uniform(8, 18, size=(256, 3)).astype("f4")
    )
    rh = ilqr.solve_batch(
        envh, x0h, horizon=100,
        config=ilqr.ILQRConfig(
            atol=1e-3, max_iterations=30, boxqp=True, use_pallas=True
        ),
    )
    frac3 = float(jnp.mean(rh.converged.astype("f4")))
    checks.append((
        f"config3 HVAC boxQP fused: >=99% converged (measured {frac3:.3f})",
        frac3 >= 0.99,
    ))

    # config 3b: constrained accuracy vs the fp64 boxQP oracle (HVAC-3,
    # T=100). The HVAC cost is linear in u (flat valley: exact KKT points
    # differ ~1e-3 in controls at identical cost), so the pinned anchors
    # are cost parity and KKT stationarity in the fp64 model — see
    # tests/test_oracle_parity.py::TestConstrainedOracle.
    from oracles import hvac_grad_np, hvac_params_np, ilqr_hvac_boxqp_oracle_np

    adj3 = [[0, 1, 0], [1, 0, 1], [0, 1, 0]]
    kw3 = dict(is_out=[1, 0, 1], is_hall=[0, 1, 0])
    x0_3 = [8.0, 12.0, 16.0]
    p3 = hvac_params_np(adj3, **kw3)
    _, U_o, J_o = ilqr_hvac_boxqp_oracle_np(p3, x0_3, 100, atol=1e-10)
    env3 = make_hvac(adj3, **kw3)
    r3 = ilqr.solve(
        env3, jnp.asarray(x0_3), horizon=100,
        config=ilqr.ILQRConfig(atol=1e-10, max_iterations=300, boxqp=True),
    )
    # evaluate the solver's controls under the fp64 oracle model so the
    # comparison is not polluted by fp32 cost summation
    from oracles import _hvac_cost_np, _hvac_step_np

    def hvac_cost_fp64(U):
        U = np.asarray(U, float)
        x_r, J = np.asarray(x0_3, float), 0.0
        for t in range(100):
            J += _hvac_cost_np(p3, x_r, U[t])
            x_r = _hvac_step_np(p3, x_r, U[t])
        return J + _hvac_cost_np(p3, x_r, np.zeros(3))

    U_s = np.asarray(r3.actions, float)
    J_s = hvac_cost_fp64(U_s)
    cost_rel = abs(J_s - J_o) / abs(J_o)
    g = hvac_grad_np(p3, x0_3, U_s)
    kkt = float(np.abs(U_s - np.clip(U_s - g, p3["low"], p3["high"])).max())
    checks.append((
        f"config3b HVAC boxQP vs fp64 oracle: cost rel dev <1e-5 "
        f"(measured {cost_rel:.2e})",
        cost_rel < 1e-5,
    ))
    checks.append((
        f"config3b HVAC boxQP KKT residual in fp64 model <5e-3 "
        f"(measured {kkt:.2e})",
        kkt < 5e-3,
    ))

    # superset (round 5): DDP composes with the boxQP backward — same
    # fp64-oracle cost on the constrained HVAC problem.
    r3d = ilqr.solve(
        env3, jnp.asarray(x0_3), horizon=100,
        config=ilqr.ILQRConfig(
            atol=1e-10, max_iterations=300, boxqp=True, ddp=True
        ),
    )
    cost_rel_d = abs(hvac_cost_fp64(r3d.actions) - J_o) / abs(J_o)
    checks.append((
        f"full-DDP + boxQP HVAC cost vs fp64 oracle rel dev <1e-5 "
        f"(measured {cost_rel_d:.2e})",
        cost_rel_d < 1e-5,
    ))

    # lane-kernel parity at its dimension ceiling (n = m = 12): CPU
    # interpret tracing is impractical there (round-1 weak #4), so the
    # parity pin lives here, on the real chip, against the scan backward.
    import dataclasses
    import sys as _sys

    _sys.path.insert(0, "tests")
    from test_riccati_mid import _synthetic

    from tfmpc_tpu.core.types import Bounds
    from tfmpc_tpu.ops.riccati_pallas import (
        riccati_backward_boxqp_pallas, riccati_backward_pallas,
    )

    rng12 = np.random.default_rng(12)
    lin12, quad12, fin12, mu12 = _synthetic(
        rng12, 128, 6, 12, 12, dtype=jnp.float32
    )
    cfg12 = ilqr.ILQRConfig()
    # the scan reference MUST run at highest matmul precision — without it
    # the comparison measures the reference's bf16 matmul passes (~5e-3
    # apparent "deviation"), not the kernel (CLAUDE.md invariant)
    with jax.default_matmul_precision("highest"):
        ok_s, pol_s, _, _ = jax.jit(jax.vmap(
            lambda l, q, f, mv: ilqr.backward(l, q, f, mv, cfg12)
        ))(lin12, quad12, fin12, mu12)
    ok_k, pol_k, _, _ = riccati_backward_pallas(lin12, quad12, fin12, mu12)
    dev12 = float(jnp.max(jnp.abs(pol_k.K - pol_s.K)))
    checks.append((
        f"lane kernel n=m=12 matches scan backward on chip "
        f"(max K dev {dev12:.2e})",
        bool(jnp.all(ok_s == ok_k)) and dev12 < 1e-4,
    ))
    bounds12 = Bounds(
        low=jnp.full((12,), -0.4, jnp.float32),
        high=jnp.full((12,), 0.4, jnp.float32),
    )
    Ubar12 = jnp.asarray(
        0.2 * rng12.standard_normal((128, 6, 12)), jnp.float32
    )
    cfgb12 = ilqr.ILQRConfig(boxqp=True, boxqp_iters=4)
    with jax.default_matmul_precision("highest"):
        okb_s, polb_s, _, _ = jax.jit(jax.vmap(
            lambda l, q, f, mv, u: ilqr.backward(
                l, q, f, mv, cfgb12, bounds=bounds12, Ubar=u
            )
        ))(lin12, quad12, fin12, mu12, Ubar12)
    okb_k, polb_k, _, _ = riccati_backward_boxqp_pallas(
        lin12, quad12, fin12, mu12, bounds12, Ubar12, boxqp_iters=4
    )
    devb12 = float(jnp.max(jnp.abs(polb_k.K - polb_s.K)))
    checks.append((
        f"lane boxQP kernel n=m=12 matches scan backward on chip "
        f"(max K dev {devb12:.2e})",
        bool(jnp.all(okb_s == okb_k)) and devb12 < 1e-3,
    ))

    # round-5 full-DDP lane kernel at its n=m=12 dimension CEILING with
    # synthetic Hessians (review finding: the d3-based VMEM cap branch —
    # cap 128 at d3=5184 — was exercised nowhere; the non-DDP lane kernel
    # has exactly this pin because CPU interpret cannot trace n=12).
    from tfmpc_tpu.core.types import SecondOrderModel

    rng12d = np.random.default_rng(120)
    lin12d, quad12d, fin12d, mu12d = _synthetic(
        rng12d, 128, 6, 12, 12, dtype=jnp.float32
    )
    # Hessian scale 0.01: CPU-verified to keep the scan backward PD on all
    # 128 lanes (0.05 fails EVERY lane — the 12-dim value recursion
    # amplifies random tensor terms fast); the claim needs ok lanes to
    # compare on.
    fxx12 = jnp.asarray(
        0.01 * rng12d.standard_normal((128, 6, 12, 12, 12)).astype("f4")
    )
    fxx12 = 0.5 * (fxx12 + jnp.swapaxes(fxx12, -1, -2))
    sec12 = SecondOrderModel(
        f_xx=fxx12,
        f_ux=jnp.asarray(
            0.01 * rng12d.standard_normal((128, 6, 12, 12, 12)).astype("f4")
        ),
        f_uu=0.5 * (lambda a: a + jnp.swapaxes(a, -1, -2))(jnp.asarray(
            0.01 * rng12d.standard_normal((128, 6, 12, 12, 12)).astype("f4")
        )),
    )
    with jax.default_matmul_precision("highest"):
        ok12d_s, pol12d_s, _, _ = jax.jit(jax.vmap(
            lambda l, q, f, mv, s: ilqr.backward(
                l, q, f, mv, cfg12, second=s
            )
        ))(lin12d, quad12d, fin12d, mu12d, sec12)
    from tfmpc_tpu.ops.riccati_pallas import riccati_backward_ddp_pallas \
        as _rbddp
    ok12d_k, pol12d_k, _, _ = _rbddp(lin12d, quad12d, fin12d, mu12d, sec12)
    okm12 = np.asarray(ok12d_s)
    dev12d = (float(jnp.max(jnp.abs(
        pol12d_k.K[okm12] - pol12d_s.K[okm12])))
        if okm12.any() else float("inf"))
    checks.append((
        f"full-DDP lane kernel at its n=m=12 ceiling matches scan on chip "
        f"(ok masks equal, max K dev {dev12d:.2e} on {okm12.mean():.0%} ok "
        f"lanes)",
        bool(jnp.all(ok12d_s == ok12d_k)) and okm12.mean() > 0.5
        and dev12d < 1e-3,
    ))

    # round-5 full-DDP lane kernel: on-chip parity vs the scan backward
    # with the second-order tensors (plain + boxQP variants). Failed-PD
    # lanes hold garbage on both paths (the restart loop owns them), so
    # parity is pinned on the ok lanes; the ok MASKS must agree exactly.
    from tfmpc_tpu.ops.riccati_pallas import (
        riccati_backward_ddp_boxqp_pallas, riccati_backward_ddp_pallas,
    )
    from tfmpc_tpu.solvers.ilqr_batched import _derivatives_batched

    rngd = np.random.default_rng(21)
    x0d = jnp.asarray(rngd.uniform(-5, 5, size=(128, 2)).astype("f4"))
    U0d = jnp.asarray((0.3 * rngd.standard_normal((128, 8, 2))).astype("f4"))
    X0d = jax.jit(jax.vmap(env.rollout))(x0d, U0d)[0]
    with jax.default_matmul_precision("highest"):
        lind, quadd, find = jax.jit(
            lambda X, U: _derivatives_batched(env, X, U)
        )(X0d, U0d)
        secd = jax.jit(lambda X, U: jax.vmap(
            lambda x, u: env.get_second_order_transition(x, u, batch=True)
        )(X[:, :-1], U))(X0d, U0d)
        mud = jnp.asarray(rngd.uniform(0, 0.5, size=(128,)).astype("f4"))
        okd_s, pold_s, _, _ = jax.jit(jax.vmap(
            lambda l, q, f, mv, s: ilqr.backward(
                l, q, f, mv, ilqr.ILQRConfig(), second=s
            )
        ))(lind, quadd, find, mud, secd)
    okd_k, pold_k, _, _ = riccati_backward_ddp_pallas(
        lind, quadd, find, mud, secd
    )
    okmask = np.asarray(okd_s)
    # guard the masked reduction: an all-lanes-failed regression must
    # print FAIL, not crash the gate with a zero-size-reduction error
    devd = (float(jnp.max(jnp.abs(pold_k.K[okmask] - pold_s.K[okmask])))
            if okmask.any() else float("inf"))
    checks.append((
        f"full-DDP lane kernel matches scan backward on chip "
        f"(ok masks equal, max K dev {devd:.2e} on {okmask.mean():.0%} ok "
        f"lanes)",
        bool(jnp.all(okd_s == okd_k)) and okmask.mean() > 0.5
        and devd < 1e-3,
    ))

    envh3 = make_hvac(
        [[0, 1, 0], [1, 0, 1], [0, 1, 0]], is_out=[1, 0, 1],
        is_hall=[0, 1, 0],
    )
    x0h3 = jnp.asarray(rngd.uniform(8, 18, size=(128, 3)).astype("f4"))
    U0h3 = envh3.clip(jnp.asarray(
        rngd.uniform(0, 4, size=(128, 8, 3)).astype("f4")
    ))
    X0h3 = jax.jit(jax.vmap(envh3.rollout))(x0h3, U0h3)[0]
    with jax.default_matmul_precision("highest"):
        linh, quadh, finh = jax.jit(
            lambda X, U: _derivatives_batched(envh3, X, U)
        )(X0h3, U0h3)
        sech = jax.jit(lambda X, U: jax.vmap(
            lambda x, u: envh3.get_second_order_transition(x, u, batch=True)
        )(X[:, :-1], U))(X0h3, U0h3)
        muh = jnp.asarray(rngd.uniform(0, 0.5, size=(128,)).astype("f4"))
        cfgh = ilqr.ILQRConfig(boxqp=True, boxqp_iters=4)
        okh_s, polh_s, _, _ = jax.jit(jax.vmap(
            lambda l, q, f, mv, u, s: ilqr.backward(
                l, q, f, mv, cfgh, bounds=envh3.bounds, Ubar=u, second=s
            )
        ))(linh, quadh, finh, muh, U0h3, sech)
    okh_k, polh_k, _, _ = riccati_backward_ddp_boxqp_pallas(
        linh, quadh, finh, muh, envh3.bounds, U0h3, sech, boxqp_iters=4,
    )
    okmh = np.asarray(okh_s)
    devh = (float(jnp.max(jnp.abs(polh_k.K[okmh] - polh_s.K[okmh])))
            if okmh.any() else float("inf"))
    checks.append((
        f"full-DDP boxQP lane kernel matches scan backward on chip "
        f"(ok masks equal, max K dev {devh:.2e})",
        bool(jnp.all(okh_s == okh_k)) and okmh.mean() > 0.5
        and devh < 1e-3,
    ))

    # mid-dim kernel (12 < n,m <= 48): on-chip parity vs the scan backward
    # across the WHOLE shipped envelope — n = 16/24 (round 2) plus 32/48
    # (round-3 VERDICT missing #4: the 25-48 half of MID_DIM_MAX was only
    # compile-verified by the VMEM probe, never parity-verified on chip) —
    # plus >=10x backward speedups at n=16 AND n=32.
    from tfmpc_tpu.ops.riccati_mid_pallas import (
        riccati_backward_mid, riccati_backward_mid_boxqp,
    )

    for dmid in (16, 24, 32, 48):
        rngm = np.random.default_rng(dmid)
        linm, quadm, finm, mum = _synthetic(
            rngm, 128, 6, dmid, dmid, dtype=jnp.float32
        )
        with jax.default_matmul_precision("highest"):
            okm_s, polm_s, _, _ = jax.jit(jax.vmap(
                lambda l, q, f, mv: ilqr.backward(l, q, f, mv, cfg12)
            ))(linm, quadm, finm, mum)
        okm_k, polm_k, _, _ = riccati_backward_mid(linm, quadm, finm, mum)
        devm = float(jnp.max(jnp.abs(polm_k.K - polm_s.K)))
        checks.append((
            f"mid kernel n=m={dmid} matches scan backward on chip "
            f"(max K dev {devm:.2e})",
            bool(jnp.all(okm_s == okm_k)) and devm < 1e-3,
        ))
        boundsm = Bounds(
            low=jnp.full((dmid,), -0.4, jnp.float32),
            high=jnp.full((dmid,), 0.4, jnp.float32),
        )
        Ubarm = jnp.asarray(
            0.2 * rngm.standard_normal((128, 6, dmid)), jnp.float32
        )
        with jax.default_matmul_precision("highest"):
            okbm_s, polbm_s, _, _ = jax.jit(jax.vmap(
                lambda l, q, f, mv, u: ilqr.backward(
                    l, q, f, mv, cfgb12, bounds=boundsm, Ubar=u
                )
            ))(linm, quadm, finm, mum, Ubarm)
        okbm_k, polbm_k, _, _ = riccati_backward_mid_boxqp(
            linm, quadm, finm, mum, boundsm, Ubarm, boxqp_iters=4
        )
        devbm = float(jnp.max(jnp.abs(polbm_k.K - polbm_s.K)))
        checks.append((
            f"mid boxQP kernel n=m={dmid} matches scan backward on chip "
            f"(max K dev {devbm:.2e})",
            bool(jnp.all(okbm_s == okbm_k)) and devbm < 1e-3,
        ))

    # >=10x mid-kernel backward speedup over the vmapped scan (boxQP) at
    # n=16 (B=512, T=50 — a scaled-down middim_bench config; the full
    # bench measured 21-30x at dims 16/24, B=1024, T=100) AND at n=32
    # (B=256: the upper half of the envelope, round-3 VERDICT missing #4).
    # All linearization tensors ride as amortized_ms operands (NOT
    # closures): embedded constants 413 the remote-compile relay — see
    # timing.amortized_ms (round-3 ADVICE, medium).
    cfgb16 = ilqr.ILQRConfig(boxqp=True, boxqp_iters=8)
    for dsp, Bsp in ((16, 512), (32, 256)):
        rngs = np.random.default_rng(10 * dsp)
        lins, quads, fins, mus = _synthetic(rngs, Bsp, 50, dsp, dsp,
                                            dtype=jnp.float32)
        boundss = Bounds(
            low=jnp.full((dsp,), -0.4, jnp.float32),
            high=jnp.full((dsp,), 0.4, jnp.float32),
        )
        Ubars = jnp.asarray(
            0.2 * rngs.standard_normal((Bsp, 50, dsp)), jnp.float32
        )
        sp_ops = (lins, quads, fins, mus, Ubars)
        # BOTH timings trace under highest matmul precision — that is what
        # the production solve paths run (ilqr.solve/solve_batch wrap it);
        # timing the scan at the TPU default would compare the kernel
        # against a faster-than-production bf16-pass scan and understate
        # the speedup.
        with jax.default_matmul_precision("highest"):
            ms_scan = amortized_ms(
                lambda e, li, q, fi, mv, u: jnp.sum(jax.vmap(
                    lambda l_, q_, f_, mv_, u_: ilqr.backward(
                        l_, q_, f_, mv_, cfgb16, bounds=boundss, Ubar=u_)
                )(dataclasses.replace(li, f_x=li.f_x + e), q, fi, mv, u)[1].k),
                reps=10, operands=sp_ops,
            )[0]
            ms_mid = amortized_ms(
                lambda e, li, q, fi, mv, u: jnp.sum(riccati_backward_mid_boxqp(
                    dataclasses.replace(li, f_x=li.f_x + e), q, fi, mv,
                    boundss, u, boxqp_iters=8)[1].k),
                reps=10, operands=sp_ops,
            )[0]
        speedup = ms_scan / ms_mid
        checks.append((
            f"mid boxQP kernel >=10x over vmapped scan at n={dsp} "
            f"(measured {speedup:.1f}x: {ms_scan:.1f} -> {ms_mid:.2f} ms)",
            speedup >= 10.0,
        ))

    # Rollout/line-search kernels at the round-3 OOM reproducers (round-3
    # VERDICT task 1): the costs kernel at n=m=12/B=2048/TB=10 needed
    # 17.96 MB of scoped VMEM and the materialize kernel at n=m=16/B=512
    # needed 16.72 MB — both past Mosaic's 16 MB default, both previously
    # converted into a silent XLA fallback cliff. With the VMEM envelope
    # (ops/rollout_pallas._rollout_plan) they must now compile at full
    # TB/BB AND match the XLA line-search reference on chip.
    from tfmpc_tpu.core.types import Policy
    from tfmpc_tpu.ops.rollout_pallas import (
        linesearch_costs_pallas, rollout_alpha_pallas,
    )
    from tfmpc_tpu.solvers.ilqr import forward

    k12 = 12
    adj12 = [[1 if abs(i - j) in (1, k12 - 1) else 0 for j in range(k12)]
             for i in range(k12)]
    env12 = make_hvac(
        adj12,
        is_out=[1 if i % 3 == 0 else 0 for i in range(k12)],
        is_hall=[1 if i % 3 == 1 else 0 for i in range(k12)],
    )
    rng_r = np.random.default_rng(112)
    B12, T12 = 2048, 100
    x0_12 = jnp.asarray(rng_r.uniform(8, 18, size=(B12, 12)).astype("f4"))
    U12 = env12.clip(jnp.asarray(
        rng_r.uniform(0, 2, size=(B12, T12, 12)).astype("f4")
    ))
    # the XLA references MUST run at highest matmul precision — TPU fp32
    # matmul defaults to bf16 passes and the "deviation" then measures the
    # reference, not the kernel (measured 1.3e-2 apparent dev at default
    # precision vs the kernel's pure-fp32 FMAs; CLAUDE.md invariant)
    with jax.default_matmul_precision("highest"):
        X12, _ = jax.jit(jax.vmap(env12.rollout))(x0_12, U12)
    pol12 = Policy(
        K=jnp.asarray(
            0.02 * rng_r.standard_normal((B12, T12, 12, 12)).astype("f4")
        ),
        k=jnp.asarray(
            0.05 * rng_r.standard_normal((B12, T12, 12)).astype("f4")
        ),
    )
    alphas_r = ilqr.ILQRConfig().alphas_static()
    J12_k = linesearch_costs_pallas(env12, X12, U12, pol12, alphas_r)
    with jax.default_matmul_precision("highest"):
        J12_r = jax.jit(jax.vmap(
            lambda x, u, p: jax.vmap(lambda a: forward(env12, x, u, p, a)[2])(
                jnp.asarray(alphas_r, X12.dtype)
            )
        ))(X12, U12, pol12)
    dev_c12 = float(jnp.max(jnp.abs(J12_k - J12_r) / (jnp.abs(J12_r) + 1.0)))
    checks.append((
        f"costs kernel n=12 B=2048 TB=10 compiles past 16MB VMEM + matches "
        f"XLA line search (rel dev {dev_c12:.2e})",
        dev_c12 < 1e-4,
    ))

    from tfmpc_tpu.models.registry import load_env as _load_env
    import os as _os

    env16 = _load_env(_os.path.join(
        _os.path.dirname(__file__), "..", "configs", "hvac16.json"
    ))
    B16, T16 = 512, 50
    x0_16 = jnp.asarray(rng_r.uniform(8, 18, size=(B16, 16)).astype("f4"))
    U16 = env16.clip(jnp.asarray(
        rng_r.uniform(0, 2, size=(B16, T16, 16)).astype("f4")
    ))
    with jax.default_matmul_precision("highest"):
        X16, _ = jax.jit(jax.vmap(env16.rollout))(x0_16, U16)
    pol16 = Policy(
        K=jnp.asarray(
            0.02 * rng_r.standard_normal((B16, T16, 16, 16)).astype("f4")
        ),
        k=jnp.asarray(
            0.05 * rng_r.standard_normal((B16, T16, 16)).astype("f4")
        ),
    )
    av16 = jnp.asarray(
        rng_r.choice([1.0, 0.5, 0.25], size=(B16,)).astype("f4")
    )
    Xk16, Uk16, Jk16 = rollout_alpha_pallas(env16, X16, U16, pol16, av16)
    with jax.default_matmul_precision("highest"):
        Xr16, Ur16, Jr16 = jax.jit(jax.vmap(
            lambda x, u, p, a: forward(env16, x, u, p, a)
        ))(X16, U16, pol16, av16)
    dev_m16 = float(jnp.max(jnp.abs(Uk16 - Ur16)))
    checks.append((
        f"materialize kernel n=16 B=512 compiles past 16MB VMEM + matches "
        f"XLA rollout (max U dev {dev_m16:.2e})",
        dev_m16 < 1e-3,
    ))

    # config 3b: HVAC-16 convergence through the mid-dim kernels at the
    # suite's exact config (round-3 VERDICT weak #5: 0.982 was the only
    # below-1.0 ladder number and nothing gated it; the unconverged tail
    # is still-iterating lanes, not mu_max failures — see
    # benchmarks/hvac16_investigate.py output in PARITY.md).
    r3b = ilqr.solve_batch(
        env16,
        jnp.asarray(
            np.random.default_rng(0).uniform(8, 18, size=(512, 16))
            .astype("f4")
        ),
        horizon=50,
        config=ilqr.ILQRConfig(
            atol=1e-2, max_iterations=20, boxqp=True, use_pallas=True
        ),
    )
    frac3b = float(jnp.mean(r3b.converged.astype("f4")))
    fail3b = int(jnp.sum(r3b.failed.astype("i4")))
    checks.append((
        f"config3b HVAC-16 mid-dim solve: >=0.98 converged, 0 mu_max "
        f"failures (measured {frac3b:.3f}, {fail3b} failed)",
        frac3b >= 0.98 and fail3b == 0,
    ))

    # config 4: reservoir long horizon, anchored to the fp64 DDP oracle
    # (round-2 VERDICT missing #5: convergence flags alone assumed away
    # SURVEY §7.3's fp32-precision-at-T=500 risk; the oracle quantifies
    # it — see tests/test_oracle_parity.py::TestReservoirT500Oracle).
    from oracles import (
        _res_cost_np, _res_step_np, ilqr_reservoir_boxqp_oracle_np,
        reservoir_grad_np, reservoir_params_np,
    )

    x0r = [95.0, 80.0, 60.0, 40.0, 20.0]
    rr = ilqr.solve(
        make_reservoir(5), jnp.asarray(x0r), horizon=500,
        config=ilqr.ILQRConfig(atol=1e-8, max_iterations=100, boxqp=True),
    )
    checks.append(("config4 reservoir T=500 converges", bool(rr.converged)))
    pr = reservoir_params_np(5)
    _, _, J_r64 = ilqr_reservoir_boxqp_oracle_np(pr, x0r, 500, atol=1e-9)
    U_r32 = np.asarray(rr.actions, float)
    x_r, J_r32 = np.asarray(x0r, float), 0.0
    for t in range(500):
        J_r32 += _res_cost_np(pr, x_r)
        x_r = _res_step_np(pr, x_r, U_r32[t])
    J_r32 += _res_cost_np(pr, x_r)
    cost_rel_r = abs(J_r32 - J_r64) / abs(J_r64)
    g_r = reservoir_grad_np(pr, x0r, U_r32)
    kkt_r = float(np.abs(
        U_r32 - np.clip(U_r32 - g_r, pr["low"], pr["high"])
    ).max())
    checks.append((
        f"config4 reservoir T=500 vs fp64 oracle: cost rel dev <1e-5 "
        f"(measured {cost_rel_r:.2e})",
        cost_rel_r < 1e-5,
    ))
    checks.append((
        f"config4 reservoir T=500 KKT residual in fp64 model <2e-2 "
        f"(measured {kkt_r:.2e})",
        kkt_r < 2e-2,
    ))

    # emit-traj AUTO (round 5): at T=500 the default config resolves the
    # single-chain line-search layout ON (measured 1.042x over two-kernel,
    # docs/sweeps/r5_emit_traj.md); pin on chip that the AUTO default equals
    # the pinned two-kernel layout solve-for-solve.
    envr = make_reservoir(5)
    x0rb = jnp.asarray(
        np.random.default_rng(5).uniform(20, 100, size=(128, 5)).astype("f4")
    )
    cfg_auto = ilqr.ILQRConfig(
        atol=1e-3, max_iterations=10, boxqp=True, use_pallas=True
    )
    assert cfg_auto.linesearch_emit_trajectories is None  # AUTO is default
    r_auto = ilqr.solve_batch(envr, x0rb, horizon=500, config=cfg_auto)
    r_twok = ilqr.solve_batch(
        envr, x0rb, horizon=500,
        config=dataclasses.replace(
            cfg_auto, linesearch_emit_trajectories=False
        ),
    )
    dev_et = float(jnp.max(
        jnp.abs(r_auto.total_cost - r_twok.total_cost)
        / (jnp.abs(r_twok.total_cost) + 1.0)
    ))
    checks.append((
        f"emit-traj AUTO default (T=500) == pinned two-kernel layout "
        f"(cost rel dev {dev_et:.2e})",
        dev_et < 1e-5
        and bool(jnp.all(r_auto.converged == r_twok.converged)),
    ))

    # config 5: device-sharded batched solve
    x0s = jnp.asarray(
        np.random.default_rng(1).uniform(-4, 4, size=(256, 2)).astype("f4")
    )
    rs = pmesh.solve_ilqr_sharded(
        env, x0s, horizon=50,
        config=ilqr.ILQRConfig(atol=1e-4, max_iterations=40, use_pallas=True),
    )
    frac5 = float(jnp.mean(rs.converged.astype("f4")))
    checks.append((
        f"config5 sharded solve: >=99% converged (measured {frac5:.3f})",
        frac5 >= 0.99,
    ))

    # superset: closed-loop MPC and LinearSystem == exact LQR
    rm = mpc.run(
        env, jnp.zeros(2), steps=20, plan_horizon=10,
        config=ilqr.ILQRConfig(atol=1e-6, max_iterations=20),
    )
    checks.append((
        "MPC closed loop reaches goal",
        float(jnp.linalg.norm(rm.states[-1] - jnp.array([8.0, -5.0]))) < 1e-2,
    ))
    envl = make_linear_system(
        A=[[1.0, 0.1], [0.0, 1.0]], B=[[0.005], [0.1]], R=[[0.01]]
    )
    rl = ilqr.solve(
        envl, jnp.asarray([3.0, -1.0]), horizon=40,
        config=ilqr.ILQRConfig(atol=1e-12, max_iterations=50),
    )
    _, aL, _ = lqr.solve(envl.to_lqr_problem(40), jnp.asarray([3.0, -1.0]))
    checks.append((
        "LinearSystem iLQR == exact LQR (<1e-4)",
        float(jnp.max(jnp.abs(rl.actions - aL))) < 1e-4,
    ))

    # dims past the kernel ceiling (>48): BOTH kernel families must fall
    # back (Riccati to the vmapped scan, rollouts to the XLA line search)
    # and the default use_pallas solve must still run ON CHIP.
    k = 49
    A49 = (-2.0 * np.eye(k) + np.eye(k, k=1) + np.eye(k, k=-1)) * 0.3
    envb = make_linear_system(
        A=(np.eye(k) + 0.1 * A49).tolist(),
        B=(0.1 * np.eye(k)).tolist(),
        R=(0.1 * np.eye(k)).tolist(),
    )
    x49 = jnp.asarray(
        np.random.default_rng(0).uniform(-1, 1, size=(128, k)).astype("f4")
    )
    r49 = ilqr.solve_batch(
        envb, x49, horizon=4,
        config=ilqr.ILQRConfig(atol=1e-6, max_iterations=6, use_pallas=True),
    )
    checks.append((
        "dims>48 full-XLA fallback solves on chip (finite, all converged)",
        bool(jnp.all(jnp.isfinite(r49.total_cost)))
        and float(jnp.mean(r49.converged.astype("f4"))) >= 0.99,
    ))

    failed = 0
    for name, passed in checks:
        print(("PASS " if passed else "FAIL ") + name, flush=True)
        failed += 0 if passed else 1
    if failed:
        print(f"RELEASE CHECK: {failed} claim(s) FAILED")
        return 1
    print(
        f"RELEASE CHECK: all {len(checks)} claims verified on "
        f"{jax.devices()[0].platform}"
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
