"""One-sweep on-chip verification of every headline claim.

Run on the real TPU backend (see .claude/skills/verify/SKILL.md for the
PYTHONPATH recipe); prints PASS/FAIL per claim and exits nonzero on any
failure. Covers the five BASELINE configs plus the superset features
(MPC driver, LinearSystem == exact LQR).
"""

import sys

import jax
import jax.numpy as jnp
import numpy as np


def main():
    sys.path.insert(0, "tests")  # fp64 NumPy oracles
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

    # config 2: iLQR accuracy vs the independent fp64 oracle
    _, U_np, _ = ilqr_navigation_oracle_np(
        [8.0, -5.0], [[3.0, -2.0]], [2.0], [0.0, 0.0], 20, atol=1e-10
    )
    env = make_navigation(
        goal=[8.0, -5.0], deceleration={"center": [[3.0, -2.0]], "decay": [2.0]}
    )
    r = ilqr.solve(
        env, jnp.zeros(2), horizon=20,
        config=ilqr.ILQRConfig(atol=1e-10, max_iterations=200),
    )
    checks.append((
        "config2 control deviation vs fp64 oracle <1e-4",
        float(np.max(np.abs(np.asarray(r.actions) - U_np))) < 1e-4,
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
    checks.append((
        "config3 HVAC boxQP fused: 100% converged",
        float(jnp.mean(rh.converged.astype("f4"))) == 1.0,
    ))

    # config 4: reservoir long horizon
    rr = ilqr.solve(
        make_reservoir(5), jnp.asarray([95.0, 80.0, 60.0, 40.0, 20.0]),
        horizon=500,
        config=ilqr.ILQRConfig(atol=1e-3, max_iterations=40, boxqp=True),
    )
    checks.append(("config4 reservoir T=500 converges", bool(rr.converged)))

    # config 5: device-sharded batched solve
    x0s = jnp.asarray(
        np.random.default_rng(1).uniform(-4, 4, size=(256, 2)).astype("f4")
    )
    rs = pmesh.solve_ilqr_sharded(
        env, x0s, horizon=50,
        config=ilqr.ILQRConfig(atol=1e-4, max_iterations=40, use_pallas=True),
    )
    checks.append((
        "config5 sharded solve: 100% converged",
        float(jnp.mean(rs.converged.astype("f4"))) == 1.0,
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
