"""Rollout-kernel VMEM working-set envelope (ops/rollout_pallas.py).

Round-3 VERDICT task 1: the line-search/materialize kernels measurably
overflowed Mosaic's default 16 MB scoped-VMEM stack at configs adjacent to
the shipped ones (costs kernel n=m=12/BB=1024/TB=10 -> 17.96 MB; materialize
n=m=16/BB=512/TB=10 -> 16.72 MB, /tmp/onchip_sweep_r3.log), and
``with_kernel_fallback`` converted the compile failure into a silent
~10-100x XLA perf cliff. These tests pin the planner that now mirrors the
mid Riccati kernel's ``_mid_vmem_limit`` treatment:

- shipped headline configs keep the compiler default (no behavior change);
- the two measured reproducers get the raised ``vmem_limit_bytes`` WITHOUT
  backing off TB/BB (time-blocking is a measured +20% win, CLAUDE.md);
- genuinely enormous working sets back off TB first, then BB (>=128);
- the calibrated estimator flags both measured on-chip failures as over
  the default budget (regression pin for the calibration itself).

The kernels themselves run under Pallas interpret mode on CPU where the
limit is inert; the on-chip compile proof lives in the release gate
(benchmarks/release_check.py, rollout-kernel claims at n=12/B=2048 and
n=16/B=512).
"""

import jax
import jax.numpy as jnp
import numpy as np

from tfmpc_tpu.ops.rollout_pallas import (
    _ROLLOUT_DEFAULT_BUDGET,
    _ROLLOUT_RAISED_SAFE,
    _ROLLOUT_RAISED_VMEM,
    _plan_blocks,
    _rollout_plan,
    _rollout_vmem_bytes,
)


class TestEstimatorCalibration:
    def test_measured_costs_failure_is_over_default_budget(self):
        # hvac12 profile reproducer: n=m=12, BB=1024, TB=10 — at the
        # 11-alpha grid the failing run actually used (ILQRConfig default;
        # the measured 17.96 MB is 17.6% over the raw A=11 model)
        est = _rollout_vmem_bytes("costs", 10, 1024, 12, 12, 11, 200)
        assert est > _ROLLOUT_DEFAULT_BUDGET

    def test_measured_materialize_failure_is_over_default_budget(self):
        # hvac16 profile reproducer: n=m=16, BB=512, TB=10
        est = _rollout_vmem_bytes("materialize", 10, 512, 16, 16, 1, 300)
        assert est > _ROLLOUT_DEFAULT_BUDGET

    def test_monotone_in_tb_and_bb(self):
        base = _rollout_vmem_bytes("costs", 5, 512, 8, 8, 8, 100)
        assert _rollout_vmem_bytes("costs", 10, 512, 8, 8, 8, 100) > base
        assert _rollout_vmem_bytes("costs", 5, 1024, 8, 8, 8, 100) > base

    def test_derivs_counts_derivative_blocks(self):
        plain = _rollout_vmem_bytes("materialize", 2, 512, 6, 6, 1, 100)
        derivs = _rollout_vmem_bytes("derivs", 2, 512, 6, 6, 1, 100)
        assert derivs > plain

    def test_costs_traj_counts_all_alpha_blocks(self):
        costs = _rollout_vmem_bytes("costs", 2, 512, 6, 6, 11, 100)
        traj = _rollout_vmem_bytes("costs_traj", 2, 512, 6, 6, 11, 100)
        # emits 11 trajectories' worth of X/U blocks on top of the costs
        assert traj > costs + 2 * 2 * 11 * (6 + 6) * 512 * 4


class TestPlanner:
    def test_headline_nav_keeps_default(self):
        # navigation n=m=2, B=4096: the headline config must not change
        BB, TB, limit = _rollout_plan("costs", 4096, 100, 2, 2, 8, 50)
        assert BB == 1024 and limit is None

    def test_hvac6_keeps_default(self):
        BB, TB, limit = _rollout_plan("costs", 2048, 100, 6, 6, 8, 150)
        assert BB == 1024 and limit is None

    def test_hvac12_costs_raises_limit_without_backoff(self):
        # the measured reproducer: fits the raised budget at full TB/BB
        BB, TB, limit = _rollout_plan(
            "costs", 2048, 100, 12, 12, 8, 200, time_block=10
        )
        assert BB == 1024 and TB == 10
        assert limit == _ROLLOUT_RAISED_VMEM

    def test_hvac16_materialize_raises_limit_without_backoff(self):
        BB, TB, limit = _rollout_plan(
            "materialize", 512, 50, 16, 16, 1, 300, time_block=10
        )
        assert BB == 512 and TB == 10
        assert limit == _ROLLOUT_RAISED_VMEM

    def test_enormous_working_set_backs_off_tb_then_bb(self):
        # Drive the pure planning loop directly (on the CPU test backend
        # _choose_tb pins TB=1, so going through _rollout_plan never
        # reaches the backoff path — it was previously pinned vacuously).
        # n=m=48 costs from TB=10/BB=1024: even the raised budget
        # overflows, so TB must shrink first (to a divisor of T), then BB.
        BB, TB, limit = _plan_blocks("costs", 4096, 100, 48, 48, 11, 500,
                                     10, 1024)
        assert TB < 10 and 100 % TB == 0
        est = _rollout_vmem_bytes("costs", TB, BB, 48, 48, 11, 500)
        assert est <= _ROLLOUT_RAISED_SAFE
        assert limit == _ROLLOUT_RAISED_VMEM
        # derivs at n=m=48, TB already 1: only BB can shrink — and it must
        # land on a 128-multiple divisor of B, not a naive halving
        BB2, TB2, limit2 = _plan_blocks("derivs", 4096, 100, 48, 48, 1,
                                        500, 1, 1024)
        assert TB2 == 1 and BB2 == 256 and 4096 % BB2 == 0
        assert limit2 == _ROLLOUT_RAISED_VMEM

    def test_bb_backoff_keeps_128_multiple_divisors(self):
        # B=640: halving 640 -> 320 would break the 128-lane-multiple
        # invariant (320 = 2.5 x 128); the only legal smaller divisor is
        # 128.
        BB, _, _ = _plan_blocks("derivs", 640, 100, 48, 48, 1, 500, 1, 640)
        assert BB == 128
        # B=96 has no 128-multiple divisor: even with a working set past
        # the safe raised budget (inflated params), BB must NOT shrink —
        # the raised limit + Mosaic's allocator arbitrate instead.
        BB96, _, lim96 = _plan_blocks("derivs", 96, 100, 48, 48, 1,
                                      30_000_000, 1, 96)
        assert BB96 == 96 and lim96 == _ROLLOUT_RAISED_VMEM

    def test_explicit_time_block_is_honored(self):
        BB, TB, _ = _rollout_plan("costs", 512, 100, 48, 48, 8, 500,
                                  time_block=5)
        assert TB == 5

    def test_bb_always_divides_b(self):
        for B in (128, 512, 2048, 4096):
            for d in (2, 12, 24, 48):
                BB, TB, _ = _rollout_plan("costs", B, 100, d, d, 8, 100)
                assert B % BB == 0 and BB >= 128


def test_kernels_run_under_planned_params(rng):
    """The wired-up kernels still match the XLA reference after planning
    (interpret mode; exercises the new plan codepath end-to-end)."""
    from tfmpc_tpu.core.types import Policy
    from tfmpc_tpu.models.hvac import make_hvac
    from tfmpc_tpu.ops.rollout_pallas import (
        linesearch_costs_pallas,
        rollout_alpha_pallas,
    )
    from tfmpc_tpu.solvers.ilqr import forward

    env = make_hvac(
        [[0, 1, 0], [1, 0, 1], [0, 1, 0]], is_out=[1, 0, 1], is_hall=[0, 1, 0]
    )
    B, T, n, m = 128, 6, 3, 3
    x0 = jnp.asarray(rng.uniform(8, 18, size=(B, n)).astype("f4"))
    U = env.clip(jnp.asarray(rng.uniform(0, 2, size=(B, T, m)).astype("f4")))
    X, _ = jax.vmap(env.rollout)(x0, U)
    policy = Policy(
        K=jnp.asarray(0.05 * rng.standard_normal((B, T, m, n)).astype("f4")),
        k=jnp.asarray(0.1 * rng.standard_normal((B, T, m)).astype("f4")),
    )
    alphas = (1.0, 0.5)
    J = linesearch_costs_pallas(env, X, U, policy, alphas)
    J_ref = jax.vmap(
        lambda x, u, p: jax.vmap(lambda a: forward(env, x, u, p, a)[2])(
            jnp.asarray(alphas, X.dtype)
        )
    )(X, U, policy)
    np.testing.assert_allclose(np.asarray(J), np.asarray(J_ref),
                               rtol=2e-5, atol=1e-2)
    av = jnp.ones((B,), jnp.float32)
    X_k, U_k, J_k = rollout_alpha_pallas(env, X, U, policy, av)
    X_r, U_r, J_r = jax.vmap(lambda x, u, p: forward(env, x, u, p, 1.0))(
        X, U, policy
    )
    np.testing.assert_allclose(np.asarray(U_k), np.asarray(U_r),
                               rtol=2e-5, atol=1e-4)
