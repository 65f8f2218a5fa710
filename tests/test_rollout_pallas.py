"""Fused line-search rollout kernel parity (ops/rollout_pallas.py).

Pins, for every env family implementing ``lane_functions`` (navigation,
HVAC, reservoir — the latter two are the box-constrained kernel path,
BASELINE configs 3/4):

- lane-major step/final functions match the public transition/cost API;
- ``linesearch_costs_pallas`` matches the XLA line-search costs;
- ``rollout_alpha_pallas`` matches the XLA closed-loop rollout at
  per-scenario step sizes;
- end-to-end: ``use_pallas=True`` solves match the XLA path.

Runs in Pallas interpret mode on the CPU test mesh; the same code compiles
through Mosaic on TPU (driven by the verify recipe / bench).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tfmpc_tpu.models.hvac import make_hvac
from tfmpc_tpu.models.navigation import make_navigation
from tfmpc_tpu.models.reservoir import make_reservoir
from tfmpc_tpu.ops.rollout_pallas import (
    linesearch_costs_pallas,
    linesearch_costs_traj_pallas,
    rollout_alpha_pallas,
    select_alpha_trajectory,
)
from tfmpc_tpu.solvers import ilqr
from tfmpc_tpu.solvers.ilqr import forward
from tfmpc_tpu.core.types import Policy


def _envs():
    return {
        "navigation": make_navigation(
            goal=[8.0, -5.0],
            deceleration={"center": [[3.0, -2.0]], "decay": [2.0]},
        ),
        "hvac": make_hvac(
            [[0, 1, 0], [1, 0, 1], [0, 1, 0]],
            is_out=[1, 0, 1],
            is_hall=[0, 1, 0],
        ),
        "reservoir": make_reservoir(4),
    }


ENVS = _envs()


def _x0_batch(env, B, rng):
    n = env.state_size
    if isinstance(env, type(ENVS["hvac"])) and hasattr(env, "temp_low"):
        return jnp.asarray(rng.uniform(8.0, 18.0, size=(B, n)).astype("f4"))
    if hasattr(env, "max_capacity"):
        return jnp.asarray(rng.uniform(20.0, 95.0, size=(B, n)).astype("f4"))
    return jnp.asarray(rng.uniform(-6.0, 6.0, size=(B, n)).astype("f4"))


@pytest.mark.parametrize("name", sorted(ENVS))
class TestLaneParity:
    def test_step_and_final_match_public_api(self, name, rng):
        env = ENVS[name]
        lane = env.lane_functions()
        assert lane is not None
        params, step_fn, final_fn = lane
        n, m, L = env.state_size, env.action_size, 16
        x = jnp.asarray(_x0_batch(env, L, rng))          # [L, n]
        u = jnp.asarray(rng.uniform(0.0, 3.0, size=(L, m)).astype("f4"))

        x_next_lane, cost_lane = step_fn(params, x.T, u.T)
        x_next_ref = jax.vmap(env.transition)(x, u)
        cost_ref = jax.vmap(env.cost)(x, u)
        np.testing.assert_allclose(
            np.asarray(x_next_lane.T), np.asarray(x_next_ref),
            rtol=1e-5, atol=1e-5,
        )
        np.testing.assert_allclose(
            np.asarray(cost_lane), np.asarray(cost_ref), rtol=1e-5, atol=1e-4
        )
        final_lane = final_fn(params, x.T)
        final_ref = jax.vmap(env.final_cost)(x)
        np.testing.assert_allclose(
            np.asarray(final_lane), np.asarray(final_ref),
            rtol=1e-5, atol=1e-4,
        )


@pytest.mark.parametrize("name", sorted(ENVS))
class TestKernelParity:
    B, T = 128, 12

    def _setup(self, name, rng):
        env = ENVS[name]
        n, m = env.state_size, env.action_size
        x0 = _x0_batch(env, self.B, rng)
        U = env.clip(
            jnp.asarray(
                rng.uniform(0.0, 2.0, size=(self.B, self.T, m)).astype("f4")
            )
        )
        X, _ = jax.vmap(env.rollout)(x0, U)
        K = jnp.asarray(
            0.05 * rng.standard_normal((self.B, self.T, m, n)).astype("f4")
        )
        k = jnp.asarray(
            0.1 * rng.standard_normal((self.B, self.T, m)).astype("f4")
        )
        return env, X, U, Policy(K=K, k=k)

    def test_linesearch_costs(self, name, rng):
        env, X, U, policy = self._setup(name, rng)
        alphas = (1.0, 0.5, 0.1)
        J_kernel = linesearch_costs_pallas(env, X, U, policy, alphas)
        J_ref = jax.vmap(
            lambda x, u, p: jax.vmap(
                lambda a: forward(env, x, u, p, a)[2]
            )(jnp.asarray(alphas, X.dtype))
        )(X, U, policy)
        np.testing.assert_allclose(
            np.asarray(J_kernel), np.asarray(J_ref), rtol=2e-5, atol=1e-2
        )

    def test_costs_traj_matches_costs_and_materialize(self, name, rng):
        """The trajectory-emitting costs kernel returns the SAME costs as
        the costs-only kernel, and selecting any alpha index from its
        emitted blocks reproduces the materialize kernel's rollout."""
        env, X, U, policy = self._setup(name, rng)
        alphas = (1.0, 0.5, 0.1)
        J_all, X_all, U_all = linesearch_costs_traj_pallas(
            env, X, U, policy, alphas
        )
        J_costs = linesearch_costs_pallas(env, X, U, policy, alphas)
        np.testing.assert_allclose(
            np.asarray(J_all), np.asarray(J_costs), rtol=1e-6
        )
        best = jnp.asarray(rng.integers(0, len(alphas), size=(self.B,)))
        X_sel, U_sel, J_sel = select_alpha_trajectory(
            X, X_all, U_all, J_all, best
        )
        alpha_vec = jnp.asarray(alphas, X.dtype)[best]
        X_mat, U_mat, J_mat = rollout_alpha_pallas(
            env, X, U, policy, alpha_vec
        )
        np.testing.assert_allclose(
            np.asarray(X_sel), np.asarray(X_mat), rtol=1e-6, atol=1e-6
        )
        np.testing.assert_allclose(
            np.asarray(U_sel), np.asarray(U_mat), rtol=1e-6, atol=1e-6
        )
        np.testing.assert_allclose(
            np.asarray(J_sel), np.asarray(J_mat), rtol=1e-6
        )

    def test_rollout_alpha(self, name, rng):
        env, X, U, policy = self._setup(name, rng)
        alpha_vec = jnp.asarray(
            rng.choice([1.0, 0.5, 0.25], size=(self.B,)).astype("f4")
        )
        X_k, U_k, J_k = rollout_alpha_pallas(env, X, U, policy, alpha_vec)
        X_r, U_r, J_r = jax.vmap(
            lambda x, u, p, a: forward(env, x, u, p, a)
        )(X, U, policy, alpha_vec)
        np.testing.assert_allclose(
            np.asarray(U_k), np.asarray(U_r), rtol=2e-5, atol=1e-4
        )
        np.testing.assert_allclose(
            np.asarray(X_k), np.asarray(X_r), rtol=2e-5, atol=1e-3
        )
        np.testing.assert_allclose(
            np.asarray(J_k), np.asarray(J_r), rtol=2e-5, atol=1e-2
        )


@pytest.mark.parametrize("name", ["hvac", "reservoir"])
def test_solve_batch_fused_matches_xla(name, rng):
    """End-to-end: the fused-kernel solve tracks the XLA solve."""
    env = ENVS[name]
    B = 128  # lane-aligned so the fused path actually engages
    x0 = _x0_batch(env, B, rng)
    # boxqp: these envs saturate their bounds at cold starts, where clip-mode
    # stalls borderline-randomly (flags would disagree for reasons unrelated
    # to the kernels); the fused rollout composes with the boxqp backward
    base = dict(atol=1e-3, max_iterations=30, boxqp=True)
    res_xla = ilqr.solve_batch(
        env, x0, horizon=10, config=ilqr.ILQRConfig(**base)
    )
    res_fused = ilqr.solve_batch(
        env, x0, horizon=10, config=ilqr.ILQRConfig(**base, use_pallas=True)
    )
    # fp32 accumulation-order differences can flip a line-search branch for
    # the odd scenario; same basin is what's pinned
    np.testing.assert_allclose(
        np.asarray(res_fused.total_cost),
        np.asarray(res_xla.total_cost),
        rtol=1e-3,
    )
    assert (
        np.asarray(res_fused.converged) == np.asarray(res_xla.converged)
    ).mean() > 0.95


class TestGenericLaneAdapter:
    """User-defined envs (reference DiffEnv's open extension point) get the
    fused rollout path via the auto-derived lane adapter — round-1 VERDICT:
    they silently fell back to the XLA path."""

    def _custom_env(self):
        from typing import Optional

        from tfmpc_tpu.core.types import Bounds, pytree_dataclass
        from tfmpc_tpu.models.base import Env

        @pytree_dataclass
        class DampedOscillator(Env):
            """Test-only user env: only the public API, no lane_functions."""

            stiffness: jax.Array
            damping: jax.Array
            bounds: Optional[Bounds] = None

            @property
            def state_size(self):
                return 2

            @property
            def action_size(self):
                return 1

            def transition(self, x, u):
                pos, vel = x[0], x[1]
                acc = -self.stiffness * pos - self.damping * vel + u[0]
                return jnp.stack([pos + 0.1 * vel, vel + 0.1 * acc])

            def cost(self, x, u):
                return jnp.sum(x * x) + 0.1 * jnp.sum(u * u)

            def final_cost(self, x):
                return 10.0 * jnp.sum(x * x)

        return DampedOscillator(
            stiffness=jnp.asarray(4.0, jnp.float32),
            damping=jnp.asarray(0.4, jnp.float32),
            bounds=Bounds(
                low=jnp.asarray([-2.0], jnp.float32),
                high=jnp.asarray([2.0], jnp.float32),
            ),
        )

    def test_kernel_parity(self, rng):
        env = self._custom_env()
        assert env.lane_functions() is not None
        B, T, n, m = 128, 8, 2, 1
        x0 = jnp.asarray(rng.uniform(-2, 2, size=(B, n)).astype("f4"))
        U = env.clip(
            jnp.asarray(rng.uniform(-1, 1, size=(B, T, m)).astype("f4"))
        )
        X, _ = jax.vmap(env.rollout)(x0, U)
        policy = Policy(
            K=jnp.asarray(0.05 * rng.standard_normal((B, T, m, n)).astype("f4")),
            k=jnp.asarray(0.1 * rng.standard_normal((B, T, m)).astype("f4")),
        )
        alphas = (1.0, 0.5)
        J_kernel = linesearch_costs_pallas(env, X, U, policy, alphas)
        J_ref = jax.vmap(
            lambda x, u, p: jax.vmap(
                lambda a: forward(env, x, u, p, a)[2]
            )(jnp.asarray(alphas, X.dtype))
        )(X, U, policy)
        np.testing.assert_allclose(
            np.asarray(J_kernel), np.asarray(J_ref), rtol=2e-5, atol=1e-3
        )

    def test_end_to_end_with_ragged_batch(self, rng):
        """Custom env + B=100 (ragged): padding + generic adapter together."""
        env = self._custom_env()
        B = 100
        x0 = jnp.asarray(rng.uniform(-2, 2, size=(B, 2)).astype("f4"))
        base = dict(atol=1e-5, max_iterations=30, boxqp=True)
        res_xla = ilqr.solve_batch(
            env, x0, horizon=10, config=ilqr.ILQRConfig(**base)
        )
        res_fused = ilqr.solve_batch(
            env, x0, horizon=10,
            config=ilqr.ILQRConfig(**base, use_pallas=True),
        )
        assert res_fused.actions.shape == (B, 10, 1)
        np.testing.assert_allclose(
            np.asarray(res_fused.total_cost),
            np.asarray(res_xla.total_cost),
            rtol=1e-4,
        )

    def test_zone_free_navigation_zero_size_leaf(self, rng):
        """Zero-size param leaves (centers [0, n]) are dropped from the
        kernel inputs and reconstituted inside — the kernel still runs."""
        env = make_navigation(goal=[2.0, 1.0])  # no deceleration zones
        B, T = 128, 6
        x0 = jnp.asarray(rng.uniform(-3, 3, size=(B, 2)).astype("f4"))
        U = jnp.asarray(rng.uniform(-1, 1, size=(B, T, 2)).astype("f4"))
        X, _ = jax.vmap(env.rollout)(x0, U)
        policy = Policy(
            K=jnp.zeros((B, T, 2, 2), jnp.float32),
            k=jnp.zeros((B, T, 2), jnp.float32),
        )
        J = linesearch_costs_pallas(env, X, U, policy, (1.0,))
        J_ref = jax.vmap(lambda x, u, p: forward(env, x, u, p, 1.0)[2])(
            X, U, policy
        )
        np.testing.assert_allclose(
            np.asarray(J[:, 0]), np.asarray(J_ref), rtol=2e-5, atol=1e-3
        )


def test_time_blocked_materialize_matches_per_step(rng):
    """TB>1 buffered-store materialize is a pure reindexing of TB=1
    (ADVICE round 1: this variant only ever ran on TPU, unpinned)."""
    env = ENVS["navigation"]
    B, T = 128, 4
    n = m = 2
    x0 = _x0_batch(env, B, rng)
    U = jnp.asarray(rng.uniform(-1, 1, size=(B, T, m)).astype("f4"))
    X, _ = jax.vmap(env.rollout)(x0, U)
    policy = Policy(
        K=jnp.asarray(0.05 * rng.standard_normal((B, T, m, n)).astype("f4")),
        k=jnp.asarray(0.1 * rng.standard_normal((B, T, m)).astype("f4")),
    )
    alpha_vec = jnp.asarray(rng.choice([1.0, 0.5], size=(B,)).astype("f4"))
    out1 = rollout_alpha_pallas(env, X, U, policy, alpha_vec, time_block=1)
    out2 = rollout_alpha_pallas(env, X, U, policy, alpha_vec, time_block=2)
    for a1, a2 in zip(out1, out2):
        np.testing.assert_allclose(np.asarray(a2), np.asarray(a1), rtol=1e-6)


def test_select_alpha_trajectory_is_nan_safe():
    """A diverged (inf/NaN) candidate must not poison scenarios that
    selected a DIFFERENT alpha — the reason selection is a where-chain
    and not a one-hot contraction (0 * inf = nan)."""
    T, A, n, m, B = 3, 2, 2, 1, 4
    X_all = jnp.ones((T, A, n, B))
    U_all = jnp.ones((T, A, m, B))
    # candidate alpha 0 diverged for every scenario
    X_all = X_all.at[:, 0].set(jnp.nan)
    U_all = U_all.at[:, 0].set(jnp.inf)
    J_all = jnp.stack([jnp.full((B,), jnp.inf), jnp.full((B,), 2.0)], axis=1)
    best = jnp.array([1, 1, 1, 1])
    X0 = jnp.zeros((B, T + 1, n))
    X_sel, U_sel, J_sel = select_alpha_trajectory(X0, X_all, U_all, J_all, best)
    assert np.isfinite(np.asarray(X_sel)).all()
    assert np.isfinite(np.asarray(U_sel)).all()
    np.testing.assert_array_equal(np.asarray(J_sel), 2.0)


def test_time_blocked_costs_traj_match_per_step(rng):
    """TB>1 buffered-store all-alpha emission is a pure reindexing of TB=1."""
    env = ENVS["navigation"]
    B, T = 128, 4
    n = m = 2
    x0 = _x0_batch(env, B, rng)
    U = jnp.asarray(rng.uniform(-1, 1, size=(B, T, m)).astype("f4"))
    X, _ = jax.vmap(env.rollout)(x0, U)
    policy = Policy(
        K=jnp.asarray(0.05 * rng.standard_normal((B, T, m, n)).astype("f4")),
        k=jnp.asarray(0.1 * rng.standard_normal((B, T, m)).astype("f4")),
    )
    alphas = (1.0, 0.5)
    out1 = linesearch_costs_traj_pallas(env, X, U, policy, alphas, time_block=1)
    out2 = linesearch_costs_traj_pallas(env, X, U, policy, alphas, time_block=2)
    for a1, a2 in zip(out1, out2):
        np.testing.assert_allclose(np.asarray(a2), np.asarray(a1), rtol=1e-6)


def test_solve_batch_emit_trajectories_matches_two_kernel_path(rng):
    """End-to-end: linesearch_emit_trajectories=True solves land in the
    same basin as the two-kernel fused path. The selected trajectory is
    the same arithmetic as the re-rolled one op-for-op, but the two kernel
    graphs differ in surrounding ops, so compiler FMA/fusion choices can
    flip a borderline line-search acceptance for the odd lane (measured:
    1/128 lanes, 4.5e-6 rel) — same tolerance story as
    test_solve_batch_fused_matches_xla."""
    env = ENVS["hvac"]
    B = 128
    x0 = _x0_batch(env, B, rng)
    base = dict(atol=1e-3, max_iterations=20, boxqp=True, use_pallas=True)
    res_two = ilqr.solve_batch(
        env, x0, horizon=8, config=ilqr.ILQRConfig(**base)
    )
    res_emit = ilqr.solve_batch(
        env, x0, horizon=8,
        config=ilqr.ILQRConfig(**base, linesearch_emit_trajectories=True),
    )
    np.testing.assert_allclose(
        np.asarray(res_emit.total_cost), np.asarray(res_two.total_cost),
        rtol=1e-4,
    )
    assert (
        np.asarray(res_emit.converged) == np.asarray(res_two.converged)
    ).mean() > 0.95


def test_time_blocked_costs_match_per_step(rng):
    """TB>1 (the TPU pipelining layout) is a pure reindexing of TB=1."""
    env = ENVS["navigation"]
    B, T = 128, 4
    n = m = 2
    x0 = _x0_batch(env, B, rng)
    U = jnp.asarray(rng.uniform(-1, 1, size=(B, T, m)).astype("f4"))
    X, _ = jax.vmap(env.rollout)(x0, U)
    policy = Policy(
        K=jnp.asarray(0.05 * rng.standard_normal((B, T, m, n)).astype("f4")),
        k=jnp.asarray(0.1 * rng.standard_normal((B, T, m)).astype("f4")),
    )
    alphas = (1.0, 0.5)
    J1 = linesearch_costs_pallas(env, X, U, policy, alphas, time_block=1)
    J2 = linesearch_costs_pallas(env, X, U, policy, alphas, time_block=2)
    np.testing.assert_allclose(np.asarray(J2), np.asarray(J1), rtol=1e-6)


def test_emit_trajectories_auto_resolution():
    """AUTO (None, the default) turns the single-chain emit layout on only
    at long horizons AND small dims — the chip A/B measured it losing at
    T=100, winning at T=500 with n=5, and the emit kernel's buffered
    stores scale with A*(n+m) so the crossover was not extrapolated past
    the measured dim class (docs/sweeps/r5_emit_traj.md); explicit
    True/False pins either layout regardless of shape."""
    from tfmpc_tpu.solvers.ilqr_batched import (
        _EMIT_TRAJ_AUTO_MAX_DIM,
        _EMIT_TRAJ_AUTO_MIN_T,
        _resolve_emit_traj,
    )

    auto = ilqr.ILQRConfig()
    assert auto.linesearch_emit_trajectories is None
    assert not _resolve_emit_traj(auto, 100, 5, 5)
    assert _resolve_emit_traj(auto, 500, 5, 5)
    assert _resolve_emit_traj(auto, _EMIT_TRAJ_AUTO_MIN_T, 2, 2)
    assert not _resolve_emit_traj(auto, _EMIT_TRAJ_AUTO_MIN_T - 1, 2, 2)
    assert _resolve_emit_traj(auto, 500, _EMIT_TRAJ_AUTO_MAX_DIM, 5)
    assert not _resolve_emit_traj(auto, 500, _EMIT_TRAJ_AUTO_MAX_DIM + 1, 5)
    on = ilqr.ILQRConfig(linesearch_emit_trajectories=True)
    off = ilqr.ILQRConfig(linesearch_emit_trajectories=False)
    assert _resolve_emit_traj(on, 4, 48, 48)
    assert not _resolve_emit_traj(off, 500, 5, 5)
