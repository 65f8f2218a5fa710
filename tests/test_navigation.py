"""Navigation env tests: transition/cost formulas, Jacobian structure.

Mirrors reference ``tests/test_navigation.py`` coverage (SURVEY §4):
hand-derived formula checks, ``f_x = I + u * d(lambda)/dx`` structure,
deceleration lambda in (0,1) near zones.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tfmpc_tpu.models.navigation import Navigation, make_navigation


def _env_with_zone():
    return make_navigation(
        goal=[8.0, -5.0],
        deceleration={"center": [[3.0, -2.0]], "decay": [2.0]},
        dtype=jnp.float64,
    )


def _env_linear():
    return make_navigation(goal=[8.0, -5.0], dtype=jnp.float64)


class TestDeceleration:
    def test_no_zones_is_identity_speed(self):
        env = _env_linear()
        x = jnp.array([1.0, 2.0])
        assert float(env.deceleration(x)) == 1.0
        np.testing.assert_allclose(env.transition(x, jnp.ones(2)), x + 1.0)

    def test_lambda_in_unit_interval(self, rng):
        env = _env_with_zone()
        for _ in range(20):
            x = jnp.asarray(rng.uniform(-10, 10, size=2))
            lam = float(env.deceleration(x))
            assert 0.0 < lam <= 1.0

    def test_lambda_vanishes_at_center(self):
        env = _env_with_zone()
        lam_center = float(env.deceleration(jnp.array([3.0, -2.0])))
        lam_far = float(env.deceleration(jnp.array([100.0, 100.0])))
        assert lam_center < 1e-5
        assert lam_far > 0.999

    def test_matches_formula(self, rng):
        env = _env_with_zone()
        x = jnp.asarray(rng.uniform(-5, 5, size=2))
        dist = np.linalg.norm(np.asarray(x) - np.array([3.0, -2.0]))
        expected = 2.0 / (1.0 + np.exp(-2.0 * dist)) - 1.0
        np.testing.assert_allclose(float(env.deceleration(x)), expected, rtol=1e-6)

    def test_multiple_zones_multiply(self):
        env = make_navigation(
            goal=[0.0, 0.0],
            deceleration={"center": [[1.0, 0.0], [0.0, 1.0]], "decay": [1.0, 3.0]},
            dtype=jnp.float64,
        )
        x = jnp.array([0.5, 0.5])
        l1 = 2.0 / (1.0 + np.exp(-1.0 * np.linalg.norm([0.5, -0.5]))) - 1.0
        l2 = 2.0 / (1.0 + np.exp(-3.0 * np.linalg.norm([0.5, -0.5]))) - 1.0
        np.testing.assert_allclose(float(env.deceleration(x)), l1 * l2, rtol=1e-6)


class TestLinearization:
    def test_fx_structure(self, rng):
        """f_x = I + u (d lambda/dx)^T for scalar lambda."""
        env = _env_with_zone()
        x = jnp.asarray(rng.uniform(-5, 5, size=2))
        u = jnp.asarray(rng.uniform(-1, 1, size=2))
        lin = env.get_linear_transition(x, u)
        dlam = jax.grad(env.deceleration)(x)
        expected_fx = np.eye(2) + np.outer(np.asarray(u), np.asarray(dlam))
        np.testing.assert_allclose(lin.f_x, expected_fx, rtol=1e-6, atol=1e-10)

    def test_fu_is_lambda_eye(self, rng):
        env = _env_with_zone()
        x = jnp.asarray(rng.uniform(-5, 5, size=2))
        u = jnp.asarray(rng.uniform(-1, 1, size=2))
        lin = env.get_linear_transition(x, u)
        lam = float(env.deceleration(x))
        np.testing.assert_allclose(lin.f_u, lam * np.eye(2), rtol=1e-6)

    def test_jacobian_vs_finite_differences(self, rng):
        env = _env_with_zone()
        x = jnp.asarray(rng.uniform(-5, 5, size=2))
        u = jnp.asarray(rng.uniform(-1, 1, size=2))
        lin = env.get_linear_transition(x, u)
        eps = 1e-6
        fd = np.zeros((2, 2))
        for j in range(2):
            dx = np.zeros(2)
            dx[j] = eps
            fd[:, j] = (
                np.asarray(env.transition(x + dx, u)) - np.asarray(env.transition(x - dx, u))
            ) / (2 * eps)
        np.testing.assert_allclose(lin.f_x, fd, rtol=1e-4, atol=1e-7)

    def test_batch_linearization_matches_single(self, rng):
        env = _env_with_zone()
        X = jnp.asarray(rng.uniform(-5, 5, size=(7, 2)))
        U = jnp.asarray(rng.uniform(-1, 1, size=(7, 2)))
        lin_b = env.get_linear_transition(X, U, batch=True)
        for i in range(7):
            lin_i = env.get_linear_transition(X[i], U[i])
            np.testing.assert_allclose(lin_b.f_x[i], lin_i.f_x, rtol=1e-10)
            np.testing.assert_allclose(lin_b.f_u[i], lin_i.f_u, rtol=1e-10)


class TestCost:
    def test_quadratic_cost_exact(self, rng):
        """cost = |x-g|^2: l_xx = 2I, l_u = 0, l_uu = 0, l_ux = 0."""
        env = _env_with_zone()
        x = jnp.asarray(rng.uniform(-5, 5, size=2))
        u = jnp.asarray(rng.uniform(-1, 1, size=2))
        quad = env.get_quadratic_cost(x, u)
        g = np.array([8.0, -5.0])
        np.testing.assert_allclose(float(quad.l), np.sum((np.asarray(x) - g) ** 2))
        np.testing.assert_allclose(quad.l_x, 2 * (np.asarray(x) - g), rtol=1e-7)
        np.testing.assert_allclose(quad.l_xx, 2 * np.eye(2), atol=1e-10)
        np.testing.assert_allclose(quad.l_u, np.zeros(2), atol=1e-10)
        np.testing.assert_allclose(quad.l_uu, np.zeros((2, 2)), atol=1e-10)
        np.testing.assert_allclose(quad.l_ux, np.zeros((2, 2)), atol=1e-10)

    def test_final_cost_quadratics(self, rng):
        env = _env_with_zone()
        x = jnp.asarray(rng.uniform(-5, 5, size=2))
        fq = env.get_quadratic_final_cost(x)
        g = np.array([8.0, -5.0])
        np.testing.assert_allclose(float(fq.l), np.sum((np.asarray(x) - g) ** 2))
        np.testing.assert_allclose(fq.l_xx, 2 * np.eye(2), atol=1e-10)


class TestRollout:
    def test_rollout_shapes_and_consistency(self, rng):
        env = _env_with_zone()
        x0 = jnp.zeros(2)
        U = jnp.asarray(rng.uniform(-1, 1, size=(10, 2)))
        X, costs = env.rollout(x0, U)
        assert X.shape == (11, 2)
        assert costs.shape == (11,)
        x = x0
        for t in range(10):
            x = env.transition(x, U[t])
            np.testing.assert_allclose(X[t + 1], x, rtol=1e-10)

    def test_bounds_clip(self):
        env = make_navigation(goal=[0.0, 0.0], low=-1.0, high=2.0, dtype=jnp.float64)
        u = jnp.array([-5.0, 5.0])
        np.testing.assert_allclose(env.clip(u), [-1.0, 2.0])


class TestAnalyticDerivatives:
    """The closed-form linearization hook must match autodiff exactly."""

    @pytest.mark.parametrize("zones", [0, 1, 3])
    def test_matches_autodiff(self, zones, rng):
        if zones:
            dec = {
                "center": rng.uniform(-4, 4, size=(zones, 2)).tolist(),
                "decay": rng.uniform(0.5, 3.0, size=(zones,)).tolist(),
            }
        else:
            dec = None
        env = make_navigation(goal=[8.0, -5.0], deceleration=dec,
                              dtype=jnp.float64)
        T = 15
        x0 = jnp.asarray(rng.uniform(-5, 5, size=2))
        U = jnp.asarray(0.3 * rng.standard_normal((T, 2)))
        X, _ = env.rollout(x0, U)

        lin_a, quad_a, fin_a = env.analytic_derivatives(X, U)
        lin_d = env.get_linear_transition(X[:-1], U, batch=True)
        quad_d = env.get_quadratic_cost(X[:-1], U, batch=True)
        fin_d = env.get_quadratic_final_cost(X[-1])

        for a, d in [(lin_a, lin_d), (quad_a, quad_d), (fin_a, fin_d)]:
            for la, ld in zip(
                jax.tree_util.tree_leaves(a), jax.tree_util.tree_leaves(d)
            ):
                np.testing.assert_allclose(
                    np.asarray(la), np.asarray(ld), rtol=1e-10, atol=1e-10
                )

    def test_solver_uses_hook_and_matches(self, rng):
        """End-to-end: solve with the hook == solve with autodiff (hook
        disabled by subclass override)."""
        import dataclasses

        from tfmpc_tpu.solvers import ilqr

        env = make_navigation(
            goal=[8.0, -5.0],
            deceleration={"center": [[3.0, -2.0]], "decay": [2.0]},
        )

        @dataclasses.dataclass(frozen=True)
        class NoHook(type(env)):
            def analytic_derivatives(self, X, U):
                return None

        jax.tree_util.register_dataclass(
            NoHook,
            data_fields=[f.name for f in dataclasses.fields(NoHook)],
            meta_fields=[],
        )
        env_nohook = NoHook(**{
            f.name: getattr(env, f.name) for f in dataclasses.fields(env)
        })

        x0 = jnp.asarray([0.5, -1.0], jnp.float32)
        cfg = ilqr.ILQRConfig(atol=1e-6, max_iterations=40)
        res_a = ilqr.solve(env, x0, horizon=25, config=cfg)
        res_d = ilqr.solve(env_nohook, x0, horizon=25, config=cfg)
        np.testing.assert_allclose(
            np.asarray(res_a.actions), np.asarray(res_d.actions),
            rtol=1e-5, atol=1e-6,
        )
        assert int(res_a.iterations) == int(res_d.iterations)
