"""Navigation env tests: transition/cost formulas, Jacobian structure.

Mirrors reference ``tests/test_navigation.py`` coverage (SURVEY §4):
hand-derived formula checks, ``f_x = I + u * d(lambda)/dx`` structure,
deceleration lambda in (0,1) near zones.
"""

import jax
import jax.numpy as jnp
import numpy as np

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
