"""LinearSystem env: iLQR == closed-form LQR, m != n shape coverage.

SURVEY §7.2 M1's parity gate — iLQR on a linear problem must match the
exact LQR solution — plus the only stock env with action_size != state_size
(every other env has m == n), exercising the rectangular-shape paths of the
solvers and Pallas kernels.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tfmpc_tpu.models.linear import make_linear_system
from tfmpc_tpu.models.registry import make_env
from tfmpc_tpu.solvers import ilqr, lqr


@pytest.fixture(scope="module")
def double_integrator():
    """n=2 (position, velocity), m=1 (acceleration): the classic m < n case."""
    dt = 0.1
    return make_linear_system(
        A=[[1.0, dt], [0.0, 1.0]],
        B=[[0.5 * dt * dt], [dt]],
        Q=[[1.0, 0.0], [0.0, 0.1]],
        R=[[0.01]],
    )


class TestEnvBasics:
    def test_shapes(self, double_integrator):
        env = double_integrator
        assert env.state_size == 2 and env.action_size == 1
        x = jnp.asarray([1.0, -0.5])
        u = jnp.asarray([0.3])
        assert env.transition(x, u).shape == (2,)
        lin = env.get_linear_transition(x, u)
        np.testing.assert_allclose(np.asarray(lin.f_x), np.asarray(env.A))
        np.testing.assert_allclose(np.asarray(lin.f_u), np.asarray(env.B))

    def test_lane_functions_parity(self, double_integrator, rng):
        env = double_integrator
        params, step_fn, final_fn = env.lane_functions()
        x = jnp.asarray(rng.uniform(-2, 2, size=(8, 2)).astype("f4"))
        u = jnp.asarray(rng.uniform(-1, 1, size=(8, 1)).astype("f4"))
        xn, c = step_fn(params, x.T, u.T)
        np.testing.assert_allclose(
            np.asarray(xn.T), np.asarray(jax.vmap(env.transition)(x, u)),
            rtol=1e-5, atol=1e-6,
        )
        np.testing.assert_allclose(
            np.asarray(c), np.asarray(jax.vmap(env.cost)(x, u)),
            rtol=1e-5, atol=1e-6,
        )
        np.testing.assert_allclose(
            np.asarray(final_fn(params, x.T)),
            np.asarray(jax.vmap(env.final_cost)(x)),
            rtol=1e-5, atol=1e-6,
        )

    def test_registry(self):
        env = make_env({
            "name": "linear",
            "A": [[1.0, 0.1], [0.0, 1.0]],
            "B": [[0.0], [0.1]],
        })
        assert env.state_size == 2 and env.action_size == 1


class TestILQRMatchesLQR:
    def test_exact_on_double_integrator(self, double_integrator):
        env = double_integrator
        T = 40
        x0 = jnp.asarray([3.0, -1.0], jnp.float32)

        states_l, actions_l, costs_l = lqr.solve(env.to_lqr_problem(T), x0)
        res = ilqr.solve(
            env, x0, horizon=T,
            config=ilqr.ILQRConfig(atol=1e-12, max_iterations=50),
        )
        assert bool(res.converged)
        # iLQR on a linear-quadratic problem converges in ONE Newton step to
        # the exact LQR optimum
        np.testing.assert_allclose(
            np.asarray(res.actions), np.asarray(actions_l),
            rtol=1e-4, atol=1e-5,
        )
        np.testing.assert_allclose(
            float(res.total_cost), float(jnp.sum(costs_l)), rtol=1e-5
        )
        assert int(res.iterations) <= 3

    def test_batched_rectangular_with_kernels(self, double_integrator, rng):
        """m != n through the batched solver with use_pallas enabled."""
        env = double_integrator
        x0 = jnp.asarray(rng.uniform(-3, 3, size=(128, 2)).astype("f4"))
        res = ilqr.solve_batch(
            env, x0, horizon=12,
            config=ilqr.ILQRConfig(
                atol=1e-6, max_iterations=20, use_pallas=True
            ),
        )
        assert bool(np.asarray(res.converged).all())
        # spot-check one scenario against exact LQR
        _, actions_l, costs_l = lqr.solve(env.to_lqr_problem(12), x0[0])
        np.testing.assert_allclose(
            np.asarray(res.actions[0]), np.asarray(actions_l),
            rtol=1e-3, atol=1e-4,
        )

    def test_bounded_linear_boxqp(self):
        env = make_linear_system(
            A=[[1.0, 0.1], [0.0, 1.0]],
            B=[[0.0], [0.1]],
            R=[[0.001]],
            low=-0.5, high=0.5,
        )
        x0 = jnp.asarray([4.0, 0.0], jnp.float32)
        res = ilqr.solve(
            env, x0, horizon=50,
            config=ilqr.ILQRConfig(atol=1e-8, max_iterations=60, boxqp=True),
        )
        assert bool(res.converged)
        u = np.asarray(res.actions)
        assert u.min() >= -0.5 - 1e-6 and u.max() <= 0.5 + 1e-6
        # the saturated solve must beat simply clipping the unconstrained one
        env_free = make_linear_system(
            A=[[1.0, 0.1], [0.0, 1.0]], B=[[0.0], [0.1]], R=[[0.001]],
        )
        res_free = ilqr.solve(
            env_free, x0, horizon=50,
            config=ilqr.ILQRConfig(atol=1e-8, max_iterations=60),
        )
        clipped = jnp.clip(res_free.actions, -0.5, 0.5)
        J_clip = float(env.total_cost(x0, clipped))
        assert float(res.total_cost) <= J_clip + 1e-4


@pytest.mark.parametrize("seed,n,m", [(0, 3, 2), (1, 4, 1), (2, 2, 3)])
def test_ilqr_matches_lqr_on_random_systems(seed, n, m):
    """Property: on ANY stable-ish random linear-quadratic system, iLQR
    reproduces the closed-form LQR optimum (random n, m combinations,
    including m > n)."""
    rng = np.random.default_rng(seed)
    A = np.eye(n) + 0.1 * rng.standard_normal((n, n))
    A = A / max(1.0, np.max(np.abs(np.linalg.eigvals(A))))  # spectral radius <= 1
    B = rng.standard_normal((n, m))
    L = rng.standard_normal((n, n))
    Q = L @ L.T / n + 0.1 * np.eye(n)
    Lr = rng.standard_normal((m, m))
    R = Lr @ Lr.T / m + 0.1 * np.eye(m)
    env = make_linear_system(A=A, B=B, Q=Q, R=R, c=0.1 * rng.standard_normal(n))

    T = 25
    x0 = jnp.asarray(rng.standard_normal(n), jnp.float32)
    _, actions_l, costs_l = lqr.solve(env.to_lqr_problem(T), x0)
    res = ilqr.solve(
        env, x0, horizon=T,
        config=ilqr.ILQRConfig(atol=1e-12, max_iterations=50),
    )
    assert bool(res.converged)
    np.testing.assert_allclose(
        np.asarray(res.actions), np.asarray(actions_l), rtol=1e-3, atol=1e-4
    )
    np.testing.assert_allclose(
        float(res.total_cost), float(jnp.sum(costs_l)),
        rtol=1e-5, atol=1e-5,
    )


def test_analytic_hook_matches_autodiff(double_integrator, rng):
    env = double_integrator
    T = 10
    x0 = jnp.asarray(rng.uniform(-2, 2, size=2).astype("f4"))
    U = jnp.asarray(rng.uniform(-1, 1, size=(T, 1)).astype("f4"))
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
                np.asarray(la), np.asarray(ld), rtol=1e-6, atol=1e-6
            )
