"""LQR solver tests vs independent NumPy oracle and optimality checks.

Mirrors the reference's ``tests/test_lqr.py`` coverage (SURVEY §4): shapes,
value-matrix symmetry/PD, forward/backward consistency, solution optimality —
plus oracle parity (the reference mount was empty, so the float64 oracle in
``oracles.py`` is the ground truth).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tfmpc_tpu.core.types import LQRProblem
from tfmpc_tpu.models.problems import make_lqr, make_lqr_linear_navigation
from tfmpc_tpu.solvers import lqr

from oracles import lqr_backward_np, lqr_rollout_np, total_cost_of_controls_np


def _np_parts(p: LQRProblem):
    C_f = np.asarray(p.C_f) if p.C_f is not None else np.zeros((p.state_size,) * 2)
    c_f = np.asarray(p.c_f) if p.c_f is not None else np.zeros(p.state_size)
    return (
        np.asarray(p.F),
        np.asarray(p.f),
        np.asarray(p.C),
        np.asarray(p.c),
        C_f,
        c_f,
    )


@pytest.fixture(params=[(3, 2, 20), (5, 3, 50), (2, 2, 100)])
def problem(request):
    n, m, T = request.param
    key = jax.random.PRNGKey(n * 100 + m * 10 + T)
    return make_lqr(key, n, m, T, dtype=jnp.float64)


class TestBackward:
    def test_shapes(self, problem):
        T, n, m = problem.horizon, problem.state_size, problem.action_size
        policy, value = lqr.backward(problem)
        assert policy.K.shape == (T, m, n)
        assert policy.k.shape == (T, m)
        assert value.V_xx.shape == (T + 1, n, n)
        assert value.v_x.shape == (T + 1, n)
        assert value.v_0.shape == (T + 1,)

    def test_value_symmetric(self, problem):
        _, value = lqr.backward(problem)
        np.testing.assert_allclose(
            value.V_xx, jnp.swapaxes(value.V_xx, -1, -2), atol=1e-10
        )

    def test_matches_numpy_oracle(self, problem):
        policy, _ = lqr.backward(problem)
        K_np, k_np = lqr_backward_np(*_np_parts(problem))
        np.testing.assert_allclose(policy.K, K_np, rtol=1e-8, atol=1e-8)
        np.testing.assert_allclose(policy.k, k_np, rtol=1e-8, atol=1e-8)


class TestSolve:
    def test_matches_oracle_trajectory(self, problem):
        n = problem.state_size
        x0 = jnp.asarray(np.random.default_rng(0).normal(size=n))
        states, actions, costs = lqr.solve(problem, x0)
        parts = _np_parts(problem)
        K_np, k_np = lqr_backward_np(*parts)
        xs, us, total = lqr_rollout_np(*parts, np.asarray(x0), K_np, k_np)
        np.testing.assert_allclose(states, xs, rtol=1e-7, atol=1e-7)
        np.testing.assert_allclose(actions, us, rtol=1e-7, atol=1e-7)
        np.testing.assert_allclose(jnp.sum(costs), total, rtol=1e-7)

    def test_optimality_vs_perturbations(self, problem):
        """The LQR solution beats random perturbed open-loop control seqs."""
        n = problem.state_size
        rng = np.random.default_rng(1)
        x0 = jnp.asarray(rng.normal(size=n))
        _, actions, costs = lqr.solve(problem, x0)
        best = float(jnp.sum(costs))
        parts = _np_parts(problem)
        U = np.asarray(actions)
        for scale in [1e-2, 1e-1, 1.0]:
            for _ in range(5):
                U_pert = U + scale * rng.normal(size=U.shape)
                assert total_cost_of_controls_np(*parts, np.asarray(x0), U_pert) >= best - 1e-9

    def test_gradient_stationarity(self):
        """Open-loop gradient of total cost wrt U vanishes at the solution.

        Uses a contractive problem (stddev=0.3 => rho(F_x) < 1): for unstable
        random dynamics the open-loop curvature grows like rho^T and float64
        cannot represent the stationary point in open-loop coordinates.
        """
        problem = make_lqr(jax.random.PRNGKey(7), 4, 2, 30, stddev=0.3, dtype=jnp.float64)
        n = problem.state_size
        x0 = jnp.asarray(np.random.default_rng(2).normal(size=n))
        _, actions, _ = lqr.solve(problem, x0)

        def open_loop_cost(U):
            def step(x, inp):
                F_t, f_t, C_t, c_t, u = inp
                z = jnp.concatenate([x, u])
                cost = 0.5 * z @ (C_t @ z) + z @ c_t
                return F_t @ z + f_t, cost

            x_T, costs = jax.lax.scan(
                step, x0, (problem.F, problem.f, problem.C, problem.c, U)
            )
            total = jnp.sum(costs)
            if problem.C_f is not None:
                total = total + 0.5 * x_T @ (problem.C_f @ x_T) + x_T @ problem.c_f
            return total

        J, g = jax.value_and_grad(open_loop_cost)(actions)
        # Random unstable dynamics amplify magnitudes by ~rho(F)^T, so the
        # stationarity check must be relative to the cost scale.
        assert float(jnp.max(jnp.abs(g))) < 1e-8 * (1.0 + abs(float(J)))

    def test_batched_x0(self, problem):
        n = problem.state_size
        x0 = jnp.asarray(np.random.default_rng(3).normal(size=(7, n)))
        states, actions, costs = lqr.solve(problem, x0)
        assert states.shape == (7, problem.horizon + 1, n)
        s0, a0, c0 = lqr.solve(problem, x0[0])
        np.testing.assert_allclose(states[0], s0, rtol=1e-10)
        np.testing.assert_allclose(actions[0], a0, rtol=1e-10)


class TestLinearNavigation:
    def test_reaches_goal(self):
        goal = jnp.array([8.0, -5.0], dtype=jnp.float64)
        p = make_lqr_linear_navigation(goal, beta=0.5, horizon=100, dtype=jnp.float64)
        x0 = jnp.zeros(2, dtype=jnp.float64)
        states, actions, costs = lqr.solve(p, x0)
        np.testing.assert_allclose(states[-1], goal, atol=1e-3)

    def test_beta_tradeoff(self):
        """Higher control penalty -> smaller controls, slower approach."""
        goal = jnp.array([5.0, 5.0], dtype=jnp.float64)
        x0 = jnp.zeros(2, dtype=jnp.float64)
        norms = []
        for beta in [0.1, 10.0]:
            p = make_lqr_linear_navigation(goal, beta=beta, horizon=50, dtype=jnp.float64)
            _, actions, _ = lqr.solve(p, x0)
            norms.append(float(jnp.max(jnp.linalg.norm(actions, axis=-1))))
        assert norms[1] < norms[0]
