"""HVAC env tests: dynamics signs, cost terms, bounds (SURVEY §4 hvac row)."""

import jax.numpy as jnp
import numpy as np

from tfmpc_tpu.models.hvac import make_hvac
from tfmpc_tpu.solvers import ilqr

ADJ = [[0, 1, 0], [1, 0, 1], [0, 1, 0]]


def _env(**kw):
    return make_hvac(ADJ, dtype=jnp.float64, **kw)


class TestDynamics:
    def test_heating_raises_temperature(self):
        env = _env()
        x = jnp.full(3, 15.0)
        cold = env.transition(x, jnp.zeros(3))
        heated = env.transition(x, jnp.full(3, 5.0))
        assert np.all(np.asarray(heated) > np.asarray(cold))

    def test_leakage_toward_outside(self):
        """With no heating, room temps drift toward the outside temp."""
        env = _env(temp_out=6.0, is_hall=[0, 0, 0])
        x = jnp.full(3, 25.0)
        x_next = env.transition(x, jnp.zeros(3))
        assert np.all(np.asarray(x_next) < 25.0)
        x_cold = jnp.full(3, 0.0)
        x_cold_next = env.transition(x_cold, jnp.zeros(3))
        assert np.all(np.asarray(x_cold_next) > 0.0)

    def test_wall_exchange_equalizes(self):
        """Heat flows from hot to cold adjacent rooms, conserving the pair sum
        when isolated from outside/hallway."""
        env = make_hvac(
            [[0, 1], [1, 0]],
            is_out=[0, 0],
            is_hall=[0, 0],
            capacity=1.0,
            r_wall=2.0,
            time_delta=0.1,
            dtype=jnp.float64,
        )
        x = jnp.asarray([30.0, 10.0])
        x_next = np.asarray(env.transition(x, jnp.zeros(2)))
        assert x_next[0] < 30.0 and x_next[1] > 10.0
        np.testing.assert_allclose(x_next.sum(), 40.0, rtol=1e-12)

    def test_heating_bounded_by_air_temp(self):
        """Heating a room already at temp_air has no effect."""
        env = _env(is_out=[0, 0, 0], is_hall=[0, 0, 0], temp_air=40.0)
        x = jnp.full(3, 40.0)
        np.testing.assert_allclose(
            env.transition(x, jnp.full(3, 5.0)), x, rtol=1e-12
        )


class TestCost:
    def test_air_cost_linear_in_u(self):
        env = _env(penalty=0.0, setpoint_weight=0.0, cost_air=2.0)
        x = jnp.full(3, 21.0)
        c1 = float(env.cost(x, jnp.full(3, 1.0)))
        c2 = float(env.cost(x, jnp.full(3, 2.0)))
        np.testing.assert_allclose(c2, 2 * c1, rtol=1e-12)
        np.testing.assert_allclose(c1, 2.0 * 3.0, rtol=1e-12)

    def test_comfort_penalty_zero_inside_range(self):
        env = _env(setpoint_weight=0.0, cost_air=0.0, temp_low=20.0, temp_high=23.5)
        inside = float(env.cost(jnp.full(3, 21.0), jnp.zeros(3)))
        below = float(env.cost(jnp.full(3, 15.0), jnp.zeros(3)))
        above = float(env.cost(jnp.full(3, 30.0), jnp.zeros(3)))
        assert inside == 0.0
        assert below > 0.0 and above > 0.0

    def test_quadratization_finite_everywhere(self):
        """Squared-hinge cost has finite quadratics even at the kink."""
        env = _env()
        x = jnp.asarray([20.0, 23.5, 21.0])  # exactly at both comfort edges
        q = env.get_quadratic_cost(x, jnp.full(3, 1.0))
        for leaf in (q.l, q.l_x, q.l_u, q.l_xx, q.l_uu, q.l_ux):
            assert bool(jnp.all(jnp.isfinite(leaf)))


class TestSolve:
    def test_ilqr_heats_cold_building(self):
        env = _env()
        res = ilqr.solve(
            env,
            jnp.full(3, 5.0, jnp.float64),
            horizon=40,
            config=ilqr.ILQRConfig(atol=1e-4, max_iterations=60),
        )
        final = np.asarray(res.states[-1])
        assert np.all(final > 19.0) and np.all(final < 24.0)
        u = np.asarray(res.actions)
        assert u.min() >= -1e-12 and u.max() <= 10.0 + 1e-12

    def test_more_penalty_means_tighter_comfort(self):
        """With expensive air (so the optimum is interior, not saturated at
        the air_max bound), a higher comfort penalty buys less time below
        the comfort floor."""
        x0 = jnp.full(3, 10.0, jnp.float64)
        finals = []
        for pen in [0.5, 200.0]:
            env = _env(penalty=pen, cost_air=30.0, setpoint_weight=0.0)
            res = ilqr.solve(
                env, x0, horizon=30, config=ilqr.ILQRConfig(max_iterations=40)
            )
            # time spent below the comfort floor, weighted
            below = np.maximum(20.0 - np.asarray(res.states), 0.0).sum()
            finals.append(below)
        assert finals[1] < finals[0]


class TestLargeInstance:
    def test_twelve_rooms_falls_back_and_solves(self):
        """R=12 exceeds the Pallas kernels' n,m<=8 lane layout; use_pallas
        must silently fall back to the scan/XLA paths and still solve."""
        R = 12
        adj = np.zeros((R, R))
        for i in range(R - 1):
            adj[i, i + 1] = adj[i + 1, i] = 1.0
        env = make_hvac(adj, is_out=[1] + [0] * (R - 1))
        x0 = jnp.asarray(np.full(R, 10.0), jnp.float32)[None].repeat(4, axis=0)
        cfg = ilqr.ILQRConfig(
            atol=1e-3, max_iterations=25, boxqp=True, use_pallas=True
        )
        res = ilqr.solve_batch(env, x0, horizon=15, config=cfg)
        assert bool(np.asarray(res.converged).all()), (
            np.asarray(res.failed), np.asarray(res.residual)
        )
        u = np.asarray(res.actions)
        assert u.min() >= -1e-6 and u.max() <= 10.0 + 1e-4
