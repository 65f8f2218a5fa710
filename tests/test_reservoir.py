"""Reservoir env tests: routing mass balance, penalty asymmetry (SURVEY §4)."""

import jax.numpy as jnp
import numpy as np

from tfmpc_tpu.models.reservoir import make_reservoir
from tfmpc_tpu.solvers import ilqr


class TestDynamics:
    def test_chain_routing(self):
        """Released water flows to the next reservoir in the chain."""
        env = make_reservoir(3, rain=0.0, evap_factor=0.0, dtype=jnp.float64)
        x = jnp.asarray([50.0, 50.0, 50.0])
        u = jnp.asarray([10.0, 0.0, 0.0])
        x_next = np.asarray(env.transition(x, u))
        np.testing.assert_allclose(x_next, [40.0, 60.0, 50.0], rtol=1e-12)

    def test_last_reservoir_drains_out(self):
        """Water released from the last reservoir leaves the system."""
        env = make_reservoir(3, rain=0.0, evap_factor=0.0, dtype=jnp.float64)
        x = jnp.full(3, 50.0)
        u = jnp.asarray([0.0, 0.0, 10.0])
        x_next = np.asarray(env.transition(x, u))
        np.testing.assert_allclose(x_next, [50.0, 50.0, 40.0], rtol=1e-12)
        assert x_next.sum() < float(x.sum())  # mass left the system

    def test_mass_balance_no_evap(self):
        """With zero evaporation, change in total = rain - outlet release."""
        env = make_reservoir(4, rain=2.0, evap_factor=0.0, dtype=jnp.float64)
        x = jnp.full(4, 50.0)
        u = jnp.asarray([5.0, 3.0, 1.0, 7.0])
        x_next = np.asarray(env.transition(x, u))
        expected_delta = 2.0 * 4 - 7.0  # rain in, last-reservoir release out
        np.testing.assert_allclose(x_next.sum() - 200.0, expected_delta, rtol=1e-12)

    def test_evaporation_positive_below_capacity(self):
        env = make_reservoir(1, dtype=jnp.float64)
        for level in [10.0, 50.0, 90.0]:
            ev = float(env.evaporation(jnp.asarray([level])).sum())
            assert ev > 0.0
            assert ev < level  # cannot evaporate more than the content

    def test_dag_topology(self):
        """Two reservoirs feeding a third."""
        D = [[0, 0, 1], [0, 0, 1], [0, 0, 0]]
        env = make_reservoir(downstream=D, rain=0.0, evap_factor=0.0, dtype=jnp.float64)
        x = jnp.full(3, 50.0)
        u = jnp.asarray([4.0, 6.0, 0.0])
        x_next = np.asarray(env.transition(x, u))
        np.testing.assert_allclose(x_next, [46.0, 44.0, 60.0], rtol=1e-12)


class TestCost:
    def test_penalty_asymmetry(self):
        """Flooding (above upper bound) costs more than drought (below lower)
        at the same violation magnitude, per the config asymmetry."""
        env = make_reservoir(
            1, low_penalty=5.0, high_penalty=100.0, setpoint_weight=0.0,
            lower_bound=10.0, upper_bound=90.0, dtype=jnp.float64,
        )
        drought = float(env.cost(jnp.asarray([5.0]), jnp.zeros(1)))   # 5 below
        flood = float(env.cost(jnp.asarray([95.0]), jnp.zeros(1)))    # 5 above
        np.testing.assert_allclose(drought, 5.0 * 25.0, rtol=1e-12)
        np.testing.assert_allclose(flood, 100.0 * 25.0, rtol=1e-12)
        assert flood > drought

    def test_zero_inside_band_without_setpoint(self):
        env = make_reservoir(2, setpoint_weight=0.0, dtype=jnp.float64)
        assert float(env.cost(jnp.asarray([50.0, 30.0]), jnp.zeros(2))) == 0.0


class TestSolve:
    def test_ilqr_drains_flooding_reservoir(self):
        env = make_reservoir(4, dtype=jnp.float64)
        x0 = jnp.asarray([95.0, 85.0, 60.0, 40.0], jnp.float64)
        res = ilqr.solve(
            env, x0, horizon=60, config=ilqr.ILQRConfig(max_iterations=60)
        )
        final = np.asarray(res.states[-1])
        assert np.all(final < 90.0) and np.all(final > 10.0)
        u = np.asarray(res.actions)
        assert u.min() >= -1e-12 and u.max() <= 50.0 + 1e-12

    def test_long_horizon_500(self):
        """Reservoir config 4 of BASELINE.md: horizon-500 solve stays finite
        and in-band (regularization scheduling exercised)."""
        env = make_reservoir(4, dtype=jnp.float64)
        x0 = jnp.asarray([95.0, 20.0, 70.0, 15.0], jnp.float64)
        res = ilqr.solve(
            env, x0, horizon=500, config=ilqr.ILQRConfig(max_iterations=30)
        )
        assert bool(jnp.all(jnp.isfinite(res.states)))
        final = np.asarray(res.states[-1])
        assert np.all(final < 90.0) and np.all(final > 10.0)

    def test_boxqp_long_horizon_converges(self):
        """Control-limited DDP (boxqp) converges on the saturated T=500
        instance where pure clipping stalls at the bound (>90% of optimal
        releases are at the box limits)."""
        env = make_reservoir(5)
        x0 = jnp.asarray([95.0, 80.0, 60.0, 40.0, 20.0], jnp.float32)
        cfg = ilqr.ILQRConfig(atol=1e-3, max_iterations=40, boxqp=True)
        res = ilqr.solve(env, x0, horizon=500, config=cfg)
        assert bool(res.converged)
        u = np.asarray(res.actions)
        assert u.min() >= -1e-6 and u.max() <= 50.0 + 1e-4
        # clipping-only stalls higher: boxqp must do at least as well
        res_clip = ilqr.solve(
            env, x0, horizon=500,
            config=ilqr.ILQRConfig(atol=1e-3, max_iterations=40),
        )
        assert float(res.total_cost) <= float(res_clip.total_cost) + 1e-3

    def test_kkt_convergence_at_boundary_optimum(self):
        """A fully saturated stationary point must be reported as converged
        via the KKT projected-gradient test, not as a mu-ceiling failure.
        Constructed so the optimum is exactly u = 0 everywhere: levels start
        below the setpoint band midpoint and every release points uphill
        (downstream routing removed so no (t, i) benefits from releasing)."""
        env = make_reservoir(
            3, downstream=np.zeros((3, 3)), rain=2.0, setpoint_weight=0.5
        )
        x0 = jnp.asarray([30.0, 28.0, 26.0], jnp.float32)
        res = ilqr.solve(
            env, x0, horizon=50,
            config=ilqr.ILQRConfig(atol=1e-6, max_iterations=30),
        )
        assert bool(res.converged), (
            float(res.residual), float(res.mu), bool(res.failed)
        )
        assert not bool(res.failed)
        assert float(jnp.max(jnp.abs(res.actions))) == 0.0
