"""boxQP projected-Newton tests vs scipy oracle + control-limited iLQR."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from scipy.optimize import minimize

from tfmpc_tpu.ops.boxqp import boxqp, solve_free_system


def _oracle(H, q, lo, hi):
    """Reference solution via scipy L-BFGS-B in float64."""
    res = minimize(
        lambda x: 0.5 * x @ H @ x + q @ x,
        np.clip(np.zeros_like(q), lo, hi),
        jac=lambda x: H @ x + q,
        bounds=list(zip(lo, hi)),
        method="L-BFGS-B",
        options={"ftol": 1e-15, "gtol": 1e-12},
    )
    return res.x


def _random_problem(rng, m, active_frac=0.5):
    A = rng.normal(size=(m, m))
    H = A @ A.T + 0.5 * np.eye(m)
    q = rng.normal(size=m) * 3.0
    width = rng.uniform(0.1, 2.0 if active_frac > 0 else 50.0, size=m)
    lo = -width
    hi = width
    return H, q, lo, hi


class TestBoxQP:
    @pytest.mark.parametrize("m", [2, 4, 8, 16])
    def test_matches_scipy_oracle(self, m, rng):
        for trial in range(5):
            H, q, lo, hi = _random_problem(rng, m)
            res = boxqp(
                jnp.asarray(H), jnp.asarray(q), jnp.asarray(lo), jnp.asarray(hi),
                max_iters=20,
            )
            x_ref = _oracle(H, q, lo, hi)
            np.testing.assert_allclose(np.asarray(res.x), x_ref, atol=1e-6)

    def test_unconstrained_matches_linear_solve(self, rng):
        m = 5
        A = rng.normal(size=(m, m))
        H = A @ A.T + 0.5 * np.eye(m)
        q = rng.normal(size=m)
        res = boxqp(
            jnp.asarray(H), jnp.asarray(q),
            jnp.full(m, -jnp.inf), jnp.full(m, jnp.inf),
        )
        np.testing.assert_allclose(
            np.asarray(res.x), -np.linalg.solve(H, q), atol=1e-8
        )
        assert bool(jnp.all(res.free))

    def test_fully_clamped(self):
        """Strong gradient pushes every dim to a bound."""
        H = jnp.eye(2, dtype=jnp.float64)
        q = jnp.asarray([-100.0, 100.0])
        res = boxqp(H, q, jnp.asarray([-1.0, -1.0]), jnp.asarray([1.0, 1.0]))
        np.testing.assert_allclose(np.asarray(res.x), [1.0, -1.0])
        assert not bool(jnp.any(res.free))

    def test_kkt_conditions(self, rng):
        """Free dims: gradient ~ 0. Clamped dims: gradient points outward."""
        H, q, lo, hi = _random_problem(rng, 8)
        res = boxqp(
            jnp.asarray(H), jnp.asarray(q), jnp.asarray(lo), jnp.asarray(hi),
            max_iters=20,
        )
        g = np.asarray(H @ np.asarray(res.x) + q)
        free = np.asarray(res.free)
        x = np.asarray(res.x)
        assert np.max(np.abs(g[free])) < 1e-6
        for i in np.where(~free)[0]:
            if np.isclose(x[i], lo[i]):
                assert g[i] > 0
            else:
                assert g[i] < 0

    def test_solve_free_system_zeroes_clamped_rows(self, rng):
        H, q, lo, hi = _random_problem(rng, 6)
        res = boxqp(
            jnp.asarray(H), jnp.asarray(q), jnp.asarray(lo), jnp.asarray(hi),
            max_iters=20,
        )
        rhs = jnp.asarray(rng.normal(size=(6, 3)))
        X = np.asarray(solve_free_system(res, rhs))
        clamped = ~np.asarray(res.free)
        np.testing.assert_allclose(X[clamped], 0.0, atol=1e-12)

    def test_vmap_batched(self, rng):
        m, B = 4, 16
        Hs, qs, los, his = [], [], [], []
        for _ in range(B):
            H, q, lo, hi = _random_problem(rng, m)
            Hs.append(H); qs.append(q); los.append(lo); his.append(hi)
        Hs, qs = jnp.asarray(np.stack(Hs)), jnp.asarray(np.stack(qs))
        los, his = jnp.asarray(np.stack(los)), jnp.asarray(np.stack(his))
        res = jax.vmap(lambda H, q, l, h: boxqp(H, q, l, h, max_iters=20))(
            Hs, qs, los, his
        )
        for i in range(B):
            x_ref = _oracle(
                np.asarray(Hs[i]), np.asarray(qs[i]),
                np.asarray(los[i]), np.asarray(his[i]),
            )
            np.testing.assert_allclose(np.asarray(res.x[i]), x_ref, atol=1e-6)


class TestControlLimitedILQR:
    def test_boxqp_at_least_as_good_as_clip(self):
        from tfmpc_tpu.models.hvac import make_hvac
        from tfmpc_tpu.solvers import ilqr

        env = make_hvac([[0, 1, 0], [1, 0, 1], [0, 1, 0]], dtype=jnp.float64)
        x0 = jnp.full(3, 5.0, jnp.float64)
        cfg_clip = ilqr.ILQRConfig(atol=1e-6, max_iterations=100)
        cfg_box = ilqr.ILQRConfig(atol=1e-6, max_iterations=100, boxqp=True)
        J_clip = float(ilqr.solve(env, x0, horizon=40, config=cfg_clip).total_cost)
        J_box = float(ilqr.solve(env, x0, horizon=40, config=cfg_box).total_cost)
        assert J_box <= J_clip + 1e-6

    def test_boxqp_converges_on_bounded_navigation(self):
        from tfmpc_tpu.models.navigation import make_navigation
        from tfmpc_tpu.solvers import ilqr

        env = make_navigation(
            goal=[8.0, -5.0],
            deceleration={"center": [[3.0, -2.0]], "decay": [2.0]},
            low=-1.0, high=1.0, dtype=jnp.float64,
        )
        res = ilqr.solve(
            env, jnp.zeros(2, jnp.float64), horizon=100,
            config=ilqr.ILQRConfig(atol=1e-6, max_iterations=60, boxqp=True),
        )
        assert bool(res.converged)
        assert float(jnp.max(jnp.abs(res.actions))) <= 1.0 + 1e-12
        np.testing.assert_allclose(np.asarray(res.states[-1]), [8.0, -5.0], atol=1e-2)

    def test_boxqp_unbounded_env_matches_plain(self):
        """boxqp=True on an env without bounds falls back to the plain path."""
        from tfmpc_tpu.models.navigation import make_navigation
        from tfmpc_tpu.solvers import ilqr

        env = make_navigation(goal=[3.0, 4.0], dtype=jnp.float64)
        x0 = jnp.asarray([1.0, 1.0], jnp.float64)
        r1 = ilqr.solve(env, x0, horizon=20,
                        config=ilqr.ILQRConfig(atol=1e-8, boxqp=True))
        r2 = ilqr.solve(env, x0, horizon=20,
                        config=ilqr.ILQRConfig(atol=1e-8, boxqp=False))
        np.testing.assert_allclose(
            np.asarray(r1.actions), np.asarray(r2.actions), atol=1e-10
        )
