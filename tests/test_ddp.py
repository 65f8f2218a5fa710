"""Full-DDP mode tests (``ILQRConfig.ddp``).

The reference solver is iLQR-only (SURVEY §2.1 — ``tfmpc/solvers/ilqr.py``
linearizes the dynamics); ``ddp=True`` is this build's superset that keeps
the second-order dynamics tensors (Jacobson & Mayne 1970, Tassa et al. 2012
eqs. 5c-5e). Pinned here:

- ``Env.get_second_order_transition`` returns the true dynamics Hessians
  (checked against finite differences of the Jacobians and symmetry).
- On LINEAR dynamics the tensor terms vanish, so DDP == iLQR exactly.
- On nonlinear dynamics DDP converges to the same optimum as iLQR.
- ``solve_batch(ddp=True)`` == vmap of single-scenario DDP (the repo-wide
  batched-equals-single invariant).
- DDP composes with boxQP; ddp + parallel_backward raises at trace time.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tfmpc_tpu.models.hvac import make_hvac
from tfmpc_tpu.models.navigation import make_navigation
from tfmpc_tpu.models.reservoir import make_reservoir
from tfmpc_tpu.solvers import ilqr


GOAL = [8.0, -5.0]
ZONE = {"center": [[3.0, -2.0]], "decay": [2.0]}


@pytest.fixture
def env():
    return make_navigation(goal=GOAL, deceleration=ZONE, dtype=jnp.float64)


@pytest.fixture
def linear_env():
    return make_navigation(goal=GOAL, dtype=jnp.float64)


DDP = ilqr.ILQRConfig(atol=1e-8, max_iterations=100, ddp=True)
ILQR = ilqr.ILQRConfig(atol=1e-8, max_iterations=100)


class TestSecondOrderModel:
    def test_shapes(self, env):
        x = jnp.asarray([1.0, -2.0], jnp.float64)
        u = jnp.asarray([0.3, 0.1], jnp.float64)
        s = env.get_second_order_transition(x, u)
        assert s.f_xx.shape == (2, 2, 2)
        assert s.f_ux.shape == (2, 2, 2)
        assert s.f_uu.shape == (2, 2, 2)

    def test_matches_finite_difference_of_jacobians(self, env):
        """f_xx / f_ux against central differences of f_x / f_u in x."""
        x = jnp.asarray([2.0, -1.5], jnp.float64)
        u = jnp.asarray([0.4, -0.2], jnp.float64)
        s = env.get_second_order_transition(x, u)
        eps = 1e-6
        for a in range(2):
            dx = jnp.zeros(2, jnp.float64).at[a].set(eps)
            lp = env.get_linear_transition(x + dx, u)
            lm = env.get_linear_transition(x - dx, u)
            fd_fxx = (lp.f_x - lm.f_x) / (2 * eps)   # [n, n] = d f_x / dx_a
            fd_fux = (lp.f_u - lm.f_u) / (2 * eps)   # [n, m] = d f_u / dx_a
            np.testing.assert_allclose(
                np.asarray(s.f_xx[:, :, a]), np.asarray(fd_fxx), atol=1e-6
            )
            np.testing.assert_allclose(
                np.asarray(s.f_ux[:, :, a]), np.asarray(fd_fux), atol=1e-6
            )

    @pytest.mark.parametrize(
        "factory",
        [
            # complementary nonlinearity patterns: navigation has f_xx AND
            # f_ux (x' = x + lambda(x) u), HVAC is bilinear (f_ux only),
            # reservoir's evaporation is nonlinear in x alone (f_xx only)
            lambda: make_navigation(goal=GOAL, deceleration=ZONE,
                                    dtype=jnp.float64),
            lambda: make_hvac([[0, 1, 0], [1, 0, 1], [0, 1, 0]],
                              dtype=jnp.float64),
            lambda: make_reservoir(3, dtype=jnp.float64),
        ],
        ids=["navigation", "hvac", "reservoir"],
    )
    def test_all_env_families_match_finite_difference(self, factory):
        env = factory()
        n, m = env.state_size, env.action_size
        rng = np.random.default_rng(5)
        x = jnp.asarray(rng.uniform(10, 20, size=n), jnp.float64)
        u = jnp.asarray(rng.uniform(0.5, 1.5, size=m), jnp.float64)
        if env.bounds is not None:
            u = env.clip(u)
        s = env.get_second_order_transition(x, u)
        eps = 1e-6
        for a in range(n):
            dx = jnp.zeros(n, jnp.float64).at[a].set(eps)
            lp = env.get_linear_transition(x + dx, u)
            lm = env.get_linear_transition(x - dx, u)
            np.testing.assert_allclose(
                np.asarray(s.f_xx[:, :, a]),
                np.asarray((lp.f_x - lm.f_x) / (2 * eps)), atol=1e-5,
            )
            np.testing.assert_allclose(
                np.asarray(s.f_ux[:, :, a]),
                np.asarray((lp.f_u - lm.f_u) / (2 * eps)), atol=1e-5,
            )
        for j in range(m):
            du = jnp.zeros(m, jnp.float64).at[j].set(eps)
            lp = env.get_linear_transition(x, u + du)
            lm = env.get_linear_transition(x, u - du)
            np.testing.assert_allclose(
                np.asarray(s.f_uu[:, :, j]),
                np.asarray((lp.f_u - lm.f_u) / (2 * eps)), atol=1e-5,
            )

    def test_symmetry_and_linear_case(self, env, linear_env):
        x = jnp.asarray([0.5, 0.7], jnp.float64)
        u = jnp.asarray([0.1, 0.2], jnp.float64)
        s = env.get_second_order_transition(x, u)
        np.testing.assert_allclose(
            np.asarray(s.f_xx), np.asarray(jnp.swapaxes(s.f_xx, 1, 2))
        )
        # x' = x + u is linear in u: f_uu must be exactly zero everywhere.
        s_lin = linear_env.get_second_order_transition(x, u)
        assert float(jnp.max(jnp.abs(s_lin.f_xx))) == 0.0
        assert float(jnp.max(jnp.abs(s_lin.f_ux))) == 0.0
        assert float(jnp.max(jnp.abs(s_lin.f_uu))) == 0.0

    def test_batch_axis(self, env):
        X = jnp.asarray(
            np.random.default_rng(0).uniform(-3, 3, size=(7, 2)), jnp.float64
        )
        U = jnp.asarray(
            0.2 * np.random.default_rng(1).standard_normal((7, 2)), jnp.float64
        )
        sb = env.get_second_order_transition(X, U, batch=True)
        s0 = env.get_second_order_transition(X[3], U[3])
        assert sb.f_xx.shape == (7, 2, 2, 2)
        np.testing.assert_allclose(np.asarray(sb.f_uu[3]), np.asarray(s0.f_uu))


class TestDDPSolve:
    def test_equals_ilqr_on_linear_dynamics(self, linear_env):
        """Zero dynamics Hessians -> the DDP backward is the iLQR backward."""
        x0 = jnp.asarray([1.0, 2.0], jnp.float64)
        r_ddp = ilqr.solve(linear_env, x0, horizon=30, config=DDP)
        r_ilqr = ilqr.solve(linear_env, x0, horizon=30, config=ILQR)
        np.testing.assert_allclose(
            np.asarray(r_ddp.actions), np.asarray(r_ilqr.actions),
            rtol=1e-12, atol=1e-12,
        )
        assert int(r_ddp.iterations) == int(r_ilqr.iterations)

    def test_same_optimum_nonlinear(self, env):
        x0 = jnp.asarray([-4.0, 3.0], jnp.float64)
        r_ddp = ilqr.solve(env, x0, horizon=40, config=DDP)
        r_ilqr = ilqr.solve(env, x0, horizon=40, config=ILQR)
        assert bool(r_ddp.converged)
        assert bool(r_ilqr.converged)
        rel = abs(float(r_ddp.total_cost) - float(r_ilqr.total_cost)) / (
            1 + abs(float(r_ilqr.total_cost))
        )
        assert rel < 1e-6

    def test_batch_matches_single(self, env):
        x0s = jnp.asarray(
            np.random.default_rng(2).uniform(-6, 6, size=(4, 2)), jnp.float64
        )
        resb = ilqr.solve_batch(env, x0s, horizon=25, config=DDP)
        for i in range(4):
            res1 = ilqr.solve(env, x0s[i], horizon=25, config=DDP)
            np.testing.assert_allclose(
                np.asarray(resb.actions[i]), np.asarray(res1.actions),
                rtol=1e-9, atol=1e-9,
            )
            assert bool(resb.converged[i]) == bool(res1.converged)

    def test_composes_with_boxqp(self):
        env = make_hvac([[0, 1], [1, 0]], dtype=jnp.float64)
        x0 = jnp.broadcast_to(
            env.temp_low - 5.0, (3, env.state_size)
        ).astype(jnp.float64)
        cfg = ilqr.ILQRConfig(
            atol=1e-6, max_iterations=60, ddp=True, boxqp=True
        )
        res = ilqr.solve_batch(env, x0, horizon=20, config=cfg)
        lo, hi = env.bounds.low, env.bounds.high
        assert bool(jnp.all(res.actions >= lo - 1e-12))
        assert bool(jnp.all(res.actions <= hi + 1e-12))
        assert bool(jnp.all(jnp.isfinite(res.total_cost)))

    def test_warm_start_recipe(self, env):
        """The documented far-from-optimum recipe (ILQRConfig.ddp
        docstring): a few iLQR iterations, then resume with ddp=True —
        reaches the same optimum as a direct DDP solve."""
        from tfmpc_tpu.solvers.ilqr_batched import resume, state_from_result

        x0s = jnp.asarray(
            np.random.default_rng(3).uniform(-8, 8, size=(3, 2)), jnp.float64
        )
        warm = ilqr.solve_batch(
            env, x0s, horizon=25,
            config=ilqr.ILQRConfig(atol=1e-10, max_iterations=3),
        )
        r_resumed = resume(
            env, state_from_result(warm),
            config=ilqr.ILQRConfig(atol=1e-8, max_iterations=60, ddp=True),
        )
        r_direct = ilqr.solve_batch(env, x0s, horizon=25, config=DDP)
        assert bool(jnp.all(r_resumed.converged))
        np.testing.assert_allclose(
            np.asarray(r_resumed.total_cost), np.asarray(r_direct.total_cost),
            rtol=1e-7,
        )

    def test_parallel_backward_excluded(self, env):
        cfg = ilqr.ILQRConfig(ddp=True, parallel_backward=True)
        x0 = jnp.zeros(2, jnp.float64)
        with pytest.raises(ValueError, match="parallel_backward"):
            ilqr.solve(env, x0, horizon=10, config=cfg)

    def test_kernel_mode_dispatch(self, env, monkeypatch):
        """ddp stays on the LANE kernel (which implements the tensor
        contractions in-kernel since round 5) but is excluded from the mid
        kernel (which does not)."""
        from tfmpc_tpu.solvers.ilqr_batched import _riccati_kernel_mode
        from tfmpc_tpu.core.types import LinearModel

        def lin_of(n):
            z = jnp.zeros((128, 4, n), jnp.float32)
            return LinearModel(
                f=z, f_x=jnp.zeros((128, 4, n, n), jnp.float32),
                f_u=jnp.zeros((128, 4, n, n), jnp.float32),
            )

        base = ilqr.ILQRConfig(use_pallas=True)
        ddp_cfg = ilqr.ILQRConfig(use_pallas=True, ddp=True)
        assert _riccati_kernel_mode(lin_of(2), base) == "lane"
        assert _riccati_kernel_mode(lin_of(2), ddp_cfg) == "lane"
        # mid dims (CPU needs the force env var, same as the mid tests)
        monkeypatch.setenv("TFMPC_TPU_FORCE_MID_KERNEL", "1")
        assert _riccati_kernel_mode(lin_of(16), base) == "mid"
        assert _riccati_kernel_mode(lin_of(16), ddp_cfg) is None
