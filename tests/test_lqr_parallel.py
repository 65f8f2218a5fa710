"""Parallel (associative-scan) Riccati vs sequential scan: exact agreement."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tfmpc_tpu.models.problems import make_lqr, make_lqr_linear_navigation
from tfmpc_tpu.solvers import lqr
from tfmpc_tpu.solvers.lqr_parallel import backward_parallel


@pytest.mark.parametrize(
    "n,m,T,stddev",
    [(3, 2, 20, 0.4), (5, 3, 64, 0.3), (2, 2, 100, 0.5), (4, 1, 33, 0.3)],
)
def test_matches_sequential(n, m, T, stddev):
    key = jax.random.PRNGKey(n * 1000 + m * 100 + T)
    p = make_lqr(key, n, m, T, stddev=stddev, dtype=jnp.float64)
    pol_seq, val_seq = lqr.backward(p)
    pol_par, val_par = backward_parallel(p)
    np.testing.assert_allclose(pol_par.K, pol_seq.K, rtol=1e-8, atol=1e-8)
    np.testing.assert_allclose(pol_par.k, pol_seq.k, rtol=1e-8, atol=1e-8)
    np.testing.assert_allclose(val_par.V_xx, val_seq.V_xx, rtol=1e-8, atol=1e-8)
    np.testing.assert_allclose(val_par.v_x, val_seq.v_x, rtol=1e-8, atol=1e-8)


def test_matches_on_navigation_long_horizon():
    p = make_lqr_linear_navigation(
        jnp.array([8.0, -5.0], jnp.float64), beta=0.5, horizon=500, dtype=jnp.float64
    )
    pol_seq, _ = lqr.backward(p)
    pol_par, _ = backward_parallel(p)
    np.testing.assert_allclose(pol_par.K, pol_seq.K, rtol=1e-9, atol=1e-9)
    np.testing.assert_allclose(pol_par.k, pol_seq.k, rtol=1e-9, atol=1e-9)


def test_solve_parallel_trajectory_matches():
    p = make_lqr_linear_navigation(
        jnp.array([3.0, 4.0], jnp.float64), beta=1.0, horizon=128, dtype=jnp.float64
    )
    x0 = jnp.array([1.0, -2.0], jnp.float64)
    s_seq, a_seq, c_seq = lqr.solve(p, x0, parallel=False)
    s_par, a_par, c_par = lqr.solve(p, x0, parallel=True)
    np.testing.assert_allclose(a_par, a_seq, rtol=1e-9, atol=1e-10)
    np.testing.assert_allclose(s_par, s_seq, rtol=1e-9, atol=1e-10)


def test_time_varying_problem():
    """Time-VARYING dynamics/cost (not just broadcast constants)."""
    key = jax.random.PRNGKey(0)
    n, m, T = 3, 2, 24
    ks = jax.random.split(key, 4)
    F = 0.3 * jax.random.normal(ks[0], (T, n, n + m), jnp.float64)
    f = 0.1 * jax.random.normal(ks[1], (T, n), jnp.float64)
    M = 0.3 * jax.random.normal(ks[2], (T, n + m, n + m), jnp.float64)
    C = jnp.einsum("tij,tkj->tik", M, M) + 0.1 * jnp.eye(n + m, dtype=jnp.float64)
    c = 0.1 * jax.random.normal(ks[3], (T, n + m), jnp.float64)
    from tfmpc_tpu.core.types import LQRProblem

    p = LQRProblem(F=F, f=f, C=C, c=c)
    pol_seq, _ = lqr.backward(p)
    pol_par, _ = backward_parallel(p)
    np.testing.assert_allclose(pol_par.K, pol_seq.K, rtol=1e-8, atol=1e-9)
    np.testing.assert_allclose(pol_par.k, pol_seq.k, rtol=1e-8, atol=1e-9)
