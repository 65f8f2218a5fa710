"""Fused materialize+derivatives pipeline parity (EXPERIMENTAL path).

With ``lane_derivatives`` implemented (navigation) and
``fuse_derivatives=True``, the solver's iteration fuses the linearization
into the materialize kernel and exchanges kernel-layout blocks between all
stages. Measured SLOWER than the split pipeline at the shipped dims (see
ILQRConfig.fuse_derivatives), so it defaults OFF; these tests keep the
path correct:

- the lane-major closed-form derivatives == ``analytic_derivatives``;
- ``rollout_alpha_derivs_pallas`` == ``rollout_alpha_pallas`` on the
  trajectory outputs, and its derivative blocks == the XLA linearization of
  that trajectory;
- end-to-end: fused solve == the split-pipeline solve.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tfmpc_tpu.core.types import Policy
from tfmpc_tpu.models.navigation import make_navigation
from tfmpc_tpu.ops.riccati_pallas import _to_kernel_layout
from tfmpc_tpu.ops.rollout_pallas import (
    rollout_alpha_derivs_pallas,
    rollout_alpha_pallas,
)
from tfmpc_tpu.solvers import ilqr
from tfmpc_tpu.solvers.ilqr_batched import _derivatives_batched


@pytest.fixture(scope="module")
def env():
    return make_navigation(
        goal=[8.0, -5.0],
        deceleration={"center": [[3.0, -2.0]], "decay": [2.0]},
    )


def test_lane_derivatives_match_analytic(env, rng):
    params, derivs_fn = env.lane_derivatives()
    L, n = 32, 2
    x = jnp.asarray(rng.uniform(-6, 6, size=(n, L)).astype("f4"))
    u = jnp.asarray(rng.uniform(-1, 1, size=(n, L)).astype("f4"))
    out = derivs_fn(params, x, u)

    # reference: analytic_derivatives per lane (T=1 horizons)
    def one(xc, uc):
        X = jnp.stack([xc, env.transition(xc, uc)])
        lin, quad, _ = env.analytic_derivatives(X, uc[None])
        return lin, quad

    lin, quad = jax.vmap(one, in_axes=(-1, -1))(x, u)
    np.testing.assert_allclose(
        np.asarray(out["fx"]).reshape(n, n, L),
        np.moveaxis(np.asarray(lin.f_x)[:, 0], 0, -1), rtol=1e-6, atol=1e-6,
    )
    np.testing.assert_allclose(
        np.asarray(out["fu"]).reshape(n, n, L),
        np.moveaxis(np.asarray(lin.f_u)[:, 0], 0, -1), rtol=1e-6, atol=1e-6,
    )
    np.testing.assert_allclose(
        np.asarray(out["lx"]),
        np.moveaxis(np.asarray(quad.l_x)[:, 0], 0, -1), rtol=1e-6, atol=1e-6,
    )
    np.testing.assert_allclose(
        np.asarray(out["lxx"]).reshape(n, n, L),
        np.moveaxis(np.asarray(quad.l_xx)[:, 0], 0, -1), rtol=1e-6,
        atol=1e-6,
    )
    for key in ("lu", "luu", "lux"):
        assert float(np.abs(np.asarray(out[key])).max()) == 0.0


def test_materialize_derivs_matches_split(env, rng):
    B, T, n, m = 128, 8, 2, 2
    x0 = jnp.asarray(rng.uniform(-6, 6, size=(B, n)).astype("f4"))
    U = jnp.asarray(0.2 * rng.standard_normal((B, T, m)).astype("f4"))
    X, _ = jax.vmap(env.rollout)(x0, U)
    policy = Policy(
        K=jnp.asarray(0.05 * rng.standard_normal((B, T, m, n)).astype("f4")),
        k=jnp.asarray(0.1 * rng.standard_normal((B, T, m)).astype("f4")),
    )
    alpha_vec = jnp.asarray(rng.choice([1.0, 0.5], size=(B,)).astype("f4"))

    X_f, U_f, J_f, kargs = rollout_alpha_derivs_pallas(
        env, X, U, policy, alpha_vec
    )
    X_r, U_r, J_r = rollout_alpha_pallas(env, X, U, policy, alpha_vec)
    np.testing.assert_allclose(np.asarray(X_f), np.asarray(X_r), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(U_f), np.asarray(U_r), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(J_f), np.asarray(J_r), rtol=1e-6)

    # derivative blocks == XLA linearization of the materialized trajectory
    lin, quad, final = _derivatives_batched(env, X_f, U_f)
    a, _ = _to_kernel_layout(lin, quad, final, jnp.zeros((B,), X.dtype))
    for key in ("fx", "fu", "lx", "lu", "lxx", "luu", "lux"):
        np.testing.assert_allclose(
            np.asarray(kargs[key]), np.asarray(a[key]),
            rtol=1e-5, atol=1e-5, err_msg=key,
        )


def test_end_to_end_fused_matches_split(env, rng):
    B = 128
    x0 = jnp.asarray(rng.uniform(-8, 8, size=(B, 2)).astype("f4"))
    base = dict(atol=1e-5, max_iterations=40, use_pallas=True)
    res_f = ilqr.solve_batch(
        env, x0, horizon=20,
        config=ilqr.ILQRConfig(**base, fuse_derivatives=True),
    )
    res_s = ilqr.solve_batch(
        env, x0, horizon=20, config=ilqr.ILQRConfig(**base)
    )
    assert int(jnp.sum(res_f.converged)) == B
    np.testing.assert_array_equal(
        np.asarray(res_f.converged), np.asarray(res_s.converged)
    )
    np.testing.assert_allclose(
        np.asarray(res_f.actions), np.asarray(res_s.actions),
        rtol=1e-4, atol=1e-4,
    )
    np.testing.assert_allclose(
        np.asarray(res_f.total_cost), np.asarray(res_s.total_cost),
        rtol=1e-5,
    )


def test_fused_trace_and_bounded(rng):
    """Trace mode + a bounded nav env (boxQP) through the fused path."""
    env_b = make_navigation(
        goal=[8.0, -5.0],
        deceleration={"center": [[3.0, -2.0]], "decay": [2.0]},
        low=-1.0, high=1.0,
    )
    B = 128
    x0 = jnp.asarray(rng.uniform(-6, 6, size=(B, 2)).astype("f4"))
    base = dict(atol=1e-4, max_iterations=12, use_pallas=True, boxqp=True)
    res_f, trace = ilqr.solve_batch(
        env_b, x0, horizon=10,
        config=ilqr.ILQRConfig(**base, fuse_derivatives=True),
        return_trace=True,
    )
    assert trace.J.shape == (12, B)
    res_s = ilqr.solve_batch(
        env_b, x0, horizon=10, config=ilqr.ILQRConfig(**base)
    )
    np.testing.assert_allclose(
        np.asarray(res_f.total_cost), np.asarray(res_s.total_cost),
        rtol=1e-4,
    )
    assert float(jnp.max(jnp.abs(res_f.actions))) <= 1.0 + 1e-6
