"""Autodiff linearization vs float64 central finite differences, all envs.

The `get_linear_transition` / `get_quadratic_cost` / `get_quadratic_final_cost`
surface is the DiffEnv core the solvers stand on (SURVEY §3.4 calls it "the
single most important API to replicate"); this pins every env family's
forward-mode derivatives against an independent numerical estimate.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tfmpc_tpu.models.hvac import make_hvac
from tfmpc_tpu.models.navigation import make_navigation
from tfmpc_tpu.models.reservoir import make_reservoir

H = 1e-5


def _envs_and_points(rng):
    nav = make_navigation(
        goal=[8.0, -5.0],
        deceleration={"center": [[3.0, -2.0], [1.0, 1.0]], "decay": [2.0, 1.0]},
    )
    hvac = make_hvac(
        [[0, 1, 0], [1, 0, 1], [0, 1, 0]], is_out=[1, 0, 1], is_hall=[0, 1, 0]
    )
    res = make_reservoir(4)
    return {
        # points chosen away from hinge kinks (FD is ill-defined exactly there)
        "navigation": (nav, rng.uniform(-4, 4, 2), rng.uniform(-1, 1, 2)),
        "hvac": (hvac, rng.uniform(10, 18, 3), rng.uniform(0.5, 6, 3)),
        "reservoir": (res, rng.uniform(25, 80, 4), rng.uniform(1, 20, 4)),
    }


def _fd_jac(fn, x, h=H):
    n = x.shape[0]
    cols = []
    for i in range(n):
        e = np.zeros(n)
        e[i] = h
        cols.append((fn(x + e) - fn(x - e)) / (2 * h))
    return np.stack(cols, axis=-1)


@pytest.mark.parametrize("name", ["navigation", "hvac", "reservoir"])
def test_linear_transition_vs_fd(name, rng):
    env, x, u = _envs_and_points(rng)[name]
    x64, u64 = jnp.asarray(x), jnp.asarray(u)
    lin = env.get_linear_transition(x64, u64)

    f_np = lambda xv: np.asarray(env.transition(jnp.asarray(xv), u64))
    g_np = lambda uv: np.asarray(env.transition(x64, jnp.asarray(uv)))
    np.testing.assert_allclose(np.asarray(lin.f_x), _fd_jac(f_np, x),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(lin.f_u), _fd_jac(g_np, u),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(
        np.asarray(lin.f), np.asarray(env.transition(x64, u64))
    )


@pytest.mark.parametrize("name", ["navigation", "hvac", "reservoir"])
def test_quadratic_cost_vs_fd(name, rng):
    env, x, u = _envs_and_points(rng)[name]
    x64, u64 = jnp.asarray(x), jnp.asarray(u)
    quad = env.get_quadratic_cost(x64, u64)

    cx = lambda xv: float(env.cost(jnp.asarray(xv), u64))
    cu = lambda uv: float(env.cost(x64, jnp.asarray(uv)))
    np.testing.assert_allclose(
        np.asarray(quad.l_x), _fd_jac(lambda v: np.array(cx(v)), x).ravel(),
        rtol=1e-4, atol=1e-4,
    )
    np.testing.assert_allclose(
        np.asarray(quad.l_u), _fd_jac(lambda v: np.array(cu(v)), u).ravel(),
        rtol=1e-4, atol=1e-4,
    )
    # Hessian blocks: FD of the autodiff gradient (more stable than FD^2)
    gx = lambda xv: np.asarray(
        env.get_quadratic_cost(jnp.asarray(xv), u64).l_x
    )
    gu = lambda uv: np.asarray(
        env.get_quadratic_cost(x64, jnp.asarray(uv)).l_u
    )
    gux = lambda xv: np.asarray(
        env.get_quadratic_cost(jnp.asarray(xv), u64).l_u
    )
    np.testing.assert_allclose(np.asarray(quad.l_xx), _fd_jac(gx, x),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(quad.l_uu), _fd_jac(gu, u),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(quad.l_ux), _fd_jac(gux, x),
                               rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize("name", ["navigation", "hvac", "reservoir"])
def test_quadratic_final_cost_vs_fd(name, rng):
    env, x, _ = _envs_and_points(rng)[name]
    x64 = jnp.asarray(x)
    fin = env.get_quadratic_final_cost(x64)
    c = lambda xv: np.array(float(env.final_cost(jnp.asarray(xv))))
    np.testing.assert_allclose(np.asarray(fin.l_x), _fd_jac(c, x).ravel(),
                               rtol=1e-4, atol=1e-4)
    g = lambda xv: np.asarray(
        env.get_quadratic_final_cost(jnp.asarray(xv)).l_x
    )
    np.testing.assert_allclose(np.asarray(fin.l_xx), _fd_jac(g, x),
                               rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize("name", ["navigation", "hvac", "reservoir"])
def test_analytic_hook_matches_autodiff(name, rng):
    """Env.analytic_derivatives (closed-form optimization hook) must equal
    the autodiff linearization to fp tolerance along a whole trajectory."""
    env, x, u = _envs_and_points(rng)[name]
    T = 12
    U = env.clip(jnp.asarray(
        np.stack([u + 0.1 * rng.standard_normal(u.shape) for _ in range(T)])
    ))
    X, _ = env.rollout(jnp.asarray(x), U)

    hook = env.analytic_derivatives(X, U)
    assert hook is not None
    lin_a, quad_a, fin_a = hook
    lin_d = env.get_linear_transition(X[:-1], U, batch=True)
    quad_d = env.get_quadratic_cost(X[:-1], U, batch=True)
    fin_d = env.get_quadratic_final_cost(X[-1])

    for a, d in [(lin_a, lin_d), (quad_a, quad_d), (fin_a, fin_d)]:
        for la, ld in zip(
            jax.tree_util.tree_leaves(a), jax.tree_util.tree_leaves(d)
        ):
            np.testing.assert_allclose(
                np.asarray(la), np.asarray(ld), rtol=1e-7, atol=1e-7
            )
