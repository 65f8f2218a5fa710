"""Fused Pallas Riccati kernel vs the vmapped-scan reference.

Runs in Pallas interpret mode on the CPU test mesh; the same kernel compiles
via Mosaic on TPU (measured 63x over the scan at B=4096, T=100).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tfmpc_tpu.models.navigation import make_navigation
from tfmpc_tpu.ops.riccati_pallas import riccati_backward_pallas
from tfmpc_tpu.solvers import ilqr
from tfmpc_tpu.solvers.ilqr_batched import _derivatives_batched

CONFIG = ilqr.ILQRConfig()


def _derivs(env, B, T, seed=0, scale=0.3):
    rng = np.random.default_rng(seed)
    n = env.state_size
    m = env.action_size
    x0 = jnp.asarray(rng.uniform(-5, 5, size=(B, n)).astype("float32"))
    U0 = jnp.asarray((rng.normal(size=(B, T, m)) * scale).astype("float32"))
    X0 = jax.vmap(lambda x, u: env.rollout(x, u)[0])(x0, U0)
    return _derivatives_batched(env, X0, U0)


@pytest.fixture(scope="module")
def env():
    return make_navigation(
        goal=[8.0, -5.0], deceleration={"center": [[3.0, -2.0]], "decay": [2.0]}
    )


class TestKernelParity:
    def test_matches_scan_backward(self, env):
        B, T = 256, 12
        lin, quad, fin = _derivs(env, B, T)
        mu = jnp.asarray(
            np.random.default_rng(1).uniform(0, 0.5, size=(B,)).astype("float32")
        )
        ok_r, pol_r, dv1_r, dv2_r = jax.vmap(
            lambda l, q, f, m: ilqr.backward(l, q, f, m, CONFIG)
        )(lin, quad, fin, mu)
        ok_p, pol_p, dv1_p, dv2_p = riccati_backward_pallas(lin, quad, fin, mu)
        assert bool(jnp.all(ok_r == ok_p))
        np.testing.assert_allclose(pol_p.K, pol_r.K, rtol=1e-3, atol=1e-3)
        np.testing.assert_allclose(pol_p.k, pol_r.k, rtol=1e-3, atol=1e-3)
        np.testing.assert_allclose(dv1_p, dv1_r, rtol=1e-3, atol=1e-2)
        np.testing.assert_allclose(dv2_p, dv2_r, rtol=1e-3, atol=1e-2)

    def test_mu_regularization_applied(self, env):
        """Distinct per-scenario mu values must yield distinct gains."""
        B, T = 128, 6
        lin, quad, fin = _derivs(env, B, T)
        same = jax.tree_util.tree_map(lambda a: a[:1].repeat(B, axis=0), (lin, quad, fin))
        lin1, quad1, fin1 = same
        mu = jnp.linspace(0.0, 5.0, B, dtype=jnp.float32)
        _, pol, _, _ = riccati_backward_pallas(lin1, quad1, fin1, mu)
        # gains shrink monotonically-ish with mu; at least they must differ
        k0 = float(jnp.max(jnp.abs(pol.k[0])))
        kB = float(jnp.max(jnp.abs(pol.k[-1])))
        assert k0 != kB
        # and match the scan at both endpoints
        for idx in (0, B - 1):
            _, pol_r, _, _ = ilqr.backward(
                jax.tree_util.tree_map(lambda a: a[idx], lin1),
                jax.tree_util.tree_map(lambda a: a[idx], quad1),
                jax.tree_util.tree_map(lambda a: a[idx], fin1),
                mu[idx],
                CONFIG,
            )
            np.testing.assert_allclose(pol.k[idx], pol_r.k, rtol=1e-3, atol=1e-4)

    def test_fail_flag_on_indefinite(self, env):
        """Negative-definite l_uu makes Quu non-PD -> per-lane fail flag."""
        B, T = 128, 4
        lin, quad, fin = _derivs(env, B, T)
        l_uu_bad = quad.l_uu.at[: B // 2].set(
            -10.0 * jnp.eye(env.action_size)[None, None]
        )
        quad_bad = quad._replace(l_uu=l_uu_bad) if hasattr(quad, "_replace") else None
        import dataclasses

        quad_bad = dataclasses.replace(quad, l_uu=l_uu_bad)
        ok, _, _, _ = riccati_backward_pallas(lin, quad_bad, fin, jnp.zeros((B,)))
        assert not bool(jnp.any(ok[: B // 2]))
        assert bool(jnp.all(ok[B // 2:]))


class TestEndToEnd:
    def test_solve_batch_pallas_matches(self, env):
        """Full batched solve with the kernel converges to the same optimum."""
        B = 128
        x0 = jnp.asarray(
            np.random.default_rng(2).uniform(-8, 8, size=(B, 2)).astype("float32")
        )
        cfg_scan = ilqr.ILQRConfig(atol=1e-5, max_iterations=40)
        cfg_pall = ilqr.ILQRConfig(atol=1e-5, max_iterations=40, use_pallas=True)
        r0 = ilqr.solve_batch(env, x0, horizon=20, config=cfg_scan)
        r1 = ilqr.solve_batch(env, x0, horizon=20, config=cfg_pall)
        assert int(jnp.sum(r1.converged)) == B
        np.testing.assert_allclose(r1.actions, r0.actions, atol=1e-3)
        np.testing.assert_allclose(r1.total_cost, r0.total_cost, rtol=1e-5)

    def test_ragged_batch_falls_back(self, env):
        """B not divisible by 128 silently uses the scan path (still correct)."""
        B = 5
        x0 = jnp.asarray(
            np.random.default_rng(3).uniform(-5, 5, size=(B, 2)).astype("float32")
        )
        cfg = ilqr.ILQRConfig(atol=1e-5, max_iterations=40, use_pallas=True)
        res = ilqr.solve_batch(env, x0, horizon=15, config=cfg)
        assert int(jnp.sum(res.converged)) == B
