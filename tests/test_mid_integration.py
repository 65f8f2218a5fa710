"""solve_batch -> mid-dim kernel INTEGRATION coverage (CPU interpret).

Round-2 VERDICT missing #3: the mid kernel's raw math was interpret-tested
(tests/test_riccati_mid.py) but the solve-level plumbing — kernel-layout
transposes inside ``_backward_batched``, the compacted restart loop
gathering/scattering over the mid kernel, batch padding — only ever ran in
on-chip benches. ``TFMPC_TPU_FORCE_MID_KERNEL=1`` (a test-only override in
``ilqr_batched._force_mid_on_cpu``) routes CPU solves to the mid kernel in
interpret mode so pytest covers that seam; this file also adds the
rollout-kernel parity cases at mid dims (n=16 and the near-VMEM-cap
``[A*n, L]`` scratch extent at n=48) that were previously pinned only at
n <= 6.
"""

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tfmpc_tpu.core.types import Bounds, Policy, pytree_dataclass
from tfmpc_tpu.models.base import Env
from tfmpc_tpu.solvers import ilqr
from tfmpc_tpu.solvers.ilqr_batched import (
    _backward_restarts_batched,
    _riccati_kernel_mode,
)
from test_riccati_mid import _synthetic


@pytest.fixture
def force_mid(monkeypatch):
    monkeypatch.setenv("TFMPC_TPU_FORCE_MID_KERNEL", "1")


def make_chain_env(d: int, bounded: bool = False):
    """Smooth d-dim test env: diffusively coupled nodes with a weak cubic
    damping term (nonlinear so iLQR actually iterates; Mosaic-friendly ops
    so the generic lane adapter kernels trace)."""

    C = (
        -2.0 * np.eye(d) + np.eye(d, k=1) + np.eye(d, k=-1)
    ).astype("f4") * 0.3

    @pytree_dataclass
    class Chain(Env):
        coupling: jax.Array
        bounds: Optional[Bounds] = None

        @property
        def state_size(self):
            return d

        @property
        def action_size(self):
            return d

        def transition(self, x, u):
            return x + 0.1 * (self.coupling @ x - 0.02 * x**3 + u)

        def cost(self, x, u):
            return jnp.sum(x * x) + 0.1 * jnp.sum(u * u)

        def final_cost(self, x):
            return 5.0 * jnp.sum(x * x)

    bounds = None
    if bounded:
        bounds = Bounds(
            low=jnp.full((d,), -1.5, jnp.float32),
            high=jnp.full((d,), 1.5, jnp.float32),
        )
    return Chain(coupling=jnp.asarray(C), bounds=bounds)


class TestSolveBatchMidDispatch:
    def test_mode_override(self, force_mid):
        rng = np.random.default_rng(0)
        cfg = ilqr.ILQRConfig(use_pallas=True)
        lin16, _, _, _ = _synthetic(rng, 128, 2, 16, 16, dtype=jnp.float32)
        assert _riccati_kernel_mode(lin16, cfg) == "mid"

    def test_solve_batch_matches_scan_path(self, force_mid):
        """Full solve through the mid backward kernel (n = 13 > lane limit,
        interpret) == the XLA scan path: covers the layout plumbing that
        only on-chip benches exercised before."""
        env = make_chain_env(13)
        rng = np.random.default_rng(1)
        x0 = jnp.asarray(rng.uniform(-1, 1, size=(128, 13)).astype("f4"))
        base = dict(atol=1e-5, max_iterations=8)
        res_scan = ilqr.solve_batch(
            env, x0, horizon=2, config=ilqr.ILQRConfig(**base)
        )
        res_mid = ilqr.solve_batch(
            env, x0, horizon=2,
            config=ilqr.ILQRConfig(**base, use_pallas=True),
        )
        np.testing.assert_allclose(
            np.asarray(res_mid.total_cost),
            np.asarray(res_scan.total_cost), rtol=1e-4,
        )
        np.testing.assert_allclose(
            np.asarray(res_mid.actions),
            np.asarray(res_scan.actions), rtol=1e-3, atol=1e-4,
        )
        assert (
            np.asarray(res_mid.converged) == np.asarray(res_scan.converged)
        ).all()

    def test_solve_batch_boxqp_matches_scan_path(self, force_mid):
        env = make_chain_env(13, bounded=True)
        rng = np.random.default_rng(2)
        x0 = jnp.asarray(rng.uniform(-1, 1, size=(128, 13)).astype("f4"))
        base = dict(atol=1e-5, max_iterations=6, boxqp=True)
        res_scan = ilqr.solve_batch(
            env, x0, horizon=2, config=ilqr.ILQRConfig(**base)
        )
        res_mid = ilqr.solve_batch(
            env, x0, horizon=2,
            config=ilqr.ILQRConfig(**base, use_pallas=True),
        )
        np.testing.assert_allclose(
            np.asarray(res_mid.total_cost),
            np.asarray(res_scan.total_cost), rtol=1e-4,
        )


class TestCompactedRestartsOverMidKernel:
    def test_restarts_match_scan_restarts(self, force_mid):
        """B = 256 > _RESTART_SUB_BATCH with indefinite l_uu on a few lanes:
        the compacted gather/retry/scatter loop runs OVER the mid kernel and
        must land on the same per-lane mu escalation and policy as the same
        loop over the vmapped scan."""
        rng = np.random.default_rng(3)
        B, T, n, m = 256, 3, 14, 14
        lin, quad, final, _ = _synthetic(rng, B, T, n, m, dtype=jnp.float32)
        bad = np.zeros(B, bool)
        bad[[5, 77, 130, 255]] = True
        l_uu = np.array(quad.l_uu)
        l_uu[bad] = -1.0 * np.eye(m, dtype="f4")
        quad = dataclasses.replace(quad, l_uu=jnp.asarray(l_uu))
        mu0 = jnp.zeros((B,), jnp.float32)
        delta0 = jnp.ones((B,), jnp.float32)
        Ubar = jnp.zeros((B, T, m), jnp.float32)

        out_scan = _backward_restarts_batched(
            lin, quad, final, mu0, delta0,
            ilqr.ILQRConfig(), None, Ubar,
        )
        out_mid = _backward_restarts_batched(
            lin, quad, final, mu0, delta0,
            ilqr.ILQRConfig(use_pallas=True), None, Ubar,
        )
        ok_s, pol_s, _, _, mu_s, _ = out_scan
        ok_m, pol_m, _, _, mu_m, _ = out_mid
        assert bool(jnp.all(ok_m)) and bool(jnp.all(ok_s))
        # identical per-lane escalation sequence -> identical final mu
        # (this is the gather/retry/scatter pin: a wrong index would
        # escalate the wrong lane)
        np.testing.assert_array_equal(np.asarray(mu_m), np.asarray(mu_s))
        assert (np.asarray(mu_m)[bad] > 0).all()
        assert (np.asarray(mu_m)[~bad] == 0).all()
        # good lanes: tight per-lane relative agreement. Restarted lanes
        # sit at the first mu that barely passes the PD probe, where
        # QuuR is near-singular and fp32 op-order differences between the
        # scan and the kernel amplify (measured ~16% rel on this seed) —
        # there only finiteness is pinned; the scan-vs-kernel MATH parity
        # at controlled conditioning lives in tests/test_riccati_mid.py.
        dK = np.abs(np.asarray(pol_m.K) - np.asarray(pol_s.K))
        scale = np.maximum(
            1.0, np.abs(np.asarray(pol_s.K)).reshape(B, -1).max(axis=1)
        )
        rel = dK.reshape(B, -1).max(axis=1) / scale
        assert rel[~bad].max() < 1e-2
        assert np.isfinite(np.asarray(pol_m.K)).all()


class TestRolloutKernelsMidDims:
    """Line-search/materialize kernel parity beyond n <= 6 (round-2 VERDICT:
    the [A*n, L] scratch layout was untested at mid dims)."""

    @pytest.mark.parametrize("d,n_alphas", [(16, 2), (48, 11)])
    def test_linesearch_costs_parity(self, d, n_alphas):
        # d=48, A=11 -> the [A*n, L] = [528, L] scratch extent of the
        # near-VMEM-cap configuration (A=11 is the product alpha grid)
        from tfmpc_tpu.ops.rollout_pallas import linesearch_costs_pallas
        from tfmpc_tpu.solvers.ilqr import forward

        env = make_chain_env(d)
        rng = np.random.default_rng(4)
        B, T = 128, 2
        x0 = jnp.asarray(rng.uniform(-1, 1, size=(B, d)).astype("f4"))
        U = jnp.asarray(0.3 * rng.standard_normal((B, T, d)).astype("f4"))
        X, _ = jax.vmap(env.rollout)(x0, U)
        policy = Policy(
            K=jnp.asarray(
                0.02 * rng.standard_normal((B, T, d, d)).astype("f4")
            ),
            k=jnp.asarray(0.05 * rng.standard_normal((B, T, d)).astype("f4")),
        )
        alphas = ilqr.ILQRConfig(num_alphas=n_alphas).alphas_static()
        J_kernel = linesearch_costs_pallas(env, X, U, policy, alphas)
        J_ref = jax.vmap(
            lambda x, u, p: jax.vmap(
                lambda a: forward(env, x, u, p, a)[2]
            )(jnp.asarray(alphas, X.dtype))
        )(X, U, policy)
        np.testing.assert_allclose(
            np.asarray(J_kernel), np.asarray(J_ref), rtol=2e-4, atol=1e-3
        )

    def test_materialize_parity_n16(self):
        from tfmpc_tpu.ops.rollout_pallas import rollout_alpha_pallas
        from tfmpc_tpu.solvers.ilqr import forward

        env = make_chain_env(16)
        rng = np.random.default_rng(5)
        B, T, d = 128, 2, 16
        x0 = jnp.asarray(rng.uniform(-1, 1, size=(B, d)).astype("f4"))
        U = jnp.asarray(0.3 * rng.standard_normal((B, T, d)).astype("f4"))
        X, _ = jax.vmap(env.rollout)(x0, U)
        policy = Policy(
            K=jnp.asarray(
                0.02 * rng.standard_normal((B, T, d, d)).astype("f4")
            ),
            k=jnp.asarray(0.05 * rng.standard_normal((B, T, d)).astype("f4")),
        )
        alpha_vec = jnp.asarray(rng.choice([1.0, 0.5], size=(B,)).astype("f4"))
        X_k, U_k, J_k = rollout_alpha_pallas(env, X, U, policy, alpha_vec)
        X_r, U_r, J_r = jax.vmap(
            lambda x, u, p, a: forward(env, x, u, p, a)
        )(X, U, policy, alpha_vec)
        np.testing.assert_allclose(
            np.asarray(U_k), np.asarray(U_r), rtol=2e-4, atol=1e-4
        )
        np.testing.assert_allclose(
            np.asarray(J_k), np.asarray(J_r), rtol=2e-4, atol=1e-3
        )


class TestVmemGuard:
    def test_vmem_limit_schedule(self):
        """Dims past the compiler's default 16 MB scoped-VMEM budget raise
        ``vmem_limit_bytes`` (chip-measured: d=28 boxQP needs 19.1 MB,
        d=32 unconstrained 17.3 MB — round-2 ADVICE: the 25-48 range was
        unvalidated and would have died in Mosaic's allocator)."""
        from tfmpc_tpu.ops.riccati_mid_pallas import (
            _MID_RAISED_VMEM_BYTES,
            _mid_vmem_limit,
            mid_kernel_supported,
        )

        assert _mid_vmem_limit(16, 16, True) is None
        assert _mid_vmem_limit(24, 24, True) is None
        assert _mid_vmem_limit(28, 28, False) is None
        assert _mid_vmem_limit(28, 28, True) == _MID_RAISED_VMEM_BYTES
        assert _mid_vmem_limit(32, 32, False) == _MID_RAISED_VMEM_BYTES
        assert _mid_vmem_limit(48, 48, True) == _MID_RAISED_VMEM_BYTES
        assert mid_kernel_supported(48, 48, boxqp=True)
        assert not mid_kernel_supported(49, 49)

    def test_unsupported_dims_fall_back_to_scan(self, force_mid):
        rng = np.random.default_rng(6)
        cfg = ilqr.ILQRConfig(use_pallas=True)
        lin49, _, _, _ = _synthetic(rng, 128, 1, 49, 49, dtype=jnp.float32)
        assert _riccati_kernel_mode(lin49, cfg) is None

    def test_rollout_kernels_share_the_dim_ceiling(self):
        """Past MID_DIM_MAX the ROLLOUT kernels must also fall back (their
        per-step K @ dx emission was never Mosaic-compiled there and the
        backward has already fallen back to the scan): the full solve runs
        on the pure XLA path instead of risking a kernel compile failure."""
        from tfmpc_tpu.solvers.ilqr_batched import _use_pallas_rollout

        cfg = ilqr.ILQRConfig(use_pallas=True)
        env48, env49 = make_chain_env(48), make_chain_env(49)
        X = jnp.zeros((128, 3, 49), jnp.float32)
        assert _use_pallas_rollout(env48, X, cfg)
        assert not _use_pallas_rollout(env49, X, cfg)
        # and the whole solve still works there (XLA path end to end)
        x0 = jnp.asarray(
            np.random.default_rng(7).uniform(-1, 1, size=(8, 49)).astype("f4")
        )
        res = ilqr.solve_batch(
            env49, x0, horizon=2,
            config=ilqr.ILQRConfig(max_iterations=3, use_pallas=True),
        )
        assert bool(jnp.all(jnp.isfinite(res.total_cost)))
