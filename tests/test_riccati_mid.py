"""Mid-dim (12 < n,m <= 48) fused Riccati kernel parity.

Round-1 VERDICT missing #3: dims beyond the lane kernel's 12 dropped to
the vmapped scan (~100-250x cliff). ops/riccati_mid_pallas.py is the
sublane-row kernel that removes it; these tests pin it op-for-op against
the scan backward in Pallas interpret mode (float64, tight tolerances).
On-chip performance is covered by benchmarks/middim_bench.py + the verify
recipe.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tfmpc_tpu.core.types import (
    Bounds,
    LinearModel,
    QuadraticFinal,
    QuadraticModel,
)
from tfmpc_tpu.ops.riccati_mid_pallas import (
    riccati_backward_mid,
    riccati_backward_mid_boxqp,
)
from tfmpc_tpu.solvers import ilqr


def _synthetic(rng, B, T, n, m, dtype=jnp.float64, contraction=0.9):
    """Random well-posed batched linearization (stable dynamics, PSD costs)."""
    def psd(k, scale):
        A = rng.standard_normal((B, T, k, k)) * scale
        M = np.einsum("btij,btkj->btik", A, A) + 0.5 * np.eye(k)
        return jnp.asarray(M, dtype)

    f_x = jnp.asarray(
        contraction * np.stack(
            [np.eye(n)] * (B * T)
        ).reshape(B, T, n, n)
        + 0.1 * rng.standard_normal((B, T, n, n)),
        dtype,
    )
    f_u = jnp.asarray(0.3 * rng.standard_normal((B, T, n, m)), dtype)
    lin = LinearModel(
        f=jnp.zeros((B, T, n), dtype), f_x=f_x, f_u=f_u
    )
    quad = QuadraticModel(
        l=jnp.zeros((B, T), dtype),
        l_x=jnp.asarray(rng.standard_normal((B, T, n)), dtype),
        l_u=jnp.asarray(rng.standard_normal((B, T, m)), dtype),
        l_xx=psd(n, 0.3),
        l_uu=psd(m, 0.3),
        l_ux=jnp.asarray(0.1 * rng.standard_normal((B, T, m, n)), dtype),
    )
    final = QuadraticFinal(
        l=jnp.zeros((B,), dtype),
        l_x=jnp.asarray(rng.standard_normal((B, n)), dtype),
        l_xx=psd(n, 0.3)[:, 0],
    )
    mu = jnp.asarray(
        np.where(rng.uniform(size=B) < 0.5, 0.0, rng.uniform(0, 0.3, B)),
        dtype,
    )
    return lin, quad, final, mu


@pytest.mark.parametrize("n,m", [(10, 9), (12, 12), (16, 16)])
def test_mid_kernel_matches_scan(n, m):
    rng = np.random.default_rng(5)
    B, T = 128, 4
    lin, quad, final, mu = _synthetic(rng, B, T, n, m)
    cfg = ilqr.ILQRConfig()
    ok_r, pol_r, dv1_r, dv2_r = jax.vmap(
        lambda l, q, f, mv: ilqr.backward(l, q, f, mv, cfg)
    )(lin, quad, final, mu)
    ok_p, pol_p, dv1_p, dv2_p = riccati_backward_mid(lin, quad, final, mu)
    assert bool(jnp.all(ok_r == ok_p))
    np.testing.assert_allclose(
        np.asarray(pol_p.K), np.asarray(pol_r.K), rtol=1e-9, atol=1e-9
    )
    np.testing.assert_allclose(
        np.asarray(pol_p.k), np.asarray(pol_r.k), rtol=1e-9, atol=1e-9
    )
    np.testing.assert_allclose(
        np.asarray(dv1_p), np.asarray(dv1_r), rtol=1e-9, atol=1e-12
    )
    np.testing.assert_allclose(
        np.asarray(dv2_p), np.asarray(dv2_r), rtol=1e-9, atol=1e-12
    )


def test_mid_kernel_fail_mask():
    """Indefinite Quu flags exactly the bad lanes (restart-loop contract)."""
    rng = np.random.default_rng(6)
    B, T, n, m = 128, 3, 14, 13
    lin, quad, final, mu = _synthetic(rng, B, T, n, m)
    l_uu_bad = quad.l_uu.at[: B // 2].set(
        -10.0 * jnp.eye(m, dtype=quad.l_uu.dtype)[None, None]
    )
    quad = dataclasses.replace(quad, l_uu=l_uu_bad)
    ok, _, _, _ = riccati_backward_mid(
        lin, quad, final, jnp.zeros((B,), quad.l_uu.dtype)
    )
    assert not bool(jnp.any(ok[: B // 2]))
    assert bool(jnp.all(ok[B // 2:]))


ITERS = 4


def test_mid_boxqp_matches_scan():
    rng = np.random.default_rng(7)
    B, T, n, m = 128, 3, 14, 13
    lin, quad, final, mu = _synthetic(rng, B, T, n, m)
    bounds = Bounds(
        low=jnp.full((m,), -0.4, jnp.float64),
        high=jnp.full((m,), 0.4, jnp.float64),
    )
    Ubar = jnp.asarray(
        0.2 * rng.standard_normal((B, T, m)), jnp.float64
    )
    cfg = ilqr.ILQRConfig(boxqp=True, boxqp_iters=ITERS)
    ok_r, pol_r, dv1_r, dv2_r = jax.vmap(
        lambda l, q, f, mv, u: ilqr.backward(
            l, q, f, mv, cfg, bounds=bounds, Ubar=u
        )
    )(lin, quad, final, mu, Ubar)
    ok_p, pol_p, dv1_p, dv2_p = riccati_backward_mid_boxqp(
        lin, quad, final, mu, bounds, Ubar, boxqp_iters=ITERS
    )
    assert bool(jnp.all(ok_r == ok_p))
    np.testing.assert_allclose(
        np.asarray(pol_p.k), np.asarray(pol_r.k), rtol=1e-8, atol=1e-8
    )
    np.testing.assert_allclose(
        np.asarray(pol_p.K), np.asarray(pol_r.K), rtol=1e-8, atol=1e-8
    )
    np.testing.assert_allclose(
        np.asarray(dv1_p), np.asarray(dv1_r), rtol=1e-8, atol=1e-10
    )
    np.testing.assert_allclose(
        np.asarray(dv2_p), np.asarray(dv2_r), rtol=1e-8, atol=1e-10
    )


def test_dispatch_mode():
    """solve_batch routes mid dims to the mid kernel on TPU (and keeps the
    scan on CPU, where interpret-mode cost scales with dims)."""
    from tfmpc_tpu.solvers.ilqr_batched import _riccati_kernel_mode

    rng = np.random.default_rng(8)
    cfg = ilqr.ILQRConfig(use_pallas=True)
    lin16, _, _, _ = _synthetic(rng, 128, 2, 16, 16, dtype=jnp.float32)
    lin6, _, _, _ = _synthetic(rng, 128, 2, 6, 6, dtype=jnp.float32)
    # on the CPU test backend: lane for small, None (scan) for mid
    assert _riccati_kernel_mode(lin6, cfg) == "lane"
    assert _riccati_kernel_mode(lin16, cfg) is None
