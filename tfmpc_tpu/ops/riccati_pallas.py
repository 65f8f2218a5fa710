"""Fused Pallas kernel: the entire batched Riccati backward pass in ONE kernel.

Why: the XLA path (vmap of a reverse ``lax.scan``) issues ~50 tiny
HBM-round-tripping ops per timestep; at B=4096, T=100 the backward pass is
latency-bound, orders of magnitude off roofline. This kernel is the TPU-native
"custom op" the reference's stock-TF kernels map to (SURVEY §2.2: the native
analogue on TPU is Pallas/Mosaic):

- **Layout**: batch-last ``[T, entries, B]`` so every matrix entry is a
  [lanes]-wide vector — the VPU (8x128) runs one small-matrix op across 128+
  scenarios per cycle. Batch-first layouts would put n (=2..8) in the lane
  dimension and waste >90% of the machine.
- **Fusion**: the whole per-timestep chain (form Q blocks -> regularize ->
  Cholesky -> two triangular solves -> value update -> expected-improvement
  accumulation) runs register/VMEM-resident; HBM sees exactly one read of the
  linearization tensors and one write of (K, k) — speed-of-light traffic.
- **Grid**: ``(B/BB, T)``, time innermost; TPU grids execute sequentially, so
  the value function carries across timesteps in VMEM scratch and is
  re-initialized from the final-cost block when each batch block starts.
- **Small-matrix algebra**: n, m are static and tiny; all loops are unrolled
  Python, each emitted op a [1, BB] vector op. The Cholesky PD probe
  accumulates a per-lane fail mask (NaN/nonpositive pivot), consumed by the
  solver's mu-restart loop.

Contract matches ``ilqr_batched._backward_batched`` (unconstrained Tassa-
regularized backward; boxQP stays on the scan path).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tfmpc_tpu.core.types import Policy


def _kernel(T: int, n: int, m: int):
    nn, nm, mn, mm = n * n, n * m, m * n, m * m

    def kernel(
        fx_ref,    # [1, nn, BB]  f_x[t] row-major (i*n+j) = d x'_i / d x_j
        fu_ref,    # [1, nm, BB]  f_u[t] (i*m+a)
        lx_ref,    # [1, n, BB]
        lu_ref,    # [1, m, BB]
        lxx_ref,   # [1, nn, BB]
        luu_ref,   # [1, mm, BB]
        lux_ref,   # [1, mn, BB]  (a*n+i)
        mu_ref,    # [1, BB]
        VT_ref,    # [nn, BB] final-cost Hessian
        vT_ref,    # [n, BB] final-cost gradient
        K_ref,     # [1, mn, BB] out
        k_ref,     # [1, m, BB] out
        dV1_ref,   # [1, BB] out
        dV2_ref,   # [1, BB] out
        fail_ref,  # [1, BB] out (0.0 ok / 1.0 fail)
        Vxx_s,     # scratch [nn, BB]
        vx_s,      # scratch [n, BB]
        acc_s,     # scratch [3, BB]: dV1, dV2, fail
    ):
        t = pl.program_id(1)

        @pl.when(t == 0)
        def _init():
            Vxx_s[:, :] = VT_ref[:, :]
            vx_s[:, :] = vT_ref[:, :]
            acc_s[:, :] = jnp.zeros_like(acc_s)

        mu = mu_ref[0, :]

        V = [[Vxx_s[i * n + j, :] for j in range(n)] for i in range(n)]
        v = [vx_s[i, :] for i in range(n)]
        fx = [[fx_ref[0, i * n + j, :] for j in range(n)] for i in range(n)]
        fu = [[fu_ref[0, i * m + a, :] for a in range(m)] for i in range(n)]
        lx = [lx_ref[0, i, :] for i in range(n)]
        lu = [lu_ref[0, a, :] for a in range(m)]
        lxx = [[lxx_ref[0, i * n + j, :] for j in range(n)] for i in range(n)]
        luu = [[luu_ref[0, a * m + b, :] for b in range(m)] for a in range(m)]
        lux = [[lux_ref[0, a * n + i, :] for i in range(n)] for a in range(m)]

        VR = [[V[i][j] + jnp.where(i == j, mu, 0.0) for j in range(n)]
              for i in range(n)]

        # Q_x = l_x + f_x^T v ; Q_u = l_u + f_u^T v
        Qx = [lx[i] + sum(fx[p][i] * v[p] for p in range(n)) for i in range(n)]
        Qu = [lu[a] + sum(fu[p][a] * v[p] for p in range(n)) for a in range(m)]

        # W = V f_x ; WR = (V + mu I) f_u  (shared intermediates, 2 n^3 ops)
        W = [[sum(V[p][q] * fx[q][j] for q in range(n)) for j in range(n)]
             for p in range(n)]
        Wu = [[sum(V[p][q] * fu[q][b] for q in range(n)) for b in range(m)]
              for p in range(n)]
        WRu = [[sum(VR[p][q] * fu[q][b] for q in range(n)) for b in range(m)]
               for p in range(n)]
        WRx = [[sum(VR[p][q] * fx[q][j] for q in range(n)) for j in range(n)]
               for p in range(n)]

        Qxx = [[lxx[i][j] + sum(fx[p][i] * W[p][j] for p in range(n))
                for j in range(n)] for i in range(n)]
        Quu = [[luu[a][b] + sum(fu[p][a] * Wu[p][b] for p in range(n))
                for b in range(m)] for a in range(m)]
        Qux = [[lux[a][i] + sum(fu[p][a] * W[p][i] for p in range(n))
                for i in range(n)] for a in range(m)]
        QuuR = [[luu[a][b] + sum(fu[p][a] * WRu[p][b] for p in range(n))
                 for b in range(m)] for a in range(m)]
        QuxR = [[lux[a][i] + sum(fu[p][a] * WRx[p][i] for p in range(n))
                 for i in range(n)] for a in range(m)]

        # Unrolled Cholesky of QuuR with per-lane PD probe.
        L = [[None] * m for _ in range(m)]
        fail = acc_s[2, :]
        for a in range(m):
            s = QuuR[a][a] - sum(L[a][b] * L[a][b] for b in range(a))
            fail = jnp.where((s <= 0.0) | ~jnp.isfinite(s), 1.0, fail)
            La = jnp.sqrt(jnp.maximum(s, 1e-30))
            L[a][a] = La
            inv = 1.0 / La
            for c in range(a + 1, m):
                L[c][a] = (
                    QuuR[c][a] - sum(L[c][b] * L[a][b] for b in range(a))
                ) * inv

        def chol_solve(rhs):  # rhs: list of m vectors -> QuuR^{-1} rhs
            y = [None] * m
            for a in range(m):
                y[a] = (rhs[a] - sum(L[a][b] * y[b] for b in range(a))) / L[a][a]
            x = [None] * m
            for a in reversed(range(m)):
                x[a] = (
                    y[a] - sum(L[c][a] * x[c] for c in range(a + 1, m))
                ) / L[a][a]
            return x

        kvec = [-s for s in chol_solve(Qu)]
        Kcols = [chol_solve([QuxR[a][i] for a in range(m)]) for i in range(n)]
        K = [[-Kcols[i][a] for i in range(n)] for a in range(m)]

        # Expected improvement with UNregularized Q terms.
        acc_s[0, :] = acc_s[0, :] + sum(kvec[a] * Qu[a] for a in range(m))
        acc_s[1, :] = acc_s[1, :] + 0.5 * sum(
            kvec[a] * Quu[a][b] * kvec[b] for a in range(m) for b in range(m)
        )
        acc_s[2, :] = fail

        # Value update (unregularized), symmetrized.
        Quu_k = [sum(Quu[a][b] * kvec[b] for b in range(m)) for a in range(m)]
        Quu_K = [[sum(Quu[a][b] * K[b][j] for b in range(m)) for j in range(n)]
                 for a in range(m)]
        Vn = [[None] * n for _ in range(n)]
        for i in range(n):
            for j in range(i, n):
                val = Qxx[i][j]
                val = val + sum(K[a][i] * Quu_K[a][j] for a in range(m))
                val = val + sum(K[a][i] * Qux[a][j] for a in range(m))
                val = val + sum(Qux[a][i] * K[a][j] for a in range(m))
                Vn[i][j] = val
                Vn[j][i] = val
        vn = [
            Qx[i]
            + sum(K[a][i] * Quu_k[a] for a in range(m))
            + sum(K[a][i] * Qu[a] for a in range(m))
            + sum(Qux[a][i] * kvec[a] for a in range(m))
            for i in range(n)
        ]

        for i in range(n):
            for j in range(n):
                Vxx_s[i * n + j, :] = Vn[i][j]
            vx_s[i, :] = vn[i]

        for a in range(m):
            for i in range(n):
                K_ref[0, a * n + i, :] = K[a][i]
            k_ref[0, a, :] = kvec[a]

        dV1_ref[0, :] = acc_s[0, :]
        dV2_ref[0, :] = acc_s[1, :]
        fail_ref[0, :] = acc_s[2, :]

    return kernel


@functools.partial(jax.jit, static_argnames=("interpret",))
def _riccati_pallas_raw(fx, fu, lx, lu, lxx, luu, lux, mu, VT, vT, *,
                        interpret: bool):
    """Inputs in kernel layout [T, entries, B]; returns (K, k, dV1, dV2, fail)."""
    T, nn, B = fx.shape
    n = int(round(nn ** 0.5))
    m = fu.shape[1] // n
    BB = B if B <= 2048 else 2048
    while B % BB:
        BB //= 2
    nb = B // BB

    tmap = lambda bi, t: (T - 1 - t, 0, bi)
    bmap = lambda bi, t: (0, bi)

    spec = lambda e: pl.BlockSpec((1, e, BB), tmap, memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        _kernel(T, n, m),
        grid=(nb, T),
        in_specs=[
            spec(nn), spec(n * m), spec(n), spec(m), spec(nn), spec(m * m),
            spec(m * n),
            pl.BlockSpec((1, BB), bmap, memory_space=pltpu.VMEM),      # mu
            pl.BlockSpec((nn, BB), lambda bi, t: (0, bi), memory_space=pltpu.VMEM),
            pl.BlockSpec((n, BB), lambda bi, t: (0, bi), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            spec(m * n),
            spec(m),
            pl.BlockSpec((1, BB), bmap, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, BB), bmap, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, BB), bmap, memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((T, m * n, B), fx.dtype),
            jax.ShapeDtypeStruct((T, m, B), fx.dtype),
            jax.ShapeDtypeStruct((1, B), fx.dtype),
            jax.ShapeDtypeStruct((1, B), fx.dtype),
            jax.ShapeDtypeStruct((1, B), fx.dtype),
        ],
        scratch_shapes=[
            pltpu.VMEM((nn, BB), fx.dtype),
            pltpu.VMEM((n, BB), fx.dtype),
            pltpu.VMEM((3, BB), fx.dtype),
        ],
        interpret=interpret,
    )(fx, fu, lx, lu, lxx, luu, lux, mu, VT, vT)
    return out


def riccati_backward_pallas(lin, quad, final, mu):
    """Adapter from solver-layout pytrees to the fused kernel.

    lin.f_x: [B, T, n, n] etc.; mu: [B]. Returns ``(ok, Policy, dV1, dV2)``
    exactly like the vmapped scan backward.
    """
    B, T, n, _ = lin.f_x.shape
    m = lin.f_u.shape[-1]

    to_k = lambda a, e: jnp.transpose(
        a.reshape(B, T, e), (1, 2, 0)
    )  # [B,T,...] -> [T, e, B]
    fx = to_k(lin.f_x, n * n)
    fu = to_k(lin.f_u, n * m)
    lx = to_k(quad.l_x, n)
    lu = to_k(quad.l_u, m)
    lxx = to_k(quad.l_xx, n * n)
    luu = to_k(quad.l_uu, m * m)
    lux = to_k(quad.l_ux, m * n)
    VT = jnp.transpose(final.l_xx.reshape(B, n * n), (1, 0))
    vT = jnp.transpose(final.l_x, (1, 0))
    mu2 = mu.astype(lin.f_x.dtype).reshape(1, B)

    interpret = jax.default_backend() == "cpu"
    K, k, dV1, dV2, fail = _riccati_pallas_raw(
        fx, fu, lx, lu, lxx, luu, lux, mu2, VT, vT, interpret=interpret
    )

    K = jnp.transpose(K, (2, 0, 1)).reshape(B, T, m, n)
    k = jnp.transpose(k, (2, 0, 1)).reshape(B, T, m)
    ok = fail[0] == 0.0
    return ok, Policy(K=K, k=k), dV1[0], dV2[0]
