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

Contract matches ``ilqr_batched._backward_batched``. Two variants share the
kernel body:

- unconstrained (``riccati_backward_pallas``): Cholesky + two solves per step;
- control-limited DDP (``riccati_backward_boxqp_pallas``): the per-step
  Q-minimization is the fixed-iteration projected-Newton boxQP of
  ops/boxqp.py (Tassa, Mansard & Todorov 2014), fully unrolled in-register —
  clamped-set masks, masked-free-system Cholesky and the projected
  backtracking line search are all per-lane vector arithmetic, matching the
  scan path's semantics op-for-op.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tfmpc_tpu.core.types import Policy


def _chol_unrolled(M, m, fail=None):
    """Unrolled per-lane Cholesky of an m x m list-of-lists of [BB] vectors.

    With ``fail`` given, accumulates a per-lane failure mask on nonpositive /
    nonfinite pivots (clamping the sqrt so downstream stays finite); without
    it, NaNs propagate — matching ``jnp.linalg.cholesky`` semantics that the
    scan-path boxQP inner loop relies on (NaN step -> no improvement -> done).
    """
    L = [[None] * m for _ in range(m)]
    for a in range(m):
        s = M[a][a] - sum(L[a][b] * L[a][b] for b in range(a))
        if fail is not None:
            fail = jnp.where((s <= 0.0) | ~jnp.isfinite(s), 1.0, fail)
            La = jnp.sqrt(jnp.maximum(s, 1e-30))
        else:
            La = jnp.sqrt(s)
        L[a][a] = La
        inv = 1.0 / La
        for c in range(a + 1, m):
            L[c][a] = (
                M[c][a] - sum(L[c][b] * L[a][b] for b in range(a))
            ) * inv
    return L, fail


def _chol_solve_unrolled(L, rhs, m):
    """Forward/back substitution on per-lane vectors."""
    y = [None] * m
    for a in range(m):
        y[a] = (rhs[a] - sum(L[a][b] * y[b] for b in range(a))) / L[a][a]
    x = [None] * m
    for a in reversed(range(m)):
        x[a] = (y[a] - sum(L[c][a] * x[c] for c in range(a + 1, m))) / L[a][a]
    return x


def _boxqp_lane(H, q, lo, hi, m, newton_iters, ls_alphas, grad_tol=1e-8):
    """Per-lane projected-Newton boxQP (ops/boxqp.py, lane-major).

    H: m x m list-of-lists of [BB] vectors (PD per lane); q, lo, hi: m-lists.
    Returns ``(x, free, L_free, fail)`` — minimizer, final free mask (1.0 =
    free), Cholesky of the masked free system (for the K rows), and the
    pivot-failure mask of that final factorization.
    """
    zero = jnp.zeros_like(q[0])

    def objective(xv):
        return 0.5 * sum(
            xv[a] * H[a][b] * xv[b] for a in range(m) for b in range(m)
        ) + sum(q[a] * xv[a] for a in range(m))

    def free_mask(xv, g):
        free = []
        for a in range(m):
            at_lo = (xv[a] <= lo[a]) & (g[a] > 0.0)
            at_hi = (xv[a] >= hi[a]) & (g[a] < 0.0)
            free.append(jnp.where(at_lo | at_hi, zero, zero + 1.0))
        return free

    def masked_system(free):
        return [
            [
                free[a] * free[b] * H[a][b]
                + ((1.0 - free[a]) if a == b else 0.0)
                for b in range(m)
            ]
            for a in range(m)
        ]

    x = [jnp.clip(zero, lo[a], hi[a]) for a in range(m)]
    done = zero  # 0.0 running / 1.0 frozen

    for _ in range(newton_iters):
        g = [q[a] + sum(H[a][b] * x[b] for b in range(m)) for a in range(m)]
        free = free_mask(x, g)
        gfree2 = sum(free[a] * g[a] * g[a] for a in range(m))
        nfree = sum(free)
        converged = (gfree2 < grad_tol * grad_tol) | (nfree == 0.0)

        L, _ = _chol_unrolled(masked_system(free), m)  # NaNs propagate
        d = _chol_solve_unrolled(L, [free[a] * g[a] for a in range(m)], m)
        d = [-da for da in d]

        obj_now = objective(x)
        found = zero
        xn = list(x)
        for i in range(ls_alphas):  # alpha = 1, 1/2, 1/4, ... (boxqp.py grid)
            alpha = 2.0 ** (-i)
            cand = [
                jnp.clip(x[a] + alpha * d[a], lo[a], hi[a]) for a in range(m)
            ]
            improve = (objective(cand) < obj_now - 1e-12) & (found == 0.0)
            xn = [jnp.where(improve, cand[a], xn[a]) for a in range(m)]
            found = jnp.where(improve, 1.0, found)

        blocked = done + converged  # boolean-ish: frozen before this iter
        x = [
            jnp.where((blocked == 0.0) & (found == 1.0), xn[a], x[a])
            for a in range(m)
        ]
        done = jnp.where(converged | (found == 0.0), 1.0, done)

    # Final clamped set + factorization at the solution (for the K rows).
    g = [q[a] + sum(H[a][b] * x[b] for b in range(m)) for a in range(m)]
    free = free_mask(x, g)
    L_free, fail = _chol_unrolled(masked_system(free), m, fail=zero)
    return x, free, L_free, fail


def _kernel(T: int, n: int, m: int, boxqp_iters: int = 0, ls_alphas: int = 8,
            TB: int = 1, ddp: bool = False):
    """Kernel body builder; ``boxqp_iters > 0`` selects the control-limited
    variant (three extra inputs: ubar, lo, hi); ``ddp`` adds the full-DDP
    dynamics-Hessian inputs (fxx, fux, fuu) and their v-contractions (the
    round-5 superset: without this the DDP backward fell to the vmapped
    scan, a measured 39x cliff at nav shapes — ddp_probe.py). ``TB``
    timesteps are processed per grid step (reverse time inside the block);
    the value function stays in registers across the block and ALL output
    stores are issued after the sequential chain, which is what keeps
    time-blocking a win (interleaved per-step stores measured a large
    regression)."""
    use_boxqp = boxqp_iters > 0

    def kernel(*refs):
        (fx_ref, fu_ref, lx_ref, lu_ref, lxx_ref, luu_ref, lux_ref,
         mu_ref) = refs[:8]
        idx = 8
        if use_boxqp:
            ubar_ref, lo_ref, hi_ref = refs[idx:idx + 3]
            idx += 3
        if ddp:
            fxx_ref, fux_ref, fuu_ref = refs[idx:idx + 3]
            idx += 3
        VT_ref, vT_ref = refs[idx:idx + 2]
        K_ref, k_ref, dV1_ref, dV2_ref, fail_ref = refs[idx + 2:idx + 7]
        Vxx_s, vx_s, acc_s = refs[idx + 7:]

        t = pl.program_id(1)

        @pl.when(t == 0)
        def _init():
            Vxx_s[:, :] = VT_ref[:, :]
            vx_s[:, :] = vT_ref[:, :]
            acc_s[:, :] = jnp.zeros_like(acc_s)

        mu = mu_ref[0, :]
        V = [[Vxx_s[i * n + j, :] for j in range(n)] for i in range(n)]
        v = [vx_s[i, :] for i in range(n)]
        dV1, dV2, fail = acc_s[0, :], acc_s[1, :], acc_s[2, :]

        bufK, bufk = [None] * TB, [None] * TB
        for tl in reversed(range(TB)):
            fx = [[fx_ref[tl, i * n + j, :] for j in range(n)]
                  for i in range(n)]
            fu = [[fu_ref[tl, i * m + a, :] for a in range(m)]
                  for i in range(n)]
            lx = [lx_ref[tl, i, :] for i in range(n)]
            lu = [lu_ref[tl, a, :] for a in range(m)]
            lxx = [[lxx_ref[tl, i * n + j, :] for j in range(n)]
                   for i in range(n)]
            luu = [[luu_ref[tl, a * m + b, :] for b in range(m)]
                   for a in range(m)]
            lux = [[lux_ref[tl, a * n + i, :] for i in range(n)]
                   for a in range(m)]

            if use_boxqp:
                ubar = [ubar_ref[tl, a, :] for a in range(m)]
                qp_bounds = (
                    [lo_ref[a, 0] - ubar[a] for a in range(m)],
                    [hi_ref[a, 0] - ubar[a] for a in range(m)],
                )
            else:
                qp_bounds = None

            if ddp:
                sec = (
                    [[[fxx_ref[tl, (p * n + i) * n + j, :] for j in range(n)]
                      for i in range(n)] for p in range(n)],
                    [[[fux_ref[tl, (p * m + a) * n + i, :] for i in range(n)]
                      for a in range(m)] for p in range(n)],
                    [[[fuu_ref[tl, (p * m + a) * m + b, :] for b in range(m)]
                      for a in range(m)] for p in range(n)],
                )
            else:
                sec = None

            K, kvec, V, v, dV1, dV2, fail = _riccati_step_math(
                n, m, fx, fu, lx, lu, lxx, luu, lux, mu, qp_bounds,
                boxqp_iters, ls_alphas, V, v, dV1, dV2, fail, sec=sec,
            )
            bufK[tl], bufk[tl] = K, kvec

        for tl in range(TB):
            for a in range(m):
                for i in range(n):
                    K_ref[tl, a * n + i, :] = bufK[tl][a][i]
                k_ref[tl, a, :] = bufk[tl][a]
        for i in range(n):
            for j in range(n):
                Vxx_s[i * n + j, :] = V[i][j]
            vx_s[i, :] = v[i]
        acc_s[0, :] = dV1
        acc_s[1, :] = dV2
        acc_s[2, :] = fail
        dV1_ref[0, :] = dV1
        dV2_ref[0, :] = dV2
        fail_ref[0, :] = fail

    return kernel


def _riccati_step_math(n, m, fx, fu, lx, lu, lxx, luu, lux, mu, qp_bounds,
                       boxqp_iters, ls_alphas, V, v, dV1, dV2, fail,
                       sec=None):
    """One Riccati timestep on per-lane entry lists — pure function of the
    incoming value function ``(V, v)`` and accumulators, returning
    ``(K, k, V_next, v_next, dV1, dV2, fail)`` (shared by both constraint
    variants; the kernel owns all scratch/output stores).

    ``qp_bounds``: None for the unconstrained variant, else ``(lo, hi)``
    m-lists of per-lane bounds already shifted by ubar (delta coordinates).
    ``sec``: None for iLQR, else ``(fxx, fux, fuu)`` nested per-lane entry
    lists (leading index = transition OUTPUT component p) — the full-DDP
    tensor terms, matching ``ilqr.backward``'s ddp branch op-for-op
    including the COMBINED regularization (mu*I_m added to the regularized
    Quu on top of Tassa's V'+muI; see ILQRConfig.ddp for why).
    """
    use_boxqp = qp_bounds is not None

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

    if sec is not None:
        fxx2, fux2, fuu2 = sec
        t_xx = [[sum(v[p] * fxx2[p][i][j] for p in range(n))
                 for j in range(n)] for i in range(n)]
        t_ux = [[sum(v[p] * fux2[p][a][i] for p in range(n))
                 for i in range(n)] for a in range(m)]
        t_uu = [[sum(v[p] * fuu2[p][a][b] for p in range(n))
                 for b in range(m)] for a in range(m)]
        Qxx = [[Qxx[i][j] + t_xx[i][j] for j in range(n)] for i in range(n)]
        Quu = [[Quu[a][b] + t_uu[a][b] for b in range(m)] for a in range(m)]
        Qux = [[Qux[a][i] + t_ux[a][i] for i in range(n)] for a in range(m)]
        QuuR = [
            [
                QuuR[a][b] + t_uu[a][b] + (mu if a == b else 0.0)
                for b in range(m)
            ]
            for a in range(m)
        ]
        QuxR = [[QuxR[a][i] + t_ux[a][i] for i in range(n)]
                for a in range(m)]

    # Unrolled Cholesky of QuuR with per-lane PD probe (both variants —
    # the scan path probes Quu_reg before boxQP too).
    L, fail = _chol_unrolled(QuuR, m, fail=fail)

    if use_boxqp:
        # Control-limited DDP: k from projected-Newton boxQP within
        # [low - ubar, high - ubar]; K rows from the masked free system
        # (exact zeros on clamped dims).
        lo, hi = qp_bounds
        kvec, free, L_free, fail_qp = _boxqp_lane(
            QuuR, Qu, lo, hi, m, boxqp_iters, ls_alphas
        )
        fail = jnp.where(fail_qp > 0.0, 1.0, fail)
        Kcols = [
            _chol_solve_unrolled(
                L_free, [free[a] * QuxR[a][i] for a in range(m)], m
            )
            for i in range(n)
        ]
        K = [[-Kcols[i][a] for i in range(n)] for a in range(m)]
    else:
        chol_solve = lambda rhs: _chol_solve_unrolled(L, rhs, m)
        kvec = [-s for s in chol_solve(Qu)]
        Kcols = [
            chol_solve([QuxR[a][i] for a in range(m)]) for i in range(n)
        ]
        K = [[-Kcols[i][a] for i in range(n)] for a in range(m)]

    # Expected improvement with UNregularized Q terms.
    dV1 = dV1 + sum(kvec[a] * Qu[a] for a in range(m))
    dV2 = dV2 + 0.5 * sum(
        kvec[a] * Quu[a][b] * kvec[b] for a in range(m) for b in range(m)
    )

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
    return K, kvec, Vn, vn, dV1, dV2, fail


@functools.partial(
    jax.jit, static_argnames=("interpret", "boxqp_iters", "ls_alphas")
)
def _riccati_pallas_raw(fx, fu, lx, lu, lxx, luu, lux, mu, VT, vT,
                        ubar=None, lo=None, hi=None,
                        fxx=None, fux=None, fuu=None, *,
                        interpret: bool, boxqp_iters: int = 0,
                        ls_alphas: int = 8):
    """Inputs in kernel layout [T, entries, B]; returns (K, k, dV1, dV2, fail).

    ``boxqp_iters > 0`` selects the control-limited variant and requires
    ``ubar [T, m, B]`` and bounds ``lo/hi [m, 1]``. Passing
    ``fxx [T, n*n*n, B] / fux [T, n*m*n, B] / fuu [T, n*m*m, B]`` selects
    the full-DDP variant (entry index: output component p major).
    """
    ddp = fxx is not None
    T, nn, B = fx.shape
    n = int(round(nn ** 0.5))
    m = fu.shape[1] // n
    # Scoped-VMEM stack scales with the per-step working set (~(n+m)^2
    # entries x lanes); cap the lane block so it stays under the ~16M limit.
    d2 = (n + m) * (n + m)
    cap = 2048 if d2 <= 64 else (1024 if d2 <= 256 else 512)
    if boxqp_iters > 0:
        cap = min(cap, 1024 if d2 <= 64 else 512)
    if ddp:
        # The Hessian blocks add d3 = n*(n^2+mn+m^2) entries/step to the
        # working set (n=12: 5184 vs the first-order ~700). Cap by the
        # estimated block BYTES (~(d3+first-order) x BB x 4 x double-buffer
        # <= ~8 MB of the 16 MB scoped stack) — the original volume-bucket
        # rule capped n=5 (d3=375) at BB=256, which quartered the grid-
        # block width for a 3 MB working set and cost the reservoir DDP
        # ladder row ~2x on chip.
        d3 = n * (n * n + m * n + m * m)
        per_lane_bytes = (d3 + 4 * d2) * 4 * 2
        for bb_cap in (1024, 512, 256, 128):
            if per_lane_bytes * bb_cap <= 8 * 1024 * 1024:
                break
        cap = min(cap, bb_cap)
    BB = B if B <= cap else cap
    while B % BB:
        BB //= 2
    nb = B // BB

    # TB=1 (per-step): time-blocking this kernel was measured SLOWER (1.87
    # vs 1.48 ms at B=4096, T=100, nav) even with buffered stores — unlike
    # the rollout kernels, the value-function chain plus TB buffered (K, k)
    # rows exceeds the register budget and spills. The kernel builder
    # supports TB > 1 if a future hardware generation changes the tradeoff.
    TB = 1
    n_tb = T // TB

    tmap = lambda bi, t: (n_tb - 1 - t, 0, bi)
    bmap = lambda bi, t: (0, bi)

    spec = lambda e: pl.BlockSpec((TB, e, BB), tmap, memory_space=pltpu.VMEM)
    in_specs = [
        spec(nn), spec(n * m), spec(n), spec(m), spec(nn), spec(m * m),
        spec(m * n),
        pl.BlockSpec((1, BB), bmap, memory_space=pltpu.VMEM),      # mu
    ]
    inputs = [fx, fu, lx, lu, lxx, luu, lux, mu]
    if boxqp_iters > 0:
        in_specs += [
            spec(m),                                               # ubar
            pl.BlockSpec((m, 1), lambda bi, t: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((m, 1), lambda bi, t: (0, 0), memory_space=pltpu.VMEM),
        ]
        inputs += [ubar, lo, hi]
    if ddp:
        in_specs += [spec(n * n * n), spec(n * m * n), spec(n * m * m)]
        inputs += [fxx, fux, fuu]
    in_specs += [
        pl.BlockSpec((nn, BB), lambda bi, t: (0, bi), memory_space=pltpu.VMEM),
        pl.BlockSpec((n, BB), lambda bi, t: (0, bi), memory_space=pltpu.VMEM),
    ]
    inputs += [VT, vT]

    out = pl.pallas_call(
        _kernel(T, n, m, boxqp_iters=boxqp_iters, ls_alphas=ls_alphas, TB=TB,
                ddp=ddp),
        grid=(nb, n_tb),
        in_specs=in_specs,
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
    )(*inputs)
    return out


def _to_kernel_layout(lin, quad, final, mu):
    B, T, n, _ = lin.f_x.shape
    m = lin.f_u.shape[-1]
    to_k = lambda a, e: jnp.transpose(
        a.reshape(B, T, e), (1, 2, 0)
    )  # [B,T,...] -> [T, e, B]
    args = dict(
        fx=to_k(lin.f_x, n * n),
        fu=to_k(lin.f_u, n * m),
        lx=to_k(quad.l_x, n),
        lu=to_k(quad.l_u, m),
        lxx=to_k(quad.l_xx, n * n),
        luu=to_k(quad.l_uu, m * m),
        lux=to_k(quad.l_ux, m * n),
        VT=jnp.transpose(final.l_xx.reshape(B, n * n), (1, 0)),
        vT=jnp.transpose(final.l_x, (1, 0)),
        mu=mu.astype(lin.f_x.dtype).reshape(1, B),
    )
    return args, (B, T, n, m)


def _from_kernel_layout(K, k, dV1, dV2, fail, dims):
    B, T, n, m = dims
    K = jnp.transpose(K, (2, 0, 1)).reshape(B, T, m, n)
    k = jnp.transpose(k, (2, 0, 1)).reshape(B, T, m)
    ok = fail[0] == 0.0
    return ok, Policy(K=K, k=k), dV1[0], dV2[0]


def riccati_backward_pallas(lin, quad, final, mu):
    """Adapter from solver-layout pytrees to the fused kernel.

    lin.f_x: [B, T, n, n] etc.; mu: [B]. Returns ``(ok, Policy, dV1, dV2)``
    exactly like the vmapped scan backward.
    """
    a, dims = _to_kernel_layout(lin, quad, final, mu)
    interpret = jax.default_backend() == "cpu"
    out = _riccati_pallas_raw(
        a["fx"], a["fu"], a["lx"], a["lu"], a["lxx"], a["luu"], a["lux"],
        a["mu"], a["VT"], a["vT"], interpret=interpret,
    )
    return _from_kernel_layout(*out, dims)


def _second_to_kernel_layout(second, dims):
    B, T, n, m = dims
    to_k = lambda a, e: jnp.transpose(a.reshape(B, T, e), (1, 2, 0))
    return (
        to_k(second.f_xx, n * n * n),
        to_k(second.f_ux, n * m * n),
        to_k(second.f_uu, n * m * m),
    )


def riccati_backward_ddp_pallas(lin, quad, final, mu, second):
    """Full-DDP backward (``ILQRConfig.ddp``) in the fused lane kernel.

    Same contract as ``ilqr.backward(..., second=...)`` without bounds:
    the v-contracted dynamics Hessians enter every Q-block and the
    regularized Quu additionally gets the combined ``mu*I_m`` term.
    second: ``SecondOrderModel`` with [B, T] leading axes.
    """
    a, dims = _to_kernel_layout(lin, quad, final, mu)
    fxx, fux, fuu = _second_to_kernel_layout(second, dims)
    interpret = jax.default_backend() == "cpu"
    out = _riccati_pallas_raw(
        a["fx"], a["fu"], a["lx"], a["lu"], a["lxx"], a["luu"], a["lux"],
        a["mu"], a["VT"], a["vT"], fxx=fxx, fux=fux, fuu=fuu,
        interpret=interpret,
    )
    return _from_kernel_layout(*out, dims)


def riccati_backward_ddp_boxqp_pallas(
    lin, quad, final, mu, bounds, Ubar, second, *, boxqp_iters: int = 8,
    ls_alphas: int = 8,
):
    """Full-DDP + control-limited (boxQP) backward in one fused kernel."""
    a, dims = _to_kernel_layout(lin, quad, final, mu)
    B, T, n, m = dims
    dtype = lin.f_x.dtype
    ubar = jnp.transpose(Ubar, (1, 2, 0)).astype(dtype)
    lo = jnp.broadcast_to(bounds.low, (m,)).astype(dtype).reshape(m, 1)
    hi = jnp.broadcast_to(bounds.high, (m,)).astype(dtype).reshape(m, 1)
    fxx, fux, fuu = _second_to_kernel_layout(second, dims)
    interpret = jax.default_backend() == "cpu"
    out = _riccati_pallas_raw(
        a["fx"], a["fu"], a["lx"], a["lu"], a["lxx"], a["luu"], a["lux"],
        a["mu"], a["VT"], a["vT"], ubar, lo, hi, fxx=fxx, fux=fux, fuu=fuu,
        interpret=interpret, boxqp_iters=boxqp_iters, ls_alphas=ls_alphas,
    )
    return _from_kernel_layout(*out, dims)


def riccati_backward_boxqp_pallas(
    lin, quad, final, mu, bounds, Ubar, *, boxqp_iters: int = 8,
    ls_alphas: int = 8,
):
    """Control-limited DDP backward in one fused kernel.

    Same contract as the scan-path boxQP backward (``ilqr.backward`` with
    ``config.boxqp``): per-step ``k_t`` from projected-Newton boxQP within
    ``[low - ubar_t, high - ubar_t]``, feedback rows through the masked free
    system (clamped rows exactly zero). Ubar: [B, T, m].
    """
    a, dims = _to_kernel_layout(lin, quad, final, mu)
    B, T, n, m = dims
    dtype = lin.f_x.dtype
    ubar = jnp.transpose(Ubar, (1, 2, 0)).astype(dtype)      # [T, m, B]
    lo = jnp.broadcast_to(bounds.low, (m,)).astype(dtype).reshape(m, 1)
    hi = jnp.broadcast_to(bounds.high, (m,)).astype(dtype).reshape(m, 1)
    interpret = jax.default_backend() == "cpu"
    out = _riccati_pallas_raw(
        a["fx"], a["fu"], a["lx"], a["lu"], a["lxx"], a["luu"], a["lux"],
        a["mu"], a["VT"], a["vT"], ubar, lo, hi,
        interpret=interpret, boxqp_iters=boxqp_iters, ls_alphas=ls_alphas,
    )
    return _from_kernel_layout(*out, dims)

