"""Fused Pallas line-search rollout kernels.

The forward line search is iLQR hot loop #2 (SURVEY §3.1): T sequential tiny
steps per alpha per scenario. The XLA path issues every ``u = clip(ubar +
alpha k + K dx)`` / ``transition`` / ``cost`` as separate HBM-bound ops; these
kernels fuse the entire closed-loop rollout so per-timestep state never
leaves VMEM, in two phases that together cut line-search HBM traffic ~11x:

1. ``linesearch_costs_pallas`` — roll ALL alpha candidates concurrently
   (alpha grid unrolled in-register, scenarios on the vector lanes) but store
   ONLY the total costs ``J[A, B]``: no [A, T, ...] trajectory materialization.
2. ``rollout_alpha_pallas`` — after the solver picks each scenario's accepted
   alpha (a per-lane vector), re-roll exactly once to materialize the new
   trajectory. Recompute is ~free; bandwidth is the scarce resource.

Env dynamics/cost run INSIDE the kernel through the lane-major
``Env.lane_functions`` hook (params enter as explicit kernel inputs — kernel
bodies cannot close over traced env fields). Envs without the hook keep the
XLA path.
"""

from __future__ import annotations


import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _param_inputs(params):
    """Flatten a params pytree into Pallas-able 2-D inputs.

    Zero-size leaves (e.g. a zone-free navigation's ``centers [0, n]``) are
    dropped from the kernel inputs — Pallas rejects empty blocks — and
    reconstituted as zeros inside the kernel (``_read_params``), which is
    exact: an empty array carries no data.
    """
    leaves, treedef = jax.tree_util.tree_flatten(params)
    orig_leaves = [jnp.asarray(l) for l in leaves]
    leaves2d = [jnp.atleast_2d(a) for a in orig_leaves if a.size > 0]
    return leaves2d, treedef, orig_leaves


def _read_params(refs, treedef, orig_leaves):
    vals = []
    it = iter(refs)
    for orig in orig_leaves:
        if orig.size == 0:
            vals.append(jnp.zeros(orig.shape, orig.dtype))
        else:
            vals.append(next(it)[...].reshape(orig.shape))
    return jax.tree_util.tree_unflatten(treedef, vals)


def _choose_bb(B: int) -> int:
    BB = B if B <= 1024 else 1024
    while B % BB:
        BB //= 2
    return BB


# --- VMEM working-set envelope (round-3 VERDICT task 1) -------------------
#
# Chip-measured scoped-VMEM facts (v5e, /tmp/onchip_sweep_r3.log,
# 2026-08-18): at Mosaic's DEFAULT 16 MB scoped-VMEM budget the rollout
# kernels stop compiling adjacent to the shipped configs — the line-search
# costs kernel at n=m=12, BB=1024, TB=10 needs 17.96 MB and the materialize
# kernel at n=m=16, BB=512, TB=10 needs 16.72 MB. 16 MB is a compiler
# default, not the hardware (v5e has 128 MiB of VMEM), so — exactly like
# the mid Riccati kernel's ``_mid_vmem_limit`` — configs past the default
# budget raise ``vmem_limit_bytes`` instead of silently falling off the
# kernel through ``with_kernel_fallback`` (a ~10-100x perf cliff, not a
# crash). Only when even the raised budget would overflow does the planner
# back off TB (next-smaller divisor of T), then halve BB (>=128: Pallas TPU
# requires the trailing block dim to be a multiple of 128).
_ROLLOUT_DEFAULT_BUDGET = 16 * 2 ** 20
_ROLLOUT_RAISED_VMEM = 100 * 2 ** 20
_ROLLOUT_RAISED_SAFE = 90 * 2 ** 20
# Analytic-model underestimate vs Mosaic's liveness allocator, calibrated on
# the two measured failures above at their REAL alpha counts (the failing
# profile runs used ILQRConfig's default 11-alpha grid): raw model 15.27 /
# 13.79 MB vs measured 17.96 / 16.72 MB -> allocator overhead 17.6% / 21.2%.
# 1.25 covers both; the margin only matters near the _ROLLOUT_RAISED_SAFE
# boundary, where a few-percent underestimate is ~4 MB against 10 MiB slack.
_ROLLOUT_VMEM_FUDGE = 1.25


def _derivs_entries(n: int, m: int) -> int:
    """Rows of the per-step derivative block (fx,fu,lx,lu,lxx,luu,lux)."""
    return 2 * n * n + 2 * n * m + m * m + n + m


def _rollout_vmem_bytes(kind: str, TB: int, BB: int, n: int, m: int,
                        A: int, param_floats: int) -> int:
    """Estimated per-grid-step scoped-VMEM working set, in bytes.

    Counts the double-buffered input/output blocks (x2: the grid advances
    along t while the next block streams in), the scratch carries, and the
    in-register rollout state / buffered stores (which spill to VMEM at
    these block sizes), times a calibrated allocator-overhead fudge.
    ``kind``: "costs" | "costs_traj" | "materialize" | "derivs".
    """
    inputs = TB * (n + m + m * n + m) * BB       # xbar, ubar, K, k blocks
    if kind not in ("costs", "costs_traj"):
        inputs += BB                             # per-lane alpha row
    if kind == "costs":
        outputs = A * BB                         # J[A, BB]
        scratch = (A * n + A) * BB               # x_s, J_s carries
        live = A * (n + 1) * BB                  # per-alpha register state
    elif kind == "costs_traj":
        outputs = (TB * A * (n + m) + A) * BB    # all-alpha X/U blocks + J
        scratch = (A * n + A) * BB
        live = (A * (n + 1) + TB * A * (n + m)) * BB  # state + store buffers
    elif kind == "materialize":
        outputs = (TB * (n + m) + 1) * BB        # X, U blocks + J
        scratch = (n + 1) * BB
        live = TB * (n + m) * BB                 # bufX/bufU store buffers
    else:  # "derivs"
        d = _derivs_entries(n, m)
        outputs = (TB * (n + m + d) + 1) * BB
        scratch = (n + 1) * BB
        live = TB * (n + m + d) * BB             # bufX/bufU/bufD
    total = 2 * (inputs + outputs) + scratch + live + param_floats + 2 * m
    return int(4 * total * _ROLLOUT_VMEM_FUDGE)


def _rollout_plan(kind: str, B: int, T: int, n: int, m: int, A: int,
                  param_floats: int, time_block=None):
    """(BB, TB, vmem_limit_bytes-or-None) for a rollout kernel launch.

    Keeps the measured-optimal TB/BB whenever the working set fits either
    the default or the raised VMEM budget (raising the limit is free;
    shrinking TB measurably costs throughput — CLAUDE.md time-blocking
    rule). An explicit ``time_block`` override is honored as pinned (tests
    pin TB parity): only the limit adapts.
    """
    BB = _choose_bb(B)
    # Heavy-store kernels prefer tiny time blocks. The derivs variant
    # buffers ~(n+m+d) output rows per timestep and measured fastest at
    # TB=2 (1.45/1.20/1.76/1.89 ms at TB 1/2/5/10, chip). costs_traj
    # (A*(n+m) buffered rows/step) was re-litigated round 5 with SOLVE-level
    # chip A/Bs after an isolated-kernel TB sweep at nav shapes suggested
    # TB=10 (docs/sweeps/r5_emit_traj_tb10.md): lifting the cap to 10
    # REGRESSED every config that actually uses the emit path — reservoir
    # T=500 1.042x -> 1.001x vs two-kernel, hvac6 0.983 -> 0.970, hvac16
    # 0.997 -> 0.980 — and only helped nav n=2 (0.909 -> 0.978), where AUTO
    # keeps emit off anyway. Isolated-kernel timings mislead here exactly
    # as per-stage timings do (CLAUDE.md); the cap stays 2 on solve-level
    # data. Don't re-lift without a solve-level win at T>=250 shapes.
    tb_limit = 2 if kind in ("derivs", "costs_traj") else 10
    if time_block is not None:
        TB = time_block
        est = _rollout_vmem_bytes(kind, TB, BB, n, m, A, param_floats)
        return BB, TB, (None if est <= _ROLLOUT_DEFAULT_BUDGET
                        else _ROLLOUT_RAISED_VMEM)
    return _plan_blocks(kind, B, T, n, m, A, param_floats,
                        _choose_tb(T, limit=tb_limit), BB)


def _plan_blocks(kind, B, T, n, m, A, param_floats, TB, BB):
    """Backend-free planning loop: shrink TB, then BB, until the estimate
    fits a budget. Separated from ``_rollout_plan`` so the backoff path is
    directly testable (``_choose_tb`` is backend-dependent)."""
    while True:
        est = _rollout_vmem_bytes(kind, TB, BB, n, m, A, param_floats)
        if est <= _ROLLOUT_DEFAULT_BUDGET:
            return BB, TB, None
        if est <= _ROLLOUT_RAISED_SAFE:
            return BB, TB, _ROLLOUT_RAISED_VMEM
        if TB > 1:
            TB = max((c for c in range(1, TB) if T % c == 0), default=1)
            continue
        # BB backoff must preserve BOTH launch invariants: BB divides B and
        # the trailing block dim stays a multiple of 128 (Mosaic lane
        # width). Naive halving breaks both for non-power-of-two batches
        # (B=640 -> 320 = 2.5x128). Pick the largest legal divisor below
        # the current BB; when none exists, stop backing off.
        smaller = max((d for d in range(128, BB, 128)
                       if B % d == 0), default=None)
        if smaller is not None:
            BB = smaller
            continue
        # smallest legal blocks: launch with the raised limit and let
        # Mosaic's own allocator arbitrate (with_kernel_fallback catches a
        # genuine overflow at solve entry points)
        return BB, TB, _ROLLOUT_RAISED_VMEM


def _rollout_compiler_params(vmem_limit):
    if vmem_limit is None:
        return None
    return pltpu.CompilerParams(vmem_limit_bytes=vmem_limit)


def _choose_tb(T: int, limit: int = 10) -> int:
    """Largest divisor of T up to ``limit``: timesteps per grid step.

    The per-timestep body is a few hundred vector ops; at grid=(nb, T) the
    fixed per-grid-step cost (block handoff, scalar setup) dominates.
    Time-blocking amortizes it and keeps the rollout state in registers
    across the block instead of round-tripping scratch every step
    (measured +20% end-to-end on the navigation headline).

    A TPU-pipelining optimization only: in interpret mode (CPU tests) the
    TB-times-bigger unrolled body just multiplies trace/compile time, so
    default to 1 there (tests pin TB>1 parity explicitly via the
    ``time_block`` override).
    """
    if jax.default_backend() == "cpu":
        return 1
    tb = 1
    for c in range(2, limit + 1):
        if T % c == 0:
            tb = c
    return tb


def _costs_kernel(T, TB, n, m, A, alphas, step_fn, final_fn, treedef,
                  orig_leaves, n_params, has_bounds):
    def kernel(*refs):
        (xbar_ref, ubar_ref, K_ref, k_ref) = refs[:4]
        idx = 4
        if has_bounds:
            lo_ref, hi_ref = refs[idx], refs[idx + 1]
            idx += 2
        param_refs = refs[idx: idx + n_params]
        J_ref = refs[idx + n_params]
        x_s, J_s = refs[idx + n_params + 1:]

        t = pl.program_id(1)
        params = _read_params(param_refs, treedef, orig_leaves)

        @pl.when(t == 0)
        def _init():
            for a in range(A):
                x_s[a * n:(a + 1) * n, :] = xbar_ref[0, :, :]
            J_s[:, :] = jnp.zeros_like(J_s)

        # block state lives in registers across the TB steps
        xs = [x_s[a * n:(a + 1) * n, :] for a in range(A)]
        Js = [J_s[a, :] for a in range(A)]

        for tl in range(TB):
            xbar = xbar_ref[tl, :, :]          # [n, BB]
            ubar = ubar_ref[tl, :, :]          # [m, BB]
            K = K_ref[tl, :, :]                # [mn, BB]
            kv = k_ref[tl, :, :]               # [m, BB]

            for a in range(A):
                x = xs[a]
                dx = [x[i] - xbar[i] for i in range(n)]
                u_rows = []
                for b in range(m):
                    u = ubar[b] + alphas[a] * kv[b]
                    u = u + sum(K[b * n + i] * dx[i] for i in range(n))
                    if has_bounds:
                        u = jnp.clip(u, lo_ref[b, 0], hi_ref[b, 0])
                    u_rows.append(u)
                u_mat = jnp.stack(u_rows)
                x_next, cost = step_fn(params, x, u_mat)
                Jrow = Js[a] + cost
                if final_fn is not None and tl == TB - 1:
                    # add the final cost exactly once, at the last timestep
                    Jrow = jnp.where(
                        t == T // TB - 1, Jrow + final_fn(params, x_next),
                        Jrow,
                    )
                Js[a] = Jrow
                xs[a] = x_next

        for a in range(A):
            x_s[a * n:(a + 1) * n, :] = xs[a]
            J_s[a, :] = Js[a]
        J_ref[:, :] = J_s[:, :]

    return kernel


def _costs_traj_kernel(T, TB, n, m, A, alphas, step_fn, final_fn, treedef,
                       orig_leaves, n_params, has_bounds):
    """Costs kernel that ALSO emits the all-alpha trajectories.

    Same rollout arithmetic as ``_costs_kernel`` (the emitted trajectory for
    any alpha is bit-identical to what ``_materialize_kernel`` would
    recompute for it), but each candidate's (x_{t+1}, u_t) is stored to
    [TB, A*n, BB] / [TB, A*m, BB] output blocks — so the solver can pick
    each scenario's accepted trajectory with a cheap XLA select instead of
    a SECOND serial T-chain rollout. All stores buffered to block end (the
    measured time-blocking rule, CLAUDE.md).
    """
    def kernel(*refs):
        (xbar_ref, ubar_ref, K_ref, k_ref) = refs[:4]
        idx = 4
        if has_bounds:
            lo_ref, hi_ref = refs[idx], refs[idx + 1]
            idx += 2
        param_refs = refs[idx: idx + n_params]
        X_ref, U_ref, J_ref = refs[idx + n_params: idx + n_params + 3]
        x_s, J_s = refs[idx + n_params + 3:]

        t = pl.program_id(1)
        params = _read_params(param_refs, treedef, orig_leaves)

        @pl.when(t == 0)
        def _init():
            for a in range(A):
                x_s[a * n:(a + 1) * n, :] = xbar_ref[0, :, :]
            J_s[:, :] = jnp.zeros_like(J_s)

        xs = [x_s[a * n:(a + 1) * n, :] for a in range(A)]
        Js = [J_s[a, :] for a in range(A)]

        bufX = [[None] * A for _ in range(TB)]
        bufU = [[None] * A for _ in range(TB)]
        for tl in range(TB):
            xbar = xbar_ref[tl, :, :]
            ubar = ubar_ref[tl, :, :]
            K = K_ref[tl, :, :]
            kv = k_ref[tl, :, :]

            for a in range(A):
                x = xs[a]
                dx = [x[i] - xbar[i] for i in range(n)]
                u_rows = []
                for b in range(m):
                    u = ubar[b] + alphas[a] * kv[b]
                    u = u + sum(K[b * n + i] * dx[i] for i in range(n))
                    if has_bounds:
                        u = jnp.clip(u, lo_ref[b, 0], hi_ref[b, 0])
                    u_rows.append(u)
                u_mat = jnp.stack(u_rows)
                x_next, cost = step_fn(params, x, u_mat)
                Jrow = Js[a] + cost
                if final_fn is not None and tl == TB - 1:
                    Jrow = jnp.where(
                        t == T // TB - 1, Jrow + final_fn(params, x_next),
                        Jrow,
                    )
                Js[a] = Jrow
                xs[a] = x_next
                bufX[tl][a] = x_next
                bufU[tl][a] = u_mat

        for tl in range(TB):
            for a in range(A):
                X_ref[tl, a * n:(a + 1) * n, :] = bufX[tl][a]
                U_ref[tl, a * m:(a + 1) * m, :] = bufU[tl][a]
        for a in range(A):
            x_s[a * n:(a + 1) * n, :] = xs[a]
            J_s[a, :] = Js[a]
        J_ref[:, :] = J_s[:, :]

    return kernel


def _materialize_kernel(T, TB, n, m, step_fn, final_fn, treedef, orig_leaves,
                        n_params, has_bounds):
    def kernel(*refs):
        (alpha_ref, xbar_ref, ubar_ref, K_ref, k_ref) = refs[:5]
        idx = 5
        if has_bounds:
            lo_ref, hi_ref = refs[idx], refs[idx + 1]
            idx += 2
        param_refs = refs[idx: idx + n_params]
        X_ref, U_ref, J_ref = refs[idx + n_params: idx + n_params + 3]
        x_s, J_s = refs[idx + n_params + 3:]

        t = pl.program_id(1)
        params = _read_params(param_refs, treedef, orig_leaves)

        @pl.when(t == 0)
        def _init():
            x_s[:, :] = xbar_ref[0, :, :]
            J_s[:, :] = jnp.zeros_like(J_s)

        alpha = alpha_ref[0, :]
        x = x_s[:, :]
        Jrow = J_s[0, :]

        # buffer per-step outputs in registers; issue ALL stores after the
        # sequential chain so they don't serialize against it
        bufX, bufU = [], []
        for tl in range(TB):
            xbar = xbar_ref[tl, :, :]
            ubar = ubar_ref[tl, :, :]
            K = K_ref[tl, :, :]
            kv = k_ref[tl, :, :]

            dx = [x[i] - xbar[i] for i in range(n)]
            u_rows = []
            for b in range(m):
                u = ubar[b] + alpha * kv[b]
                u = u + sum(K[b * n + i] * dx[i] for i in range(n))
                if has_bounds:
                    u = jnp.clip(u, lo_ref[b, 0], hi_ref[b, 0])
                u_rows.append(u)
            u_mat = jnp.stack(u_rows)
            x_next, cost = step_fn(params, x, u_mat)
            Jrow = Jrow + cost
            if final_fn is not None and tl == TB - 1:
                Jrow = jnp.where(
                    t == T // TB - 1, Jrow + final_fn(params, x_next), Jrow
                )
            bufX.append(x_next)
            bufU.append(u_mat)
            x = x_next

        for tl in range(TB):
            X_ref[tl, :, :] = bufX[tl]
            U_ref[tl, :, :] = bufU[tl]
        x_s[:, :] = x
        J_s[0, :] = Jrow
        J_ref[:, :] = J_s[:, :]

    return kernel


def _materialize_derivs_kernel(T, TB, n, m, step_fn, final_fn, derivs_fn,
                               treedef, orig_leaves, n_params, has_bounds):
    """Materialize kernel that ALSO emits the closed-form linearization of
    the new trajectory (``Env.lane_derivatives``), in the Riccati kernels'
    row-major [T, entries, B] layout. The rollout already holds (x_t, u_t)
    in registers, so the entire XLA derivatives stage (and its layout
    transposes) disappears from the solver iteration. All stores buffered
    to block end (the measured time-blocking rule, CLAUDE.md)."""
    D_KEYS = ("fx", "fu", "lx", "lu", "lxx", "luu", "lux")

    def kernel(*refs):
        (alpha_ref, xbar_ref, ubar_ref, K_ref, k_ref) = refs[:5]
        idx = 5
        if has_bounds:
            lo_ref, hi_ref = refs[idx], refs[idx + 1]
            idx += 2
        param_refs = refs[idx: idx + n_params]
        out_refs = refs[idx + n_params: idx + n_params + 3 + len(D_KEYS)]
        X_ref, U_ref, J_ref = out_refs[:3]
        d_refs = dict(zip(D_KEYS, out_refs[3:]))
        x_s, J_s = refs[idx + n_params + 3 + len(D_KEYS):]

        t = pl.program_id(1)
        params = _read_params(param_refs, treedef, orig_leaves)
        sparams, dparams = params["s"], params["d"]

        @pl.when(t == 0)
        def _init():
            x_s[:, :] = xbar_ref[0, :, :]
            J_s[:, :] = jnp.zeros_like(J_s)

        alpha = alpha_ref[0, :]
        x = x_s[:, :]
        Jrow = J_s[0, :]

        bufX, bufU, bufD = [], [], []
        for tl in range(TB):
            xbar = xbar_ref[tl, :, :]
            ubar = ubar_ref[tl, :, :]
            K = K_ref[tl, :, :]
            kv = k_ref[tl, :, :]

            dx = [x[i] - xbar[i] for i in range(n)]
            u_rows = []
            for b in range(m):
                u = ubar[b] + alpha * kv[b]
                u = u + sum(K[b * n + i] * dx[i] for i in range(n))
                if has_bounds:
                    u = jnp.clip(u, lo_ref[b, 0], hi_ref[b, 0])
                u_rows.append(u)
            u_mat = jnp.stack(u_rows)
            bufD.append(derivs_fn(dparams, x, u_mat))
            x_next, cost = step_fn(sparams, x, u_mat)
            Jrow = Jrow + cost
            if final_fn is not None and tl == TB - 1:
                Jrow = jnp.where(
                    t == T // TB - 1, Jrow + final_fn(sparams, x_next), Jrow
                )
            bufX.append(x_next)
            bufU.append(u_mat)
            x = x_next

        for tl in range(TB):
            X_ref[tl, :, :] = bufX[tl]
            U_ref[tl, :, :] = bufU[tl]
            for key in D_KEYS:
                d_refs[key][tl, :, :] = bufD[tl][key]
        x_s[:, :] = x
        J_s[0, :] = Jrow
        J_ref[:, :] = J_s[:, :]

    return kernel


def rollout_alpha_derivs_pallas(env, X, U, policy, alpha_vec,
                                time_block=None, policy_lane=None):
    """Materialize each scenario's accepted-alpha rollout AND its
    linearization in one fused kernel.

    Returns ``(X_new [B, T+1, n], U_new [B, T, m], J [B], kargs)`` where
    ``kargs`` is the dict of row-major [T, entries, B] blocks the Riccati
    kernels consume directly (fx, fu, lx, lu, lxx, luu, lux) — no separate
    derivatives stage, no layout transposes. Requires both
    ``env.lane_functions()`` and ``env.lane_derivatives()``.
    """
    lane = env.lane_functions()
    ld = env.lane_derivatives()
    assert lane is not None and ld is not None
    params = {"s": lane[0], "d": ld[0]}
    step_fn, final_fn, derivs_fn = lane[1], lane[2], ld[1]
    B, T, m = U.shape
    n = X.shape[-1]

    xbar = jnp.transpose(X[:, :-1], (1, 2, 0))
    ubar = jnp.transpose(U, (1, 2, 0))
    if policy_lane is not None:
        Kk, kk = policy_lane
    else:
        Kk = jnp.transpose(policy.K.reshape(B, T, m * n), (1, 2, 0))
        kk = jnp.transpose(policy.k, (1, 2, 0))
    alpha2 = alpha_vec.astype(X.dtype).reshape(1, B)

    leaves2d, treedef, orig_leaves = _param_inputs(params)
    has_bounds = env.bounds is not None
    # TB limit 2, not the plain-materialize heuristic: this variant buffers
    # ~6x more output rows per step (the derivative blocks), and larger
    # blocks spill registers (measured on chip at B=4096 T=100 nav:
    # TB 1/2/5/10 -> 1.45/1.20/1.76/1.89 ms).
    BB, TB, vmem_limit = _rollout_plan(
        "derivs", B, T, n, m, 1, sum(a.size for a in leaves2d),
        time_block=time_block,
    )
    nb = B // BB

    in_specs, bmap2 = _common_specs(T, TB, n, m, BB, has_bounds, leaves2d)
    in_specs = [pl.BlockSpec((1, BB), bmap2, memory_space=pltpu.VMEM)] + in_specs
    inputs = [alpha2, xbar, ubar, Kk, kk]
    if has_bounds:
        inputs += [env.bounds.low.reshape(m, 1), env.bounds.high.reshape(m, 1)]
    inputs += leaves2d

    tmap = lambda bi, t: (t, 0, bi)
    d_entries = dict(fx=n * n, fu=n * m, lx=n, lu=m, lxx=n * n, luu=m * m,
                     lux=m * n)
    d_keys = ("fx", "fu", "lx", "lu", "lxx", "luu", "lux")
    out = pl.pallas_call(
        _materialize_derivs_kernel(T, TB, n, m, step_fn, final_fn, derivs_fn,
                                   treedef, orig_leaves, len(leaves2d),
                                   has_bounds),
        grid=(nb, T // TB),
        in_specs=in_specs,
        out_specs=[
            pl.BlockSpec((TB, n, BB), tmap, memory_space=pltpu.VMEM),
            pl.BlockSpec((TB, m, BB), tmap, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, BB), bmap2, memory_space=pltpu.VMEM),
        ] + [
            pl.BlockSpec((TB, d_entries[key], BB), tmap,
                         memory_space=pltpu.VMEM)
            for key in d_keys
        ],
        out_shape=[
            jax.ShapeDtypeStruct((T, n, B), X.dtype),
            jax.ShapeDtypeStruct((T, m, B), X.dtype),
            jax.ShapeDtypeStruct((1, B), X.dtype),
        ] + [
            jax.ShapeDtypeStruct((T, d_entries[key], B), X.dtype)
            for key in d_keys
        ],
        scratch_shapes=[
            pltpu.VMEM((n, BB), X.dtype),
            pltpu.VMEM((1, BB), X.dtype),
        ],
        interpret=jax.default_backend() == "cpu",
        compiler_params=_rollout_compiler_params(vmem_limit),
    )(*inputs)

    X_out, U_out, J = out[:3]
    kargs = dict(zip(d_keys, out[3:]))
    X_new = jnp.concatenate(
        [X[:, :1], jnp.transpose(X_out, (2, 0, 1))], axis=1
    )
    U_new = jnp.transpose(U_out, (2, 0, 1))
    J_new = jnp.where(jnp.isfinite(J[0]), J[0], jnp.inf)
    return X_new, U_new, J_new, kargs


def _common_specs(T, TB, n, m, BB, has_bounds, param_arrays):
    tmap = lambda bi, t: (t, 0, bi)
    bmap2 = lambda bi, t: (0, bi)
    pspec = lambda arr: pl.BlockSpec(
        arr.shape, lambda bi, t: (0,) * arr.ndim, memory_space=pltpu.VMEM
    )
    in_specs = [
        pl.BlockSpec((TB, n, BB), tmap, memory_space=pltpu.VMEM),   # xbar
        pl.BlockSpec((TB, m, BB), tmap, memory_space=pltpu.VMEM),   # ubar
        pl.BlockSpec((TB, m * n, BB), tmap, memory_space=pltpu.VMEM),  # K
        pl.BlockSpec((TB, m, BB), tmap, memory_space=pltpu.VMEM),   # k
    ]
    if has_bounds:
        in_specs += [
            pl.BlockSpec((m, 1), lambda bi, t: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((m, 1), lambda bi, t: (0, 0), memory_space=pltpu.VMEM),
        ]
    in_specs += [pspec(a) for a in param_arrays]
    return in_specs, bmap2


def linesearch_costs_pallas(env, X, U, policy, alphas,
                            time_block=None, policy_lane=None) -> jax.Array:
    """Total cost of the closed-loop rollout for every (scenario, alpha).

    X: [B, T+1, n], U: [B, T, m], policy.K: [B, T, m, n], policy.k: [B, T, m],
    alphas: [A] (static values). Returns J_all [B, A].
    ``policy_lane``: optional pre-transposed gains ``(K [T, m*n, B],
    k [T, m, B])`` — the Riccati kernels' native output layout (the fused
    solver path passes them straight through, skipping the transposes).
    """
    lane = env.lane_functions()
    assert lane is not None
    params, step_fn, final_fn = lane
    B, T, m = U.shape
    n = X.shape[-1]
    # alphas must be compile-time Python floats (ILQRConfig.alphas_static()).
    alphas_t = tuple(float(a) for a in alphas)
    A = len(alphas_t)

    xbar = jnp.transpose(X[:, :-1], (1, 2, 0))          # [T, n, B]
    ubar = jnp.transpose(U, (1, 2, 0))                  # [T, m, B]
    if policy_lane is not None:
        Kk, kk = policy_lane
    else:
        Kk = jnp.transpose(policy.K.reshape(B, T, m * n), (1, 2, 0))
        kk = jnp.transpose(policy.k, (1, 2, 0))

    leaves2d, treedef, orig_leaves = _param_inputs(params)
    has_bounds = env.bounds is not None
    BB, TB, vmem_limit = _rollout_plan(
        "costs", B, T, n, m, A, sum(a.size for a in leaves2d),
        time_block=time_block,
    )
    nb = B // BB

    in_specs, bmap2 = _common_specs(T, TB, n, m, BB, has_bounds, leaves2d)
    inputs = [xbar, ubar, Kk, kk]
    if has_bounds:
        inputs += [env.bounds.low.reshape(m, 1), env.bounds.high.reshape(m, 1)]
    inputs += leaves2d

    J = pl.pallas_call(
        _costs_kernel(T, TB, n, m, A, alphas_t, step_fn, final_fn, treedef,
                      orig_leaves, len(leaves2d), has_bounds),
        grid=(nb, T // TB),
        in_specs=in_specs,
        out_specs=[pl.BlockSpec((A, BB), bmap2, memory_space=pltpu.VMEM)],
        out_shape=[jax.ShapeDtypeStruct((A, B), X.dtype)],
        scratch_shapes=[
            pltpu.VMEM((A * n, BB), X.dtype),
            pltpu.VMEM((A, BB), X.dtype),
        ],
        interpret=jax.default_backend() == "cpu",
        compiler_params=_rollout_compiler_params(vmem_limit),
    )(*inputs)[0]
    # numerical blowups must always be rejected by the line search
    J = jnp.where(jnp.isfinite(J), J, jnp.inf)
    return jnp.transpose(J, (1, 0))  # [B, A]


def linesearch_costs_traj_pallas(env, X, U, policy, alphas,
                                 time_block=None, policy_lane=None):
    """Line-search costs AND all-alpha trajectories in one fused rollout.

    Same contract as ``linesearch_costs_pallas`` plus the candidate
    trajectories, so the iteration needs only ONE serial T-chain: the
    accepted trajectory becomes an XLA select over the alpha axis
    (``select_alpha_trajectory``) instead of a second fused rollout
    (``rollout_alpha_pallas``). Costs A-times the trajectory HBM writes —
    cheap at small n/m where the rollout kernels are latency-bound
    (PARITY.md §6) — in exchange for dropping a whole sequential chain.

    Returns ``(J_all [B, A], X_all [T, A, n, B], U_all [T, A, m, B])``;
    the trajectory blocks stay in the kernels' lane-major layout (select
    first, transpose once).
    """
    lane = env.lane_functions()
    assert lane is not None
    params, step_fn, final_fn = lane
    B, T, m = U.shape
    n = X.shape[-1]
    alphas_t = tuple(float(a) for a in alphas)
    A = len(alphas_t)

    xbar = jnp.transpose(X[:, :-1], (1, 2, 0))
    ubar = jnp.transpose(U, (1, 2, 0))
    if policy_lane is not None:
        Kk, kk = policy_lane
    else:
        Kk = jnp.transpose(policy.K.reshape(B, T, m * n), (1, 2, 0))
        kk = jnp.transpose(policy.k, (1, 2, 0))

    leaves2d, treedef, orig_leaves = _param_inputs(params)
    has_bounds = env.bounds is not None
    BB, TB, vmem_limit = _rollout_plan(
        "costs_traj", B, T, n, m, A, sum(a.size for a in leaves2d),
        time_block=time_block,
    )
    nb = B // BB

    in_specs, bmap2 = _common_specs(T, TB, n, m, BB, has_bounds, leaves2d)
    inputs = [xbar, ubar, Kk, kk]
    if has_bounds:
        inputs += [env.bounds.low.reshape(m, 1), env.bounds.high.reshape(m, 1)]
    inputs += leaves2d

    tmap = lambda bi, t: (t, 0, bi)
    X_all, U_all, J = pl.pallas_call(
        _costs_traj_kernel(T, TB, n, m, A, alphas_t, step_fn, final_fn,
                           treedef, orig_leaves, len(leaves2d), has_bounds),
        grid=(nb, T // TB),
        in_specs=in_specs,
        out_specs=[
            pl.BlockSpec((TB, A * n, BB), tmap, memory_space=pltpu.VMEM),
            pl.BlockSpec((TB, A * m, BB), tmap, memory_space=pltpu.VMEM),
            pl.BlockSpec((A, BB), bmap2, memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((T, A * n, B), X.dtype),
            jax.ShapeDtypeStruct((T, A * m, B), X.dtype),
            jax.ShapeDtypeStruct((A, B), X.dtype),
        ],
        scratch_shapes=[
            pltpu.VMEM((A * n, BB), X.dtype),
            pltpu.VMEM((A, BB), X.dtype),
        ],
        interpret=jax.default_backend() == "cpu",
        compiler_params=_rollout_compiler_params(vmem_limit),
    )(*inputs)

    J = jnp.where(jnp.isfinite(J), J, jnp.inf)
    return (
        jnp.transpose(J, (1, 0)),
        X_all.reshape(T, A, n, B),
        U_all.reshape(T, A, m, B),
    )


def select_alpha_trajectory(X, X_all, U_all, J_all, best):
    """Pick each scenario's accepted-alpha trajectory from the all-alpha
    blocks of ``linesearch_costs_traj_pallas``.

    ``best [B]`` indexes the alpha grid per scenario. Selection is a
    where-chain, NOT a one-hot contraction: a diverged candidate rollout
    can carry inf/NaN states, and ``0 * inf = nan`` would poison every
    scenario in a one-hot matmul. Returns ``(X_new [B, T+1, n],
    U_new [B, T, m], J_best [B])`` — arithmetically identical to
    ``rollout_alpha_pallas(env, X, U, policy, alphas[best])``.
    """
    A = J_all.shape[1]
    Xs, Us = X_all[:, 0], U_all[:, 0]
    for a in range(1, A):
        pick = best == a
        Xs = jnp.where(pick, X_all[:, a], Xs)
        Us = jnp.where(pick, U_all[:, a], Us)
    X_new = jnp.concatenate(
        [X[:, :1], jnp.transpose(Xs, (2, 0, 1))], axis=1
    )
    U_new = jnp.transpose(Us, (2, 0, 1))
    J_best = jnp.take_along_axis(J_all, best[:, None], axis=1)[:, 0]
    return X_new, U_new, J_best


def rollout_alpha_pallas(env, X, U, policy, alpha_vec, time_block=None):
    """Materialize the closed-loop rollout at each scenario's own alpha.

    alpha_vec: [B]. Returns (X_new [B, T+1, n], U_new [B, T, m], J [B]).
    ``time_block`` overrides the TB heuristic (tests pin TB>1 parity in
    interpret mode, where ``_choose_tb`` would otherwise always pick 1).
    """
    lane = env.lane_functions()
    assert lane is not None
    params, step_fn, final_fn = lane
    B, T, m = U.shape
    n = X.shape[-1]

    xbar = jnp.transpose(X[:, :-1], (1, 2, 0))
    ubar = jnp.transpose(U, (1, 2, 0))
    Kk = jnp.transpose(policy.K.reshape(B, T, m * n), (1, 2, 0))
    kk = jnp.transpose(policy.k, (1, 2, 0))
    alpha2 = alpha_vec.astype(X.dtype).reshape(1, B)

    leaves2d, treedef, orig_leaves = _param_inputs(params)
    has_bounds = env.bounds is not None
    BB, TB, vmem_limit = _rollout_plan(
        "materialize", B, T, n, m, 1, sum(a.size for a in leaves2d),
        time_block=time_block,
    )
    nb = B // BB

    in_specs, bmap2 = _common_specs(T, TB, n, m, BB, has_bounds, leaves2d)
    in_specs = [pl.BlockSpec((1, BB), bmap2, memory_space=pltpu.VMEM)] + in_specs
    inputs = [alpha2, xbar, ubar, Kk, kk]
    if has_bounds:
        inputs += [env.bounds.low.reshape(m, 1), env.bounds.high.reshape(m, 1)]
    inputs += leaves2d

    tmap = lambda bi, t: (t, 0, bi)
    X_out, U_out, J = pl.pallas_call(
        _materialize_kernel(T, TB, n, m, step_fn, final_fn, treedef,
                            orig_leaves, len(leaves2d), has_bounds),
        grid=(nb, T // TB),
        in_specs=in_specs,
        out_specs=[
            pl.BlockSpec((TB, n, BB), tmap, memory_space=pltpu.VMEM),
            pl.BlockSpec((TB, m, BB), tmap, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, BB), bmap2, memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((T, n, B), X.dtype),
            jax.ShapeDtypeStruct((T, m, B), X.dtype),
            jax.ShapeDtypeStruct((1, B), X.dtype),
        ],
        scratch_shapes=[
            pltpu.VMEM((n, BB), X.dtype),
            pltpu.VMEM((1, BB), X.dtype),
        ],
        interpret=jax.default_backend() == "cpu",
        compiler_params=_rollout_compiler_params(vmem_limit),
    )(*inputs)

    X_new = jnp.concatenate(
        [X[:, :1], jnp.transpose(X_out, (2, 0, 1))], axis=1
    )
    U_new = jnp.transpose(U_out, (2, 0, 1))
    J_new = jnp.where(jnp.isfinite(J[0]), J[0], jnp.inf)
    return X_new, U_new, J_new
