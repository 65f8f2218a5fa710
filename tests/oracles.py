"""Independent NumPy float64 oracles for parity testing.

SURVEY §6: the reference mount was empty, so numerical parity is anchored to
(a) closed-form LQR solutions computed here in float64 and (b) behavior
invariants (monotone cost decrease, stationarity). These oracles are written
directly from the standard Riccati/DDP equations (Tassa et al. 2012), fully
independently of the JAX implementation.
"""

from __future__ import annotations

import numpy as np


def lqr_backward_np(F, f, C, c, C_f, c_f):
    """Reference Riccati recursion in float64.

    F: [T, n, n+m], f: [T, n], C: [T, n+m, n+m], c: [T, n+m].
    Returns (K [T,m,n], k [T,m]).
    """
    T, n = F.shape[0], F.shape[1]
    V, v, v0 = C_f.astype(np.float64), c_f.astype(np.float64), 0.0
    Ks, ks = [], []
    for t in reversed(range(T)):
        Ft, ft, Ct, ct = (a[t].astype(np.float64) for a in (F, f, C, c))
        Q = Ct + Ft.T @ V @ Ft
        q = ct + Ft.T @ (V @ ft + v)
        q0 = v0 + v @ ft + 0.5 * ft @ V @ ft
        Qxx, Qux, Quu = Q[:n, :n], Q[n:, :n], Q[n:, n:]
        qx, qu = q[:n], q[n:]
        K = -np.linalg.solve(Quu, Qux)
        k = -np.linalg.solve(Quu, qu)
        V = Qxx + Qux.T @ K
        V = 0.5 * (V + V.T)
        v = qx + K.T @ qu
        v0 = q0 + 0.5 * qu @ k
        Ks.append(K)
        ks.append(k)
    return np.stack(Ks[::-1]), np.stack(ks[::-1])


def lqr_rollout_np(F, f, C, c, C_f, c_f, x0, K, k):
    """Roll out the affine policy; returns (states, actions, total_cost)."""
    T, n = F.shape[0], F.shape[1]
    x = x0.astype(np.float64)
    xs, us, total = [x], [], 0.0
    for t in range(T):
        u = K[t] @ x + k[t]
        z = np.concatenate([x, u])
        total += 0.5 * z @ C[t] @ z + z @ c[t]
        x = F[t] @ z + f[t]
        xs.append(x)
        us.append(u)
    total += 0.5 * x @ C_f @ x + x @ c_f
    return np.stack(xs), np.stack(us), total


def total_cost_of_controls_np(F, f, C, c, C_f, c_f, x0, U):
    """Open-loop cost of an arbitrary control sequence U [T, m]."""
    T = F.shape[0]
    x = x0.astype(np.float64)
    total = 0.0
    for t in range(T):
        z = np.concatenate([x, U[t]])
        total += 0.5 * z @ C[t] @ z + z @ c[t]
        x = F[t] @ z + f[t]
    total += 0.5 * x @ C_f @ x + x @ c_f
    return total


# ---------------------------------------------------------------------------
# Independent NumPy iLQR oracle on the deceleration-zone navigation problem
# (SURVEY §6: parity must be anchored to an independent oracle since the
# reference mount was empty). Everything below is plain float64 NumPy with
# HAND-DERIVED analytic derivatives — no JAX, no shared code with the
# package under test.
# ---------------------------------------------------------------------------


def _nav_lambda_np(x, centers, decays):
    """lambda(x) and d lambda / dx for the navigation deceleration factor."""
    lam = 1.0
    grad = np.zeros_like(x)
    factors = []
    for c, k in zip(centers, decays):
        d = np.sqrt(np.sum((x - c) ** 2) + 1e-12)
        g = 2.0 / (1.0 + np.exp(-k * d)) - 1.0
        factors.append((g, k, d, c))
        lam *= g
    for g, k, d, c in factors:
        # d g / d d = k (1 - g^2) / 2 ; d d / d x = (x - c) / d
        grad += (lam / g) * (k * (1.0 - g * g) / 2.0) * (x - c) / d
    return lam, grad


def boxqp_np(H, q, lo, hi, tol=1e-12, max_iters=100):
    """Exact projected-Newton boxQP in float64 (independent of ops/boxqp.py).

    Returns ``(x, free)`` — the minimizer of 1/2 x^T H x + q^T x over
    [lo, hi] and its final free set.
    """
    x = np.clip(np.zeros_like(q), lo, hi)
    obj = lambda z: 0.5 * z @ H @ z + q @ z
    for _ in range(max_iters):
        g = q + H @ x
        clamped = ((x <= lo) & (g > 0)) | ((x >= hi) & (g < 0))
        free = ~clamped
        if not free.any() or np.linalg.norm(g[free]) < tol:
            break
        d = np.zeros_like(x)
        d[free] = -np.linalg.solve(H[np.ix_(free, free)], g[free])
        o0, alpha, improved = obj(x), 1.0, False
        for _ in range(30):
            cand = np.clip(x + alpha * d, lo, hi)
            if obj(cand) < o0 - 1e-15:
                x, improved = cand, True
                break
            alpha *= 0.5
        if not improved:
            break
    g = q + H @ x
    clamped = ((x <= lo) & (g > 0)) | ((x >= hi) & (g < 0))
    return x, ~clamped


def hvac_params_np(adj, *, r_wall=1.5, is_out=None, r_out=4.0, is_hall=None,
                   r_hall=2.0, capacity=80.0, temp_low=20.0, temp_high=23.5,
                   temp_out=6.0, temp_hall=10.0, temp_air=40.0, air_cap=1.0,
                   cost_air=1.0, penalty=20.0, setpoint_weight=0.1,
                   time_delta=1.0, air_max=10.0):
    """float64 HVAC parameter bundle mirroring make_hvac's config schema."""
    adj = np.asarray(adj, float)
    R = adj.shape[0]
    adj = 0.5 * (adj + adj.T) * (1.0 - np.eye(R))
    pr = lambda v, d: np.broadcast_to(np.asarray(v if v is not None else d, float), (R,)).astype(float)
    return dict(
        cond=adj / np.broadcast_to(np.asarray(r_wall, float), (R, R)),
        is_out=pr(is_out, 1.0), r_out=pr(r_out, 0), is_hall=pr(is_hall, 0.0),
        r_hall=pr(r_hall, 0), capacity=pr(capacity, 0),
        temp_low=pr(temp_low, 0), temp_high=pr(temp_high, 0),
        temp_out=float(temp_out), temp_hall=float(temp_hall),
        temp_air=float(temp_air), air_cap=float(air_cap),
        cost_air=float(cost_air), penalty=float(penalty),
        setpoint_weight=float(setpoint_weight), time_delta=float(time_delta),
        low=np.zeros(R), high=np.full(R, float(air_max)),
    )


def _hvac_step_np(p, x, u):
    heating = u * p["air_cap"] * (p["temp_air"] - x)
    exchange = p["cond"] @ x - x * p["cond"].sum(axis=1)
    leak = p["is_out"] * (p["temp_out"] - x) / p["r_out"] + p["is_hall"] * (
        p["temp_hall"] - x
    ) / p["r_hall"]
    return x + p["time_delta"] * (heating + exchange + leak) / p["capacity"]


def _hvac_cost_np(p, x, u):
    below = np.maximum(p["temp_low"] - x, 0.0)
    above = np.maximum(x - p["temp_high"], 0.0)
    mid = 0.5 * (p["temp_low"] + p["temp_high"])
    return (
        p["cost_air"] * np.sum(u)
        + p["penalty"] * np.sum(below**2 + above**2)
        + p["setpoint_weight"] * np.sum((x - mid) ** 2)
    )


def hvac_grad_np(p, x0, U):
    """fp64 adjoint gradient dJ/dU of the open-loop HVAC cost.

    Used for KKT-residual checks on backends without float64 (TPU release
    check): residual = max |U - clip(U - g, lo, hi)|.
    """
    U = np.asarray(U, float)
    T, R = U.shape
    X = [np.asarray(x0, float)]
    for t in range(T):
        X.append(_hvac_step_np(p, X[t], U[t]))
    dt_c = p["time_delta"] / p["capacity"]
    rowsum = p["cond"].sum(axis=1)
    ko = p["is_out"] / p["r_out"]
    kh = p["is_hall"] / p["r_hall"]
    mid = 0.5 * (p["temp_low"] + p["temp_high"])

    def dcdx(x):
        below = np.maximum(p["temp_low"] - x, 0.0)
        above = np.maximum(x - p["temp_high"], 0.0)
        return 2.0 * p["penalty"] * (above - below) + 2.0 * p[
            "setpoint_weight"
        ] * (x - mid)

    lam = dcdx(X[T])  # final cost uses u = 0
    G = np.zeros_like(U)
    for t in reversed(range(T)):
        f_x = (
            np.eye(R)
            + dt_c[:, None] * p["cond"]
            - np.diag(dt_c * (U[t] * p["air_cap"] + rowsum + ko + kh))
        )
        f_u = np.diag(dt_c * p["air_cap"] * (p["temp_air"] - X[t]))
        G[t] = p["cost_air"] + f_u.T @ lam
        lam = dcdx(X[t]) + f_x.T @ lam
    return G


def ilqr_hvac_boxqp_oracle_np(
    p, x0, T, atol=1e-8, max_iterations=300,
    mu_min=1e-6, delta_0=2.0, num_alphas=11,
):
    """Control-limited DDP (Tassa, Mansard & Todorov 2014) on the HVAC
    problem, float64 NumPy end to end — the box-constrained accuracy anchor
    (round-1 VERDICT: no constrained trajectory was oracle-pinned).

    Backward pass: Tassa V_xx + mu I regularization; the per-step
    Q-minimization is an EXACT boxQP within [low - ubar, high - ubar]
    (``boxqp_np``), feedback rows from the free subsystem with clamped rows
    zero. Forward pass: clipped closed-loop rollout with backtracking line
    search. With boxQP the expected improvement vanishes at constrained
    optima, so the -(dV1+dV2) < atol test terminates cleanly.
    Returns (X [T+1, R], U [T, R], J).
    """
    x0 = np.asarray(x0, float)
    R = x0.shape[0]
    lo, hi = p["low"], p["high"]

    def rollout(U):
        X, J = [x0], 0.0
        for t in range(T):
            J += _hvac_cost_np(p, X[-1], U[t])
            X.append(_hvac_step_np(p, X[-1], U[t]))
        J += _hvac_cost_np(p, X[-1], np.zeros(R))
        return np.asarray(X), J

    def derivs(x, u):
        dt_c = p["time_delta"] / p["capacity"]
        rowsum = p["cond"].sum(axis=1)
        ko = p["is_out"] / p["r_out"]
        kh = p["is_hall"] / p["r_hall"]
        f_x = (
            np.eye(R)
            + dt_c[:, None] * p["cond"]
            - np.diag(dt_c * (u * p["air_cap"] + rowsum + ko + kh))
        )
        f_u = np.diag(dt_c * p["air_cap"] * (p["temp_air"] - x))
        below = np.maximum(p["temp_low"] - x, 0.0)
        above = np.maximum(x - p["temp_high"], 0.0)
        mid = 0.5 * (p["temp_low"] + p["temp_high"])
        l_x = 2.0 * p["penalty"] * (above - below) + 2.0 * p[
            "setpoint_weight"
        ] * (x - mid)
        hdiag = 2.0 * p["penalty"] * (
            (below > 0).astype(float) + (above > 0).astype(float)
        ) + 2.0 * p["setpoint_weight"]
        l_u = np.full(R, p["cost_air"])
        return f_x, f_u, l_x, np.diag(hdiag), l_u

    U = np.clip(np.zeros((T, R)), lo, hi)
    X, J = rollout(U)
    mu, delta = 0.0, 1.0
    alphas = [1.1 ** (-(i**2)) for i in range(num_alphas)]

    for _ in range(max_iterations):
        ds = [derivs(X[t], U[t]) for t in range(T)]

        while True:  # backward with restart-on-non-PD
            fxT, fuT, lxT, lxxT, _ = derivs(X[T], np.zeros(R))
            V, v = lxxT, lxT
            dV1 = dV2 = 0.0
            Ks, ks = [], []
            failed = False
            for t in reversed(range(T)):
                f_x, f_u, l_x, l_xx, l_u = ds[t]
                VR = V + mu * np.eye(R)
                Qx = l_x + f_x.T @ v
                Qu = l_u + f_u.T @ v
                Qxx = l_xx + f_x.T @ V @ f_x
                Quu = f_u.T @ V @ f_u
                Qux = f_u.T @ V @ f_x
                QuuR = f_u.T @ VR @ f_u
                QuxR = f_u.T @ VR @ f_x
                try:
                    np.linalg.cholesky(QuuR)
                except np.linalg.LinAlgError:
                    failed = True
                    break
                kt, free = boxqp_np(QuuR, Qu, lo - U[t], hi - U[t])
                Kt = np.zeros((R, R))
                if free.any():
                    Kt[np.ix_(free, range(R))] = -np.linalg.solve(
                        QuuR[np.ix_(free, free)], QuxR[free]
                    )
                dV1 += kt @ Qu
                dV2 += 0.5 * kt @ Quu @ kt
                V = Qxx + Kt.T @ Quu @ Kt + Kt.T @ Qux + Qux.T @ Kt
                V = 0.5 * (V + V.T)
                v = Qx + Kt.T @ Quu @ kt + Kt.T @ Qu + Qux.T @ kt
                Ks.append(Kt)
                ks.append(kt)
            if not failed:
                break
            delta = max(delta_0, delta * delta_0)
            mu = max(mu_min, mu * delta)
            if mu > 1e10:
                return X, U, J
        Ks, ks = Ks[::-1], ks[::-1]

        if -(dV1 + dV2) < atol:
            break

        accepted = False
        for a in alphas:
            Xn, Un, Jn = [x0], [], 0.0
            for t in range(T):
                x = Xn[-1]
                u = np.clip(U[t] + a * ks[t] + Ks[t] @ (x - X[t]), lo, hi)
                Jn += _hvac_cost_np(p, x, u)
                Xn.append(_hvac_step_np(p, x, u))
                Un.append(u)
            Jn += _hvac_cost_np(p, Xn[-1], np.zeros(R))
            expected = -(a * dV1 + a * a * dV2)
            ok = (J - Jn) / expected > 0.0 if expected > 0 else Jn < J
            if ok and Jn < J:
                accepted = True
                break
        if accepted:
            residual = J - Jn
            X, U, J = np.asarray(Xn), np.asarray(Un), Jn
            delta = min(1.0 / delta_0, delta / delta_0)
            mu = mu * delta if mu * delta >= mu_min else 0.0
            if residual < atol:
                break
        else:
            delta = max(delta_0, delta * delta_0)
            mu = max(mu_min, mu * delta)
            if mu > 1e10:
                break
    return X, U, J


def reservoir_params_np(
    R, *, max_capacity=100.0, rain=5.0, evap_factor=0.5, lower_bound=10.0,
    upper_bound=90.0, low_penalty=5.0, high_penalty=100.0,
    setpoint_weight=0.1, max_release=50.0,
):
    """float64 reservoir parameter bundle mirroring make_reservoir's chain
    defaults (0 -> 1 -> ... -> R-1 -> out)."""
    D = np.zeros((R, R))
    if R > 1:
        D[np.arange(R - 1), np.arange(1, R)] = 1.0
    pr = lambda v: np.broadcast_to(np.asarray(v, float), (R,)).astype(float)
    return dict(
        downstream=D, max_capacity=pr(max_capacity), rain=pr(rain),
        evap_factor=float(evap_factor), lower_bound=pr(lower_bound),
        upper_bound=pr(upper_bound), low_penalty=float(low_penalty),
        high_penalty=float(high_penalty),
        setpoint_weight=float(setpoint_weight),
        low=np.zeros(R), high=pr(max_release),
    )


def _res_step_np(p, x, u):
    evap = p["evap_factor"] * np.sin(x / p["max_capacity"]) * x
    return x + p["rain"] - evap - u + p["downstream"].T @ u


def _res_cost_np(p, x):
    below = np.maximum(p["lower_bound"] - x, 0.0)
    above = np.maximum(x - p["upper_bound"], 0.0)
    mid = 0.5 * (p["lower_bound"] + p["upper_bound"])
    return float(np.sum(
        p["low_penalty"] * below**2
        + p["high_penalty"] * above**2
        + p["setpoint_weight"] * (x - mid) ** 2
    ))


def _res_derivs_np(p, x):
    """(f_x, l_x, l_xx_diag) at level x; f_u = D^T - I is constant and the
    cost is u-independent (l_u = 0, l_uu = 0)."""
    r = x / p["max_capacity"]
    fx_diag = 1.0 - p["evap_factor"] * (np.sin(r) + r * np.cos(r))
    below = np.maximum(p["lower_bound"] - x, 0.0)
    above = np.maximum(x - p["upper_bound"], 0.0)
    mid = 0.5 * (p["lower_bound"] + p["upper_bound"])
    l_x = (
        -2.0 * p["low_penalty"] * below
        + 2.0 * p["high_penalty"] * above
        + 2.0 * p["setpoint_weight"] * (x - mid)
    )
    hdiag = (
        2.0 * p["low_penalty"] * (below > 0).astype(float)
        + 2.0 * p["high_penalty"] * (above > 0).astype(float)
        + 2.0 * p["setpoint_weight"]
    )
    return np.diag(fx_diag), l_x, hdiag


def reservoir_grad_np(p, x0, U):
    """fp64 adjoint gradient dJ/dU of the open-loop reservoir cost (for
    KKT-residual checks on backends without float64)."""
    U = np.asarray(U, float)
    T, R = U.shape
    X = [np.asarray(x0, float)]
    for t in range(T):
        X.append(_res_step_np(p, X[t], U[t]))
    f_u = p["downstream"].T - np.eye(R)
    _, lam, _ = _res_derivs_np(p, X[T])
    G = np.zeros_like(U)
    for t in reversed(range(T)):
        f_x, l_x, _ = _res_derivs_np(p, X[t])
        G[t] = f_u.T @ lam
        lam = l_x + f_x.T @ lam
    return G


def ilqr_reservoir_boxqp_oracle_np(
    p, x0, T, atol=1e-8, max_iterations=100,
    mu_min=1e-6, delta_0=2.0, num_alphas=11,
):
    """Control-limited DDP on the reservoir problem, float64 end to end —
    the long-horizon constrained accuracy anchor (round-2 VERDICT missing
    #5: BASELINE config 4 at T=500 had convergence flags but no fp64
    deviation bound; SURVEY §7.3 names fp32 precision loss in T=500
    Riccati chains a known risk). Same algorithm skeleton as
    ``ilqr_hvac_boxqp_oracle_np``. Returns (X [T+1, R], U [T, R], J).
    """
    x0 = np.asarray(x0, float)
    R = x0.shape[0]
    lo, hi = p["low"], p["high"]
    f_u = p["downstream"].T - np.eye(R)

    def rollout(U):
        X, J = [x0], 0.0
        for t in range(T):
            J += _res_cost_np(p, X[-1])
            X.append(_res_step_np(p, X[-1], U[t]))
        J += _res_cost_np(p, X[-1])
        return np.asarray(X), J

    U = np.clip(np.zeros((T, R)), lo, hi)
    X, J = rollout(U)
    mu, delta = 0.0, 1.0
    alphas = [1.1 ** (-(i**2)) for i in range(num_alphas)]

    for _ in range(max_iterations):
        ds = [_res_derivs_np(p, X[t]) for t in range(T)]

        while True:  # backward with restart-on-non-PD
            _, lxT, hT = _res_derivs_np(p, X[T])
            V, v = np.diag(hT), lxT
            dV1 = dV2 = 0.0
            Ks, ks = [], []
            failed = False
            for t in reversed(range(T)):
                f_x, l_x, hdiag = ds[t]
                VR = V + mu * np.eye(R)
                Qx = l_x + f_x.T @ v
                Qu = f_u.T @ v
                Qxx = np.diag(hdiag) + f_x.T @ V @ f_x
                Quu = f_u.T @ V @ f_u
                Qux = f_u.T @ V @ f_x
                QuuR = f_u.T @ VR @ f_u
                QuxR = f_u.T @ VR @ f_x
                try:
                    np.linalg.cholesky(QuuR)
                except np.linalg.LinAlgError:
                    failed = True
                    break
                kt, free = boxqp_np(QuuR, Qu, lo - U[t], hi - U[t])
                Kt = np.zeros((R, R))
                if free.any():
                    Kt[np.ix_(free, range(R))] = -np.linalg.solve(
                        QuuR[np.ix_(free, free)], QuxR[free]
                    )
                dV1 += kt @ Qu
                dV2 += 0.5 * kt @ Quu @ kt
                V = Qxx + Kt.T @ Quu @ Kt + Kt.T @ Qux + Qux.T @ Kt
                V = 0.5 * (V + V.T)
                v = Qx + Kt.T @ Quu @ kt + Kt.T @ Qu + Qux.T @ kt
                Ks.append(Kt)
                ks.append(kt)
            if not failed:
                break
            delta = max(delta_0, delta * delta_0)
            mu = max(mu_min, mu * delta)
            if mu > 1e10:
                return X, U, J
        Ks, ks = Ks[::-1], ks[::-1]

        if -(dV1 + dV2) < atol:
            break

        accepted = False
        for a in alphas:
            Xn, Un, Jn = [x0], [], 0.0
            for t in range(T):
                x = Xn[-1]
                u = np.clip(U[t] + a * ks[t] + Ks[t] @ (x - X[t]), lo, hi)
                Jn += _res_cost_np(p, x)
                Xn.append(_res_step_np(p, x, u))
                Un.append(u)
            Jn += _res_cost_np(p, Xn[-1])
            expected = -(a * dV1 + a * a * dV2)
            ok = (J - Jn) / expected > 0.0 if expected > 0 else Jn < J
            if ok and Jn < J:
                accepted = True
                break
        if accepted:
            residual = J - Jn
            X, U, J = np.asarray(Xn), np.asarray(Un), Jn
            delta = min(1.0 / delta_0, delta / delta_0)
            mu = mu * delta if mu * delta >= mu_min else 0.0
            if residual < atol:
                break
        else:
            delta = max(delta_0, delta * delta_0)
            mu = max(mu_min, mu * delta)
            if mu > 1e10:
                break
    return X, U, J


def ilqr_navigation_oracle_np(
    goal, centers, decays, x0, T,
    atol=1e-8, max_iterations=200,
    mu_min=1e-6, delta_0=2.0, num_alphas=11,
):
    """Full iLQR solve of the navigation problem in float64 NumPy.

    Dynamics x' = x + lambda(x) u; stage and final cost ||x - goal||^2.
    Tassa-style V_xx + mu I regularization, Cholesky PD check with backward
    restart, parallel-equivalent backtracking line search over
    alpha_i = 1.1^(-i^2). Returns (X [T+1, n], U [T, m], J).
    """
    goal = np.asarray(goal, float)
    x0 = np.asarray(x0, float)
    n = x0.shape[0]
    centers = [np.asarray(c, float) for c in centers]
    decays = [float(k) for k in decays]

    def rollout(x0, U):
        X = [x0]
        J = 0.0
        for t in range(T):
            x = X[-1]
            J += np.sum((x - goal) ** 2)
            lam, _ = _nav_lambda_np(x, centers, decays)
            X.append(x + lam * U[t])
        J += np.sum((X[-1] - goal) ** 2)
        return np.asarray(X), J

    U = np.zeros((T, n))
    X, J = rollout(x0, U)
    mu, delta = 0.0, 1.0
    alphas = [1.1 ** (-(i ** 2)) for i in range(num_alphas)]

    for _ in range(max_iterations):
        # linearize along the nominal
        fx, fu, lx = [], [], []
        for t in range(T):
            lam, dlam = _nav_lambda_np(X[t], centers, decays)
            fx.append(np.eye(n) + np.outer(U[t], dlam))
            fu.append(lam * np.eye(n))
            lx.append(2.0 * (X[t] - goal))
        lxx = 2.0 * np.eye(n)

        # regularized backward with restart-on-non-PD
        while True:
            V = 2.0 * np.eye(n)
            v = 2.0 * (X[T] - goal)
            dV1 = dV2 = 0.0
            Ks, ks = [], []
            failed = False
            for t in reversed(range(T)):
                VR = V + mu * np.eye(n)
                Qx = lx[t] + fx[t].T @ v
                Qu = fu[t].T @ v
                Qxx = lxx + fx[t].T @ V @ fx[t]
                Quu = fu[t].T @ V @ fu[t]
                Qux = fu[t].T @ V @ fx[t]
                QuuR = fu[t].T @ VR @ fu[t]
                QuxR = fu[t].T @ VR @ fx[t]
                try:
                    L = np.linalg.cholesky(QuuR)
                except np.linalg.LinAlgError:
                    failed = True
                    break
                Kt = -np.linalg.solve(QuuR, QuxR)
                kt = -np.linalg.solve(QuuR, Qu)
                dV1 += kt @ Qu
                dV2 += 0.5 * kt @ Quu @ kt
                V = Qxx + Kt.T @ Quu @ Kt + Kt.T @ Qux + Qux.T @ Kt
                V = 0.5 * (V + V.T)
                v = Qx + Kt.T @ Quu @ kt + Kt.T @ Qu + Qux.T @ kt
                Ks.append(Kt)
                ks.append(kt)
            if not failed:
                break
            delta = max(delta_0, delta * delta_0)
            mu = max(mu_min, mu * delta)
            if mu > 1e10:
                return X, U, J
        Ks, ks = Ks[::-1], ks[::-1]

        if -(dV1 + dV2) < atol:
            break

        accepted = False
        for a in alphas:
            Xn = [x0]
            Un = []
            Jn = 0.0
            for t in range(T):
                x = Xn[-1]
                u = U[t] + a * ks[t] + Ks[t] @ (x - X[t])
                Jn += np.sum((x - goal) ** 2)
                lam, _ = _nav_lambda_np(x, centers, decays)
                Xn.append(x + lam * u)
                Un.append(u)
            Jn += np.sum((Xn[-1] - goal) ** 2)
            expected = -(a * dV1 + a * a * dV2)
            ok = (Jn - J) / -expected > 0.0 if expected > 0 else Jn < J
            if ok and Jn < J:
                accepted = True
                break
        if accepted:
            residual = J - Jn
            X, U, J = np.asarray(Xn), np.asarray(Un), Jn
            delta = min(1.0 / delta_0, delta / delta_0)
            mu = mu * delta if mu * delta >= mu_min else 0.0
            if residual < atol:
                break
        else:
            delta = max(delta_0, delta * delta_0)
            mu = max(mu_min, mu * delta)
            if mu > 1e10:
                break
    return X, U, J
