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
