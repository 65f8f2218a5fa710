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
