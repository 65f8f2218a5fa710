"""Generic linear-dynamics / quadratic-cost environment.

SURVEY §7.1's target layout lists ``models/linear.py``: the DiffEnv-shaped
wrapper over the LQR problem class, closing the loop between the two solver
families — iLQR on a ``LinearSystem`` must reproduce the closed-form LQR
solution exactly (pinned in tests/test_linear_env.py), and it is the only
stock env with ``action_size != state_size``, exercising the m != n shape
paths of the solvers and kernels.

Dynamics   x' = A x + B u + c
Stage cost 1/2 x^T Q x + 1/2 u^T R u + x^T N u + q^T x + r^T u
Final cost 1/2 x^T Qf x + qf^T x
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from tfmpc_tpu.core.types import Bounds, LQRProblem, pytree_dataclass
from tfmpc_tpu.models.base import Env


@pytree_dataclass
class LinearSystem(Env):
    A: jax.Array            # [n, n]
    B: jax.Array            # [n, m]
    c: jax.Array            # [n]
    Q: jax.Array            # [n, n] (PSD)
    R: jax.Array            # [m, m] (PD)
    N: jax.Array            # [n, m] cross term
    q: jax.Array            # [n]
    r: jax.Array            # [m]
    Q_f: jax.Array          # [n, n]
    q_f: jax.Array          # [n]
    bounds: Optional[Bounds] = None

    @property
    def state_size(self) -> int:
        return self.A.shape[-1]

    @property
    def action_size(self) -> int:
        return self.B.shape[-1]

    def transition(self, x: jax.Array, u: jax.Array) -> jax.Array:
        return self.A @ x + self.B @ u + self.c

    def cost(self, x: jax.Array, u: jax.Array) -> jax.Array:
        return (
            0.5 * x @ (self.Q @ x)
            + 0.5 * u @ (self.R @ u)
            + x @ (self.N @ u)
            + self.q @ x
            + self.r @ u
        )

    def final_cost(self, x: jax.Array) -> jax.Array:
        return 0.5 * x @ (self.Q_f @ x) + self.q_f @ x

    def to_lqr_problem(self, horizon: int) -> LQRProblem:
        """The equivalent stacked F/f/C/c problem for the exact LQR solver."""
        n, m = self.state_size, self.action_size
        F1 = jnp.concatenate([self.A, self.B], axis=1)          # [n, n+m]
        C1 = jnp.block([[self.Q, self.N], [self.N.T, self.R]])  # [n+m, n+m]
        c1 = jnp.concatenate([self.q, self.r])
        rep = lambda a: jnp.broadcast_to(a, (horizon,) + a.shape)
        return LQRProblem(
            F=rep(F1), f=rep(self.c), C=rep(C1), c=rep(c1),
            C_f=self.Q_f, c_f=self.q_f,
        )

    def analytic_derivatives(self, X: jax.Array, U: jax.Array):
        """Closed-form linearization: everything is constant for an LTI
        system with quadratic cost (pinned vs autodiff in tests)."""
        from tfmpc_tpu.core.types import (
            LinearModel, QuadraticFinal, QuadraticModel,
        )

        n, m = self.state_size, self.action_size
        x = X[:-1]
        T = x.shape[0]
        rep = lambda a: jnp.broadcast_to(a, (T,) + a.shape)
        lin = LinearModel(
            f=x @ self.A.T + U @ self.B.T + self.c,
            f_x=rep(self.A),
            f_u=rep(self.B),
        )
        # gradients/Hessians of 1/2 z^T M z use the symmetric part of M
        Qs = 0.5 * (self.Q + self.Q.T)
        Rs = 0.5 * (self.R + self.R.T)
        Qfs = 0.5 * (self.Q_f + self.Q_f.T)
        quad = QuadraticModel(
            l=jax.vmap(self.cost)(x, U),
            l_x=x @ Qs + U @ self.N.T + self.q,
            l_u=U @ Rs + x @ self.N + self.r,
            l_xx=rep(Qs),
            l_uu=rep(Rs),
            l_ux=rep(self.N.T),
        )
        xT = X[-1]
        final = QuadraticFinal(
            l=self.final_cost(xT), l_x=Qfs @ xT + self.q_f, l_xx=Qfs
        )
        return lin, quad, final

    def lane_functions(self):
        """Lane-major dynamics/cost for the fused Pallas rollout kernels."""
        params = {
            "A": self.A, "B": self.B, "c": self.c,
            "Q": self.Q, "R": self.R, "N": self.N,
            "q": self.q, "r": self.r, "Q_f": self.Q_f, "q_f": self.q_f,
        }
        n, m = self.state_size, self.action_size

        def step_fn(p, x, u):  # [n, L], [m, L] -> ([n, L], [L])
            rows = []
            cost = jnp.zeros_like(x[0])
            for i in range(n):
                xi = p["c"][i]
                for j in range(n):
                    xi = xi + p["A"][i, j] * x[j]
                for a in range(m):
                    xi = xi + p["B"][i, a] * u[a]
                rows.append(xi)
            for i in range(n):
                cost = cost + p["q"][i] * x[i]
                for j in range(n):
                    cost = cost + 0.5 * p["Q"][i, j] * x[i] * x[j]
                for a in range(m):
                    cost = cost + p["N"][i, a] * x[i] * u[a]
            for a in range(m):
                cost = cost + p["r"][a] * u[a]
                for b in range(m):
                    cost = cost + 0.5 * p["R"][a, b] * u[a] * u[b]
            return jnp.stack(rows), cost

        def final_fn(p, x):
            cost = jnp.zeros_like(x[0])
            for i in range(n):
                cost = cost + p["q_f"][i] * x[i]
                for j in range(n):
                    cost = cost + 0.5 * p["Q_f"][i, j] * x[i] * x[j]
            return cost

        return params, step_fn, final_fn


def make_linear_system(
    A, B, *, c=None, Q=None, R=None, N=None, q=None, r=None,
    Q_f=None, q_f=None, low=None, high=None, dtype=jnp.float32,
) -> LinearSystem:
    """Build a ``LinearSystem`` env; sensible defaults (c=0, Q=I, R=I, ...).

    ``Q_f`` defaults to ``Q`` (terminal cost mirrors the stage state cost).
    """
    A = jnp.asarray(A, dtype)
    B = jnp.asarray(B, dtype)
    n, m = A.shape[0], B.shape[1]
    dflt = lambda v, s: (
        jnp.asarray(v, dtype) if v is not None else jnp.zeros(s, dtype)
    )
    Q = jnp.asarray(Q, dtype) if Q is not None else jnp.eye(n, dtype=dtype)
    R = jnp.asarray(R, dtype) if R is not None else jnp.eye(m, dtype=dtype)
    Q_f = jnp.asarray(Q_f, dtype) if Q_f is not None else Q
    bounds = None
    if low is not None or high is not None:
        low_a = (
            jnp.full((m,), -jnp.inf, dtype) if low is None
            else jnp.broadcast_to(jnp.asarray(low, dtype), (m,))
        )
        high_a = (
            jnp.full((m,), jnp.inf, dtype) if high is None
            else jnp.broadcast_to(jnp.asarray(high, dtype), (m,))
        )
        bounds = Bounds(low=low_a, high=high_a)
    return LinearSystem(
        A=A, B=B, c=dflt(c, (n,)), Q=Q, R=R, N=dflt(N, (n, m)),
        q=dflt(q, (n,)), r=dflt(r, (m,)), Q_f=Q_f, q_f=dflt(q_f, (n,)),
        bounds=bounds,
    )
