"""2-D point-mass navigation with smooth deceleration zones.

Capability parity with reference ``tfmpc/envs/navigation.py`` (SURVEY §2.1 —
reference mount was empty; behavior reconstructed and validated numerically in
SURVEY Appendix A.2):

- dynamics  ``x' = x + lambda(x) * u`` with
  ``lambda(x) = prod_i [ 2 / (1 + exp(-decay_i * ||x - center_i||)) - 1 ]``
  — each deceleration zone contributes a factor in (0, 1) that vanishes at the
  zone center, slowing the agent near it;
- stage cost ``||x - goal||^2``; final cost the same;
- optional box bounds on ``u``.

TPU-first notes: the env is a pytree dataclass; zones are stored as dense
``[Z, 2]`` / ``[Z]`` arrays (Z may be 0 for the linear case — the product over
an empty axis is 1, so no branching). The norm uses a small epsilon inside the
sqrt so the Jacobian is finite at zone centers (forward-mode differentiates
through it cleanly).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from tfmpc_tpu.core.types import Bounds, pytree_dataclass
from tfmpc_tpu.models.base import Env

_NORM_EPS = 1e-12


@pytree_dataclass
class Navigation(Env):
    """Nonlinear 2-D navigation toward ``goal`` with deceleration zones.

    Fields:
      goal:    [n]   target position (n = 2 in the reference configs)
      centers: [Z, n] deceleration-zone centers (Z may be 0)
      decays:  [Z]   per-zone decay rates
      bounds:  optional box bounds on u
    """

    goal: jax.Array
    centers: jax.Array
    decays: jax.Array
    bounds: Optional[Bounds] = None

    @property
    def state_size(self) -> int:
        return self.goal.shape[-1]

    @property
    def action_size(self) -> int:
        return self.goal.shape[-1]

    def deceleration(self, x: jax.Array) -> jax.Array:
        """``lambda(x)`` in (0, 1]: product of per-zone logistic factors."""
        d = x[None, :] - self.centers                      # [Z, n]
        dist = jnp.sqrt(jnp.sum(d * d, axis=-1) + _NORM_EPS)  # [Z]
        factors = 2.0 / (1.0 + jnp.exp(-self.decays * dist)) - 1.0
        return jnp.prod(factors)

    def transition(self, x: jax.Array, u: jax.Array) -> jax.Array:
        return x + self.deceleration(x) * u

    def cost(self, x: jax.Array, u: jax.Array) -> jax.Array:
        del u  # reference stage cost penalizes distance-to-goal only
        d = x - self.goal
        return jnp.sum(d * d)

    def final_cost(self, x: jax.Array) -> jax.Array:
        d = x - self.goal
        return jnp.sum(d * d)

    def analytic_derivatives(self, X: jax.Array, U: jax.Array):
        """Closed-form linearization (hand-derived; pinned vs autodiff).

        Measured ~3x faster than the generic vmap(jacfwd) path for this env:
        the cost quadratics are constants (l_xx = 2I, l_uu = l_ux = 0) and
        the only non-trivial term is d(lambda)/dx, computed once instead of
        re-derived by tracing. Same formulas as the test oracle
        (tests/oracles.py::_nav_lambda_np).
        """
        from tfmpc_tpu.core.types import (
            LinearModel, QuadraticFinal, QuadraticModel,
        )

        n = self.state_size
        x = X[:-1]                                        # [T, n]
        T = x.shape[0]
        dtype = x.dtype
        I = jnp.eye(n, dtype=dtype)

        d = x[:, None, :] - self.centers[None]            # [T, Z, n]
        dist = jnp.sqrt(jnp.sum(d * d, axis=-1) + _NORM_EPS)  # [T, Z]
        g = 2.0 / (1.0 + jnp.exp(-self.decays * dist)) - 1.0
        lam = jnp.prod(g, axis=-1)                        # [T]
        # d g_z / d dist = k_z (1 - g_z^2) / 2 ; d dist / dx = (x - c_z)/dist
        gp = self.decays * (1.0 - g * g) / 2.0
        coef = jnp.where(g != 0.0, lam[:, None] / g, 0.0) * gp / dist
        dlam = jnp.sum(coef[..., None] * d, axis=1)       # [T, n]

        lin = LinearModel(
            f=x + lam[:, None] * U,
            f_x=I[None] + U[:, :, None] * dlam[:, None, :],
            f_u=lam[:, None, None] * I[None],
        )
        dx = x - self.goal
        zeros_v = jnp.zeros((T, n), dtype)
        zeros_m = jnp.zeros((T, n, n), dtype)
        quad = QuadraticModel(
            l=jnp.sum(dx * dx, axis=-1),
            l_x=2.0 * dx,
            l_u=zeros_v,
            l_xx=jnp.broadcast_to(2.0 * I, (T, n, n)),
            l_uu=zeros_m,
            l_ux=zeros_m,
        )
        dT = X[-1] - self.goal
        final = QuadraticFinal(l=jnp.sum(dT * dT), l_x=2.0 * dT, l_xx=2.0 * I)
        return lin, quad, final

    def lane_derivatives(self):
        """Lane-major closed-form linearization (mirrors
        ``analytic_derivatives``; consumed by the fused materialize+derivs
        kernel). Row-major entry blocks over [*, L] lanes."""
        params = {
            "goal": self.goal,
            "centers": self.centers,
            "decays": self.decays,
        }
        n = self.state_size

        def derivs_fn(p, x, u):  # x [n, L], u [n, L]
            centers, decays = p["centers"], p["decays"]
            Z = centers.shape[0]
            L = x.shape[-1]
            one = jnp.ones((1, x.shape[-1]), x.dtype)
            lam = one[0]
            # dlam[i]: gradient of the deceleration product
            dlam = [jnp.zeros_like(x[0]) for _ in range(n)]
            gs = []
            for z in range(Z):
                d2 = sum((x[i] - centers[z, i]) ** 2 for i in range(n))
                dist = jnp.sqrt(d2 + _NORM_EPS)
                g = 2.0 / (1.0 + jnp.exp(-decays[z] * dist)) - 1.0
                gs.append((g, dist, z))
                lam = lam * g
            for g, dist, z in gs:
                gp = decays[z] * (1.0 - g * g) / 2.0
                coef = jnp.where(g != 0.0, lam / g, 0.0) * gp / dist
                for i in range(n):
                    dlam[i] = dlam[i] + coef * (x[i] - centers[z, i])

            # f_x = I + u dlam^T ; f_u = lam I  (row-major entries)
            fx = jnp.concatenate([
                (u[i] * dlam[j] + (1.0 if i == j else 0.0)).reshape(1, -1)
                for i in range(n) for j in range(n)
            ], axis=0)
            fu = jnp.concatenate([
                (lam if i == j else jnp.zeros_like(lam)).reshape(1, -1)
                for i in range(n) for j in range(n)
            ], axis=0)
            lx = jnp.concatenate([
                (2.0 * (x[i] - p["goal"][i])).reshape(1, -1) for i in range(n)
            ], axis=0)
            zeros_r = jnp.zeros((1, L), x.dtype)
            lu = jnp.concatenate([zeros_r] * n, axis=0)
            lxx = jnp.concatenate([
                (2.0 * one if i == j else 0.0 * one)
                for i in range(n) for j in range(n)
            ], axis=0)
            luu = jnp.concatenate([zeros_r] * (n * n), axis=0)
            lux = jnp.concatenate([zeros_r] * (n * n), axis=0)
            return dict(fx=fx, fu=fu, lx=lx, lu=lu, lxx=lxx, luu=luu,
                        lux=lux)

        return params, derivs_fn

    def lane_functions(self):
        """Lane-major dynamics/cost for the fused Pallas rollout kernels."""
        params = {
            "goal": self.goal,
            "centers": self.centers,
            "decays": self.decays,
        }

        def _lam(params, x):  # x: [n, L] -> [L]
            centers = params["centers"]  # [Z, n]
            decays = params["decays"]    # [Z]
            Z = centers.shape[0]
            lam = jnp.ones_like(x[0])
            for z in range(Z):  # Z is tiny and static
                d2 = sum(
                    (x[i] - centers[z, i]) ** 2 for i in range(x.shape[0])
                )
                dist = jnp.sqrt(d2 + _NORM_EPS)
                lam = lam * (2.0 / (1.0 + jnp.exp(-decays[z] * dist)) - 1.0)
            return lam

        def step_fn(params, x, u):  # [n, L], [m, L] -> ([n, L], [L])
            goal = params["goal"]
            cost = sum((x[i] - goal[i]) ** 2 for i in range(x.shape[0]))
            lam = _lam(params, x)
            x_next = jnp.stack([x[i] + lam * u[i] for i in range(x.shape[0])])
            return x_next, cost

        def final_fn(params, x):
            goal = params["goal"]
            return sum((x[i] - goal[i]) ** 2 for i in range(x.shape[0]))

        return params, step_fn, final_fn


def make_navigation(
    goal,
    deceleration: Optional[dict] = None,
    low=None,
    high=None,
    dtype=jnp.float32,
) -> Navigation:
    """Build a ``Navigation`` env from reference-style JSON config fields.

    ``deceleration`` follows the reference config schema: a dict with
    ``{"center": [[...], ...], "decay": [...]}`` (SURVEY §2.1 env registry).
    """
    goal = jnp.asarray(goal, dtype).reshape(-1)
    n = goal.shape[0]
    if deceleration is not None:
        centers = jnp.asarray(deceleration["center"], dtype).reshape(-1, n)
        decays = jnp.asarray(deceleration["decay"], dtype).reshape(-1)
    else:
        centers = jnp.zeros((0, n), dtype)
        decays = jnp.zeros((0,), dtype)
    bounds = None
    if low is not None or high is not None:
        low_a = jnp.full((n,), -jnp.inf, dtype) if low is None else jnp.broadcast_to(
            jnp.asarray(low, dtype), (n,)
        )
        high_a = jnp.full((n,), jnp.inf, dtype) if high is None else jnp.broadcast_to(
            jnp.asarray(high, dtype), (n,)
        )
        bounds = Bounds(low=low_a, high=high_a)
    return Navigation(goal=goal, centers=centers, decays=decays, bounds=bounds)
