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
