"""Water-reservoir network environment (RDDL Reservoir lineage).

Capability parity with reference ``tfmpc/envs/reservoir.py`` (SURVEY §2.1 —
the reference mount was empty; behavior documented there: state = water
levels, action = release outflows box-constrained to [0, max_release],
dynamics add rain, subtract a nonlinear ``level*sin(level/max_cap)``-shaped
evaporation, route released water downstream via a topology matrix; cost
penalizes levels outside [lower_bound, upper_bound] asymmetrically plus a
setpoint-deviation term).

Dynamics::

    evap_i  = evap_factor * sin(l_i / cap_i) * l_i
    l'_i    = l_i + rain_i - evap_i - u_i + sum_j D_ji u_j

``D[j, i] = 1`` when reservoir j releases into reservoir i (downstream
topology matrix; rows with all zeros drain out of the system).

Cost (smooth asymmetric hinges; C^1 so the iLQR quadratization is defined
everywhere — the reference's linear hinges have subgradient kinks)::

    sum_i [ low_penalty  * relu(lb_i - l_i)^2
          + high_penalty * relu(l_i - ub_i)^2
          + setpoint_weight * (l_i - (lb_i + ub_i)/2)^2 ]
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from tfmpc_tpu.core.types import Bounds, pytree_dataclass
from tfmpc_tpu.models.base import Env


@pytree_dataclass
class Reservoir(Env):
    """Chain/DAG of water reservoirs.

    Fields (R = number of reservoirs):
      downstream:      [R, R] routing matrix D (D[j, i]=1: j releases into i)
      max_capacity:    [R]
      rain:            [R]   per-step rainfall inflow
      evap_factor:     scalar
      lower_bound:     [R]   nominal operating range
      upper_bound:     [R]
      low_penalty:     scalar (cost of being below lower_bound)
      high_penalty:    scalar (cost of being above upper_bound; flood >> drought
                       asymmetry comes from the config values)
      setpoint_weight: scalar
      bounds:          Bounds [0, max_release] on the release action
    """

    downstream: jax.Array
    max_capacity: jax.Array
    rain: jax.Array
    evap_factor: jax.Array
    lower_bound: jax.Array
    upper_bound: jax.Array
    low_penalty: jax.Array
    high_penalty: jax.Array
    setpoint_weight: jax.Array
    bounds: Optional[Bounds] = None

    @property
    def state_size(self) -> int:
        return self.max_capacity.shape[-1]

    @property
    def action_size(self) -> int:
        return self.max_capacity.shape[-1]

    def evaporation(self, x: jax.Array) -> jax.Array:
        return self.evap_factor * jnp.sin(x / self.max_capacity) * x

    def transition(self, x: jax.Array, u: jax.Array) -> jax.Array:
        inflow = self.downstream.T @ u
        return x + self.rain - self.evaporation(x) - u + inflow

    def cost(self, x: jax.Array, u: jax.Array) -> jax.Array:
        del u  # releases are free; the reference charges only level violations
        below = jnp.maximum(self.lower_bound - x, 0.0)
        above = jnp.maximum(x - self.upper_bound, 0.0)
        mid = 0.5 * (self.lower_bound + self.upper_bound)
        return jnp.sum(
            self.low_penalty * below**2
            + self.high_penalty * above**2
            + self.setpoint_weight * (x - mid) ** 2
        )

    def final_cost(self, x: jax.Array) -> jax.Array:
        return self.cost(x, jnp.zeros(self.action_size, x.dtype))

    def analytic_derivatives(self, X: jax.Array, U: jax.Array):
        """Closed-form linearization (pinned vs autodiff in tests).

        f_x = diag(1 - e*(sin(x/cap) + (x/cap) cos(x/cap))),
        f_u = D^T - I (constant); the cost Hessian is a piecewise-constant
        diagonal.
        """
        from tfmpc_tpu.core.types import (
            LinearModel, QuadraticFinal, QuadraticModel,
        )

        n = self.state_size
        x = X[:-1]
        T = x.shape[0]
        dtype = x.dtype
        I = jnp.eye(n, dtype=dtype)

        r = x / self.max_capacity
        f = x + self.rain - self.evap_factor * jnp.sin(r) * x - U + U @ self.downstream
        dxdiag = 1.0 - self.evap_factor * (jnp.sin(r) + r * jnp.cos(r))
        f_x = dxdiag[:, :, None] * I[None]
        f_u = jnp.broadcast_to(self.downstream.T - I, (T, n, n))
        lin = LinearModel(f=f, f_x=f_x, f_u=f_u)

        def cost_terms(xv):
            below = jnp.maximum(self.lower_bound - xv, 0.0)
            above = jnp.maximum(xv - self.upper_bound, 0.0)
            mid = 0.5 * (self.lower_bound + self.upper_bound)
            l = jnp.sum(
                self.low_penalty * below**2
                + self.high_penalty * above**2
                + self.setpoint_weight * (xv - mid) ** 2,
                axis=-1,
            )
            l_x = (
                -2.0 * self.low_penalty * below
                + 2.0 * self.high_penalty * above
                + 2.0 * self.setpoint_weight * (xv - mid)
            )
            hdiag = (
                2.0 * self.low_penalty * (below > 0).astype(dtype)
                + 2.0 * self.high_penalty * (above > 0).astype(dtype)
                + 2.0 * self.setpoint_weight
            )
            return l, l_x, hdiag

        l, l_x, hdiag = cost_terms(x)
        quad = QuadraticModel(
            l=l,
            l_x=l_x,
            l_u=jnp.zeros((T, n), dtype),
            l_xx=hdiag[:, :, None] * I[None],
            l_uu=jnp.zeros((T, n, n), dtype),
            l_ux=jnp.zeros((T, n, n), dtype),
        )
        lT, lT_x, hT = cost_terms(X[-1])
        final = QuadraticFinal(l=lT, l_x=lT_x, l_xx=hT[:, None] * I)
        return lin, quad, final

    def lane_functions(self):
        """Lane-major dynamics/cost for the fused Pallas rollout kernels.

        Reservoir index in the sublane dimension (unrolled, R is small and
        static), scenarios along the vector lanes; the downstream-routing
        matvec unrolls over the static topology. Parity with transition/cost
        is pinned in tests/test_rollout_pallas.py.
        """
        params = {
            "downstream": self.downstream,                 # [R, R]
            "inv_cap": 1.0 / self.max_capacity,            # [R]
            "rain": self.rain,
            "evap_factor": self.evap_factor,
            "lower_bound": self.lower_bound,
            "upper_bound": self.upper_bound,
            "mid": 0.5 * (self.lower_bound + self.upper_bound),
            "low_penalty": self.low_penalty,
            "high_penalty": self.high_penalty,
            "setpoint_weight": self.setpoint_weight,
        }
        R = self.state_size

        def _level_cost(p, x):  # x: [R, L] -> [L]
            total = jnp.zeros_like(x[0])
            for i in range(R):
                below = jnp.maximum(p["lower_bound"][i] - x[i], 0.0)
                above = jnp.maximum(x[i] - p["upper_bound"][i], 0.0)
                d = x[i] - p["mid"][i]
                total = total + (
                    p["low_penalty"] * below * below
                    + p["high_penalty"] * above * above
                    + p["setpoint_weight"] * d * d
                )
            return total

        def step_fn(p, x, u):  # [R, L], [R, L] -> ([R, L], [L])
            cost = _level_cost(p, x)
            rows = []
            for i in range(R):
                evap = p["evap_factor"] * jnp.sin(x[i] * p["inv_cap"][i]) * x[i]
                inflow = jnp.zeros_like(x[i])
                for j in range(R):
                    inflow = inflow + p["downstream"][j, i] * u[j]
                rows.append(x[i] + p["rain"][i] - evap - u[i] + inflow)
            return jnp.stack(rows), cost

        def final_fn(p, x):
            return _level_cost(p, x)

        return params, step_fn, final_fn


def make_reservoir(
    n_reservoirs: Optional[int] = None,
    *,
    downstream=None,
    max_capacity=100.0,
    rain=5.0,
    evap_factor=0.5,
    lower_bound=10.0,
    upper_bound=90.0,
    low_penalty=5.0,
    high_penalty=100.0,
    setpoint_weight=0.1,
    max_release=50.0,
    dtype=jnp.float32,
) -> Reservoir:
    """Build a ``Reservoir`` env from reference-style JSON config fields.

    Default topology is a linear chain ``0 -> 1 -> ... -> R-1 -> out`` (the
    standard RDDL reservoir instance shape) when only ``n_reservoirs`` is
    given; pass an explicit ``downstream`` matrix for DAG topologies.
    """
    if downstream is not None:
        D = jnp.asarray(downstream, dtype)
        R = D.shape[0]
    else:
        if n_reservoirs is None:
            raise ValueError("provide n_reservoirs or downstream")
        R = n_reservoirs
        D = jnp.zeros((R, R), dtype)
        if R > 1:
            idx = jnp.arange(R - 1)
            D = D.at[idx, idx + 1].set(1.0)

    def per_res(v):
        return jnp.broadcast_to(jnp.asarray(v, dtype), (R,)).astype(dtype)

    return Reservoir(
        downstream=D,
        max_capacity=per_res(max_capacity),
        rain=per_res(rain),
        evap_factor=jnp.asarray(evap_factor, dtype),
        lower_bound=per_res(lower_bound),
        upper_bound=per_res(upper_bound),
        low_penalty=jnp.asarray(low_penalty, dtype),
        high_penalty=jnp.asarray(high_penalty, dtype),
        setpoint_weight=jnp.asarray(setpoint_weight, dtype),
        bounds=Bounds(
            low=jnp.zeros((R,), dtype), high=per_res(max_release)
        ),
    )
