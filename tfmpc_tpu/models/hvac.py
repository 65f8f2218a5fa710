"""Multi-room HVAC environment (RDDL HVAC lineage).

Capability parity with reference ``tfmpc/envs/hvac.py`` (SURVEY §2.1 — the
reference mount was empty; this is the behavior documented there: state =
room temperatures, action = heated-air volume per room box-constrained to
``[0, air_max]``, heat exchange with adjacent rooms / outside / hallway
through thermal resistances, cost = air cost + out-of-comfort penalty +
distance-to-setpoint term).

Dynamics (forward Euler, one step of length ``time_delta``)::

    dT_i = dt / C_i * (  u_i * Ka * (Ta - T_i)                 # heated air
                       + sum_j A_ij (T_j - T_i) / Rw_ij        # wall exchange
                       + out_i  * (To - T_i) / Ro_i            # outside leak
                       + hall_i * (Th - T_i) / Rh_i )          # hallway leak

Cost (smooth, twice-differentiable for iLQR quadratization)::

    sum_i [ cost_air * u_i
          + penalty * (relu(lo_i - T_i)^2 + relu(T_i - hi_i)^2)
          + setpoint_weight * (T_i - (lo_i + hi_i)/2)^2 ]

The squared hinge replaces the reference's non-smooth comfort penalty: it has
continuous gradients (piecewise-linear) so forward-mode Hessians are
well-defined everywhere — a requirement of the quadratization path that the
reference sidesteps by TF's subgradients.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from tfmpc_tpu.core.types import Bounds, pytree_dataclass
from tfmpc_tpu.models.base import Env


@pytree_dataclass
class HVAC(Env):
    """Multi-room thermal control.

    Fields (R = number of rooms):
      adj:           [R, R]  symmetric 0/1 adjacency between rooms
      r_wall:        [R, R]  wall thermal resistance between adjacent rooms
      is_out:        [R]     1.0 where the room touches the outside
      r_out:         [R]     resistance to outside
      is_hall:       [R]     1.0 where the room touches the hallway
      r_hall:        [R]     resistance to hallway
      capacity:      [R]     room heat capacity C_i
      temp_low/high: [R]     comfort range
      temp_out:      scalar  outside temperature
      temp_hall:     scalar  hallway temperature
      temp_air:      scalar  heated air temperature Ta
      air_cap:       scalar  Ka, heat transfer coefficient of heated air
      cost_air:      scalar  per-unit air cost
      penalty:       scalar  out-of-comfort weight
      setpoint_weight: scalar
      time_delta:    scalar  Euler step
      bounds:        Bounds  [0, air_max] per room
    """

    adj: jax.Array
    r_wall: jax.Array
    is_out: jax.Array
    r_out: jax.Array
    is_hall: jax.Array
    r_hall: jax.Array
    capacity: jax.Array
    temp_low: jax.Array
    temp_high: jax.Array
    temp_out: jax.Array
    temp_hall: jax.Array
    temp_air: jax.Array
    air_cap: jax.Array
    cost_air: jax.Array
    penalty: jax.Array
    setpoint_weight: jax.Array
    time_delta: jax.Array
    bounds: Optional[Bounds] = None

    @property
    def state_size(self) -> int:
        return self.capacity.shape[-1]

    @property
    def action_size(self) -> int:
        return self.capacity.shape[-1]

    def transition(self, x: jax.Array, u: jax.Array) -> jax.Array:
        heating = u * self.air_cap * (self.temp_air - x)
        # Wall conductance only across declared adjacencies.
        cond = self.adj / self.r_wall
        exchange = cond @ x - x * jnp.sum(cond, axis=1)
        leak_out = self.is_out * (self.temp_out - x) / self.r_out
        leak_hall = self.is_hall * (self.temp_hall - x) / self.r_hall
        dT = (heating + exchange + leak_out + leak_hall) / self.capacity
        return x + self.time_delta * dT

    def cost(self, x: jax.Array, u: jax.Array) -> jax.Array:
        air = self.cost_air * jnp.sum(u)
        below = jnp.maximum(self.temp_low - x, 0.0)
        above = jnp.maximum(x - self.temp_high, 0.0)
        comfort = self.penalty * jnp.sum(below**2 + above**2)
        mid = 0.5 * (self.temp_low + self.temp_high)
        setpoint = self.setpoint_weight * jnp.sum((x - mid) ** 2)
        return air + comfort + setpoint

    def final_cost(self, x: jax.Array) -> jax.Array:
        return self.cost(x, jnp.zeros(self.action_size, x.dtype))

    def analytic_derivatives(self, X: jax.Array, U: jax.Array):
        """Closed-form linearization (pinned vs autodiff in tests).

        Dynamics are affine in x with a bilinear u*x heating term, so
        f_x = I + dt/C * (cond - diag(u*Ka + rowsum + ko + kh)) and
        f_u = diag(dt/C * Ka * (Ta - x)); the cost Hessian is a
        piecewise-constant diagonal.
        """
        from tfmpc_tpu.core.types import (
            LinearModel, QuadraticFinal, QuadraticModel,
        )

        n = self.state_size
        x = X[:-1]                                        # [T, n]
        T = x.shape[0]
        dtype = x.dtype
        I = jnp.eye(n, dtype=dtype)
        dt_c = self.time_delta / self.capacity            # [n]

        cond = self.adj / self.r_wall                     # [n, n]
        rowsum = jnp.sum(cond, axis=1)
        ko = self.is_out / self.r_out
        kh = self.is_hall / self.r_hall

        heating = U * self.air_cap * (self.temp_air - x)
        exchange = x @ cond.T - x * rowsum
        leak = ko * (self.temp_out - x) + kh * (self.temp_hall - x)
        f = x + dt_c * (heating + exchange + leak)

        diag_term = -(U * self.air_cap + rowsum + ko + kh)  # [T, n]
        f_x = (
            I[None]
            + (dt_c[:, None] * cond)[None]
            + (dt_c * diag_term)[:, :, None] * I[None]
        )
        f_u = (dt_c * self.air_cap * (self.temp_air - x))[:, :, None] * I[None]
        lin = LinearModel(f=f, f_x=f_x, f_u=f_u)

        def cost_terms(xv):
            below = jnp.maximum(self.temp_low - xv, 0.0)
            above = jnp.maximum(xv - self.temp_high, 0.0)
            mid = 0.5 * (self.temp_low + self.temp_high)
            l = self.penalty * jnp.sum(
                below**2 + above**2, axis=-1
            ) + self.setpoint_weight * jnp.sum((xv - mid) ** 2, axis=-1)
            l_x = 2.0 * self.penalty * (above - below) + (
                2.0 * self.setpoint_weight * (xv - mid)
            )
            hdiag = 2.0 * self.penalty * (
                (below > 0).astype(dtype) + (above > 0).astype(dtype)
            ) + 2.0 * self.setpoint_weight
            return l, l_x, hdiag

        l, l_x, hdiag = cost_terms(x)
        quad = QuadraticModel(
            l=l + self.cost_air * jnp.sum(U, axis=-1),
            l_x=l_x,
            l_u=jnp.broadcast_to(
                jnp.full((n,), self.cost_air, dtype), (T, n)
            ),
            l_xx=hdiag[:, :, None] * I[None],
            l_uu=jnp.zeros((T, n, n), dtype),
            l_ux=jnp.zeros((T, n, n), dtype),
        )
        lT, lT_x, hT = cost_terms(X[-1])
        final = QuadraticFinal(l=lT, l_x=lT_x, l_xx=hT[:, None] * I)
        return lin, quad, final

    def lane_functions(self):
        """Lane-major dynamics/cost for the fused Pallas rollout kernels.

        Room index lives in the sublane dimension (R rows, unrolled — R is
        small and static), scenarios along the 128-wide vector lanes; the
        [R, R] wall-conductance matvec unrolls to R^2 scalar-coefficient
        vector FMAs. Parity with transition/cost is pinned in
        tests/test_rollout_pallas.py.
        """
        params = {
            "cond": self.adj / self.r_wall,                    # [R, R]
            "cond_rowsum": jnp.sum(self.adj / self.r_wall, axis=1),
            "k_out": self.is_out / self.r_out,                 # [R]
            "k_hall": self.is_hall / self.r_hall,              # [R]
            "capacity": self.capacity,
            "temp_low": self.temp_low,
            "temp_high": self.temp_high,
            "temp_mid": 0.5 * (self.temp_low + self.temp_high),
            "temp_out": self.temp_out,
            "temp_hall": self.temp_hall,
            "temp_air": self.temp_air,
            "air_cap": self.air_cap,
            "cost_air": self.cost_air,
            "penalty": self.penalty,
            "setpoint_weight": self.setpoint_weight,
            "time_delta": self.time_delta,
        }
        R = self.state_size

        def _comfort_cost(p, x):  # x: [R, L] -> [L]
            total = jnp.zeros_like(x[0])
            for i in range(R):
                below = jnp.maximum(p["temp_low"][i] - x[i], 0.0)
                above = jnp.maximum(x[i] - p["temp_high"][i], 0.0)
                total = total + p["penalty"] * (below * below + above * above)
                d = x[i] - p["temp_mid"][i]
                total = total + p["setpoint_weight"] * d * d
            return total

        def step_fn(p, x, u):  # [R, L], [R, L] -> ([R, L], [L])
            cost = _comfort_cost(p, x)
            rows = []
            for i in range(R):
                cost = cost + p["cost_air"] * u[i]
                heat = u[i] * p["air_cap"] * (p["temp_air"] - x[i])
                exch = -x[i] * p["cond_rowsum"][i]
                for j in range(R):
                    exch = exch + p["cond"][i, j] * x[j]
                leak = (
                    p["k_out"][i] * (p["temp_out"] - x[i])
                    + p["k_hall"][i] * (p["temp_hall"] - x[i])
                )
                dT = (heat + exch + leak) / p["capacity"][i]
                rows.append(x[i] + p["time_delta"] * dT)
            return jnp.stack(rows), cost

        def final_fn(p, x):
            return _comfort_cost(p, x)

        return params, step_fn, final_fn


def make_hvac(
    adj,
    *,
    r_wall=1.5,
    is_out=None,
    r_out=4.0,
    is_hall=None,
    r_hall=2.0,
    capacity=80.0,
    temp_low=20.0,
    temp_high=23.5,
    temp_out=6.0,
    temp_hall=10.0,
    temp_air=40.0,
    air_cap=1.0,
    cost_air=1.0,
    penalty=20.0,
    setpoint_weight=0.1,
    time_delta=1.0,
    air_max=10.0,
    dtype=jnp.float32,
) -> HVAC:
    """Build an ``HVAC`` env from reference-style JSON config fields.

    Scalars broadcast per-room; defaults follow the RDDL HVAC conventions the
    reference env descends from (SURVEY §2.1 HVAC row).
    """
    adj = jnp.asarray(adj, dtype)
    R = adj.shape[0]
    adj = 0.5 * (adj + adj.T)  # symmetrize
    adj = adj * (1.0 - jnp.eye(R, dtype=dtype))  # no self-exchange

    def per_room(v):
        return jnp.broadcast_to(jnp.asarray(v, dtype), (R,)).astype(dtype)

    def per_wall(v):
        return jnp.broadcast_to(jnp.asarray(v, dtype), (R, R)).astype(dtype)

    is_out_a = per_room(is_out if is_out is not None else [1.0] * R)
    is_hall_a = per_room(is_hall if is_hall is not None else [0.0] * R)
    return HVAC(
        adj=adj,
        r_wall=per_wall(r_wall),
        is_out=is_out_a,
        r_out=per_room(r_out),
        is_hall=is_hall_a,
        r_hall=per_room(r_hall),
        capacity=per_room(capacity),
        temp_low=per_room(temp_low),
        temp_high=per_room(temp_high),
        temp_out=jnp.asarray(temp_out, dtype),
        temp_hall=jnp.asarray(temp_hall, dtype),
        temp_air=jnp.asarray(temp_air, dtype),
        air_cap=jnp.asarray(air_cap, dtype),
        cost_air=jnp.asarray(cost_air, dtype),
        penalty=jnp.asarray(penalty, dtype),
        setpoint_weight=jnp.asarray(setpoint_weight, dtype),
        time_delta=jnp.asarray(time_delta, dtype),
        bounds=Bounds(
            low=jnp.zeros((R,), dtype), high=jnp.full((R,), air_max, dtype)
        ),
    )
