"""Core pytree dataclasses for the TPU-native MPC engine.

Capability parity notes (vs reference ``thiagopbueno/tf-mpc``; see SURVEY.md,
reference mount was empty so citations are to the upstream layout documented
there):

- ``LQRProblem`` is the TPU-native analogue of the ``F/f/C/c`` problem form
  consumed by ``tfmpc/solvers/lqr.py`` (reference ``LQR(F, f, C, c)``), i.e.
  dynamics ``x' = F @ [x; u] + f`` and stage cost
  ``1/2 [x;u]^T C [x;u] + [x;u]^T c``.
- ``LinearModel`` / ``QuadraticModel`` mirror the namedtuples returned by the
  reference's ``DiffEnv.get_linear_transition`` and
  ``DiffEnv.get_quadratic_cost`` (reference ``tfmpc/envs/diffenv.py``), but are
  batch-first ``[..., T, n, n]``-shaped pytrees designed for ``vmap``/``scan``.
- ``Policy`` holds the time-indexed affine feedback ``u = K_t x + k_t``
  produced by the Riccati backward pass.

Everything here is a frozen dataclass registered as a JAX pytree so it can
cross ``jit``/``scan``/``vmap``/``pjit`` boundaries without ceremony.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp


def pytree_dataclass(cls):
    """Register a frozen dataclass as a JAX pytree (all fields are children)."""
    cls = dataclasses.dataclass(frozen=True)(cls)
    fields = [f.name for f in dataclasses.fields(cls)]
    jax.tree_util.register_dataclass(cls, data_fields=fields, meta_fields=[])
    return cls


@pytree_dataclass
class LQRProblem:
    """Finite-horizon discrete-time LQR problem in stacked ``[x; u]`` form.

    Shapes (time-varying form; a time-invariant problem broadcasts over T):
      F: [T, n, n+m]   dynamics   x_{t+1} = F_t @ [x_t; u_t] + f_t
      f: [T, n]
      C: [T, n+m, n+m] stage cost 1/2 z^T C_t z + z^T c_t,  z = [x; u]
      c: [T, n+m]
      C_f: [n, n]      final cost 1/2 x^T C_f x + x^T c_f (optional; zeros if None)
      c_f: [n]
    """

    F: jax.Array
    f: jax.Array
    C: jax.Array
    c: jax.Array
    C_f: Optional[jax.Array] = None
    c_f: Optional[jax.Array] = None

    @property
    def horizon(self) -> int:
        return self.F.shape[0]

    @property
    def state_size(self) -> int:
        return self.F.shape[-2]

    @property
    def action_size(self) -> int:
        return self.F.shape[-1] - self.F.shape[-2]


@pytree_dataclass
class Bounds:
    """Box bounds on controls, ``low <= u <= high`` elementwise.

    Mirrors the reference envs' optional ``low``/``high`` attributes
    (reference ``tfmpc/envs/diffenv.py``). Either side may be +/-inf.
    """

    low: jax.Array
    high: jax.Array

    def clip(self, u: jax.Array) -> jax.Array:
        return jnp.clip(u, self.low, self.high)


def unbounded(action_size: int, dtype=jnp.float32) -> Bounds:
    return Bounds(
        low=jnp.full((action_size,), -jnp.inf, dtype=dtype),
        high=jnp.full((action_size,), jnp.inf, dtype=dtype),
    )


@pytree_dataclass
class LinearModel:
    """Time-batched linearized dynamics around a nominal trajectory.

    TPU-native analogue of reference ``LinearTransition`` namedtuple
    (``tfmpc/envs/diffenv.py::get_linear_transition``).

      f:   [..., T, n]     transition value at the nominal point
      f_x: [..., T, n, n]  d transition / d state
      f_u: [..., T, n, m]  d transition / d action
    """

    f: jax.Array
    f_x: jax.Array
    f_u: jax.Array


@pytree_dataclass
class SecondOrderModel:
    """Time-batched second-order dynamics tensors around a nominal trajectory.

    The full-DDP extension of ``LinearModel`` (Jacobson & Mayne 1970; Tassa
    et al. 2012 eqs. 5a-5e include these terms, iLQR drops them). The
    reference solver is iLQR-only (``tfmpc/solvers/ilqr.py``, SURVEY §2.1),
    so these tensors exist only in this superset (``ILQRConfig.ddp``).

    Index convention: leading axis is the transition OUTPUT component ``i``;
    the backward pass contracts it with the value gradient ``v_x``.

      f_xx: [..., T, n, n, n]  f_xx[i, a, b] = d^2 f_i / dx_a dx_b
      f_ux: [..., T, n, m, n]  f_ux[i, j, a] = d^2 f_i / du_j dx_a
      f_uu: [..., T, n, m, m]  f_uu[i, j, k] = d^2 f_i / du_j du_k
    """

    f_xx: jax.Array
    f_ux: jax.Array
    f_uu: jax.Array


@pytree_dataclass
class QuadraticModel:
    """Time-batched quadratic cost model around a nominal trajectory.

    TPU-native analogue of reference ``QuadraticCost`` namedtuple
    (``tfmpc/envs/diffenv.py::get_quadratic_cost``).

      l:    [..., T]
      l_x:  [..., T, n]
      l_u:  [..., T, m]
      l_xx: [..., T, n, n]
      l_uu: [..., T, m, m]
      l_ux: [..., T, m, n]
    """

    l: jax.Array
    l_x: jax.Array
    l_u: jax.Array
    l_xx: jax.Array
    l_uu: jax.Array
    l_ux: jax.Array


@pytree_dataclass
class QuadraticFinal:
    """Quadratic model of the final cost (``get_quadratic_final_cost``)."""

    l: jax.Array
    l_x: jax.Array
    l_xx: jax.Array


@pytree_dataclass
class Policy:
    """Time-indexed affine policy ``u_t = K_t @ (x_t - xref_t) + k_t`` (iLQR)
    or ``u_t = K_t @ x_t + k_t`` (LQR; xref = 0).

      K: [..., T, m, n]
      k: [..., T, m]
    """

    K: jax.Array
    k: jax.Array


@pytree_dataclass
class ValueFunction:
    """Quadratic value function ``V_t(x) = 1/2 x^T V_xx x + v_x^T x + v_0``.

      V_xx: [..., T+1, n, n]
      v_x:  [..., T+1, n]
      v_0:  [..., T+1]
    """

    V_xx: jax.Array
    v_x: jax.Array
    v_0: jax.Array
