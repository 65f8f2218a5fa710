"""Define a custom environment and solve it, unbatched and batched.

Any frozen pytree dataclass implementing ``transition`` / ``cost`` /
``final_cost`` is a full citizen: derivatives come from autodiff, bounds
turn on control-limited DDP (``boxqp=True``), and the generic lane adapter
gives every env — including this one — the fused Pallas rollout kernels on
TPU with no extra code (``use_pallas=True``).

Run: python examples/custom_env.py
(on the TPU host: PYTHONPATH=/root/.axon_site:. python examples/custom_env.py)
"""

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from tfmpc_tpu import Bounds, Env, ILQRConfig, ilqr
from tfmpc_tpu.core.types import pytree_dataclass


@pytree_dataclass
class DampedChain(Env):
    """Diffusively coupled nodes with cubic damping and bounded actuation."""

    coupling: jax.Array                 # [d, d]
    bounds: Optional[Bounds] = None

    @property
    def state_size(self):
        return self.coupling.shape[0]

    @property
    def action_size(self):
        return self.coupling.shape[0]

    def transition(self, x, u):
        return x + 0.1 * (self.coupling @ x - 0.02 * x**3 + u)

    def cost(self, x, u):
        return jnp.sum(x * x) + 0.1 * jnp.sum(u * u)

    def final_cost(self, x):
        return 5.0 * jnp.sum(x * x)


def main():
    # the CPU backend runs the Pallas kernels in (slow) interpret mode —
    # scale the walkthrough down there; TPU runs the full size
    cpu = jax.default_backend() == "cpu"
    d = 6
    B, T = (128, 15) if cpu else (512, 40)
    C = (-2.0 * np.eye(d) + np.eye(d, k=1) + np.eye(d, k=-1)).astype("f4") * 0.3
    env = DampedChain(
        coupling=jnp.asarray(C),
        bounds=Bounds(low=jnp.full((d,), -1.0), high=jnp.full((d,), 1.0)),
    )

    # single scenario, control-limited DDP
    x0 = jnp.asarray(np.linspace(-1.5, 1.5, d), jnp.float32)
    res = ilqr.solve(
        env, x0, horizon=T,
        config=ILQRConfig(atol=1e-6, max_iterations=30, boxqp=True),
    )
    print(f"single solve: converged={bool(res.converged)} "
          f"cost={float(res.total_cost):.4f} "
          f"iterations={int(res.iterations)}")
    print(f"  max |u| = {float(jnp.max(jnp.abs(res.actions))):.3f} "
          f"(bound 1.0)")

    # a scenario batch in one compiled solve (Pallas kernels on TPU)
    x0_batch = jnp.asarray(
        np.random.default_rng(0).uniform(-2, 2, size=(B, d)).astype("f4")
    )
    resb = ilqr.solve_batch(
        env, x0_batch, horizon=T,
        config=ILQRConfig(
            atol=1e-6, max_iterations=30, boxqp=True, use_pallas=not cpu
        ),
    )
    frac = float(jnp.mean(resb.converged.astype(jnp.float32)))
    print(f"batched solve: {x0_batch.shape[0]} scenarios, "
          f"{frac:.1%} converged, "
          f"mean cost {float(jnp.mean(resb.total_cost)):.4f}")


if __name__ == "__main__":
    main()
