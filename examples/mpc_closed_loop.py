"""Closed-loop receding-horizon MPC on the navigation environment.

``mpc.run`` re-solves a short-horizon iLQR instance at every control step
(warm-started from the previous plan), applies the first action, and steps
the true dynamics — fully on device, so a whole closed-loop run is one
dispatch.

Run: python examples/mpc_closed_loop.py
"""

import jax
import jax.numpy as jnp

from tfmpc_tpu import ILQRConfig, make_navigation, mpc


def main():
    cpu = jax.default_backend() == "cpu"
    env = make_navigation(
        goal=[8.0, -5.0],
        deceleration={"center": [[3.0, -2.0]], "decay": [2.0]},
    )
    result = mpc.run(
        env, jnp.zeros(2), steps=20 if cpu else 30, plan_horizon=10,
        config=ILQRConfig(atol=1e-6, max_iterations=15),
    )
    final = result.states[-1]
    print(f"closed-loop final state: [{float(final[0]):.3f}, "
          f"{float(final[1]):.3f}]  (goal [8, -5])")
    print(f"realized cost: {float(jnp.sum(result.costs)):.4f}")
    print(f"per-step replan converged: "
          f"{float(jnp.mean(result.converged.astype(jnp.float32))):.1%}")


if __name__ == "__main__":
    main()
