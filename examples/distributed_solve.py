"""Shard a scenario batch over every visible device.

``solve_ilqr_sharded`` places the batch on a 1-D ``("data",)`` mesh via
``shard_map``: each device runs the full batched solve on its local shard
(the Pallas kernels run per-device), and the only cross-device traffic is
the scalar summary reduction. On a multi-host pod call
``tfmpc_tpu.parallel.mesh.init_multihost()`` first and pass each host's
local rows (see benchmarks/multiprocess_bench.py for the 2-process
harness and its measured collective audit).

Run: python examples/distributed_solve.py
(CPU: JAX simulates one device unless XLA_FLAGS adds virtual devices,
e.g. XLA_FLAGS=--xla_force_host_platform_device_count=8.)
"""

import jax
import jax.numpy as jnp
import numpy as np

from tfmpc_tpu import ILQRConfig, make_navigation
from tfmpc_tpu.parallel import mesh as pmesh


def main():
    cpu = jax.default_backend() == "cpu"
    n_dev = len(jax.devices())
    env = make_navigation(
        goal=[8.0, -5.0],
        deceleration={"center": [[3.0, -2.0]], "decay": [2.0]},
    )
    B = (128 if cpu else 1024) // n_dev * n_dev
    T = 12 if cpu else 50
    x0 = jnp.asarray(
        np.random.default_rng(0).uniform(-10, 10, size=(B, 2)).astype("f4")
    )
    result = pmesh.solve_ilqr_sharded(
        env, x0, horizon=T,
        config=ILQRConfig(atol=1e-4, max_iterations=30, use_pallas=not cpu),
    )
    stats = jax.device_get(pmesh.summarize(result))
    print(f"{B} scenarios over {n_dev} device(s): "
          f"{int(stats['num_converged'])} converged, "
          f"mean cost {float(stats['mean_cost']):.4f}, "
          f"mean iterations {float(stats['mean_iterations']):.1f}")
    # trajectories stay sharded on their home devices — no gather happened
    print(f"result sharding spans "
          f"{len(result.states.sharding.device_set)} device(s)")

    # Combined data x time parallelism: the batch over the "data" axis AND
    # the horizon over the "time" axis of one 2-D mesh, in one solve —
    # outputs come back P("data", "time") over the full mesh.
    if n_dev % 2 == 0 and n_dev > 1:
        mesh2 = pmesh.make_mesh_2d(n_dev // 2, 2)
        x0_dt = pmesh.shard_batch(x0, mesh2)
        res_dt = pmesh.solve_ilqr_time_sharded(
            env, x0_dt, horizon=T,
            config=ILQRConfig(atol=1e-4, max_iterations=30,
                              parallel_backward=True),
            mesh=mesh2,
        )
        print(f"combined data x time ({n_dev // 2}x2): outputs on "
              f"{len(res_dt.actions.sharding.device_set)} device(s), "
              f"spec {res_dt.actions.sharding.spec}")


if __name__ == "__main__":
    main()
