"""Child process for the real multi-process distributed test.

Run as: python multiprocess_runner.py <coordinator> <num_procs> <proc_id>

Each process owns 4 virtual CPU devices; together they form an 8-device
global ``("data",)`` mesh spanning two processes (DCN simulated over
localhost gRPC — the actual jax.distributed machinery, not a fake). Solves
a 16-scenario batch (8 local rows per process) and prints the global
summary stats as one JSON line.
"""

import json
import os
import sys

coordinator, num_procs, proc_id = (
    sys.argv[1], int(sys.argv[2]), int(sys.argv[3])
)

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "")
    + " --xla_force_host_platform_device_count=4"
).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.distributed.initialize(
    coordinator_address=coordinator,
    num_processes=num_procs,
    process_id=proc_id,
)

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from tfmpc_tpu.models.navigation import make_navigation  # noqa: E402
from tfmpc_tpu.parallel import mesh as pmesh  # noqa: E402
from tfmpc_tpu.solvers import ilqr  # noqa: E402

assert jax.process_count() == num_procs
assert len(jax.devices()) == 4 * num_procs, jax.devices()

env = make_navigation(
    goal=[8.0, -5.0], deceleration={"center": [[3.0, -2.0]], "decay": [2.0]}
)
mesh = pmesh.make_mesh()

# Global batch of 16: every process computes the SAME global x0 and feeds
# its own 8 local rows (per-host data feed).
B = 16
rng = np.random.default_rng(0)
x0_global = rng.uniform(-5.0, 5.0, size=(B, 2)).astype("float32")
local = x0_global[proc_id * 8:(proc_id + 1) * 8]

config = ilqr.ILQRConfig(atol=1e-4, max_iterations=25)
result = pmesh.solve_ilqr_sharded(
    env, jnp.asarray(local), horizon=12, config=config, mesh=mesh
)
stats = jax.device_get(pmesh.summarize(result))
print(json.dumps({
    "process": proc_id,
    "devices": len(jax.devices()),
    "num_converged": int(stats["num_converged"]),
    "mean_cost": float(stats["mean_cost"]),
    "mean_iterations": float(stats["mean_iterations"]),
}), flush=True)
jax.distributed.shutdown()
