"""Checkpoint a long batched solve and resume it bit-exactly.

``solve_batch(..., max_iterations=k)`` runs k outer iterations;
``state_from_result`` captures the full solver state (trajectories, mu,
convergence masks), ``checkpoint.save_state`` writes it with metadata
(env signature, shapes, dtypes — mismatches are rejected with clear
errors on load), and ``ilqr.resume`` continues until convergence with
results identical to an uninterrupted solve (pinned by
tests/test_checkpoint.py).

Run: python examples/checkpoint_resume.py
"""

import os
import tempfile

import jax.numpy as jnp
import numpy as np

from tfmpc_tpu import ILQRConfig, checkpoint, ilqr, make_reservoir, state_from_result
from tfmpc_tpu.solvers import ilqr_batched


def main():
    import jax

    cpu = jax.default_backend() == "cpu"
    B, T = (16, 30) if cpu else (64, 100)
    env = make_reservoir(5)
    x0 = jnp.asarray(
        np.random.default_rng(0).uniform(20, 95, size=(B, 5)).astype("f4")
    )
    cfg = ILQRConfig(atol=1e-4, max_iterations=30, boxqp=True)

    # run the first 5 iterations, then "lose the job"
    partial = ilqr.solve_batch(
        env, x0, horizon=T,
        config=ILQRConfig(atol=1e-4, max_iterations=5, boxqp=True),
    )
    state = state_from_result(partial)
    path = os.path.join(tempfile.mkdtemp(), "solve.ckpt.npz")
    checkpoint.save_state(path, state)
    print(f"checkpointed after 5 iterations -> {path}")

    # resume in a fresh context
    restored = checkpoint.load_state(path)
    final = ilqr_batched.resume(env, restored, config=cfg)
    frac = float(jnp.mean(final.converged.astype(jnp.float32)))
    print(f"resumed to convergence: {frac:.1%} converged, "
          f"mean cost {float(jnp.mean(final.total_cost)):.2f}")

    # identical to the uninterrupted solve
    direct = ilqr.solve_batch(env, x0, horizon=T, config=cfg)
    dev = float(jnp.max(jnp.abs(final.actions - direct.actions)))
    print(f"max control deviation vs uninterrupted solve: {dev:.1e}")


if __name__ == "__main__":
    main()
