"""Checkpoint / resume for long batched solves.

The reference has no checkpointing (solves are seconds-long; SURVEY §5
checkpoint row documents this as a TPU-build addition for long batched
runs). The unit of persistence is ``ilqr_batched.SolverState`` — the complete
per-scenario solver state (nominal trajectory, regularization, convergence
flags) — serialized as a flat ``.npz`` pytree. Round-trip is exact: resuming
a checkpointed solve produces bit-identical results to an uninterrupted one
(``tests/test_checkpoint.py``).

Usage::

    result = ilqr.solve_batch(env, x0, horizon=100, config=cfg_3_iters)
    save_state("ckpt.npz", state_from_result(result))
    ...
    state = load_state("ckpt.npz")
    result = ilqr_batched.resume(env, state, config=cfg_full)
"""

from __future__ import annotations

import os

import numpy as np

from tfmpc_tpu.solvers.ilqr_batched import SolverState


def save_state(path: str, state: SolverState) -> str:
    """Serialize a ``SolverState`` to ``.npz``; returns the path written."""
    directory = os.path.dirname(path)
    if directory:
        os.makedirs(directory, exist_ok=True)
    arrays = {k: np.asarray(v) for k, v in state._asdict().items()}
    with open(path, "wb") as f:
        np.savez(f, **arrays)
    return path


def load_state(path: str) -> SolverState:
    """Load a ``SolverState`` written by ``save_state``."""
    with np.load(path) as data:
        missing = [k for k in SolverState._fields if k not in data.files]
        if missing:
            raise ValueError(
                f"{path} is not a solver checkpoint: missing fields {missing}"
            )
        return SolverState(**{k: data[k] for k in SolverState._fields})
