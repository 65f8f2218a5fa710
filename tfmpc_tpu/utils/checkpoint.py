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

_META_KEY = "__tfmpc_meta__"
_FORMAT = 1


def save_state(path: str, state: SolverState) -> str:
    """Serialize a ``SolverState`` to ``.npz``; returns the path written.

    A metadata record (format version, batch/horizon/state/action sizes,
    dtype) travels with the arrays so ``load_state``/``validate_state`` can
    reject mismatched checkpoints with a clear error instead of failing
    later inside the jitted resume with an opaque shape error.
    """
    directory = os.path.dirname(path)
    if directory:
        os.makedirs(directory, exist_ok=True)
    arrays = {k: np.asarray(v) for k, v in state._asdict().items()}
    B, Tp1, n = arrays["X"].shape
    meta = np.array(
        [_FORMAT, B, Tp1 - 1, n, arrays["U"].shape[-1]], dtype=np.int64
    )
    arrays[_META_KEY] = meta
    arrays["__dtype__"] = np.array(str(arrays["X"].dtype))
    with open(path, "wb") as f:
        np.savez(f, **arrays)
    return path


def load_state(path: str) -> SolverState:
    """Load a ``SolverState`` written by ``save_state``.

    Validates field presence and internal shape consistency (batch axis
    shared by every field, ``X`` one step longer than ``U``).
    """
    with np.load(path) as data:
        missing = [k for k in SolverState._fields if k not in data.files]
        if missing:
            raise ValueError(
                f"{path} is not a solver checkpoint: missing fields {missing}"
            )
        state = SolverState(**{k: data[k] for k in SolverState._fields})
        if "__dtype__" in data.files:
            recorded = str(data["__dtype__"])
            if str(state.X.dtype) != recorded:
                raise ValueError(
                    f"{path}: X dtype {state.X.dtype} disagrees with the "
                    f"recorded checkpoint dtype {recorded} — file corrupt?"
                )
        if _META_KEY in data.files:
            fmt, B, T, n, m = (int(v) for v in data[_META_KEY])
            if fmt > _FORMAT:
                raise ValueError(
                    f"{path}: checkpoint format {fmt} is newer than this "
                    f"build supports ({_FORMAT})"
                )
            if state.X.shape != (B, T + 1, n) or state.U.shape != (B, T, m):
                raise ValueError(
                    f"{path}: array shapes {state.X.shape}/{state.U.shape} "
                    f"disagree with the checkpoint metadata "
                    f"(B={B}, T={T}, n={n}, m={m}) — file corrupt?"
                )
    B = state.X.shape[0]
    bad = [
        k for k, v in state._asdict().items() if np.asarray(v).shape[0] != B
    ]
    if bad or state.X.shape[1] != state.U.shape[1] + 1:
        raise ValueError(
            f"{path}: inconsistent solver state (batch-axis mismatch on "
            f"{bad or 'X/U horizon'})"
        )
    return state


def validate_state(state: SolverState, env) -> None:
    """Raise with a clear message if ``state`` cannot resume on ``env``.

    Called by ``ilqr_batched.resume`` before jitting — a checkpoint saved
    from a different env family otherwise surfaces as an opaque shape/dtype
    error deep inside the compiled program.
    """
    n, m = state.X.shape[-1], state.U.shape[-1]
    if n != env.state_size or m != env.action_size:
        raise ValueError(
            f"checkpoint was saved for state/action sizes ({n}, {m}) but "
            f"env '{type(env).__name__}' has ({env.state_size}, "
            f"{env.action_size}) — wrong env for this checkpoint"
        )
    import jax

    # np.asarray, NOT jnp: this only reads dtypes, and jnp.asarray would
    # device-put the full trajectory (tens of MB at B=4096, T=500 — over
    # the remote-dispatch tunnel on a TPU host) and, under default x64-off,
    # silently canonicalize float64 to float32, masking the very
    # "different x64 setting" mismatch this check exists to report.
    # Python-scalar leaves are skipped: they are weakly typed in the
    # compiled solve (they adopt the trajectory dtype), so they cannot
    # cause the mismatch this check guards against — and np.asarray would
    # mislabel them float64.
    env_dtypes = {
        leaf.dtype
        for leaf in jax.tree_util.tree_leaves(env)
        if hasattr(leaf, "dtype") and np.issubdtype(leaf.dtype, np.floating)
    }
    x_dtype = np.asarray(state.X).dtype
    if env_dtypes and x_dtype not in env_dtypes:
        raise ValueError(
            f"checkpoint arrays are {x_dtype} but env "
            f"'{type(env).__name__}' parameters are "
            f"{sorted(str(d) for d in env_dtypes)} — a dtype-mismatched "
            f"resume would fail inside the compiled solve (was the "
            f"checkpoint saved with a different x64 setting?)"
        )
