"""Checkpoint/resume + per-iteration trace tests (SURVEY §5 aux subsystems).

The reference has neither capability; these pin the TPU-build additions:
- trace mode (lax.scan outer loop) is state-identical to the while_loop path;
- a solve interrupted at iteration k and resumed from its checkpoint is
  bit-identical to an uninterrupted solve.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tfmpc_tpu.models.navigation import make_navigation
from tfmpc_tpu.solvers import ilqr, ilqr_batched
from tfmpc_tpu.utils import checkpoint


@pytest.fixture(scope="module")
def env():
    return make_navigation(
        goal=[8.0, -5.0],
        deceleration={"center": [[3.0, -2.0]], "decay": [2.0]},
    )


@pytest.fixture(scope="module")
def x0():
    rng = np.random.default_rng(7)
    return jnp.asarray(rng.uniform(-6.0, 6.0, size=(4, 2)).astype("float32"))


HORIZON = 20


class TestTrace:
    def test_trace_result_matches_while_loop(self, env, x0):
        config = ilqr.ILQRConfig(atol=1e-4, max_iterations=12)
        res_while = ilqr.solve_batch(env, x0, horizon=HORIZON, config=config)
        res_trace, trace = ilqr.solve_batch(
            env, x0, horizon=HORIZON, config=config, return_trace=True
        )
        for a, b, name in zip(res_while, res_trace, res_while._fields):
            np.testing.assert_array_equal(
                np.asarray(a), np.asarray(b), err_msg=f"field {name}"
            )
        assert trace.J.shape == (config.max_iterations, x0.shape[0])

    def test_trace_semantics(self, env, x0):
        config = ilqr.ILQRConfig(atol=1e-4, max_iterations=12)
        res, trace = ilqr.solve_batch(
            env, x0, horizon=HORIZON, config=config, return_trace=True
        )
        J = np.asarray(trace.J)
        accepted = np.asarray(trace.accepted)
        alpha = np.asarray(trace.alpha)
        converged = np.asarray(trace.converged)
        # cost never increases along the trace (frozen lanes stay constant)
        assert (np.diff(J, axis=0) <= 1e-6).all()
        # an accepted iteration records its step size from the alpha grid
        grid = np.asarray(config.alphas())
        assert np.isin(alpha[accepted], grid).all()
        # convergence is absorbing in the trace
        assert (converged[:-1] <= converged[1:]).all()
        # the final trace row agrees with the result
        np.testing.assert_array_equal(converged[-1], np.asarray(res.converged))
        np.testing.assert_allclose(J[-1], np.asarray(res.total_cost))


class TestCheckpointResume:
    def test_resume_is_exact(self, env, x0):
        full = ilqr.solve_batch(
            env, x0, horizon=HORIZON,
            config=ilqr.ILQRConfig(atol=1e-4, max_iterations=10),
        )

        part = ilqr.solve_batch(
            env, x0, horizon=HORIZON,
            config=ilqr.ILQRConfig(atol=1e-4, max_iterations=4),
        )
        state = ilqr_batched.state_from_result(part)
        resumed = ilqr_batched.resume(
            env, state, config=ilqr.ILQRConfig(atol=1e-4, max_iterations=10)
        )

        np.testing.assert_array_equal(
            np.asarray(full.actions), np.asarray(resumed.actions)
        )
        np.testing.assert_array_equal(
            np.asarray(full.total_cost), np.asarray(resumed.total_cost)
        )
        np.testing.assert_array_equal(
            np.asarray(full.iterations), np.asarray(resumed.iterations)
        )
        np.testing.assert_array_equal(
            np.asarray(full.converged), np.asarray(resumed.converged)
        )
        np.testing.assert_array_equal(
            np.asarray(full.mu), np.asarray(resumed.mu)
        )

    def test_npz_roundtrip(self, env, x0, tmp_path):
        part = ilqr.solve_batch(
            env, x0, horizon=HORIZON,
            config=ilqr.ILQRConfig(atol=1e-4, max_iterations=4),
        )
        state = ilqr_batched.state_from_result(part)
        path = checkpoint.save_state(str(tmp_path / "ckpt.npz"), state)
        loaded = checkpoint.load_state(path)
        for a, b, name in zip(state, loaded, state._fields):
            np.testing.assert_array_equal(
                np.asarray(a), np.asarray(b), err_msg=f"field {name}"
            )
        assert loaded.X.dtype == np.asarray(state.X).dtype

    def test_load_rejects_non_checkpoint(self, tmp_path):
        path = tmp_path / "junk.npz"
        np.savez(path, foo=np.zeros(3))
        with pytest.raises(ValueError, match="missing fields"):
            checkpoint.load_state(str(path))

    def test_resume_rejects_wrong_env(self, env, x0):
        """A checkpoint from a different env family fails fast with a clear
        message instead of an opaque shape error inside the jitted resume
        (round-1 ADVICE)."""
        from tfmpc_tpu.models.reservoir import make_reservoir

        part = ilqr.solve_batch(
            env, x0, horizon=HORIZON,
            config=ilqr.ILQRConfig(atol=1e-4, max_iterations=2),
        )
        state = ilqr_batched.state_from_result(part)
        with pytest.raises(ValueError, match="wrong env"):
            ilqr_batched.resume(make_reservoir(5), state)

    def test_resume_rejects_wrong_dtype(self, env, x0):
        """A dtype-mismatched checkpoint (e.g. saved under x64) fails fast in
        validate_state instead of deep inside the jitted resume (round-2
        ADVICE: the recorded dtype was written but never checked)."""
        part = ilqr.solve_batch(
            env, x0, horizon=HORIZON,
            config=ilqr.ILQRConfig(atol=1e-4, max_iterations=2),
        )
        state = ilqr_batched.state_from_result(part)
        state64 = ilqr_batched.SolverState(
            *[np.asarray(a, np.float64 if np.asarray(a).dtype == np.float32
              else np.asarray(a).dtype) for a in state]
        )
        with pytest.raises(ValueError, match="dtype"):
            ilqr_batched.resume(env, state64)

    def test_load_rejects_recorded_dtype_mismatch(self, env, x0, tmp_path):
        part = ilqr.solve_batch(
            env, x0, horizon=HORIZON,
            config=ilqr.ILQRConfig(atol=1e-4, max_iterations=2),
        )
        state = ilqr_batched.state_from_result(part)
        path = checkpoint.save_state(str(tmp_path / "ckpt.npz"), state)
        with np.load(path) as data:
            arrays = {k: data[k] for k in data.files}
        arrays["__dtype__"] = np.array("float64")  # lie about the dtype
        np.savez(tmp_path / "bad_dtype.npz", **arrays)
        with pytest.raises(ValueError, match="dtype"):
            checkpoint.load_state(str(tmp_path / "bad_dtype.npz"))

    def test_load_rejects_corrupt_metadata(self, env, x0, tmp_path):
        part = ilqr.solve_batch(
            env, x0, horizon=HORIZON,
            config=ilqr.ILQRConfig(atol=1e-4, max_iterations=2),
        )
        state = ilqr_batched.state_from_result(part)
        path = checkpoint.save_state(str(tmp_path / "ckpt.npz"), state)
        with np.load(path) as data:
            arrays = {k: data[k] for k in data.files}
        arrays["U"] = arrays["U"][:, :-1]  # truncate the horizon
        np.savez(tmp_path / "bad.npz", **arrays)
        with pytest.raises(ValueError, match="metadata|inconsistent"):
            checkpoint.load_state(str(tmp_path / "bad.npz"))

    def test_resume_after_convergence_is_noop(self, env, x0):
        config = ilqr.ILQRConfig(atol=1e-4, max_iterations=50)
        full = ilqr.solve_batch(env, x0, horizon=HORIZON, config=config)
        assert bool(np.asarray(full.converged).all())
        state = ilqr_batched.state_from_result(full)
        resumed = ilqr_batched.resume(env, state, config=config)
        np.testing.assert_array_equal(
            np.asarray(full.actions), np.asarray(resumed.actions)
        )
        np.testing.assert_array_equal(
            np.asarray(full.iterations), np.asarray(resumed.iterations)
        )
