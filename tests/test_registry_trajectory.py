"""Env registry / JSON config loading and Trajectory container tests."""

import json

import jax.numpy as jnp
import numpy as np
import pytest

from tfmpc_tpu.models.hvac import HVAC
from tfmpc_tpu.models.navigation import Navigation
from tfmpc_tpu.models.registry import load_env, make_env, registered
from tfmpc_tpu.models.reservoir import Reservoir
from tfmpc_tpu.utils.trajectory import Trajectory


class TestRegistry:
    def test_registered_names(self):
        assert {"navigation", "hvac", "reservoir"} <= set(registered())

    def test_make_navigation_from_config(self):
        env = make_env(
            {
                "name": "navigation",
                "goal": [8.0, -5.0],
                "deceleration": {"center": [[3.0, -2.0]], "decay": [2.0]},
                "low": -1.0,
                "high": 1.0,
            }
        )
        assert isinstance(env, Navigation)
        np.testing.assert_allclose(env.goal, [8.0, -5.0])
        assert env.bounds is not None

    def test_make_hvac_from_config(self):
        env = make_env({"name": "hvac", "adj": [[0, 1], [1, 0]], "temp_out": 2.0})
        assert isinstance(env, HVAC)
        assert env.state_size == 2
        np.testing.assert_allclose(float(env.temp_out), 2.0)

    def test_make_reservoir_from_config(self):
        env = make_env({"name": "reservoir", "n_reservoirs": 5, "rain": 3.0})
        assert isinstance(env, Reservoir)
        assert env.state_size == 5

    def test_unknown_name_raises(self):
        with pytest.raises(ValueError, match="unknown env"):
            make_env({"name": "nonexistent"})

    def test_missing_name_raises(self):
        with pytest.raises(ValueError, match="must contain a 'name'"):
            make_env({"goal": [0, 0]})

    def test_load_env_json_file(self, tmp_path):
        cfg = {"name": "navigation", "goal": [1.0, 2.0]}
        path = tmp_path / "env.json"
        path.write_text(json.dumps(cfg))
        env = load_env(str(path))
        np.testing.assert_allclose(env.goal, [1.0, 2.0])


class TestTrajectory:
    def _make(self, T=5, n=2, m=2):
        rng = np.random.default_rng(0)
        return Trajectory(
            states=rng.normal(size=(T + 1, n)),
            actions=rng.normal(size=(T, m)),
            costs=rng.uniform(size=(T + 1)),
        )

    def test_total_cost_and_len(self):
        tr = self._make()
        assert len(tr) == 5
        np.testing.assert_allclose(tr.total_cost, tr.costs.sum())

    def test_repr_has_all_timesteps(self):
        tr = self._make()
        r = repr(tr)
        assert "total_cost" in r
        assert len(r.splitlines()) == 1 + 1 + 5 + 1  # header, cols, T rows, final

    def test_save_csv_roundtrip(self, tmp_path):
        import pandas as pd

        tr = self._make()
        path = tr.save(str(tmp_path / "subdir" / "traj.csv"))
        df = pd.read_csv(path, index_col="timestep")
        assert df.shape[0] == 6
        np.testing.assert_allclose(df["state_0"].values, tr.states[:, 0])
        np.testing.assert_allclose(df["cost"].values, tr.costs)

    def test_from_batched_result(self):
        states = np.zeros((3, 6, 2))
        actions = np.zeros((3, 5, 2))
        costs = np.zeros((3, 6))
        tr = Trajectory.from_result((states, actions, costs), index=1)
        assert tr.states.shape == (6, 2)

    def test_batched_states_rejected(self):
        with pytest.raises(ValueError, match="single scenario"):
            Trajectory(np.zeros((3, 6, 2)), np.zeros((3, 5, 2)), np.zeros((3, 6)))
