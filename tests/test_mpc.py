"""Receding-horizon MPC driver tests (solvers/mpc.py)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tfmpc_tpu.models.navigation import make_navigation
from tfmpc_tpu.models.reservoir import make_reservoir
from tfmpc_tpu.solvers import ilqr, mpc


@pytest.fixture(scope="module")
def nav_env():
    return make_navigation(
        goal=[8.0, -5.0],
        deceleration={"center": [[3.0, -2.0]], "decay": [2.0]},
    )


def test_reaches_goal_closed_loop(nav_env):
    res = mpc.run(
        nav_env, jnp.zeros(2), steps=25, plan_horizon=10,
        config=ilqr.ILQRConfig(atol=1e-6, max_iterations=30),
    )
    assert res.states.shape == (26, 2)
    assert res.actions.shape == (25, 2)
    np.testing.assert_allclose(
        np.asarray(res.states[-1]), [8.0, -5.0], atol=1e-3
    )
    # warm starts keep later re-plans cheap
    iters = np.asarray(res.iterations)
    assert iters[0] >= iters[5:].max()


def test_batched_matches_single(nav_env):
    x0 = jnp.asarray(
        np.random.default_rng(0).uniform(-4, 4, size=(3, 2)).astype("f4")
    )
    cfg = ilqr.ILQRConfig(atol=1e-5, max_iterations=20)
    batched = mpc.run(nav_env, x0, steps=8, plan_horizon=6, config=cfg)
    for b in range(3):
        single = mpc.run(nav_env, x0[b], steps=8, plan_horizon=6, config=cfg)
        np.testing.assert_allclose(
            np.asarray(batched.actions[b]), np.asarray(single.actions),
            rtol=1e-5, atol=1e-5,
        )


def test_respects_bounds():
    env = make_reservoir(3)
    x0 = jnp.asarray([95.0, 50.0, 20.0], jnp.float32)
    res = mpc.run(
        env, x0, steps=10, plan_horizon=8,
        config=ilqr.ILQRConfig(atol=1e-3, max_iterations=15, boxqp=True),
    )
    u = np.asarray(res.actions)
    assert u.min() >= -1e-6 and u.max() <= 50.0 + 1e-4
    assert np.isfinite(float(res.total_cost))


def test_closed_loop_cost_tracks_plan(nav_env):
    """The realized closed-loop cost should not exceed the first plan's
    prediction by much (re-planning can only help on a deterministic env)."""
    res = mpc.run(
        nav_env, jnp.asarray([2.0, 2.0]), steps=15, plan_horizon=15,
        config=ilqr.ILQRConfig(atol=1e-6, max_iterations=30),
    )
    assert float(res.total_cost) <= float(res.plan_cost[0]) * 1.01 + 1e-3


def test_sharded_closed_loop_matches_unsharded(nav_env):
    """Data-parallel closed-loop MPC (mesh.mpc_sharded: shard_map per device
    shard — the kernel-compatible path the CLI fleet uses) matches the
    unsharded run exactly, and outputs stay sharded on all devices."""
    from tfmpc_tpu.parallel import mesh as pmesh

    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    x0 = jnp.asarray(
        np.random.default_rng(9).uniform(-4, 4, size=(8, 2)).astype("f4")
    )
    cfg = ilqr.ILQRConfig(atol=1e-4, max_iterations=10)
    res_u = mpc.run(nav_env, x0, steps=5, plan_horizon=12, config=cfg)
    mesh = pmesh.make_mesh(8)
    res_s = pmesh.mpc_sharded(
        nav_env, x0, steps=5, plan_horizon=12, config=cfg, mesh=mesh
    )
    np.testing.assert_allclose(
        np.asarray(res_s.actions), np.asarray(res_u.actions),
        rtol=1e-4, atol=1e-5,
    )
    assert len(res_s.actions.sharding.device_set) == 8


def test_cli_mpc_fleet(tmp_path):
    import json
    from click.testing import CliRunner
    from tfmpc_tpu.cli import cli

    cfg = {
        "name": "navigation",
        "goal": [5.0, 5.0],
        "deceleration": {"center": [[2.0, 2.0]], "decay": [1.5]},
        "x0": [0.0, 0.0],
    }
    path = tmp_path / "nav.json"
    path.write_text(json.dumps(cfg))
    logdir = str(tmp_path / "fleet")
    result = CliRunner().invoke(
        cli, ["mpc", "--env", str(path), "--steps", "6",
              "--plan-horizon", "5", "--num-samples", "8",
              "--logdir", logdir],
    )
    assert result.exit_code == 0, result.output
    assert "closed-loop fleet of 8" in result.output
    assert len(list((tmp_path / "fleet").glob("mpc_trajectory_*.csv"))) == 8


def test_cli_mpc_command(tmp_path):
    import json
    from click.testing import CliRunner
    from tfmpc_tpu.cli import cli

    cfg = {
        "name": "navigation",
        "goal": [5.0, 5.0],
        "deceleration": {"center": [[2.0, 2.0]], "decay": [1.5]},
        "x0": [0.0, 0.0],
    }
    path = tmp_path / "nav.json"
    path.write_text(json.dumps(cfg))
    logdir = str(tmp_path / "out")
    result = CliRunner().invoke(
        cli, ["mpc", "--env", str(path), "--steps", "12",
              "--plan-horizon", "6", "--logdir", logdir],
    )
    assert result.exit_code == 0, result.output
    assert "closed-loop total_cost=" in result.output
    assert (tmp_path / "out" / "mpc_trajectory.csv").exists()
