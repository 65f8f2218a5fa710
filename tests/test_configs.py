"""Shipped example configs (configs/*.json) load and solve.

The reference CLI consumed JSON env configs (SURVEY §5 config row); these
files are the schema-compatible examples shipped with the TPU build. Each
must construct through the registry and make iLQR progress at a small
horizon.
"""

import glob
import json
import os

import jax.numpy as jnp
import numpy as np
import pytest

from tfmpc_tpu.models.registry import load_env
from tfmpc_tpu.solvers import ilqr

CONFIG_DIR = os.path.join(os.path.dirname(__file__), "..", "configs")
CONFIGS = sorted(glob.glob(os.path.join(CONFIG_DIR, "*.json")))


def test_configs_are_shipped():
    names = {os.path.basename(p) for p in CONFIGS}
    assert {"navigation.json", "hvac.json", "reservoir.json"} <= names


@pytest.mark.parametrize("path", CONFIGS, ids=os.path.basename)
def test_config_loads_and_solves(path):
    with open(path) as f:
        cfg = json.load(f)
    env = load_env(path)
    assert env.state_size == len(cfg["x0"])

    x0 = jnp.asarray(cfg["x0"], jnp.float32)
    config = ilqr.ILQRConfig(atol=1e-3, max_iterations=15)
    res = ilqr.solve(env, x0, horizon=10, config=config)

    J0 = float(
        env.total_cost(x0, env.clip(jnp.zeros((10, env.action_size), x0.dtype)))
    )
    assert np.isfinite(float(res.total_cost))
    # iLQR must improve on (or match, if already optimal) the null policy
    assert float(res.total_cost) <= J0 + 1e-5
    assert bool(res.converged) or int(res.iterations) == 15
