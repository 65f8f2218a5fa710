"""REAL multi-process distributed solve (jax.distributed over localhost).

Everything else in tests/ simulates multi-device on one process; this test
actually runs ``jax.distributed.initialize`` across two OS processes (the
multi-host bring-up path, with cross-process collectives over gRPC) and
checks the sharded solve's global statistics agree across processes and
match a single-process solve of the same global batch.
"""

import json
import os
import socket
import subprocess
import sys

import numpy as np
import pytest


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def test_two_process_sharded_solve():
    port = _free_port()
    coordinator = f"127.0.0.1:{port}"
    runner = os.path.join(os.path.dirname(__file__), "multiprocess_runner.py")
    env = {
        k: v for k, v in os.environ.items()
        if k not in ("XLA_FLAGS", "JAX_PLATFORMS")
    }
    env["PYTHONPATH"] = os.pathsep.join(
        [os.path.dirname(os.path.dirname(os.path.abspath(runner)))]
        + env.get("PYTHONPATH", "").split(os.pathsep)
    )

    procs = [
        subprocess.Popen(
            [sys.executable, runner, coordinator, "2", str(i)],
            stdout=subprocess.PIPE, stderr=subprocess.PIPE, env=env, text=True,
        )
        for i in range(2)
    ]
    outs = []
    for p in procs:
        try:
            out, err = p.communicate(timeout=540)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            pytest.fail("multi-process solve timed out")
        if p.returncode != 0 and (
            "UNAVAILABLE" in err or "DEADLINE" in err or "permission" in err.lower()
        ):
            pytest.skip(f"distributed init unavailable in this sandbox: {err[-300:]}")
        assert p.returncode == 0, err[-2000:]
        outs.append(json.loads(out.strip().splitlines()[-1]))

    # both processes computed over the same 8-device global mesh and agree
    for o in outs:
        assert o["devices"] == 8
    assert outs[0]["num_converged"] == outs[1]["num_converged"] == 16
    assert abs(outs[0]["mean_cost"] - outs[1]["mean_cost"]) < 1e-5

    # matches the single-process solve of the same global batch
    import jax.numpy as jnp

    from tfmpc_tpu.models.navigation import make_navigation
    from tfmpc_tpu.solvers import ilqr

    env_ = make_navigation(
        goal=[8.0, -5.0], deceleration={"center": [[3.0, -2.0]], "decay": [2.0]}
    )
    x0 = np.random.default_rng(0).uniform(-5, 5, size=(16, 2)).astype("float32")
    res = ilqr.solve_batch(
        env_, jnp.asarray(x0), horizon=12,
        config=ilqr.ILQRConfig(atol=1e-4, max_iterations=25),
    )
    np.testing.assert_allclose(
        outs[0]["mean_cost"], float(jnp.mean(res.total_cost)), rtol=1e-5
    )
