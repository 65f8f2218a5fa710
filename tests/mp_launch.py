"""Shared launcher for the real multi-process runner (tests + benches).

One spawner for one runner: tests/test_multiprocess.py and
benchmarks/multiprocess_bench.py previously each carried their own Popen
fan-out with diverging error handling (the bench copy leaked live children
on timeout and on proc-0 failure). This module owns port pick, env
filtering, PYTHONPATH assembly, spawn, reaping, and child cleanup on every
error path; callers translate the typed exceptions into pytest.skip/fail
or bench output as appropriate.
"""

from __future__ import annotations

import json
import os
import socket
import subprocess
import sys

_TESTS_DIR = os.path.dirname(os.path.abspath(__file__))
_RUNNER = os.path.join(_TESTS_DIR, "multiprocess_runner.py")


class DistributedUnavailable(RuntimeError):
    """jax.distributed could not initialize in this sandbox (gRPC blocked)."""


class GroupTimeout(RuntimeError):
    """A child exceeded the deadline; all children have been killed."""


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def spawn_group(
    mode: str,
    num_procs: int = 2,
    devices_per_proc: int = 4,
    timeout: float = 540,
) -> list:
    """Run ``num_procs`` runner children to completion; return their JSON
    result lines (one dict per process, index = process id).

    Children are killed before raising on ANY failure path — timeout,
    nonzero exit, unavailable distributed init — so no gRPC-connected
    orphans outlive the call (they would hold the coordinator port and
    starve subsequent groups).
    """
    coordinator = f"127.0.0.1:{_free_port()}"
    env = {
        k: v for k, v in os.environ.items()
        if k not in ("XLA_FLAGS", "JAX_PLATFORMS")
    }
    env["PYTHONPATH"] = os.pathsep.join(
        [os.path.dirname(_TESTS_DIR)]
        + env.get("PYTHONPATH", "").split(os.pathsep)
    )
    procs = [
        subprocess.Popen(
            [sys.executable, _RUNNER, coordinator, str(num_procs), str(i),
             mode, str(devices_per_proc)],
            stdout=subprocess.PIPE, stderr=subprocess.PIPE, env=env,
            text=True,
        )
        for i in range(num_procs)
    ]
    outs = []
    try:
        for p in procs:
            try:
                out, err = p.communicate(timeout=timeout)
            except subprocess.TimeoutExpired:
                raise GroupTimeout(
                    f"multi-process runner ({mode}, {num_procs} procs) "
                    f"exceeded {timeout}s"
                ) from None
            if p.returncode != 0:
                if (
                    "UNAVAILABLE" in err or "DEADLINE" in err
                    or "permission" in err.lower()
                ):
                    raise DistributedUnavailable(err[-300:])
                raise RuntimeError(
                    f"runner failed (mode={mode}, procs={num_procs}): "
                    f"{err[-2000:]}"
                )
            outs.append(json.loads(out.strip().splitlines()[-1]))
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()
                p.wait()
    return outs
