"""The shipped examples run end-to-end (user-facing API surface).

Each example in examples/ is executed in-process on the CPU test mesh;
assertions here are deliberately light — the examples' own prints and the
framework's tests carry the numerical checks — but an API drift (renamed
function, changed signature) fails loudly here instead of in a user's
shell.
"""

import io
import os
import runpy
from contextlib import redirect_stdout

import pytest

EXAMPLES = os.path.join(os.path.dirname(__file__), "..", "examples")


@pytest.mark.parametrize("name,expect", [
    ("custom_env.py", "batched solve"),
    ("mpc_closed_loop.py", "closed-loop final state"),
    ("distributed_solve.py", "device(s)"),
    ("checkpoint_resume.py", "resumed to convergence"),
])
def test_example_runs(name, expect):
    buf = io.StringIO()
    with redirect_stdout(buf):
        runpy.run_path(os.path.join(EXAMPLES, name), run_name="__main__")
    out = buf.getvalue()
    assert expect in out, out
