"""North-star accuracy anchor: solver vs independent float64 NumPy oracle.

BASELINE.md binds the build to "<1e-4 control-trajectory deviation vs
reference"; with the reference mount empty (SURVEY provenance note), the
anchor is the independent NumPy iLQR oracle in oracles.py — hand-derived
analytic derivatives, no shared code with the package.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from oracles import ilqr_navigation_oracle_np
from tfmpc_tpu.models.navigation import make_navigation
from tfmpc_tpu.solvers import ilqr

CASES = [
    # (goal, centers, decays, x0, T)
    ([8.0, -5.0], [[3.0, -2.0]], [2.0], [0.0, 0.0], 20),
    ([8.0, -5.0], [[3.0, -2.0], [6.0, -4.0]], [2.0, 1.5], [-1.0, 1.0], 40),
    ([5.0, 5.0], [], [], [0.0, 0.0], 10),  # linear case (no zones)
]


@pytest.mark.parametrize("goal,centers,decays,x0,T", CASES)
def test_controls_match_numpy_oracle(goal, centers, decays, x0, T):
    X_np, U_np, J_np = ilqr_navigation_oracle_np(
        goal, centers, decays, x0, T, atol=1e-10
    )

    env = make_navigation(
        goal=goal,
        deceleration=(
            {"center": centers, "decay": decays} if centers else None
        ),
    )
    res = ilqr.solve(
        env, jnp.asarray(x0, jnp.float32), horizon=T,
        config=ilqr.ILQRConfig(atol=1e-10, max_iterations=200),
    )
    assert bool(res.converged)

    dev = float(np.max(np.abs(np.asarray(res.actions) - U_np)))
    assert dev < 1e-4, f"control deviation {dev} vs oracle (target <1e-4)"
    assert abs(float(res.total_cost) - J_np) < 1e-3 * max(1.0, abs(J_np))


def test_oracle_is_sane():
    """The oracle itself reaches the goal on an easy instance."""
    X, U, J = ilqr_navigation_oracle_np(
        [5.0, 5.0], [], [], [0.0, 0.0], 10, atol=1e-12
    )
    np.testing.assert_allclose(X[-1], [5.0, 5.0], atol=1e-6)
