"""tfmpc_tpu: TPU-native trajectory optimization (LQR / iLQR) framework.

A from-scratch JAX/XLA/Pallas re-design with the capability surface of the
reference ``thiagopbueno/tf-mpc`` library (see SURVEY.md): finite-horizon LQR
and regularized iLQR over differentiable environments (navigation, HVAC,
reservoir), batched over thousands of scenarios per chip and sharded over
device meshes.
"""

from tfmpc_tpu.core.types import (
    Bounds,
    LinearModel,
    LQRProblem,
    Policy,
    QuadraticFinal,
    QuadraticModel,
    SecondOrderModel,
    ValueFunction,
)
from tfmpc_tpu.models.base import Env
from tfmpc_tpu.models.hvac import HVAC, make_hvac
from tfmpc_tpu.models.linear import LinearSystem, make_linear_system
from tfmpc_tpu.models.navigation import Navigation, make_navigation
from tfmpc_tpu.models.problems import make_lqr, make_lqr_linear_navigation
from tfmpc_tpu.models.registry import load_env, make_env
from tfmpc_tpu.models.reservoir import Reservoir, make_reservoir
from tfmpc_tpu.solvers import ilqr, lqr, mpc
from tfmpc_tpu.solvers.ilqr import ILQRConfig, ILQRResult, ILQRTrace
from tfmpc_tpu.solvers.ilqr_batched import SolverState, state_from_result
from tfmpc_tpu.utils import checkpoint
from tfmpc_tpu.utils.trajectory import Trajectory

__version__ = "0.1.0"

__all__ = [
    "Bounds",
    "Env",
    "HVAC",
    "ILQRConfig",
    "ILQRResult",
    "ILQRTrace",
    "SolverState",
    "LQRProblem",
    "LinearModel",
    "LinearSystem",
    "Navigation",
    "Policy",
    "QuadraticFinal",
    "QuadraticModel",
    "Reservoir",
    "SecondOrderModel",
    "Trajectory",
    "ValueFunction",
    "checkpoint",
    "ilqr",
    "load_env",
    "lqr",
    "make_env",
    "mpc",
    "state_from_result",
    "make_hvac",
    "make_linear_system",
    "make_lqr",
    "make_lqr_linear_navigation",
    "make_navigation",
    "make_reservoir",
]
