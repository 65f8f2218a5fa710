"""Trajectory result container with repr/CSV surface.

Capability parity with reference ``tfmpc/utils/trajectory.py`` (SURVEY §2.1:
holds (states, actions, costs); ``total_cost``; pretty per-timestep
``__repr__`` table; CSV export consumed by the CLI logdir output).

TPU-first note: this is a host-side container — device arrays are pulled to
NumPy exactly once at construction (results cross the device boundary only
here, after the fully-on-device solve).
"""

from __future__ import annotations

import os
from typing import Optional

import numpy as np


class Trajectory:
    """Host-side (states, actions, costs) triple for one solved scenario.

    ``states``: [T+1, n]; ``actions``: [T, m]; ``costs``: [T+1] (last entry is
    the final cost). Batched results should be sliced per scenario before
    wrapping.
    """

    def __init__(self, states, actions, costs):
        self.states = np.asarray(states)
        self.actions = np.asarray(actions)
        self.costs = np.asarray(costs)
        if self.states.ndim != 2:
            raise ValueError(
                "Trajectory holds a single scenario: states must be [T+1, n], "
                f"got shape {self.states.shape}"
            )

    def __len__(self) -> int:
        return self.actions.shape[0]

    @property
    def total_cost(self) -> float:
        return float(np.sum(self.costs))

    @property
    def final_state(self) -> np.ndarray:
        return self.states[-1]

    def __repr__(self) -> str:
        T = len(self)
        header = f"Trajectory(T={T}, total_cost={self.total_cost:.4f})"
        lines = [header]
        fmt = lambda v: "[" + ", ".join(f"{x: .4f}" for x in v) + "]"
        lines.append(f"{'t':>4}  {'state':<40} {'action':<40} {'cost':>12}")
        for t in range(T):
            lines.append(
                f"{t:>4}  {fmt(self.states[t]):<40} {fmt(self.actions[t]):<40} "
                f"{self.costs[t]:>12.4f}"
            )
        lines.append(
            f"{T:>4}  {fmt(self.states[T]):<40} {'(final)':<40} "
            f"{self.costs[T]:>12.4f}"
        )
        return "\n".join(lines)

    def to_dataframe(self):
        """Per-timestep DataFrame (pandas imported lazily)."""
        import pandas as pd

        T = len(self)
        n = self.states.shape[1]
        m = self.actions.shape[1]
        data = {}
        for j in range(n):
            data[f"state_{j}"] = self.states[: T + 1, j]
        for j in range(m):
            col = np.full(T + 1, np.nan)
            col[:T] = self.actions[:, j]
            data[f"action_{j}"] = col
        data["cost"] = self.costs
        return pd.DataFrame(data)

    def save(self, path: str) -> str:
        """Write the trajectory as CSV; returns the path written.

        Mirrors the reference CLI's logdir trajectory dump (SURVEY §3.1).
        """
        directory = os.path.dirname(path)
        if directory:
            os.makedirs(directory, exist_ok=True)
        self.to_dataframe().to_csv(path, index_label="timestep")
        return path

    @classmethod
    def from_result(cls, result, index: Optional[int] = None) -> "Trajectory":
        """Wrap a solver result (LQR tuple or ILQRResult), optionally one
        scenario of a batched result."""
        states, actions, costs = result[0], result[1], result[2]
        if index is not None:
            states, actions, costs = states[index], actions[index], costs[index]
        return cls(states, actions, costs)
