"""N>=2-host throughput/efficiency measurement (BASELINE.md:19).

Real TPU pods are not reachable from this machine, so the multi-HOST axis
is measured the same way the multi-process correctness test runs: two OS
processes over localhost gRPC (the genuine ``jax.distributed`` machinery —
coordinator, cross-process device mesh, per-host data feeds), each owning
half of an 8-device virtual CPU mesh. The comparison holds TOTAL device
count fixed (1 proc x 8 devices vs 2 procs x 4 devices), so the efficiency
number isolates exactly what adding a process boundary costs:

  efficiency = solves/s (2 procs, 8 devices) / solves/s (1 proc, 8 devices)

The runner also audits the compiled HLO of the sharded solve for
collective ops (``solve_collective_ops``): scenarios are independent, so
the solve must contain NONE, and the summary all-reduce must touch only
scalars — the "DCN sees only scalar summaries" claim as a measurement.

Usage: python benchmarks/multiprocess_bench.py
(CPU-only; does not touch the TPU tunnel.)
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(
    0,
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                 "tests"),
)
from mp_launch import spawn_group  # noqa: E402


def main():
    single = spawn_group("bench", num_procs=1, devices_per_proc=8,
                         timeout=900)[0]
    double = spawn_group("bench", num_procs=2, devices_per_proc=4,
                         timeout=900)
    d0 = double[0]
    eff = d0["solves_per_s"] / single["solves_per_s"]
    print(json.dumps({
        "metric": "2-process (localhost DCN) scaling efficiency "
                  "at equal 8-device total",
        "single_process_solves_per_s": single["solves_per_s"],
        "two_process_solves_per_s": d0["solves_per_s"],
        "efficiency": round(eff, 3),
        "batch": d0["batch"], "horizon": d0["horizon"],
        "frac_converged": d0["frac_converged"],
        "solve_collective_ops": d0["solve_collective_ops"],
        "summary_collective_ops": d0["summary_collective_ops"][:4],
    }), flush=True)


if __name__ == "__main__":
    main()
