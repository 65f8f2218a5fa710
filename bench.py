"""Benchmark harness: batched iLQR throughput on the headline config.

Headline metric (BASELINE.md / BASELINE.json north star): batched iLQR
solves/s on 2-D nonlinear navigation with a deceleration zone, horizon 100.
Target: >=1000 solves/s on a v5e-8 (i.e. 125 solves/s/chip); this harness
reports whole-process throughput on however many chips are visible.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "solves/s", "vs_baseline": N}
``vs_baseline`` is value / 1000 (the north-star target; the reference
publishes no numbers of its own — BASELINE.md).
"""

import contextlib
import json
import os
import sys
import time
import warnings

import jax
import jax.numpy as jnp
import numpy as np

# A solve that silently fell back to the XLA path (kernel compile failure)
# must not be reported as a kernel number — fail loud instead.
warnings.filterwarnings("error", message="fused Pallas kernel path failed")

# Persistent XLA compile cache (shared with pytest + benchmarks/): repeat
# bench runs skip the tunnel recompiles; a cache hit cannot change results.
jax.config.update("jax_compilation_cache_dir", "/root/.cache/tfmpc_tpu_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

_TUNNEL_NOTE = ""


def _guard_dead_tunnel():
    """Fail fast instead of hanging when the remote-TPU relay is down.

    The axon plugin (registered whenever /root/.axon_site is on PYTHONPATH)
    blocks backend init indefinitely on a dead tunnel (health endpoint
    returns nothing; the process sits at 0 CPU — CLAUDE.md). Hosting-managed
    outages of 30 min-3 h were observed 2026-08-17; if the driver runs this
    bench during one, a silent hang would read as a stall. Probe the relay
    health endpoint with a bounded timeout and fall back to the CPU backend
    with an explicit marker in the JSON line rather than hanging.
    """
    global _TUNNEL_NOTE
    if ".axon_site" not in os.environ.get("PYTHONPATH", ""):
        return
    import urllib.error
    import urllib.request

    try:
        urllib.request.urlopen("http://127.0.0.1:8103/health", timeout=5)
    except urllib.error.HTTPError:
        return  # relay responded (any HTTP status): tunnel is alive
    except Exception:
        jax.config.update("jax_platforms", "cpu")
        _TUNNEL_NOTE = " [CPU FALLBACK: TPU tunnel relay down at bench time]"


def main():
    """Optional env knobs (SURVEY §5 tracing row):

    TFMPC_PROFILE_DIR=<dir>  wrap the timed loop in a ``jax.profiler.trace``
                             (XProf; the solver stages carry named scopes
                             ilqr.derivatives / ilqr.backward /
                             ilqr.linesearch / ilqr.kkt).
    """
    from tfmpc_tpu.models.navigation import make_navigation
    from tfmpc_tpu.parallel import mesh as pmesh
    from tfmpc_tpu.solvers import ilqr

    _guard_dead_tunnel()
    devices = jax.devices()
    n_dev = len(devices)

    env = make_navigation(
        goal=[8.0, -5.0],
        deceleration={"center": [[3.0, -2.0]], "decay": [2.0]},
    )
    config = ilqr.ILQRConfig(atol=1e-4, max_iterations=50, use_pallas=True)
    horizon = 100
    B = 4096 if devices[0].platform != "cpu" else 256
    B = (B // n_dev) * n_dev

    rng = np.random.default_rng(0)
    x0 = jnp.asarray(rng.uniform(-10.0, 10.0, size=(B, 2)).astype("float32"))

    mesh = pmesh.make_mesh(n_dev)

    # Amortize the tunnel dispatch: REPS full solves inside ONE jitted
    # program (lax.scan with a perturbed carry so XLA cannot hoist the
    # body), synchronized by a single host fetch per dispatch. The remote
    # dispatch latency is tens of ms and time-varying (measured 35-100 ms
    # across sessions) — per-solve dispatching would measure the tunnel,
    # not the chip (CLAUDE.md perf findings). At 8 solves/dispatch ~15% of
    # the window was STILL tunnel (362.9k vs 433k at 30-deep amortization,
    # 2026-08-20 A/B); 32 puts ~360 ms of compute behind each dispatch so
    # the number is the chip to within a few percent.
    REPS = 32
    env_r = pmesh.replicate(env, mesh)
    x0_s = pmesh.shard_batch(x0, mesh)

    def solve_many(eps):
        def body(carry, _):
            res = pmesh._solve_batch_sharded(
                env_r, x0_s + carry, horizon, config, mesh
            )
            return carry + 1e-6, jnp.sum(res.total_cost)
        _, costs = jax.lax.scan(body, eps, None, length=REPS)
        return jnp.sum(costs)

    solve_fn = jax.jit(solve_many)

    def run():
        # Synchronize via a host fetch: on the experimental remote-TPU
        # backend block_until_ready can return before execution finishes,
        # which would let this loop enqueue unboundedly.
        return float(solve_fn(jnp.float32(1e-7)))

    run()  # compile
    profile_dir = os.environ.get("TFMPC_PROFILE_DIR")
    ctx = (
        jax.profiler.trace(profile_dir)
        if profile_dir
        else contextlib.nullcontext()
    )

    def timing_window():
        t0 = time.perf_counter()
        reps = 0
        while time.perf_counter() - t0 < 3.0 and reps < 80:
            run()
            reps += 1
        return B * REPS * reps / (time.perf_counter() - t0)

    # Median of five windows: the remote-TPU dispatch tunnel adds 15-25%
    # run-to-run noise that only ever slows the measurement down, but a
    # max-of-N estimator is one-sided — the median is defensible and the
    # selection policy travels with the number in the JSON line.
    with ctx:
        timing_window()  # discard one warmup window (queue/cache effects)
        windows = sorted(timing_window() for _ in range(5))
        solves_per_s = windows[2]

    # sanity: solves must actually converge for throughput to mean anything
    res = pmesh.solve_ilqr_sharded(env, x0, horizon=horizon, config=config, mesh=mesh)
    frac = float(jnp.mean(res.converged.astype(jnp.float32)))

    print(
        json.dumps(
            {
                "metric": (
                    f"batched iLQR solves/s (navigation T=100, B={B}, "
                    f"{n_dev} {devices[0].platform} device(s), "
                    f"{frac:.3f} converged, sustained: {REPS} solves per "
                    f"host dispatch){_TUNNEL_NOTE}"
                ),
                "value": round(solves_per_s, 1),
                "unit": "solves/s",
                "vs_baseline": round(solves_per_s / 1000.0, 3),
                "timing": "median_of_5_windows_after_warmup",
                "windows": [round(w, 1) for w in windows],
            }
        )
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
