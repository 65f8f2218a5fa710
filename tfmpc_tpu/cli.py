"""Command-line interface: ``tfmpc-tpu lqr`` and ``tfmpc-tpu ilqr``.

Capability parity with reference ``tfmpc/cli.py`` (SURVEY §2.1 CLI row:
click group with ``lqr`` (random problem generation + solve) and ``ilqr``
(JSON env config -> solve) subcommands; options for horizon, atol,
max-iterations, logdir, num-samples, verbosity; trajectory outputs to the
logdir).

TPU-native reinterpretation of ``--num-samples``/``--num-workers``: the
reference fanned samples out over worker *processes*; here samples become a
scenario *batch* solved in one compiled on-device program, sharded over
however many chips are visible (``--num-workers`` caps the device count).
"""

from __future__ import annotations

import json
import logging
import os
import sys

import click
import numpy as np

logger = logging.getLogger("tfmpc_tpu")


def _setup_logging(verbose: int) -> None:
    level = logging.WARNING
    if verbose == 1:
        level = logging.INFO
    elif verbose >= 2:
        level = logging.DEBUG
    logging.basicConfig(
        level=level, format="%(asctime)s %(name)s %(levelname)s %(message)s"
    )
    # basicConfig is a no-op when the embedding application (or a test
    # runner) already installed handlers — set the package logger's level
    # explicitly so -v / -vv work regardless of ambient logging config.
    logger.setLevel(level)


@click.group()
@click.option("-v", "--verbose", count=True, help="-v info, -vv debug.")
@click.option("--debug-nans", is_flag=True, default=False,
              help="Enable jax_debug_nans: fail loudly at the op that first "
                   "produces a NaN (the numeric analogue of a sanitizer — "
                   "SURVEY §5; noticeably slower, debugging only).")
def cli(verbose: int, debug_nans: bool) -> None:
    """tfmpc-tpu: TPU-native LQR / iLQR trajectory optimization."""
    _setup_logging(verbose)
    if debug_nans:
        import jax

        jax.config.update("jax_debug_nans", True)


def _log_trace(trace, upto: int) -> None:
    """Replay on-device per-iteration stats as reference-style log lines."""
    import numpy as np

    J = np.asarray(trace.J)[:, 0]
    residual = np.asarray(trace.residual)[:, 0]
    mu = np.asarray(trace.mu)[:, 0]
    alpha = np.asarray(trace.alpha)[:, 0]
    accepted = np.asarray(trace.accepted)[:, 0]
    for i in range(min(upto, J.shape[0])):
        logger.info(
            "iteration=%d cost=%.6f residual=%.3e mu=%.3e alpha=%s",
            i, J[i], residual[i],
            mu[i], f"{alpha[i]:.4f}" if accepted[i] else "rejected",
        )


def _log_batched_trace(trace, result) -> None:
    """Replay a sharded/batched [I, B] trace as per-iteration mean lines."""
    J = np.asarray(trace.J)
    conv = np.asarray(trace.converged)
    mu_tr = np.asarray(trace.mu)
    upto = int(np.max(np.asarray(result.iterations)))
    for i in range(min(upto, J.shape[0])):
        logger.info(
            "iteration=%d mean_cost=%.6f frac_converged=%.3f mean_mu=%.3e",
            i, J[i].mean(), conv[i].mean(), mu_tr[i].mean(),
        )


def build_ilqr_config(**kwargs):
    """Construct the solver config the CLI commands run with.

    Factored out (and pinned by tests/test_cli.py) so the product entry
    point provably enables the fused Pallas kernel path by default —
    ``use_pallas`` defaults to True here; eligibility checks inside
    ``ilqr_batched`` fall back to the XLA path for unsupported shapes.
    """
    from tfmpc_tpu.solvers import ilqr as ilqr_solver

    kwargs.setdefault("use_pallas", True)
    return ilqr_solver.ILQRConfig(**kwargs)


def _save_trajectories(result, logdir, num_samples):
    from tfmpc_tpu.utils.trajectory import Trajectory

    paths = []
    if logdir:
        for i in range(num_samples):
            tr = Trajectory.from_result(result, index=i if num_samples > 1 else None)
            paths.append(tr.save(os.path.join(logdir, f"trajectory_{i}.csv")))
    return paths


@cli.command()
@click.option("--state-size", "-n", default=3, show_default=True)
@click.option("--action-size", "-m", default=2, show_default=True)
@click.option("--horizon", "-T", default=100, show_default=True)
@click.option("--seed", default=0, show_default=True)
@click.option("--x0-scale", default=1.0, show_default=True, help="Std of the random initial state.")
@click.option("--parallel/--sequential", default=False, show_default=True,
              help="Use the O(log T) associative-scan Riccati backward pass.")
@click.option("--num-samples", default=1, show_default=True,
              help="Batch of random initial states rolled under the one "
                   "optimal policy (LQR gains are state-independent).")
@click.option("--time-workers", default=1, show_default=True, type=int,
              help="Shard the horizon over this many devices (implies "
                   "--parallel).")
@click.option("--logdir", type=click.Path(), default=None, help="Write trajectory CSVs here.")
def lqr(state_size, action_size, horizon, seed, x0_scale, parallel,
        num_samples, time_workers, logdir):
    """Generate a random LQR problem and solve it exactly.

    Reference analogue: ``tfmpc lqr`` (SURVEY §3.2).
    """
    import jax
    import jax.numpy as jnp

    from tfmpc_tpu.models.problems import make_lqr
    from tfmpc_tpu.solvers import lqr as lqr_solver
    from tfmpc_tpu.utils.trajectory import Trajectory

    key = jax.random.PRNGKey(seed)
    kp, kx = jax.random.split(key)
    problem = make_lqr(kp, state_size, action_size, horizon)

    logger.info(
        "solving LQR n=%d m=%d T=%d on %s", state_size, action_size, horizon,
        jax.devices()[0].platform,
    )
    n_avail = len(jax.devices())
    if time_workers < 1 or time_workers > n_avail:
        raise click.UsageError(
            f"--time-workers {time_workers} must be in [1, {n_avail}] "
            f"(visible devices)"
        )
    if time_workers > 1:
        # Horizon-sharded Riccati: pin the problem's [T] tensors to a
        # "time" mesh (requires the associative-scan backward).
        from tfmpc_tpu.parallel import mesh as pmesh
        parallel = True
        problem = pmesh.shard_problem_time(
            problem, pmesh.make_mesh_2d(1, time_workers)
        )
    if num_samples > 1:
        x0 = x0_scale * jax.random.normal(kx, (num_samples, state_size))
        states, actions, costs = lqr_solver.solve(problem, x0, parallel=parallel)
        total = costs.sum(axis=1)
        click.echo(
            f"solved {num_samples} initial states: "
            f"mean_cost={float(total.mean()):.6f} max_cost={float(total.max()):.6f}"
        )
        for p in _save_trajectories((states, actions, costs), logdir, num_samples):
            logger.info("trajectory saved to %s", p)
        if logdir:
            click.echo(f"{num_samples} trajectories saved to {logdir}")
        return

    x0 = x0_scale * jax.random.normal(kx, (state_size,))
    states, actions, costs = lqr_solver.solve(problem, x0, parallel=parallel)
    tr = Trajectory(states, actions, costs)
    click.echo(repr(tr))
    for p in _save_trajectories((states, actions, costs), logdir, 1):
        click.echo(f"trajectory saved to {p}")


@cli.command()
@click.option("--env", "env_path", type=click.Path(exists=True), required=True,
              help="JSON env config file.")
@click.option("--horizon", "-T", default=100, show_default=True)
@click.option("--atol", default=1e-4, show_default=True, help="Convergence tolerance on the cost decrease.")
@click.option("--max-iterations", default=100, show_default=True)
@click.option("--x0", "x0_json", default=None,
              help="Initial state as a JSON list; overrides the config's x0; "
                   "random if neither is given.")
@click.option("--num-samples", default=1, show_default=True,
              help="Scenario batch size (solved in one on-device program).")
@click.option("--num-workers", default=None, type=int,
              help="Cap the number of devices the batch is sharded over.")
@click.option("--seed", default=0, show_default=True)
@click.option("--logdir", type=click.Path(), default=None, help="Write trajectory CSVs here.")
@click.option("--boxqp/--no-boxqp", "boxqp_flag", default=None,
              help="Control-limited DDP backward pass (projected-Newton "
                   "boxQP). Default: on for box-constrained envs. "
                   "--no-boxqp gives the reference's clipping-only behavior.")
@click.option("--pallas/--no-pallas", "pallas_flag", default=True,
              show_default=True,
              help="Route eligible solves through the fused Pallas kernels "
                   "(batched Riccati backward + line-search rollouts). "
                   "Ineligible SHAPES fall back to the XLA path "
                   "automatically; a user-defined env whose dynamics use "
                   "ops the TPU kernel compiler cannot lower (gather, "
                   "cond, ...) triggers a warned one-time retry on the "
                   "XLA path — pass --no-pallas to skip the doomed "
                   "compile attempt.")
@click.option("--parallel-backward", is_flag=True, default=False,
              help="O(log T) associative-scan backward pass (long horizons).")
@click.option("--ddp", "ddp_flag", is_flag=True, default=False,
              help="Full DDP backward: keep the second-order dynamics "
                   "tensors the reference's iLQR drops (quadratic local "
                   "convergence; one extra Hessian sweep per iteration; "
                   "routes the backward off the fused Riccati kernels and "
                   "excludes --parallel-backward).")
@click.option("--time-workers", default=1, show_default=True, type=int,
              help="Shard the HORIZON over this many devices (sequence "
                   "parallelism; implies --parallel-backward and disables "
                   "the fused kernels — raw Pallas calls cannot take "
                   "mesh-sharded operands). Composes with the scenario "
                   "batch: the remaining devices form the data axis of a "
                   "2-D (data, time) mesh.")
def ilqr(env_path, horizon, atol, max_iterations, x0_json, num_samples,
         num_workers, seed, logdir, boxqp_flag, pallas_flag,
         parallel_backward, ddp_flag, time_workers):
    """Solve a differentiable env from a JSON config with iLQR.

    Reference analogue: ``tfmpc ilqr`` (SURVEY §3.1).
    """
    import jax
    import jax.numpy as jnp

    from tfmpc_tpu.models.registry import load_env
    from tfmpc_tpu.parallel import mesh as pmesh
    from tfmpc_tpu.solvers import ilqr as ilqr_solver
    from tfmpc_tpu.utils.trajectory import Trajectory

    with open(env_path) as f:
        config_json = json.load(f)
    env = load_env(env_path)
    n = env.state_size

    if x0_json is not None:
        try:
            x0_single = np.asarray(json.loads(x0_json), dtype=np.float32)
        except (json.JSONDecodeError, ValueError) as e:
            raise click.UsageError(
                f"--x0 must be a JSON list of {n} numbers, e.g. '[0.0, 0.0]'; "
                f"got {x0_json!r} ({e})"
            )
    elif "x0" in config_json:
        x0_single = np.asarray(config_json["x0"], dtype=np.float32)
    else:
        x0_single = np.random.default_rng(seed).normal(size=n).astype(np.float32)
        logger.info("no x0 given; sampled %s", x0_single)
    if x0_single.shape != (n,):
        raise click.UsageError(
            f"x0 has shape {x0_single.shape} but env '{config_json['name']}' "
            f"has state size {n}"
        )

    if boxqp_flag is None:
        boxqp_flag = env.bounds is not None
    if ddp_flag and (parallel_backward or time_workers > 1):
        raise click.UsageError(
            "--ddp is incompatible with --parallel-backward/--time-workers "
            "(the associative-scan backward composes linear value-recursion "
            "elements; see ILQRConfig.ddp)"
        )
    config = build_ilqr_config(
        atol=atol, max_iterations=max_iterations,
        boxqp=boxqp_flag, use_pallas=pallas_flag,
        parallel_backward=parallel_backward, ddp=ddp_flag,
    )
    trace_iters = logger.isEnabledFor(logging.INFO)

    n_avail = len(jax.devices())
    if time_workers < 1 or time_workers > n_avail:
        raise click.UsageError(
            f"--time-workers {time_workers} must be in [1, {n_avail}] "
            f"(visible devices)"
        )

    if num_samples == 1 and time_workers > 1:
        # Sequence-parallel single solve: horizon sharded over devices.
        mesh_t = pmesh.make_mesh_2d(1, time_workers)
        if trace_iters:
            batch, trace = pmesh.solve_ilqr_time_sharded(
                env, jnp.asarray(x0_single)[None], horizon=horizon,
                config=config, mesh=mesh_t, return_trace=True,
            )
            _log_trace(trace, upto=int(batch.iterations[0]))
            result = jax.tree_util.tree_map(lambda a: a[0], batch)
        else:
            result = pmesh.solve_ilqr_time_sharded(
                env, jnp.asarray(x0_single), horizon=horizon,
                config=config, mesh=mesh_t,
            )
        click.echo(repr(Trajectory.from_result(result)))
        click.echo(
            f"converged={bool(result.converged)} iterations={int(result.iterations)} "
            f"total_cost={float(result.total_cost):.6f} "
            f"residual={float(result.residual):.3e} "
            f"(horizon sharded over {time_workers} device(s))"
        )
        for p in _save_trajectories(result, logdir, 1):
            click.echo(f"trajectory saved to {p}")
        sys.exit(0 if bool(result.converged) else 3)

    if num_samples == 1:
        if trace_iters:
            # Per-iteration log lines (reference --verbose surface, SURVEY §5
            # metrics row): run the trace-recording solve and replay on host.
            batch, trace = ilqr_solver.solve_batch(
                env, jnp.asarray(x0_single)[None], horizon=horizon,
                config=config, return_trace=True,
            )
            _log_trace(trace, upto=int(batch.iterations[0]))
            result = jax.tree_util.tree_map(lambda a: a[0], batch)
        else:
            result = ilqr_solver.solve(
                env, jnp.asarray(x0_single), horizon=horizon, config=config
            )
        click.echo(repr(Trajectory.from_result(result)))
        click.echo(
            f"converged={bool(result.converged)} iterations={int(result.iterations)} "
            f"total_cost={float(result.total_cost):.6f} "
            f"residual={float(result.residual):.3e}"
        )
        for p in _save_trajectories(result, logdir, 1):
            click.echo(f"trajectory saved to {p}")
        sys.exit(0 if bool(result.converged) else 3)

    # Batched: perturb x0 into a scenario batch and shard over devices.
    rng = np.random.default_rng(seed)
    x0_batch = x0_single[None, :] + rng.normal(
        size=(num_samples, n)
    ).astype(np.float32)
    if time_workers > 1:
        # Combined data x time: remaining devices form the data axis.
        n_data = num_workers or max(1, n_avail // time_workers)
        if n_data * time_workers > n_avail:
            raise click.UsageError(
                f"--num-workers {n_data} x --time-workers {time_workers} "
                f"exceeds the {n_avail} visible devices"
            )
        mesh = pmesh.make_mesh_2d(n_data, time_workers)
        n_dev = n_data
    else:
        mesh = pmesh.make_mesh(num_workers)
        n_dev = mesh.devices.size
    if num_samples % n_dev != 0:
        raise click.UsageError(
            f"--num-samples {num_samples} must be divisible by the device "
            f"count {n_dev} (pass --num-workers to change it)"
        )
    if time_workers > 1:
        x0_s = pmesh.shard_batch(jnp.asarray(x0_batch), mesh)
        out = pmesh.solve_ilqr_time_sharded(
            env, x0_s, horizon=horizon, config=config, mesh=mesh,
            return_trace=trace_iters,
        )
        result, trace = out if trace_iters else (out, None)
        if trace_iters:
            _log_batched_trace(trace, result)
    elif trace_iters:
        result, trace = pmesh.solve_ilqr_sharded(
            env, jnp.asarray(x0_batch), horizon=horizon, config=config,
            mesh=mesh, return_trace=True,
        )
        _log_batched_trace(trace, result)
    else:
        result = pmesh.solve_ilqr_sharded(
            env, jnp.asarray(x0_batch), horizon=horizon, config=config,
            mesh=mesh,
        )
    stats = jax.device_get(pmesh.summarize(result))
    dev_str = (
        f"{n_dev} device(s)" if time_workers == 1
        else f"{n_dev}x{time_workers} (data x time) devices"
    )
    click.echo(
        f"solved {num_samples} scenarios on {dev_str}: "
        f"{int(stats['num_converged'])}/{num_samples} converged, "
        f"mean_cost={float(stats['mean_cost']):.6f} "
        f"mean_iterations={float(stats['mean_iterations']):.1f}"
    )
    for p in _save_trajectories(result, logdir, num_samples):
        logger.info("trajectory saved to %s", p)
    if logdir:
        click.echo(f"{num_samples} trajectories saved to {logdir}")


@cli.command()
@click.option("--env", "env_path", type=click.Path(exists=True), required=True,
              help="JSON env config file.")
@click.option("--steps", default=50, show_default=True,
              help="Closed-loop control steps (re-plans).")
@click.option("--plan-horizon", default=20, show_default=True,
              help="Horizon of each warm-started re-plan.")
@click.option("--atol", default=1e-4, show_default=True)
@click.option("--max-iterations", default=15, show_default=True,
              help="Per-replan solver budget (warm starts keep this small).")
@click.option("--x0", "x0_json", default=None,
              help="Initial state as a JSON list; overrides the config's x0.")
@click.option("--boxqp/--no-boxqp", "boxqp_flag", default=None,
              help="Control-limited DDP (default: on for bounded envs).")
@click.option("--pallas/--no-pallas", "pallas_flag", default=True,
              show_default=True,
              help="Fused Pallas kernels where eligible (shape fallback "
                   "is automatic; --no-pallas for envs that don't lower).")
@click.option("--num-samples", default=1, show_default=True,
              help="Closed-loop scenario fleet: x0 is perturbed into this "
                   "many rollouts, run in one sharded on-device program.")
@click.option("--seed", default=0, show_default=True)
@click.option("--logdir", type=click.Path(), default=None,
              help="Write the realized closed-loop trajectory CSV here.")
def mpc(env_path, steps, plan_horizon, atol, max_iterations, x0_json,
        boxqp_flag, pallas_flag, num_samples, seed, logdir):
    """Closed-loop receding-horizon MPC from a JSON env config.

    Re-solves a ``--plan-horizon`` iLQR instance each step (warm-started),
    executes the first action, and advances the true dynamics — one
    compiled on-device program (solvers/mpc.py). The reference only solves
    open-loop instances; this is the deployment loop around them.
    """
    import jax.numpy as jnp

    from tfmpc_tpu.models.registry import load_env
    from tfmpc_tpu.solvers import ilqr as ilqr_solver
    from tfmpc_tpu.solvers import mpc as mpc_solver
    from tfmpc_tpu.utils.trajectory import Trajectory

    with open(env_path) as f:
        config_json = json.load(f)
    env = load_env(env_path)
    n = env.state_size

    if x0_json is not None:
        x0 = np.asarray(json.loads(x0_json), dtype=np.float32)
    elif "x0" in config_json:
        x0 = np.asarray(config_json["x0"], dtype=np.float32)
    else:
        raise click.UsageError("provide --x0 or an x0 in the env config")
    if x0.shape != (n,):
        raise click.UsageError(f"x0 must have shape ({n},), got {x0.shape}")

    if boxqp_flag is None:
        boxqp_flag = env.bounds is not None
    config = build_ilqr_config(
        atol=atol, max_iterations=max_iterations, boxqp=boxqp_flag,
        use_pallas=pallas_flag,
    )
    if num_samples > 1:
        # Scenario fleet: perturbed x0 batch, data-sharded closed loop via
        # shard_map (mesh.mpc_sharded — the kernel-compatible sharded path).
        from tfmpc_tpu.parallel import mesh as pmesh

        rng = np.random.default_rng(seed)
        x0_batch = x0[None, :] + rng.normal(
            size=(num_samples, n)
        ).astype(np.float32)
        mesh = pmesh.make_mesh()
        n_dev = mesh.devices.size
        if num_samples % n_dev == 0:
            res = pmesh.mpc_sharded(
                env, jnp.asarray(x0_batch), steps=steps,
                plan_horizon=plan_horizon, config=config, mesh=mesh,
            )
        else:  # indivisible fleets run on one device rather than erroring
            n_dev = 1
            res = mpc_solver.run(
                env, jnp.asarray(x0_batch), steps=steps,
                plan_horizon=plan_horizon, config=config,
            )
        conv = np.asarray(res.converged)
        click.echo(
            f"closed-loop fleet of {num_samples} on {n_dev} device(s): "
            f"mean_total_cost={float(np.asarray(res.total_cost).mean()):.6f} "
            f"replans_converged={int(conv.sum())}/{conv.size} "
            f"mean_replan_iterations={float(np.asarray(res.iterations).mean()):.1f}"
        )
        if logdir:
            for i in range(num_samples):
                costs_i = np.concatenate([
                    np.asarray(res.costs[i]), [float(res.final_cost[i])],
                ])
                tr = Trajectory(
                    np.asarray(res.states[i]), np.asarray(res.actions[i]),
                    costs_i,
                )
                tr.save(os.path.join(logdir, f"mpc_trajectory_{i:04d}.csv"))
            click.echo(f"{num_samples} trajectories saved to {logdir}")
        return

    res = mpc_solver.run(
        env, jnp.asarray(x0), steps=steps, plan_horizon=plan_horizon,
        config=config,
    )
    costs = np.concatenate([
        np.asarray(res.costs), [float(res.final_cost)],
    ])
    tr = Trajectory(np.asarray(res.states), np.asarray(res.actions), costs)
    click.echo(repr(tr))
    click.echo(
        f"closed-loop total_cost={float(res.total_cost):.6f} "
        f"replans_converged={int(np.asarray(res.converged).sum())}/{steps} "
        f"mean_replan_iterations={float(np.asarray(res.iterations).mean()):.1f}"
    )
    if logdir:
        path = tr.save(os.path.join(logdir, "mpc_trajectory.csv"))
        click.echo(f"trajectory saved to {path}")


def main() -> None:
    cli()


if __name__ == "__main__":
    main()
