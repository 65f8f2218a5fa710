"""Shared scan-amortized timing estimator for the benchmark tools.

THE measurement technique this project's numbers depend on (CLAUDE.md):
the axon tunnel adds 30-70 ms per host dispatch, time-varying by the hour,
so anything timed one dispatch per rep measures the tunnel, not the chip.
Every tool therefore loops the workload inside ONE jitted ``lax.scan`` with
a perturbed carry (so XLA cannot CSE the iterations away) and divides by
the rep count. This module is the single home of that estimator —
previously four near-identical copies lived across profile_stages,
release_check, mxu_probe and middim_bench, so estimator fixes (e.g.
warmup/median treatment) silently diverged between tools.
"""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp


def amortized_ms(make, reps: int = 30, operands=()):
    """(ms per call of ``make(eps, *operands)``, compile s), scan-amortized.

    ``make`` must take a float32 scalar perturbation (plus ``operands``,
    if given) and return an array (or scalar) whose sum is cheap; the
    perturbation must feed the workload's inputs so iterations stay live.

    Pass every LARGE array the workload reads via ``operands`` — NOT via
    closure. A closed-over concrete array is embedded in the lowered
    program as an HLO constant, and on the axon backend the whole program
    is POSTed to the remote-compile relay: mid-dim linearizations
    (~0.1-1 GB of B*T*d^2 blocks) exceed the relay's request-body limit
    and fail with "HTTP 413: length limit exceeded" (observed 2026-08-18,
    after a relay redeploy tightened the limit — round-2 shapes that
    compiled before now 413). Explicit jit arguments stay on device; only
    their shapes enter the request.
    """

    @jax.jit
    def f(eps, ops):
        def body(carry, _):
            return carry + 1e-6, jnp.sum(make(carry, *ops))

        _, outs = jax.lax.scan(body, eps, None, length=reps)
        return jnp.sum(outs)

    ops = tuple(operands)
    t0 = time.perf_counter()
    # host fetch = sync (block_until_ready is unreliable on axon)
    float(f(jnp.float32(0.0), ops))
    compile_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    float(f(jnp.float32(1e-7), ops))
    return (time.perf_counter() - t0) / reps * 1e3, compile_s
