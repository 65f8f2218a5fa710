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


def amortized_ms(make, reps: int = 30):
    """(ms per call of ``make(eps)``, compile seconds), scan-amortized.

    ``make`` must take a float32 scalar perturbation and return an array
    (or scalar) whose sum is cheap; the perturbation must feed the
    workload's inputs so iterations stay live.
    """

    @jax.jit
    def f(eps):
        def body(carry, _):
            return carry + 1e-6, jnp.sum(make(carry))

        _, outs = jax.lax.scan(body, eps, None, length=reps)
        return jnp.sum(outs)

    t0 = time.perf_counter()
    # host fetch = sync (block_until_ready is unreliable on axon)
    float(f(jnp.float32(0.0)))
    compile_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    float(f(jnp.float32(1e-7)))
    return (time.perf_counter() - t0) / reps * 1e3, compile_s
