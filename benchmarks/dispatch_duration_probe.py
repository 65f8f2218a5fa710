"""Find the axon tunnel's per-dispatch execution-duration limit.

Round-5 bisect (`ddp_crash_bisect2.py`): the hvac3 DDP "TPU worker
crashed" reproduction needs NO Pallas and NO specific math — a pure-XLA
amortized scan whose single dispatch runs ~75 s crashed the worker while
a ~30 s dispatch survived. This calibrates a chained-matmul scan to a
target wall time per dispatch and walks the duration up until the worker
dies, so the limit (if any) is a measured number the benchmarks can stay
under, instead of a mystery crash.
"""

import _bootstrap  # noqa: F401

import json
import time

import jax
import jax.numpy as jnp


def main():
    x = jnp.ones((2048, 2048), jnp.float32) * 1e-3

    def chain(n_iters):
        def body(c, _):
            c = c @ x
            c = c / (jnp.max(jnp.abs(c)) + 1e-9)
            return c, ()
        def f(c0):
            c, _ = jax.lax.scan(body, c0, None, length=n_iters)
            return jnp.sum(c)
        return jax.jit(f, static_argnums=())

    # calibrate: iterations per second
    f = chain(200)
    float(f(x))  # compile
    t0 = time.perf_counter()
    float(f(x))
    per200 = time.perf_counter() - t0
    ips = 200 / per200
    print(json.dumps({"calibration_s_per_200": round(per200, 3),
                      "iters_per_s": round(ips, 1)}), flush=True)

    for target_s in (10, 30, 60, 90, 120, 180):
        n = max(1, int(ips * target_s))
        g = chain(n)
        print(json.dumps({"target_s": target_s, "iters": n,
                          "status": "compiling+running..."}), flush=True)
        t0 = time.perf_counter()
        out = float(g(x))
        dt = time.perf_counter() - t0
        print(json.dumps({"target_s": target_s, "actual_s": round(dt, 1),
                          "status": "ok", "out_finite": out == out}),
              flush=True)


if __name__ == "__main__":
    main()
