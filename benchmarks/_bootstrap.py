"""Make `tfmpc_tpu` importable when a benchmark runs as a plain script.

`python benchmarks/<tool>.py` puts benchmarks/ (not the repo root) on
sys.path, so the documented invocations only worked with PYTHONPATH set.
Each tool imports this module first; it is a no-op when the package is
already importable (e.g. installed, or PYTHONPATH set per the verify
recipe — the axon site must stay FIRST there, which appending the root
here preserves).
"""

import os
import sys

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _ROOT not in sys.path:
    sys.path.append(_ROOT)

# Persistent XLA compile cache, shared with the pytest suite's. The mid-dim
# vmapped-scan compiles take 4-9 MINUTES each through the axon tunnel
# (CLAUDE.md); with the cache a re-run of any sweep tool skips them. The
# cache key includes the HLO and backend, so CPU/TPU entries coexist and a
# hit cannot change results — only `compile_s` readings, which report the
# cached (fast) path on re-runs. Harmless if the backend does not support
# executable serialization (jax falls back to compiling).
import jax  # noqa: E402

jax.config.update("jax_compilation_cache_dir", "/root/.cache/tfmpc_tpu_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

# The eager solve entry points degrade to the XLA path when a kernel fails
# to compile (ilqr_batched.with_kernel_fallback) — right for users, wrong
# for benchmarks: a silently-degraded run would report XLA numbers as
# kernel numbers. Every bench tool fails loud instead.
import warnings  # noqa: E402

warnings.filterwarnings("error", message="fused Pallas kernel path failed")
