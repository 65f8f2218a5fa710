"""Test configuration: force a virtual 8-device CPU mesh.

Tests never touch the real TPU: they run on CPU with
``--xla_force_host_platform_device_count=8`` so distributed/sharding tests
exercise real multi-device code paths (SURVEY §4: the reference has no
multi-device tests; this is the TPU-build addition).

Must run before the first ``import jax`` anywhere in the test session.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# The hosting environment's sitecustomize may force jax_platforms to the real
# TPU backend at interpreter boot; tests must run on the virtual CPU mesh, so
# re-force CPU *after* jax import (env vars alone are overridden).
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)  # float64 oracles on CPU

# Persistent compilation cache: the suite jit-compiles many (shape, config)
# variants; caching across runs cuts wall-clock severalfold.
# TFMPC_TEST_CACHE_DIR overrides the location so a pytest run can proceed
# while an on-chip sweep holds the shared cache (CLAUDE.md: one jax process
# per cache).
jax.config.update(
    "jax_compilation_cache_dir",
    os.environ.get(
        "TFMPC_TEST_CACHE_DIR", "/root/.cache/tfmpc_tpu_jax_cache"
    ),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(42)
