"""Environment registry and JSON-config construction.

Capability parity with reference ``tfmpc/envs/__init__.py`` (SURVEY §2.1:
maps env name -> class and constructs envs from the JSON configs consumed by
the CLI ``--env`` flag; schema kept compatible so reference config files run
unmodified — SURVEY §5 config row).
"""

from __future__ import annotations

import json
from typing import Any, Callable, Dict

import jax.numpy as jnp

from tfmpc_tpu.models.base import Env
from tfmpc_tpu.models.hvac import make_hvac
from tfmpc_tpu.models.navigation import make_navigation
from tfmpc_tpu.models.reservoir import make_reservoir

_REGISTRY: Dict[str, Callable[..., Env]] = {}


def register(name: str):
    def deco(fn):
        _REGISTRY[name] = fn
        return fn

    return deco


def registered() -> Dict[str, Callable[..., Env]]:
    return dict(_REGISTRY)


@register("navigation")
def _make_navigation_cfg(config: Dict[str, Any], dtype=jnp.float32) -> Env:
    return make_navigation(
        goal=config["goal"],
        deceleration=config.get("deceleration"),
        low=config.get("low"),
        high=config.get("high"),
        dtype=dtype,
    )


# Keys consumed by the CLI/solver rather than the env constructors
# (the reference config files carry the initial state alongside env params).
_NON_ENV_KEYS = ("name", "x0")


@register("hvac")
def _make_hvac_cfg(config: Dict[str, Any], dtype=jnp.float32) -> Env:
    kwargs = {
        k: v for k, v in config.items() if k not in _NON_ENV_KEYS + ("adj",)
    }
    return make_hvac(config["adj"], dtype=dtype, **kwargs)


@register("reservoir")
def _make_reservoir_cfg(config: Dict[str, Any], dtype=jnp.float32) -> Env:
    kwargs = {k: v for k, v in config.items() if k not in _NON_ENV_KEYS}
    return make_reservoir(dtype=dtype, **kwargs)


@register("linear")
def _make_linear_cfg(config: Dict[str, Any], dtype=jnp.float32) -> Env:
    from tfmpc_tpu.models.linear import make_linear_system

    kwargs = {
        k: v for k, v in config.items() if k not in _NON_ENV_KEYS + ("A", "B")
    }
    return make_linear_system(config["A"], config["B"], dtype=dtype, **kwargs)


def make_env(config: Dict[str, Any], dtype=jnp.float32) -> Env:
    """Construct an env from a config dict: ``{"name": ..., <env kwargs>}``.

    Reference analogue: ``tfmpc/envs/__init__.py::make_env`` consuming the
    CLI's JSON env-config files.
    """
    if "name" not in config:
        raise ValueError(
            f"env config must contain a 'name' key; got keys {sorted(config)}"
        )
    name = config["name"]
    if name not in _REGISTRY:
        raise ValueError(
            f"unknown env '{name}'; registered: {sorted(_REGISTRY)}"
        )
    return _REGISTRY[name](config, dtype=dtype)


def load_env(path: str, dtype=jnp.float32) -> Env:
    """Load an env from a JSON config file (CLI ``--env`` path)."""
    with open(path) as f:
        config = json.load(f)
    return make_env(config, dtype=dtype)
