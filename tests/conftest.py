"""Test config: run everything on a virtual 8-device CPU mesh.

Pytest plugins (jaxtyping) import jax before this conftest runs, which locks
the JAX_PLATFORMS *default* read from the ambient env (the TPU tunnel).
jax.config.update still works because no backend is initialized yet — without
it every eager op would round-trip through the TPU tunnel (~0.8 s/op).
"""
import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)

assert jax.devices()[0].platform == "cpu", "tests must run on the CPU backend"
assert jax.device_count() == 8, "tests expect 8 virtual CPU devices"

import pytest  # noqa: E402


def pytest_collection_modifyitems(config, items):
    """Two test tiers: `-m core` (< 5 min, the default development loop) and
    `-m heavy` (multi-process fleets, 8-device shard_map batches, long
    convergence runs — ~30 min). Every test not explicitly marked heavy is
    auto-marked core, so the tiers partition the suite."""
    for item in items:
        if "heavy" not in item.keywords:
            item.add_marker(pytest.mark.core)
