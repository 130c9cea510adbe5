"""Test harness: force an 8-device virtual CPU mesh so sharding/collective
code paths are exercised without TPU hardware (SURVEY §4)."""
import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# The axon TPU plugin (sitecustomize) force-sets jax_platforms="axon,cpu"
# at interpreter start; override it after import so tests run on the
# 8-device virtual CPU mesh regardless.
jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)


@pytest.fixture(autouse=True, scope="module")
def _clear_jax_caches_between_modules():
    """Free compiled executables between test modules: the XLA:CPU compiler
    has been observed to segfault (deterministically, deep into the suite)
    once hundreds of executables from every module accumulate in one
    process; per-module cache clearing keeps the live-executable count
    bounded at a small recompile cost."""
    yield
    jax.clear_caches()
