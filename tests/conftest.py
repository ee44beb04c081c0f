"""Test config: force an 8-virtual-device CPU platform before jax backends init.

Tests never touch the real TPU chip; multi-device sharding tests run on the
virtual CPU mesh (something the CUDA reference could never do, SURVEY.md §4).

Note: the ambient environment may pre-import jax with a remote TPU platform
(JAX_PLATFORMS=axon via sitecustomize), so the env var alone is NOT enough —
we must override the live jax config before any backend initializes.
"""
import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ.setdefault("JAX_ENABLE_X64", "0")
# Persistent compilation cache: amortizes XLA CPU compiles across test runs
# (compiles dominate test wall time in this environment).
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_test_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0.2")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "0")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.RandomState(0)
