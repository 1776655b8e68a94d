"""Test config: run everything on a virtual 8-device CPU mesh.

Must set flags before jax initializes (SURVEY.md §4: multi-chip tests runnable
without TPU hardware via the host-platform device-count override).
"""

import os

# NOTE: this environment force-sets JAX_PLATFORMS=axon (remote TPU tunnel) via
# a sitecustomize hook, so plain env vars are not enough — jax.config.update
# below is what actually pins tests to the local CPU backend.
os.environ["JAX_PLATFORMS"] = "cpu"
# Persistent compile cache: repeated test runs skip recompilation.
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "0")
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)
