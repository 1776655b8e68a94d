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
# The sitecustomize hook imports jax at INTERPRETER startup — before this
# file runs — so the JAX_* cache env vars above were read too late and the
# persistent compile cache was silently disabled for every past suite run
# (round-4 finding: "Not writing persistent cache entry ... cache is
# disabled/not initialized" in the debug log; heavy tests recompiled 13 s
# graphs every run).  config.update is what actually takes effect here,
# exactly like the platform pin above.
jax.config.update("jax_compilation_cache_dir",
                  os.environ["JAX_COMPILATION_CACHE_DIR"])
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)


@pytest.fixture(scope="session")
def dp8_ssd():
    """Session-shared 8-device DP setup: ONE shard_map compile reused by
    every test that needs a full SSD DP step (suite wall-clock, round-2
    verdict item 3). All parts are immutable/pure — safe to share."""
    import dataclasses

    import jax.numpy as jnp

    from test_train import small_ssd_cfg
    from x_detector_tpu.parallel import mesh as mesh_lib
    from x_detector_tpu.parallel.data_parallel import make_dp_train_step
    from x_detector_tpu.train.trainer import create_model_and_state

    cfg = small_ssd_cfg()
    cfg = dataclasses.replace(
        cfg, train=dataclasses.replace(cfg.train, batch_size=8))
    model, _ = create_model_and_state(cfg, jax.random.PRNGKey(0),
                                      dtype=jnp.float32)
    mesh = mesh_lib.make_mesh(8)
    step = make_dp_train_step(model, cfg, mesh)

    def fresh_state():
        # the DP step donates its state arg, and on CPU replicate_state
        # aliases the input buffers — every test gets a fresh state so one
        # test's donation cannot delete another's arrays
        return create_model_and_state(cfg, jax.random.PRNGKey(0),
                                      dtype=jnp.float32)[1]

    return cfg, model, fresh_state, mesh, step
