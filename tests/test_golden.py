"""Golden-activation regression tests (SURVEY.md §4 rebuild strategy:
"forward-parity tests against stored golden activations for a fixed-seed
tiny model").

First run generates ``tests/golden/*.npz`` (committed to the repo); later
runs compare against it, so numerical regressions from refactors (kernel
swaps, dtype policy changes, fusion rewrites) are caught immediately.
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from test_lighthead import tiny_config
from x_detector_tpu.models.lighthead import LightHeadRCNN

GOLDEN_DIR = os.path.join(os.path.dirname(__file__), "golden")
ATOL = 2e-4


def _compute_lighthead_outputs():
    cfg = tiny_config("xception_lite")
    model = LightHeadRCNN(config=cfg, dtype=jnp.float32)
    x = jax.random.normal(jax.random.PRNGKey(42), (1, 64, 64, 3)) * 0.3
    # jitted (cached) rather than eager; the stored goldens were generated
    # eagerly, but ATOL/RTOL absorb jit-vs-eager fp differences (verified:
    # comparison passes against the committed npz).
    variables = jax.jit(lambda k: model.init(k, x, train=False))(
        jax.random.PRNGKey(7))
    out = jax.jit(lambda v: model.apply(v, x, train=False))(variables)
    return {k: np.asarray(v) for k, v in out.items()}


def test_lighthead_forward_golden():
    path = os.path.join(GOLDEN_DIR, "lighthead_tiny_forward.npz")
    got = _compute_lighthead_outputs()
    if not os.path.exists(path):
        os.makedirs(GOLDEN_DIR, exist_ok=True)
        np.savez_compressed(path, **got)
        pytest.skip(f"generated golden file {path}; rerun to compare")
    ref = np.load(path)
    for key in ref.files:
        assert key in got, f"output {key} disappeared"
        np.testing.assert_allclose(
            got[key], ref[key], atol=ATOL, rtol=1e-3,
            err_msg=f"golden mismatch in {key} — if this change is "
                    f"intentional, delete {path} and regenerate")
