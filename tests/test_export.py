"""jax.export serving artifact: serialize -> reload -> functional parity."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from test_lighthead import tiny_config
from x_detector_tpu.models.lighthead import (LightHeadRCNN,
                                             lighthead_postprocess)


@pytest.mark.slow
def test_export_roundtrip(tmp_path):
    from jax import export as jexport

    cfg = tiny_config("xception_lite")
    model = LightHeadRCNN(config=cfg, dtype=jnp.float32)
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 64, 64, 3)) * 0.2
    variables = model.init(jax.random.PRNGKey(0), x, train=False)

    def serving_fn(images):
        det = lighthead_postprocess(
            model.apply(variables, images, train=False), cfg)
        return det.boxes, det.scores, det.classes, det.valid

    spec = jax.ShapeDtypeStruct((2, 64, 64, 3), jnp.float32)
    exported = jexport.export(jax.jit(serving_fn))(spec)
    blob = exported.serialize()
    path = tmp_path / "det.stablehlo"
    path.write_bytes(blob)

    # reload from bytes only and run
    fn = jexport.deserialize(path.read_bytes())
    rb, rs, rc, rv = map(np.asarray, fn.call(x))
    lb, ls, lc, lv = map(np.asarray, serving_fn(x))
    np.testing.assert_allclose(rs, ls, atol=1e-5)
    assert (rc == lc).all() and (rv == lv).all()
    np.testing.assert_allclose(rb, lb, atol=1e-3)
