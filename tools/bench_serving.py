"""Serving-artifact throughput: exported StableHLO vs live-jitted model.

Round-trips BASELINE config 3 through ``jax.export`` (serialize ->
deserialize via x_detector_tpu.serving, no model code on the consumer
side) and measures the reloaded artifact's TPU throughput against the
live-jitted pipeline — the exported graph should compile to the same XLA
program, so any gap is serialization overhead.

  PYTHONPATH=.:/root/.axon_site python tools/bench_serving.py
"""
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), os.pardir))

import jax
import jax.numpy as jnp
import numpy as np

BATCH, ITERS = 16, 12


def main():
    from x_detector_tpu import serving
    from x_detector_tpu.config import lighthead_xception
    from x_detector_tpu.models.lighthead import (LightHeadRCNN,
                                                 lighthead_postprocess)

    cfg = lighthead_xception(image_size=800)
    size = cfg.model.image_size
    model = LightHeadRCNN(config=cfg.model, dtype=jnp.bfloat16)
    variables = model.init(jax.random.PRNGKey(0),
                           jnp.zeros((1, size, size, 3)), train=False)

    def serving_fn(images):
        det = lighthead_postprocess(
            model.apply(variables, images, train=False), cfg.model)
        return det.boxes, det.scores, det.classes, det.valid

    from jax import export as jexport
    spec = jax.ShapeDtypeStruct((BATCH, size, size, 3), jnp.float32)
    blob = jexport.export(jax.jit(serving_fn))(spec).serialize()
    path = os.path.join(tempfile.mkdtemp(), "det.stablehlo")
    with open(path, "wb") as f:
        f.write(blob)
    print(f"artifact: {len(blob)/1e6:.1f} MB")

    art = serving.load(path)
    batches = [jax.random.uniform(jax.random.PRNGKey(i),
                                  (BATCH, size, size, 3), jnp.float32,
                                  maxval=255.0) for i in range(ITERS)]

    def bench(name, call):
        _ = np.asarray(call(batches[0])[1]).sum()
        _ = np.asarray(call(batches[1])[1]).sum()
        best = float("inf")
        for _pass in range(3):
            t0 = time.perf_counter()
            outs = [call(b) for b in batches]
            _ = np.asarray(outs[-1][1]).sum()   # FIFO fence
            best = min(best, time.perf_counter() - t0)
        print(f"{name}: {BATCH*ITERS/best:.1f} img/s/chip")
        return BATCH * ITERS / best

    live = bench("live jit", jax.jit(serving_fn))
    reloaded = bench("reloaded artifact", art.call)
    print(f"artifact/live ratio: {reloaded/live:.3f}")


if __name__ == "__main__":
    main()
