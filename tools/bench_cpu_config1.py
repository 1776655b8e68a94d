"""BASELINE config 1's literal judged surface: single 800px image on CPU.

BASELINE.json config 1 is *CPU* inference of Light-Head R-CNN + ResNet-50
(batch 1, 800px, boxes/scores parity vs the reference).  The parity half is
reference-blocked (tools/config1_parity.py sits ready, no reference outputs
to --compare), but the latency half is measurable anywhere: this pins JAX
to local CPU (per the verify recipe: env var AND config.update, before any
device use) and times the full images -> final detections pipeline, fp32
and bf16.

On CPU ``jax.block_until_ready`` is a real fence, so timing is the plain
warm-up-then-median protocol (no tunnel games).

Run WITHOUT setting PYTHONPATH (this script inserts its own sys.path):

  python tools/bench_cpu_config1.py [--iters 5] [--image-size 800]
"""
import argparse
import json
import os
import sys
import time

os.environ["JAX_PLATFORMS"] = "cpu"
sys.path.insert(0, os.path.join(os.path.dirname(__file__), os.pardir))

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--iters", type=int, default=5)
    p.add_argument("--image-size", type=int, default=800)
    p.add_argument("--dtypes", default="float32,bfloat16")
    args = p.parse_args()

    from x_detector_tpu.config import lighthead_resnet50
    from x_detector_tpu.models.lighthead import (LightHeadRCNN,
                                                 lighthead_postprocess)

    cfg = lighthead_resnet50(image_size=args.image_size)
    size = cfg.model.image_size
    assert jax.devices()[0].platform == "cpu", jax.devices()

    for dtype_name in args.dtypes.split(","):
        dtype = jnp.bfloat16 if dtype_name == "bfloat16" else jnp.float32
        model = LightHeadRCNN(config=cfg.model, dtype=dtype)
        variables = model.init(jax.random.PRNGKey(0),
                               jnp.zeros((1, size, size, 3)), train=False)

        @jax.jit
        def detect(variables, images):
            det = lighthead_postprocess(
                model.apply(variables, images, train=False), cfg.model)
            return det.boxes, det.scores, det.classes, det.valid

        img = jax.random.uniform(jax.random.PRNGKey(1),
                                 (1, size, size, 3), jnp.float32,
                                 maxval=255.0)
        t0 = time.perf_counter()
        jax.block_until_ready(detect(variables, img))     # compile + warm
        compile_s = time.perf_counter() - t0
        times = []
        for _ in range(args.iters):
            t0 = time.perf_counter()
            jax.block_until_ready(detect(variables, img))
            times.append(time.perf_counter() - t0)
        med = sorted(times)[len(times) // 2]
        print(json.dumps({
            "metric": "config1_cpu_batch1_latency_ms",
            "preset": "lighthead_resnet50",
            "image_size": size,
            "dtype": dtype_name,
            "latency_ms": round(med * 1e3, 1),
            "images_per_sec": round(1.0 / med, 3),
            "spread_ms": [round(t * 1e3, 1) for t in sorted(times)],
            "compile_s": round(compile_s, 1),
            "host": f"nproc={os.cpu_count()}",
        }), flush=True)


if __name__ == "__main__":
    main()
