"""Detection throughput for any preset (bench.py generalized).

bench.py at the repo root is the driver contract (BASELINE config 3); this
tool measures the same end-to-end images->detections surface for any preset
and batch size, using the queue-then-readback protocol required on the
remote-TPU backend (see bench.py docstring).

  python tools/bench_detect.py --preset ssd_resnet50 --batch 8   # config 2
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), os.pardir))


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--preset", default="ssd_resnet50")
    p.add_argument("--batch", type=int, default=8)
    p.add_argument("--image-size", type=int, default=None)
    p.add_argument("--iters", type=int, default=10)
    args = p.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from x_detector_tpu.cli.evaluate import build_eval_fn
    from x_detector_tpu.config import PRESETS
    from x_detector_tpu.models.lighthead import LightHeadRCNN
    from x_detector_tpu.models.ssd import SSDModel

    cfg = (PRESETS[args.preset](image_size=args.image_size)
           if args.image_size else PRESETS[args.preset]())
    size = cfg.model.image_size

    if cfg.model.family == "ssd":
        model = SSDModel(config=cfg.model, dtype=jnp.bfloat16)
    else:
        model = LightHeadRCNN(config=cfg.model, dtype=jnp.bfloat16)
    eval_fn = build_eval_fn(model, cfg)  # the exact eval-CLI surface

    variables = model.init(jax.random.PRNGKey(0),
                           jnp.zeros((1, size, size, 3)), train=False)
    detect = jax.jit(lambda v, x: eval_fn(v, x)[1].sum())  # scalar fence
    batches = [jax.random.uniform(jax.random.PRNGKey(i),
                                  (args.batch, size, size, 3), jnp.float32,
                                  maxval=255.0) for i in range(args.iters)]
    _ = np.asarray(detect(variables, batches[0]))
    _ = np.asarray(detect(variables, batches[min(1, len(batches) - 1)]))
    t0 = time.perf_counter()
    results = [detect(variables, b) for b in batches]
    _ = np.asarray(results[-1])
    dt = time.perf_counter() - t0
    print(json.dumps({
        "preset": args.preset, "batch": args.batch, "image_size": size,
        "images_per_sec_per_chip": round(args.batch * args.iters / dt, 2),
    }))


if __name__ == "__main__":
    main()
