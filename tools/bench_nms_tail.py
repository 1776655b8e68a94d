"""Isolated SSD postprocess-tail benchmark: exact vs variants (1 chip).

The config-2 profile (tools/bench_infer.py) showed the decode+per-class-NMS
tail at ~6.5 ms of the 14.1 ms batch-8 pipeline — by far the largest
optimization target.  This harness times the tail ALONE on realistic
random logits so variants iterate in seconds, then the winner is confirmed
end-to-end with bench_infer/fast_nms_ab.

Variants:
  exact     production batched_multiclass_nms path
  maxpool   MaxpoolNMS fast mode (local-max + global top-k)

  python tools/bench_nms_tail.py [--batch 8] [--image-size 512]
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), os.pardir))

import jax
import jax.numpy as jnp
import numpy as np

from x_detector_tpu.config import ssd_resnet50
from x_detector_tpu.models.detector import postprocess_detections
from x_detector_tpu.models.ssd import build_ssd_anchors

ITERS = 16


def time_fn(fn, inputs, passes=3):
    _ = np.asarray(fn(*inputs[0]))
    _ = np.asarray(fn(*inputs[1]))
    best = float("inf")
    for _ in range(passes):
        t0 = time.perf_counter()
        outs = [fn(*i) for i in inputs]
        _ = np.asarray(outs[-1])
        best = min(best, (time.perf_counter() - t0) / len(inputs))
    return best * 1e3


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--batch", type=int, default=8)
    p.add_argument("--image-size", type=int, default=512)
    args = p.parse_args()

    cfg = ssd_resnet50(image_size=args.image_size)
    anchors = jnp.asarray(build_ssd_anchors(cfg.model))
    N = anchors.shape[0]
    C = cfg.model.num_classes
    print(f"anchors {N}, classes {C}, batch {args.batch}")

    # realistic score statistics: softmax of ~N(0,2) logits with a strong
    # background bias — most anchors fall below the 0.01 score floor, a few
    # hundred per image survive (the post-training regime NMS actually sees)
    inputs = []
    for i in range(ITERS):
        k1, k2 = jax.random.split(jax.random.PRNGKey(i))
        logits = jax.random.normal(k1, (args.batch, N, C)) * 2.0
        logits = logits.at[..., 0].add(5.0)
        codes = jax.random.normal(k2, (args.batch, N, 4)) * 0.3
        inputs.append((codes, logits))

    ncfg = cfg.model.nms

    def exact(codes, logits):
        det = postprocess_detections(
            codes, logits, anchors, max_output=ncfg.max_output,
            iou_threshold=ncfg.iou_threshold,
            score_threshold=ncfg.score_threshold)
        return det.scores.sum()

    def maxpool(codes, logits):
        det = postprocess_detections(
            codes, logits, anchors, max_output=ncfg.max_output,
            iou_threshold=ncfg.iou_threshold,
            score_threshold=ncfg.score_threshold,
            fast_mode=True, ssd_anchor_cfg=cfg.model.ssd_anchors,
            image_size=cfg.model.image_size)
        return det.scores.sum()

    for name, fn in [("exact", exact), ("maxpool", maxpool)]:
        ms = time_fn(jax.jit(fn), inputs)
        print(f"{name:>10}: {ms:7.2f} ms/batch "
              f"({args.batch / ms * 1e3:.0f} img/s tail-only)")


if __name__ == "__main__":
    main()
