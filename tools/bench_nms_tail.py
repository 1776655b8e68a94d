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

ITERS = 8


def time_fn(per_item_fn, codes_all, logits_all, passes=3):
    """ms per item via in-jit fori_loop at K and 2K iterations.

    A ms-scale op CANNOT be timed by queuing dispatches on the axon
    backend — per-dispatch tunnel overhead (~7 ms measured) swamps the op
    and every variant times identically (this tool's first version did
    exactly that).  Looping INSIDE one jit serializes real executions; the
    K-vs-2K difference cancels the constant per-call overhead (RTT,
    readback).
    """
    import functools

    k = codes_all.shape[0]

    @functools.partial(jax.jit, static_argnums=(2,))
    def loop(codes_all, logits_all, iters):
        def body(i, acc):
            codes = jax.lax.dynamic_index_in_dim(
                codes_all, i % k, keepdims=False).astype(jnp.float32)
            logits = jax.lax.dynamic_index_in_dim(
                logits_all, i % k, keepdims=False).astype(jnp.float32)
            # acc feeds the input: a true data dependency, no hoisting
            return acc + per_item_fn(codes + acc * 1e-20, logits)
        return jax.lax.fori_loop(0, iters, body, 0.0)

    times = {}
    for iters in (k, 2 * k):
        _ = np.asarray(loop(codes_all, logits_all, iters))   # compile+warm
        best = float("inf")
        for _ in range(passes):
            t0 = time.perf_counter()
            _ = np.asarray(loop(codes_all, logits_all, iters))
            best = min(best, time.perf_counter() - t0)
        times[iters] = best
    return (times[2 * k] - times[k]) / k * 1e3


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
    # hundred per image survive (the post-training regime NMS actually
    # sees). Staged as ONE [K, B, N, C] bf16 device array (see time_fn).
    @jax.jit
    def gen(key):
        k1, k2 = jax.random.split(key)
        logits = jax.random.normal(
            k1, (ITERS, args.batch, N, C), jnp.bfloat16) * 2.0
        logits = logits.at[..., 0].add(5.0)
        codes = jax.random.normal(
            k2, (ITERS, args.batch, N, 4), jnp.bfloat16) * 0.3
        return codes, logits

    codes_all, logits_all = gen(jax.random.PRNGKey(0))

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

    # variant experiments: TPU-native approximate top-k for the two sort
    # hotspots (per-class candidate prefilter in the exact path; the global
    # (box, class) merge in the maxpool path)
    from x_detector_tpu.ops import boxes as box_ops
    from x_detector_tpu.ops import nms as nms_lib
    from x_detector_tpu.ops.maxpool_nms import ssd_maxpool_scores

    def exact_approx(codes, logits):
        probs = jax.nn.softmax(logits, axis=-1)[..., 1:]
        decoded = box_ops.clip_boxes(box_ops.decode(codes, anchors[None]))

        def one_image(boxes_n, scores_nc):
            def one_class(cls_scores):
                top_s, idx = jax.lax.approx_max_k(cls_scores, 256)
                onehot = (idx[:, None] == jnp.arange(N)[None, :])
                cls_boxes = onehot.astype(boxes_n.dtype) @ boxes_n
                return nms_lib.nms_padded(cls_boxes, top_s, 100,
                                          ncfg.iou_threshold,
                                          ncfg.score_threshold,
                                          presorted=True)
            res = jax.vmap(one_class, in_axes=1)(scores_nc)
            flat_s = res.scores.reshape(-1)
            top_s, top_i = jax.lax.top_k(flat_s, ncfg.max_output)
            return top_s.sum()
        return jax.vmap(one_image)(decoded, probs).sum()

    def maxpool_approx(codes, logits):
        probs = jax.nn.softmax(logits, axis=-1)[..., 1:]
        masked = ssd_maxpool_scores(probs, cfg.model.ssd_anchors,
                                    cfg.model.image_size,
                                    ncfg.iou_threshold)
        flat = masked.reshape(masked.shape[0], -1)
        top_s, _ = jax.lax.approx_max_k(flat, ncfg.max_output)
        return top_s.sum()

    for name, fn in [("exact", exact), ("maxpool", maxpool),
                     ("exact+approx", exact_approx),
                     ("maxpool+approx", maxpool_approx)]:
        ms = time_fn(fn, codes_all, logits_all)
        print(f"{name:>14}: {ms:7.2f} ms/batch "
              f"({args.batch / ms * 1e3:.0f} img/s tail-only)", flush=True)


if __name__ == "__main__":
    main()
