"""EMA A/B: held-out synthetic mAP of raw params vs the EMA shadow.

Measures whether serving the EMA shadow (reference T5 semantics; the SSD
preset maintains one by default and eval/export prefer it) actually helps —
the round-2 review asked for a measured comparison, not just plumbing.

Fully on-device: synthetic batches + augmentation-free training (the SSD
family matches anchors in-loss), then a held-out eval on a disjoint key
stream with both weight sets.

  PYTHONPATH=.:/root/.axon_site python tools/ema_ab.py [--steps 3000]
"""
import argparse
import dataclasses
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), os.pardir))

import jax
import jax.numpy as jnp
import numpy as np

from x_detector_tpu.config import ssd_resnet50
from x_detector_tpu.data.synthetic import synthetic_batch_device
from x_detector_tpu.models.detector import postprocess_detections
from x_detector_tpu.models.ssd import build_ssd_anchors
from x_detector_tpu.train.trainer import create_model_and_state, make_train_step
from x_detector_tpu.utils.metrics_voc import VOCEvaluator


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--steps", type=int, default=3000)
    p.add_argument("--batch", type=int, default=16)
    p.add_argument("--image-size", type=int, default=512)
    p.add_argument("--ema-decay", type=float, default=0.999)
    args = p.parse_args()

    cfg = ssd_resnet50(image_size=args.image_size)
    cfg = dataclasses.replace(
        cfg, train=dataclasses.replace(
            cfg.train, batch_size=args.batch, learning_rate=2e-3,
            warmup_steps=200, ema_decay=args.ema_decay,
            lr_boundaries=(int(args.steps * 0.7), int(args.steps * 0.9)),
            lr_decays=(1.0, 0.3, 0.1)))
    model, state = create_model_and_state(cfg, jax.random.PRNGKey(0),
                                          dtype=jnp.bfloat16)
    step_fn = make_train_step(model, cfg)

    @jax.jit
    def fused(state, key):
        kd, ks = jax.random.split(key)
        raw = synthetic_batch_device(kd, args.batch, args.image_size,
                                     cfg.data.max_gt_boxes)
        raw["image"] = raw["image"] - jnp.asarray(cfg.data.pixel_means)
        return step_fn(state, raw, ks)

    key0 = jax.random.PRNGKey(7)
    t0 = time.perf_counter()
    for i in range(args.steps):
        state, m = fused(state, jax.random.fold_in(key0, i))
        if (i + 1) % 500 == 0:
            print(f"step {i+1}: loss "
                  f"{float(np.asarray(m['total_loss'])):.3f} "
                  f"({time.perf_counter()-t0:.0f}s)", flush=True)

    anchors = jnp.asarray(build_ssd_anchors(cfg.model))

    def eval_map(params, tag):
        variables = {"params": params, "batch_stats": state.batch_stats}

        @jax.jit
        def eval_batch(key):
            raw = synthetic_batch_device(key, args.batch, args.image_size,
                                         cfg.data.max_gt_boxes)
            img = raw["image"] - jnp.asarray(cfg.data.pixel_means)
            cls, loc = model.apply(variables, img, train=False)
            det = postprocess_detections(
                loc, cls, anchors, max_output=cfg.model.nms.max_output,
                iou_threshold=cfg.model.nms.iou_threshold,
                score_threshold=cfg.model.nms.score_threshold)
            return raw, det

        ev = VOCEvaluator(num_classes=20)
        ekey = jax.random.PRNGKey(987654)
        for bi in range(10):
            raw, det = eval_batch(jax.random.fold_in(ekey, bi))
            gtb, gtl, gtm = map(np.asarray, (raw["gt_boxes"],
                                             raw["gt_labels"],
                                             raw["gt_mask"]))
            boxes, scores, classes, valid = map(
                np.asarray, (det.boxes, det.scores, det.classes, det.valid))
            for i in range(args.batch):
                ev.add_ground_truth(f"{tag}b{bi}i{i}", gtb[i][gtm[i]],
                                    gtl[i][gtm[i]])
                v = valid[i]
                ev.add_detections(f"{tag}b{bi}i{i}", boxes[i][v],
                                  scores[i][v], classes[i][v])
        res = ev.evaluate()
        print(f"{tag}: held-out mAP {res['mAP']:.4f}")
        return res["mAP"]

    raw_map = eval_map(state.params, "raw-params")
    ema_map = eval_map(state.ema_params, "ema-shadow")
    print(f"EMA A/B (steps={args.steps}, decay={args.ema_decay}): "
          f"raw {raw_map:.4f} vs ema {ema_map:.4f} "
          f"(delta {ema_map - raw_map:+.4f})")


if __name__ == "__main__":
    main()
