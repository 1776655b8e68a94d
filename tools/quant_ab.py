"""int8 PTQ A/B: held-out mAP + throughput, bf16 vs int8 backbone.

Round-4 build of DESIGN §19's lever (VERDICT item 3): trains a synthetic
run per judged family fully on-device (the capstone recipe, same settings
as tools/fast_nms_ab.py), calibrates the backbone activation ranges
(x_detector_tpu/quant.py), then evaluates the SAME weights with the bf16
backbone and the int8 backbone — mAP on held-out synthetic data and
device time via the §13 in-jit K-vs-2K differencing protocol (the deltas
at stake are ~1.2x on ~10 ms pipelines; queue timing would measure the
tunnel).  ≥2 seeds per the repo's accuracy-claim rule (DESIGN §18).

Families map to the judged configs: lighthead = BASELINE config 3
(lighthead_xception, b16 @ 800px), ssd = config 2 (ssd_resnet50,
b8 @ 512px).

Run WITHOUT setting PYTHONPATH (this script inserts its own sys.path):

  python tools/quant_ab.py --family both --steps 3000 --seeds 0,1
"""
import argparse
import dataclasses
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), os.pardir))

import jax
import jax.numpy as jnp
import numpy as np

from bench_infer import _time_fn
from fast_nms_ab import (capstone_config, eval_map, smoke_shrink,
                         train_synthetic)
from x_detector_tpu import quant

from x_detector_tpu.data.augment import preprocess_for_eval
from x_detector_tpu.data.synthetic import synthetic_batch_device
from x_detector_tpu.models.detector import postprocess_detections
from x_detector_tpu.models.lighthead import lighthead_postprocess
from x_detector_tpu.models.ssd import build_ssd_anchors


def make_detect(cfg, mcfg):
    """variables, raw_image_batch -> (boxes, scores, classes, valid) for a
    ModelConfig variant (bf16 baseline or backbone_quant='int8')."""
    model = quant.build_detector(mcfg, jnp.bfloat16)
    pre = lambda images: jax.vmap(
        lambda im: preprocess_for_eval(im, cfg.data))(images)
    if mcfg.family == "lighthead":
        @jax.jit
        def detect(variables, images):
            det = lighthead_postprocess(
                model.apply(variables, pre(images), train=False), mcfg)
            return det.boxes, det.scores, det.classes, det.valid
    else:
        anchors = jnp.asarray(build_ssd_anchors(mcfg))

        @jax.jit
        def detect(variables, images):
            cls, loc = model.apply(variables, pre(images), train=False)
            det = postprocess_detections(
                loc, cls, anchors, max_output=mcfg.nms.max_output,
                iou_threshold=mcfg.nms.iou_threshold,
                score_threshold=mcfg.nms.score_threshold,
                approx_prefilter=mcfg.nms.approx_prefilter)
            return det.boxes, det.scores, det.classes, det.valid
    return detect


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--family", default="both",
                   choices=["lighthead", "lighthead_resnet50", "ssd",
                            "both"],
                   help="lighthead = config 3 (Xception-lite); "
                        "lighthead_resnet50 = config 1 (round 5: its int8 "
                        "throughput is measured in DESIGN §20 — this "
                        "family runs the direct accuracy A/B); 'both' "
                        "keeps the round-4 pair (configs 3 + 2)")
    p.add_argument("--steps", type=int, default=3000)
    p.add_argument("--seeds", default="0,1")
    p.add_argument("--eval-batches", type=int, default=10)
    p.add_argument("--calib-batches", type=int, default=8)
    p.add_argument("--time-iters", type=int, default=8)
    p.add_argument("--passes", type=int, default=3)
    p.add_argument("--smoke", action="store_true",
                   help="tiny-capacity 64px configs (the test suite's "
                        "shapes): validates the full A/B path end-to-end "
                        "on CPU in minutes before spending TPU time; the "
                        "numbers it prints are NOT the judged surfaces")
    args = p.parse_args()

    fams = (["lighthead", "ssd"] if args.family == "both"
            else [args.family])
    seeds = [int(s) for s in args.seeds.split(",")]
    for fam in fams:
        # one shared recipe with fast_nms_ab so the two A/Bs cannot drift
        cfg = capstone_config(fam, args.steps)
        if args.smoke:
            cfg = smoke_shrink(cfg, fam)
        size = cfg.model.image_size
        bsz = cfg.train.batch_size
        for seed in seeds:
            scfg = dataclasses.replace(
                cfg, train=dataclasses.replace(cfg.train, seed=seed))
            print(f"[{fam} seed {seed}] training {args.steps} synthetic "
                  "steps...", flush=True)
            model, state = train_synthetic(scfg, args.steps)
            variables = {"params": state.params,
                         "batch_stats": state.batch_stats}

            gen = jax.jit(lambda k: synthetic_batch_device(
                k, bsz, size, cfg.data.max_gt_boxes)["image"])
            pre = jax.jit(jax.vmap(
                lambda im: preprocess_for_eval(im, cfg.data)))
            calib = (pre(gen(jax.random.fold_in(jax.random.PRNGKey(777), i)))
                     for i in range(args.calib_batches))
            qv = quant.calibrate_backbone(scfg, variables, calib)
            print(f"[{fam} seed {seed}] calibrated "
                  f"{len(jax.tree_util.tree_leaves(qv))} conv ranges",
                  flush=True)

            stacked = jnp.stack([
                jax.random.uniform(jax.random.PRNGKey(9000 + i),
                                   (bsz, size, size, 3), jnp.float32,
                                   maxval=255.0)
                for i in range(args.time_iters)])
            for precision in ("bf16", "int8"):
                mcfg = (scfg.model if precision == "bf16" else
                        dataclasses.replace(scfg.model,
                                            backbone_quant="int8"))
                v = (variables if precision == "bf16"
                     else dict(variables, quant=qv))
                detect = make_detect(scfg, mcfg)
                mAP = eval_map(scfg, detect, v, args.eval_batches)
                fence = lambda vv, x: detect(vv, x)[1].astype(
                    jnp.float32).sum()
                sec = _time_fn(fence, v, stacked, args.passes)
                print(json.dumps({
                    "family": fam, "preset": cfg.model.name, "seed": seed,
                    "precision": precision,
                    "held_out_mAP": round(mAP, 4),
                    "ms_per_batch": round(sec * 1e3, 2),
                    "images_per_sec_per_chip": round(bsz / sec, 1),
                }), flush=True)


if __name__ == "__main__":
    main()
