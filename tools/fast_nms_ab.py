"""A/B: exact adaptive NMS vs MaxpoolNMS fast mode — mAP and throughput.

Round-2 verdict item 7 ("build or bury fast-NMS with data"): trains a
synthetic run per family fully on-device (the capstone recipe), then
evaluates the SAME weights with the exact NMS path and with the MaxpoolNMS
approximation (ops/maxpool_nms.py), and measures end-to-end detection
throughput for both.  Emits one JSON row per (family, mode).

  python tools/fast_nms_ab.py --family both --steps 3000

Families map to the judged configs: lighthead = BASELINE config 3
(lighthead_xception, b16 @ 800px; fast mode replaces the RPN proposal NMS),
ssd = config 2 (ssd_resnet50, b8 @ 512px; fast mode replaces the per-class
eval NMS).
"""
import argparse
import dataclasses
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), os.pardir))

import jax
import jax.numpy as jnp
import numpy as np

from x_detector_tpu.config import (lighthead_resnet50, lighthead_xception,
                                   ssd_resnet50, xdet_xception)
from x_detector_tpu.data.augment import (preprocess_batch_for_train,
                                         preprocess_for_eval)
from x_detector_tpu.data.synthetic import synthetic_batch_device
from x_detector_tpu.models.detector import postprocess_detections
from x_detector_tpu.models.lighthead import (LightHeadRCNN,
                                             lighthead_postprocess)
from x_detector_tpu.models.ssd import SSDModel, build_ssd_anchors
from x_detector_tpu.train.trainer import create_model_and_state, make_train_step
from x_detector_tpu.utils.metrics_voc import VOCEvaluator


def train_synthetic(cfg, steps: int):
    # cfg.train.seed varies init AND the data stream (the capstone A/B
    # convention, DESIGN §18); seed 0 reproduces the original runs.
    seed = cfg.train.seed
    model, state = create_model_and_state(cfg, jax.random.PRNGKey(seed),
                                          dtype=jnp.bfloat16)
    step_fn = make_train_step(model, cfg)
    bsz = cfg.train.batch_size
    canvas = int(cfg.model.image_size * 1.2)

    @jax.jit
    def fused(state, key):
        kd, ka, ks = jax.random.split(key, 3)
        raw = synthetic_batch_device(kd, bsz, canvas, cfg.data.max_gt_boxes)
        batch = preprocess_batch_for_train(ka, raw, cfg.data)
        return step_fn(state, batch, ks)

    key0 = jax.random.PRNGKey(7 + 1000 * seed)
    t0 = time.perf_counter()
    for i in range(steps):
        state, m = fused(state, jax.random.fold_in(key0, i))
        if i % 500 == 0:
            loss = float(np.asarray(m["total_loss"]))  # also paces the queue
            print(f"  step {i}: loss {loss:.3f} "
                  f"({time.perf_counter() - t0:.0f}s)", flush=True)
    _ = float(np.asarray(m["total_loss"]))
    print(f"  trained {steps} steps in {time.perf_counter() - t0:.0f}s")
    return model, state


def make_detect_fn(cfg, model, mode: str):
    """variables, raw_image_batch -> MulticlassNMSResult fields.

    mode: 'exact' (production default), 'approx' (approx_max_k candidate
    prefilter, greedy NMS still exact), 'maxpool' (MaxpoolNMS fast mode).
    """
    if cfg.model.family == "lighthead":
        mcfg = cfg.model
        if mode == "maxpool":
            mcfg = dataclasses.replace(
                mcfg, proposals=dataclasses.replace(mcfg.proposals,
                                                    fast_nms=True))
        elif mode == "approx":
            mcfg = dataclasses.replace(
                mcfg, nms=dataclasses.replace(mcfg.nms,
                                              approx_prefilter=True))
        m = LightHeadRCNN(config=mcfg, dtype=jnp.bfloat16)

        @jax.jit
        def detect(variables, images):
            img = jax.vmap(lambda im: preprocess_for_eval(im, cfg.data))(
                images)
            det = lighthead_postprocess(m.apply(variables, img, train=False),
                                        mcfg)
            return det.boxes, det.scores, det.classes, det.valid
    else:
        anchors = jnp.asarray(build_ssd_anchors(cfg.model))

        @jax.jit
        def detect(variables, images):
            img = jax.vmap(lambda im: preprocess_for_eval(im, cfg.data))(
                images)
            cls, loc = model.apply(variables, img, train=False)
            det = postprocess_detections(
                loc, cls, anchors, max_output=cfg.model.nms.max_output,
                iou_threshold=cfg.model.nms.iou_threshold,
                score_threshold=cfg.model.nms.score_threshold,
                fast_mode=mode == "maxpool",
                ssd_anchor_cfg=cfg.model.ssd_anchors,
                image_size=cfg.model.image_size,
                approx_prefilter=mode == "approx")
            return det.boxes, det.scores, det.classes, det.valid
    return detect


def eval_map(cfg, detect, variables, num_batches: int) -> float:
    bsz = cfg.train.batch_size
    size = cfg.model.image_size
    gen = jax.jit(lambda k: synthetic_batch_device(k, bsz, size,
                                                   cfg.data.max_gt_boxes))
    ev = VOCEvaluator(num_classes=20)
    ekey = jax.random.PRNGKey(123456)
    for bi in range(num_batches):
        raw = gen(jax.random.fold_in(ekey, bi))
        boxes, scores, classes, valid = map(
            np.asarray, detect(variables, raw["image"]))
        gtb, gtl, gtm = map(np.asarray, (raw["gt_boxes"], raw["gt_labels"],
                                         raw["gt_mask"]))
        for i in range(bsz):
            ev.add_ground_truth(f"b{bi}i{i}", gtb[i][gtm[i]], gtl[i][gtm[i]])
            v = valid[i]
            ev.add_detections(f"b{bi}i{i}", boxes[i][v], scores[i][v],
                              classes[i][v])
    return ev.evaluate()["mAP"]


def throughput(cfg, detect, variables, iters: int = 8,
               passes: int = 3) -> float:
    bsz = cfg.train.batch_size
    size = cfg.model.image_size
    fence = jax.jit(lambda v, x: detect(v, x)[1].sum())
    batches = [jax.random.uniform(jax.random.PRNGKey(1000 + i),
                                  (bsz, size, size, 3), jnp.float32,
                                  maxval=255.0) for i in range(iters)]
    _ = np.asarray(fence(variables, batches[0]))
    _ = np.asarray(fence(variables, batches[1]))
    best = float("inf")
    for _ in range(passes):
        t0 = time.perf_counter()
        out = [fence(variables, b) for b in batches]
        _ = np.asarray(out[-1])
        best = min(best, time.perf_counter() - t0)
    return bsz * iters / best


def capstone_config(fam: str, steps: int):
    """The per-family judged-config synthetic training recipe (DESIGN §18).

    Single source of truth shared by this A/B and tools/quant_ab.py so the
    two harnesses cannot drift apart: lighthead = BASELINE config 3
    (lighthead_xception, b16 @ 800px); ssd/xdet = config 2 geometry
    (512px, preset batch).
    """
    if fam.startswith("lighthead"):
        # "lighthead" = config 3 (Xception-lite); "lighthead_resnet50" =
        # config 1 — added round 5 so the int8-on-config-1 throughput
        # measurement (DESIGN §20) can get its direct accuracy A/B with
        # one command instead of carrying mAP evidence over from config 2.
        cfg = (lighthead_resnet50 if fam == "lighthead_resnet50"
               else lighthead_xception)(image_size=800)
        return dataclasses.replace(
            cfg, train=dataclasses.replace(
                cfg.train, batch_size=16, learning_rate=2e-3,
                warmup_steps=200,
                lr_boundaries=(steps * 2 // 3, steps * 7 // 8),
                lr_decays=(1.0, 0.3, 0.1)))
    cfg = (ssd_resnet50 if fam == "ssd" else xdet_xception)(image_size=512)
    return dataclasses.replace(
        cfg, train=dataclasses.replace(
            cfg.train, learning_rate=2e-3, warmup_steps=200,
            lr_boundaries=(steps * 2 // 3, steps * 7 // 8),
            lr_decays=(1.0, 0.3, 0.1)))


def smoke_shrink(cfg, fam: str):
    """Tiny-capacity 64px variant of a capstone config (the test suite's
    shapes): lets either A/B harness validate its full path on CPU in
    minutes before spending TPU time.  Shared with tools/quant_ab.py.
    The numbers a smoke run prints are NOT the judged surfaces."""
    from x_detector_tpu.config import DataConfig, NMSConfig, ProposalConfig
    tiny = dict(image_size=64,
                backbone_stages=(1, 1, 1, 1),
                backbone_widths=(16, 32, 48, 64))
    if fam.startswith("lighthead"):
        tiny.update(
            large_sep_mid=16, head_dim=64,
            backbone_widths=(32, 64, 96, 128),
            proposals=ProposalConfig(
                pre_nms_topk=128, post_nms_topk=32,
                pre_nms_topk_eval=128, post_nms_topk_eval=32,
                min_size=2.0),
            nms=NMSConfig(max_output=20))
    return dataclasses.replace(
        cfg,
        model=dataclasses.replace(cfg.model, **tiny),
        data=DataConfig(image_size=64, max_gt_boxes=8),
        train=dataclasses.replace(cfg.train, batch_size=2, warmup_steps=0))


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--family", default="both",
                   choices=["lighthead", "ssd", "xdet", "both", "all"])
    p.add_argument("--steps", type=int, default=3000)
    p.add_argument("--eval-batches", type=int, default=10)
    p.add_argument("--smoke", action="store_true",
                   help="tiny-capacity 64px configs — CPU validation of "
                        "the harness, not the judged measurement")
    args = p.parse_args()

    fams = {"both": ["lighthead", "ssd"],
            "all": ["lighthead", "ssd", "xdet"]}.get(args.family,
                                                     [args.family])
    for fam in fams:
        cfg = capstone_config(fam, args.steps)
        if args.smoke:
            cfg = smoke_shrink(cfg, fam)
        print(f"[{fam}] training {args.steps} synthetic steps...", flush=True)
        model, state = train_synthetic(cfg, args.steps)
        variables = {"params": state.params, "batch_stats": state.batch_stats}
        for mode in ("exact", "approx", "maxpool"):
            detect = make_detect_fn(cfg, model, mode)
            mAP = eval_map(cfg, detect, variables, args.eval_batches)
            ips = throughput(cfg, detect, variables)
            print(json.dumps({
                "family": fam, "preset": cfg.model.name, "nms": mode,
                "held_out_mAP": round(mAP, 4),
                "images_per_sec_per_chip": round(ips, 2),
            }), flush=True)


if __name__ == "__main__":
    main()
