"""Calibration-statistic sensitivity: amax vs percentile under outliers.

Round-4 verdict item 3's measured half.  The int8 activation scale is a
running statistic over calibration batches (x_detector_tpu/quant.py); the
default abs-max is the most outlier-sensitive estimator possible — on real
images one hot pixel through a high-gain conv sets the scale for the whole
tensor, crushing the resolution of every in-range activation.  This probe
bounds that risk with a measurement instead of an assertion:

  1. train one capstone-recipe model (same path as tools/quant_ab.py);
  2. build calibration batches and inject heavy-tailed noise — a small
     fraction of pixels replaced by extreme values (hot pixels / specular
     saturation, the classic PTQ failure inputs);
  3. calibrate TWICE over the SAME corrupted batches: amax (percentile=100)
     and p99.9;
  4. evaluate held-out mAP of the int8 backbone under each scale set
     (clean eval data — the outliers model a corrupted calibration set,
     not a corrupted serving distribution), plus the bf16 baseline, and
     report the per-conv scale inflation amax/p99.9.

Run on the chip (full scale) or with --smoke on CPU:

  python tools/calib_sensitivity.py --family ssd --steps 3000
  python tools/calib_sensitivity.py --smoke --steps 60
"""
import argparse
import dataclasses
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), os.pardir))

import jax
import jax.numpy as jnp

from fast_nms_ab import capstone_config, eval_map, smoke_shrink, train_synthetic
from quant_ab import make_detect
from x_detector_tpu import quant
from x_detector_tpu.data.augment import preprocess_for_eval
from x_detector_tpu.data.synthetic import synthetic_batch_device


def corrupt(images, key, frac, magnitude):
    """Replace ``frac`` of pixels with +-``magnitude`` x the raw range.

    Applied BEFORE eval preprocessing (raw [0, 255] space), so the spikes
    pass through the same whitening the calibration pipeline uses.
    """
    k1, k2 = jax.random.split(key)
    hot = jax.random.uniform(k1, images.shape[:-1]) < frac        # [B, H, W]
    sign = jnp.where(jax.random.uniform(k2, images.shape[:-1]) < 0.5,
                     -1.0, 1.0)
    spike = (sign * magnitude * 255.0)[..., None]
    return jnp.where(hot[..., None], spike, images)


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--family", default="ssd", choices=["lighthead", "ssd"])
    p.add_argument("--steps", type=int, default=3000)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--calib-batches", type=int, default=8)
    p.add_argument("--eval-batches", type=int, default=10)
    p.add_argument("--hot-frac", type=float, default=1e-4,
                   help="fraction of calibration pixels replaced by spikes")
    p.add_argument("--hot-magnitude", type=float, default=8.0,
                   help="spike amplitude in units of the raw [0,255] range")
    p.add_argument("--percentile", type=float, default=99.9)
    p.add_argument("--smoke", action="store_true",
                   help="tiny-capacity 64px CPU-runnable tier (path "
                        "validation only; not the judged numbers)")
    args = p.parse_args()

    cfg = capstone_config(args.family, args.steps)
    if args.smoke:
        cfg = smoke_shrink(cfg, args.family)
    cfg = dataclasses.replace(
        cfg, train=dataclasses.replace(cfg.train, seed=args.seed))
    size, bsz = cfg.model.image_size, cfg.train.batch_size

    print(f"[{args.family}] training {args.steps} synthetic steps...",
          flush=True)
    model, state = train_synthetic(cfg, args.steps)
    variables = {"params": state.params, "batch_stats": state.batch_stats}

    gen = jax.jit(lambda k: synthetic_batch_device(
        k, bsz, size, cfg.data.max_gt_boxes)["image"])
    pre = jax.jit(jax.vmap(lambda im: preprocess_for_eval(im, cfg.data)))

    def calib_batches():
        for i in range(args.calib_batches):
            k = jax.random.fold_in(jax.random.PRNGKey(777), i)
            raw = corrupt(gen(k), jax.random.fold_in(k, 1),
                          args.hot_frac, args.hot_magnitude)
            yield pre(raw)

    arms = {}
    for name, pct in (("amax", 100.0), (f"p{args.percentile}",
                                        args.percentile)):
        arms[name] = quant.calibrate_backbone(cfg, variables, calib_batches(),
                                              percentile=pct)

    # Per-conv scale inflation: how much the outliers stretched amax above
    # the percentile estimate (1.0 = no outlier sensitivity).
    a = jax.tree_util.tree_leaves(arms["amax"])
    q = jax.tree_util.tree_leaves(arms[f"p{args.percentile}"])
    ratios = [float(x) / max(float(y), 1e-12) for x, y in zip(a, q)]
    print(json.dumps({"scale_inflation_amax_over_pct":
                      {"max": round(max(ratios), 2),
                       "median": round(sorted(ratios)[len(ratios) // 2], 2),
                       "convs": len(ratios)}}), flush=True)

    results = {}
    detect_bf16 = make_detect(cfg, cfg.model)
    results["bf16"] = eval_map(cfg, detect_bf16, variables,
                               args.eval_batches)
    mcfg = dataclasses.replace(cfg.model, backbone_quant="int8")
    for name, qv in arms.items():
        detect = make_detect(cfg, mcfg)
        results[f"int8_{name}"] = eval_map(cfg, detect,
                                           dict(variables, quant=qv),
                                           args.eval_batches)
    print(json.dumps({
        "family": args.family, "steps": args.steps, "seed": args.seed,
        "hot_frac": args.hot_frac, "hot_magnitude": args.hot_magnitude,
        "held_out_mAP": {k: round(v, 4) for k, v in results.items()},
    }), flush=True)


if __name__ == "__main__":
    main()
