"""Per-preset inference profile: stage breakdown + MFU + roofline (1 chip).

The round-2 verdict's top ask: configs 1 (lighthead_resnet50) and 2
(ssd_resnet50) had throughput numbers but no optimization evidence behind
them.  This tool gives any preset the config-3 treatment — the end-to-end
images->detections surface, split into cumulative stages, with XLA's own
cost analysis per stage so every number carries a speed-of-light reference:

  stage times     queue-N-readback-1 protocol (bench.py docstring: the axon
                  backend's block_until_ready is a no-op; only a host
                  readback fences, and the device queue is FIFO)
  MFU             stage flops / stage time vs the v5e bf16 peak (197 TF/s)
  BW-bound floor  stage HBM bytes / 819 GB/s — when measured time is near
                  this, the stage is bandwidth-bound and more MFU is not
                  available without changing the memory traffic

Stages (cumulative prefixes, differenced):
  backbone        feature extractor only
  model           full model.apply (heads, and for two-stage: proposals +
                  NMS + PSROIAlign + ROI head)
  +postprocess    decode + per-class NMS (the eval-CLI tail)

Run WITHOUT setting PYTHONPATH (this script inserts its own sys.path;
``PYTHONPATH=.`` would clobber /root/.axon_site and kill the TPU backend):

  python tools/bench_infer.py --preset lighthead_resnet50 \
      --batch 16 [--iters 16] [--passes 3] [--profile DIR]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), os.pardir))

V5E_BF16_PEAK = 197e12   # FLOP/s per chip (public v5e spec)
V5E_HBM_BW = 819e9       # bytes/s per chip (public v5e spec)


def _cost(compiled):
    """(flops, hbm_bytes) from XLA's cost analysis; NaNs if unavailable."""
    try:
        c = compiled.cost_analysis()
        c = c[0] if isinstance(c, list) else c
        flops = float(c.get("flops", float("nan")))
        nbytes = float(c.get("bytes accessed", float("nan")))
        return flops, nbytes
    except Exception as e:  # axon/pjrt version drift
        print(f"cost_analysis unavailable: {e}", file=sys.stderr)
        return float("nan"), float("nan")


def _time_fn(fn, variables, stacked, passes):
    """Best-of-N seconds per call via an in-jit fori_loop at K and 2K.

    Queue-then-fence dispatch timing is only valid when per-call execution
    far exceeds the ~7 ms tunnel dispatch overhead (bench_nms_tail.py
    post-mortem); for ~10 ms pipelines it measures the tunnel. Looping
    inside one jit serializes real executions, and the K-vs-2K difference
    cancels constant per-call overhead (RTT, readback).
    """
    import functools

    import jax
    import jax.numpy as jnp
    import numpy as np

    k = stacked.shape[0]

    @functools.partial(jax.jit, static_argnums=(2,))
    def loop(v, xs, iters):
        def body(i, acc):
            x = jax.lax.dynamic_index_in_dim(
                xs, i % k, keepdims=False).astype(jnp.float32)
            return acc + fn(v, x + acc * 1e-20)   # data dep: no hoisting
        return jax.lax.fori_loop(0, iters, body, 0.0)

    times = {}
    for iters in (k, 2 * k):
        _ = np.asarray(loop(variables, stacked, iters))   # compile + warm
        best = float("inf")
        for _ in range(passes):
            t0 = time.perf_counter()
            _ = np.asarray(loop(variables, stacked, iters))
            best = min(best, time.perf_counter() - t0)
        times[iters] = best
    return (times[2 * k] - times[k]) / k


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--preset", default="lighthead_resnet50")
    p.add_argument("--batch", type=int, default=16)
    p.add_argument("--image-size", type=int, default=None)
    p.add_argument("--iters", type=int, default=8)
    p.add_argument("--passes", type=int, default=3)
    p.add_argument("--profile", default=None,
                   help="capture a jax.profiler trace of 3 full calls")
    p.add_argument("--backbone-quant", default=None, choices=["int8"],
                   help="calibrate backbone conv activation ranges on "
                        "synthetic batches (quant.calibrate_backbone), then "
                        "profile the int8 backbone variant — round 5: the "
                        "config-2 ResNet int8 win (1.20-1.27x, DESIGN §20) "
                        "had never been measured on config 1, whose dilated "
                        "ResNet sits at 1.44x its bf16 bandwidth floor")
    p.add_argument("--calib-batches", type=int, default=4)
    args = p.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from x_detector_tpu.config import PRESETS
    from x_detector_tpu.models.detector import postprocess_detections
    from x_detector_tpu.models.lighthead import (LightHeadRCNN,
                                                 lighthead_postprocess)
    from x_detector_tpu.models.resnet import ResNetV1
    from x_detector_tpu.models.ssd import SSDModel, build_ssd_anchors
    from x_detector_tpu.models.xception import XceptionLite

    cfg = (PRESETS[args.preset](image_size=args.image_size)
           if args.image_size else PRESETS[args.preset]())
    size = cfg.model.image_size
    two_stage = cfg.model.family == "lighthead"

    if two_stage:
        model = LightHeadRCNN(config=cfg.model, dtype=jnp.bfloat16)
    else:
        model = SSDModel(config=cfg.model, dtype=jnp.bfloat16)
    variables = model.init(jax.random.PRNGKey(0),
                           jnp.zeros((1, size, size, 3)), train=False)

    if args.backbone_quant:
        # Same flow as tools/quant_ab.py: collect activation ranges with a
        # calibrate-mode model, then rebuild the model with the int8 config
        # and carry the quant collection alongside the params.  Calibration
        # data matches the timing distribution (uniform [0, 255) images) —
        # scale values don't affect throughput, which is all this tool
        # measures; accuracy A/Bs live in quant_ab.py.
        import dataclasses

        from x_detector_tpu import quant
        calib = (jax.random.uniform(jax.random.PRNGKey(700 + i),
                                    (args.batch, size, size, 3),
                                    jnp.float32, maxval=255.0)
                 for i in range(args.calib_batches))
        qv = quant.calibrate_backbone(cfg, variables, calib)
        cfg = dataclasses.replace(cfg, model=dataclasses.replace(
            cfg.model, backbone_quant=args.backbone_quant))
        variables = dict(variables, quant=qv)
        if two_stage:
            model = LightHeadRCNN(config=cfg.model, dtype=jnp.bfloat16)
        else:
            model = SSDModel(config=cfg.model, dtype=jnp.bfloat16)

    # --- stage functions (each returns ONE scalar: the readback fence) ----
    if two_stage:
        def backbone_fn(v, x):
            feats = model.apply(
                v, x, train=False,
                method=lambda m, im, train: m.backbone(im, train))
            return sum(f.astype(jnp.float32).sum() for f in feats.values())
    else:
        dilate = False
        bb_kw = ({"quant": args.backbone_quant} if args.backbone_quant
                 else {})
        if cfg.model.backbone == "resnet50":
            bb = ResNetV1(dilate_c5=dilate, dtype=jnp.bfloat16, **bb_kw)
        else:
            bb = XceptionLite(dilate_c5=dilate, dtype=jnp.bfloat16, **bb_kw)
        def backbone_fn(v, x):
            sub = {k: val["backbone"] for k, val in v.items()
                   if "backbone" in val}
            feats = bb.apply(sub, x, train=False)
            return sum(f.astype(jnp.float32).sum() for f in feats.values())

    def model_fn(v, x):
        out = model.apply(v, x, train=False)
        leaves = jax.tree_util.tree_leaves(out)
        return sum(l.astype(jnp.float32).sum() for l in leaves)

    if two_stage:
        def full_fn(v, x):
            out = model.apply(v, x, train=False)
            det = lighthead_postprocess(out, cfg.model)
            return det.scores.sum()
    else:
        ssd_anchors = jnp.asarray(build_ssd_anchors(cfg.model))

        def full_fn(v, x):
            cls_logits, box_codes = model.apply(v, x, train=False)
            det = postprocess_detections(
                box_codes, cls_logits, ssd_anchors,
                max_output=cfg.model.nms.max_output,
                iou_threshold=cfg.model.nms.iou_threshold,
                score_threshold=cfg.model.nms.score_threshold,
                fast_mode=cfg.model.nms.fast_mode,
                ssd_anchor_cfg=cfg.model.ssd_anchors,
                image_size=cfg.model.image_size,
                approx_prefilter=cfg.model.nms.approx_prefilter)
            return det.scores.sum()

    stages = [("backbone", backbone_fn), ("model", model_fn),
              ("full", full_fn)]
    # staged bf16 to halve the HBM footprint of the [K, B, H, W, 3] input
    # block; cast back to f32 inside the timing loop
    stacked = jax.jit(lambda k: jax.random.uniform(
        k, (args.iters, args.batch, size, size, 3), jnp.bfloat16,
        maxval=255.0))(jax.random.PRNGKey(0))

    rows = []
    for name, fn in stages:
        compiled = jax.jit(fn).lower(
            variables, jnp.zeros((args.batch, size, size, 3))).compile()
        flops, nbytes = _cost(compiled)
        t = _time_fn(fn, variables, stacked, args.passes)
        rows.append({"stage": name, "ms": t * 1e3, "flops": flops,
                     "bytes": nbytes})

    if args.profile:
        jitted = jax.jit(full_fn)
        batches = [stacked[i].astype(jnp.float32) for i in range(3)]
        _ = np.asarray(jitted(variables, batches[0]))
        with jax.profiler.trace(args.profile):
            out = [jitted(variables, b) for b in batches]
            _ = np.asarray(out[-1])
        print(f"trace written to {args.profile}", file=sys.stderr)

    # --- report: per-stage deltas + speed-of-light references -------------
    print(f"platform: {jax.devices()[0].platform}   preset: "
          f"{cfg.model.name}  batch {args.batch} @ {size}px  "
          f"(best of {args.passes} passes x {args.iters} queued)")
    print(f"{'stage':<14}{'ms':>8}{'Δms':>8}{'TF':>8}{'MFU%':>7}"
          f"{'GB':>7}{'BW-floor ms':>12}")
    prev_ms = prev_fl = prev_by = 0.0
    for r in rows:
        d_ms = r["ms"] - prev_ms
        d_fl = r["flops"] - prev_fl
        d_by = r["bytes"] - prev_by
        mfu = d_fl / (d_ms / 1e3) / V5E_BF16_PEAK * 100 if d_ms > 0 else 0
        bw_ms = d_by / V5E_HBM_BW * 1e3
        print(f"{r['stage']:<14}{r['ms']:>8.2f}{d_ms:>8.2f}"
              f"{d_fl / 1e12:>8.2f}{mfu:>7.1f}{d_by / 2**30:>7.2f}"
              f"{bw_ms:>12.2f}")
        prev_ms, prev_fl, prev_by = r["ms"], r["flops"], r["bytes"]
    full = rows[-1]
    print(json.dumps({
        "preset": cfg.model.name, "batch": args.batch, "image_size": size,
        "backbone_quant": args.backbone_quant,
        "images_per_sec_per_chip": round(args.batch / (full["ms"] / 1e3), 2),
        "full_ms": round(full["ms"], 2),
        "full_tf": round(full["flops"] / 1e12, 3),
        "mfu_pct": round(full["flops"] / (full["ms"] / 1e3)
                         / V5E_BF16_PEAK * 100, 1),
        "bw_floor_ms": round(full["bytes"] / V5E_HBM_BW * 1e3, 2),
    }))


if __name__ == "__main__":
    main()
