"""Shared CLI plumbing: preset resolution, data sources, model build."""

from __future__ import annotations

import argparse
import dataclasses
from typing import Dict, Iterator, Optional

import numpy as np

from x_detector_tpu.config import PRESETS, ExperimentConfig


def add_common_args(p: argparse.ArgumentParser) -> None:
    p.add_argument("--preset", default="lighthead_resnet50",
                   choices=sorted(PRESETS), help="experiment preset")
    p.add_argument("--image-size", type=int, default=None,
                   help="override the preset input size")
    p.add_argument("--batch-size", type=int, default=None)
    p.add_argument("--data-dir", default=None,
                   help="directory of VOC TFRecord shards (default: "
                        "synthetic data)")
    p.add_argument("--model-dir", default="/tmp/xdet_model",
                   help="checkpoint/metrics directory")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--letterbox", default=None,
                   action=argparse.BooleanOptionalAction,
                   help="aspect-preserving canvas placement (default: the "
                        "preset's choice — on for lighthead presets; "
                        "--no-letterbox forces square squash)")
    p.add_argument("--use-ema", default=None,
                   action=argparse.BooleanOptionalAction,
                   help="evaluate/serve the EMA shadow weights (default: "
                        "auto — use EMA whenever the checkpoint carries one; "
                        "--no-use-ema forces the raw params)")
    p.add_argument("--backbone-stages", default=None,
                   help="comma list overriding backbone depth (ResNet stage "
                        "sizes / Xception units per stage), e.g. 1,1,1,1 — "
                        "capacity sweeps and CI-sized smoke runs")
    p.add_argument("--backbone-widths", default=None,
                   help="comma list overriding backbone channel widths, "
                        "e.g. 16,32,48,64")
    p.add_argument("--grad-accum", type=int, default=None,
                   help="split each train batch into N sequential "
                        "microbatches with one optimizer update (DP-"
                        "equivalent numerics at ~1/N activation memory); "
                        "batch size must be divisible by N")


def eval_variables(state, use_ema=None):
    """Model variables for eval/export/predict.

    ``use_ema=None`` (auto) prefers the EMA shadow whenever the state carries
    one — the reference's T5 EMA semantics, where the averaged weights are
    the ones served.  ``True`` requires a shadow; ``False`` forces raw params.
    """
    if use_ema is None:
        use_ema = state.ema_params is not None
    if use_ema:
        assert state.ema_params is not None, (
            "--use-ema requested but the checkpoint carries no EMA shadow "
            "(train with ema_decay > 0)")
        params = state.ema_params
    else:
        params = state.params
    return {"params": params, "batch_stats": state.batch_stats}


def resolve_config(args) -> ExperimentConfig:
    cfg = PRESETS[args.preset](
        image_size=args.image_size) if args.image_size else \
        PRESETS[args.preset]()
    tcfg = {}
    if args.batch_size:
        tcfg["batch_size"] = args.batch_size
    if getattr(args, "grad_accum", None):
        tcfg["grad_accum_steps"] = args.grad_accum
    if tcfg:
        cfg = dataclasses.replace(
            cfg, train=dataclasses.replace(cfg.train, **tcfg))
    if getattr(args, "letterbox", None) is not None:
        cfg = dataclasses.replace(
            cfg, data=dataclasses.replace(cfg.data,
                                          letterbox=args.letterbox))
    mcfg = {}
    if getattr(args, "backbone_stages", None):
        mcfg["backbone_stages"] = tuple(
            int(v) for v in args.backbone_stages.split(","))
    if getattr(args, "backbone_widths", None):
        mcfg["backbone_widths"] = tuple(
            int(v) for v in args.backbone_widths.split(","))
    if mcfg:
        cfg = dataclasses.replace(
            cfg, model=dataclasses.replace(cfg.model, **mcfg))
    return cfg


def batch_iterator(args, cfg: ExperimentConfig, training: bool,
                   canvas_size: Optional[int] = None,
                   start_batch: int = 0
                   ) -> Iterator[Dict[str, np.ndarray]]:
    """TFRecord batches if --data-dir given, else synthetic batches.

    For TFRecord data the native C++ loader (data/native_loader.py) is
    preferred — threaded decode with no TF dependency; the tf.data reader
    is the fallback when the shared library cannot be built.

    ``start_batch`` resumes a deterministic stream at that batch position:
    O(1) for the native loader (position-addressable index) and synthetic
    data; the tf.data fallback replays (decode-and-drop) the skipped
    batches, which is correct but slow — documented cost of the fallback.
    """
    canvas = canvas_size or cfg.model.image_size
    if args.data_dir:
        import glob
        shards = sorted(glob.glob(f"{args.data_dir}/*.tfrecord"))
        assert shards, f"no .tfrecord shards under {args.data_dir}"

        from x_detector_tpu.data.native_loader import (NativeLoader,
                                                       native_available)
        if getattr(args, "use_native_loader", True) and \
                native_available(build_if_missing=True):
            return NativeLoader(shards, canvas_size=canvas,
                                max_gt=cfg.data.max_gt_boxes,
                                batch_size=cfg.train.batch_size,
                                shuffle=training, seed=args.seed,
                                repeat=training,
                                letterbox=cfg.data.letterbox,
                                start_example=start_batch
                                * cfg.train.batch_size)

        from x_detector_tpu.data import tfrecord as tfr
        ds = tfr.make_dataset(shards, canvas_size=canvas,
                              max_gt=cfg.data.max_gt_boxes,
                              batch_size=cfg.train.batch_size,
                              shuffle=training, seed=args.seed,
                              repeat=training,
                              letterbox=cfg.data.letterbox)
        if start_batch:
            ds = ds.skip(start_batch)
        return tfr.as_numpy_iterator(ds)
    from x_detector_tpu.data.synthetic import synthetic_batches
    it = synthetic_batches(args.seed, cfg.train.batch_size, canvas,
                           cfg.data.max_gt_boxes)
    for _ in range(start_batch):  # synthetic generator: cheap skip
        next(it)
    return it
