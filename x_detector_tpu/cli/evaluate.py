"""Evaluation CLI — the rebuild of the reference's *_eval.py scripts (T3).

Restores a checkpoint, runs the detector over the eval split (TFRecords or
synthetic), and reports VOC07 mAP (11-point by default).

Example:
  python -m x_detector_tpu.cli.evaluate --preset ssd_resnet50 \
      --model-dir /tmp/ssd --num-batches 50
"""

from __future__ import annotations

import argparse

import jax
import jax.numpy as jnp
import numpy as np

from x_detector_tpu.cli import common
from x_detector_tpu.data.augment import preprocess_for_eval
from x_detector_tpu.models.detector import postprocess_detections
from x_detector_tpu.models.lighthead import lighthead_postprocess
from x_detector_tpu.models.ssd import build_ssd_anchors
from x_detector_tpu.train.checkpoint import CheckpointManager
from x_detector_tpu.train.trainer import create_model_and_state
from x_detector_tpu.utils.metrics_voc import VOCEvaluator


def build_eval_fn(model, cfg, mesh=None):
    """jitted images -> (boxes, scores, classes, valid).

    With ``mesh`` (a 1-D data mesh from ``parallel.mesh.make_mesh``), the
    batch axis is sharded over the mesh's devices and parameters are
    replicated — data-parallel inference.  Detection is per-image after the
    backbone, so XLA partitions the whole pipeline without collectives;
    the batch size must be divisible by the mesh size.
    """
    if cfg.model.family == "ssd":
        anchors = jnp.asarray(build_ssd_anchors(cfg.model))

        def fn(variables, images):
            cls, loc = model.apply(variables, images, train=False)
            det = postprocess_detections(
                loc, cls, anchors, max_output=cfg.model.nms.max_output,
                iou_threshold=cfg.model.nms.iou_threshold,
                score_threshold=cfg.model.nms.score_threshold,
                fast_mode=cfg.model.nms.fast_mode,
                ssd_anchor_cfg=cfg.model.ssd_anchors,
                image_size=cfg.model.image_size,
                approx_prefilter=cfg.model.nms.approx_prefilter)
            return det.boxes, det.scores, det.classes, det.valid
    else:
        def fn(variables, images):
            out = model.apply(variables, images, train=False)
            det = lighthead_postprocess(out, cfg.model)
            return det.boxes, det.scores, det.classes, det.valid
    if mesh is None:
        return jax.jit(fn)
    from x_detector_tpu.parallel import mesh as mesh_lib
    shard = mesh_lib.batch_sharded(mesh)
    return jax.jit(fn, in_shardings=(mesh_lib.replicated(mesh), shard),
                   out_shardings=shard)


def run_eval(model, variables, cfg, batch_iter, num_batches: int,
             eval_fn=None, use_07_metric: bool = True, mesh=None) -> dict:
    """Evaluate mAP over up to ``num_batches`` from ``batch_iter``.

    Reusable core shared by the eval CLI and the train loop's periodic
    evaluation.  Returns the VOCEvaluator result dict.  With ``mesh``,
    batches are sharded over the mesh and inference runs data-parallel
    (see :func:`build_eval_fn`).
    """
    if eval_fn is None:
        eval_fn = build_eval_fn(model, cfg, mesh)
    if mesh is not None:
        from x_detector_tpu.parallel import mesh as mesh_lib
        variables = mesh_lib.replicate_state(mesh, variables)
    preprocess = jax.jit(jax.vmap(
        lambda im: preprocess_for_eval(im, cfg.data)))
    ev = VOCEvaluator(num_classes=cfg.model.num_classes - 1,
                      use_07_metric=use_07_metric)
    for bi in range(num_batches):
        try:
            raw = next(batch_iter)
        except StopIteration:
            break
        images = jnp.asarray(raw["image"])
        n_real = images.shape[0]
        if mesh is not None:
            # the data source's final batch may be partial (eval does not
            # drop remainders); zero-pad it up to a mesh multiple and
            # discard the padded rows' detections below
            n_dev = mesh.devices.size
            if n_real % n_dev:
                pad = n_dev - n_real % n_dev
                images = jnp.concatenate(
                    [images, jnp.zeros((pad,) + images.shape[1:],
                                       images.dtype)])
            images = mesh_lib.shard_batch(mesh, images)
        images = preprocess(images)
        boxes, scores, classes, valid = map(
            np.asarray, eval_fn(variables, images))
        for i in range(n_real):
            if "image_id" in raw:
                iid = raw["image_id"][i]
                image_id = iid.decode() if isinstance(iid, bytes) else str(iid)
            else:
                image_id = f"b{bi}_i{i}"
            m = np.asarray(raw["gt_mask"][i])
            diff = (np.asarray(raw["difficult"][i])[m]
                    if "difficult" in raw else None)
            ev.add_ground_truth(image_id, np.asarray(raw["gt_boxes"][i])[m],
                                np.asarray(raw["gt_labels"][i])[m], diff)
            v = valid[i]
            ev.add_detections(image_id, boxes[i][v], scores[i][v],
                              classes[i][v])
    return ev.evaluate()


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    common.add_common_args(p)
    p.add_argument("--num-batches", type=int, default=50,
                   help="eval batches (synthetic) / cap (tfrecord)")
    p.add_argument("--use-07-metric", default=True,
                   action=argparse.BooleanOptionalAction,
                   help="11-point VOC07 AP (--no-use-07-metric selects continuous AP)")
    p.add_argument("--dtype", default="bfloat16",
                   choices=("bfloat16", "float32"))
    p.add_argument("--num-devices", type=int, default=0,
                   help="data-parallel eval over an N-device mesh "
                        "(0 = single device); batch size must divide by N")
    args = p.parse_args(argv)

    cfg = common.resolve_config(args)
    dtype = jnp.bfloat16 if args.dtype == "bfloat16" else jnp.float32
    model, state = create_model_and_state(cfg, jax.random.PRNGKey(args.seed),
                                          dtype=dtype)
    ckpt = CheckpointManager(f"{args.model_dir}/ckpt")
    if ckpt.latest_step() is not None:
        state, _ = ckpt.restore(state)
        print(f"restored checkpoint at step {int(state.step)}")
    else:
        print("WARNING: no checkpoint found, evaluating random init")
    ckpt.close()
    variables = common.eval_variables(state, args.use_ema)
    if variables["params"] is state.ema_params:
        print("evaluating EMA shadow weights")

    mesh = None
    if args.num_devices and args.num_devices > 1:
        from x_detector_tpu.parallel import mesh as mesh_lib
        mesh = mesh_lib.make_mesh(args.num_devices)

    it = common.batch_iterator(args, cfg, training=False)
    res = run_eval(model, variables, cfg, it, args.num_batches,
                   use_07_metric=args.use_07_metric, mesh=mesh)
    print(f"mAP: {res['mAP']:.4f}")
    for cls, ap in sorted(res["per_class_ap"].items()):
        print(f"  class {cls:2d}: AP {ap:.4f}")
    return res


if __name__ == "__main__":
    main()
