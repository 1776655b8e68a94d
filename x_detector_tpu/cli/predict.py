"""Demo/predict CLI — single image in, annotated image out (T4, §3.3).

Example:
  python -m x_detector_tpu.cli.predict --preset lighthead_xception \
      --model-dir /tmp/lh --input dog.jpg --output out.png

With ``--artifact DIR`` the detections come from an exported shared-weights
serving container (cli/export.py --container --raw-rgb) instead of a live
checkpoint: the container is self-describing (input size, letterbox
geometry, quantization all in meta.json), so no preset/model code runs —
the same promise the serving module makes, demonstrated end to end:

  python -m x_detector_tpu.cli.predict --artifact /tmp/container \
      --input dog.jpg --output out.png
"""

from __future__ import annotations

import argparse

import jax
import jax.numpy as jnp
import numpy as np

from x_detector_tpu.cli import common
from x_detector_tpu.cli.evaluate import build_eval_fn
from x_detector_tpu.data.augment import preprocess_for_eval
from x_detector_tpu.train.checkpoint import CheckpointManager
from x_detector_tpu.train.trainer import create_model_and_state
from x_detector_tpu.utils.draw import draw_detections


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    common.add_common_args(p)
    p.add_argument("--input", required=True, help="input image (jpg/png)")
    p.add_argument("--output", default="detections.png")
    p.add_argument("--score-threshold", type=float, default=0.3)
    p.add_argument("--dtype", default="bfloat16",
                   choices=("bfloat16", "float32"))
    p.add_argument("--artifact", default=None,
                   help="serving-container directory (export --container "
                        "--raw-rgb); detects from the artifact instead of "
                        "a checkpoint — no model code, preset ignored")
    args = p.parse_args(argv)

    from PIL import Image
    pil = Image.open(args.input).convert("RGB")
    img = np.asarray(pil, np.float32)

    if args.artifact:
        boxes, scores, classes, valid = _detect_from_artifact(
            args.artifact, pil)
        _emit(args, img, boxes, scores, classes, valid)
        return

    cfg = common.resolve_config(args)
    box_scale = np.array([1.0, 1.0], np.float32)
    if cfg.data.letterbox:
        # aspect-preserving placement; detections are unscaled for drawing
        size = cfg.model.image_size
        h0, w0 = img.shape[:2]
        s = size / max(h0, w0)
        # half-up rounding + bilinear: identical placement/pixels to the
        # data pipelines (native loader / tf.data)
        h1, w1 = max(1, int(h0 * s + 0.5)), max(1, int(w0 * s + 0.5))
        resized = np.asarray(pil.resize((w1, h1), Image.BILINEAR), np.float32)
        canvas = np.zeros((size, size, 3), np.float32)
        canvas[:h1, :w1] = resized
        img_for_model = canvas
        box_scale = np.array([h1 / size, w1 / size], np.float32)
    else:
        img_for_model = img
    dtype = jnp.bfloat16 if args.dtype == "bfloat16" else jnp.float32
    model, state = create_model_and_state(cfg, jax.random.PRNGKey(args.seed),
                                          dtype=dtype)
    ckpt = CheckpointManager(f"{args.model_dir}/ckpt")
    if ckpt.latest_step() is not None:
        state, _ = ckpt.restore(state)
    else:
        print("WARNING: no checkpoint found, predicting with random init")
    ckpt.close()
    variables = common.eval_variables(state, args.use_ema)

    eval_fn = build_eval_fn(model, cfg)
    inp = preprocess_for_eval(jnp.asarray(img_for_model), cfg.data)[None]
    boxes, scores, classes, valid = map(
        np.asarray, eval_fn(variables, inp))
    # back to original-image normalized coords (no-op unless letterbox)
    boxes = np.clip(boxes / np.array([box_scale[0], box_scale[1],
                                      box_scale[0], box_scale[1]]), 0, 1)

    _emit(args, img, boxes, scores, classes, valid)


def _emit(args, img, boxes, scores, classes, valid):
    """Print and draw row 0's detections (shared by both detect paths)."""
    keep = valid[0] & (scores[0] >= args.score_threshold)
    print(f"{int(keep.sum())} detections >= {args.score_threshold}")
    for b, s, c in zip(boxes[0][keep], scores[0][keep], classes[0][keep]):
        print(f"  class {int(c):2d} score {s:.3f} box {np.round(b, 3)}")

    vis = draw_detections(img, boxes[0], scores[0], classes[0], valid[0],
                          score_threshold=args.score_threshold)
    from PIL import Image as _I
    _I.fromarray(vis).save(args.output)
    print(f"wrote {args.output}")


def _detect_from_artifact(directory: str, pil):
    """Detections for one PIL image from a raw-RGB serving container.

    The container's meta.json fully describes the input contract
    (image_size, letterbox, buckets), so this path touches no model code
    or config preset — it is exactly what a serving process would run.
    """
    from x_detector_tpu import serving

    cont = serving.load_container(directory)
    size = int(cont.meta["image_size"])
    if not cont.meta.get("raw_rgb"):
        raise SystemExit(
            "--artifact needs a container exported with --raw-rgb (inputs "
            "are raw [0,255] RGB, preprocessing baked in); this container "
            "expects pre-whitened inputs — re-export with --raw-rgb, or "
            "use --model-dir for the live-checkpoint path")
    img = np.asarray(pil, np.float32)
    if cont.meta.get("letterbox"):
        canvas, scale, n = serving.bucketed_letterbox_batch(
            [img], size, cont.buckets)
        out = cont.detect(canvas, scale)   # boxes already unscaled in-graph
    else:
        from PIL import Image
        resized = np.asarray(pil.resize((size, size), Image.BILINEAR),
                             np.float32)
        b = serving.pick_bucket(1, cont.buckets)
        batch = np.zeros((b, size, size, 3), np.float32)
        batch[0] = resized
        out = cont.detect(batch)
    return map(np.asarray, out)


if __name__ == "__main__":
    main()
