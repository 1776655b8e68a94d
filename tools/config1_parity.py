"""BASELINE config 1 parity harness: Light-Head R-CNN ResNet-50, one 800px
image, CPU inference — dump per-image (boxes, scores, classes) to JSON.

The judged surface (BASELINE.json config 1) is output fidelity of this exact
path.  The reference checkpoint/outputs are not available in this
environment (empty reference mount, no egress — SURVEY.md provenance note),
so this harness establishes the *diffable artifact*: given any weights
(``--checkpoint``) and any image, it emits a canonical JSON record; when
reference outputs become available, ``--compare`` diffs against them.

Examples:
  python tools/config1_parity.py --image dog.jpg --out run.json
  python tools/config1_parity.py --image dog.jpg --compare reference.json
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), os.pardir))

os.environ.setdefault("JAX_PLATFORMS", "cpu")  # config 1 is a CPU surface


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--image", help="input image; synthetic if omitted")
    p.add_argument("--checkpoint-dir", default=None,
                   help="model dir with ckpt/ (random init if omitted)")
    p.add_argument("--out", default="config1_outputs.json")
    p.add_argument("--compare", default=None,
                   help="reference JSON to diff against")
    p.add_argument("--box-tol", type=float, default=0.01)
    p.add_argument("--score-tol", type=float, default=0.02)
    args = p.parse_args()

    import jax
    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import numpy as np

    from x_detector_tpu.config import lighthead_resnet50
    from x_detector_tpu.data.augment import preprocess_for_eval
    from x_detector_tpu.models.lighthead import lighthead_postprocess
    from x_detector_tpu.train.checkpoint import CheckpointManager
    from x_detector_tpu.train.trainer import create_model_and_state

    cfg = lighthead_resnet50(image_size=800)
    model, state = create_model_and_state(cfg, jax.random.PRNGKey(0),
                                          dtype=jnp.float32)
    if args.checkpoint_dir:
        mgr = CheckpointManager(os.path.join(args.checkpoint_dir, "ckpt"))
        state, _ = mgr.restore(state)
        mgr.close()
        print(f"restored step {int(state.step)}", file=sys.stderr)
    variables = {"params": state.params, "batch_stats": state.batch_stats}

    if args.image:
        from PIL import Image
        img = np.asarray(Image.open(args.image).convert("RGB"), np.float32)
    else:
        rng = np.random.default_rng(0)
        img = rng.uniform(0, 255, (600, 800, 3)).astype(np.float32)

    inp = preprocess_for_eval(jnp.asarray(img), cfg.data)[None]
    out = model.apply(variables, inp, train=False)
    det = lighthead_postprocess(out, cfg.model)
    valid = np.asarray(det.valid[0])
    record = {
        "config": "lighthead_resnet50_800px_cpu",
        "image": args.image or "synthetic_seed0_600x800",
        "boxes": np.asarray(det.boxes[0])[valid].round(5).tolist(),
        "scores": np.asarray(det.scores[0])[valid].round(5).tolist(),
        "classes": np.asarray(det.classes[0])[valid].tolist(),
    }
    with open(args.out, "w") as f:
        json.dump(record, f, indent=1)
    print(f"wrote {len(record['scores'])} detections -> {args.out}")

    if args.compare:
        with open(args.compare) as f:
            ref = json.load(f)
        ok = True
        if len(ref["scores"]) != len(record["scores"]):
            print(f"DETECTION COUNT MISMATCH: {len(record['scores'])} vs "
                  f"{len(ref['scores'])}")
            ok = False
        n = min(len(ref["scores"]), len(record["scores"]))
        for i in range(n):
            db = np.abs(np.asarray(record["boxes"][i]) -
                        np.asarray(ref["boxes"][i])).max()
            ds = abs(record["scores"][i] - ref["scores"][i])
            if (db > args.box_tol or ds > args.score_tol or
                    record["classes"][i] != ref["classes"][i]):
                print(f"det {i}: box_d={db:.4f} score_d={ds:.4f} "
                      f"cls {record['classes'][i]} vs {ref['classes'][i]}")
                ok = False
        print("PARITY OK" if ok else "PARITY FAILED")
        sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
