"""Full real-data pipeline rehearsal on generated VOC (no network needed).

Round-3 readiness drill for the standing real-Pascal-VOC order
(docs/ROADMAP.md item 1): exercises every CLI surface a real-VOC user
touches, end to end, against a generated VOCdevkit tree —

  VOCdevkit -> convert_voc -> train (native loader, checkpoints, periodic
  eval) -> kill -> resume -> evaluate -> predict on a JPEG -> export
  (letterbox raw-RGB artifact) -> reload artifact and run it.

Exits non-zero on the first broken stage.  Intended to run on CPU:

  JAX_PLATFORMS=cpu PALLAS_AXON_POOL_IPS= PYTHONPATH=.:tests \
      python tools/rehearse_voc_pipeline.py [--workdir DIR]
"""
import argparse
import glob
import os
import subprocess
import sys
import tempfile

REPO = os.path.abspath(os.path.join(os.path.dirname(__file__), os.pardir))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tests"))


def run(desc, argv):
    print(f"--- {desc}: {' '.join(argv)}", flush=True)
    env = dict(os.environ, PYTHONPATH=REPO)
    proc = subprocess.run([sys.executable, "-m"] + argv, cwd=REPO, env=env,
                          capture_output=True, text=True)
    tail = "\n".join((proc.stdout + proc.stderr).strip().splitlines()[-4:])
    print(tail, flush=True)
    if proc.returncode != 0:
        print(f"FAILED at stage: {desc}", flush=True)
        sys.exit(1)
    return proc.stdout


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--workdir", default=None)
    p.add_argument("--images", type=int, default=12)
    p.add_argument("--steps", type=int, default=6)
    args = p.parse_args()
    work = args.workdir or tempfile.mkdtemp(prefix="voc_rehearsal_")
    os.makedirs(work, exist_ok=True)

    from test_voc_io import make_fake_voc
    ids, meta = make_fake_voc(os.path.join(work, "VOCdevkit"),
                              n_images=args.images)
    print(f"generated VOCdevkit with {len(ids)} images -> {work}")

    rec = os.path.join(work, "records")
    run("convert", ["x_detector_tpu.cli.convert_voc",
                    "--voc-root", os.path.join(work, "VOCdevkit"),
                    "--splits", "2007:trainval", "--output-dir", rec])
    assert glob.glob(f"{rec}/*.tfrecord"), "no records written"

    model_dir = os.path.join(work, "model")
    common = ["--preset", "ssd_resnet50", "--image-size", "64",
              "--batch-size", "2", "--data-dir", rec,
              "--model-dir", model_dir]
    run("train", ["x_detector_tpu.cli.train", *common,
                  "--steps", str(args.steps), "--checkpoint-every", "2",
                  "--log-every", "2", "--eval-every", str(args.steps),
                  "--eval-batches", "2"])
    run("resume", ["x_detector_tpu.cli.train", *common,
                   "--steps", str(args.steps + 2), "--checkpoint-every", "2",
                   "--log-every", "2", "--resume"])
    out = run("evaluate", ["x_detector_tpu.cli.evaluate", *common,
                           "--num-batches", "3"])
    assert "mAP:" in out

    jpg = glob.glob(os.path.join(work, "VOCdevkit", "VOC2007",
                                 "JPEGImages", "*.jpg"))[0]
    run("predict", ["x_detector_tpu.cli.predict", *common,
                    "--input", jpg,
                    "--output", os.path.join(work, "pred.png"),
                    "--score-threshold", "0.0"])

    artifact = os.path.join(work, "det.stablehlo")
    run("export", ["x_detector_tpu.cli.export", *common,
                   "--output", artifact, "--batch", "1", "--raw-rgb",
                   "--letterbox"])

    # reload the artifact with zero framework code and run it
    import numpy as np
    import jax
    from jax import export as jexport
    fn = jexport.deserialize(open(artifact, "rb").read())
    img = np.zeros((1, 64, 64, 3), np.float32)
    scale = np.ones((1, 2), np.float32)
    boxes, scores, classes, valid = fn.call(img, scale)
    assert boxes.shape[0] == 1 and boxes.shape[2] == 4
    print(f"artifact reload OK: boxes {boxes.shape}")
    print(f"REHEARSAL PASSED ({work})")


if __name__ == "__main__":
    main()
