"""End-to-end CLI-surface smoke: train -> export --container --quant int8
-> reload via serving.load_container -> detect.

The container/int8 plumbing in cli/export.py was otherwise exercised only
at the library level (tests/test_export.py, tests/test_quant.py); this
drives the actual user-facing command path, with the round-4
--backbone-stages/--backbone-widths capacity overrides keeping it CI-sized.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest


@pytest.mark.slow
def test_train_then_container_export_cli(tmp_path, monkeypatch):
    from x_detector_tpu import serving
    from x_detector_tpu.cli import export as export_cli
    from x_detector_tpu.cli import train as train_cli

    model_dir = str(tmp_path / "model")
    common = [
        "--preset", "ssd_resnet50", "--image-size", "64",
        "--backbone-stages", "1,1,1,1", "--backbone-widths", "16,32,48,64",
        "--model-dir", model_dir, "--dtype", "float32",
    ]
    train_cli.main(common + ["--steps", "3", "--batch-size", "2",
                             "--checkpoint-every", "3", "--log-every", "1"])

    out = str(tmp_path / "container")
    export_cli.main(common + ["--output", out, "--container",
                              "--batches", "1,2", "--quant", "int8",
                              "--calib-batches", "2"])

    cont = serving.load_container(out)
    assert cont.buckets == [1, 2]
    assert cont.meta["quant"] == "int8"
    images = np.asarray(jax.random.uniform(
        jax.random.PRNGKey(0), (2, 64, 64, 3), jnp.float32, maxval=255.0))
    boxes, scores, classes, valid = map(np.asarray, cont.detect(images))
    assert boxes.shape[0] == 2 and np.isfinite(boxes).all()
    # bucket routing: the batch-1 graph agrees with the batch-2 graph on
    # the same image (everything downstream of the backbone is per-image)
    b1 = np.asarray(cont.detect(images[:1])[0])
    np.testing.assert_allclose(b1, boxes[:1], atol=1e-4)

    # predict --artifact: the raw-RGB container drives the demo CLI with
    # no checkpoint/model code (round-4 serving-consumer path)
    from PIL import Image

    from x_detector_tpu.cli import predict as predict_cli

    raw_out = str(tmp_path / "container_raw")
    export_cli.main(common + ["--output", raw_out, "--container",
                              "--raw-rgb", "--batches", "1"])
    png = str(tmp_path / "in.png")
    Image.fromarray(
        np.random.default_rng(0).integers(0, 255, (90, 70, 3), np.uint8),
        "RGB").save(png)
    vis = str(tmp_path / "out.png")
    predict_cli.main(["--artifact", raw_out, "--input", png,
                      "--output", vis, "--score-threshold", "0.0"])
    assert Image.open(vis).size == (70, 90)


def test_container_int8_export_cli_quick(tmp_path):
    """QUICK-tier cover for the int8-container CLI path (round-4 escape:
    the final commit shadowed the bucket list with the calibration
    generator and shipped zero-graph containers; every covering test was
    slow-marked so the quick tier stayed green).  No training — random
    init export exercises the same parse/calibrate/export/save path in
    ~20s on tiny shapes."""
    from flax import serialization

    from x_detector_tpu import serving
    from x_detector_tpu.cli import export as export_cli

    out = str(tmp_path / "container")
    export_cli.main([
        "--preset", "ssd_resnet50", "--image-size", "64",
        "--backbone-stages", "1,1,1,1", "--backbone-widths", "16,32,48,64",
        "--model-dir", str(tmp_path / "nockpt"), "--dtype", "float32",
        "--output", out, "--container", "--batches", "1,2",
        "--quant", "int8", "--calib-batches", "1", "--calib-batch-size", "2",
    ])

    cont = serving.load_container(out)
    assert cont.buckets == [1, 2], "container must hold every --batches bucket"
    assert cont.meta["quant"] == "int8"

    # the stored pytree must carry REAL int8 kernels (quant.prequantize),
    # not fp32 the graphs would re-quantize on every call
    with open(f"{out}/weights.msgpack", "rb") as f:
        tree = serialization.msgpack_restore(f.read())
    int8_leaves = [a for a in jax.tree_util.tree_leaves(tree)
                   if hasattr(a, "dtype") and a.dtype == np.int8]
    assert int8_leaves, "prequantized container must store int8 kernels"

    images = np.asarray(jax.random.uniform(
        jax.random.PRNGKey(0), (2, 64, 64, 3), jnp.float32, maxval=255.0))
    boxes, _, _, _ = map(np.asarray, cont.detect(images))
    assert boxes.shape[0] == 2 and np.isfinite(boxes).all()


def test_save_container_rejects_empty_graphs(tmp_path):
    """A container with no graphs must fail at write time (serving.py
    guard), not at the consumer's first detect()."""
    from x_detector_tpu import serving

    with pytest.raises(ValueError, match="no graphs"):
        serving.save_container(str(tmp_path / "c"), {"params": {}}, {},
                               meta={})


def test_export_bake_batches_requires_container():
    """--bake-batches without --container is a config no-op the CLI must
    reject (advisor r4), mirroring the missing-bucket fail-fast."""
    from x_detector_tpu.cli import export as export_cli

    with pytest.raises(SystemExit):
        export_cli.main(["--preset", "ssd_resnet50", "--model-dir",
                         "/dev/null", "--output", "/dev/null",
                         "--bake-batches", "1"])


def test_export_bake_bucket_must_be_in_batches():
    """An explicit --bake-batches bucket missing from --batches must fail
    fast (argparse error) rather than be silently dropped — the same
    no-silent-config-fallback contract as fast-NMS."""
    from x_detector_tpu.cli import export as export_cli

    with pytest.raises(SystemExit):
        export_cli.main(["--preset", "ssd_resnet50", "--model-dir", "/dev/null",
                         "--output", "/dev/null", "--container",
                         "--batches", "1,2", "--bake-batches", "4"])
