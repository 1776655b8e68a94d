"""Letterbox (aspect-preserving) canvas placement in both readers."""

import numpy as np
import pytest

from test_voc_io import make_fake_voc

pytest.importorskip("tensorflow")

from x_detector_tpu.data import tfrecord as tfr
from x_detector_tpu.data import voc as voc_lib
from x_detector_tpu.data.native_loader import NativeLoader, native_available

if not native_available(build_if_missing=True):
    pytest.skip("native loader unavailable", allow_module_level=True)

CANVAS = 64


@pytest.fixture(scope="module")
def records(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("voc_lb")
    ids, meta = make_fake_voc(str(tmp), n_images=5)
    paths = tfr.convert_voc_to_tfrecords(
        str(tmp), [("2007", "trainval")], str(tmp / "rec"), shard_size=5)
    return str(tmp), ids, meta, paths


def _expected_scale(w, h):
    s = CANVAS / max(h, w)
    h1, w1 = round(h * s), round(w * s)
    return h1 / CANVAS, w1 / CANVAS, h1, w1


def test_tfdata_letterbox_geometry(records):
    tmp, ids, meta, paths = records
    ds = tfr.make_dataset(paths, canvas_size=CANVAS, max_gt=10, batch_size=1,
                          shuffle=False, repeat=False, letterbox=True)
    for b in tfr.as_numpy_iterator(ds):
        image_id = b["image_id"][0].decode()
        w, h, objs = meta[image_id]
        fy, fx, h1, w1 = _expected_scale(w, h)
        np.testing.assert_allclose(b["box_scale"][0], [fy, fx], atol=1e-5)
        img = b["image"][0]
        # padding region is zero
        if h1 < CANVAS:
            assert np.abs(img[h1 + 1:, :, :]).max() == 0
        if w1 < CANVAS:
            assert np.abs(img[:, w1 + 1:, :]).max() == 0
        # content region is not all zero
        assert np.abs(img[:h1, :w1]).mean() > 1
        # gt boxes live inside the content region
        m = b["gt_mask"][0]
        boxes = b["gt_boxes"][0][m]
        assert (boxes[:, 2] <= fy + 1e-5).all()
        assert (boxes[:, 3] <= fx + 1e-5).all()
        # unscaling recovers the original normalized annotation
        ann = voc_lib.parse_annotation(
            voc_lib.example_paths(tmp, "2007", image_id)["annotation"])
        rec = boxes / np.array([fy, fx, fy, fx])
        np.testing.assert_allclose(rec, ann["boxes"][:len(rec)], atol=2e-2)


def test_native_letterbox_matches_tfdata(records):
    tmp, ids, meta, paths = records
    ds = tfr.make_dataset(paths, canvas_size=CANVAS, max_gt=10, batch_size=1,
                          shuffle=False, repeat=False, letterbox=True)
    ref = {b["image_id"][0].decode(): b for b in tfr.as_numpy_iterator(ds)}
    loader = NativeLoader(paths, canvas_size=CANVAS, max_gt=10, batch_size=1,
                          shuffle=False, repeat=False, num_threads=1,
                          letterbox=True)
    count = 0
    for b in loader:
        image_id = b["image_id"][0].decode()
        r = ref[image_id]
        np.testing.assert_allclose(b["box_scale"][0], r["box_scale"][0],
                                   atol=1e-2)
        np.testing.assert_allclose(b["gt_boxes"][0], r["gt_boxes"][0],
                                   atol=1e-2)
        diff = np.abs(b["image"][0] - r["image"][0]).mean()
        assert diff < 6.0, f"{image_id}: mean abs pixel diff {diff}"
        count += 1
    loader.close()
    assert count == len(ids)


def test_letterbox_square_image_is_identity_scale(records, tmp_path):
    # a square source image must give box_scale == 1 (full canvas)
    from PIL import Image
    import tensorflow as tf
    rng = np.random.default_rng(0)
    img = rng.integers(0, 255, (80, 80, 3), dtype=np.uint8)
    import io
    buf = io.BytesIO()
    Image.fromarray(img).save(buf, format="JPEG")
    ex = tfr._make_example(tf, buf.getvalue(), "sq", {
        "height": 80, "width": 80,
        "boxes": np.asarray([[0.1, 0.2, 0.5, 0.6]], np.float32),
        "labels": np.asarray([3], np.int64),
        "difficult": np.zeros(1, bool)})
    path = str(tmp_path / "sq.tfrecord")
    with tf.io.TFRecordWriter(path) as w:
        w.write(ex)
    loader = NativeLoader([path], canvas_size=CANVAS, max_gt=5, batch_size=1,
                          shuffle=False, repeat=False, num_threads=1,
                          letterbox=True)
    b = next(loader)
    loader.close()
    np.testing.assert_allclose(b["box_scale"][0], [1.0, 1.0], atol=1e-6)
    np.testing.assert_allclose(b["gt_boxes"][0][0], [0.1, 0.2, 0.5, 0.6],
                               atol=1e-6)
