"""VOC converter/reader round-trip on a generated fake VOCdevkit."""

import os

import numpy as np
import pytest

from x_detector_tpu.data import voc as voc_lib


def make_fake_voc(root, year="2007", n_images=6, split="trainval"):
    from PIL import Image
    base = os.path.join(root, f"VOC{year}")
    for d in ("Annotations", "JPEGImages", os.path.join("ImageSets", "Main")):
        os.makedirs(os.path.join(base, d), exist_ok=True)
    rng = np.random.default_rng(0)
    ids = []
    meta = {}
    for i in range(n_images):
        image_id = f"{i:06d}"
        ids.append(image_id)
        w, h = int(rng.integers(60, 120)), int(rng.integers(60, 120))
        img = rng.integers(0, 255, (h, w, 3), dtype=np.uint8)
        Image.fromarray(img).save(
            os.path.join(base, "JPEGImages", f"{image_id}.jpg"))
        n_obj = int(rng.integers(1, 4))
        objs = []
        for _ in range(n_obj):
            x0 = int(rng.integers(1, w // 2))
            y0 = int(rng.integers(1, h // 2))
            x1 = int(rng.integers(x0 + 5, w))
            y1 = int(rng.integers(y0 + 5, h))
            cls = ["dog", "cat", "person", "car"][int(rng.integers(0, 4))]
            diff = int(rng.integers(0, 2))
            objs.append((cls, x0, y0, x1, y1, diff))
        meta[image_id] = (w, h, objs)
        obj_xml = "".join(
            f"<object><name>{c}</name><difficult>{d}</difficult>"
            f"<bndbox><xmin>{x0}</xmin><ymin>{y0}</ymin>"
            f"<xmax>{x1}</xmax><ymax>{y1}</ymax></bndbox></object>"
            for c, x0, y0, x1, y1, d in objs)
        xml = (f"<annotation><filename>{image_id}.jpg</filename>"
               f"<size><width>{w}</width><height>{h}</height>"
               f"<depth>3</depth></size>{obj_xml}</annotation>")
        with open(os.path.join(base, "Annotations", f"{image_id}.xml"),
                  "w") as f:
            f.write(xml)
    with open(os.path.join(base, "ImageSets", "Main", f"{split}.txt"),
              "w") as f:
        f.write("\n".join(ids) + "\n")
    return ids, meta


def test_parse_annotation(tmp_path):
    ids, meta = make_fake_voc(str(tmp_path), n_images=2)
    p = voc_lib.example_paths(str(tmp_path), "2007", ids[0])
    ann = voc_lib.parse_annotation(p["annotation"])
    w, h, objs = meta[ids[0]]
    assert ann["width"] == w and ann["height"] == h
    assert len(ann["boxes"]) == len(objs)
    # normalized, 1-based correction
    c, x0, y0, x1, y1, d = objs[0]
    np.testing.assert_allclose(
        ann["boxes"][0],
        [(y0 - 1) / h, (x0 - 1) / w, (y1 - 1) / h, (x1 - 1) / w], atol=1e-6)
    assert ann["labels"][0] == voc_lib.VOC_LABEL_MAP[c]
    assert ann["difficult"][0] == bool(d)


def test_list_split(tmp_path):
    ids, _ = make_fake_voc(str(tmp_path), n_images=4)
    got = voc_lib.list_split(str(tmp_path), "2007", "trainval")
    assert got == ids


def test_tfrecord_roundtrip(tmp_path):
    tf = pytest.importorskip("tensorflow")
    from x_detector_tpu.data import tfrecord as tfr

    ids, meta = make_fake_voc(str(tmp_path), n_images=6)
    out = str(tmp_path / "records")
    paths = tfr.convert_voc_to_tfrecords(
        str(tmp_path), [("2007", "trainval")], out, shard_size=4)
    assert len(paths) == 2  # 6 images, shard size 4

    ds = tfr.make_dataset(paths, canvas_size=64, max_gt=10, batch_size=2,
                          shuffle=False, repeat=False)
    batches = list(tfr.as_numpy_iterator(ds))
    total = sum(b["image"].shape[0] for b in batches)
    assert total == 6
    b0 = batches[0]
    assert b0["image"].shape == (2, 64, 64, 3)
    assert b0["gt_boxes"].shape == (2, 10, 4)
    assert b0["gt_mask"].dtype == bool
    # first image boxes match the annotation
    w, h, objs = meta[ids[0]]
    n0 = int(b0["gt_mask"][0].sum())
    assert n0 == len(objs)
    np.testing.assert_allclose(
        b0["gt_boxes"][0][0],
        [(objs[0][2] - 1) / h, (objs[0][1] - 1) / w,
         (objs[0][4] - 1) / h, (objs[0][3] - 1) / w], atol=1e-5)
    assert b0["image_id"][0].decode() == ids[0]
