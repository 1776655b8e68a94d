"""VOC ↔ TFRecord: offline converter + host-side reader.

Rebuilds SURVEY.md §2.1 D1/D2: sharded TFRecords of ``tf.train.Example`` with
encoded JPEG bytes, normalized corner boxes, labels and difficult flags under
the canonical ``image/…`` keys, plus a ``tf.data`` reader that decodes and
letterbox-resizes onto a fixed square canvas for the device-side pipeline.

TensorFlow (2.x, host/CPU only) is imported lazily so the rest of the
framework never depends on it (the environment ships TF 2.21 for IO only;
SURVEY.md §7 env facts).
"""

from __future__ import annotations

import os
from typing import Dict, Iterator, List, Sequence

import numpy as np

from x_detector_tpu.data import voc as voc_lib

_KEYS = {
    "encoded": "image/encoded",
    "ymin": "image/object/bbox/ymin",
    "xmin": "image/object/bbox/xmin",
    "ymax": "image/object/bbox/ymax",
    "xmax": "image/object/bbox/xmax",
    "label": "image/object/bbox/label",
    "difficult": "image/object/bbox/difficult",
    "image_id": "image/id",
    "height": "image/height",
    "width": "image/width",
}


def _tf():
    import tensorflow as tf  # local import: host-side IO only
    tf.config.set_visible_devices([], "GPU")
    return tf


def convert_voc_to_tfrecords(voc_root: str, years_splits: Sequence[tuple],
                             output_dir: str, shard_size: int = 500,
                             prefix: str = "voc") -> List[str]:
    """Offline conversion (SURVEY.md §3.4). Returns written shard paths."""
    tf = _tf()
    os.makedirs(output_dir, exist_ok=True)
    ids = []
    for year, split in years_splits:
        for image_id in voc_lib.list_split(voc_root, year, split):
            ids.append((year, image_id))
    paths: List[str] = []
    writer = None
    count_in_shard = 0
    for i, (year, image_id) in enumerate(ids):
        if writer is None or count_in_shard >= shard_size:
            if writer is not None:
                writer.close()
            shard_path = os.path.join(
                output_dir, f"{prefix}-{len(paths):05d}.tfrecord")
            paths.append(shard_path)
            writer = tf.io.TFRecordWriter(shard_path)
            count_in_shard = 0
        p = voc_lib.example_paths(voc_root, year, image_id)
        with open(p["image"], "rb") as f:
            encoded = f.read()
        ann = voc_lib.parse_annotation(p["annotation"])
        writer.write(_make_example(tf, encoded, image_id, ann))
        count_in_shard += 1
    if writer is not None:
        writer.close()
    return paths


def _make_example(tf, encoded: bytes, image_id: str, ann: Dict) -> bytes:
    def floats(v):
        return tf.train.Feature(float_list=tf.train.FloatList(
            value=np.asarray(v, np.float32).reshape(-1)))

    def ints(v):
        return tf.train.Feature(int64_list=tf.train.Int64List(
            value=np.asarray(v, np.int64).reshape(-1)))

    def bytes_f(v):
        return tf.train.Feature(bytes_list=tf.train.BytesList(value=[v]))

    boxes = ann["boxes"]
    feature = {
        _KEYS["encoded"]: bytes_f(encoded),
        _KEYS["image_id"]: bytes_f(image_id.encode()),
        _KEYS["height"]: ints([ann["height"]]),
        _KEYS["width"]: ints([ann["width"]]),
        _KEYS["ymin"]: floats(boxes[:, 0]),
        _KEYS["xmin"]: floats(boxes[:, 1]),
        _KEYS["ymax"]: floats(boxes[:, 2]),
        _KEYS["xmax"]: floats(boxes[:, 3]),
        _KEYS["label"]: ints(ann["labels"]),
        _KEYS["difficult"]: ints(ann["difficult"].astype(np.int64)),
    }
    return tf.train.Example(
        features=tf.train.Features(feature=feature)).SerializeToString()


def make_dataset(shard_paths: Sequence[str], canvas_size: int,
                 max_gt: int, batch_size: int, shuffle: bool,
                 seed: int = 0, repeat: bool = True,
                 letterbox: bool = False):
    """tf.data pipeline: TFRecord -> decode -> canvas resize -> padded batch.

    Emits dicts matching the trainer batch schema plus ``image_id`` and
    ``difficult`` (for eval).  Default canvas placement is a plain bilinear
    squash to [canvas, canvas]; with ``letterbox=True`` the aspect ratio is
    preserved — the image is scaled to fit and placed top-left, the rest is
    zero padding, gt boxes are re-normalized to canvas coordinates, and the
    per-image content fraction is emitted as ``box_scale`` [fy, fx]
    (detections divide by it to return to original normalized coords).
    """
    tf = _tf()

    spec = {
        _KEYS["encoded"]: tf.io.FixedLenFeature([], tf.string),
        _KEYS["image_id"]: tf.io.FixedLenFeature([], tf.string, ""),
        _KEYS["ymin"]: tf.io.VarLenFeature(tf.float32),
        _KEYS["xmin"]: tf.io.VarLenFeature(tf.float32),
        _KEYS["ymax"]: tf.io.VarLenFeature(tf.float32),
        _KEYS["xmax"]: tf.io.VarLenFeature(tf.float32),
        _KEYS["label"]: tf.io.VarLenFeature(tf.int64),
        _KEYS["difficult"]: tf.io.VarLenFeature(tf.int64),
    }

    def parse(record):
        ex = tf.io.parse_single_example(record, spec)
        img = tf.io.decode_jpeg(ex[_KEYS["encoded"]], channels=3)
        img = tf.cast(img, tf.float32)
        if letterbox:
            shape = tf.shape(img)
            h0 = tf.cast(shape[0], tf.float32)
            w0 = tf.cast(shape[1], tf.float32)
            scale = canvas_size / tf.maximum(h0, w0)
            # floor(x + 0.5): half-up rounding, matching the native loader;
            # clamp to >= 1 so extreme aspect ratios cannot produce a
            # zero-sized resize target.
            h1 = tf.maximum(tf.cast(tf.floor(h0 * scale + 0.5), tf.int32), 1)
            w1 = tf.maximum(tf.cast(tf.floor(w0 * scale + 0.5), tf.int32), 1)
            img = tf.image.resize(img, (h1, w1))
            img = tf.pad(img, [[0, canvas_size - h1],
                               [0, canvas_size - w1], [0, 0]])
            img.set_shape((canvas_size, canvas_size, 3))
            fy = tf.cast(h1, tf.float32) / canvas_size
            fx = tf.cast(w1, tf.float32) / canvas_size
        else:
            img = tf.image.resize(img, (canvas_size, canvas_size))
            fy = fx = tf.constant(1.0)
        def dense(k, dtype=tf.float32):
            return tf.sparse.to_dense(ex[_KEYS[k]])
        boxes = tf.stack([dense("ymin") * fy, dense("xmin") * fx,
                          dense("ymax") * fy, dense("xmax") * fx], axis=-1)
        n = tf.shape(boxes)[0]
        pad = tf.maximum(max_gt - n, 0)
        boxes = tf.pad(boxes[:max_gt], [[0, pad], [0, 0]])
        labels = tf.pad(tf.cast(dense("label"), tf.int32)[:max_gt],
                        [[0, pad]])
        difficult = tf.pad(tf.cast(dense("difficult"), tf.bool)[:max_gt],
                           [[0, pad]])
        mask = tf.pad(tf.ones((tf.minimum(n, max_gt),), tf.bool), [[0, pad]])
        return {"image": img, "gt_boxes": boxes, "gt_labels": labels,
                "gt_mask": mask, "difficult": difficult,
                "box_scale": tf.stack([fy, fx]),
                "image_id": ex[_KEYS["image_id"]]}

    ds = tf.data.TFRecordDataset(list(shard_paths),
                                 num_parallel_reads=tf.data.AUTOTUNE)
    if shuffle:
        ds = ds.shuffle(2048, seed=seed)
    if repeat:
        ds = ds.repeat()
    ds = ds.map(parse, num_parallel_calls=tf.data.AUTOTUNE)
    ds = ds.batch(batch_size, drop_remainder=repeat)
    return ds.prefetch(tf.data.AUTOTUNE)


def as_numpy_iterator(dataset) -> Iterator[Dict[str, np.ndarray]]:
    for batch in dataset:
        yield {k: (v.numpy() if hasattr(v, "numpy") else v)
               for k, v in batch.items()}
