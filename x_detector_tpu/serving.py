"""Serving-side helpers: load exported artifacts, letterbox client inputs.

The export CLI (cli/export.py) freezes the full images -> detections
pipeline into a ``jax.export`` StableHLO artifact.  This module is the
consumer half — deliberately free of any model code, so a serving process
depends only on jax + numpy:

    from x_detector_tpu import serving
    fn = serving.load("/path/det.stablehlo")
    canvas, box_scale = serving.letterbox_batch(list_of_rgb_arrays, 800)
    boxes, scores, classes, valid = fn.call(canvas, box_scale)

``letterbox_batch`` reproduces the data pipeline's exact placement
(uniform scale, top-left, half-up rounding — native loader / tf.data /
predict all agree), so a letterbox-exported artifact sees the same
geometry it was trained on and returns boxes in original-image normalized
coordinates.
"""

from __future__ import annotations

from typing import List, Sequence, Tuple

import numpy as np


def load(path: str):
    """Deserialize an exported detector.  Returns the jax.export object;
    run it with ``.call(*inputs)``."""
    from jax import export as jexport
    with open(path, "rb") as f:
        return jexport.deserialize(f.read())


def letterbox_image(image: np.ndarray, size: int) -> Tuple[np.ndarray,
                                                           np.ndarray]:
    """[H, W, 3] uint8/float RGB -> ([size, size, 3] float32 canvas,
    [2] float32 box_scale = [fy, fx])."""
    from PIL import Image
    arr = np.asarray(image)
    h0, w0 = arr.shape[:2]
    s = size / max(h0, w0)
    # half-up rounding + bilinear: identical placement/pixels to the data
    # pipelines (native loader / tf.data / cli.predict)
    h1 = max(1, min(size, int(h0 * s + 0.5)))
    w1 = max(1, min(size, int(w0 * s + 0.5)))
    pil = Image.fromarray(arr.astype(np.uint8))
    resized = np.asarray(pil.resize((w1, h1), Image.BILINEAR), np.float32)
    canvas = np.zeros((size, size, 3), np.float32)
    canvas[:h1, :w1] = resized
    return canvas, np.array([h1 / size, w1 / size], np.float32)


def letterbox_batch(images: Sequence[np.ndarray], size: int
                    ) -> Tuple[np.ndarray, np.ndarray]:
    """List of RGB arrays -> ([B, size, size, 3], [B, 2]) artifact inputs."""
    canvases: List[np.ndarray] = []
    scales: List[np.ndarray] = []
    for im in images:
        c, s = letterbox_image(im, size)
        canvases.append(c)
        scales.append(s)
    return np.stack(canvases), np.stack(scales)


def pick_bucket(n: int, buckets: Sequence[int]) -> int:
    """Smallest exported artifact batch that fits ``n`` requests.

    Exported StableHLO artifacts have static batch shapes, so a deployment
    exports a small set (cli/export.py --batch, e.g. {1, 4, 8, 16}) and
    routes each request burst to the cheapest one.  If ``n`` exceeds every
    bucket, returns the largest (the caller splits the burst).
    """
    fitting = [b for b in buckets if b >= n]
    return min(fitting) if fitting else max(buckets)


def bucketed_letterbox_batch(
        images: Sequence[np.ndarray], size: int,
        buckets: Sequence[int]) -> Tuple[np.ndarray, np.ndarray, int]:
    """Letterbox a request burst and zero-pad it to its bucket's batch.

    Returns ``(canvas [B, size, size, 3], box_scale [B, 2], n_real)`` with
    ``B = pick_bucket(len(images), buckets)``; rows >= ``n_real`` are
    zero canvases (box_scale 1) whose detections the caller discards.
    Bursts larger than every bucket must be split by the caller first.
    """
    n = len(images)
    b = pick_bucket(n, buckets)
    if n > b:
        raise ValueError(f"burst of {n} exceeds largest bucket {b}: "
                         "split the request first")
    canvas, scale = letterbox_batch(images, size)
    if n < b:
        canvas = np.concatenate(
            [canvas, np.zeros((b - n, size, size, 3), np.float32)])
        scale = np.concatenate([scale, np.ones((b - n, 2), np.float32)])
    return canvas, scale, n
