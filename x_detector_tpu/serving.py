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

import json
import os
from typing import List, Sequence, Tuple

import numpy as np


def load(path: str):
    """Deserialize an exported detector.  Returns the jax.export object;
    run it with ``.call(*inputs)``."""
    from jax import export as jexport
    with open(path, "rb") as f:
        return jexport.deserialize(f.read())


# ---------------------------------------------------------------------------
# Shared-weights container (round 4, VERDICT item 9)
#
# A serving batch set {1, 4, 8, 16} exported as closed-over-constant
# artifacts stores the weights once PER BUCKET (4 x 44.1 MB for config 3,
# DESIGN §16).  The container layout instead exports each bucket's graph
# with the weights pytree as an ARGUMENT, and stores the weights once:
#
#   container/
#     meta.json            {"buckets": [...], "baked": [...], ...}
#     weights.msgpack      flax msgpack of the variables pytree (fp32)
#     graph-b{B}.stablehlo jax.export artifact taking (weights, images[,
#                          box_scale]) — a few hundred KB each
#
# Measured refinement (DESIGN §16): weights-as-runtime-argument graphs run
# at 0.94–1.03x baked throughput for batch >= 4, but batch 1 pays 0.60x
# (XLA cannot constant-fold runtime weights, and at batch 1 the folded
# constants matter).  A container can therefore BAKE selected buckets:
# those graphs embed the weights (big blob, full speed) while the rest
# share weights.msgpack.  The recommended split — bake {1}, share the rest
# — costs one extra weights copy and removes the only measured regression.
# ---------------------------------------------------------------------------

def save_container(directory: str, variables, graphs: dict,
                   meta: dict, baked=()) -> None:
    """Write the shared-weights layout.  ``graphs`` maps batch -> serialized
    jax.export bytes; buckets listed in ``baked`` embed the weights as
    constants (their graphs take images only), every other graph takes the
    weights pytree as its first argument; ``variables`` is the pytree the
    shared graphs expect."""
    import jax
    from flax import serialization
    if not graphs:
        # Round 4 shipped a CLI bug that reached here with an exhausted
        # generator upstream; a container with no graphs cannot serve
        # anything and must fail at WRITE time, not at first detect().
        raise ValueError("save_container called with no graphs: a container "
                         "needs at least one bucket")
    os.makedirs(directory, exist_ok=True)
    with open(os.path.join(directory, "weights.msgpack"), "wb") as f:
        f.write(serialization.msgpack_serialize(
            jax.tree_util.tree_map(np.asarray, variables)))
    for batch, blob in graphs.items():
        with open(os.path.join(directory, f"graph-b{batch}.stablehlo"),
                  "wb") as f:
            f.write(blob)
    with open(os.path.join(directory, "meta.json"), "w") as f:
        json.dump(dict(meta, buckets=sorted(graphs),
                       baked=sorted(baked)), f)


class DetectorContainer:
    """Reloaded shared-weights batch set: one weights blob, one graph per
    bucket; ``detect(images[, box_scale])`` dispatches on the batch size,
    which must exactly match a bucket (StableHLO shapes are static) — pad
    requests to a bucket first, e.g. via ``bucketed_letterbox_batch``."""

    def __init__(self, directory: str):
        import jax
        from flax import serialization
        from jax import export as jexport
        with open(os.path.join(directory, "meta.json")) as f:
            self.meta = json.load(f)
        self.buckets = self.meta["buckets"]
        self.baked = set(self.meta.get("baked", []))
        if set(self.buckets) <= self.baked:
            # Every graph embeds its own weights; restoring + device_put'ing
            # weights.msgpack would pin ~44 MB of HBM (config 3) that
            # detect() never reads (advisor r4).
            self.weights = None
        else:
            with open(os.path.join(directory, "weights.msgpack"), "rb") as f:
                restored = serialization.msgpack_restore(f.read())
            # Upload ONCE: passing host numpy to .call would re-transfer the
            # whole weights pytree (~44 MB for config 3) on every request,
            # silently undoing the container's reason to exist (and int8
            # prequantization's HBM rationale).  device_put here makes every
            # detect() read device-resident weights.
            self.weights = jax.device_put(restored)
        self._fns = {}
        for b in self.buckets:
            with open(os.path.join(directory,
                                   f"graph-b{b}.stablehlo"), "rb") as f:
                self._fns[b] = jexport.deserialize(f.read())

    def detect(self, images, *extra):
        b = images.shape[0]
        if b not in self._fns:
            raise ValueError(f"no graph for batch {b}; buckets "
                             f"{self.buckets} (pad via "
                             "bucketed_letterbox_batch first)")
        if b in self.baked:                 # weights embedded as constants
            return self._fns[b].call(images, *extra)
        return self._fns[b].call(self.weights, images, *extra)


def load_container(directory: str) -> DetectorContainer:
    return DetectorContainer(directory)


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
