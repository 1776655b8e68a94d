"""Box geometry: format conversion, IoU, clipping, encode/decode.

Replaces the reference's scattered TF box math (SURVEY.md §2.3 A2/A3:
``utility/anchor_manipulator.py`` encode/decode with prior scaling
sigma=[0.1, 0.1, 0.2, 0.2], IoU matrix, clipping).  Everything here is pure
``jnp``, fully batched, and safe under ``vmap``/``jit``.

Conventions:
  * Corner format: ``[ymin, xmin, ymax, xmax]`` — normalized [0, 1] or pixels;
    the math is unit-agnostic.
  * Center format: ``[cy, cx, h, w]``.
  * A "padded" box row of all zeros is a valid degenerate box (area 0) and
    falls out of IoU computations naturally.
"""

from __future__ import annotations

import jax.numpy as jnp

from x_detector_tpu.config import PRIOR_SCALING

EPS = 1e-8


def center_to_corner(boxes: jnp.ndarray) -> jnp.ndarray:
    """[..., (cy, cx, h, w)] -> [..., (ymin, xmin, ymax, xmax)]."""
    cy, cx, h, w = jnp.split(boxes, 4, axis=-1)
    return jnp.concatenate(
        [cy - h / 2.0, cx - w / 2.0, cy + h / 2.0, cx + w / 2.0], axis=-1)


def corner_to_center(boxes: jnp.ndarray) -> jnp.ndarray:
    """[..., (ymin, xmin, ymax, xmax)] -> [..., (cy, cx, h, w)]."""
    ymin, xmin, ymax, xmax = jnp.split(boxes, 4, axis=-1)
    h = ymax - ymin
    w = xmax - xmin
    return jnp.concatenate(
        [ymin + h / 2.0, xmin + w / 2.0, h, w], axis=-1)


def area(boxes: jnp.ndarray) -> jnp.ndarray:
    """Area of corner-format boxes, clamped at 0. [..., 4] -> [...]."""
    ymin, xmin, ymax, xmax = jnp.split(boxes, 4, axis=-1)
    return (jnp.maximum(ymax - ymin, 0.0) *
            jnp.maximum(xmax - xmin, 0.0)).squeeze(-1)


def intersection(boxes_a: jnp.ndarray, boxes_b: jnp.ndarray) -> jnp.ndarray:
    """Pairwise intersection areas. [A, 4] x [B, 4] -> [A, B] (corner fmt)."""
    ymin_a, xmin_a, ymax_a, xmax_a = jnp.split(boxes_a, 4, axis=-1)
    ymin_b, xmin_b, ymax_b, xmax_b = jnp.split(boxes_b, 4, axis=-1)
    ih = (jnp.minimum(ymax_a, ymax_b.T) - jnp.maximum(ymin_a, ymin_b.T))
    iw = (jnp.minimum(xmax_a, xmax_b.T) - jnp.maximum(xmin_a, xmin_b.T))
    return jnp.maximum(ih, 0.0) * jnp.maximum(iw, 0.0)


def iou(boxes_a: jnp.ndarray, boxes_b: jnp.ndarray) -> jnp.ndarray:
    """Pairwise IoU matrix. [A, 4] x [B, 4] -> [A, B] (corner fmt).

    Degenerate (zero-area) boxes yield IoU 0 against everything.
    """
    inter = intersection(boxes_a, boxes_b)
    union = area(boxes_a)[:, None] + area(boxes_b)[None, :] - inter
    return jnp.where(union > 0, inter / jnp.maximum(union, EPS), 0.0)


def ioa(boxes_a: jnp.ndarray, boxes_b: jnp.ndarray) -> jnp.ndarray:
    """Intersection-over-area-of-b: fraction of each b covered by each a.

    [A, 4] x [B, 4] -> [A, B].  Used by the distorted-crop sampler's
    ``min_object_covered`` constraint (TF ``sample_distorted_bounding_box``
    semantics: the crop must cover >= the given fraction of some gt box).
    """
    inter = intersection(boxes_a, boxes_b)
    area_b = area(boxes_b)[None, :]
    return jnp.where(area_b > 0, inter / jnp.maximum(area_b, EPS), 0.0)


def clip_boxes(boxes: jnp.ndarray, ymax: float = 1.0,
               xmax: float = 1.0) -> jnp.ndarray:
    """Clip corner-format boxes into [0, ymax] x [0, xmax]."""
    lo = jnp.zeros(4, boxes.dtype)
    hi = jnp.array([ymax, xmax, ymax, xmax], boxes.dtype)
    return jnp.clip(boxes, lo, hi)


def encode(boxes: jnp.ndarray, anchors: jnp.ndarray,
           prior_scaling=PRIOR_SCALING) -> jnp.ndarray:
    """Encode corner-format gt boxes relative to corner-format anchors.

    SSD/Faster-R-CNN parameterization (SURVEY.md §2.3 A2):
      t_cy = (g_cy - a_cy) / a_h / s0,  t_cx = (g_cx - a_cx) / a_w / s1,
      t_h  = log(g_h / a_h) / s2,       t_w  = log(g_w / a_w) / s3.
    Broadcasts over leading dims; boxes/anchors [..., 4] -> [..., 4].
    """
    g = corner_to_center(boxes)
    a = corner_to_center(anchors)
    a_h = jnp.maximum(a[..., 2], EPS)
    a_w = jnp.maximum(a[..., 3], EPS)
    t_cy = (g[..., 0] - a[..., 0]) / a_h / prior_scaling[0]
    t_cx = (g[..., 1] - a[..., 1]) / a_w / prior_scaling[1]
    t_h = jnp.log(jnp.maximum(g[..., 2], EPS) / a_h) / prior_scaling[2]
    t_w = jnp.log(jnp.maximum(g[..., 3], EPS) / a_w) / prior_scaling[3]
    return jnp.stack([t_cy, t_cx, t_h, t_w], axis=-1)


def decode(codes: jnp.ndarray, anchors: jnp.ndarray,
           prior_scaling=PRIOR_SCALING) -> jnp.ndarray:
    """Exact inverse of :func:`encode`: regression codes -> corner boxes."""
    a = corner_to_center(anchors)
    cy = codes[..., 0] * prior_scaling[0] * a[..., 2] + a[..., 0]
    cx = codes[..., 1] * prior_scaling[1] * a[..., 3] + a[..., 1]
    # Clamp the log-space codes so exp() cannot overflow on wild regressions.
    h = jnp.exp(jnp.clip(codes[..., 2] * prior_scaling[2], -10.0, 10.0)) * a[..., 2]
    w = jnp.exp(jnp.clip(codes[..., 3] * prior_scaling[3], -10.0, 10.0)) * a[..., 3]
    return center_to_corner(jnp.stack([cy, cx, h, w], axis=-1))


def flip_boxes_horizontal(boxes: jnp.ndarray, xmax: float = 1.0) -> jnp.ndarray:
    """Mirror corner-format boxes around the vertical axis of [0, xmax]."""
    ymin, xmin, ymax_, xmax_ = jnp.split(boxes, 4, axis=-1)
    return jnp.concatenate([ymin, xmax - xmax_, ymax_, xmax - xmin], axis=-1)
