"""Shared detection post-processing: decode -> clip -> batched NMS.

The reference's eval-time tail (SURVEY.md §3.2: decode boxes vs anchors/
proposals → per-class score filter → NMS → top-k), rebuilt as one jitted,
batched, shape-static function.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from x_detector_tpu.ops import boxes as box_ops
from x_detector_tpu.ops.nms import MulticlassNMSResult, batched_multiclass_nms


def postprocess_detections(
    box_codes: jnp.ndarray,      # [B, N, 4] regression vs anchors, or
                                 # [B, N, C, 4] per-class codes
    class_logits: jnp.ndarray,   # [B, N, C+1] logits incl. background col 0
    anchors: jnp.ndarray,        # [N, 4] corner fmt (anchors or proposals)
    max_output: int = 200,
    iou_threshold: float = 0.45,
    score_threshold: float = 0.01,
    per_class_topk: int = 100,
) -> MulticlassNMSResult:
    """Softmax over classes, decode boxes, clip to image, per-class NMS."""
    probs = jax.nn.softmax(class_logits.astype(jnp.float32), axis=-1)
    fg_probs = probs[..., 1:]                               # drop background
    if box_codes.ndim == 3:
        decoded = box_ops.decode(box_codes.astype(jnp.float32),
                                 anchors[None, :, :])
    else:
        decoded = box_ops.decode(box_codes.astype(jnp.float32),
                                 anchors[None, :, None, :])
    decoded = box_ops.clip_boxes(decoded)
    return batched_multiclass_nms(
        decoded, fg_probs, max_output=max_output,
        iou_threshold=iou_threshold, score_threshold=score_threshold,
        per_class_topk=per_class_topk)
