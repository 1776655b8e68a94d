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
    fast_mode: bool = False,
    ssd_anchor_cfg=None,         # SSDAnchorConfig, required for fast_mode
    image_size: int = 0,
    approx_prefilter: bool = False,
) -> MulticlassNMSResult:
    """Softmax over classes, decode boxes, clip to image, per-class NMS.

    ``fast_mode`` (opt-in, ``NMSConfig.fast_mode``) replaces the exact
    per-class greedy NMS with the MaxpoolNMS approximation: per-layer
    local-max selection on the score maps (ops/maxpool_nms.py), then one
    global top-k over all (box, class) pairs — no per-class suppression
    loops at all.
    """
    probs = jax.nn.softmax(class_logits.astype(jnp.float32), axis=-1)
    fg_probs = probs[..., 1:]                               # drop background
    if box_codes.ndim == 3:
        decoded = box_ops.decode(box_codes.astype(jnp.float32),
                                 anchors[None, :, :])
    else:
        decoded = box_ops.decode(box_codes.astype(jnp.float32),
                                 anchors[None, :, None, :])
    decoded = box_ops.clip_boxes(decoded)
    if fast_mode and ssd_anchor_cfg is None:
        # The anchor config is always statically known at every call site;
        # silently falling back to exact NMS here would hand a caller who
        # asked for fast_mode exact-NMS timings without telling them.
        raise ValueError("fast_mode=True requires ssd_anchor_cfg (the SSD "
                         "anchor grid geometry drives MaxpoolNMS window "
                         "sizes); got None")
    if fast_mode:
        from x_detector_tpu.ops.maxpool_nms import ssd_maxpool_scores
        masked = ssd_maxpool_scores(fg_probs, ssd_anchor_cfg, image_size,
                                    iou_threshold)
        num_classes = masked.shape[-1]

        def one_image(scores_nc, boxes_n):
            top_s, top_i = jax.lax.top_k(
                scores_nc.reshape(-1), max_output)          # over N*C pairs
            n_idx = top_i // num_classes
            c_idx = top_i % num_classes
            if boxes_n.ndim == 3:                           # [N, C, 4]
                out_boxes = boxes_n.reshape(-1, 4)[top_i]
            else:
                out_boxes = boxes_n[n_idx]
            valid = top_s > score_threshold
            return MulticlassNMSResult(
                boxes=jnp.where(valid[:, None], out_boxes, 0.0),
                scores=jnp.where(valid, top_s, -1.0),
                classes=jnp.where(valid, c_idx.astype(jnp.int32) + 1, 0),
                valid=valid)

        return jax.vmap(one_image)(masked, decoded)
    return batched_multiclass_nms(
        decoded, fg_probs, max_output=max_output,
        iou_threshold=iou_threshold, score_threshold=score_threshold,
        per_class_topk=per_class_topk, approx_prefilter=approx_prefilter)
