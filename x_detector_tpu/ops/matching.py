"""Ground-truth -> anchor matching and training-target encoding.

Rebuilds SURVEY.md §2.3 A2 (``encode_all_anchors`` / ``do_dual_max_match``):
per-anchor best-gt assignment with positive/negative IoU thresholds, plus the
**forced best-anchor-per-gt** rule so no ground-truth box goes unmatched.

All inputs are shape-static: gt boxes come padded to ``[MAX_GT, 4]`` with a
boolean validity mask; padded rows can never match (their IoU column is forced
to -1).  Outputs are per-anchor and fixed-size — the single biggest design
divergence from the reference's dynamic-shape TF1 graph (SURVEY.md §7 hard
part 1).
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from x_detector_tpu.ops import boxes as box_ops


class MatchResult(NamedTuple):
    """Per-anchor match state; every field has leading dim [num_anchors]."""
    matched_gt: jnp.ndarray     # int32, index of assigned gt (valid iff fg)
    matched_iou: jnp.ndarray    # float32, IoU with assigned gt
    fg_mask: jnp.ndarray        # bool, positive anchors
    bg_mask: jnp.ndarray        # bool, negative anchors
    # neither fg nor bg => ignored (IoU in the dead zone)
    labels: jnp.ndarray         # int32 class target (0 = background)
    reg_targets: jnp.ndarray    # [A, 4] encoded regression targets (fg only)


def match_anchors(
    anchors: jnp.ndarray,        # [A, 4] corner fmt
    gt_boxes: jnp.ndarray,       # [G, 4] corner fmt, padded
    gt_labels: jnp.ndarray,      # [G] int32 class ids (>= 1 for real classes)
    gt_mask: jnp.ndarray,        # [G] bool validity of each gt row
    pos_iou: float,
    neg_iou: float,
    force_match: bool = True,
) -> MatchResult:
    """Threshold matching with optional forced best-anchor-per-gt.

    Rules (reference "dual max match" semantics):
      1. Each anchor takes its highest-IoU valid gt.
      2. fg if that IoU >= pos_iou; bg if < neg_iou; else ignored.
      3. If ``force_match``: for every valid gt, its single best anchor is
         made fg and assigned to that gt, overriding rules 1–2; when several
         gts share a best anchor, the gt with the highest IoU to that anchor
         wins.
    """
    num_anchors = anchors.shape[0]
    iou = box_ops.iou(anchors, gt_boxes)                       # [A, G]
    iou = jnp.where(gt_mask[None, :], iou, -1.0)               # kill padding

    matched_gt = jnp.argmax(iou, axis=1).astype(jnp.int32)     # [A]
    matched_iou = jnp.max(iou, axis=1)                         # [A]

    fg = matched_iou >= pos_iou
    bg = matched_iou < neg_iou  # with no valid gt, everything is background

    if force_match:
        # Best anchor per gt (argmax down columns); invert to a per-anchor
        # "which gts claim me" matrix and resolve conflicts by IoU.
        best_anchor = jnp.argmax(iou, axis=0)                  # [G]
        anchor_ids = jnp.arange(num_anchors, dtype=jnp.int32)
        claims = (best_anchor[None, :] == anchor_ids[:, None]) & gt_mask[None, :]
        claim_iou = jnp.where(claims, iou, -jnp.inf)           # [A, G]
        forced_mask = jnp.any(claims, axis=1)
        forced_gt = jnp.argmax(claim_iou, axis=1).astype(jnp.int32)
        matched_gt = jnp.where(forced_mask, forced_gt, matched_gt)
        fg = fg | forced_mask
        bg = bg & ~forced_mask
        # value at the argmax claim == max over claims (gather-free)
        matched_iou = jnp.where(forced_mask, jnp.max(claim_iou, axis=1),
                                matched_iou)

    # Row gathers ([A] indices into [G] gt rows) lower to serial
    # dynamic-slices on TPU; with G small and static, a one-hot contraction
    # is a dense [A, G] x [G, 4] product that lands on the MXU/VPU instead
    # (measured 3.1 ms -> noise at A=37.5k, G=100, batch 16).
    onehot = (matched_gt[:, None]
              == jnp.arange(gt_boxes.shape[0], dtype=jnp.int32)[None, :])
    labels = jnp.where(
        fg, (onehot * gt_labels[None, :]).sum(axis=1), 0).astype(jnp.int32)
    matched_boxes = onehot.astype(gt_boxes.dtype) @ gt_boxes   # [A, 4]
    reg_targets = box_ops.encode(matched_boxes, anchors)
    reg_targets = jnp.where(fg[:, None], reg_targets, 0.0)
    return MatchResult(matched_gt=matched_gt, matched_iou=matched_iou,
                       fg_mask=fg, bg_mask=bg, labels=labels,
                       reg_targets=reg_targets)


def match_proposals(
    proposals: jnp.ndarray,      # [R, 4] corner fmt (padded; zeros allowed)
    proposal_mask: jnp.ndarray,  # [R] bool validity
    gt_boxes: jnp.ndarray,       # [G, 4]
    gt_labels: jnp.ndarray,      # [G]
    gt_mask: jnp.ndarray,        # [G]
    fg_iou: float = 0.5,
    bg_iou_hi: float = 0.5,
    bg_iou_lo: float = 0.0,
) -> MatchResult:
    """Second-stage (ROI head) target assignment for Light-Head training.

    Proposals with IoU >= ``fg_iou`` to some gt are foreground with that gt's
    class; valid proposals whose best IoU lies in the background band
    ``[bg_iou_lo, bg_iou_hi)`` are background (Fast-R-CNN sampling band,
    SURVEY.md §2.6 T1); everything else — padded proposals and valid ones in
    the dead zone ``[bg_iou_hi, fg_iou)`` or below ``bg_iou_lo`` — is ignored
    (neither fg nor bg) and must not contribute to the ROI loss.

    With ``bg_iou_hi == fg_iou`` and ``bg_iou_lo == 0.0`` (the defaults)
    every valid non-foreground proposal is background.
    """
    res = match_anchors(proposals, gt_boxes, gt_labels, gt_mask,
                        pos_iou=fg_iou, neg_iou=fg_iou, force_match=False)
    fg = res.fg_mask & proposal_mask
    # An image with zero valid gt has matched_iou == -1 (the padding
    # sentinel); clamp to 0 so such proposals land at IoU 0 — background
    # under the default band, reference-faithfully ignored if bg_iou_lo > 0.
    band_iou = jnp.maximum(res.matched_iou, 0.0)
    bg = ((band_iou < bg_iou_hi) & (band_iou >= bg_iou_lo)
          & proposal_mask & ~fg)
    labels = jnp.where(fg, res.labels, 0).astype(jnp.int32)
    reg = jnp.where(fg[:, None], res.reg_targets, 0.0)
    return MatchResult(matched_gt=res.matched_gt, matched_iou=res.matched_iou,
                       fg_mask=fg, bg_mask=bg, labels=labels, reg_targets=reg)
