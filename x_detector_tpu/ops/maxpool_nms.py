"""MaxpoolNMS: approximate NMS as local-max selection on anchor score maps.

Opt-in fast mode (SURVEY.md §2.5 rebuild contract; docs/ROADMAP.md item 5),
after the PSRR-MaxpoolNMS idea (PAPERS.md, arXiv:2105.12990 — reconstructed
from the abstract's idea, not the paper text, which is unfetchable here):
greedy NMS over N score-sorted boxes is replaced by a **single max-pool** per
anchor channel — a box survives iff its objectness EQUALS the local maximum
of its channel within a window matched to the anchor's footprint (``>=`` the
pooled value, so every member of an equal-score plateau survives; with
quantized or saturated scores a plateau can flood the global top-k — the
trade for a branch-free compare).
No sort, no sequential tile walk, no IoU matrices: one ``reduce_window``
plus a compare, fully parallel on the VPU.

Why a local-max test approximates IoU-NMS: two same-channel anchors (side
``S`` px, grid step ``stride``) offset by ``d`` px have IoU
``(1 - d/S) / (1 + d/S)`` along one axis — IoU > thr corresponds to center
distance ``d < S * (1-thr)/(1+thr)``.  Suppressing everything but the local
max within radius ``r`` cells therefore emulates NMS at threshold
``(1 - r*stride/S) / (1 + r*stride/S)`` for that channel; the kernel is
chosen per anchor scale to match the configured threshold.  Cross-channel
(ratio/scale) suppression is deliberately omitted: same-center anchors of
adjacent ratio (1:1 vs 1:2, IoU 0.59) or scale (area 4x, IoU 0.25) sit
below the 0.7 proposal threshold anyway.

The approximation operates on the *anchor grid* (pre-decode positions), as
in the paper: decoded boxes shift toward objects, so clustered detections
of one object can survive when their source anchors are far apart.  That is
the accuracy/throughput trade measured in tools/fast_nms_ab.py — this mode
is opt-in (``ProposalConfig.fast_nms`` / ``NMSConfig.fast_mode``).
"""

from __future__ import annotations

import math
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp

from x_detector_tpu.config import AnchorConfig, SSDAnchorConfig


def _kernel_for(anchor_px: float, stride: int, iou_threshold: float,
                feat: int) -> int:
    """Odd window side (cells) whose radius matches the NMS threshold.

    radius r = anchor_px * (1-thr)/(1+thr) / stride, so boxes the exact NMS
    would suppress (closer than r) fall inside the window.
    """
    r = anchor_px * (1.0 - iou_threshold) / (1.0 + iou_threshold) / stride
    k = 2 * max(1, int(round(r))) + 1
    # Clamp to the map, but never below 3 (a 1-wide window suppresses
    # nothing and the channel floods the top-k).  The floor wins over the
    # cap: on maps narrower than 3 cells the returned 3 exceeds the map and,
    # via SAME padding, degrades to global-max selection — one survivor per
    # channel, deliberate over-suppression rather than none.
    return max(3, min(k, feat if feat % 2 == 1 else feat - 1))


def local_max_mask(score_maps: jnp.ndarray, kernel: int) -> jnp.ndarray:
    """[..., H, W, C] -> bool mask, True where the score equals the k x k
    spatial max of its own channel (SAME padding, stride 1)."""
    ndim = score_maps.ndim
    window = [1] * ndim
    window[-3] = window[-2] = kernel
    pooled = jax.lax.reduce_window(
        score_maps, -jnp.inf, jax.lax.max, tuple(window),
        (1,) * ndim, "SAME")
    return score_maps >= pooled


def rpn_maxpool_scores(scores: jnp.ndarray, cfg: AnchorConfig,
                       image_size: int,
                       iou_threshold: float = 0.7) -> jnp.ndarray:
    """Suppress a flat RPN score vector [..., F*F*A] via per-scale local-max.

    Returns scores with non-local-max entries set to 0 (the proposal stage's
    dead-score sentinel), same flat layout as ``anchors.rpn_anchors``.
    """
    feat = -(-image_size // cfg.stride)
    n_ratios = len(cfg.ratios)
    lead = scores.shape[:-1]
    maps = scores.reshape(*lead, feat, feat, cfg.num_anchors)
    parts = []
    for si, scale in enumerate(cfg.scales):
        k = _kernel_for(scale, cfg.stride, iou_threshold, feat)
        group = maps[..., si * n_ratios:(si + 1) * n_ratios]
        parts.append(jnp.where(local_max_mask(group, k), group, 0.0))
    out = jnp.concatenate(parts, axis=-1)
    return out.reshape(*lead, feat * feat * cfg.num_anchors)


def ssd_layer_kernels(image_size: int, cfg: SSDAnchorConfig,
                      iou_threshold: float) -> Tuple[Tuple[int, int], ...]:
    """Per-layer (feat_side, kernel) for the SSD pyramid (anchors.ssd_anchors
    layer order/scale schedule)."""
    n = cfg.num_layers
    scales = [cfg.scale_min + (cfg.scale_max - cfg.scale_min) * k
              / max(n - 1, 1) for k in range(n)]
    out = []
    for k, stride in enumerate(cfg.strides):
        feat = int(math.ceil(image_size / stride))
        anchor_px = scales[k] * image_size
        out.append((feat, _kernel_for(anchor_px, stride, iou_threshold, feat)))
    return tuple(out)


def ssd_maxpool_scores(class_scores: jnp.ndarray, cfg: SSDAnchorConfig,
                       image_size: int,
                       iou_threshold: float = 0.45) -> jnp.ndarray:
    """Suppress SSD per-class scores [..., N, C] via per-layer local-max.

    N decomposes into the pyramid's [F_l, F_l, A] grids
    (``anchors.ssd_layer_anchor_counts`` order); each (anchor-shape, class)
    channel keeps only its spatial local maxima within the layer's window.
    """
    a_per_cell = cfg.anchors_per_cell
    num_classes = class_scores.shape[-1]
    lead = class_scores.shape[:-2]
    parts = []
    start = 0
    for feat, kernel in ssd_layer_kernels(image_size, cfg, iou_threshold):
        count = feat * feat * a_per_cell
        layer = class_scores[..., start:start + count, :].reshape(
            *lead, feat, feat, a_per_cell * num_classes)
        layer = jnp.where(local_max_mask(layer, kernel), layer, 0.0)
        parts.append(layer.reshape(*lead, count, num_classes))
        start += count
    assert start == class_scores.shape[-2], (
        f"pyramid cells {start} != scores {class_scores.shape[-2]}")
    return jnp.concatenate(parts, axis=-2)
