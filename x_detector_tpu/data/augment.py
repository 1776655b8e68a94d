"""Fused device-side train/eval preprocessing (the jit'd "preproc stage").

Rebuilds SURVEY.md §2.2 P1–P4 — the reference's TF1 CPU augmentation chain
(``sample_distorted_bounding_box`` crop → ``distort_color`` → random flip →
resize → whiten) — as one stateless, shape-static jax function that runs on
the accelerator (BASELINE north-star: "a fused jax.jit/Pallas preprocessing
stage").

Key reconstructions:
  * **Distorted-bbox crop** (P1): TF's rejection-sampling loop becomes a
    fixed ``attempts``-trial vmap'd sampler — each trial draws (aspect, area,
    offset), checks the ``min_object_covered`` constraint against the gt
    boxes, and the first valid trial wins; all-invalid falls back to the
    whole image (TF semantics, SURVEY.md §7 hard part 3).  With letterbox
    canvases (``box_scale`` threaded through), crops are confined to the
    content region and the area/aspect constraints act in original-image
    space — the TF-faithful distribution.  Without letterbox (square
    squash), constraints act in canvas space: a deliberate divergence tied
    to the square-input design (DESIGN.md §10).
  * **Crop+resize**: separable triangular-kernel interpolation expressed as
    two dense contractions (same machinery as PSROIAlign) — lowers onto the
    MXU instead of a gather.
  * **Color distortion** (P2): brightness/contrast/saturation/hue with the
    reference's ranges; hue via YIQ-space rotation; two application orders
    selected at random (``apply_with_random_selector`` fast mode).
  * **Flip + whiten** (P3): horizontal flip with box mirroring; VGG-mean
    subtraction.

All functions take explicit PRNG keys and are batchable with ``vmap``.
"""

from __future__ import annotations

import functools
from typing import Dict, Tuple

import jax
import jax.numpy as jnp

from x_detector_tpu.config import DataConfig
from x_detector_tpu.ops import boxes as box_ops


# ---------------------------------------------------------------------------
# Crop sampling (P1)
# ---------------------------------------------------------------------------

def sample_distorted_box(key: jax.Array, gt_boxes: jnp.ndarray,
                         gt_mask: jnp.ndarray, cfg: DataConfig,
                         box_scale=None) -> jnp.ndarray:
    """Sample one crop window [ymin, xmin, ymax, xmax] (canvas-normalized).

    TF ``sample_distorted_bounding_box`` semantics with a fixed trial count:
    a trial is valid iff its aspect/area land in range, it fits the image,
    and it covers >= ``min_object_covered`` of at least one valid gt box.
    Returns the first valid trial's window, else the whole content region.

    ``box_scale`` = [fy, fx], the letterbox content fraction of the canvas
    (None / [1, 1] for square-squash canvases).  With letterbox the canvas
    scaling is uniform, so canvas pixel aspect == original pixel aspect and
    the aspect constraint needs no correction; the area constraint is taken
    relative to the *content* area (TF semantics: fraction of the image),
    crops are confined to the content region, and the fallback is the whole
    content region — crops can never land in the zero padding.
    """
    n = cfg.crop_attempts
    if box_scale is None:
        fy = fx = jnp.float32(1.0)
    else:
        fy, fx = box_scale[0], box_scale[1]
    k_aspect, k_area, k_y, k_x = jax.random.split(key, 4)
    lo_a, hi_a = cfg.aspect_ratio_range
    # TF samples the aspect ratio uniformly in [min, max] (not log-uniform),
    # then the HEIGHT uniformly in the range the area bounds allow for that
    # aspect — NOT the area uniformly (area ends up ~ h^2-skewed toward the
    # low end; verified against tf.image.sample_distorted_bounding_box as a
    # distributional oracle, tests/test_augment_tf_oracle.py).
    aspect = jax.random.uniform(k_aspect, (n,), minval=lo_a, maxval=hi_a)
    # Content-relative area bound: h * w = area * fy * fx; canvas-pixel
    # aspect (== original aspect under uniform letterbox scaling): w/h = a.
    # TF CLAMPS the height ceiling so the crop fits the image (rather than
    # rejecting oversize draws and resampling the aspect — rejection skews
    # the aspect marginal low, which the oracle's KS test catches); an
    # attempt only fails if the clamped ceiling makes the MINIMUM area
    # unachievable.
    content = fy * fx
    if cfg.crop_sampler == "r1":
        # Round-1 distribution (pre-oracle): AREA uniform in range, oversize
        # trials rejected instead of height-clamped. Kept for the capstone
        # mAP-delta attribution A/B (round-2 verdict item 6).
        area = jax.random.uniform(k_area, (n,), minval=cfg.area_range[0],
                                  maxval=cfg.area_range[1])
        h = jnp.sqrt(area * content / aspect)
        w = jnp.sqrt(area * content * aspect)
        fits = (h <= fy) & (w <= fx)
        h = jnp.minimum(h, fy)
        w = jnp.minimum(w, fx)
    else:
        h_lo = jnp.sqrt(cfg.area_range[0] * content / aspect)
        h_hi = jnp.sqrt(cfg.area_range[1] * content / aspect)
        h_cap = jnp.minimum(fy, fx / aspect)
        h_hi = jnp.minimum(h_hi, h_cap)
        fits = h_lo <= h_hi * (1.0 + 1e-6)
        u = jax.random.uniform(k_area, (n,))
        h = h_lo + u * jnp.maximum(h_hi - h_lo, 0.0)
        w = jnp.minimum(h * aspect, fx)
        h = jnp.minimum(h, fy)
    y0 = jax.random.uniform(k_y, (n,)) * (fy - h)
    x0 = jax.random.uniform(k_x, (n,)) * (fx - w)
    crops = jnp.stack([y0, x0, y0 + h, x0 + w], axis=-1)          # [n, 4]

    # coverage: fraction of each gt box covered by each crop  [n, G]
    cover = box_ops.ioa(crops, gt_boxes)
    any_gt = gt_mask.any()
    covered = jnp.where(gt_mask[None, :], cover, 0.0)
    ok_cover = jnp.where(any_gt,
                         (covered >= cfg.min_object_covered).any(axis=1),
                         True)  # no gt: every geometric trial is valid
    valid = fits & ok_cover

    first = jnp.argmax(valid)               # first True (0 if none)
    fallback = jnp.stack([jnp.float32(0.0), jnp.float32(0.0), fy, fx])
    return jnp.where(valid.any(), crops[first], fallback)


def transform_boxes_to_crop(gt_boxes: jnp.ndarray, gt_mask: jnp.ndarray,
                            crop: jnp.ndarray,
                            min_center_coverage: float = 0.25
                            ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Re-express gt boxes in the crop frame; drop boxes mostly outside.

    A box survives iff the crop covers >= ``min_center_coverage`` of it
    (reference drops/clips boxes whose overlap falls outside, SURVEY P1).
    Surviving boxes are clipped to the crop.
    """
    cy0, cx0, cy1, cx1 = crop[0], crop[1], crop[2], crop[3]
    ch = jnp.maximum(cy1 - cy0, 1e-8)
    cw = jnp.maximum(cx1 - cx0, 1e-8)
    cover = box_ops.ioa(crop[None, :], gt_boxes)[0]            # [G]
    keep = gt_mask & (cover >= min_center_coverage)
    shifted = jnp.stack([
        (gt_boxes[:, 0] - cy0) / ch, (gt_boxes[:, 1] - cx0) / cw,
        (gt_boxes[:, 2] - cy0) / ch, (gt_boxes[:, 3] - cx0) / cw], axis=-1)
    shifted = box_ops.clip_boxes(shifted)
    shifted = jnp.where(keep[:, None], shifted, 0.0)
    return shifted, keep


# ---------------------------------------------------------------------------
# Crop + resize (separable interpolation, MXU-friendly)
# ---------------------------------------------------------------------------

def _resize_weights(lo: jnp.ndarray, hi: jnp.ndarray, out: int,
                    extent: int) -> jnp.ndarray:
    """[out, extent] triangular interpolation matrix for sampling the
    normalized span [lo, hi) at ``out`` pixel centers."""
    coords = lo + (jnp.arange(out, dtype=jnp.float32) + 0.5) / out * (hi - lo)
    px = jnp.clip(coords * extent - 0.5, 0.0, extent - 1.0)
    pix = jnp.arange(extent, dtype=jnp.float32)
    return jnp.maximum(0.0, 1.0 - jnp.abs(pix[None, :] - px[:, None]))


def crop_and_resize(image: jnp.ndarray, crop: jnp.ndarray,
                    out_size: int) -> jnp.ndarray:
    """Bilinear crop+resize [H, W, C] -> [out, out, C] via two matmuls."""
    h, w, _ = image.shape
    wy = _resize_weights(crop[0], crop[2], out_size, h)        # [o, H]
    wx = _resize_weights(crop[1], crop[3], out_size, w)        # [o, W]
    tmp = jnp.einsum("ph,hwc->pwc", wy, image.astype(jnp.float32))
    return jnp.einsum("qw,pwc->pqc", wx, tmp)


# ---------------------------------------------------------------------------
# Color distortion (P2)
# ---------------------------------------------------------------------------

# RGB <-> YIQ (hue rotation operates on I/Q plane), values in [0, 1] space.
# The inverse is computed exactly so that adjust_hue(img, 0) == img.
import numpy as _np

_RGB2YIQ = jnp.array([[0.299, 0.587, 0.114],
                      [0.596, -0.274, -0.322],
                      [0.211, -0.523, 0.312]], jnp.float32)
_YIQ2RGB = jnp.asarray(_np.linalg.inv(_np.asarray(_RGB2YIQ)), jnp.float32)


def adjust_brightness(img: jnp.ndarray, delta: jnp.ndarray) -> jnp.ndarray:
    return img + delta


def adjust_contrast(img: jnp.ndarray, factor: jnp.ndarray) -> jnp.ndarray:
    mean = img.mean(axis=(0, 1), keepdims=True)
    return (img - mean) * factor + mean


def adjust_saturation(img: jnp.ndarray, factor: jnp.ndarray) -> jnp.ndarray:
    gray = (img * jnp.array([0.299, 0.587, 0.114])).sum(-1, keepdims=True)
    return gray + (img - gray) * factor


def adjust_hue(img: jnp.ndarray, delta_rad: jnp.ndarray) -> jnp.ndarray:
    yiq = img @ _RGB2YIQ.T
    c, s = jnp.cos(delta_rad), jnp.sin(delta_rad)
    rot = jnp.stack([yiq[..., 0],
                     yiq[..., 1] * c - yiq[..., 2] * s,
                     yiq[..., 1] * s + yiq[..., 2] * c], axis=-1)
    return rot @ _YIQ2RGB.T


def distort_color(key: jax.Array, img: jnp.ndarray,
                  cfg: DataConfig) -> jnp.ndarray:
    """Random brightness/saturation/hue/contrast in one of two orders
    (``apply_with_random_selector`` fast mode). img in [0, 1]."""
    ks = jax.random.split(key, 5)
    b = jax.random.uniform(ks[0], (), minval=-cfg.brightness_max_delta,
                           maxval=cfg.brightness_max_delta)
    s = jax.random.uniform(ks[1], (), minval=cfg.saturation_range[0],
                           maxval=cfg.saturation_range[1])
    h = jax.random.uniform(ks[2], (), minval=-cfg.hue_max_delta,
                           maxval=cfg.hue_max_delta) * 2.0 * jnp.pi
    c = jax.random.uniform(ks[3], (), minval=cfg.contrast_range[0],
                           maxval=cfg.contrast_range[1])

    # The two TF orderings are B,S,H,C and B,C,S,H — brightness first and a
    # shared saturation->hue core, with contrast either before or after it.
    # Under the batched vmap a lax.cond lowers to select (BOTH branches run
    # per image), so expressing the choice as two full 4-op pipelines costs
    # 8 color ops; applying contrast conditionally on each side of the
    # shared core costs 5, and the expensive YIQ hue rotation runs once.
    # Per-branch math is unchanged (identical op compositions).
    y = adjust_brightness(img, b)
    sel = jax.random.bernoulli(ks[4])
    t = jnp.where(sel, y, adjust_contrast(y, c))
    u = adjust_hue(adjust_saturation(t, s), h)
    out = jnp.where(sel, adjust_contrast(u, c), u)
    return jnp.clip(out, 0.0, 1.0)


# ---------------------------------------------------------------------------
# Full pipelines (P4)
# ---------------------------------------------------------------------------

@functools.partial(jax.jit, static_argnames=("cfg",))
def preprocess_for_train(key: jax.Array, image: jnp.ndarray,
                         gt_boxes: jnp.ndarray, gt_labels: jnp.ndarray,
                         gt_mask: jnp.ndarray,
                         cfg: DataConfig,
                         box_scale=None) -> Dict[str, jnp.ndarray]:
    """image [H, W, 3] float32 RGB in [0, 255] -> augmented training example
    at cfg.image_size with boxes/labels adjusted into the crop frame.

    ``box_scale`` [fy, fx] marks the letterbox content region of the canvas;
    crops sample inside it, so the training example never contains letterbox
    padding and gt boxes come out in crop-frame coordinates (the example's
    own box_scale is the identity)."""
    k_crop, k_color, k_flip = jax.random.split(key, 3)

    crop = sample_distorted_box(k_crop, gt_boxes, gt_mask, cfg, box_scale)
    new_boxes, new_mask = transform_boxes_to_crop(
        gt_boxes, gt_mask, crop, min_center_coverage=cfg.box_keep_coverage)
    img = crop_and_resize(image, crop, cfg.image_size)         # [S, S, 3]

    img = distort_color(k_color, img / 255.0, cfg) * 255.0

    do_flip = jax.random.bernoulli(k_flip)
    img = jnp.where(do_flip, img[:, ::-1, :], img)
    new_boxes = jnp.where(do_flip,
                          box_ops.flip_boxes_horizontal(new_boxes), new_boxes)
    new_boxes = jnp.where(new_mask[:, None], new_boxes, 0.0)

    img = img - jnp.asarray(cfg.pixel_means, jnp.float32)
    labels = jnp.where(new_mask, gt_labels, 0)
    return {"image": img, "gt_boxes": new_boxes, "gt_labels": labels,
            "gt_mask": new_mask}


@functools.partial(jax.jit, static_argnames=("cfg",))
def preprocess_for_eval(image: jnp.ndarray,
                        cfg: DataConfig) -> jnp.ndarray:
    """Resize to the square eval size + whiten (no augmentation).

    Skips the resize matmuls entirely when the (static) input shape is
    already the target canvas — e.g. eval over reader canvases that were
    letterboxed/decoded at the model size, where the full-image
    crop_and_resize would be two dense identity matmuls per image.
    """
    if tuple(image.shape[:2]) != (cfg.image_size, cfg.image_size):
        full = jnp.array([0.0, 0.0, 1.0, 1.0], jnp.float32)
        image = crop_and_resize(image, full, cfg.image_size)
    return image - jnp.asarray(cfg.pixel_means, jnp.float32)


def preprocess_batch_for_train(key: jax.Array, batch: Dict[str, jnp.ndarray],
                               cfg: DataConfig) -> Dict[str, jnp.ndarray]:
    """vmap'd train preprocessing over a host batch of canvas images."""
    keys = jax.random.split(key, batch["image"].shape[0])
    if "box_scale" in batch:  # letterbox canvases: crop inside the content
        fn = lambda k, im, b, l, m, s: preprocess_for_train(
            k, im, b, l, m, cfg, s)
        out = jax.vmap(fn)(keys, batch["image"], batch["gt_boxes"],
                           batch["gt_labels"], batch["gt_mask"],
                           batch["box_scale"])
    else:
        fn = functools.partial(preprocess_for_train, cfg=cfg)
        out = jax.vmap(fn)(keys, batch["image"], batch["gt_boxes"],
                           batch["gt_labels"], batch["gt_mask"])
    if "difficult" in batch:
        # gt rows keep their slots through crop/flip (only the mask changes),
        # so the per-row difficult flags stay aligned and pass through for
        # the trainer's difficult-exclusion mask.
        out["difficult"] = batch["difficult"]
    return out
