"""Light-Head R-CNN (two-stage detector), TPU-native.

Rebuilds SURVEY.md §2.4 N3–N6 and §3.1:
  backbone C4 -> RPN head (objectness 2A + loc 4A per cell)
  backbone C5 -> large-separable-conv "thin feature map" (k=15, 490 ch)
  RPN -> static proposal stage: decode, clip, min-size, top-K, NMS(0.7),
         padded to a fixed proposal count (the reference's dynamic-shape
         hotspot, made shape-static per SURVEY.md §7 hard part 1)
  PSROIAlign(thin map, proposals, 7x7x10) -> flatten 490 -> FC 2048
      -> sibling FCs: cls (num_classes) + class-agnostic box (4).

All stages are jittable with static shapes; proposals are stop-gradiented
before the ROI head (Faster-R-CNN convention — RPN trains only through its
own losses).
"""

from __future__ import annotations

from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from x_detector_tpu.config import AnchorConfig, ModelConfig, ProposalConfig
from x_detector_tpu.models.layers import ConvBN
from x_detector_tpu.models.resnet import ResNetV1
from x_detector_tpu.models.xception import XceptionLite
from x_detector_tpu.ops import anchors as anchor_lib
from x_detector_tpu.ops import boxes as box_ops
from x_detector_tpu.ops import nms as nms_lib
from x_detector_tpu.ops.psroi_align import batched_psroi_align

Dtype = Any


class LargeSeparableConv(nn.Module):
    """Light-Head thin-feature-map producer (SURVEY.md §2.4 N3).

    Two branches on C5 — (k x 1 then 1 x k) and (1 x k then k x 1) — summed.
    The cheap stand-in for R-FCN's 3969-channel score maps: out = 10*7*7.
    """
    mid: int = 256
    out: int = 490
    k: int = 15
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        conv = lambda f, kern, name: nn.Conv(
            f, kern, padding="SAME", dtype=self.dtype,
            param_dtype=jnp.float32, name=name)
        a = conv(self.mid, (self.k, 1), "col_a")(x)
        a = conv(self.out, (1, self.k), "col_b")(a)
        b = conv(self.mid, (1, self.k), "row_a")(x)
        b = conv(self.out, (self.k, 1), "row_b")(b)
        return nn.relu(a + b)


class RPNHead(nn.Module):
    """3x3/512 intermediate conv + sibling 1x1 cls/loc convs (N4)."""
    num_anchors: int
    mid: int = 512
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x: jnp.ndarray,
                 train: bool = False) -> Tuple[jnp.ndarray, jnp.ndarray]:
        b = x.shape[0]
        h = ConvBN(self.mid, (3, 3), use_bn=False, dtype=self.dtype,
                   name="conv")(x, train)
        cls = nn.Conv(self.num_anchors * 2, (1, 1), dtype=self.dtype,
                      param_dtype=jnp.float32, name="cls")(h)
        loc = nn.Conv(self.num_anchors * 4, (1, 1), dtype=self.dtype,
                      param_dtype=jnp.float32, name="loc")(h)
        return (cls.reshape(b, -1, 2).astype(jnp.float32),
                loc.reshape(b, -1, 4).astype(jnp.float32))


def generate_proposals(
    rpn_cls: jnp.ndarray,       # [B, A, 2] logits
    rpn_loc: jnp.ndarray,       # [B, A, 4] codes
    anchors: jnp.ndarray,       # [A, 4]
    cfg: ProposalConfig,
    image_size: int,
    training: bool = False,
    anchor_cfg: "AnchorConfig" = None,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Static proposal stage (N5). Returns (boxes [B,R,4], scores [B,R],
    valid [B,R]) with R = post_nms_topk (train) or post_nms_topk_eval.

    With ``cfg.fast_nms`` (and an ``anchor_cfg`` describing the grid), the
    exact greedy NMS is replaced by the MaxpoolNMS approximation
    (ops/maxpool_nms.py): per-scale local-max selection on the objectness
    maps, then a single top-k — no sort, no sequential suppression.
    """
    num_anchors = rpn_cls.shape[1]
    scores = jax.nn.softmax(rpn_cls, axis=-1)[..., 1]           # [B, A]
    boxes = box_ops.decode(rpn_loc, anchors[None])              # [B, A, 4]
    boxes = box_ops.clip_boxes(boxes)
    # min-size filter in normalized units
    min_sz = cfg.min_size / float(image_size)
    wh_ok = ((boxes[..., 2] - boxes[..., 0]) >= min_sz) & \
            ((boxes[..., 3] - boxes[..., 1]) >= min_sz)
    scores = jnp.where(wh_ok, scores, 0.0)

    k_pre = min(cfg.pre_nms_topk if training else cfg.pre_nms_topk_eval,
                num_anchors)
    k_post = cfg.post_nms_topk if training else cfg.post_nms_topk_eval

    if cfg.fast_nms and anchor_cfg is None:
        # Statically known at every call site; a silent exact-NMS fallback
        # would misreport fast-path timings to anyone who set the flag.
        raise ValueError("ProposalConfig.fast_nms=True requires anchor_cfg "
                         "(grid geometry drives MaxpoolNMS windows); got None")
    if cfg.fast_nms:
        from x_detector_tpu.ops.maxpool_nms import rpn_maxpool_scores
        masked = rpn_maxpool_scores(scores, anchor_cfg, image_size,
                                    cfg.nms_threshold)

        def one_image_fast(s, b):
            top_s, top_i = jax.lax.top_k(s, k_post)
            valid = top_s > 0.0
            # Zero the boxes of invalid slots to match nms_padded's padding
            # contract (downstream consumers that ignore the valid mask see
            # zeros, not arbitrary gathered anchors).
            return jnp.where(valid[:, None], b[top_i], 0.0), top_s, valid

        return jax.vmap(one_image_fast)(masked, boxes)

    def one_image(s, b):
        top_s, top_i = jax.lax.top_k(s, k_pre)   # descending: NMS skips sort
        res = nms_lib.nms_padded(b[top_i], top_s, k_post,
                                 iou_threshold=cfg.nms_threshold,
                                 score_threshold=0.0, presorted=True)
        return res.boxes, res.scores, res.valid

    return jax.vmap(one_image)(scores, boxes)


class RoIHead(nn.Module):
    """Flatten pooled 7x7x10 -> FC2048 -> cls + box regression (N6).

    ``class_agnostic=True`` (Light-Head paper spec) emits one 4-vector per
    roi; ``False`` emits the reference's per-class-regression variant
    (SURVEY.md §2.4 N6 "verify class-agnostic vs per-class"): [R, C, 4],
    trained on the target class's slice and decoded per class at inference.
    """
    num_classes: int
    head_dim: int = 2048
    class_agnostic: bool = True
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, pooled: jnp.ndarray,
                 train: bool = False) -> Tuple[jnp.ndarray, jnp.ndarray]:
        b, r = pooled.shape[:2]
        flat = pooled.reshape(b, r, -1).astype(self.dtype)
        h = nn.relu(nn.Dense(self.head_dim, dtype=self.dtype,
                             param_dtype=jnp.float32, name="fc")(flat))
        cls = nn.Dense(self.num_classes, dtype=self.dtype,
                       param_dtype=jnp.float32, name="cls")(h)
        box_dim = 4 if self.class_agnostic else 4 * self.num_classes
        box = nn.Dense(box_dim, dtype=self.dtype, param_dtype=jnp.float32,
                       name="box")(h)
        if not self.class_agnostic:
            box = box.reshape(b, r, self.num_classes, 4)
        return cls.astype(jnp.float32), box.astype(jnp.float32)


class LightHeadRCNN(nn.Module):
    """Full two-stage pipeline; returns every intermediate needed for
    training losses and for inference post-processing."""
    config: ModelConfig
    dtype: Dtype = jnp.bfloat16

    def setup(self):
        from x_detector_tpu.models.ssd import make_backbone
        cfg = self.config
        self.backbone = make_backbone(cfg, dilate_c5=True, dtype=self.dtype)
        self.rpn = RPNHead(num_anchors=cfg.anchors.num_anchors,
                           mid=cfg.rpn_mid, dtype=self.dtype)
        self.thin_map = LargeSeparableConv(
            mid=cfg.large_sep_mid, out=cfg.thin_channels,
            k=cfg.large_sep_kernel, dtype=self.dtype)
        self.roi_head = RoIHead(num_classes=cfg.num_classes,
                                head_dim=cfg.head_dim,
                                class_agnostic=cfg.class_agnostic_box,
                                dtype=self.dtype)

    def __call__(self, images: jnp.ndarray,
                 train: bool = False) -> Dict[str, jnp.ndarray]:
        cfg = self.config
        feats = self.backbone(images, train)
        c4, c5 = feats["c4"], feats["c5"]
        rpn_cls, rpn_loc = self.rpn(c4, train)

        anchors = jnp.asarray(anchor_lib.rpn_anchors(cfg.image_size,
                                                     cfg.anchors))
        assert rpn_cls.shape[1] == anchors.shape[0], (
            f"RPN grid {rpn_cls.shape[1]} != anchors {anchors.shape[0]}")

        props, prop_scores, prop_valid = generate_proposals(
            jax.lax.stop_gradient(rpn_cls), jax.lax.stop_gradient(rpn_loc),
            anchors, cfg.proposals, cfg.image_size, training=train,
            anchor_cfg=cfg.anchors)

        thin = self.thin_map(c5, train)                   # [B, h, w, 490]
        pooled = batched_psroi_align(
            thin.astype(jnp.float32), props, grid=cfg.roi_grid)
        pooled = pooled * prop_valid[..., None, None, None]
        roi_cls, roi_box = self.roi_head(pooled, train)

        return {
            "rpn_cls": rpn_cls, "rpn_loc": rpn_loc,
            "proposals": props, "proposal_scores": prop_scores,
            "proposal_valid": prop_valid,
            "roi_cls": roi_cls, "roi_box": roi_box,
        }


def lighthead_postprocess(outputs: Dict[str, jnp.ndarray],
                          config: ModelConfig) -> nms_lib.MulticlassNMSResult:
    """Decode ROI-head boxes vs proposals, per-class NMS (config 1/3 tail).

    Two-stage NMS threshold is tighter than single-shot (SURVEY.md §2.6 T3:
    0.3–0.5 two-stage); we use the config's nms settings.
    """
    probs = jax.nn.softmax(outputs["roi_cls"], axis=-1)
    fg_probs = probs[..., 1:] * outputs["proposal_valid"][..., None]
    roi_box = outputs["roi_box"]
    if roi_box.ndim == 4:   # [B, R, C, 4] per-class regression: drop the
        # background slice and decode every class's codes vs its proposal.
        decoded = box_ops.decode(roi_box[:, :, 1:, :],
                                 outputs["proposals"][:, :, None, :])
    else:                   # [B, R, 4] class-agnostic
        decoded = box_ops.decode(roi_box, outputs["proposals"])
    decoded = box_ops.clip_boxes(decoded)
    ncfg = config.nms
    return nms_lib.batched_multiclass_nms(
        decoded, fg_probs, max_output=ncfg.max_output,
        iou_threshold=ncfg.iou_threshold,
        score_threshold=ncfg.score_threshold,
        approx_prefilter=ncfg.approx_prefilter)


def build_rpn_anchors(config: ModelConfig) -> np.ndarray:
    return anchor_lib.rpn_anchors(config.image_size, config.anchors)
