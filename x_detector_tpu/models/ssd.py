"""SSD-style single-shot detector (the X-Det/SSD family head).

Rebuilds SURVEY.md §2.4 N7/N8: multi-scale per-anchor cls+loc convolutions
over a feature pyramid, followed by decode + batched per-class NMS
(BASELINE config 2).  The reference's experimental X-Det bodies are covered
by this one SSD-family head per the survey's scoping note ("the rebuild needs
one SSD-family single-shot head with batched NMS, not a faithful X-Det
clone").

Feature sources for strides (8, 16, 32): backbone c3/c4/c5 (stride-32 c5);
strides 64/128 come from extra stride-2 ConvBN blocks, SSD-paper style.
"""

from __future__ import annotations

from typing import Any, List, Tuple

import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from x_detector_tpu.config import ModelConfig
from x_detector_tpu.models.layers import ConvBN
from x_detector_tpu.models.resnet import ResNetV1
from x_detector_tpu.models.xception import XceptionLite
from x_detector_tpu.ops import anchors as anchor_lib

Dtype = Any


def make_backbone(cfg: ModelConfig, dilate_c5: bool, dtype,
                  name: str = None):
    """Backbone module for a ModelConfig, honoring the capacity overrides
    (``backbone_stages``/``backbone_widths``; None = family defaults).

    ``name`` must stay None when called from a Module's ``setup`` (Flax
    names attributes itself there)."""
    kw = {} if name is None else {"name": name}
    if cfg.backbone_stages is not None:
        kw["stage_sizes" if cfg.backbone == "resnet50"
           else "units_per_stage"] = cfg.backbone_stages
    if cfg.backbone_widths is not None:
        kw["widths"] = cfg.backbone_widths
    if cfg.backbone_remat_stages:
        kw["remat_stages"] = cfg.backbone_remat_stages
    if cfg.backbone_quant is not None:
        kw["quant"] = cfg.backbone_quant
    if cfg.backbone == "resnet50":
        if cfg.backbone_fused_sepconv:
            raise ValueError(
                "backbone_fused_sepconv applies to xception_lite only "
                "(ResNet has no separable convs); refusing to ignore it")
        return ResNetV1(dilate_c5=dilate_c5, dtype=dtype, **kw)
    if cfg.backbone == "xception_lite":
        if cfg.backbone_fused_sepconv:
            kw["fused_sepconv"] = True
        return XceptionLite(dilate_c5=dilate_c5, dtype=dtype, **kw)
    raise ValueError(f"unknown backbone {cfg.backbone!r}")


class SSDHead(nn.Module):
    """Per-layer sibling 3x3 convs emitting class logits + box codes."""
    num_classes: int
    anchors_per_cell: int
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, feats: List[jnp.ndarray],
                 train: bool = False) -> Tuple[jnp.ndarray, jnp.ndarray]:
        cls_out, loc_out = [], []
        for i, f in enumerate(feats):
            inter = ConvBN(256, (3, 3), dtype=self.dtype,
                           name=f"inter{i}")(f, train)
            cls = nn.Conv(self.anchors_per_cell * self.num_classes, (3, 3),
                          padding="SAME", dtype=self.dtype,
                          param_dtype=jnp.float32, name=f"cls{i}")(inter)
            loc = nn.Conv(self.anchors_per_cell * 4, (3, 3), padding="SAME",
                          dtype=self.dtype, param_dtype=jnp.float32,
                          name=f"loc{i}")(inter)
            b = f.shape[0]
            cls_out.append(cls.reshape(b, -1, self.num_classes))
            loc_out.append(loc.reshape(b, -1, 4))
        return (jnp.concatenate(cls_out, axis=1),
                jnp.concatenate(loc_out, axis=1))


class SSDModel(nn.Module):
    """Backbone + extra layers + (optional top-down fusion) + SSD head.

    ``__call__`` returns raw per-anchor (class_logits [B, N, C+1],
    box_codes [B, N, 4]) in anchor order matching
    :func:`x_detector_tpu.ops.anchors.ssd_anchors`.

    With ``config.fpn_fusion`` this is the **X-Det-style** variant
    (SURVEY.md §2.4 N7: the author's single-shot bodies with feature-fusion
    tweaks): higher pyramid levels are upsampled (nearest, 2x) and fused
    into lower ones through 1x1 lateral convs before the heads.
    """
    config: ModelConfig
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, images: jnp.ndarray,
                 train: bool = False) -> Tuple[jnp.ndarray, jnp.ndarray]:
        cfg = self.config
        feats = make_backbone(cfg, dilate_c5=False, dtype=self.dtype,
                              name="backbone")(images, train)
        pyramid = [feats["c3"], feats["c4"], feats["c5"]]
        x = feats["c5"]
        for i, stride in enumerate(cfg.ssd_anchors.strides[3:]):
            x = ConvBN(256, (1, 1), dtype=self.dtype,
                       name=f"extra{i}a")(x, train)
            x = ConvBN(512, (3, 3), strides=(2, 2), dtype=self.dtype,
                       name=f"extra{i}b")(x, train)
            pyramid.append(x)
        if cfg.fpn_fusion:
            # top-down: lateral 1x1 to a shared width, add 2x-upsampled upper
            width = 256
            laterals = [
                ConvBN(width, (1, 1), dtype=self.dtype,
                       name=f"lateral{i}")(f, train)
                for i, f in enumerate(pyramid)]
            for i in range(len(laterals) - 2, -1, -1):
                up = laterals[i + 1]
                b, h, w, c = up.shape
                th, tw = laterals[i].shape[1:3]
                up = jnp.repeat(jnp.repeat(up, 2, axis=1), 2, axis=2)
                up = up[:, :th, :tw, :]
                laterals[i] = laterals[i] + up
            pyramid = [
                ConvBN(width, (3, 3), dtype=self.dtype,
                       name=f"fuse{i}")(f, train)
                for i, f in enumerate(laterals)]
        cls_logits, box_codes = SSDHead(
            num_classes=cfg.num_classes,
            anchors_per_cell=cfg.ssd_anchors.anchors_per_cell,
            dtype=self.dtype, name="head")(pyramid, train)
        expected = sum(anchor_lib.ssd_layer_anchor_counts(
            cfg.image_size, cfg.ssd_anchors))
        assert cls_logits.shape[1] == expected, (
            f"head anchors {cls_logits.shape[1]} != grid {expected}")
        return cls_logits.astype(jnp.float32), box_codes.astype(jnp.float32)


def build_ssd_anchors(config: ModelConfig) -> np.ndarray:
    return anchor_lib.ssd_anchors(config.image_size, config.ssd_anchors)
