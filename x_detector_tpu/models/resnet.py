"""ResNet-50 v1 backbone in Flax (NHWC, bf16 compute, fp32 params).

Rebuilds SURVEY.md §2.4 N1 (slim-style ``resnet_v1_50``): 7x7/2 stem →
3x3/2 maxpool → bottleneck stages [3, 4, 6, 3] with widths 256/512/1024/2048.
For two-stage detection the final stage can run at **stride 16 with dilation
2** (the R-FCN/Light-Head idiom that keeps the thin feature map at stride 16)
instead of stride 32; SSD uses the stride-32 variant.

Returns a dict of pyramid features:
  c3: stride 8    c4: stride 16    c5: stride 16 (dilated) or 32.
"""

from __future__ import annotations

from typing import Any, Dict, Tuple

import jax.numpy as jnp
from flax import linen as nn

from x_detector_tpu.models.layers import ConvBN, max_pool

Dtype = Any


class Bottleneck(nn.Module):
    """v1 bottleneck: 1x1 → 3x3 (stride/dilation here) → 1x1, + projection."""
    features: int            # inner width; output is 4x
    strides: Tuple[int, int] = (1, 1)
    dilation: Tuple[int, int] = (1, 1)
    quant: Any = None        # None | "calibrate" | "int8" (layers.py doc)
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        out_features = self.features * 4
        shortcut = x
        if x.shape[-1] != out_features or self.strides != (1, 1):
            shortcut = ConvBN(out_features, (1, 1), strides=self.strides,
                              relu=False, quant=self.quant, dtype=self.dtype,
                              name="proj")(x, train)
        y = ConvBN(self.features, (1, 1), quant=self.quant,
                   dtype=self.dtype)(x, train)
        y = ConvBN(self.features, (3, 3), strides=self.strides,
                   dilation=self.dilation, padding="EXPLICIT",
                   quant=self.quant, dtype=self.dtype)(y, train)
        y = ConvBN(out_features, (1, 1), relu=False, quant=self.quant,
                   dtype=self.dtype)(y, train)
        return nn.relu(y + shortcut)


class ResNetV1(nn.Module):
    """ResNet v1 feature extractor.

    ``stage_sizes``/``widths`` default to ResNet-50; tests shrink both via
    ``ModelConfig.backbone_stages``/``backbone_widths`` to keep the 1-core
    CI host's compile and step times proportional to what they exercise.
    """
    stage_sizes: Tuple[int, ...] = (3, 4, 6, 3)
    widths: Tuple[int, ...] = (64, 128, 256, 512)
    dilate_c5: bool = True     # stride-16 dilated last stage (two-stage dets)
    # First N stages recompute forward during backward (nn.remat per
    # block): trades recompute for saved-activation HBM traffic on the
    # bandwidth-bound backward (same knob as XceptionLite.remat_stages).
    remat_stages: int = 0
    quant: Any = None          # None | "calibrate" | "int8" (layers.py doc)
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x: jnp.ndarray,
                 train: bool = False) -> Dict[str, jnp.ndarray]:
        x = x.astype(self.dtype)
        x = ConvBN(64, (7, 7), strides=(2, 2), padding="EXPLICIT",
                   quant=self.quant, dtype=self.dtype, name="stem")(x, train)
        x = max_pool(x, 3, 2, explicit_pad=True)               # stride 4
        feats: Dict[str, jnp.ndarray] = {}
        for stage, (n_blocks, width) in enumerate(
                zip(self.stage_sizes, self.widths)):
            last = stage == len(self.stage_sizes) - 1
            if stage == 0:
                stride, dilation = (1, 1), (1, 1)
            elif last and self.dilate_c5:
                stride, dilation = (1, 1), (2, 2)
            else:
                stride, dilation = (2, 2), (1, 1)
            # static_argnums counts self: (self, x, train) -> train is 2
            block_cls = (nn.remat(Bottleneck, static_argnums=(2,))
                         if stage < self.remat_stages else Bottleneck)
            for block in range(n_blocks):
                x = block_cls(
                    width,
                    strides=stride if block == 0 else (1, 1),
                    dilation=dilation,
                    quant=self.quant,
                    dtype=self.dtype,
                    name=f"stage{stage + 1}_block{block}")(x, train)
            if stage == 1:
                feats["c3"] = x        # stride 8, 512ch
            elif stage == 2:
                feats["c4"] = x        # stride 16, 1024ch
            elif stage == 3:
                feats["c5"] = x        # stride 16 (dilated) or 32, 2048ch
        return feats


def resnet50(dilate_c5: bool = True, dtype: Dtype = jnp.bfloat16) -> ResNetV1:
    return ResNetV1(stage_sizes=(3, 4, 6, 3), dilate_c5=dilate_c5, dtype=dtype)
