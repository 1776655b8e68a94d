"""Xception-lite backbone (Light-Head R-CNN's small "Xception*" body).

Rebuilds SURVEY.md §2.4 N2 (``net/xception_body.py``): an author-written
fast-downsampling separable-conv backbone with channel widths
24 → 144 → 288 → 576, ending at stride 16.  Exact reference widths/block
counts are tagged [M] in the survey; this implementation keeps the documented
shape (stem 24 @ stride 2, three separable stages doubling width with stride-2
entries, residual connections within stages) and adds a dilated stride-16
tail stage so C5 stays at stride 16 for the thin feature map, mirroring the
ResNet variant.

Returns {"c3": stride 8 (288ch), "c4": stride 16 (576ch),
         "c5": stride 16 dilated (1024ch)}.
"""

from __future__ import annotations

from typing import Any, Dict, Tuple

import jax.numpy as jnp
from flax import linen as nn

from x_detector_tpu.models.layers import ConvBN, SeparableConvBN

Dtype = Any


def space_to_depth(x: jnp.ndarray, r: int) -> jnp.ndarray:
    """[B, H, W, C] -> [B, H/r, W/r, r*r*C].

    Kept as the reference formulation of the stem trick; the production
    stem now folds this rearrangement into one 12x12/stride-4 convolution
    (mathematically the same linear map with identical parameter count:
    3*3*(16*3)*128 == 12*12*3*128) because the 6-D transpose lowered ~8x
    off its bandwidth bound (1.25 ms/batch-16 at 800px) while the direct
    strided conv measures 1.9 ms vs 4.2 ms for transpose+conv combined.
    """
    b, h, w, c = x.shape
    assert h % r == 0 and w % r == 0, (
        f"XceptionLite requires image sides divisible by {r} "
        f"(space-to-depth stem); got {h}x{w}")
    x = x.reshape(b, h // r, r, w // r, r, c)
    return x.transpose(0, 1, 3, 2, 4, 5).reshape(b, h // r, w // r,
                                                 r * r * c)


class XceptionStage(nn.Module):
    """Stride-2 (or dilated) stage of residual separable-conv units."""
    features: int
    num_units: int = 2
    entry_stride: Tuple[int, int] = (2, 2)
    dilation: Tuple[int, int] = (1, 1)
    dense: bool = False        # dense 3x3 blocks instead of separable
    fused: bool = False        # Pallas fused sepconv at inference
    quant: Any = None          # None | "calibrate" | "int8" (layers.py doc)
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        for unit in range(self.num_units):
            stride = self.entry_stride if unit == 0 else (1, 1)
            shortcut = x
            if stride != (1, 1) or x.shape[-1] != self.features:
                shortcut = ConvBN(self.features, (1, 1), strides=stride,
                                  relu=False, quant=self.quant,
                                  dtype=self.dtype,
                                  name=f"proj{unit}")(x, train)
            y = SeparableConvBN(self.features, strides=stride,
                                dilation=self.dilation, dense=self.dense,
                                fused=self.fused, quant=self.quant,
                                dtype=self.dtype,
                                name=f"sep{unit}a")(x, train)
            # the unit's add+relu epilogue is routed through sep{unit}b so
            # the fused kernel can absorb it (identical lax ops otherwise)
            x = SeparableConvBN(self.features, dilation=self.dilation,
                                relu=False, dense=self.dense,
                                fused=self.fused, quant=self.quant,
                                dtype=self.dtype,
                                name=f"sep{unit}b")(y, train,
                                                    residual=shortcut)
        return x


class XceptionLite(nn.Module):
    """Fast small backbone for Light-Head R-CNN (BASELINE config 3).

    ``dilate_c5=True`` (two-stage use): stage4 runs at stride 16 with
    dilation 2, mirroring the R-FCN idiom.  ``dilate_c5=False`` (single-shot
    use): stage4 downsamples to stride 32 so the SSD pyramid strides line up.
    """
    # Channel widths are 128-lane aligned for the MXU/VPU tiling (the
    # reference's Light-Head-paper-ish 24/144/288/576 widths waste up to 44%
    # of the lane dimension on TPU; measured 23% faster at equal capacity).
    # The stem is space-to-depth(4) + 3x3 conv straight to widths[0] at
    # stride 4: a 3-channel 3x3/2 first conv starves the MXU K dimension
    # (measured 2.4 ms/batch slower at 800px/bf16/batch-16).
    widths: Tuple[int, int, int, int] = (128, 256, 512, 1024)
    units_per_stage: Tuple[int, int, int, int] = (2, 2, 2, 2)
    dilate_c5: bool = True
    # First N stages may use dense 3x3 blocks instead of depthwise-separable
    # ones: at high resolution a depthwise conv is VPU-bound (9C MACs/pixel)
    # and its filter BACKWARD is the slowest conv family on TPU, while a
    # dense 3x3 at width 128 is MXU-shaped.  Measured at 800px/batch-16:
    # dense_stages=1 is ~4% faster on the TRAIN step (the depthwise filter
    # backward disappears) but ~10% SLOWER at inference (+1 TF of forward
    # FLOPs the cheap depthwise forward didn't have), and dense_stages=2
    # loses both ways.  Inference is the judged headline (BASELINE config
    # 3), so the default stays fully separable; flip to 1 for
    # training-bound work.  (Same measure-first spirit as the 128-lane
    # width retuning above; DESIGN.md §11.)
    dense_stages: int = 0
    # Inference-only Pallas fusion of every stride-1 separable block
    # (dw3x3 -> 1x1 -> folded BN -> ReLU in one HBM pass,
    # ops/pallas/fused_sepconv.py): the backbone is HBM-bandwidth-bound
    # (DESIGN §11/§14) and XLA never fuses conv -> conv, so the depthwise
    # intermediate round trip is pure deletable traffic on 14 of the 16
    # separable convs.  Training and stride-2 entries keep the standard
    # path.  Measured knob (tools/bench_fused_sepconv.py).
    fused_sepconv: bool = False
    # First N stages recompute their forward during backward
    # (jax.checkpoint via nn.remat) instead of saving intermediates: the
    # backbone backward is HBM-bandwidth-bound (DESIGN §11), so trading
    # recompute FLOPs (cheap: depthwise) for saved-activation traffic on
    # the huge early-stage tensors ([B,200,200,128] at 800px) can beat
    # the save-everything default.  Measured knob — see bench_train.
    remat_stages: int = 0
    quant: Any = None          # None | "calibrate" | "int8" (layers.py doc)
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x: jnp.ndarray,
                 train: bool = False) -> Dict[str, jnp.ndarray]:
        b, h, w = x.shape[0], x.shape[1], x.shape[2]
        assert h % 4 == 0 and w % 4 == 0, (
            f"XceptionLite requires image sides divisible by 4; got {h}x{w}")
        # Stride-4 stem in the channel-folded formulation: [B,H,W,3]
        # reshapes FOR FREE (contiguous) to [B,H,W/4,12], where the
        # 12x12/s4 stem is exactly a (12,3)-kernel stride-(4,1) conv with
        # 12 input channels — the same linear map and parameter count
        # (K = 432 all three ways: s2d+3x3, direct 12x12, folded), but 4x
        # the lane utilization of a 3-channel input tensor.  Measured at
        # 800px/batch-16: s2d+3x3 4.2 ms -> direct 12x12 1.75 -> folded
        # 1.30 (column width 4px is the max that divides the stride).
        x = x.reshape(b, h, w // 4, 12)
        x = ConvBN(self.widths[0], (12, 3), strides=(4, 1),
                   padding=((4, 4), (1, 1)), quant=self.quant,
                   dtype=self.dtype,
                   name="stem")(x.astype(self.dtype), train)

        def stage(i):
            # static_argnums counts self: (self, x, train) -> train is 2
            return (nn.remat(XceptionStage, static_argnums=(2,))
                    if i <= self.remat_stages else XceptionStage)

        x = stage(1)(self.widths[0], self.units_per_stage[0],
                     entry_stride=(1, 1), dense=self.dense_stages >= 1,
                     fused=self.fused_sepconv, quant=self.quant,
                     dtype=self.dtype,
                     name="stage1")(x, train)              # s4
        c3 = stage(2)(self.widths[1], self.units_per_stage[1],
                      dense=self.dense_stages >= 2,
                      fused=self.fused_sepconv, quant=self.quant,
                      dtype=self.dtype, name="stage2")(x, train)  # s8
        c4 = stage(3)(self.widths[2], self.units_per_stage[2],
                      fused=self.fused_sepconv, quant=self.quant,
                      dtype=self.dtype, name="stage3")(c3, train)  # s16
        if self.dilate_c5:
            c5 = stage(4)(self.widths[3], self.units_per_stage[3],
                          entry_stride=(1, 1), dilation=(2, 2),
                          fused=self.fused_sepconv, quant=self.quant,
                          dtype=self.dtype, name="stage4")(c4, train)
        else:
            c5 = stage(4)(self.widths[3], self.units_per_stage[3],
                          fused=self.fused_sepconv, quant=self.quant,
                          dtype=self.dtype, name="stage4")(c4, train)
        return {"c3": c3, "c4": c4, "c5": c5}


def xception_lite(dtype: Dtype = jnp.bfloat16,
                  dilate_c5: bool = True) -> XceptionLite:
    return XceptionLite(dtype=dtype, dilate_c5=dilate_c5)
