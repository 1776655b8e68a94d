"""Shared conv building blocks (NHWC, mixed precision).

Numerics policy (SURVEY.md §7: bf16 matmul/conv, fp32 accumulation/params):
params live in fp32; convolutions compute in ``dtype`` (bfloat16 by default)
which XLA maps onto the MXU; batch-norm statistics stay fp32.

Post-training int8 quantization (round 4, DESIGN §19/§20): backbone convs
optionally run as int8 x int8 -> int32 MXU ops — v5e doubles its matmul
peak in int8 and the judged backbones are HBM-bandwidth-bound, so int8
halves the bytes of exactly the stages the rooflines say are stuck.  The
``quant`` attribute threads through ConvBN/SeparableConvBN:

  None          production bf16 path (nn.Conv), byte-identical to round 3
  "calibrate"   bf16 math + record each conv input's absolute max into a
                ``quant`` variables collection (one scalar per conv)
  "int8"        per-output-channel symmetric int8 weights, per-tensor
                static int8 activations from the calibrated amax; conv in
                int8 with int32 accumulation, dequantized into the bf16
                epilogue (BN affine + ReLU fuse exactly as before)

Weight quantization happens inside the call so trained fp32 checkpoints
load unchanged (same param tree); on the ``jax.export`` serving path the
weights are closed-over constants, so XLA constant-folds the
round/clip/cast and the artifact carries int8 weights.
"""

from __future__ import annotations

from typing import Any, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn
from jax import lax

Dtype = Any


def _conv_act8(x, kernel, *, strides, padding, rhs_dilation,
               dimension_numbers, feature_group_count):
    """bf16 conv whose BACKWARD reads an int8 copy of the activation.

    conv(x, k) is bilinear: dL/dx = f(g, k) (independent of x, exact here)
    and dL/dk = f(g, x) (reads the saved activation).  Saving x as int8 +
    one fp32 scale halves the backward's saved-activation HBM traffic; the
    only approximation is quantization noise in the filter gradient.
    """
    conv = lambda x_, k_: lax.conv_general_dilated(
        x_, k_, strides, padding, rhs_dilation=rhs_dilation,
        dimension_numbers=dimension_numbers,
        feature_group_count=feature_group_count)

    @jax.custom_vjp
    def conv8(x_, k_):
        return conv(x_, k_)

    xdtype = x.dtype

    def conv8_fwd(x_, k_):
        y = conv(x_, k_)
        s = jnp.max(jnp.abs(x_.astype(jnp.float32))) / 127.0 + 1e-12
        xq = jnp.clip(jnp.round(x_.astype(jnp.float32) / s),
                      -127, 127).astype(jnp.int8)
        return y, (xq, s, k_)

    def conv8_bwd(res, g):
        xq, s, k_ = res
        xa = (xq.astype(jnp.float32) * s).astype(xdtype)
        _, vjp = jax.vjp(conv, xa, k_)
        return vjp(g)

    conv8.defvjp(conv8_fwd, conv8_bwd)
    return conv8(x, kernel)


class QuantConv(nn.Module):
    """Drop-in conv for ConvBN/SeparableConvBN's quantized modes.

    Mirrors ``nn.Conv``'s parameter structure exactly (``kernel`` fp32
    [kh, kw, cin/groups, cout], optional ``bias``) so a variables pytree
    trained with the normal path loads without remapping; adds one scalar
    ``act_amax`` in the ``quant`` collection (the static activation range,
    filled by a calibration pass with ``mutable=["quant"]``).
    """
    features: int
    kernel_size: Tuple[int, int]
    strides: Tuple[int, int] = (1, 1)
    kernel_dilation: Tuple[int, int] = (1, 1)
    padding: Any = "SAME"
    feature_group_count: int = 1
    use_bias: bool = False
    mode: str = "calibrate"               # "calibrate" | "int8" | "act8"
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        cin = x.shape[-1]
        kshape = (*self.kernel_size, cin // self.feature_group_count,
                  self.features)
        kernel = self.param("kernel", nn.initializers.lecun_normal(),
                            kshape, jnp.float32)
        dn = lax.conv_dimension_numbers(x.shape, kshape,
                                        ("NHWC", "HWIO", "NHWC"))
        if self.mode == "act8":
            # TRAINING probe (DESIGN §11/§17 follow-up): forward math is
            # the plain bf16 conv, but the activation saved for backward is
            # a dynamically-scaled int8 copy — conv is bilinear, so dL/dx
            # needs only (g, kernel) and stays EXACT; dL/dkernel reads the
            # int8 activation (quantization noise in the filter grad only).
            # Halves the saved-activation HBM bytes of the bandwidth-bound
            # backbone backward without remat's recompute cost.
            y = _conv_act8(x.astype(self.dtype), kernel.astype(self.dtype),
                           strides=self.strides, padding=self.padding,
                           rhs_dilation=self.kernel_dilation,
                           dimension_numbers=dn,
                           feature_group_count=self.feature_group_count)
            if self.use_bias:
                b = self.param("bias", nn.initializers.zeros,
                               (self.features,), jnp.float32)
                y = y + b.astype(y.dtype)
            return y
        amax = self.variable("quant", "act_amax",
                             lambda: jnp.zeros((), jnp.float32))
        if self.mode == "calibrate" or self.mode.startswith("calibrate:p"):
            # "calibrate"        running abs-max (the default statistic)
            # "calibrate:p99.9"  running max of per-batch 99.9th-percentile
            #                    |x| — clips the scale below rare outliers
            #                    (one hot pixel through a high-gain conv
            #                    would otherwise set the whole tensor's
            #                    scale; saturating the 0.1% tail costs far
            #                    less resolution than stretching the grid
            #                    over it).  Estimated on a deterministic
            #                    <=2^20-element strided subsample: a full
            #                    sort of an 82M-element activation is
            #                    offline-tolerable but pointless when the
            #                    tail estimate converges at ~1k tail
            #                    samples.
            if not self.is_initializing():
                absx = jnp.abs(x.astype(jnp.float32)).ravel()
                if self.mode == "calibrate":
                    obs = jnp.max(absx)
                else:
                    pct = float(self.mode.split(":p", 1)[1])
                    cap = 1 << 20
                    if absx.size > cap:
                        stride = absx.size // cap
                        absx = absx[:stride * cap:stride]
                    obs = jnp.percentile(absx, pct)
                amax.value = jnp.maximum(amax.value, obs)
            y = lax.conv_general_dilated(
                x.astype(self.dtype), kernel.astype(self.dtype),
                self.strides, self.padding,
                rhs_dilation=self.kernel_dilation, dimension_numbers=dn,
                feature_group_count=self.feature_group_count)
        elif self.mode == "int8":
            if kernel.dtype == jnp.int8:
                # Pre-quantized pytree (quant.prequantize: container export
                # path, where weights are runtime ARGUMENTS and in-graph
                # quantization could not constant-fold — the artifact must
                # read int8 from HBM, not quantize fp32 per call).  The
                # per-channel scales were computed by the identical formula
                # below and live alongside act_amax.
                sw = self.variable(
                    "quant", "w_scale",
                    lambda: jnp.ones((self.features,), jnp.float32)).value
                kq = kernel
            else:
                # Per-output-channel symmetric weight scales: amax over
                # (kh, kw, cin) per cout — int32 accumulators rescale with
                # one [cout] multiply the VPU fuses into the dequant
                # epilogue.  With weights closed over (single-artifact
                # export, live model) XLA constant-folds kq to real int8.
                sw = jnp.maximum(jnp.max(jnp.abs(kernel), axis=(0, 1, 2)),
                                 1e-8) / 127.0                 # [cout]
                kq = jnp.clip(jnp.round(kernel / sw),
                              -127, 127).astype(jnp.int8)
            sx = jnp.maximum(amax.value, 1e-6) / 127.0         # scalar
            xq = jnp.clip(jnp.round(x.astype(jnp.float32) / sx),
                          -127, 127).astype(jnp.int8)
            yi = lax.conv_general_dilated(
                xq, kq, self.strides, self.padding,
                rhs_dilation=self.kernel_dilation, dimension_numbers=dn,
                feature_group_count=self.feature_group_count,
                preferred_element_type=jnp.int32)
            y = (yi.astype(jnp.float32) * (sx * sw)).astype(self.dtype)
        else:
            raise ValueError(f"unknown QuantConv mode {self.mode!r}")
        if self.use_bias:
            b = self.param("bias", nn.initializers.zeros,
                           (self.features,), jnp.float32)
            y = y + b.astype(y.dtype)
        return y


class BatchNorm2D(nn.Module):
    """Batch normalization tuned for TPU inference throughput.

    Training: statistics in fp32 over (N, H, W) — numerically identical to
    the standard formulation.  Inference: the running stats fold into a
    single per-channel ``x * inv + bias`` affine evaluated in the compute
    dtype, so XLA fuses it into the adjacent convolution's epilogue instead
    of round-tripping the activation through fp32 HBM (the naive fp32-BN
    path cost ~2x the backbone's whole HBM budget at 800px).
    """
    momentum: float = 0.99
    # 1e-5 matches BOTH lineages this model loads weights from: torchvision
    # BatchNorm2d (the pretrained graft, utils/pretrained.py) and TF-slim's
    # resnet_arg_scope(batch_norm_epsilon=1e-5) in the reference.  A larger
    # epsilon systematically mis-scales channels with small running_var
    # (round-4 review finding).
    epsilon: float = 1e-5
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        c = x.shape[-1]
        gamma = self.param("scale", nn.initializers.ones, (c,), jnp.float32)
        beta = self.param("bias", nn.initializers.zeros, (c,), jnp.float32)
        ra_mean = self.variable("batch_stats", "mean",
                                nn.initializers.zeros, None, (c,), jnp.float32)
        ra_var = self.variable("batch_stats", "var",
                               nn.initializers.ones, None, (c,), jnp.float32)
        if train:
            # E[x], E[x^2] in ONE pass (XLA fuses both reduces over the same
            # input into a single kernel) instead of mean + var's two full
            # HBM sweeps; fp32 accumulators keep the E[x^2]-E[x]^2 form
            # well-conditioned for bf16 activations.
            xf = x.astype(jnp.float32)
            mean = xf.mean(axis=(0, 1, 2))
            sq = (xf * xf).mean(axis=(0, 1, 2))
            var = jnp.maximum(sq - mean * mean, 0.0)
            if not self.is_initializing():
                m = self.momentum
                ra_mean.value = m * ra_mean.value + (1 - m) * mean
                ra_var.value = m * ra_var.value + (1 - m) * var
        else:
            mean, var = ra_mean.value, ra_var.value
        inv = gamma * jax.lax.rsqrt(var + self.epsilon)
        bias = beta - mean * inv
        return (x * inv.astype(x.dtype) + bias.astype(x.dtype))


class ConvBN(nn.Module):
    """Conv → BatchNorm → (optional) ReLU, the workhorse block.

    ``padding="EXPLICIT"`` applies symmetric (k-1)//2 * dilation padding —
    the slim ``conv2d_same`` / torch convention, which differs from XLA SAME
    only at stride > 1 (SAME pads asymmetrically right/bottom).  Needed for
    numerical parity with pretrained torchvision/slim checkpoints.
    """
    features: int
    kernel: Tuple[int, int] = (3, 3)
    strides: Tuple[int, int] = (1, 1)
    dilation: Tuple[int, int] = (1, 1)
    relu: bool = True
    use_bn: bool = True
    padding: Any = "SAME"
    quant: Any = None          # None | "calibrate" | "int8" (module doc)
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        padding = self.padding
        if padding == "EXPLICIT":
            padding = tuple(
                ((k - 1) // 2 * d, (k - 1) // 2 * d)
                for k, d in zip(self.kernel, self.dilation))
        if self.quant is None:
            x = nn.Conv(self.features, self.kernel, strides=self.strides,
                        kernel_dilation=self.dilation, padding=padding,
                        use_bias=not self.use_bn, dtype=self.dtype,
                        param_dtype=jnp.float32)(x)
        else:
            # name="Conv_0" replicates nn.Conv's auto-name so the param
            # tree is identical and trained checkpoints load unchanged
            x = QuantConv(self.features, self.kernel, strides=self.strides,
                          kernel_dilation=self.dilation, padding=padding,
                          use_bias=not self.use_bn, mode=self.quant,
                          dtype=self.dtype, name="Conv_0")(x)
        if self.use_bn:
            x = BatchNorm2D(dtype=self.dtype, name="bn")(x, train)
        if self.relu:
            x = nn.relu(x)
        return x


class _ConvKernel(nn.Module):
    """Parameter-only stand-in for an ``nn.Conv`` (fused inference path):
    declares the identical ``kernel`` leaf so trained checkpoints load
    unchanged, but returns the raw weights for a hand-fused Pallas op."""
    shape: Tuple[int, ...]

    @nn.compact
    def __call__(self) -> jnp.ndarray:
        return self.param("kernel", nn.initializers.lecun_normal(),
                          self.shape, jnp.float32)


class _FoldedBN(nn.Module):
    """Parameter-only stand-in for ``BatchNorm2D`` (fused inference path):
    identical param/batch_stats leaves; returns the inference-folded
    per-channel (scale, bias) affine instead of applying it."""
    epsilon: float = 1e-5

    @nn.compact
    def __call__(self, c: int) -> Tuple[jnp.ndarray, jnp.ndarray]:
        gamma = self.param("scale", nn.initializers.ones, (c,), jnp.float32)
        beta = self.param("bias", nn.initializers.zeros, (c,), jnp.float32)
        mean = self.variable("batch_stats", "mean", nn.initializers.zeros,
                             None, (c,), jnp.float32).value
        var = self.variable("batch_stats", "var", nn.initializers.ones,
                            None, (c,), jnp.float32).value
        inv = gamma * jax.lax.rsqrt(var + self.epsilon)
        return inv, beta - mean * inv


class SeparableConvBN(nn.Module):
    """Depthwise-separable conv: depthwise 3x3 → pointwise 1x1, each + BN.

    The Xception-lite building block (SURVEY.md §2.4 N2).

    ``dense=True`` swaps the depthwise+pointwise pair for ONE dense 3x3
    convolution with the same interface — the TPU-first choice for early
    high-resolution stages: a depthwise conv does 9C MACs/pixel at tiny
    arithmetic intensity (VPU-bound, and its filter backward is the single
    slowest conv family on TPU), while a dense 3x3 at the same width is
    MXU-shaped.  Profiled on the 800px/batch-16 train step, the dense form
    of stages 1-2 is ~2.5x faster than separable at equal width.

    ``fused=True`` routes INFERENCE (train=False, stride 1, no quant) calls
    through the single-HBM-pass Pallas kernel
    (ops/pallas/fused_sepconv.py): dw3x3 -> 1x1 -> folded-BN -> ReLU with
    the depthwise intermediate kept in VMEM — the backbone is
    HBM-bandwidth-bound (DESIGN §11/§14), so deleting that round trip is
    the measured config-3 lever.  The param tree is identical to the
    unfused path (checkpoints load unchanged); training and stride-2 calls
    keep the standard path.
    """
    features: int
    strides: Tuple[int, int] = (1, 1)
    dilation: Tuple[int, int] = (1, 1)
    relu: bool = True
    dense: bool = False
    fused: bool = False
    quant: Any = None          # None | "calibrate" | "int8" (module doc)
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False,
                 residual: jnp.ndarray = None) -> jnp.ndarray:
        """``residual``: optional Xception-unit shortcut — added after the
        BN affine, followed by ReLU (requires ``relu=False`` on the module:
        the unit epilogue owns the activation).  Routing it through the
        module lets the fused kernel absorb the add+relu pass."""
        if residual is not None:
            assert not self.relu, "residual epilogue owns the ReLU"
        if (self.fused and not train and self.quant is None
                and not self.dense and self.strides == (1, 1)):
            from x_detector_tpu.ops.pallas.fused_sepconv import (
                fused_separable_conv)
            assert self.dilation[0] == self.dilation[1]
            cin = x.shape[-1]
            wd = _ConvKernel((3, 3, 1, cin), name="Conv_0")()
            wp = _ConvKernel((1, 1, cin, self.features), name="Conv_1")()
            scale, bias = _FoldedBN(name="bn")(self.features)
            return fused_separable_conv(
                x.astype(self.dtype), wd.reshape(3, 3, cin),
                wp.reshape(cin, self.features), scale, bias,
                dilation=self.dilation[0],
                relu=self.relu or residual is not None,
                residual=residual)
        if self.quant is not None:
            # QuantConv named to replicate nn.Conv's auto-names so the
            # param tree matches trained checkpoints exactly
            if self.dense:
                x = QuantConv(self.features, (3, 3), strides=self.strides,
                              kernel_dilation=self.dilation, padding="SAME",
                              mode=self.quant, dtype=self.dtype,
                              name="Conv_0")(x)
            else:
                in_features = x.shape[-1]
                x = QuantConv(in_features, (3, 3), strides=self.strides,
                              kernel_dilation=self.dilation, padding="SAME",
                              feature_group_count=in_features,
                              mode=self.quant, dtype=self.dtype,
                              name="Conv_0")(x)
                x = QuantConv(self.features, (1, 1), mode=self.quant,
                              dtype=self.dtype, name="Conv_1")(x)
        elif self.dense:
            x = nn.Conv(self.features, (3, 3), strides=self.strides,
                        kernel_dilation=self.dilation, padding="SAME",
                        use_bias=False, dtype=self.dtype,
                        param_dtype=jnp.float32)(x)
        else:
            in_features = x.shape[-1]
            x = nn.Conv(in_features, (3, 3), strides=self.strides,
                        kernel_dilation=self.dilation, padding="SAME",
                        feature_group_count=in_features, use_bias=False,
                        dtype=self.dtype, param_dtype=jnp.float32)(x)
            x = nn.Conv(self.features, (1, 1), use_bias=False,
                        dtype=self.dtype, param_dtype=jnp.float32)(x)
        x = BatchNorm2D(dtype=self.dtype, name="bn")(x, train)
        if residual is not None:
            return nn.relu(x + residual)
        if self.relu:
            x = nn.relu(x)
        return x


def max_pool(x: jnp.ndarray, window: int = 3, stride: int = 2,
             explicit_pad: bool = False) -> jnp.ndarray:
    pad = ([((window - 1) // 2, (window - 1) // 2)] * 2 if explicit_pad
           else "SAME")
    return nn.max_pool(x, (window, window), strides=(stride, stride),
                       padding=pad)
