"""Shared conv building blocks (NHWC, mixed precision).

Numerics policy (SURVEY.md §7: bf16 matmul/conv, fp32 accumulation/params):
params live in fp32; convolutions compute in ``dtype`` (bfloat16 by default)
which XLA maps onto the MXU; batch-norm statistics stay fp32.
"""

from __future__ import annotations

from typing import Any, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

Dtype = Any


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
    epsilon: float = 1e-4
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
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        padding = self.padding
        if padding == "EXPLICIT":
            padding = tuple(
                ((k - 1) // 2 * d, (k - 1) // 2 * d)
                for k, d in zip(self.kernel, self.dilation))
        x = nn.Conv(self.features, self.kernel, strides=self.strides,
                    kernel_dilation=self.dilation, padding=padding,
                    use_bias=not self.use_bn, dtype=self.dtype,
                    param_dtype=jnp.float32)(x)
        if self.use_bn:
            x = BatchNorm2D(dtype=self.dtype, name="bn")(x, train)
        if self.relu:
            x = nn.relu(x)
        return x


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
    """
    features: int
    strides: Tuple[int, int] = (1, 1)
    dilation: Tuple[int, int] = (1, 1)
    relu: bool = True
    dense: bool = False
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        if self.dense:
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
        if self.relu:
            x = nn.relu(x)
        return x


def max_pool(x: jnp.ndarray, window: int = 3, stride: int = 2,
             explicit_pad: bool = False) -> jnp.ndarray:
    pad = ([((window - 1) // 2, (window - 1) // 2)] * 2 if explicit_pad
           else "SAME")
    return nn.max_pool(x, (window, window), strides=(stride, stride),
                       padding=pad)
