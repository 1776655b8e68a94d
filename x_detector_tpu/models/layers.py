"""Shared conv building blocks (NHWC, mixed precision).

Numerics policy (SURVEY.md §7: bf16 matmul/conv, fp32 accumulation/params):
params live in fp32; convolutions compute in ``dtype`` (bfloat16 by default)
which XLA maps onto the MXU; batch-norm statistics stay fp32.
"""

from __future__ import annotations

from typing import Any, Callable, Sequence, Tuple, Union

import jax.numpy as jnp
from flax import linen as nn

Dtype = Any


class ConvBN(nn.Module):
    """Conv → BatchNorm → (optional) ReLU, the workhorse block."""
    features: int
    kernel: Tuple[int, int] = (3, 3)
    strides: Tuple[int, int] = (1, 1)
    dilation: Tuple[int, int] = (1, 1)
    relu: bool = True
    use_bn: bool = True
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        x = nn.Conv(self.features, self.kernel, strides=self.strides,
                    kernel_dilation=self.dilation, padding="SAME",
                    use_bias=not self.use_bn, dtype=self.dtype,
                    param_dtype=jnp.float32)(x)
        if self.use_bn:
            # BN in fp32 for stable statistics, output cast back to dtype.
            x = nn.BatchNorm(use_running_average=not train, momentum=0.997,
                             epsilon=1e-4, dtype=jnp.float32)(
                x.astype(jnp.float32)).astype(self.dtype)
        if self.relu:
            x = nn.relu(x)
        return x


class SeparableConvBN(nn.Module):
    """Depthwise-separable conv: depthwise 3x3 → pointwise 1x1, each + BN.

    The Xception-lite building block (SURVEY.md §2.4 N2).
    """
    features: int
    strides: Tuple[int, int] = (1, 1)
    dilation: Tuple[int, int] = (1, 1)
    relu: bool = True
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        in_features = x.shape[-1]
        x = nn.Conv(in_features, (3, 3), strides=self.strides,
                    kernel_dilation=self.dilation, padding="SAME",
                    feature_group_count=in_features, use_bias=False,
                    dtype=self.dtype, param_dtype=jnp.float32)(x)
        x = nn.Conv(self.features, (1, 1), use_bias=False, dtype=self.dtype,
                    param_dtype=jnp.float32)(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.997,
                         epsilon=1e-4, dtype=jnp.float32)(
            x.astype(jnp.float32)).astype(self.dtype)
        if self.relu:
            x = nn.relu(x)
        return x


def max_pool(x: jnp.ndarray, window: int = 3, stride: int = 2) -> jnp.ndarray:
    return nn.max_pool(x, (window, window), strides=(stride, stride),
                       padding="SAME")
