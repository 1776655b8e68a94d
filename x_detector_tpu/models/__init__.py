"""Flax model zoo: backbones + detector heads (NHWC, bf16-on-MXU)."""
