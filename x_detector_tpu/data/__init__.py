"""Data layer: VOC IO, synthetic data, fused device-side augmentation."""
