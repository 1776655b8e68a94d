"""x_detector_tpu — a TPU-native object-detection framework.

A ground-up JAX/XLA/Pallas rebuild of the capabilities of the TF1.x research
codebase HiKapok/X-Detector (Light-Head R-CNN + SSD/X-Det single-shot
detectors on Pascal VOC).  Everything is shape-static, functionally pure, and
designed for `jit` / `shard_map` over TPU meshes.

Layer map (see SURVEY.md for the reference blueprint):
  ops/       pure geometry + kernels: boxes, anchors, matching, NMS, PSROIAlign
  models/    Flax backbones (ResNet-50 v1, Xception-lite) and detector heads
  data/      VOC converter/reader, synthetic data, fused device-side augmentation
  train/     losses (CE/smooth-L1/OHEM), train step, schedules, checkpointing
  parallel/  mesh + shard_map data parallelism (psum grad sync over ICI)
  utils/     VOC mAP evaluator, drawing, logging
"""

__version__ = "0.1.0"
