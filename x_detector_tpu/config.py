"""Typed, frozen, hashable configuration for the whole framework.

The reference drives every entry script through flat ``tf.app.flags``
(SURVEY.md §5 "Config / flag system"); here configuration is a tree of frozen
dataclasses so that configs are hashable and safe to pass as ``jit`` static
arguments, and presets mirror the five judged BASELINE configurations.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple


# Pascal VOC classes; index 0 is background, matching the reference's 21-way
# classifier (SURVEY.md §2.1 D1: fixed 20-class VOC label map, background=0).
VOC_CLASSES: Tuple[str, ...] = (
    "background",
    "aeroplane", "bicycle", "bird", "boat", "bottle",
    "bus", "car", "cat", "chair", "cow",
    "diningtable", "dog", "horse", "motorbike", "person",
    "pottedplant", "sheep", "sofa", "train", "tvmonitor",
)
NUM_VOC_CLASSES = len(VOC_CLASSES)  # 21 including background


@dataclasses.dataclass(frozen=True)
class AnchorConfig:
    """Anchor-grid spec.

    RPN default mirrors the Light-Head R-CNN paper spec (SURVEY.md §2.3 A1):
    one stride-16 grid with 5 scales x 3 aspect ratios = 15 anchors/cell.
    """
    stride: int = 16
    scales: Tuple[float, ...] = (32.0, 64.0, 128.0, 256.0, 512.0)
    ratios: Tuple[float, ...] = (0.5, 1.0, 2.0)

    @property
    def num_anchors(self) -> int:
        return len(self.scales) * len(self.ratios)


@dataclasses.dataclass(frozen=True)
class SSDAnchorConfig:
    """Multi-layer SSD anchor spec (SURVEY.md §2.3 A1, SSD lineage).

    ``scale_min``..``scale_max`` are interpolated linearly over the feature
    layers; each layer also gets the geometric-mean "extra" scale anchor with
    ratio 1 (SSD paper §2.2).
    """
    strides: Tuple[int, ...] = (8, 16, 32, 64, 128)
    scale_min: float = 0.10
    scale_max: float = 0.90
    ratios: Tuple[float, ...] = (1.0, 2.0, 0.5, 3.0, 1.0 / 3.0)

    @property
    def num_layers(self) -> int:
        return len(self.strides)

    @property
    def anchors_per_cell(self) -> int:
        return len(self.ratios) + 1  # + extra sqrt-scale anchor at ratio 1


# Prior-box encode/decode variances, SSD lineage (SURVEY.md §2.3 A2).
PRIOR_SCALING: Tuple[float, float, float, float] = (0.1, 0.1, 0.2, 0.2)


@dataclasses.dataclass(frozen=True)
class NMSConfig:
    iou_threshold: float = 0.45
    score_threshold: float = 0.01
    max_output: int = 200
    # opt-in MaxpoolNMS approximation for the single-shot eval tail
    # (ops/maxpool_nms.py): local-max selection on the per-layer score maps
    # replaces exact per-class greedy NMS. A/B'd in tools/fast_nms_ab.py.
    fast_mode: bool = False
    # TPU-native approx_max_k candidate prefilter in multiclass NMS (the
    # greedy NMS itself stays exact): 2.8x faster config-2 tail at 99.3%
    # candidate recall (tools/bench_nms_tail.py; ops/nms.py docstring).
    approx_prefilter: bool = False


@dataclasses.dataclass(frozen=True)
class ProposalConfig:
    """RPN proposal-stage spec (SURVEY.md §2.4 N5).

    All sizes are static: top-``pre_nms_topk`` by score, NMS at
    ``nms_threshold``, padded to exactly ``post_nms_topk`` outputs.
    Train/eval budgets follow the two-stage convention (SURVEY.md §2.4 N5:
    larger pre-NMS pool during training, smaller at test time).
    """
    pre_nms_topk: int = 6000
    post_nms_topk: int = 1000
    pre_nms_topk_eval: int = 1000
    post_nms_topk_eval: int = 512
    nms_threshold: float = 0.7
    min_size: float = 4.0  # pixels; degenerate-proposal filter
    # opt-in MaxpoolNMS approximation for the proposal stage
    # (ops/maxpool_nms.py): per-scale local-max on the RPN objectness maps
    # replaces exact greedy NMS. A/B'd in tools/fast_nms_ab.py.
    fast_nms: bool = False


@dataclasses.dataclass(frozen=True)
class ModelConfig:
    """Detector architecture spec."""
    name: str = "lighthead_resnet50"
    backbone: str = "resnet50"            # "resnet50" | "xception_lite"
    family: str = "lighthead"             # "lighthead" | "ssd"
    # Backbone capacity overrides (None = the family default: ResNet-50
    # stage sizes / Xception-lite unit counts and widths). Tests use tiny
    # values so CI compile/step cost tracks what the test exercises, not
    # production depth.
    backbone_stages: Optional[Tuple[int, ...]] = None
    backbone_widths: Optional[Tuple[int, ...]] = None
    # First N backbone stages recompute forward in backward (nn.remat):
    # trades cheap recompute FLOPs for saved-activation HBM traffic on the
    # bandwidth-bound backbone backward (DESIGN §11/§17). Training-only
    # effect; inference is untouched.
    backbone_remat_stages: int = 0
    # Backbone conv precision (models/layers.py QuantConv):
    # None = bf16 production path; "calibrate" = bf16 + record activation
    # ranges into the "quant" collection; "int8" = per-channel int8 weights
    # + calibrated per-tensor int8 activations (heads/NMS stay bf16/fp32 —
    # the Amdahl split DESIGN §19 measured); "act8" = TRAINING probe: bf16
    # forward, conv-backward saved activations stored int8 (exact dL/dx,
    # quantized filter grad).
    backbone_quant: Optional[str] = None
    # Inference-only Pallas fusion of Xception-lite's stride-1 separable
    # blocks (dw3x3 -> 1x1 -> folded BN -> ReLU in one HBM pass,
    # ops/pallas/fused_sepconv.py) — deletes the depthwise intermediate's
    # HBM round trip on the bandwidth-bound backbone.  xception_lite only;
    # setting it with a ResNet backbone is an error (no separable convs).
    backbone_fused_sepconv: bool = False
    num_classes: int = NUM_VOC_CLASSES
    image_size: int = 800                 # square static input
    # Light-Head pieces (SURVEY.md §2.4 N3/N6):
    thin_channels: int = 490              # 10 * 7 * 7
    large_sep_kernel: int = 15
    large_sep_mid: int = 256              # 64 small / 256 large variant
    roi_grid: int = 7
    rpn_mid: int = 256
    head_dim: int = 2048
    class_agnostic_box: bool = True
    fpn_fusion: bool = False              # X-Det-style top-down fusion (N7)
    anchors: AnchorConfig = AnchorConfig()
    ssd_anchors: SSDAnchorConfig = SSDAnchorConfig()
    proposals: ProposalConfig = ProposalConfig()
    nms: NMSConfig = NMSConfig()
    # numerics
    compute_dtype: str = "bfloat16"       # activations/weights in matmul/conv
    param_dtype: str = "float32"


@dataclasses.dataclass(frozen=True)
class DataConfig:
    """Data + augmentation spec (SURVEY.md §2.2 P1–P4)."""
    image_size: int = 800
    max_gt_boxes: int = 100               # static pad for per-image gt
    # *difficult* VOC objects are excluded from training targets by default
    # (reference lineage; the eval metric handles them separately).
    include_difficult: bool = False
    # aspect-preserving letterbox onto the square canvas (reference keeps
    # aspect via short-side resize; square-squash is the default divergence,
    # DESIGN.md §10). Boxes are re-normalized to canvas coordinates.
    letterbox: bool = False
    # distorted-bbox crop (P1)
    min_object_covered: float = 0.25
    box_keep_coverage: float = 0.25   # drop gt whose crop coverage is below
    aspect_ratio_range: Tuple[float, float] = (0.5, 2.0)
    area_range: Tuple[float, float] = (0.1, 1.0)
    crop_attempts: int = 50
    # crop-size distribution: "tf" = TF-oracle-faithful (height uniform in
    # the clamped feasible range; KS-matched to
    # tf.image.sample_distorted_bounding_box); "r1" = the round-1 sampler
    # (area uniform, oversize trials rejected) — kept selectable to
    # attribute the capstone mAP delta between rounds (tools/fast_nms_ab.py
    # sibling A/B; round-2 verdict item 6).
    crop_sampler: str = "tf"
    # color jitter (P2)
    brightness_max_delta: float = 32.0 / 255.0
    contrast_range: Tuple[float, float] = (0.5, 1.5)
    saturation_range: Tuple[float, float] = (0.5, 1.5)
    hue_max_delta: float = 0.2
    # normalization (P3) — VGG means, RGB order
    pixel_means: Tuple[float, float, float] = (123.68, 116.779, 103.939)


@dataclasses.dataclass(frozen=True)
class TrainConfig:
    """Optimization spec (SURVEY.md §2.6 T1/T2)."""
    batch_size: int = 8
    learning_rate: float = 1e-3
    lr_boundaries: Tuple[int, ...] = (80000, 100000)
    lr_decays: Tuple[float, ...] = (1.0, 0.1, 0.01)
    warmup_steps: int = 500
    momentum: float = 0.9
    weight_decay: float = 1e-4
    total_steps: int = 120000
    # RPN minibatch sampling (Faster R-CNN spec): 256 anchors, up to half pos
    rpn_batch_size: int = 256
    rpn_fg_fraction: float = 0.5
    rpn_pos_iou: float = 0.7
    rpn_neg_iou: float = 0.3
    # ROI head: OHEM top-B hardest kept for backprop
    ohem_topk: int = 256
    roi_fg_iou: float = 0.5
    roi_bg_iou_hi: float = 0.5
    roi_bg_iou_lo: float = 0.0
    # single-shot: hard-negative mining ratio neg:pos
    neg_pos_ratio: float = 3.0
    ssd_match_iou: float = 0.5
    ema_decay: float = 0.0            # 0 disables the EMA shadow
    # Gradient accumulation: split each step's batch into N sequential
    # microbatches, average grads/BN-stats/metrics, apply ONE optimizer
    # update.  Numerically matches N-way data parallelism with the same
    # per-device batch (grads pmean'd, BN stats pmean'd from the
    # step-initial running stats) — lets one chip emulate a config-5
    # global batch at 1/N the activation memory.  Priced on-chip
    # (DESIGN §22): ~2.1x step time at N=4 for ~1.9x lower peak HBM —
    # scale with DP first; accumulate only past the HBM ceiling.
    grad_accum_steps: int = 1
    checkpoint_every: int = 1000
    keep_checkpoints: int = 5
    seed: int = 0


@dataclasses.dataclass(frozen=True)
class ExperimentConfig:
    model: ModelConfig = ModelConfig()
    data: DataConfig = DataConfig()
    train: TrainConfig = TrainConfig()


# ---------------------------------------------------------------------------
# Presets mirroring the five judged configurations in BASELINE.json.
# ---------------------------------------------------------------------------

def lighthead_resnet50(image_size: int = 800) -> ExperimentConfig:
    """BASELINE configs 1/4/5: Light-Head R-CNN, ResNet-50 backbone.

    Letterbox is the default: the reference evaluates Light-Head at a fixed
    short side (aspect preserved, SURVEY.md §2.2 P3); the square-squash
    alternative stays available via letterbox=False."""
    return ExperimentConfig(
        model=ModelConfig(name="lighthead_resnet50", backbone="resnet50",
                          family="lighthead", image_size=image_size),
        data=DataConfig(image_size=image_size, letterbox=True),
        train=TrainConfig(batch_size=8),
    )


def lighthead_xception(image_size: int = 800) -> ExperimentConfig:
    """BASELINE config 3: Light-Head R-CNN, Xception-lite backbone."""
    return ExperimentConfig(
        model=ModelConfig(name="lighthead_xception", backbone="xception_lite",
                          family="lighthead", image_size=image_size,
                          large_sep_mid=64),
        data=DataConfig(image_size=image_size, letterbox=True),
        train=TrainConfig(batch_size=16),
    )


def ssd_resnet50(image_size: int = 512) -> ExperimentConfig:
    """BASELINE config 2: SSD/X-Det single-shot head, batched NMS."""
    return ExperimentConfig(
        model=ModelConfig(name="ssd_resnet50", backbone="resnet50",
                          family="ssd", image_size=image_size,
                          # approx_prefilter: measured +38% end-to-end
                          # (504 -> 697 img/s) at identical held-out mAP
                          # (0.4858 vs 0.4862, tools/fast_nms_ab.py)
                          nms=NMSConfig(iou_threshold=0.45,
                                        score_threshold=0.01, max_output=200,
                                        approx_prefilter=True)),
        data=DataConfig(image_size=image_size),
        # EMA shadow maintained and served by default for the single-shot
        # preset (reference T5 "maybe EMA"; eval/export prefer the shadow).
        # Decay from a measured A/B (tools/ema_ab.py, 3k-step synthetic
        # runs): 0.999 lagged badly (mAP -0.029 vs raw), 0.99 is neutral
        # (-0.001) while keeping the serving path exercised; longer real
        # runs are where EMA traditionally pays.
        train=TrainConfig(batch_size=8, ema_decay=0.99),
    )


def xdet_xception(image_size: int = 512) -> ExperimentConfig:
    """X-Det-style single-shot variant: Xception-lite backbone + top-down
    feature fusion (SURVEY.md §2.4 N7)."""
    return ExperimentConfig(
        model=ModelConfig(name="xdet_xception", backbone="xception_lite",
                          family="ssd", image_size=image_size,
                          fpn_fusion=True,
                          nms=NMSConfig(iou_threshold=0.45,
                                        score_threshold=0.01, max_output=200,
                                        approx_prefilter=True)),
        data=DataConfig(image_size=image_size),
        train=TrainConfig(batch_size=8),
    )


PRESETS = {
    "lighthead_resnet50": lighthead_resnet50,
    "lighthead_xception": lighthead_xception,
    "ssd_resnet50": ssd_resnet50,
    "xdet_xception": xdet_xception,
}
