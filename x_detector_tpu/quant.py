"""Post-training int8 quantization for the serving path (round 4).

DESIGN §19 measured the opportunity: both judged backbones sit at 1.06-1.44x
their bf16 HBM-bandwidth floors, v5e's MXU peak doubles in int8, and int8
halves the bytes of exactly the bandwidth-bound stages — a bounded 1.15-1.3x
end-to-end serving win, the only measured >1.15x lever left.  This module is
the subsystem that cashes it in:

  1. ``calibrate_backbone(cfg, variables, batches)`` runs the trained model
     in "calibrate" mode (bf16 math, byte-identical detections) over a few
     representative batches, recording each backbone conv input's absolute
     max into a ``quant`` variables collection (one fp32 scalar per conv).
  2. A model built with ``backbone_quant="int8"`` then runs every backbone
     conv as int8 x int8 -> int32 on the MXU: per-output-channel symmetric
     weight scales (computed from the fp32 params in-graph, so checkpoints
     load unchanged and ``jax.export`` constant-folds the weights to int8
     in the artifact) and per-tensor static activation scales from step 1.

Heads, proposal machinery, and NMS stay bf16/fp32 — the Amdahl split from
DESIGN §19 (they are MXU-efficient already; quantizing them buys nothing
and risks box-regression accuracy).

The reference has no quantization counterpart (SURVEY.md §5: serving is
this rebuild's deliberate addition).

Usage (also wired into ``cli/export.py --quant int8``):

    from x_detector_tpu import quant
    qv = quant.calibrate_backbone(cfg, variables, calib_batches)
    qmodel = quant.build_detector(
        dataclasses.replace(cfg.model, backbone_quant="int8"))
    det = qmodel.apply({**variables, "quant": qv}, images, train=False)
"""

from __future__ import annotations

import dataclasses
from typing import Any, Iterable

import jax
import jax.numpy as jnp

from x_detector_tpu.config import ExperimentConfig


def build_detector(model_cfg, dtype: Any = jnp.bfloat16):
    """Family-dispatch detector factory (same switch and same unknown-
    family validation as trainer.create_model_and_state)."""
    from x_detector_tpu.models.lighthead import LightHeadRCNN
    from x_detector_tpu.models.ssd import SSDModel
    if model_cfg.family == "ssd":
        return SSDModel(config=model_cfg, dtype=dtype)
    if model_cfg.family == "lighthead":
        return LightHeadRCNN(config=model_cfg, dtype=dtype)
    raise ValueError(f"unknown family {model_cfg.family!r}")


def calibrate_backbone(cfg: ExperimentConfig, variables: dict,
                       batches: Iterable[jnp.ndarray],
                       dtype: Any = jnp.bfloat16,
                       percentile: float = 100.0) -> dict:
    """Collect static activation ranges for every backbone conv.

    ``variables`` is the trained {"params", "batch_stats"} pytree;
    ``batches`` yields eval-preprocessed image batches [B, S, S, 3].
    Returns the ``quant`` collection (running max over all batches) to pass
    alongside the params when applying an ``backbone_quant="int8"`` model.

    ``percentile`` < 100 swaps the per-batch statistic from abs-max to the
    percentile of |x| (running max across batches either way) — the
    outlier-robust scale for heavy-tailed real-image activations, where one
    hot pixel through a high-gain conv would otherwise set the whole
    tensor's scale (layers.QuantConv documents the estimator;
    tools/calib_sensitivity.py measures the mAP effect of the choice).
    """
    mode = ("calibrate" if percentile >= 100.0
            else f"calibrate:p{percentile}")
    mcfg = dataclasses.replace(cfg.model, backbone_quant=mode)
    model = build_detector(mcfg, dtype)
    base = {k: v for k, v in variables.items() if k != "quant"}

    @jax.jit
    def first(images):
        _, mut = model.apply(base, images, train=False, mutable=["quant"])
        return mut["quant"]

    @jax.jit
    def update(qv, images):
        _, mut = model.apply(dict(base, quant=qv), images, train=False,
                             mutable=["quant"])
        return mut["quant"]

    qv = None
    for images in batches:
        qv = first(images) if qv is None else update(qv, images)
    if qv is None:
        raise ValueError("calibrate_backbone needs at least one batch")
    return jax.device_get(qv)


def prequantize(variables: dict) -> dict:
    """Bake the per-channel int8 weight quantization into the pytree.

    For the live model and single-artifact export the weights are
    closed-over constants, so QuantConv's in-graph quantization
    constant-folds to real int8 in the compiled program.  The shared-weights
    container is different: its graphs take the pytree as a runtime
    ARGUMENT, so nothing folds — an fp32-weight container would re-read and
    re-quantize every kernel on every call, forfeiting exactly the HBM
    traffic int8 exists to halve.  This transform quantizes each calibrated
    backbone conv's kernel host-side with the SAME formula QuantConv uses
    (outputs agree to within 1-ulp scale-rounding differences between the
    separately compiled reductions — tested) and stores the [cout] scale
    next to that conv's ``act_amax``; QuantConv detects the int8 kernel
    dtype and skips the in-graph quantization.

    ``variables`` must carry a calibrated ``quant`` collection; returns a
    new variables dict (int8 kernels in ``params``, ``w_scale`` entries in
    ``quant``).
    """
    import copy

    if "quant" not in variables:
        raise ValueError("prequantize needs a calibrated 'quant' collection "
                         "(run calibrate_backbone first)")
    params = copy.deepcopy(jax.device_get(variables["params"]))
    quantc = copy.deepcopy(jax.device_get(variables["quant"]))

    def walk(qnode, pnode):
        n = 0
        for k, v in list(qnode.items()):
            if isinstance(v, dict):
                n += walk(v, pnode[k])
        if "act_amax" in qnode:
            if jnp.asarray(pnode["kernel"]).dtype == jnp.int8:
                # Re-quantizing int8 values would compute sw ~= 1.0 and
                # overwrite the real w_scale — silent weight corruption.
                raise ValueError("kernel is already int8: prequantize was "
                                 "applied twice to this pytree")
            amax = float(jnp.max(jnp.asarray(qnode["act_amax"])))
            if not amax > 0.0:
                raise ValueError(
                    "act_amax is not positive: the 'quant' collection is "
                    "uncalibrated (zeros init) — run calibrate_backbone "
                    "over representative batches first; quantizing with a "
                    "zero scale would saturate every activation to ±127")
            kernel = jnp.asarray(pnode["kernel"], jnp.float32)
            sw = jnp.maximum(jnp.max(jnp.abs(kernel), axis=(0, 1, 2)),
                             1e-8) / 127.0
            pnode["kernel"] = jax.device_get(
                jnp.clip(jnp.round(kernel / sw), -127, 127).astype(jnp.int8))
            qnode["w_scale"] = jax.device_get(sw)
            n += 1
        return n

    if walk(quantc, params) == 0:
        raise ValueError("no calibrated convs found in the quant collection")
    return dict(variables, params=params, quant=quantc)
