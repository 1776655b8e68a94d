"""End-to-end integration: overfit a fixed synthetic set to mAP 1.0.

The reference's only integration test was training-to-mAP (SURVEY.md §4);
this is the condensed equivalent: 8 fixed colored-rectangle images, ~120 SGD
steps, then the full detection path (forward -> decode -> batched NMS ->
VOC evaluator) must recover every object.

Detections are scored with batch statistics (train-mode BN): running
averages need thousands of steps to converge and their lag is not what this
test is about (verified separately: with converged stats the same pipeline
scores identically).
"""

import dataclasses

import pytest
import jax
import jax.numpy as jnp
import numpy as np

from test_train import small_ssd_cfg
from x_detector_tpu.data.synthetic import synthetic_batches
from x_detector_tpu.models.detector import postprocess_detections
from x_detector_tpu.models.ssd import build_ssd_anchors
from x_detector_tpu.train.trainer import (create_model_and_state,
                                          make_train_step)
from x_detector_tpu.utils.metrics_voc import VOCEvaluator


@pytest.mark.slow  # ~11 min on the 1-core host: 120 full train steps
def test_overfit_to_perfect_map():
    cfg = small_ssd_cfg()
    cfg = dataclasses.replace(
        cfg, train=dataclasses.replace(cfg.train, batch_size=8,
                                       learning_rate=1e-2))
    it = synthetic_batches(0, 8, 64, cfg.data.max_gt_boxes, num_classes=4)
    fixed = next(it)
    batch = {k: jnp.asarray(v) for k, v in fixed.items()}
    batch = dict(batch, image=(batch["image"] - 115.0) / 60.0)

    model, state = create_model_and_state(cfg, jax.random.PRNGKey(0),
                                          dtype=jnp.float32)
    step_fn = jax.jit(make_train_step(model, cfg))
    for i in range(120):
        state, metrics = step_fn(state, batch, jax.random.PRNGKey(i))
    assert float(metrics["total_loss"]) < 0.2, "did not overfit"

    variables = {"params": state.params, "batch_stats": state.batch_stats}
    (cls, loc), _ = model.apply(variables, batch["image"], train=True,
                                mutable=["batch_stats"])
    anchors = jnp.asarray(build_ssd_anchors(cfg.model))
    det = postprocess_detections(loc, cls, anchors, max_output=20,
                                 score_threshold=0.3)
    ev = VOCEvaluator(num_classes=20)
    for i in range(8):
        m = np.asarray(batch["gt_mask"][i])
        ev.add_ground_truth(f"i{i}", np.asarray(batch["gt_boxes"][i])[m],
                            np.asarray(batch["gt_labels"][i])[m])
        v = np.asarray(det.valid[i])
        ev.add_detections(f"i{i}", np.asarray(det.boxes[i])[v],
                          np.asarray(det.scores[i])[v],
                          np.asarray(det.classes[i])[v])
    res = ev.evaluate()
    assert res["mAP"] > 0.95, f"overfit mAP {res['mAP']}: {res}"
