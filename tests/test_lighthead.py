import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from x_detector_tpu.config import ModelConfig, ProposalConfig, NMSConfig
from x_detector_tpu.models.lighthead import (
    LightHeadRCNN, build_rpn_anchors, generate_proposals,
    lighthead_postprocess)
from x_detector_tpu.ops import boxes as box_ops


def tiny_config(backbone="resnet50"):
    return ModelConfig(
        name=f"tiny_{backbone}", backbone=backbone, family="lighthead",
        image_size=64,
        proposals=ProposalConfig(pre_nms_topk=128, post_nms_topk=32,
                                 pre_nms_topk_eval=128,
                                 post_nms_topk_eval=32,
                                 nms_threshold=0.7, min_size=2.0),
        nms=NMSConfig(max_output=20, score_threshold=0.01),
        large_sep_mid=16,
        head_dim=64,
    )


@pytest.fixture(scope="module")
def lighthead_outputs():
    cfg = tiny_config()
    model = LightHeadRCNN(config=cfg, dtype=jnp.float32)
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 64, 64, 3)) * 0.1
    # jit both: eager init/apply of the full-depth backbone cost ~25 s on
    # the 1-core host; jitted they are one cached XLA program each.
    vars_ = jax.jit(lambda k: model.init(k, x, train=False))(
        jax.random.PRNGKey(0))
    out = jax.jit(lambda v: model.apply(v, x, train=False))(vars_)
    return cfg, out


def test_output_shapes(lighthead_outputs):
    cfg, out = lighthead_outputs
    a = build_rpn_anchors(cfg).shape[0]
    assert a == 4 * 4 * 15
    assert out["rpn_cls"].shape == (2, a, 2)
    assert out["rpn_loc"].shape == (2, a, 4)
    r = cfg.proposals.post_nms_topk
    assert out["proposals"].shape == (2, r, 4)
    assert out["proposal_valid"].shape == (2, r)
    assert out["roi_cls"].shape == (2, r, cfg.num_classes)
    assert out["roi_box"].shape == (2, r, 4)
    for v in out.values():
        assert np.isfinite(np.asarray(v)).all()


def test_proposals_are_valid_boxes(lighthead_outputs):
    cfg, out = lighthead_outputs
    props = np.asarray(out["proposals"])
    valid = np.asarray(out["proposal_valid"])
    assert valid.any(), "expect at least some proposals from random init"
    vb = props[valid]
    assert (vb[:, 2] >= vb[:, 0]).all() and (vb[:, 3] >= vb[:, 1]).all()
    assert (vb >= 0).all() and (vb <= 1).all()


def test_postprocess_shapes(lighthead_outputs):
    cfg, out = lighthead_outputs
    det = lighthead_postprocess(out, cfg)
    assert det.boxes.shape == (2, cfg.nms.max_output, 4)
    assert det.classes.shape == (2, cfg.nms.max_output)
    b = np.asarray(det.boxes)
    assert (b >= 0).all() and (b <= 1).all()


def test_xception_variant_runs():
    cfg = tiny_config("xception_lite")
    model = LightHeadRCNN(config=cfg, dtype=jnp.float32)
    x = jnp.zeros((1, 64, 64, 3))
    vars_ = model.init(jax.random.PRNGKey(0), x, train=False)
    out = model.apply(vars_, x, train=False)
    assert np.isfinite(np.asarray(out["roi_cls"])).all()


def test_generate_proposals_respects_nms():
    # two identical high-score anchors at different cells decode to the same
    # box -> NMS must keep only one
    anchors = jnp.asarray([[0.1, 0.1, 0.3, 0.3],
                           [0.1, 0.1, 0.3, 0.3],
                           [0.6, 0.6, 0.9, 0.9]], jnp.float32)
    rpn_cls = jnp.asarray([[[0.0, 5.0], [0.0, 5.0], [0.0, 4.0]]])
    rpn_loc = jnp.zeros((1, 3, 4))
    cfg = ProposalConfig(pre_nms_topk=3, post_nms_topk=3, nms_threshold=0.5,
                         min_size=0.0)
    boxes, scores, valid = generate_proposals(rpn_cls, rpn_loc, anchors,
                                              cfg, image_size=100)
    assert int(valid.sum()) == 2
    kept = np.asarray(boxes[0])[np.asarray(valid[0])]
    np.testing.assert_allclose(
        sorted(kept[:, 0].tolist()), [0.1, 0.6], atol=1e-6)


def test_generate_proposals_min_size_filter():
    anchors = jnp.asarray([[0.1, 0.1, 0.101, 0.101],   # 0.1px at size 100
                           [0.5, 0.5, 0.8, 0.8]], jnp.float32)
    rpn_cls = jnp.asarray([[[0.0, 9.0], [0.0, 1.0]]])
    rpn_loc = jnp.zeros((1, 2, 4))
    cfg = ProposalConfig(pre_nms_topk=2, post_nms_topk=2, nms_threshold=0.7,
                         min_size=4.0)
    _, _, valid = generate_proposals(rpn_cls, rpn_loc, anchors, cfg,
                                     image_size=100)
    assert int(valid.sum()) == 1


def test_proposal_budgets_train_vs_eval():
    cfg = ProposalConfig(pre_nms_topk=64, post_nms_topk=16,
                         pre_nms_topk_eval=32, post_nms_topk_eval=8,
                         min_size=0.0)
    anchors = jnp.asarray(np.random.default_rng(0).uniform(
        0, 1, (100, 4)).astype(np.float32))
    anchors = jnp.sort(anchors.reshape(100, 2, 2), axis=1).reshape(100, 4)
    rpn_cls = jnp.zeros((1, 100, 2))
    rpn_loc = jnp.zeros((1, 100, 4))
    b_tr, _, _ = generate_proposals(rpn_cls, rpn_loc, anchors, cfg, 100,
                                    training=True)
    b_ev, _, _ = generate_proposals(rpn_cls, rpn_loc, anchors, cfg, 100,
                                    training=False)
    assert b_tr.shape == (1, 16, 4)
    assert b_ev.shape == (1, 8, 4)


def test_per_class_box_regression_variant():
    """class_agnostic_box=False (reference per-class-regression variant):
    roi_box comes out [B, R, C, 4] and postprocess decodes per class."""
    cfg = dataclasses.replace(tiny_config("xception_lite"),
                              class_agnostic_box=False)
    model = LightHeadRCNN(config=cfg, dtype=jnp.float32)
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 64, 64, 3)) * 0.1
    vars_ = model.init(jax.random.PRNGKey(0), x, train=False)
    out = model.apply(vars_, x, train=False)
    r = cfg.proposals.post_nms_topk_eval
    assert out["roi_box"].shape == (2, r, cfg.num_classes, 4)
    det = lighthead_postprocess(out, cfg)
    assert det.boxes.shape == (2, cfg.nms.max_output, 4)
    b = np.asarray(det.boxes)
    assert (b >= 0).all() and (b <= 1).all()
    assert np.asarray(det.classes).min() >= 0
