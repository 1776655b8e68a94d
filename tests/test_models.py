import jax
import jax.numpy as jnp
import numpy as np
import pytest

from x_detector_tpu.config import ModelConfig, ssd_resnet50
from x_detector_tpu.models.resnet import resnet50
from x_detector_tpu.models.xception import xception_lite
from x_detector_tpu.models.ssd import SSDModel, build_ssd_anchors
from x_detector_tpu.models.detector import postprocess_detections


def test_resnet50_feature_strides():
    model = resnet50(dilate_c5=True, dtype=jnp.float32)
    x = jnp.zeros((1, 64, 64, 3))
    vars_ = model.init(jax.random.PRNGKey(0), x, train=False)
    feats = model.apply(vars_, x, train=False)
    assert feats["c3"].shape == (1, 8, 8, 512)
    assert feats["c4"].shape == (1, 4, 4, 1024)
    assert feats["c5"].shape == (1, 4, 4, 2048)  # dilated: stride 16


def test_resnet50_stride32_c5():
    model = resnet50(dilate_c5=False, dtype=jnp.float32)
    x = jnp.zeros((1, 64, 64, 3))
    vars_ = model.init(jax.random.PRNGKey(0), x, train=False)
    feats = model.apply(vars_, x, train=False)
    assert feats["c5"].shape == (1, 2, 2, 2048)


def test_xception_lite_shapes():
    model = xception_lite(dtype=jnp.float32)
    x = jnp.zeros((2, 64, 64, 3))
    vars_ = model.init(jax.random.PRNGKey(0), x, train=False)
    feats = model.apply(vars_, x, train=False)
    assert feats["c3"].shape == (2, 8, 8, 256)
    assert feats["c4"].shape == (2, 4, 4, 512)
    assert feats["c5"].shape == (2, 4, 4, 1024)


def test_ssd_forward_and_postprocess():
    cfg = ssd_resnet50(image_size=64).model
    model = SSDModel(config=cfg, dtype=jnp.float32)
    x = jnp.zeros((2, 64, 64, 3))
    vars_ = jax.jit(lambda k: model.init(k, x, train=False))(
        jax.random.PRNGKey(0))
    cls_logits, box_codes = jax.jit(
        lambda v: model.apply(v, x, train=False))(vars_)
    anchors = build_ssd_anchors(cfg)
    n = anchors.shape[0]
    assert cls_logits.shape == (2, n, cfg.num_classes)
    assert box_codes.shape == (2, n, 4)
    assert np.isfinite(np.asarray(cls_logits)).all()

    out = postprocess_detections(box_codes, cls_logits,
                                 jnp.asarray(anchors), max_output=50)
    assert out.boxes.shape == (2, 50, 4)
    assert out.classes.shape == (2, 50)
    b = np.asarray(out.boxes)
    assert (b >= 0).all() and (b <= 1).all()  # clipped to image


def test_ssd_batchnorm_mutable_train_mode():
    cfg = ssd_resnet50(image_size=64).model
    model = SSDModel(config=cfg, dtype=jnp.float32)
    x = jax.random.normal(jax.random.PRNGKey(1), (1, 64, 64, 3))
    vars_ = jax.jit(lambda k: model.init(k, x, train=False))(
        jax.random.PRNGKey(0))
    (cls_logits, _), new_state = jax.jit(
        lambda v: model.apply(v, x, train=True,
                              mutable=["batch_stats"]))(vars_)
    assert "batch_stats" in new_state
    assert np.isfinite(np.asarray(cls_logits)).all()


def test_xdet_fusion_variant():
    from x_detector_tpu.config import xdet_xception
    cfg = xdet_xception(image_size=64).model
    model = SSDModel(config=cfg, dtype=jnp.float32)
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 64, 64, 3)) * 0.1
    vars_ = model.init(jax.random.PRNGKey(0), x, train=False)
    cls_logits, box_codes = model.apply(vars_, x, train=False)
    anchors = build_ssd_anchors(cfg)
    assert cls_logits.shape == (2, anchors.shape[0], cfg.num_classes)
    assert np.isfinite(np.asarray(cls_logits)).all()


def test_xdet_trains():
    import dataclasses
    from x_detector_tpu.config import xdet_xception, DataConfig
    from x_detector_tpu.train.trainer import (create_model_and_state,
                                              make_train_step)
    import sys, os
    sys.path.insert(0, os.path.dirname(__file__))
    from test_train import get_batch
    base = xdet_xception(image_size=64)
    cfg = dataclasses.replace(
        base,
        model=dataclasses.replace(base.model,
                                  backbone_stages=(1, 1, 1, 1),
                                  backbone_widths=(32, 64, 96, 128)),
        data=DataConfig(image_size=64, max_gt_boxes=8),
        train=dataclasses.replace(base.train, batch_size=2,
                                  weight_decay=0.0))
    model, state = create_model_and_state(cfg, jax.random.PRNGKey(0),
                                          dtype=jnp.float32)
    step = jax.jit(make_train_step(model, cfg))
    batch = get_batch(cfg)
    state, m = step(state, batch, jax.random.PRNGKey(0))
    assert np.isfinite(float(m["total_loss"]))


@pytest.mark.slow  # 4 value_and_grad compiles (~70s solo on the 1-core
# host); guards a default-off knob, so the quick tier skips it
def test_backbone_remat_matches_baseline_grads():
    """remat_stages recomputes the forward during backward; outputs and
    batch stats must match the save-everything default (jax.checkpoint is
    exact up to fp reassociation). Covers both backbones at tiny
    width/depth."""
    from x_detector_tpu.models.resnet import ResNetV1
    from x_detector_tpu.models.xception import XceptionLite

    def assert_close(a, b):
        # The recomputed forward lets XLA refuse/refactor different
        # fusions, so backward grads reassociate: measured worst 1.3e-4
        # rel on CPU. Tight enough to catch a wrong formula (order-1
        # errors), loose enough for reassociation.
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-3, atol=1e-4)

    for base, remat in (
        (XceptionLite(widths=(8, 8, 16, 16), units_per_stage=(1, 1, 1, 1),
                      dtype=jnp.float32),
         XceptionLite(widths=(8, 8, 16, 16), units_per_stage=(1, 1, 1, 1),
                      remat_stages=4, dtype=jnp.float32)),
        (ResNetV1(stage_sizes=(1, 1, 1, 1), widths=(4, 4, 8, 8),
                  dtype=jnp.float32),
         ResNetV1(stage_sizes=(1, 1, 1, 1), widths=(4, 4, 8, 8),
                  remat_stages=4, dtype=jnp.float32)),
    ):
        x = jax.random.normal(jax.random.PRNGKey(1), (1, 32, 32, 3))
        vars_ = base.init(jax.random.PRNGKey(0), x, train=True)
        assert jax.tree_util.tree_structure(
            remat.init(jax.random.PRNGKey(0), x, train=True)
        ) == jax.tree_util.tree_structure(vars_)  # same param tree

        def loss(params, model):
            out, mut = model.apply(
                {"params": params, "batch_stats": vars_["batch_stats"]},
                x, train=True, mutable=["batch_stats"])
            return sum(jnp.sum(v ** 2) for v in out.values()), mut

        (l0, mut0), g0 = jax.value_and_grad(loss, has_aux=True)(
            vars_["params"], base)
        (l1, mut1), g1 = jax.value_and_grad(loss, has_aux=True)(
            vars_["params"], remat)
        np.testing.assert_allclose(float(l0), float(l1), rtol=1e-6)
        jax.tree_util.tree_map(assert_close, (g0, mut0), (g1, mut1))
