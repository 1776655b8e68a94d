import jax
import jax.numpy as jnp
import numpy as np
import pytest

from x_detector_tpu.config import DataConfig
from x_detector_tpu.data import augment as A
from x_detector_tpu.ops import boxes as box_ops


CFG = DataConfig(image_size=64, max_gt_boxes=8, crop_attempts=20)


def _gt(boxes):
    g = len(boxes)
    b = np.zeros((8, 4), np.float32)
    m = np.zeros((8,), bool)
    if g:
        b[:g] = boxes
        m[:g] = True
    return jnp.asarray(b), jnp.asarray(m)


def test_crop_sampler_satisfies_constraints():
    gt_b, gt_m = _gt([[0.4, 0.4, 0.6, 0.6]])
    for seed in range(20):
        crop = np.asarray(A.sample_distorted_box(
            jax.random.PRNGKey(seed), gt_b, gt_m, CFG))
        h, w = crop[2] - crop[0], crop[3] - crop[1]
        assert 0 < h <= 1 and 0 < w <= 1
        assert crop[0] >= 0 and crop[1] >= 0
        assert crop[2] <= 1 and crop[3] <= 1
        is_fallback = np.allclose(crop, [0, 0, 1, 1])
        if not is_fallback:
            ar = w / h
            assert CFG.aspect_ratio_range[0] - 1e-4 <= ar <= \
                CFG.aspect_ratio_range[1] + 1e-4
            assert CFG.area_range[0] - 1e-4 <= h * w <= \
                CFG.area_range[1] + 1e-4
            cover = np.asarray(box_ops.ioa(jnp.asarray(crop)[None],
                                           gt_b))[0, 0]
            assert cover >= CFG.min_object_covered - 1e-4


def test_crop_sampler_no_gt_falls_back_or_samples():
    gt_b, gt_m = _gt([])
    crop = np.asarray(A.sample_distorted_box(
        jax.random.PRNGKey(0), gt_b, gt_m, CFG))
    assert (crop >= -1e-6).all() and (crop <= 1 + 1e-6).all()


def test_impossible_constraint_falls_back():
    # min_object_covered=1.0 of a huge box with tiny allowed crop area
    cfg = DataConfig(image_size=64, min_object_covered=1.0,
                     area_range=(0.01, 0.02), crop_attempts=10)
    gt_b, gt_m = _gt([[0.0, 0.0, 1.0, 1.0]])
    crop = np.asarray(A.sample_distorted_box(
        jax.random.PRNGKey(0), gt_b, gt_m, cfg))
    np.testing.assert_allclose(crop, [0, 0, 1, 1], atol=1e-6)


def test_transform_boxes_to_crop():
    gt_b, gt_m = _gt([[0.25, 0.25, 0.5, 0.5],    # inside crop
                      [0.8, 0.8, 0.95, 0.95]])   # outside crop
    crop = jnp.asarray([0.25, 0.25, 0.75, 0.75], jnp.float32)
    new_b, keep = A.transform_boxes_to_crop(gt_b, gt_m, crop)
    keep = np.asarray(keep)
    assert keep[0] and not keep[1]
    np.testing.assert_allclose(np.asarray(new_b)[0], [0, 0, 0.5, 0.5],
                               atol=1e-5)


def test_crop_and_resize_identity():
    rng = np.random.default_rng(0)
    img = rng.uniform(0, 255, (16, 16, 3)).astype(np.float32)
    full = jnp.asarray([0.0, 0.0, 1.0, 1.0])
    out = np.asarray(A.crop_and_resize(jnp.asarray(img), full, 16))
    np.testing.assert_allclose(out, img, atol=1e-3)


def test_crop_and_resize_upsamples_constant():
    img = np.full((8, 8, 3), 7.0, np.float32)
    crop = jnp.asarray([0.25, 0.25, 0.75, 0.75])
    out = np.asarray(A.crop_and_resize(jnp.asarray(img), crop, 32))
    np.testing.assert_allclose(out, 7.0, atol=1e-4)
    assert out.shape == (32, 32, 3)


def test_color_ops_identity_params():
    rng = np.random.default_rng(1)
    img = jnp.asarray(rng.uniform(0, 1, (8, 8, 3)).astype(np.float32))
    np.testing.assert_allclose(
        np.asarray(A.adjust_brightness(img, jnp.float32(0.0))), img, atol=1e-6)
    np.testing.assert_allclose(
        np.asarray(A.adjust_contrast(img, jnp.float32(1.0))), img, atol=1e-6)
    np.testing.assert_allclose(
        np.asarray(A.adjust_saturation(img, jnp.float32(1.0))), img, atol=1e-6)
    np.testing.assert_allclose(
        np.asarray(A.adjust_hue(img, jnp.float32(0.0))), img, atol=1e-4)


def test_hue_rotation_preserves_luma():
    rng = np.random.default_rng(2)
    img = jnp.asarray(rng.uniform(0, 1, (8, 8, 3)).astype(np.float32))
    out = A.adjust_hue(img, jnp.float32(1.0))
    luma_w = jnp.array([0.299, 0.587, 0.114])
    np.testing.assert_allclose(np.asarray((out * luma_w).sum(-1)),
                               np.asarray((img * luma_w).sum(-1)), atol=1e-4)


def test_full_train_preprocess():
    rng = np.random.default_rng(3)
    img = jnp.asarray(rng.uniform(0, 255, (100, 120, 3)).astype(np.float32))
    gt_b, gt_m = _gt([[0.3, 0.3, 0.7, 0.7], [0.1, 0.1, 0.25, 0.2]])
    labels = jnp.asarray(np.array([3, 7, 0, 0, 0, 0, 0, 0], np.int32))
    out = A.preprocess_for_train(jax.random.PRNGKey(0), img, gt_b, labels,
                                 gt_m, CFG)
    assert out["image"].shape == (64, 64, 3)
    assert np.isfinite(np.asarray(out["image"])).all()
    kept = np.asarray(out["gt_mask"])
    b = np.asarray(out["gt_boxes"])[kept]
    assert (b >= -1e-6).all() and (b <= 1 + 1e-6).all()
    lab = np.asarray(out["gt_labels"])
    assert set(lab[kept]).issubset({3, 7})
    assert (lab[~kept] == 0).all()
    # mean subtraction applied: values centered near zero-ish
    assert abs(np.asarray(out["image"]).mean()) < 130


def test_preprocess_deterministic_per_key():
    rng = np.random.default_rng(4)
    img = jnp.asarray(rng.uniform(0, 255, (50, 50, 3)).astype(np.float32))
    gt_b, gt_m = _gt([[0.2, 0.2, 0.8, 0.8]])
    labels = jnp.zeros(8, jnp.int32)
    a = A.preprocess_for_train(jax.random.PRNGKey(5), img, gt_b, labels,
                               gt_m, CFG)
    b = A.preprocess_for_train(jax.random.PRNGKey(5), img, gt_b, labels,
                               gt_m, CFG)
    assert (np.asarray(a["image"]) == np.asarray(b["image"])).all()
    c = A.preprocess_for_train(jax.random.PRNGKey(6), img, gt_b, labels,
                               gt_m, CFG)
    assert not (np.asarray(a["image"]) == np.asarray(c["image"])).all()


def test_eval_preprocess():
    rng = np.random.default_rng(5)
    img = jnp.asarray(rng.uniform(0, 255, (90, 70, 3)).astype(np.float32))
    out = np.asarray(A.preprocess_for_eval(img, CFG))
    assert out.shape == (64, 64, 3)
    assert np.isfinite(out).all()


def test_batch_preprocess_shapes():
    rng = np.random.default_rng(6)
    batch = {
        "image": jnp.asarray(rng.uniform(0, 255, (3, 80, 80, 3)).astype(
            np.float32)),
        "gt_boxes": jnp.asarray(np.tile(
            np.array([[[0.2, 0.2, 0.6, 0.6]] + [[0.0] * 4] * 7],
                     np.float32), (3, 1, 1))),
        "gt_labels": jnp.asarray(np.tile(
            np.array([[1] + [0] * 7], np.int32), (3, 1))),
        "gt_mask": jnp.asarray(np.tile(
            np.array([[True] + [False] * 7]), (3, 1))),
    }
    out = A.preprocess_batch_for_train(jax.random.PRNGKey(0), batch, CFG)
    assert out["image"].shape == (3, 64, 64, 3)
    assert out["gt_boxes"].shape == (3, 8, 4)


def test_device_synthetic_generator():
    from x_detector_tpu.data.synthetic import synthetic_batch_device
    b = jax.jit(lambda k: synthetic_batch_device(k, 2, 64, max_gt=8))(
        jax.random.PRNGKey(0))
    assert b["image"].shape == (2, 64, 64, 3)
    img = np.asarray(b["image"])
    assert img.min() >= 0 and img.max() <= 255
    m = np.asarray(b["gt_mask"])
    assert m.sum() >= 2  # at least one object per image
    boxes = np.asarray(b["gt_boxes"])
    labels = np.asarray(b["gt_labels"])
    assert ((labels > 0) == m).all()
    # painted interiors differ from the dim background
    for i in range(2):
        bx = boxes[i][m[i]][0]
        y0, x0, y1, x1 = (bx * 64).astype(int)
        inner = img[i, y0 + 1:y1 - 1, x0 + 1:x1 - 1]
        if inner.size:
            assert inner.mean() > 60  # background is uniform [0, 60)
    # deterministic per key, different across keys
    b2 = jax.jit(lambda k: synthetic_batch_device(k, 2, 64, max_gt=8))(
        jax.random.PRNGKey(0))
    assert (np.asarray(b2["image"]) == img).all()


def test_crop_sampler_letterbox_content_region():
    """With box_scale=[fy,fx] crops stay inside the content region and the
    area constraint is relative to the content, not the canvas (ADVICE r1:
    crops must never land in letterbox zero-padding)."""
    from x_detector_tpu.config import DataConfig
    cfg = DataConfig(image_size=64, min_object_covered=0.0,
                     area_range=(0.4, 0.6), aspect_ratio_range=(0.8, 1.25),
                     crop_attempts=20)
    fy, fx = 0.6, 1.0
    bs = jnp.asarray([fy, fx], jnp.float32)
    gtb = jnp.asarray([[0.1, 0.1, 0.5, 0.5]], jnp.float32)
    gtm = jnp.ones((1,), bool)
    for i in range(40):
        crop = np.asarray(A.sample_distorted_box(
            jax.random.PRNGKey(i), gtb, gtm, cfg, bs))
        assert crop[0] >= -1e-6 and crop[1] >= -1e-6
        assert crop[2] <= fy + 1e-6 and crop[3] <= fx + 1e-6
        frac = ((crop[2] - crop[0]) * (crop[3] - crop[1])) / (fy * fx)
        # whole-content fallback has frac 1.0; sampled crops in [0.4, 0.6]
        assert (0.4 - 1e-5 <= frac <= 0.6 + 1e-5) or abs(frac - 1.0) < 1e-5


def test_crop_sampler_letterbox_fallback_is_content_region():
    from x_detector_tpu.config import DataConfig
    # impossible constraint -> fallback must be the content region
    cfg = DataConfig(image_size=64, min_object_covered=1.0,
                     area_range=(0.01, 0.02), crop_attempts=5)
    fy, fx = 0.5, 1.0
    crop = np.asarray(A.sample_distorted_box(
        jax.random.PRNGKey(0), jnp.asarray([[0.0, 0.0, 0.5, 1.0]]),
        jnp.ones((1,), bool), cfg, jnp.asarray([fy, fx], jnp.float32)))
    np.testing.assert_allclose(crop, [0.0, 0.0, fy, fx], atol=1e-6)


def test_preprocess_batch_threads_box_scale_and_difficult():
    from x_detector_tpu.config import DataConfig
    cfg = DataConfig(image_size=32, max_gt_boxes=4)
    rng = np.random.default_rng(0)
    batch = {
        "image": jnp.asarray(rng.uniform(0, 255, (2, 48, 48, 3)), jnp.float32),
        "gt_boxes": jnp.asarray([[[0.1, 0.1, 0.4, 0.4]] + [[0.0] * 4] * 3] * 2,
                                jnp.float32),
        "gt_labels": jnp.asarray([[2, 0, 0, 0]] * 2, jnp.int32),
        "gt_mask": jnp.asarray([[True, False, False, False]] * 2),
        "difficult": jnp.asarray([[False, False, False, False],
                                  [True, False, False, False]]),
        "box_scale": jnp.asarray([[1.0, 1.0], [0.5, 1.0]], jnp.float32),
    }
    out = A.preprocess_batch_for_train(jax.random.PRNGKey(0), batch, cfg)
    assert out["image"].shape == (2, 32, 32, 3)
    np.testing.assert_array_equal(np.asarray(out["difficult"]),
                                  np.asarray(batch["difficult"]))
    assert (np.asarray(out["gt_boxes"]) <= 1.0 + 1e-6).all()
