"""Distributional oracle: our crop sampler vs tf.image.sample_distorted_bounding_box.

SURVEY.md §7 hard part 3: the TF1 reference's training-augmentation
distribution hinges on ``sample_distorted_bounding_box``'s exact constraint
and sampling semantics; divergence shifts the augmentation distribution and
ultimately mAP.  TF (host CPU) is used here as the empirical oracle: both
samplers draw thousands of crops for identical configurations and the
marginal distributions (height, aspect, center) and fallback rates must
agree within KS/quantile tolerances.

Square oracle images keep normalized aspect == pixel aspect (the square
canvas is also this framework's operating space — DESIGN.md §10).

Known, accepted divergence: TF quantizes crops to integer pixels (≈1/640
jitter here); tolerances absorb it.
"""

import numpy as np
import pytest

pytest.importorskip("tensorflow")
import jax
import jax.numpy as jnp
from scipy import stats

from x_detector_tpu.config import DataConfig
from x_detector_tpu.data import augment as A

SIZE = 640
N = 3000


def tf_samples(gt, moc, aspect_range, area_range, attempts, n=N):
    import tensorflow as tf
    tf.config.set_visible_devices([], "GPU")
    shape = tf.constant([SIZE, SIZE, 3])
    boxes = (np.zeros((1, 0, 4), np.float32) if gt is None
             else np.asarray(gt, np.float32)[None])
    out = []
    for i in range(n):
        _, _, box = tf.image.sample_distorted_bounding_box(
            shape, bounding_boxes=boxes, seed=i,
            min_object_covered=moc, aspect_ratio_range=aspect_range,
            area_range=area_range, max_attempts=attempts,
            use_image_if_no_bounding_boxes=gt is None)
        out.append(box.numpy()[0, 0])
    return np.asarray(out)


def our_samples(gt, moc, aspect_range, area_range, attempts, n=N):
    cfg = DataConfig(image_size=SIZE, min_object_covered=moc,
                     aspect_ratio_range=aspect_range, area_range=area_range,
                     crop_attempts=attempts)
    if gt is None:
        gtb = jnp.zeros((1, 4), jnp.float32)
        gtm = jnp.zeros((1,), bool)
    else:
        gtb = jnp.asarray(gt, jnp.float32)
        gtm = jnp.ones((len(gt),), bool)
    keys = jax.random.split(jax.random.PRNGKey(0), n)
    fn = jax.jit(jax.vmap(lambda k: A.sample_distorted_box(k, gtb, gtm, cfg)))
    return np.asarray(fn(keys))


def _marginals(s):
    h = s[:, 2] - s[:, 0]
    w = s[:, 3] - s[:, 1]
    return {"h": h, "aspect": w / np.maximum(h, 1e-6),
            "area": h * w, "cy": (s[:, 0] + s[:, 2]) / 2,
            "cx": (s[:, 1] + s[:, 3]) / 2}


def _compare(tf_s, our_s, ks_tol=0.05, skip_fallbacks=False):
    if skip_fallbacks:
        tf_s = tf_s[(tf_s[:, 2] - tf_s[:, 0]) < 0.999]
        our_s = our_s[(our_s[:, 2] - our_s[:, 0]) < 0.999]
    mt, mo = _marginals(tf_s), _marginals(our_s)
    for k in mt:
        ks = stats.ks_2samp(mt[k], mo[k]).statistic
        assert ks < ks_tol, (
            f"{k}: KS={ks:.3f} (tol {ks_tol}); "
            f"tf q50={np.median(mt[k]):.3f} ours q50={np.median(mo[k]):.3f}")


@pytest.mark.slow
def test_oracle_unconstrained_geometry():
    """No gt constraint: pure (aspect, height, offset) sampling."""
    args = (None, 0.0, (0.5, 2.0), (0.1, 1.0), 20)
    _compare(tf_samples(*args), our_samples(*args))


@pytest.mark.slow
def test_oracle_narrow_aspect_area():
    args = (None, 0.0, (0.9, 1.1), (0.2, 0.5), 20)
    _compare(tf_samples(*args), our_samples(*args))


@pytest.mark.slow
def test_oracle_centered_box_coverage():
    gt = [[0.3, 0.3, 0.7, 0.7]]
    args = (gt, 0.25, (0.5, 2.0), (0.1, 1.0), 50)
    _compare(tf_samples(*args), our_samples(*args))


@pytest.mark.slow
def test_oracle_hard_coverage_fallback_rate():
    """Tiny corner box + strict coverage: fallback rates must agree."""
    gt = [[0.02, 0.02, 0.12, 0.12]]
    args = (gt, 0.9, (0.75, 1.33), (0.3, 1.0), 25)
    tf_s, our_s = tf_samples(*args), our_samples(*args)
    tf_fb = np.mean((tf_s[:, 2] - tf_s[:, 0]) > 0.999)
    our_fb = np.mean((our_s[:, 2] - our_s[:, 0]) > 0.999)
    assert abs(tf_fb - our_fb) < 0.05, (tf_fb, our_fb)
    # conditional (non-fallback) crops must match too
    _compare(tf_s, our_s, skip_fallbacks=True, ks_tol=0.07)


@pytest.mark.slow
def test_oracle_multi_box_any_coverage():
    """Coverage is satisfied by ANY one gt box (TF semantics)."""
    gt = [[0.05, 0.05, 0.25, 0.25], [0.6, 0.6, 0.95, 0.95]]
    args = (gt, 0.5, (0.8, 1.25), (0.1, 0.6), 50)
    _compare(tf_samples(*args), our_samples(*args))
