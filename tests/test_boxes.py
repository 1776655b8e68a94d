import numpy as np
import jax.numpy as jnp

from x_detector_tpu.ops import boxes as B


def random_corner_boxes(rng, n):
    ymin = rng.uniform(0, 0.8, n)
    xmin = rng.uniform(0, 0.8, n)
    h = rng.uniform(0.05, 0.2, n)
    w = rng.uniform(0.05, 0.2, n)
    return np.stack([ymin, xmin, ymin + h, xmin + w], -1).astype(np.float32)


def np_iou(a, b):
    out = np.zeros((len(a), len(b)), np.float32)
    for i, bi in enumerate(a):
        for j, bj in enumerate(b):
            ih = max(0.0, min(bi[2], bj[2]) - max(bi[0], bj[0]))
            iw = max(0.0, min(bi[3], bj[3]) - max(bi[1], bj[1]))
            inter = ih * iw
            ua = max(0.0, (bi[2] - bi[0])) * max(0.0, (bi[3] - bi[1]))
            ub = max(0.0, (bj[2] - bj[0])) * max(0.0, (bj[3] - bj[1]))
            union = ua + ub - inter
            out[i, j] = inter / union if union > 0 else 0.0
    return out


def test_format_roundtrip(rng):
    b = random_corner_boxes(rng, 50)
    back = np.asarray(B.center_to_corner(B.corner_to_center(jnp.asarray(b))))
    np.testing.assert_allclose(back, b, atol=1e-6)


def test_iou_matches_numpy_oracle(rng):
    a = random_corner_boxes(rng, 20)
    b = random_corner_boxes(rng, 30)
    got = np.asarray(B.iou(jnp.asarray(a), jnp.asarray(b)))
    np.testing.assert_allclose(got, np_iou(a, b), atol=1e-5)


def test_iou_identity_and_disjoint():
    a = jnp.array([[0.0, 0.0, 1.0, 1.0]])
    b = jnp.array([[0.0, 0.0, 1.0, 1.0], [2.0, 2.0, 3.0, 3.0],
                   [0.0, 0.0, 0.0, 0.0]])
    got = np.asarray(B.iou(a, b))
    np.testing.assert_allclose(got, [[1.0, 0.0, 0.0]], atol=1e-6)


def test_iou_known_value():
    # two unit squares overlapping by half
    a = jnp.array([[0.0, 0.0, 1.0, 1.0]])
    b = jnp.array([[0.0, 0.5, 1.0, 1.5]])
    np.testing.assert_allclose(np.asarray(B.iou(a, b)), [[1.0 / 3.0]],
                               atol=1e-6)


def test_ioa_covering():
    crop = jnp.array([[0.0, 0.0, 0.5, 0.5]])
    gt = jnp.array([[0.0, 0.0, 0.25, 0.25],   # fully inside -> 1.0
                    [0.0, 0.0, 1.0, 1.0]])    # quarter covered -> 0.25
    got = np.asarray(B.ioa(crop, gt))
    np.testing.assert_allclose(got, [[1.0, 0.25]], atol=1e-6)


def test_encode_decode_roundtrip(rng):
    anchors = random_corner_boxes(rng, 64)
    gt = random_corner_boxes(rng, 64)
    codes = B.encode(jnp.asarray(gt), jnp.asarray(anchors))
    back = np.asarray(B.decode(codes, jnp.asarray(anchors)))
    np.testing.assert_allclose(back, gt, atol=1e-4)


def test_encode_identity_is_zero(rng):
    anchors = random_corner_boxes(rng, 16)
    codes = np.asarray(B.encode(jnp.asarray(anchors), jnp.asarray(anchors)))
    np.testing.assert_allclose(codes, 0.0, atol=1e-5)


def test_encode_known_value():
    # anchor (cy,cx,h,w)=(.5,.5,.2,.2); gt shifted +0.02 in cy, double height
    anchor = jnp.array([[0.4, 0.4, 0.6, 0.6]])
    gt = jnp.array([[0.32, 0.4, 0.72, 0.6]])  # cy=.52 h=.4 w=.2
    t = np.asarray(B.encode(gt, anchor))[0]
    np.testing.assert_allclose(t[0], 0.02 / 0.2 / 0.1, atol=1e-5)  # 1.0
    np.testing.assert_allclose(t[1], 0.0, atol=1e-5)
    np.testing.assert_allclose(t[2], np.log(2.0) / 0.2, atol=1e-5)
    np.testing.assert_allclose(t[3], 0.0, atol=1e-5)


def test_clip_boxes():
    b = jnp.array([[-0.5, 0.2, 1.5, 0.8], [0.1, -1.0, 0.4, 2.0]])
    got = np.asarray(B.clip_boxes(b))
    np.testing.assert_allclose(
        got, [[0.0, 0.2, 1.0, 0.8], [0.1, 0.0, 0.4, 1.0]], atol=1e-6)


def test_flip_horizontal_involution(rng):
    b = jnp.asarray(random_corner_boxes(rng, 10))
    twice = np.asarray(B.flip_boxes_horizontal(B.flip_boxes_horizontal(b)))
    np.testing.assert_allclose(twice, np.asarray(b), atol=1e-6)
    one = np.asarray(B.flip_boxes_horizontal(
        jnp.array([[0.1, 0.2, 0.3, 0.4]])))
    np.testing.assert_allclose(one, [[0.1, 0.6, 0.3, 0.8]], atol=1e-6)
