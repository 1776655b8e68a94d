import numpy as np
import jax.numpy as jnp
import pytest

from x_detector_tpu.ops import nms as N


def np_greedy_nms(boxes, scores, iou_threshold, score_threshold):
    """O(n^2) sequential oracle; returns kept indices in score order."""
    def iou(a, b):
        ih = max(0.0, min(a[2], b[2]) - max(a[0], b[0]))
        iw = max(0.0, min(a[3], b[3]) - max(a[1], b[1]))
        inter = ih * iw
        ua = max(0.0, a[2] - a[0]) * max(0.0, a[3] - a[1])
        ub = max(0.0, b[2] - b[0]) * max(0.0, b[3] - b[1])
        union = ua + ub - inter
        return inter / union if union > 0 else 0.0

    order = np.argsort(-scores, kind="stable")
    kept = []
    for i in order:
        if scores[i] <= score_threshold:
            continue
        if (boxes[i, 2] - boxes[i, 0]) <= 0 or (boxes[i, 3] - boxes[i, 1]) <= 0:
            continue
        if all(iou(boxes[i], boxes[k]) <= iou_threshold for k in kept):
            kept.append(i)
    return kept


def random_cluttered_boxes(rng, n, clusters=8):
    centers = rng.uniform(0.1, 0.9, (clusters, 2))
    which = rng.integers(0, clusters, n)
    cy = centers[which, 0] + rng.normal(0, 0.03, n)
    cx = centers[which, 1] + rng.normal(0, 0.03, n)
    h = rng.uniform(0.05, 0.25, n)
    w = rng.uniform(0.05, 0.25, n)
    boxes = np.stack([cy - h / 2, cx - w / 2, cy + h / 2, cx + w / 2],
                     -1).astype(np.float32)
    scores = rng.uniform(0.0, 1.0, n).astype(np.float32)
    return boxes, scores


@pytest.mark.parametrize("n", [5, 100, 300])
@pytest.mark.parametrize("thresh", [0.3, 0.5, 0.7])
def test_nms_matches_sequential_oracle(rng, n, thresh):
    boxes, scores = random_cluttered_boxes(rng, n)
    res = N.nms_padded(jnp.asarray(boxes), jnp.asarray(scores),
                       max_output=n, iou_threshold=thresh,
                       score_threshold=0.05)
    kept = np_greedy_nms(boxes, scores, thresh, 0.05)
    got_valid = int(np.asarray(res.valid).sum())
    assert got_valid == len(kept)
    got_boxes = np.asarray(res.boxes)[:len(kept)]
    np.testing.assert_allclose(got_boxes, boxes[kept], atol=1e-6)
    np.testing.assert_allclose(np.asarray(res.scores)[:len(kept)],
                               scores[kept], atol=1e-6)


def test_nms_multi_tile_exactness(rng):
    # force several 128-tiles with heavy suppression chains
    boxes, scores = random_cluttered_boxes(rng, 700, clusters=4)
    res = N.nms_padded(jnp.asarray(boxes), jnp.asarray(scores),
                       max_output=200, iou_threshold=0.5,
                       score_threshold=0.0)
    kept = np_greedy_nms(boxes, scores, 0.5, 0.0)[:200]
    assert int(np.asarray(res.valid).sum()) == len(kept)
    np.testing.assert_allclose(np.asarray(res.boxes)[:len(kept)],
                               boxes[kept], atol=1e-6)


def test_nms_all_below_score_threshold(rng):
    boxes, scores = random_cluttered_boxes(rng, 32)
    res = N.nms_padded(jnp.asarray(boxes), jnp.asarray(scores * 0.001),
                       max_output=10, iou_threshold=0.5, score_threshold=0.5)
    assert int(np.asarray(res.valid).sum()) == 0


def test_nms_identical_boxes_keep_one():
    boxes = jnp.tile(jnp.array([[0.1, 0.1, 0.5, 0.5]]), (10, 1))
    scores = jnp.linspace(0.5, 0.9, 10)
    res = N.nms_padded(boxes, scores, max_output=10, iou_threshold=0.5,
                       score_threshold=0.0)
    assert int(np.asarray(res.valid).sum()) == 1
    np.testing.assert_allclose(float(np.asarray(res.scores)[0]), 0.9,
                               atol=1e-6)


def test_multiclass_nms_classes_independent(rng):
    # identical boxes but in different classes must not suppress each other
    boxes = jnp.tile(jnp.array([[0.1, 0.1, 0.5, 0.5]]), (4, 1))
    class_scores = jnp.array([
        [0.9, 0.0],
        [0.8, 0.0],
        [0.0, 0.7],
        [0.0, 0.6],
    ])
    res = N.multiclass_nms(boxes, class_scores, max_output=10,
                           iou_threshold=0.5, score_threshold=0.01)
    valid = np.asarray(res.valid)
    cls = np.asarray(res.classes)[valid]
    scr = np.asarray(res.scores)[valid]
    assert valid.sum() == 2
    assert sorted(cls.tolist()) == [1, 2]
    np.testing.assert_allclose(sorted(scr.tolist()), [0.7, 0.9], atol=1e-6)


def test_batched_multiclass_nms_shapes(rng):
    B, Nb, C = 3, 64, 5
    boxes = np.zeros((B, Nb, 4), np.float32)
    scores = np.zeros((B, Nb, C), np.float32)
    for b in range(B):
        bx, _ = random_cluttered_boxes(rng, Nb)
        boxes[b] = bx
        scores[b] = rng.uniform(0, 1, (Nb, C))
    res = N.batched_multiclass_nms(jnp.asarray(boxes), jnp.asarray(scores),
                                   max_output=20)
    assert res.boxes.shape == (B, 20, 4)
    assert res.scores.shape == (B, 20)
    assert res.classes.shape == (B, 20)
    assert res.valid.shape == (B, 20)


def test_candidate_prefilter_matches_full_nms(rng):
    """With nms_candidates >= the survivor horizon, the prefiltered result
    equals NMS over all boxes."""
    boxes, scores = random_cluttered_boxes(rng, 400)
    class_scores = jnp.stack([jnp.asarray(scores),
                              jnp.asarray(scores[::-1].copy())], axis=1)
    full = N.multiclass_nms(jnp.asarray(boxes), class_scores, max_output=30,
                            iou_threshold=0.5, score_threshold=0.05,
                            per_class_topk=30, nms_candidates=400)
    pre = N.multiclass_nms(jnp.asarray(boxes), class_scores, max_output=30,
                           iou_threshold=0.5, score_threshold=0.05,
                           per_class_topk=30, nms_candidates=256)
    np.testing.assert_allclose(np.asarray(full.scores),
                               np.asarray(pre.scores), atol=1e-6)
    np.testing.assert_allclose(np.asarray(full.boxes),
                               np.asarray(pre.boxes), atol=1e-6)
    assert (np.asarray(full.classes) == np.asarray(pre.classes)).all()


def test_nms_compact_survivor_path_matches_oracle(rng):
    """Large candidate pools (n_tiles > 8) take the compact-survivor-buffer
    branch with early exit — the train proposal stage's shape class.  Must
    equal the sequential oracle exactly, including when the early exit
    triggers (max_output << survivors)."""
    boxes, scores = random_cluttered_boxes(rng, 1536, clusters=24)
    for max_output, thresh in [(256, 0.5), (64, 0.7)]:
        res = N.nms_padded(jnp.asarray(boxes), jnp.asarray(scores),
                           max_output=max_output, iou_threshold=thresh,
                           score_threshold=0.0)
        kept = np_greedy_nms(boxes, scores, thresh, 0.0)[:max_output]
        got_n = int(np.asarray(res.valid).sum())
        assert got_n == len(kept), (max_output, thresh, got_n, len(kept))
        np.testing.assert_allclose(np.asarray(res.boxes)[:len(kept)],
                                   boxes[kept], atol=1e-6)
        np.testing.assert_allclose(np.asarray(res.scores)[:len(kept)],
                                   scores[kept], atol=1e-6)


def test_nms_compact_path_score_floor_early_exit(rng):
    """Compact path with a score floor: boxes below it can neither survive
    nor suppress, and the head-score early exit must not drop survivors."""
    boxes, scores = random_cluttered_boxes(rng, 1408, clusters=16)
    scores = scores * (scores > 0.5)  # half the pool dead at floor 0.0...
    res = N.nms_padded(jnp.asarray(boxes), jnp.asarray(scores),
                       max_output=300, iou_threshold=0.5,
                       score_threshold=0.25)
    kept = np_greedy_nms(boxes, scores, 0.5, 0.25)[:300]
    assert int(np.asarray(res.valid).sum()) == len(kept)
    np.testing.assert_allclose(np.asarray(res.scores)[:len(kept)],
                               scores[kept], atol=1e-6)


def test_approx_prefilter_matches_exact_on_separated_scores():
    """approx_max_k candidate prefilter: same detections as the exact
    prefilter when scores are well separated (the approximation only
    reorders near-ties deep in the candidate tail)."""
    import jax
    from x_detector_tpu.ops.nms import multiclass_nms

    rng = np.random.default_rng(5)
    n, c = 600, 3
    boxes = np.zeros((n, 4), np.float32)
    # isolated boxes on a coarse grid: no suppression interplay
    for i in range(n):
        y, x = divmod(i, 30)
        boxes[i] = (y * 0.04, x * 0.033, y * 0.04 + 0.02, x * 0.033 + 0.015)
    scores = rng.uniform(0.0, 1.0, (n, c)).astype(np.float32)
    out_exact = multiclass_nms(jnp.asarray(boxes), jnp.asarray(scores),
                               max_output=50, nms_candidates=256,
                               approx_prefilter=False)
    out_approx = multiclass_nms(jnp.asarray(boxes), jnp.asarray(scores),
                                max_output=50, nms_candidates=256,
                                approx_prefilter=True)
    np.testing.assert_allclose(np.asarray(out_exact.scores),
                               np.asarray(out_approx.scores), atol=1e-6)
    np.testing.assert_array_equal(np.asarray(out_exact.classes),
                                  np.asarray(out_approx.classes))
