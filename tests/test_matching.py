import numpy as np
import jax.numpy as jnp

from x_detector_tpu.ops import matching as M


def _pad_gt(boxes, labels, max_gt=8):
    g = len(boxes)
    pb = np.zeros((max_gt, 4), np.float32)
    pl = np.zeros((max_gt,), np.int32)
    pm = np.zeros((max_gt,), bool)
    if g:
        pb[:g] = boxes
        pl[:g] = labels
    pm[:g] = True
    return jnp.asarray(pb), jnp.asarray(pl), jnp.asarray(pm)


ANCHORS = jnp.array([
    [0.0, 0.0, 0.2, 0.2],
    [0.0, 0.4, 0.2, 0.6],
    [0.4, 0.4, 0.6, 0.6],
    [0.7, 0.7, 0.9, 0.9],
], jnp.float32)


def test_simple_threshold_match():
    gt_b, gt_l, gt_m = _pad_gt([[0.0, 0.0, 0.2, 0.2]], [3])
    res = M.match_anchors(ANCHORS, gt_b, gt_l, gt_m, pos_iou=0.5, neg_iou=0.3)
    fg = np.asarray(res.fg_mask)
    assert fg.tolist() == [True, False, False, False]
    assert np.asarray(res.labels).tolist() == [3, 0, 0, 0]
    # perfect match -> zero regression target
    np.testing.assert_allclose(np.asarray(res.reg_targets)[0], 0.0, atol=1e-5)


def test_force_match_rescues_unmatched_gt():
    # gt overlapping anchor 2 only slightly (IoU < pos threshold)
    gt_b, gt_l, gt_m = _pad_gt([[0.45, 0.45, 0.75, 0.75]], [5])
    res = M.match_anchors(ANCHORS, gt_b, gt_l, gt_m, pos_iou=0.7, neg_iou=0.3,
                          force_match=True)
    fg = np.asarray(res.fg_mask)
    assert fg.sum() == 1
    idx = int(np.argmax(fg))
    assert np.asarray(res.labels)[idx] == 5
    # without forcing, nothing is positive
    res2 = M.match_anchors(ANCHORS, gt_b, gt_l, gt_m, pos_iou=0.7,
                           neg_iou=0.3, force_match=False)
    assert np.asarray(res2.fg_mask).sum() == 0


def test_padded_gt_rows_never_match():
    gt_b, gt_l, gt_m = _pad_gt([], [])
    res = M.match_anchors(ANCHORS, gt_b, gt_l, gt_m, pos_iou=0.5, neg_iou=0.3)
    assert np.asarray(res.fg_mask).sum() == 0
    assert np.asarray(res.bg_mask).all()
    assert (np.asarray(res.labels) == 0).all()


def test_ignore_zone():
    # craft gt with IoU between neg and pos thresholds for anchor 0:
    # anchor [0,0,.2,.2]; gt [0,0,.2,.1] has IoU 0.5
    gt_b, gt_l, gt_m = _pad_gt([[0.0, 0.0, 0.2, 0.1]], [2])
    res = M.match_anchors(ANCHORS, gt_b, gt_l, gt_m, pos_iou=0.7, neg_iou=0.3,
                          force_match=False)
    fg = np.asarray(res.fg_mask)
    bg = np.asarray(res.bg_mask)
    assert not fg[0] and not bg[0]          # ignored
    assert bg[1] and bg[2] and bg[3]        # plain negatives


def test_two_gt_compete_for_anchor():
    gt_b, gt_l, gt_m = _pad_gt(
        [[0.0, 0.0, 0.2, 0.2], [0.01, 0.01, 0.2, 0.2]], [1, 2])
    res = M.match_anchors(ANCHORS, gt_b, gt_l, gt_m, pos_iou=0.5, neg_iou=0.3)
    # anchor 0 takes gt 0 (higher IoU = exact match)
    assert int(np.asarray(res.matched_gt)[0]) == 0
    assert int(np.asarray(res.labels)[0]) == 1


def test_proposal_matching_masks_padding():
    props = jnp.array([[0.0, 0.0, 0.2, 0.2], [0.0, 0.0, 0.0, 0.0]],
                      jnp.float32)
    pmask = jnp.array([True, False])
    gt_b, gt_l, gt_m = _pad_gt([[0.0, 0.0, 0.2, 0.2]], [7])
    res = M.match_proposals(props, pmask, gt_b, gt_l, gt_m, fg_iou=0.5)
    assert np.asarray(res.fg_mask).tolist() == [True, False]
    assert np.asarray(res.bg_mask).tolist() == [False, False]
    assert np.asarray(res.labels).tolist() == [7, 0]


def test_roi_background_band():
    """match_proposals honors the [bg_lo, bg_hi) background band: proposals
    in the dead zone [bg_hi, fg_iou) and below bg_lo are ignored."""
    gt_b, gt_l, gt_m = _pad_gt([[0.0, 0.0, 0.4, 0.4]], [7])
    props = jnp.array([
        [0.0, 0.0, 0.4, 0.4],      # IoU 1.0      -> fg
        [0.0, 0.0, 0.4, 0.28],     # IoU 0.7      -> fg
        [0.0, 0.0, 0.4, 0.16],     # IoU 0.4      -> dead zone (ignored)
        [0.0, 0.0, 0.4, 0.08],     # IoU 0.2      -> bg
        [0.6, 0.6, 0.9, 0.9],      # IoU 0.0      -> below bg_lo (ignored)
    ], jnp.float32)
    pm = jnp.ones((5,), bool)
    res = M.match_proposals(props, pm, gt_b, gt_l, gt_m,
                            fg_iou=0.5, bg_iou_hi=0.3, bg_iou_lo=0.1)
    assert np.asarray(res.fg_mask).tolist() == [True, True, False, False, False]
    assert np.asarray(res.bg_mask).tolist() == [False, False, False, True, False]
    assert np.asarray(res.labels).tolist() == [7, 7, 0, 0, 0]


def test_roi_band_defaults_make_all_valid_nonfg_background():
    gt_b, gt_l, gt_m = _pad_gt([[0.0, 0.0, 0.4, 0.4]], [7])
    props = jnp.array([
        [0.0, 0.0, 0.4, 0.4],
        [0.0, 0.0, 0.4, 0.16],
        [0.6, 0.6, 0.9, 0.9],
        [0.0, 0.0, 0.0, 0.0],      # padded slot
    ], jnp.float32)
    pm = jnp.array([True, True, True, False])
    res = M.match_proposals(props, pm, gt_b, gt_l, gt_m, fg_iou=0.5)
    assert np.asarray(res.fg_mask).tolist() == [True, False, False, False]
    assert np.asarray(res.bg_mask).tolist() == [False, True, True, False]


def test_roi_band_no_gt_image_is_all_background_under_defaults():
    gt_b, gt_l, gt_m = _pad_gt([], [])
    props = jnp.array([[0.1, 0.1, 0.5, 0.5]], jnp.float32)
    pm = jnp.ones((1,), bool)
    res = M.match_proposals(props, pm, gt_b, gt_l, gt_m, fg_iou=0.5)
    assert np.asarray(res.bg_mask).all()
    # with a raised bg_lo the no-overlap proposal is ignored instead
    res2 = M.match_proposals(props, pm, gt_b, gt_l, gt_m,
                             fg_iou=0.5, bg_iou_hi=0.5, bg_iou_lo=0.1)
    assert not np.asarray(res2.bg_mask).any()
    assert not np.asarray(res2.fg_mask).any()
