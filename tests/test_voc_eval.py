import pytest
import numpy as np

from x_detector_tpu.utils.metrics_voc import VOCEvaluator, voc_ap


def test_voc_ap_perfect_curve():
    r = np.array([0.5, 1.0])
    p = np.array([1.0, 1.0])
    assert abs(voc_ap(r, p, use_07_metric=True) - 1.0) < 1e-9
    assert abs(voc_ap(r, p, use_07_metric=False) - 1.0) < 1e-9


def test_voc_ap_07_metric_known():
    # one tp at recall .5 with precision 1, nothing beyond:
    # 11-point: points 0,.1,...,.5 get precision 1 -> 6/11
    r = np.array([0.5])
    p = np.array([1.0])
    assert abs(voc_ap(r, p, True) - 6.0 / 11.0) < 1e-9
    # continuous: area = 0.5
    assert abs(voc_ap(r, p, False) - 0.5) < 1e-9


def _box(y0, x0, y1, x1):
    return np.array([[y0, x0, y1, x1]], np.float32)


def test_perfect_detection_map_one():
    ev = VOCEvaluator(num_classes=3)
    ev.add_ground_truth("img1", _box(0.1, 0.1, 0.5, 0.5), [1])
    ev.add_ground_truth("img2", _box(0.2, 0.2, 0.6, 0.6), [2])
    ev.add_detections("img1", _box(0.1, 0.1, 0.5, 0.5), [0.9], [1])
    ev.add_detections("img2", _box(0.2, 0.2, 0.6, 0.6), [0.8], [2])
    res = ev.evaluate()
    assert abs(res["mAP"] - 1.0) < 1e-9


def test_duplicate_detection_is_fp():
    ev = VOCEvaluator(num_classes=1, use_07_metric=False)
    ev.add_ground_truth("img1", _box(0.1, 0.1, 0.5, 0.5), [1])
    dets = np.concatenate([_box(0.1, 0.1, 0.5, 0.5)] * 2)
    ev.add_detections("img1", dets, [0.9, 0.8], [1, 1])
    res = ev.evaluate()
    # 1 tp then 1 fp: precision drops to 0.5 after recall 1.0 -> AP = 1.0
    assert abs(res["per_class_ap"][1] - 1.0) < 1e-9


def test_wrong_location_is_fp():
    ev = VOCEvaluator(num_classes=1, use_07_metric=False)
    ev.add_ground_truth("img1", _box(0.1, 0.1, 0.5, 0.5), [1])
    ev.add_detections("img1", _box(0.6, 0.6, 0.9, 0.9), [0.9], [1])
    res = ev.evaluate()
    assert res["per_class_ap"][1] == 0.0


def test_difficult_gt_excluded():
    ev = VOCEvaluator(num_classes=1, use_07_metric=False)
    ev.add_ground_truth("img1", np.concatenate([
        _box(0.1, 0.1, 0.5, 0.5), _box(0.6, 0.6, 0.9, 0.9)]),
        [1, 1], difficult=[False, True])
    # detect only the easy one
    ev.add_detections("img1", _box(0.1, 0.1, 0.5, 0.5), [0.9], [1])
    res = ev.evaluate()
    # difficult gt not in denominator -> full recall, AP 1.0
    assert abs(res["per_class_ap"][1] - 1.0) < 1e-9
    # a match to the difficult gt counts neither way (fresh evaluator:
    # add_detections rejects re-registration, so both dets go in one call)
    ev2 = VOCEvaluator(num_classes=1, use_07_metric=False)
    ev2.add_ground_truth("img1", np.concatenate([
        _box(0.1, 0.1, 0.5, 0.5), _box(0.6, 0.6, 0.9, 0.9)]),
        [1, 1], difficult=[False, True])
    ev2.add_detections("img1", np.concatenate([
        _box(0.1, 0.1, 0.5, 0.5), _box(0.6, 0.6, 0.9, 0.9)]),
        [0.9, 0.8], [1, 1])
    res2 = ev2.evaluate()
    assert abs(res2["per_class_ap"][1] - 1.0) < 1e-9


def test_score_ordering_matters():
    # low-scored tp after high-scored fp lowers AP
    ev = VOCEvaluator(num_classes=1, use_07_metric=False)
    ev.add_ground_truth("img1", _box(0.1, 0.1, 0.5, 0.5), [1])
    # one call per image (add_detections, like add_ground_truth, rejects
    # re-registration): high-scored fp + low-scored tp
    ev.add_detections(
        "img1",
        np.concatenate([_box(0.6, 0.6, 0.9, 0.9), _box(0.1, 0.1, 0.5, 0.5)]),
        [0.9, 0.5], [1, 1])
    res = ev.evaluate()
    assert abs(res["per_class_ap"][1] - 0.5) < 1e-9


def test_iou_exactly_half_counts():
    ev = VOCEvaluator(num_classes=1, iou_threshold=0.5, use_07_metric=False)
    ev.add_ground_truth("img1", _box(0.0, 0.0, 0.4, 0.4), [1])
    # shifted box with IoU exactly 1/3 -> fp; then a true positive overlap
    ev.add_detections("img1", _box(0.0, 0.2, 0.4, 0.6), [0.9], [1])
    res = ev.evaluate()
    assert res["per_class_ap"][1] == 0.0


def test_duplicate_ground_truth_registration_ignored():
    """Registering the same image twice must not inflate the recall
    denominator (ADVICE round 1)."""
    import warnings as w
    ev = VOCEvaluator(num_classes=2)
    gt_b = np.array([[0.1, 0.1, 0.5, 0.5]])
    ev.add_ground_truth("img0", gt_b, np.array([1]))
    with w.catch_warnings(record=True) as rec:
        w.simplefilter("always")
        ev.add_ground_truth("img0", gt_b, np.array([1]))
    assert any("duplicate" in str(r.message) for r in rec)
    ev.add_detections("img0", gt_b, np.array([0.9]), np.array([1]))
    res = ev.evaluate()
    np.testing.assert_allclose(res["mAP"], 1.0, rtol=1e-9)


def test_duplicate_detections_registration_raises():
    """Re-adding an image's detections would either double-count them as
    false positives (if accumulated) or silently lose a per-class
    registration loop's later classes (if ignored) — so it raises
    (round-4 review, refined by the round-4 self-review)."""
    ev = VOCEvaluator(num_classes=2)
    gt_b = np.array([[0.1, 0.1, 0.5, 0.5]])
    ev.add_ground_truth("img0", gt_b, np.array([1]))
    ev.add_detections("img0", gt_b, np.array([0.9]), np.array([1]))
    with pytest.raises(ValueError, match="already registered"):
        ev.add_detections("img0", gt_b, np.array([0.9]), np.array([1]))
    res = ev.evaluate()
    np.testing.assert_allclose(res["mAP"], 1.0, rtol=1e-9)
