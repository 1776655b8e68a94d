import numpy as np

from x_detector_tpu.config import AnchorConfig, SSDAnchorConfig
from x_detector_tpu.ops import anchors as A


def test_rpn_anchor_count_and_shapes():
    cfg = AnchorConfig()
    anc = A.rpn_anchors(800, cfg)
    assert anc.shape == (50 * 50 * 15, 4)
    # all finite, centers inside image
    assert np.isfinite(anc).all()
    cy = (anc[:, 0] + anc[:, 2]) / 2
    cx = (anc[:, 1] + anc[:, 3]) / 2
    assert (cy > 0).all() and (cy < 1).all()
    assert (cx > 0).all() and (cx < 1).all()


def test_rpn_anchor_geometry():
    cfg = AnchorConfig(stride=16, scales=(32.0,), ratios=(1.0,))
    anc = A.rpn_anchors(800, cfg)
    h = anc[:, 2] - anc[:, 0]
    w = anc[:, 3] - anc[:, 1]
    np.testing.assert_allclose(h, 32.0 / 800.0, atol=1e-6)
    np.testing.assert_allclose(w, 32.0 / 800.0, atol=1e-6)
    # first anchor centered on first cell center (8px)
    np.testing.assert_allclose((anc[0, 0] + anc[0, 2]) / 2, 8.0 / 800.0,
                               atol=1e-6)


def test_rpn_aspect_ratios_preserve_area():
    cfg = AnchorConfig(scales=(64.0,), ratios=(0.5, 1.0, 2.0))
    anc = A.rpn_anchors(800, cfg)[:3]
    areas = (anc[:, 2] - anc[:, 0]) * (anc[:, 3] - anc[:, 1])
    np.testing.assert_allclose(areas, (64.0 / 800.0) ** 2, rtol=1e-5)


def test_ssd_anchor_counts_match_helper():
    cfg = SSDAnchorConfig()
    anc = A.ssd_anchors(512, cfg)
    counts = A.ssd_layer_anchor_counts(512, cfg)
    assert anc.shape == (sum(counts), 4)
    # 512: strides 8,16,32,64,128 -> 64,32,16,8,4 cells/side, 6 anchors/cell
    assert counts == [64 * 64 * 6, 32 * 32 * 6, 16 * 16 * 6, 8 * 8 * 6,
                      4 * 4 * 6]


def test_ssd_scales_increase_with_layer():
    cfg = SSDAnchorConfig()
    counts = A.ssd_layer_anchor_counts(512, cfg)
    anc = A.ssd_anchors(512, cfg)
    start = 0
    mean_areas = []
    for c in counts:
        layer = anc[start:start + c]
        mean_areas.append(
            ((layer[:, 2] - layer[:, 0]) * (layer[:, 3] - layer[:, 1])).mean())
        start += c
    assert all(a < b for a, b in zip(mean_areas, mean_areas[1:]))
