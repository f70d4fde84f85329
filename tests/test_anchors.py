"""Anchor layout tests (SURVEY.md §4.2: assert 8732 / 24 564 anchor counts)."""

import numpy as np

from bdd100k_tpu.ops import anchors as A


def test_ssd300_anchor_count():
    anchors = A.ssd_anchors(A.SSD300_FEATURE_MAPS)
    assert anchors.shape == (8732, 4)


def test_ssd512_anchor_count():
    anchors = A.ssd_anchors(A.SSD512_FEATURE_MAPS)
    assert anchors.shape == (24564, 4)


def test_anchor_centers_in_unit_square():
    anchors = np.asarray(A.ssd_anchors(A.SSD300_FEATURE_MAPS))
    assert anchors[:, :2].min() > 0.0 and anchors[:, :2].max() < 1.0
    assert (anchors[:, 2:] > 0.0).all()


def test_first_map_layout():
    """First 4 anchors sit at cell (0,0) of the 38×38 map with scale 0.1."""
    anchors = np.asarray(A.ssd_anchors(A.SSD300_FEATURE_MAPS))
    c = 0.5 / 38.0
    np.testing.assert_allclose(anchors[:4, 0], c, atol=1e-6)
    np.testing.assert_allclose(anchors[:4, 1], c, atol=1e-6)
    # box 0: ar=1, scale 0.1
    np.testing.assert_allclose(anchors[0, 2:], [0.1, 0.1], atol=1e-6)
    # box 1: extra sqrt(s_k * s_{k+1}); for map 0, s'=sqrt(0.1*0.2)
    np.testing.assert_allclose(
        anchors[1, 2:], [np.sqrt(0.1 * 0.2)] * 2, atol=1e-6
    )
    # box 2: ar=2 -> (s*sqrt2, s/sqrt2)
    np.testing.assert_allclose(
        anchors[2, 2:], [0.1 * np.sqrt(2), 0.1 / np.sqrt(2)], atol=1e-6
    )


def test_scales_interpolate():
    fms = A.SSD300_FEATURE_MAPS
    assert abs(fms[0].scale - 0.1) < 1e-9
    assert abs(fms[1].scale - 0.2) < 1e-9
    assert abs(fms[-1].scale - 0.9) < 1e-9


def test_yolo_anchor_count_and_layout():
    anchors = A.yolo_anchors((40, 20, 10), A.YOLO_BDD_PRIORS)
    expected = 40 * 40 * 3 + 20 * 20 * 3 + 10 * 10 * 3
    assert anchors.shape == (expected, 4)
    a = np.asarray(anchors)
    # first cell of first scale has the 3 stride-8 priors
    np.testing.assert_allclose(a[0, 2:], A.YOLO_BDD_PRIORS[0][0], atol=1e-6)
    np.testing.assert_allclose(a[0, :2], 0.5 / 40.0, atol=1e-6)
