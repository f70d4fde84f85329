"""Unit tests for core box math (SURVEY.md §4.2: IoU, encode/decode round-trip)."""

import jax.numpy as jnp
import numpy as np
import pytest

from bdd100k_tpu.ops import boxes as B


def test_corner_center_roundtrip():
    rng = np.random.RandomState(0)
    c = rng.uniform(0.1, 0.9, size=(32, 4)).astype(np.float32)
    # make valid corners
    corners = np.stack(
        [
            np.minimum(c[:, 0], c[:, 2]),
            np.minimum(c[:, 1], c[:, 3]),
            np.maximum(c[:, 0], c[:, 2]) + 0.01,
            np.maximum(c[:, 1], c[:, 3]) + 0.01,
        ],
        axis=-1,
    )
    out = B.center_to_corner(B.corner_to_center(jnp.asarray(corners)))
    np.testing.assert_allclose(np.asarray(out), corners, atol=1e-6)


def test_iou_known_values():
    a = jnp.array([[0.0, 0.0, 1.0, 1.0]])
    b = jnp.array(
        [
            [0.0, 0.0, 1.0, 1.0],   # identical -> 1
            [0.5, 0.0, 1.5, 1.0],   # half overlap -> 0.5/1.5
            [2.0, 2.0, 3.0, 3.0],   # disjoint -> 0
            [0.25, 0.25, 0.75, 0.75],  # contained -> 0.25
        ]
    )
    iou = np.asarray(B.iou_pairwise(a, b))[0]
    np.testing.assert_allclose(
        iou, [1.0, 0.5 / 1.5, 0.0, 0.25], atol=1e-6
    )


def test_iou_pairwise_matches_aligned_diag():
    rng = np.random.RandomState(1)
    x1y1 = rng.uniform(0, 0.5, size=(16, 2))
    wh = rng.uniform(0.05, 0.5, size=(16, 2))
    boxes = jnp.asarray(
        np.concatenate([x1y1, x1y1 + wh], axis=-1), dtype=jnp.float32
    )
    full = np.asarray(B.iou_pairwise(boxes, boxes))
    diag = np.asarray(B.iou_aligned(boxes, boxes))
    np.testing.assert_allclose(np.diag(full), diag, atol=1e-6)
    np.testing.assert_allclose(np.diag(full), 1.0, atol=1e-6)
    # symmetry
    np.testing.assert_allclose(full, full.T, atol=1e-6)


def test_encode_decode_roundtrip():
    """encode∘decode = identity within 1e-5 (SURVEY.md §4.2)."""
    rng = np.random.RandomState(2)
    x1y1 = rng.uniform(0, 0.5, size=(64, 2))
    wh = rng.uniform(0.05, 0.45, size=(64, 2))
    gt = jnp.asarray(np.concatenate([x1y1, x1y1 + wh], -1), dtype=jnp.float32)
    anchors = jnp.asarray(
        np.concatenate(
            [rng.uniform(0.2, 0.8, (64, 2)), rng.uniform(0.1, 0.4, (64, 2))],
            axis=-1,
        ),
        dtype=jnp.float32,
    )
    deltas = B.encode_boxes(gt, anchors)
    back = B.decode_boxes(deltas, anchors)
    # fp32 exp(log(.)) roundtrip: ~1.5e-5 worst case at these magnitudes
    np.testing.assert_allclose(np.asarray(back), np.asarray(gt), atol=2e-5)


def test_decode_identity_deltas():
    """Zero deltas decode to the anchor itself."""
    anchors = jnp.array([[0.5, 0.5, 0.2, 0.4]])
    out = np.asarray(B.decode_boxes(jnp.zeros((1, 4)), anchors))[0]
    np.testing.assert_allclose(out, [0.4, 0.3, 0.6, 0.7], atol=1e-6)


def test_area_and_clip():
    boxes = jnp.array([[0.2, 0.2, 0.7, 0.6], [-0.5, -0.5, 1.5, 1.5]])
    np.testing.assert_allclose(np.asarray(B.area(boxes)), [0.2, 4.0], atol=1e-6)
    clipped = np.asarray(B.clip_boxes(boxes))
    assert clipped.min() >= 0.0 and clipped.max() <= 1.0


@pytest.mark.parametrize("variances", [(0.1, 0.2), (1.0, 1.0)])
def test_encode_variances_scale(variances):
    gt = jnp.array([[0.3, 0.3, 0.5, 0.5]])
    anchors = jnp.array([[0.5, 0.5, 0.2, 0.2]])
    d = np.asarray(B.encode_boxes(gt, anchors, variances))
    vc, vs = variances
    # tx = (0.4-0.5)/(0.2*vc)
    np.testing.assert_allclose(d[0, 0], -0.1 / (0.2 * vc), atol=1e-5)
    np.testing.assert_allclose(d[0, 2], np.log(1.0) / vs, atol=1e-5)
