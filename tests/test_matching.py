"""Matcher + hard-negative-mining invariants (SURVEY.md §4.2)."""


import jax.numpy as jnp
import numpy as np

from bdd100k_tpu.ops import anchors as A
from bdd100k_tpu.ops import boxes as B
from bdd100k_tpu.ops.matching import encode_targets, match_anchors
from bdd100k_tpu.ops.mining import hard_negative_mask


def _pad_gt(boxes, labels, max_boxes=8):
    n = len(boxes)
    gb = np.zeros((max_boxes, 4), np.float32)
    gl = np.zeros((max_boxes,), np.int32)
    gm = np.zeros((max_boxes,), bool)
    if n:
        gb[:n], gl[:n], gm[:n] = boxes, labels, True
    return jnp.asarray(gb), jnp.asarray(gl), jnp.asarray(gm)


ANCHORS = A.ssd_anchors(A.SSD300_FEATURE_MAPS)


def test_every_gt_matched():
    """Bipartite step: every real GT gets >= 1 positive anchor, even a tiny
    off-grid box with IoU < threshold to everything."""
    gb, gl, gm = _pad_gt(
        [[0.001, 0.001, 0.012, 0.013], [0.4, 0.4, 0.6, 0.6]], [3, 1]
    )
    m = match_anchors(gb, gl, gm, ANCHORS)
    matched_gts = np.asarray(m.matched_gt)[np.asarray(m.positive)]
    assert {0, 1}.issubset(set(matched_gts.tolist()))


def test_padding_never_matches():
    gb, gl, gm = _pad_gt([[0.4, 0.4, 0.6, 0.6]], [2])
    m = match_anchors(gb, gl, gm, ANCHORS)
    pos_gts = set(np.asarray(m.matched_gt)[np.asarray(m.positive)].tolist())
    assert pos_gts == {0}
    # all positives carry the GT's class
    assert set(np.asarray(m.cls_targets)[np.asarray(m.positive)]) == {2}


def test_no_gt_image_all_negative():
    gb, gl, gm = _pad_gt([], [])
    m = match_anchors(gb, gl, gm, ANCHORS)
    assert not np.asarray(m.positive).any()
    assert (np.asarray(m.cls_targets) == 0).all()


def test_threshold_rule():
    """An anchor exactly equal to a GT box must be positive with IoU 1."""
    anchor_c = np.asarray(ANCHORS)[5000]
    gt_corner = np.asarray(B.center_to_corner(jnp.asarray(anchor_c[None])))[0]
    gb, gl, gm = _pad_gt([gt_corner], [7])
    m = match_anchors(gb, gl, gm, ANCHORS)
    assert bool(np.asarray(m.positive)[5000])
    assert int(np.asarray(m.cls_targets)[5000]) == 7


def test_loc_targets_decode_back_to_gt():
    gb, gl, gm = _pad_gt([[0.3, 0.3, 0.7, 0.7]], [1])
    m = match_anchors(gb, gl, gm, ANCHORS)
    pos = np.asarray(m.positive)
    decoded = np.asarray(B.decode_boxes(m.loc_targets, ANCHORS))[pos]
    np.testing.assert_allclose(
        decoded, np.tile([[0.3, 0.3, 0.7, 0.7]], (pos.sum(), 1)), atol=1e-4
    )


def test_batched_encode_targets():
    gb, gl, gm = _pad_gt([[0.3, 0.3, 0.7, 0.7]], [1])
    batch = lambda x: jnp.stack([x, x, x])
    m = encode_targets(batch(gb), batch(gl), batch(gm), ANCHORS)
    assert m.positive.shape == (3, ANCHORS.shape[0])
    p = np.asarray(m.positive)
    assert (p[0] == p[1]).all() and (p[0] == p[2]).all()


def test_hard_negative_ratio():
    """Kept negatives ≤ 3 × positives, and they are the highest-loss ones."""
    rng = np.random.RandomState(0)
    n = 1000
    loss = jnp.asarray(rng.uniform(0, 5, n).astype(np.float32))
    positive = jnp.asarray(rng.uniform(size=n) < 0.02)
    neg = hard_negative_mask(loss, positive, neg_pos_ratio=3.0)
    neg_np, pos_np = np.asarray(neg), np.asarray(positive)
    assert not (neg_np & pos_np).any()
    assert neg_np.sum() == min(3 * pos_np.sum(), (~pos_np).sum())
    # chosen negatives all have loss >= every unchosen negative's loss
    chosen_min = np.asarray(loss)[neg_np].min()
    unchosen = ~neg_np & ~pos_np
    if unchosen.any():
        assert chosen_min >= np.asarray(loss)[unchosen].max() - 1e-6


def test_hard_negative_no_positives_uses_floor():
    loss = jnp.asarray(np.linspace(0, 1, 100, dtype=np.float32))
    positive = jnp.zeros(100, bool)
    neg = hard_negative_mask(loss, positive, min_negatives=10)
    assert np.asarray(neg).sum() == 10


def test_hard_negative_batched():
    rng = np.random.RandomState(1)
    loss = jnp.asarray(rng.uniform(0, 1, (4, 200)).astype(np.float32))
    positive = jnp.asarray(rng.uniform(size=(4, 200)) < 0.05)
    neg = np.asarray(hard_negative_mask(loss, positive))
    for i in range(4):
        npos = np.asarray(positive)[i].sum()
        assert neg[i].sum() <= 3 * npos
