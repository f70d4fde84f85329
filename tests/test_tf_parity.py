"""Cross-library parity: our NMS vs TensorFlow's `tf.image` ops.

The reference is a TF1-era detector (SURVEY.md §0) whose postprocess
semantics come from the TF ecosystem, so `tf.image.non_max_suppression`
and `tf.image.combined_non_max_suppression` are genuinely external
oracles — unlike the in-repo jnp oracle, they share no code or authorship
with the implementation under test. Scores/boxes are random floats, so
every comparison is tie-free (exact-equal scores or exact-threshold IoUs
are measure-zero); set-level agreement is therefore exact.

Skipped automatically when TensorFlow is not installed.
"""

from __future__ import annotations

import numpy as np
import pytest

tf = pytest.importorskip("tensorflow")

import jax.numpy as jnp

from bdd100k_tpu.ops.nms import batched_class_nms, nms_single_class

IOU_T = 0.45
SCORE_T = 0.1


def _random_boxes(rng, n):
    """Corner boxes (x1, y1, x2, y2) in [0, 1] with positive extent."""
    xy1 = rng.uniform(0.0, 0.7, size=(n, 2))
    wh = rng.uniform(0.05, 0.3, size=(n, 2))
    return np.concatenate([xy1, xy1 + wh], axis=1).astype(np.float32)


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_single_class_keep_set_matches_tf(seed):
    """nms_single_class selects exactly the boxes tf.image.non_max_suppression
    selects (same greedy chain, same thresholds)."""
    rng = np.random.default_rng(seed)
    n = 60
    boxes = _random_boxes(rng, n)
    scores = rng.uniform(0.0, 1.0, size=(n,)).astype(np.float32)

    # TF suppresses by IoU > threshold and drops score <= score_threshold;
    # indices come back score-descending.
    tf_idx = tf.image.non_max_suppression(
        boxes,  # coordinate-order agnostic: IoU is symmetric in the axes
        scores,
        max_output_size=n,
        iou_threshold=IOU_T,
        score_threshold=SCORE_T,
    ).numpy()
    tf_scores = np.sort(scores[tf_idx])[::-1]

    out_boxes, out_scores, keep = nms_single_class(
        jnp.asarray(boxes),
        jnp.asarray(scores),
        iou_threshold=IOU_T,
        score_threshold=SCORE_T,
        topk=n,
    )
    ours_scores = np.sort(np.asarray(out_scores)[np.asarray(keep)])[::-1]

    # distinct random scores -> score sets identify box sets uniquely
    np.testing.assert_array_equal(ours_scores, tf_scores)
    # and the surviving boxes themselves match, keyed by score
    order_tf = np.argsort(scores[tf_idx])
    kept_ours = np.asarray(out_boxes)[np.asarray(keep)]
    order_ours = np.argsort(np.asarray(out_scores)[np.asarray(keep)])
    np.testing.assert_allclose(
        kept_ours[order_ours], boxes[tf_idx][order_tf], rtol=0, atol=0
    )


@pytest.mark.parametrize("seed", [0, 7])
def test_batched_classwise_matches_tf_combined_nms(seed):
    """batched_class_nms agrees with tf.image.combined_non_max_suppression:
    same surviving (score, class) multiset and same boxes per image."""
    rng = np.random.default_rng(100 + seed)
    b, n, c = 3, 50, 4
    max_det = 40
    boxes = np.stack([_random_boxes(rng, n) for _ in range(b)])  # (B, N, 4)
    scores = rng.uniform(0.0, 1.0, size=(b, n, c)).astype(np.float32)

    nmsed_boxes, nmsed_scores, nmsed_classes, valid = (
        tf.image.combined_non_max_suppression(
            boxes[:, :, None, :],  # shared boxes across classes
            scores,
            max_output_size_per_class=n,
            max_total_size=max_det,
            iou_threshold=IOU_T,
            score_threshold=SCORE_T,
            pad_per_class=False,
            clip_boxes=False,
        )
    )
    nmsed_boxes = nmsed_boxes.numpy()
    nmsed_scores = nmsed_scores.numpy()
    nmsed_classes = nmsed_classes.numpy()
    valid = valid.numpy()

    det = batched_class_nms(
        jnp.asarray(boxes),
        jnp.asarray(scores),
        iou_threshold=IOU_T,
        score_threshold=SCORE_T,
        per_class_topk=n,
        max_detections=max_det,
    )

    for i in range(b):
        v = int(valid[i])
        ours_v = int(np.asarray(det.valid[i]).sum())
        assert ours_v == v
        # both are score-descending over distinct scores
        np.testing.assert_array_equal(
            np.asarray(det.scores[i])[:v], nmsed_scores[i][:v]
        )
        # our classes are 1-based, TF's 0-based floats
        np.testing.assert_array_equal(
            np.asarray(det.classes[i])[:v].astype(np.float32),
            nmsed_classes[i][:v] + 1.0,
        )
        np.testing.assert_allclose(
            np.asarray(det.boxes[i])[:v], nmsed_boxes[i][:v], rtol=0, atol=0
        )
