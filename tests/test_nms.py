"""NMS vs a NumPy oracle + fused postprocess tests (SURVEY.md §4.2)."""

import jax.numpy as jnp
import numpy as np
import pytest

from bdd100k_tpu.ops import boxes as B
from bdd100k_tpu.ops.nms import (
    batched_class_nms,
    batched_class_nms_fixpoint,
    class_nms,
    fixpoint_greedy_suppress,
    greedy_keep_mask,
    nms_single_class,
)
from bdd100k_tpu.ops.postprocess import PostprocessConfig, postprocess


def numpy_nms_oracle(boxes, scores, iou_t, score_t):
    """The ~20-line host greedy NMS the reference uses (SURVEY.md §4.2)."""
    idx = np.argsort(-scores)
    idx = idx[scores[idx] > score_t]
    keep = []
    for i in idx:
        ok = True
        for j in keep:
            xx1 = max(boxes[i, 0], boxes[j, 0])
            yy1 = max(boxes[i, 1], boxes[j, 1])
            xx2 = min(boxes[i, 2], boxes[j, 2])
            yy2 = min(boxes[i, 3], boxes[j, 3])
            inter = max(xx2 - xx1, 0) * max(yy2 - yy1, 0)
            ai = (boxes[i, 2] - boxes[i, 0]) * (boxes[i, 3] - boxes[i, 1])
            aj = (boxes[j, 2] - boxes[j, 0]) * (boxes[j, 3] - boxes[j, 1])
            if inter / max(ai + aj - inter, 1e-12) > iou_t:
                ok = False
                break
        if ok:
            keep.append(i)
    return keep


def _random_boxes(rng, n):
    x1y1 = rng.uniform(0, 0.7, size=(n, 2))
    wh = rng.uniform(0.05, 0.3, size=(n, 2))
    return np.concatenate([x1y1, np.minimum(x1y1 + wh, 1.0)], -1).astype(
        np.float32
    )


def test_single_class_matches_oracle():
    rng = np.random.RandomState(0)
    for trial in range(5):
        boxes = _random_boxes(rng, 60)
        scores = rng.uniform(0, 1, 60).astype(np.float32)
        ob, osc, keep = nms_single_class(
            jnp.asarray(boxes), jnp.asarray(scores), 0.45, 0.05, topk=60
        )
        got = set(
            map(tuple, np.asarray(ob)[np.asarray(keep)].round(5).tolist())
        )
        oracle_idx = numpy_nms_oracle(boxes, scores, 0.45, 0.05)
        want = set(map(tuple, boxes[oracle_idx].round(5).tolist()))
        assert got == want, f"trial {trial}: {got ^ want}"


def test_greedy_keep_highest_survives():
    boxes = jnp.asarray(
        [[0.1, 0.1, 0.5, 0.5], [0.12, 0.12, 0.52, 0.52], [0.7, 0.7, 0.9, 0.9]]
    )
    keep = np.asarray(
        greedy_keep_mask(boxes, jnp.ones(3, bool), iou_threshold=0.45)
    )
    assert keep.tolist() == [True, False, True]


def test_class_nms_classwise_independence():
    """Identical boxes in different classes don't suppress each other."""
    boxes = jnp.asarray([[0.1, 0.1, 0.5, 0.5], [0.1, 0.1, 0.5, 0.5]])
    scores = jnp.asarray([[0.9, 0.0], [0.0, 0.8]])  # 2 anchors × 2 classes
    det = class_nms(boxes, scores, score_threshold=0.1, max_detections=10)
    valid = np.asarray(det.valid)
    assert valid.sum() == 2
    assert set(np.asarray(det.classes)[valid].tolist()) == {1, 2}


def test_class_nms_score_sorted_and_padded():
    rng = np.random.RandomState(1)
    boxes = jnp.asarray(_random_boxes(rng, 50))
    scores = jnp.asarray(rng.uniform(0, 1, size=(50, 3)).astype(np.float32))
    det = class_nms(boxes, scores, max_detections=100)
    s = np.asarray(det.scores)
    assert (np.diff(s) <= 1e-7).all()  # descending
    v = np.asarray(det.valid)
    assert (s[~v] == 0).all()
    assert (np.asarray(det.classes)[~v] == 0).all()


def test_batched_nms_matches_per_image():
    rng = np.random.RandomState(2)
    boxes = np.stack([_random_boxes(rng, 40) for _ in range(3)])
    scores = rng.uniform(0, 1, size=(3, 40, 2)).astype(np.float32)
    batched = batched_class_nms(jnp.asarray(boxes), jnp.asarray(scores))
    for i in range(3):
        single = class_nms(jnp.asarray(boxes[i]), jnp.asarray(scores[i]))
        np.testing.assert_allclose(
            np.asarray(batched.scores)[i], np.asarray(single.scores), atol=1e-6
        )


def test_postprocess_end_to_end():
    """Perfect logits around 2 anchors -> exactly those 2 detections."""
    from bdd100k_tpu.ops import anchors as A

    anchors = A.ssd_anchors(A.SSD300_FEATURE_MAPS)
    n = anchors.shape[0]
    loc = jnp.zeros((1, n, 4))
    cls = np.zeros((1, n, 11), np.float32)
    cls[..., 0] = 10.0  # background everywhere
    cls[0, 100, 0], cls[0, 100, 3] = 0.0, 12.0
    cls[0, 7000, 0], cls[0, 7000, 9] = 0.0, 12.0
    det = postprocess(
        loc, jnp.asarray(cls), anchors, PostprocessConfig(score_threshold=0.5)
    )
    valid = np.asarray(det.valid)[0]
    assert valid.sum() == 2
    got_classes = set(np.asarray(det.classes)[0][valid].tolist())
    assert got_classes == {3, 9}
    # boxes decode to the anchors themselves (zero deltas), clipped
    want = np.asarray(B.clip_boxes(B.center_to_corner(anchors[jnp.array([7000, 100])])))
    got = np.asarray(det.boxes)[0][valid]
    got_sorted = got[np.argsort(got[:, 0])]
    want_sorted = want[np.argsort(want[:, 0])]
    np.testing.assert_allclose(got_sorted, want_sorted, atol=1e-5)


def test_postprocess_sigmoid_mode():
    anchors = jnp.asarray([[0.5, 0.5, 0.2, 0.2], [0.2, 0.2, 0.1, 0.1]])
    loc = jnp.zeros((1, 2, 4))
    cls = jnp.asarray([[[8.0, 8.0, -8.0], [-8.0, 0.0, 0.0]]])  # obj, c1, c2
    cfg = PostprocessConfig(score_mode="sigmoid", score_threshold=0.5)
    det = postprocess(loc, cls, anchors, cfg)
    valid = np.asarray(det.valid)[0]
    assert valid.sum() == 1
    assert np.asarray(det.classes)[0][valid].tolist() == [1]


class TestFixpointSuppress:
    """fixpoint_greedy_suppress must match the sequential oracle exactly
    (it solves the same recurrence — SURVEY.md §4.2 parity discipline)."""

    @pytest.mark.parametrize("seed", [0, 1, 2])
    def test_matches_oracle_random(self, seed):
        rng = np.random.RandomState(seed)
        b, c, k = 3, 4, 64
        cxy = rng.uniform(0.05, 0.95, (b, c, k, 2))
        wh = rng.uniform(0.02, 0.4, (b, c, k, 2))
        boxes = np.clip(
            np.concatenate([cxy - wh / 2, cxy + wh / 2], -1), 0, 1
        ).astype(np.float32)
        valid = rng.rand(b, c, k) > 0.2
        keep = np.asarray(
            fixpoint_greedy_suppress(
                jnp.asarray(boxes), jnp.asarray(valid), 0.45
            )
        )
        for i in range(b):
            for j in range(c):
                exp = np.asarray(
                    greedy_keep_mask(
                        jnp.asarray(boxes[i, j]), jnp.asarray(valid[i, j]), 0.45
                    )
                )
                np.testing.assert_array_equal(keep[i, j], exp)

    def test_deep_suppression_chain(self):
        """Worst case for the Jacobi iteration: a K-long chain where each
        box overlaps only its neighbor, so greedy alternates keep/kill and
        the fixpoint needs many passes — must still terminate exact."""
        k = 48
        # boxes of width 0.05 sliding by 0.01: neighbor IoU = 0.04/0.06 =
        # 0.67 > 0.45, next-neighbor IoU = 0.03/0.07 = 0.43 < 0.45
        x = 0.01 * np.arange(k)
        boxes = np.stack([x, np.zeros(k), x + 0.05, np.full(k, 0.05)], -1)
        boxes = boxes.astype(np.float32)[None, None]  # (1, 1, K, 4)
        valid = np.ones((1, 1, k), bool)
        keep = np.asarray(
            fixpoint_greedy_suppress(jnp.asarray(boxes), jnp.asarray(valid), 0.45)
        )[0, 0]
        exp = np.asarray(
            greedy_keep_mask(jnp.asarray(boxes[0, 0]), jnp.asarray(valid[0, 0]), 0.45)
        )
        np.testing.assert_array_equal(keep, exp)
        assert keep.sum() == (k + 1) // 2  # alternating survivors

    @pytest.mark.parametrize("seed", [0, 7])
    def test_full_fixpoint_nms_matches_xla(self, seed):
        rng = np.random.RandomState(seed)
        b, n, c = 2, 300, 5
        cxy = rng.uniform(0.05, 0.95, (b, n, 2))
        wh = rng.uniform(0.02, 0.4, (b, n, 2))
        boxes = np.clip(
            np.concatenate([cxy - wh / 2, cxy + wh / 2], -1), 0, 1
        ).astype(np.float32)
        scores = rng.rand(b, n, c).astype(np.float32) ** 3
        kw = dict(
            iou_threshold=0.45,
            score_threshold=0.05,
            per_class_topk=64,
            max_detections=50,
        )
        ref = batched_class_nms(jnp.asarray(boxes), jnp.asarray(scores), **kw)
        out = batched_class_nms_fixpoint(
            jnp.asarray(boxes), jnp.asarray(scores), **kw
        )
        np.testing.assert_array_equal(
            np.asarray(ref.valid), np.asarray(out.valid)
        )
        np.testing.assert_allclose(
            np.asarray(ref.scores), np.asarray(out.scores), rtol=0, atol=0
        )
        np.testing.assert_array_equal(
            np.asarray(ref.classes), np.asarray(out.classes)
        )
        v = np.asarray(ref.valid)
        np.testing.assert_allclose(
            np.asarray(ref.boxes)[v], np.asarray(out.boxes)[v], rtol=0, atol=0
        )


def test_postprocess_impl_parity():
    """nms_impl='xla' vs 'fixpoint' vs 'pallas'(interpret path is exercised
    in test_pallas_nms) must produce identical Detections from real logits."""
    rng = np.random.RandomState(5)
    b, n, c = 2, 128, 4
    anchors = jnp.asarray(
        np.concatenate(
            [rng.uniform(0.2, 0.8, (n, 2)), rng.uniform(0.05, 0.3, (n, 2))], -1
        ).astype(np.float32)
    )
    loc = jnp.asarray(rng.randn(b, n, 4).astype(np.float32) * 0.1)
    cls = jnp.asarray(rng.randn(b, n, c + 1).astype(np.float32) * 2)
    ref = postprocess(loc, cls, anchors, PostprocessConfig(nms_impl="xla"))
    out = postprocess(loc, cls, anchors, PostprocessConfig(nms_impl="fixpoint"))
    np.testing.assert_array_equal(np.asarray(ref.valid), np.asarray(out.valid))
    np.testing.assert_allclose(
        np.asarray(ref.scores), np.asarray(out.scores), rtol=0, atol=0
    )
    np.testing.assert_array_equal(
        np.asarray(ref.classes), np.asarray(out.classes)
    )


def _assert_preselect_equal(a, b):
    """Candidate-set equality: scores/valid bit-equal everywhere; boxes
    bit-equal on VALID slots (zero-score slots hold arbitrary tie-broken
    anchors and can never suppress or become detections)."""
    (ab, asc, av), (bb, bsc, bv) = a, b
    np.testing.assert_array_equal(np.asarray(asc), np.asarray(bsc))
    np.testing.assert_array_equal(np.asarray(av), np.asarray(bv))
    v = np.asarray(av)
    np.testing.assert_array_equal(np.asarray(ab)[v], np.asarray(bb)[v])


class TestPrunedPreselect:
    """The two-stage anchor-pruned preselect (ops.nms._preselect_pruned)
    must produce IDENTICAL keep decisions to the dense path — sparse
    inputs take the pruned branch, dense inputs must trip the runtime
    guard and fall back."""

    @staticmethod
    def _sparse_scores(rng, b, n, c, n_hot, thr):
        """Scores where only ~n_hot anchors/image clear thr in any class."""
        scores = rng.rand(b, n, c).astype(np.float32) * thr * 0.9
        for i in range(b):
            hot = rng.choice(n, n_hot, replace=False)
            scores[i, hot] = thr + rng.rand(n_hot, c).astype(np.float32) * 0.9
        return scores

    @pytest.mark.parametrize("seed", [0, 3])
    def test_pruned_matches_dense_sparse_input(self, seed):
        from bdd100k_tpu.ops.nms import _preselect_candidates

        rng = np.random.RandomState(seed)
        b, n, c, thr = 3, 512, 5, 0.05
        boxes = np.stack([_random_boxes(rng, n) for _ in range(b)])
        scores = self._sparse_scores(rng, b, n, c, n_hot=40, thr=thr)
        dense = _preselect_candidates(
            jnp.asarray(boxes), jnp.asarray(scores), thr, 64, "exact"
        )
        pruned = _preselect_candidates(
            jnp.asarray(boxes), jnp.asarray(scores), thr, 64, "exact",
            prune_m=128,
        )
        _assert_preselect_equal(dense, pruned)

    def test_guard_falls_back_on_dense_input(self):
        from bdd100k_tpu.ops.nms import _preselect_candidates

        rng = np.random.RandomState(1)
        b, n, c = 2, 256, 4
        boxes = np.stack([_random_boxes(rng, n) for _ in range(b)])
        # every anchor above threshold in some class → prune_m=32 overflows
        scores = (0.2 + 0.8 * rng.rand(b, n, c)).astype(np.float32)
        dense = _preselect_candidates(
            jnp.asarray(boxes), jnp.asarray(scores), 0.1, 48, "exact"
        )
        pruned = _preselect_candidates(
            jnp.asarray(boxes), jnp.asarray(scores), 0.1, 48, "exact",
            prune_m=32,
        )
        for a, bb in zip(dense, pruned):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(bb))

    def test_pruned_tie_order_uses_true_anchor_ids(self):
        """Equal scores must keep the (score desc, ANCHOR idx asc) oracle
        order even though the pruned list is ordered by max-score."""
        from bdd100k_tpu.ops.nms import _preselect_candidates

        rng = np.random.RandomState(2)
        n, c = 256, 3
        boxes = _random_boxes(rng, n)[None]
        scores = np.zeros((1, n, c), np.float32)
        # class 0: a tie-run of 6 anchors at 0.5 placed at descending
        # positions, plus distinct fillers; other classes get noise that
        # reshuffles the stage-1 max-score order
        tie_anchors = [200, 150, 90, 60, 30, 10]
        scores[0, tie_anchors, 0] = 0.5
        scores[0, [5, 250], 0] = [0.9, 0.7]
        scores[0, :, 1] = 0.02 + 0.3 * rng.rand(n)
        dense = _preselect_candidates(
            jnp.asarray(boxes), jnp.asarray(scores), 0.01, 16, "exact"
        )
        pruned = _preselect_candidates(
            jnp.asarray(boxes), jnp.asarray(scores), 0.01, 16, "exact",
            prune_m=n // 2,
        )
        _assert_preselect_equal(dense, pruned)

    @pytest.mark.parametrize("preselect", ["exact", "approx"])
    def test_full_nms_with_pruning_matches_oracle(self, preselect):
        """End-to-end: fixpoint NMS with prune_m vs the XLA oracle on a
        sparse (trained-model-like) score distribution."""
        rng = np.random.RandomState(4)
        b, n, c, thr = 2, 400, 5, 0.05
        boxes = np.stack([_random_boxes(rng, n) for _ in range(b)])
        scores = self._sparse_scores(rng, b, n, c, n_hot=30, thr=thr)
        kw = dict(iou_threshold=0.45, score_threshold=thr,
                  per_class_topk=64, max_detections=50)
        ref = batched_class_nms(jnp.asarray(boxes), jnp.asarray(scores), **kw)
        out = batched_class_nms_fixpoint(
            jnp.asarray(boxes), jnp.asarray(scores), **kw,
            preselect=preselect, prune_m=128,
        )
        # approx preselect may differ on candidate SET only when rows
        # overflow k; with 30-hot rows and k=64 both are complete → exact
        np.testing.assert_array_equal(
            np.asarray(ref.valid), np.asarray(out.valid)
        )
        np.testing.assert_allclose(
            np.asarray(ref.scores), np.asarray(out.scores), rtol=0, atol=0
        )
        np.testing.assert_array_equal(
            np.asarray(ref.classes), np.asarray(out.classes)
        )
