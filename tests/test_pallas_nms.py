"""Pallas NMS vs jnp reference NMS must agree exactly (SURVEY.md §4.2).

Runs the kernel in interpreter mode on the CPU test backend; on TPU the same
code path compiles via Mosaic.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from bdd100k_tpu.ops.nms import (
    _reorder_tied_runs,
    batched_class_nms,
    batched_class_nms_pallas,
    greedy_keep_mask,
)
from bdd100k_tpu.ops.pallas_nms import pallas_greedy_suppress


def _random_boxes(rng, n):
    cxy = rng.uniform(0.05, 0.95, (n, 2))
    wh = rng.uniform(0.02, 0.4, (n, 2))
    b = np.concatenate([cxy - wh / 2, cxy + wh / 2], -1)
    return np.clip(b, 0, 1).astype(np.float32)


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_suppress_kernel_matches_oracle(seed):
    rng = np.random.RandomState(seed)
    b, c, k = 2, 3, 40
    boxes = np.stack(
        [np.stack([_random_boxes(rng, k) for _ in range(c)]) for _ in range(b)]
    )  # (B, C, K, 4) — already "sorted" by construction order
    valid = rng.rand(b, c, k) > 0.2

    keep = np.asarray(
        pallas_greedy_suppress(
            jnp.asarray(boxes), jnp.asarray(valid), 0.45, interpret=True
        )
    )
    for i in range(b):
        for j in range(c):
            expect = np.asarray(
                greedy_keep_mask(
                    jnp.asarray(boxes[i, j]), jnp.asarray(valid[i, j]), 0.45
                )
            )
            np.testing.assert_array_equal(keep[i, j], expect)


@pytest.mark.parametrize("seed", [0, 7])
def test_full_pallas_nms_matches_xla(seed):
    """End-to-end: decode-less class NMS, pallas vs xla paths, exact match."""
    rng = np.random.RandomState(seed)
    b, n, c = 2, 300, 5
    boxes = np.stack([_random_boxes(rng, n) for _ in range(b)])
    scores = rng.rand(b, n, c).astype(np.float32) ** 3  # mostly small

    kw = dict(
        iou_threshold=0.45,
        score_threshold=0.05,
        per_class_topk=64,
        max_detections=50,
    )
    ref = batched_class_nms(jnp.asarray(boxes), jnp.asarray(scores), **kw)
    out = batched_class_nms_pallas(
        jnp.asarray(boxes), jnp.asarray(scores), interpret=True, **kw
    )
    np.testing.assert_array_equal(np.asarray(ref.valid), np.asarray(out.valid))
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


@pytest.mark.parametrize("n", [512, 24_564])  # 24 564 = SSD512 anchors:
def test_reorder_tied_runs_fixes_adversarial_tie_orders(n):
    """_reorder_tied_runs must turn ANY within-run index order into
    (score desc, idx asc) — lax.top_k's tie order. The CPU backend never
    produces scrambled ties (its approx_max_k lowers to an exact sorted
    top-k), so this feeds the helper adversarially shuffled runs directly;
    n = 24 564 exercises the >16 384-anchor index-packing width."""
    rng = np.random.RandomState(3)
    rows, k = 6, 64
    # few distinct score levels -> long equal runs, including across the
    # run boundaries the cummax labeling must detect
    levels = np.sort(rng.rand(8).astype(np.float32))[::-1]
    scores = np.sort(
        levels[rng.randint(0, 8, size=(rows, k))], axis=-1
    )[:, ::-1]  # non-increasing, as aggregate_to_topk guarantees
    # distinct indices per row, deliberately NOT ascending within runs
    idx = np.stack(
        [rng.choice(n, size=k, replace=False) for _ in range(rows)]
    ).astype(np.int32)

    got = np.asarray(
        _reorder_tied_runs(jnp.asarray(scores), jnp.asarray(idx), n)
    )

    for r in range(rows):
        order = np.lexsort((idx[r], -scores[r]))  # score desc, idx asc
        np.testing.assert_array_equal(got[r], idx[r][order])


def test_exact_preselect_tie_order_matches_oracle():
    """preselect='exact' uses approx_max_k(recall_target=1.0), which is
    value-exact but may order TIED scores differently from lax.top_k; the
    re-sort by (score desc, index asc) must keep greedy NMS keep decisions
    bit-identical to the oracle even with many exact ties (ADVICE r2)."""
    rng = np.random.RandomState(11)
    b, n, c = 2, 256, 4
    boxes = np.stack([_random_boxes(rng, n) for _ in range(b)])
    # heavy deliberate ties: scores quantized to 8 levels
    scores = (np.ceil(rng.rand(b, n, c) * 8) / 8).astype(np.float32)

    kw = dict(
        iou_threshold=0.45,
        score_threshold=0.05,
        per_class_topk=64,
        max_detections=50,
    )
    ref = batched_class_nms(jnp.asarray(boxes), jnp.asarray(scores), **kw)
    out = batched_class_nms_pallas(
        jnp.asarray(boxes), jnp.asarray(scores), interpret=True,
        preselect="exact", **kw
    )
    np.testing.assert_array_equal(np.asarray(ref.valid), np.asarray(out.valid))
    v = np.asarray(ref.valid)
    np.testing.assert_array_equal(
        np.asarray(ref.classes)[v], np.asarray(out.classes)[v]
    )
    np.testing.assert_allclose(
        np.asarray(ref.scores), np.asarray(out.scores), rtol=0, atol=0
    )
    np.testing.assert_allclose(
        np.asarray(ref.boxes)[v], np.asarray(out.boxes)[v], rtol=0, atol=0
    )
