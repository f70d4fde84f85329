"""Fused Pallas matcher vs ops.matching.encode_targets: identical outputs
(SURVEY.md §4.2 oracle-agreement rule, same as the NMS kernel)."""

import jax.numpy as jnp
import numpy as np
import pytest

from bdd100k_tpu.ops.anchors import make_ssd_feature_maps, ssd_anchors
from bdd100k_tpu.ops.matching import encode_targets
from bdd100k_tpu.ops.pallas_matcher import pallas_encode_targets

ANCHORS = ssd_anchors(
    make_ssd_feature_maps(map_sizes=(16, 8, 4), boxes_per_map=(4, 6, 4))
)  # 1472 anchors — small enough for fast interpret runs


def _random_gt(rng, b, m, n_real):
    boxes = np.zeros((b, m, 4), np.float32)
    labels = np.zeros((b, m), np.int32)
    mask = np.zeros((b, m), bool)
    for i in range(b):
        n = n_real if np.isscalar(n_real) else n_real[i]
        cxy = rng.uniform(0.15, 0.85, (n, 2))
        wh = rng.uniform(0.05, 0.5, (n, 2))
        bb = np.concatenate([cxy - wh / 2, cxy + wh / 2], -1)
        boxes[i, :n] = np.clip(bb, 0, 1)
        labels[i, :n] = rng.randint(1, 11, n)
        mask[i, :n] = True
        # padding rows get garbage to prove the mask guards them
        boxes[i, n:] = rng.rand(m - n, 4)
        labels[i, n:] = rng.randint(1, 11, m - n)
    return jnp.asarray(boxes), jnp.asarray(labels), jnp.asarray(mask)


@pytest.mark.parametrize("seed", [0, 1])
def test_matches_oracle(seed):
    rng = np.random.RandomState(seed)
    b, m = 3, 12
    gtb, gtl, gtm = _random_gt(rng, b, m, rng.randint(1, m, b))

    ref = encode_targets(gtb, gtl, gtm, ANCHORS, 0.5)
    out = pallas_encode_targets(gtb, gtl, gtm, ANCHORS, 0.5, interpret=True)

    np.testing.assert_array_equal(
        np.asarray(ref.positive), np.asarray(out.positive)
    )
    np.testing.assert_array_equal(
        np.asarray(ref.cls_targets), np.asarray(out.cls_targets)
    )
    # matched_gt only meaningful where positive
    p = np.asarray(ref.positive)
    np.testing.assert_array_equal(
        np.asarray(ref.matched_gt)[p], np.asarray(out.matched_gt)[p]
    )
    np.testing.assert_allclose(
        np.asarray(ref.loc_targets), np.asarray(out.loc_targets),
        rtol=1e-5, atol=1e-6,
    )


def test_duplicate_claims_and_empty_image():
    """Two identical GTs force-claim the same anchor (later wins), plus an
    image with zero real GTs (everything negative)."""
    b, m = 2, 4
    boxes = np.zeros((b, m, 4), np.float32)
    labels = np.zeros((b, m), np.int32)
    mask = np.zeros((b, m), bool)
    boxes[0, 0] = boxes[0, 1] = (0.2, 0.2, 0.6, 0.6)
    labels[0, 0], labels[0, 1] = 3, 7
    mask[0, :2] = True
    gtb, gtl, gtm = map(jnp.asarray, (boxes, labels, mask))

    ref = encode_targets(gtb, gtl, gtm, ANCHORS, 0.5)
    out = pallas_encode_targets(gtb, gtl, gtm, ANCHORS, 0.5, interpret=True)
    np.testing.assert_array_equal(
        np.asarray(ref.positive), np.asarray(out.positive)
    )
    np.testing.assert_array_equal(
        np.asarray(ref.cls_targets), np.asarray(out.cls_targets)
    )
    assert not np.asarray(out.positive)[1].any()  # empty image
    # the shared claim resolves to GT 1 (class 7) somewhere
    assert (np.asarray(out.cls_targets)[0] == 7).any()
