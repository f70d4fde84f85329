"""Model shape/assembly tests (SURVEY.md §2.3): heads align with anchors."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from bdd100k_tpu.configs import (
    SSD_MOBILENET_300,
    SSD_VGG16_512,
    YOLO_MOBILENET_384,
)
from bdd100k_tpu.models import build_detector
from bdd100k_tpu.models.losses import ssd_loss, yolo_loss
from bdd100k_tpu.ops.matching import encode_targets
from bdd100k_tpu.ops import boxes as B


@pytest.fixture(scope="module")
def ssd300():
    bundle = build_detector(SSD_MOBILENET_300, dtype=jnp.float32)
    variables = bundle.init(jax.random.PRNGKey(0))
    return bundle, variables


def test_ssd_mobilenet_300_shapes(ssd300):
    bundle, variables = ssd300
    images = jnp.zeros((2, 300, 300, 3))
    loc, cls = bundle.apply(variables, images)
    assert loc.shape == (2, 8732, 4)
    assert cls.shape == (2, 8732, 11)
    assert bundle.anchors.shape == (8732, 4)


def test_ssd300_postprocess_runs(ssd300):
    bundle, variables = ssd300
    images = jnp.zeros((1, 300, 300, 3))
    loc, cls = bundle.apply(variables, images)
    det = bundle.postprocess(loc, cls)
    assert det.boxes.shape == (1, 200, 4)
    assert det.valid.shape == (1, 200)


def test_ssd300_train_loss_finite(ssd300):
    bundle, variables = ssd300
    images = jax.random.uniform(jax.random.PRNGKey(1), (2, 300, 300, 3))
    gt_boxes = jnp.tile(jnp.asarray([[0.2, 0.2, 0.6, 0.6]]), (2, 1, 1))
    gt_boxes = jnp.pad(gt_boxes, ((0, 0), (0, 7), (0, 0)))
    gt_labels = jnp.pad(jnp.full((2, 1), 3, jnp.int32), ((0, 0), (0, 7)))
    gt_mask = jnp.pad(
        jnp.ones((2, 1), bool), ((0, 0), (0, 7)), constant_values=False
    )

    def loss_fn(params):
        loc, cls = bundle.model.apply(
            {**variables, "params": params},
            images,
            train=True,
            mutable=["batch_stats"],
        )[0]
        match = encode_targets(gt_boxes, gt_labels, gt_mask, bundle.anchors)
        return ssd_loss(loc, cls, match).total

    loss, grads = jax.value_and_grad(loss_fn)(variables["params"])
    assert np.isfinite(float(loss))
    flat = jax.tree_util.tree_leaves(grads)
    assert all(np.isfinite(np.asarray(g)).all() for g in flat)


@pytest.mark.slow
def test_ssd_vgg16_512_shapes():
    bundle = build_detector(SSD_VGG16_512, dtype=jnp.float32)
    variables = bundle.init(jax.random.PRNGKey(0))
    loc, cls = bundle.apply(variables, jnp.zeros((1, 512, 512, 3)))
    assert loc.shape == (1, 24564, 4)
    assert cls.shape == (1, 24564, 11)


def test_yolo_384_shapes_and_loss():
    bundle = build_detector(YOLO_MOBILENET_384, dtype=jnp.float32)
    variables = bundle.init(jax.random.PRNGKey(0))
    images = jax.random.uniform(jax.random.PRNGKey(1), (2, 384, 384, 3))
    loc, obj_cls = bundle.apply(variables, images)
    a = bundle.config.num_anchors
    assert loc.shape == (2, a, 4)
    assert obj_cls.shape == (2, a, 11)  # obj + 10 classes

    gt_boxes = jnp.tile(jnp.asarray([[0.2, 0.2, 0.6, 0.6]]), (2, 1, 1))
    gt_labels = jnp.full((2, 1), 3, jnp.int32)
    gt_mask = jnp.ones((2, 1), bool)
    match = encode_targets(gt_boxes, gt_labels, gt_mask, bundle.anchors)
    sig_targets = jax.vmap(
        lambda bx: B.yolo_encode_boxes(bx, bundle.anchors, bundle.cell_sizes)
    )(gt_boxes[:, 0:1].repeat(a, axis=1))
    # gather matched targets: use matched_gt to index gt (1 gt here, trivial)
    lb = yolo_loss(loc, obj_cls, match, sig_targets)
    assert np.isfinite(float(lb.total))

    det = bundle.postprocess(loc, obj_cls)
    assert det.boxes.shape == (2, 200, 4)


def test_yolo_encode_decode_roundtrip():
    from bdd100k_tpu.ops.anchors import yolo_anchors, yolo_cell_sizes, YOLO_BDD_PRIORS

    anchors = yolo_anchors((12,), YOLO_BDD_PRIORS[:1])
    cells = yolo_cell_sizes((12,), YOLO_BDD_PRIORS[:1])
    rng = np.random.RandomState(0)
    # boxes near each anchor (within its cell)
    a = np.asarray(anchors)
    cxy = a[:, :2] + (rng.uniform(-0.4, 0.4, (len(a), 2))) * np.asarray(cells)[:, None]
    wh = a[:, 2:] * np.exp(rng.uniform(-0.5, 0.5, (len(a), 2)))
    gt = jnp.asarray(
        np.concatenate([cxy - wh / 2, cxy + wh / 2], -1), jnp.float32
    )
    enc = B.yolo_encode_boxes(gt, anchors, cells)
    # decode expects raw logits; invert sigmoid on the xy part
    sxy = np.clip(np.asarray(enc[:, :2]), 1e-6, 1 - 1e-6)
    logits = np.log(sxy / (1 - sxy))
    deltas = jnp.asarray(
        np.concatenate([logits, np.asarray(enc[:, 2:])], -1), jnp.float32
    )
    back = B.yolo_decode_boxes(deltas, anchors, cells)
    np.testing.assert_allclose(np.asarray(back), np.asarray(gt), atol=1e-4)
