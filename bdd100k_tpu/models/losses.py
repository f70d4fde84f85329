"""Detection losses (SURVEY.md §2.3; SSD §2.2).

SSD:  L = (1/N_pos) · (CE_conf over pos∪mined-neg + α·smoothL1_loc over pos),
      α = 1, hard negatives mined at ≤ 3:1 (ops.mining).
YOLO: objectness BCE (all anchors, mined negatives) + class BCE (pos)
      + coord loss: MSE in σ-space for xy, smooth-L1 for log-wh (pos).

Pure jitted functions over the matcher outputs — they run inside the pjit
train step, batched, sharded on the data axis.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import optax

from bdd100k_tpu.ops.matching import MatchResult
from bdd100k_tpu.ops.mining import hard_negative_mask


class LossBreakdown(NamedTuple):
    total: jnp.ndarray
    conf: jnp.ndarray
    loc: jnp.ndarray


def smooth_l1(x: jnp.ndarray) -> jnp.ndarray:
    ax = jnp.abs(x)
    return jnp.where(ax < 1.0, 0.5 * x * x, ax - 0.5)


def ssd_loss(
    loc_preds: jnp.ndarray,
    cls_preds: jnp.ndarray,
    match: MatchResult,
    neg_pos_ratio: float = 3.0,
    loc_weight: float = 1.0,
) -> LossBreakdown:
    """SSD multibox loss, batched.

    Args:
      loc_preds: (B, A, 4) regression outputs.
      cls_preds: (B, A, C+1) class logits (col 0 = background).
      match: batched MatchResult from ops.matching.encode_targets.
    """
    loc_preds = loc_preds.astype(jnp.float32)
    cls_preds = cls_preds.astype(jnp.float32)
    positive = match.positive

    ce = optax.softmax_cross_entropy_with_integer_labels(
        cls_preds, match.cls_targets
    )  # (B, A)
    # Mining uses each negative's *background* CE as its hardness score.
    neg_mask = hard_negative_mask(
        jax.lax.stop_gradient(ce), positive, neg_pos_ratio, min_negatives=1
    )
    conf_mask = positive | neg_mask
    num_pos = jnp.maximum(jnp.sum(positive, axis=-1), 1).astype(jnp.float32)

    conf_loss = jnp.sum(jnp.where(conf_mask, ce, 0.0), axis=-1) / num_pos
    loc_err = smooth_l1(loc_preds - match.loc_targets).sum(-1)
    loc_loss = (
        jnp.sum(jnp.where(positive, loc_err, 0.0), axis=-1) / num_pos
    )
    conf_loss = jnp.mean(conf_loss)
    loc_loss = jnp.mean(loc_loss)
    return LossBreakdown(conf_loss + loc_weight * loc_loss, conf_loss, loc_loss)


def yolo_loss(
    loc_preds: jnp.ndarray,
    obj_cls_preds: jnp.ndarray,
    match: MatchResult,
    sigma_xy_targets: jnp.ndarray,
    neg_pos_ratio: float = 3.0,
    obj_weight: float = 1.0,
    cls_weight: float = 1.0,
    loc_weight: float = 2.0,
) -> LossBreakdown:
    """YOLO-style loss, batched.

    Args:
      loc_preds: (B, A, 4) raw (tx, ty, tw, th).
      obj_cls_preds: (B, A, 1+C): objectness logit + class logits.
      match: batched MatchResult (loc_targets unused — YOLO encodes its own).
      sigma_xy_targets: (B, A, 4) = (σx*, σy*, tw*, th*) from
        ops.boxes.yolo_encode_boxes over the matched GT boxes.
    """
    loc_preds = loc_preds.astype(jnp.float32)
    obj_cls_preds = obj_cls_preds.astype(jnp.float32)
    positive = match.positive
    pos_f = positive.astype(jnp.float32)
    num_pos = jnp.maximum(jnp.sum(pos_f, axis=-1), 1.0)

    obj_logit = obj_cls_preds[..., 0]
    obj_bce = optax.sigmoid_binary_cross_entropy(obj_logit, pos_f)  # (B, A)
    neg_mask = hard_negative_mask(
        jax.lax.stop_gradient(obj_bce), positive, neg_pos_ratio, min_negatives=1
    )
    obj_mask = positive | neg_mask
    obj_loss = jnp.sum(jnp.where(obj_mask, obj_bce, 0.0), axis=-1) / num_pos

    # class BCE over positives; one-hot on 1..C mapped to cols 0..C-1
    cls_logits = obj_cls_preds[..., 1:]
    num_classes = cls_logits.shape[-1]
    onehot = jax.nn.one_hot(match.cls_targets - 1, num_classes)
    cls_bce = optax.sigmoid_binary_cross_entropy(cls_logits, onehot).sum(-1)
    cls_loss = jnp.sum(jnp.where(positive, cls_bce, 0.0), axis=-1) / num_pos

    # coords: xy in σ-space (MSE), wh in log-space (smooth L1)
    sxy = jax.nn.sigmoid(loc_preds[..., :2])
    xy_err = jnp.square(sxy - sigma_xy_targets[..., :2]).sum(-1)
    wh_err = smooth_l1(loc_preds[..., 2:] - sigma_xy_targets[..., 2:]).sum(-1)
    loc_loss = (
        jnp.sum(jnp.where(positive, xy_err + wh_err, 0.0), axis=-1) / num_pos
    )

    obj_loss = jnp.mean(obj_loss)
    cls_loss = jnp.mean(cls_loss)
    loc_loss = jnp.mean(loc_loss)
    total = obj_weight * obj_loss + cls_weight * cls_loss + loc_weight * loc_loss
    return LossBreakdown(total, obj_loss + cls_loss, loc_loss)
