"""Anchor↔GT matching and target encoding — batched, static-shape, on device.

Behavior spec: SURVEY.md §2.2 "Matching" (canonical SSD §2.2 procedure, which
the reference implements per-image in NumPy):
  (1) bipartite: each GT claims its argmax-IoU anchor (forced positive);
  (2) each remaining anchor with IoU > `match_threshold` to any GT is positive;
  (3) everything else is negative (background).

TPU-native design: GT is padded to a fixed `max_boxes` per image with a
validity mask, so the whole matcher is one jitted program with static shapes
(SURVEY.md §7 "Static shapes everywhere": padding must never match). Batched
via vmap; no per-image host loop.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from bdd100k_tpu.ops import boxes as box_ops

BACKGROUND_CLASS = 0  # class 0 is background; real classes are 1..C.


class MatchResult(NamedTuple):
    """Per-anchor match state. All shapes (..., num_anchors[, 4])."""

    matched_gt: jnp.ndarray      # int32 index into the GT axis (0 if none)
    positive: jnp.ndarray        # bool: anchor is positive
    cls_targets: jnp.ndarray     # int32 class id, 0 = background
    loc_targets: jnp.ndarray     # float (tx, ty, tw, th) — zeros for negatives


def match_anchors(
    gt_boxes: jnp.ndarray,
    gt_labels: jnp.ndarray,
    gt_mask: jnp.ndarray,
    anchors_center: jnp.ndarray,
    match_threshold: float = 0.5,
) -> MatchResult:
    """Match one image's padded GT set against all anchors.

    Args:
      gt_boxes: (max_boxes, 4) corner format, normalized; padding rows arbitrary.
      gt_labels: (max_boxes,) int32 class ids in 1..C (padding rows arbitrary).
      gt_mask: (max_boxes,) bool — True for real GT rows.
      anchors_center: (num_anchors, 4) center format.
      match_threshold: IoU above which an anchor becomes positive (SSD: 0.5).

    Batch with `jax.vmap(match_anchors, in_axes=(0, 0, 0, None))`.
    """
    anchors_corner = box_ops.center_to_corner(anchors_center)
    iou = box_ops.iou_pairwise(gt_boxes, anchors_corner)  # (max_boxes, A)
    # Padding GT must never match anything.
    iou = jnp.where(gt_mask[:, None], iou, -1.0)

    # Step 2 first: per-anchor best GT.
    best_gt = jnp.argmax(iou, axis=0)                      # (A,)
    best_gt_iou = jnp.max(iou, axis=0)                     # (A,)

    # Step 1: per-GT best anchor is forced positive and assigned to that GT,
    # overriding the threshold rule; when two GTs claim the same anchor the
    # later GT wins (greedy NumPy last-write order). Expressed scatter-free
    # — TPU scatters serialize badly — as a (max_boxes, A) claim matrix:
    # one more IoU-sized elementwise pass instead of two vmapped scatters.
    best_anchor = jnp.argmax(iou, axis=1)                  # (max_boxes,)
    num_anchors = anchors_center.shape[0]
    gt_ids = jnp.arange(gt_boxes.shape[0], dtype=jnp.int32)

    claims = gt_mask[:, None] & (
        best_anchor[:, None] == jnp.arange(num_anchors, dtype=jnp.int32)[None]
    )  # (max_boxes, A)
    forced = jnp.any(claims, axis=0)
    forced_gt = jnp.max(
        jnp.where(claims, gt_ids[:, None], -1), axis=0
    )  # highest claiming GT wins ties

    positive = forced | (best_gt_iou > match_threshold)
    matched_gt = jnp.where(forced, forced_gt, best_gt)

    cls_targets = jnp.where(
        positive, gt_labels[matched_gt].astype(jnp.int32), BACKGROUND_CLASS
    )
    loc_targets = box_ops.encode_boxes(gt_boxes[matched_gt], anchors_center)
    loc_targets = jnp.where(positive[:, None], loc_targets, 0.0)
    return MatchResult(matched_gt, positive, cls_targets, loc_targets)


def encode_targets(
    gt_boxes: jnp.ndarray,
    gt_labels: jnp.ndarray,
    gt_mask: jnp.ndarray,
    anchors_center: jnp.ndarray,
    match_threshold: float = 0.5,
) -> MatchResult:
    """Batched matcher: leading batch dim on all gt_* args.

    The single fused 'anchor-to-GT IoU matching' op the north star demands
    (BASELINE.json:5); runs inside the pjit train step, sharded on the data
    axis — zero host work per step.
    """
    return jax.vmap(match_anchors, in_axes=(0, 0, 0, None, None))(
        gt_boxes, gt_labels, gt_mask, anchors_center, match_threshold
    )
