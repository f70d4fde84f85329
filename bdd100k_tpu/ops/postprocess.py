"""Fused on-device postprocess: box decode → scoring → class-wise NMS.

This is the TPU-native replacement for the reference's per-image host loop
(SURVEY.md §3.2: fetch raw anchor tensors → NumPy decode → NumPy NMS). Here
the whole chain is one jitted program; only `max_detections` fixed slots per
image cross the device→host boundary (BASELINE.json:5 "box decode,
sigmoid/softmax scoring, and class-wise NMS run on-device").

Scoring modes:
  * "softmax" — SSD heads: softmax over C+1 (background col 0 dropped).
  * "sigmoid" — YOLO-style heads: sigmoid(objectness) × sigmoid(class).
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp

from bdd100k_tpu.ops import boxes as box_ops
from bdd100k_tpu.ops.nms import Detections, batched_class_nms


@dataclasses.dataclass(frozen=True)
class PostprocessConfig:
    """All postprocess constants in one place (SURVEY.md §7: keep constants
    most likely to differ from the reference in one config for easy re-diff)."""

    score_mode: str = "softmax"        # "softmax" (SSD) | "sigmoid" (YOLO)
    decode_mode: str = "ssd"           # "ssd" | "yolo" (σ(tx)+grid decode)
    score_threshold: float = 0.01      # eval default; demo uses ~0.3-0.5
    iou_threshold: float = 0.45
    per_class_topk: int = 200
    max_detections: int = 200
    variances: tuple[float, float] = (
        box_ops.VARIANCE_CENTER,
        box_ops.VARIANCE_SIZE,
    )
    # NMS backend: "auto" → Pallas kernel on TPU, pure-XLA elsewhere;
    # "xla" | "pallas" | "fixpoint" force one (identical keep decisions —
    # "fixpoint" solves the greedy recurrence as a matmul fixpoint,
    # ops.nms.fixpoint_greedy_suppress: pure XLA, MXU-friendly).
    nms_impl: str = "auto"
    # candidate preselection (pallas path): "exact" per-class top-k, or
    # "approx" = TPU-native lax.approx_max_k (~0.95 candidate recall, far
    # faster than the sort-based exact top-k)
    preselect: str = "exact"
    # two-stage anchor-pruned preselect (ops.nms._preselect_pruned): one
    # top-M over per-anchor max scores feeds the per-class top-k, with a
    # runtime exactness guard + lax.cond dense fallback — identical keep
    # decisions, ~4× cheaper preselect on trained (sparse) models. 0
    # disables. Applies to the pallas/fixpoint paths; the XLA oracle
    # never prunes.
    prune_m: int = 2048


def compute_scores(cls_preds: jnp.ndarray, score_mode: str) -> jnp.ndarray:
    """(.., A, C+1) logits → (.., A, C) foreground scores."""
    if score_mode == "softmax":
        return jax.nn.softmax(cls_preds, axis=-1)[..., 1:]
    elif score_mode == "sigmoid":
        # col 0 = objectness logit, cols 1.. = per-class logits.
        obj = jax.nn.sigmoid(cls_preds[..., :1])
        return obj * jax.nn.sigmoid(cls_preds[..., 1:])
    raise ValueError(f"unknown score_mode: {score_mode}")


@partial(jax.jit, static_argnames=("config",))
def postprocess(
    loc_preds: jnp.ndarray,
    cls_preds: jnp.ndarray,
    anchors_center: jnp.ndarray,
    config: PostprocessConfig = PostprocessConfig(),
    cell_sizes: jnp.ndarray | None = None,
) -> Detections:
    """Batch postprocess.

    Args:
      loc_preds: (B, A, 4) box regression outputs (tx, ty, tw, th).
      cls_preds: (B, A, C+1) raw logits (background/objectness in col 0).
      anchors_center: (A, 4) center-format anchors.
      cell_sizes: (A,) grid cell sizes, required for decode_mode="yolo".

    Returns `Detections` with fixed (B, max_detections) slots, clipped to
    [0, 1] image coords.
    """
    loc_preds = loc_preds.astype(jnp.float32)
    cls_preds = cls_preds.astype(jnp.float32)
    if config.decode_mode == "yolo":
        decoded = box_ops.yolo_decode_boxes(loc_preds, anchors_center, cell_sizes)
    else:
        decoded = box_ops.decode_boxes(loc_preds, anchors_center, config.variances)
    decoded = box_ops.clip_boxes(decoded)
    scores = compute_scores(cls_preds, config.score_mode)
    impl = config.nms_impl
    if impl == "auto":
        impl = "pallas" if jax.default_backend() == "tpu" else "xla"
    if impl in ("pallas", "fixpoint"):
        from bdd100k_tpu.ops.nms import (
            batched_class_nms_fixpoint,
            batched_class_nms_pallas,
        )

        fn = (
            batched_class_nms_pallas
            if impl == "pallas"
            else batched_class_nms_fixpoint
        )
        return fn(
            decoded,
            scores,
            iou_threshold=config.iou_threshold,
            score_threshold=config.score_threshold,
            per_class_topk=config.per_class_topk,
            max_detections=config.max_detections,
            preselect=config.preselect,
            prune_m=config.prune_m,
        )
    return batched_class_nms(
        decoded,
        scores,
        iou_threshold=config.iou_threshold,
        score_threshold=config.score_threshold,
        per_class_topk=config.per_class_topk,
        max_detections=config.max_detections,
    )
