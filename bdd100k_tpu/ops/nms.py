"""Class-wise NMS as a static-shape, fully on-device XLA program.

Behavior spec: SURVEY.md §2.2 "Class-wise NMS" — the reference runs greedy
per-class NMS in host NumPy per image (drop score < thresh, sort desc,
suppress IoU > ~0.45, keep top-k). This module produces *identical* keep
decisions, but TPU-native:

  * top-k pre-selection (lax.top_k) bounds the candidate set to a static k;
  * the greedy chain is an O(k²) IoU matrix + a k-step `fori_loop` over a
    keep mask — no data-dependent shapes anywhere (SURVEY.md §7 "hard parts");
  * classes are vmapped, images are vmapped: one compiled kernel does the
    whole batch, and only fixed `max_detections` slots travel back to host.

A fused Pallas variant lives in `pallas_postprocess.py`; this jnp version is
its correctness oracle (SURVEY.md §4.2 "Pallas NMS vs jnp reference NMS must
agree exactly").
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from bdd100k_tpu.ops import boxes as box_ops


class Detections(NamedTuple):
    """Fixed-slot detection output (validity-masked)."""

    boxes: jnp.ndarray    # (..., max_det, 4) corner format
    scores: jnp.ndarray   # (..., max_det)
    classes: jnp.ndarray  # (..., max_det) int32, 1..C (0 in invalid slots)
    valid: jnp.ndarray    # (..., max_det) bool


def greedy_keep_mask(
    boxes: jnp.ndarray, valid: jnp.ndarray, iou_threshold: float
) -> jnp.ndarray:
    """Greedy NMS keep mask over score-descending candidates.

    boxes: (k, 4) corner, sorted by score desc; valid: (k,) bool.
    Exact greedy semantics: candidate i survives iff no *surviving* j < i
    overlaps it above the threshold.
    """
    k = boxes.shape[0]
    iou = box_ops.iou_pairwise(boxes, boxes)
    earlier = jnp.arange(k)[None, :] < jnp.arange(k)[:, None]  # (i, j): j < i
    suppress_edge = (iou > iou_threshold) & earlier              # j can kill i

    def body(i, keep):
        killed = jnp.any(suppress_edge[i] & keep)
        return keep.at[i].set(keep[i] & ~killed)

    return jax.lax.fori_loop(0, k, body, valid)


def nms_single_class(
    boxes: jnp.ndarray,
    scores: jnp.ndarray,
    iou_threshold: float = 0.45,
    score_threshold: float = 0.01,
    topk: int = 200,
) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """One class, one image. boxes (N, 4), scores (N,).

    Returns (boxes (topk, 4), scores (topk,), valid (topk,)) sorted by score
    desc; suppressed/below-threshold slots have score 0 and valid False.
    """
    scores = jnp.where(scores > score_threshold, scores, 0.0)
    top_scores, idx = jax.lax.top_k(scores, k=min(topk, scores.shape[0]))
    top_boxes = boxes[idx]
    valid = top_scores > 0.0
    keep = greedy_keep_mask(top_boxes, valid, iou_threshold)
    out_scores = jnp.where(keep, top_scores, 0.0)
    return top_boxes, out_scores, keep


def class_nms(
    boxes: jnp.ndarray,
    class_scores: jnp.ndarray,
    iou_threshold: float = 0.45,
    score_threshold: float = 0.01,
    per_class_topk: int = 200,
    max_detections: int = 200,
    boxes_per_class: bool = False,
) -> Detections:
    """Class-wise NMS for one image.

    Args:
      boxes: (N, 4) decoded corner boxes — shared across classes (SSD), or
        (C, N, 4) per-class boxes if `boxes_per_class`.
      class_scores: (N, C) foreground class scores (background excluded).
    Returns top `max_detections` across all classes, score-sorted, fixed slots.
    """
    num_classes = class_scores.shape[-1]
    scores_cn = class_scores.T  # (C, N)
    if boxes_per_class:
        boxes_cn = boxes
    else:
        boxes_cn = jnp.broadcast_to(boxes[None], (num_classes,) + boxes.shape)

    per_class = jax.vmap(
        lambda b, s: nms_single_class(
            b, s, iou_threshold, score_threshold, per_class_topk
        )
    )(boxes_cn, scores_cn)
    cboxes, cscores, ckeep = per_class  # (C, topk, ...)

    class_ids = jnp.broadcast_to(
        jnp.arange(1, num_classes + 1, dtype=jnp.int32)[:, None], cscores.shape
    )
    flat_boxes = cboxes.reshape(-1, 4)
    flat_scores = jnp.where(ckeep, cscores, 0.0).reshape(-1)
    flat_classes = class_ids.reshape(-1)
    if flat_scores.shape[0] < max_detections:  # tiny inputs: pad candidates
        pad = max_detections - flat_scores.shape[0]
        flat_boxes = jnp.pad(flat_boxes, ((0, pad), (0, 0)))
        flat_scores = jnp.pad(flat_scores, (0, pad))
        flat_classes = jnp.pad(flat_classes, (0, pad))

    top_scores, sel = jax.lax.top_k(flat_scores, k=max_detections)
    valid = top_scores > 0.0
    return Detections(
        boxes=flat_boxes[sel],
        scores=top_scores,
        classes=jnp.where(valid, flat_classes[sel], 0),
        valid=valid,
    )


def batched_class_nms(
    boxes: jnp.ndarray,
    class_scores: jnp.ndarray,
    iou_threshold: float = 0.45,
    score_threshold: float = 0.01,
    per_class_topk: int = 200,
    max_detections: int = 200,
) -> Detections:
    """Batch of images: boxes (B, N, 4), class_scores (B, N, C)."""
    return jax.vmap(
        lambda b, s: class_nms(
            b,
            s,
            iou_threshold,
            score_threshold,
            per_class_topk,
            max_detections,
        )
    )(boxes, class_scores)


def fixpoint_greedy_suppress(
    boxes: jnp.ndarray, valid: jnp.ndarray, iou_threshold: float = 0.45
) -> jnp.ndarray:
    """Greedy NMS keep mask computed as a matmul fixpoint — no K-step loop.

    Greedy keep is the unique solution of
        keep[i] = valid[i] ∧ ¬∃ j<i: (iou[i,j] > t ∧ keep[j])
    (unique by induction on i: keep[i] is determined by keep[0..i-1]).
    Jacobi-iterate that equation from keep⁰ = valid: each pass is one
    batched masked matvec `killed = edge @ keep` — MXU work instead of the
    K-step sequential chain in :func:`greedy_keep_mask`. After m passes
    every candidate whose suppression-dependency chain is shorter than m
    has its final value and never changes (induction over chain depth), so
    the iteration reaches the unique fixpoint in ≤ max-chain-depth passes —
    typically ~4-8 for detection boxes, bounded by K. The `while_loop`
    stops at the first unchanged pass.

    Exactness: the IoU matrix comes from the same `box_ops.iou_pairwise`
    the oracle uses (bit-identical thresholding); edge/keep are exact 0/1
    values — bf16 operands with f32 accumulation count them exactly
    (counts ≤ K < 2²⁴), so keep decisions match the oracle bit-for-bit.

    Args/returns match :func:`~bdd100k_tpu.ops.pallas_nms.pallas_greedy_suppress`:
    boxes (..., K, 4) score-desc corner boxes, valid (..., K) bool →
    keep (..., K) bool.
    """
    k = boxes.shape[-2]
    iou = box_ops.iou_pairwise(boxes, boxes)                    # (..., K, K)
    earlier = jnp.arange(k)[:, None] > jnp.arange(k)[None, :]   # [i,j]: j < i
    edge = ((iou > iou_threshold) & earlier).astype(jnp.bfloat16)
    valid_f = valid.astype(jnp.float32)

    def cond(state):
        keep, prev = state
        return jnp.any(keep != prev)

    def body(state):
        keep, _ = state
        killed = (
            jnp.einsum(
                "...ij,...j->...i",
                edge,
                keep.astype(jnp.bfloat16),
                preferred_element_type=jnp.float32,
            )
            > 0.0
        )
        return valid_f * (1.0 - killed.astype(jnp.float32)), keep

    keep, _ = jax.lax.while_loop(cond, body, (valid_f, -valid_f - 1.0))
    return keep > 0.5


def _reorder_tied_runs(
    top_scores: jnp.ndarray, idx: jnp.ndarray, n: int
) -> jnp.ndarray:
    """Reorder `idx` so (score desc, idx asc) holds exactly — the lax.top_k
    tie order — given `top_scores` already non-increasing along the last
    axis (what `approx_max_k(..., aggregate_to_topk=True)` guarantees).

    Only runs of exactly-equal scores can be misordered, and a permutation
    inside an equal run never moves a score — so scores pass through
    untouched and only the index array is produced. Mechanics: label each
    equal-score run with its start position (one cummax scan), pack
    (run_start, idx) into a single int32 (run_start < k in the high bits,
    idx < n in the low bits), sort that key alone — a payload-free
    single-key sort, which takes XLA:TPU's fast path where a 2-key
    variadic sort cannot — and unmask idx.
    """
    k = top_scores.shape[-1]
    idx_bits = max(int(n - 1).bit_length(), 1)
    assert k.bit_length() + idx_bits <= 31, (k, n)
    neq = jnp.concatenate(
        [
            jnp.ones(top_scores.shape[:-1] + (1,), bool),
            top_scores[..., 1:] != top_scores[..., :-1],
        ],
        axis=-1,
    )
    iota = jnp.arange(k, dtype=jnp.int32)
    run_start = jax.lax.cummax(
        jnp.where(neq, iota, 0), axis=top_scores.ndim - 1
    )
    key = jnp.sort((run_start << idx_bits) | idx, axis=-1)
    return key & ((1 << idx_bits) - 1)


def _preselect_candidates(
    boxes: jnp.ndarray,
    class_scores: jnp.ndarray,
    score_threshold: float,
    per_class_topk: int,
    preselect: str,
    prune_m: int = 0,
) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Per-class top-k candidate preselection, shared by the pallas and
    fixpoint NMS paths.

    Returns (cand_boxes (B, C, k, 4), top_scores (B, C, k), valid (B, C, k))
    with candidates score-descending within each (image, class).

    `preselect="approx"` uses the TPU-native `lax.approx_max_k`
    (PartialReduce; ~0.95 recall on the candidate SET — final detections
    still score-exact). Orders of magnitude faster than the sort-based
    exact top-k on TPU; keep "exact" when bit-parity with the oracle
    matters.

    `prune_m > 0` enables the two-stage anchor-pruned path
    (:func:`_preselect_pruned`) — same keep decisions, guarded at runtime.
    """
    b, n, num_classes = class_scores.shape
    k = min(per_class_topk, n)
    if prune_m and k <= prune_m < n:
        return _preselect_pruned(
            boxes, class_scores, score_threshold, k, preselect, prune_m
        )

    scores_bcn = jnp.swapaxes(class_scores, 1, 2)  # (B, C, N)
    scores_bcn = jnp.where(scores_bcn > score_threshold, scores_bcn, 0.0)
    if preselect == "approx":
        top_scores, idx = jax.lax.approx_max_k(scores_bcn, k=k)
    else:
        # exact top-k via the TPU PartialReduce path: recall_target=1.0
        # sizes the reduction for guaranteed-exact results, avoiding the
        # full lax.top_k sort over all N anchors
        top_scores, idx = jax.lax.approx_max_k(
            scores_bcn, k=k, recall_target=1.0
        )  # (B, C, k)
        # PartialReduce is value-exact but may order TIED scores differently
        # from the lax.top_k oracle, and greedy NMS keep decisions depend on
        # candidate order. `_reorder_tied_runs` restores top_k's
        # (score desc, anchor index asc) tie order so 'exact' stays
        # bit-identical to the oracle — measured at noise level vs no
        # reorder at all on the flagship (128, 10, 200) shape, where the
        # round-2 two-key lax.sort and an O(k²) comparison-rank variant
        # were both measurably slower on the v5e.
        # Remaining caveat: when two anchors with EXACTLY equal scores
        # straddle the k boundary, PartialReduce may admit a different
        # member of the tie than top_k would (the re-order fixes order
        # within the chosen set, not which tied candidate enters it).
        # Post-softmax float ties across distinct anchors at the boundary
        # are measure-zero for real logits; the absolute score of every
        # returned detection is unaffected either way.
        idx = _reorder_tied_runs(top_scores, idx, n)
    # one flat row-gather instead of take_along_axis over a (B, C, N, 4)
    # broadcast — same rows, far less index arithmetic for XLA:TPU
    gidx = (
        jnp.arange(b, dtype=jnp.int32)[:, None, None] * n + idx
    ).reshape(-1)
    cand_boxes = jnp.take(boxes.reshape(b * n, 4), gidx, axis=0).reshape(
        b, num_classes, k, 4
    )  # (B, C, k, 4)
    valid = top_scores > 0.0
    return cand_boxes, top_scores, valid


def _preselect_pruned(
    boxes: jnp.ndarray,
    class_scores: jnp.ndarray,
    score_threshold: float,
    k: int,
    preselect: str,
    m: int,
) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Two-stage anchor-pruned preselect — same outputs as the dense path,
    ~4× cheaper on TPU, exactness guarded at runtime.

    The dense exact preselect is the flagship's single biggest device cost
    (~120 µs/img at B=128: `approx_max_k(recall_target=1.0)` lowers to a
    full sort of every (image, class) row — B·C rows of N anchors). But
    candidates with score ≤ `score_threshold` are zeroed and can never
    become detections, and a TRAINED detector is sparse by construction:
    measured on the committed flagship artifact, ≤1 240 of 8 732 anchors
    per image clear the 0.01 threshold in ANY class (64-scene val,
    benchmarks/probe_preselect.py). So:

      stage 1: one top-M over per-anchor max foreground score (B rows,
               not B·C) → the M candidate anchors per image;
      guard:   the M-th best max-score is 0 for every image ⟺ every
               above-threshold anchor was captured ⟹ per-class top-k over
               the M anchors equals top-k over all N, bit-for-bit;
      stage 2: gather (B, M, C) scores, per-class top-k over M (≪ N),
               tie order restored against TRUE anchor ids so the
               (score desc, anchor idx asc) oracle order still holds;
      fallback: if ANY image overflows M (e.g. an untrained model where
               softmax puts ~1/C everywhere), a `lax.cond` takes the dense
               path for the whole batch — exactness never depends on the
               sparsity assumption, only speed does.
    """
    b, n, num_classes = class_scores.shape
    zeroed = jnp.where(class_scores > score_threshold, class_scores, 0.0)
    max_scores = jnp.max(zeroed, axis=-1)  # (B, N)
    top_m, anchor_idx = jax.lax.approx_max_k(
        max_scores, k=m, recall_target=1.0
    )  # (B, M) — exact top-M VALUES (PartialReduce sized for exactness)
    complete = jnp.all(top_m[:, -1] <= 0.0)

    def pruned_path(boxes, zeroed, anchor_idx):
        # (B, M, C) class scores at the pruned anchors → (B, C, M)
        ps = jnp.take_along_axis(zeroed, anchor_idx[..., None], axis=1)
        scores_bcm = jnp.swapaxes(ps, 1, 2)
        if preselect == "approx":
            top_scores, idx_m = jax.lax.approx_max_k(scores_bcm, k=k)
        else:
            top_scores, idx_m = jax.lax.approx_max_k(
                scores_bcm, k=k, recall_target=1.0
            )
        # positions-in-M → true anchor ids (pruned order is max-score desc,
        # NOT anchor asc, so tie reorder must see the real ids)
        anchor_ids = jnp.take_along_axis(
            jnp.broadcast_to(anchor_idx[:, None, :], (b, num_classes, m)),
            idx_m, axis=-1,
        )
        if preselect != "approx":
            anchor_ids = _reorder_tied_runs(top_scores, anchor_ids, n)
        gidx = (
            jnp.arange(b, dtype=jnp.int32)[:, None, None] * n + anchor_ids
        ).reshape(-1)
        cand_boxes = jnp.take(
            boxes.reshape(b * n, 4), gidx, axis=0
        ).reshape(b, num_classes, k, 4)
        return cand_boxes, top_scores, top_scores > 0.0

    def dense_path(boxes, zeroed, anchor_idx):
        del anchor_idx
        return _preselect_candidates(
            # already zeroed; threshold 0.0 keeps strictly-positive scores
            boxes, zeroed, 0.0, k, preselect
        )

    return jax.lax.cond(
        complete, pruned_path, dense_path, boxes, zeroed, anchor_idx
    )


def _finalize_detections(
    cand_boxes: jnp.ndarray,
    top_scores: jnp.ndarray,
    keep: jnp.ndarray,
    max_detections: int,
) -> Detections:
    """Cross-class top-k over kept candidates → fixed `Detections` slots."""
    b, num_classes, k, _ = cand_boxes.shape
    class_ids = jnp.broadcast_to(
        jnp.arange(1, num_classes + 1, dtype=jnp.int32)[None, :, None],
        top_scores.shape,
    )
    flat_boxes = cand_boxes.reshape(b, -1, 4)
    flat_scores = jnp.where(keep, top_scores, 0.0).reshape(b, -1)
    flat_classes = class_ids.reshape(b, -1)
    if flat_scores.shape[1] < max_detections:  # tiny inputs: pad candidates
        pad = max_detections - flat_scores.shape[1]
        flat_boxes = jnp.pad(flat_boxes, ((0, 0), (0, pad), (0, 0)))
        flat_scores = jnp.pad(flat_scores, ((0, 0), (0, pad)))
        flat_classes = jnp.pad(flat_classes, ((0, 0), (0, pad)))

    out_scores, sel = jax.lax.top_k(flat_scores, k=max_detections)
    out_valid = out_scores > 0.0
    return Detections(
        boxes=jnp.take_along_axis(flat_boxes, sel[..., None], axis=1),
        scores=out_scores,
        classes=jnp.where(
            out_valid, jnp.take_along_axis(flat_classes, sel, axis=1), 0
        ),
        valid=out_valid,
    )


def batched_class_nms_pallas(
    boxes: jnp.ndarray,
    class_scores: jnp.ndarray,
    iou_threshold: float = 0.45,
    score_threshold: float = 0.01,
    per_class_topk: int = 200,
    max_detections: int = 200,
    interpret: bool = False,
    preselect: str = "exact",
    prune_m: int = 0,
) -> Detections:
    """Same keep decisions as :func:`batched_class_nms`, with the greedy
    suppression chain running as a Pallas VMEM kernel (ops.pallas_nms).

    XLA keeps what it does best (score threshold, per-class top-k
    preselect, final cross-class top-k); the kernel takes the k-step
    sequential part. Exact agreement with the jnp oracle is asserted in
    tests (SURVEY.md §4.2).
    """
    from bdd100k_tpu.ops.pallas_nms import pallas_greedy_suppress

    cand_boxes, top_scores, valid = _preselect_candidates(
        boxes, class_scores, score_threshold, per_class_topk, preselect,
        prune_m,
    )
    keep = pallas_greedy_suppress(
        cand_boxes, valid, iou_threshold, interpret=interpret
    )  # (B, C, k)
    return _finalize_detections(cand_boxes, top_scores, keep, max_detections)


def batched_class_nms_fixpoint(
    boxes: jnp.ndarray,
    class_scores: jnp.ndarray,
    iou_threshold: float = 0.45,
    score_threshold: float = 0.01,
    per_class_topk: int = 200,
    max_detections: int = 200,
    preselect: str = "exact",
    prune_m: int = 0,
) -> Detections:
    """Same keep decisions as :func:`batched_class_nms`, with the greedy
    suppression chain computed as a matmul fixpoint
    (:func:`fixpoint_greedy_suppress`) — pure XLA, no Pallas, the
    sequential K-step chain replaced by ~chain-depth MXU passes."""
    cand_boxes, top_scores, valid = _preselect_candidates(
        boxes, class_scores, score_threshold, per_class_topk, preselect,
        prune_m,
    )
    keep = fixpoint_greedy_suppress(cand_boxes, valid, iou_threshold)
    return _finalize_detections(cand_boxes, top_scores, keep, max_detections)
