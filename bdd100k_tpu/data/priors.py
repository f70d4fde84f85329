"""YOLO anchor-prior clustering (k-means over GT box shapes).

Reference-class capability (SURVEY.md §2.2 "Anchor generation (YOLO-style):
k anchors per grid cell per scale (k-means priors)"): YOLOv2-style
clustering of the label set's (w, h) box shapes under the IoU metric
d(box, centroid) = 1 − IoU(box ∥ centroid) with boxes co-centered, so the
priors maximize average anchor↔GT shape overlap instead of L2 closeness
(which over-weights large boxes).

Host-side numpy tool — runs once per dataset, like the reference's
precomputed priors; the repo's committed `YOLO_BDD_PRIORS` defaults were
shaped the same way. CLI: `python scripts/kmeans_priors.py`.
"""

from __future__ import annotations

import numpy as np


def _pairwise_shape_iou(wh: np.ndarray, centroids: np.ndarray) -> np.ndarray:
    """IoU of co-centered boxes given only shapes. wh (N, 2), centroids
    (K, 2) → (N, K)."""
    inter = np.minimum(wh[:, None, 0], centroids[None, :, 0]) * np.minimum(
        wh[:, None, 1], centroids[None, :, 1]
    )
    union = (
        wh[:, 0] * wh[:, 1]
    )[:, None] + (centroids[:, 0] * centroids[:, 1])[None, :] - inter
    return inter / np.maximum(union, 1e-12)


def kmeans_priors(
    wh: np.ndarray,
    k: int = 9,
    seed: int = 0,
    iters: int = 100,
) -> tuple[np.ndarray, float]:
    """Cluster GT box shapes into k priors under the 1−IoU metric.

    Args:
      wh: (N, 2) normalized box widths/heights (degenerate rows dropped).
      k: number of priors.
    Returns (centroids (k, 2) sorted by area asc, mean best-IoU over boxes).

    Deterministic: k-means++-style farthest-point init from a seeded RNG;
    medians (not means) as the update step, the standard choice for the
    IoU metric (robust to the heavy right tail of road-scene box sizes).
    """
    wh = np.asarray(wh, dtype=np.float64)
    wh = wh[(wh[:, 0] > 1e-6) & (wh[:, 1] > 1e-6)]
    if len(wh) < k:
        raise ValueError(f"need ≥ {k} boxes to fit {k} priors, got {len(wh)}")
    rng = np.random.default_rng(seed)

    # k-means++ init in 1−IoU distance
    centroids = wh[rng.integers(len(wh))][None]
    for _ in range(k - 1):
        d = 1.0 - _pairwise_shape_iou(wh, centroids).max(axis=1)
        total = d.sum()
        if total <= 0.0:
            # every box shape already coincides with a centroid (e.g. a
            # grid-synthetic label set with one repeated box): farthest-point
            # mass is zero — fall back to uniform instead of an opaque
            # rng.choice "probabilities do not sum to 1" crash
            p = np.full(len(wh), 1.0 / len(wh))
        else:
            p = d / total
        centroids = np.vstack([centroids, wh[rng.choice(len(wh), p=p)]])

    assign = np.zeros(len(wh), dtype=np.int64) - 1
    for _ in range(iters):
        iou = _pairwise_shape_iou(wh, centroids)
        new_assign = iou.argmax(axis=1)
        if np.array_equal(new_assign, assign):
            break
        assign = new_assign
        for j in range(k):
            members = wh[assign == j]
            if len(members):
                centroids[j] = np.median(members, axis=0)
    mean_iou = float(
        _pairwise_shape_iou(wh, centroids).max(axis=1).mean()
    )
    order = np.argsort(centroids[:, 0] * centroids[:, 1])
    return centroids[order], mean_iou


def priors_to_scales(
    centroids: np.ndarray, num_scales: int = 3
) -> tuple[tuple[tuple[float, float], ...], ...]:
    """Split area-sorted centroids into `num_scales` equal groups —
    smallest priors on the finest grid — in the exact nested-tuple format
    `DetectorConfig.yolo_priors` / `YOLO_BDD_PRIORS` uses."""
    k = len(centroids)
    if k % num_scales:
        raise ValueError(f"k={k} not divisible by num_scales={num_scales}")
    per = k // num_scales
    return tuple(
        tuple(
            (round(float(w), 4), round(float(h), 4))
            for w, h in centroids[s * per : (s + 1) * per]
        )
        for s in range(num_scales)
    )


def mean_best_iou(wh: np.ndarray, priors) -> float:
    """Average best shape-IoU of boxes against a flat or nested prior set —
    the figure of merit for comparing prior sets on a dataset."""
    flat = np.asarray(
        [p for scale in priors for p in scale]
        if priors and isinstance(priors[0][0], (tuple, list, np.ndarray))
        else priors,
        dtype=np.float64,
    )
    wh = np.asarray(wh, dtype=np.float64)
    wh = wh[(wh[:, 0] > 1e-6) & (wh[:, 1] > 1e-6)]
    return float(_pairwise_shape_iou(wh, flat).max(axis=1).mean())


def collect_box_shapes(records: list[dict]) -> np.ndarray:
    """Parsed BDD100K records (data.bdd100k.load_bdd100k_labels) →
    (N, 2) normalized (w, h) of every GT box."""
    whs = []
    for rec in records:
        b = np.asarray(rec["boxes"], dtype=np.float64).reshape(-1, 4)
        if len(b):
            whs.append(
                np.stack([b[:, 2] - b[:, 0], b[:, 3] - b[:, 1]], axis=1)
            )
    if not whs:
        return np.zeros((0, 2), dtype=np.float64)
    return np.concatenate(whs, axis=0)
