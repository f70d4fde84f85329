"""Core box math: IoU, coordinate transforms, SSD encode/decode.

Behavior spec: SURVEY.md §2.2 (reference repo's `utils/` NumPy box math;
the reference checkout is empty, so formulas follow the canonical SSD paper
arXiv:1512.02325 §2.2 with variances v_center=0.1, v_size=0.2).

Conventions:
  * "corner" boxes: (x1, y1, x2, y2), normalized to [0, 1].
  * "center" boxes: (cx, cy, w, h), normalized.
  * All functions broadcast over leading dims and are jit/vmap-safe.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

# SSD encode variances (SURVEY.md §2.2 "variances v_c=0.1, v_s=0.2"; kept in
# one place so re-verification against the real reference is a one-line diff).
VARIANCE_CENTER = 0.1
VARIANCE_SIZE = 0.2

_EPS = 1e-8


def corner_to_center(boxes: jnp.ndarray) -> jnp.ndarray:
    """(x1,y1,x2,y2) -> (cx,cy,w,h)."""
    x1, y1, x2, y2 = jnp.split(boxes, 4, axis=-1)
    w = x2 - x1
    h = y2 - y1
    return jnp.concatenate([x1 + 0.5 * w, y1 + 0.5 * h, w, h], axis=-1)


def center_to_corner(boxes: jnp.ndarray) -> jnp.ndarray:
    """(cx,cy,w,h) -> (x1,y1,x2,y2)."""
    cx, cy, w, h = jnp.split(boxes, 4, axis=-1)
    hw = 0.5 * w
    hh = 0.5 * h
    return jnp.concatenate([cx - hw, cy - hh, cx + hw, cy + hh], axis=-1)


def area(boxes: jnp.ndarray) -> jnp.ndarray:
    """Area of corner-format boxes; negative extents clamp to zero."""
    w = jnp.maximum(boxes[..., 2] - boxes[..., 0], 0.0)
    h = jnp.maximum(boxes[..., 3] - boxes[..., 1], 0.0)
    return w * h


def clip_boxes(boxes: jnp.ndarray, lo: float = 0.0, hi: float = 1.0) -> jnp.ndarray:
    return jnp.clip(boxes, lo, hi)


def intersection_pairwise(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Pairwise intersection areas. a: (..., M, 4), b: (..., N, 4) -> (..., M, N)."""
    a = a[..., :, None, :]
    b = b[..., None, :, :]
    x1 = jnp.maximum(a[..., 0], b[..., 0])
    y1 = jnp.maximum(a[..., 1], b[..., 1])
    x2 = jnp.minimum(a[..., 2], b[..., 2])
    y2 = jnp.minimum(a[..., 3], b[..., 3])
    return jnp.maximum(x2 - x1, 0.0) * jnp.maximum(y2 - y1, 0.0)


def iou_pairwise(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Pairwise IoU matrix. a: (..., M, 4), b: (..., N, 4) -> (..., M, N).

    Corner format. The GT×anchor matrix at the heart of SSD matching
    (SURVEY.md §2.2 "IoU / pairwise IoU"). Broadcast-friendly so XLA keeps
    it fully on device; used batched under vmap for training.
    """
    inter = intersection_pairwise(a, b)
    union = area(a)[..., :, None] + area(b)[..., None, :] - inter
    return inter / jnp.maximum(union, _EPS)


def iou_aligned(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Elementwise IoU of aligned box arrays of identical shape (..., 4)."""
    x1 = jnp.maximum(a[..., 0], b[..., 0])
    y1 = jnp.maximum(a[..., 1], b[..., 1])
    x2 = jnp.minimum(a[..., 2], b[..., 2])
    y2 = jnp.minimum(a[..., 3], b[..., 3])
    inter = jnp.maximum(x2 - x1, 0.0) * jnp.maximum(y2 - y1, 0.0)
    union = area(a) + area(b) - inter
    return inter / jnp.maximum(union, _EPS)


def encode_boxes(
    boxes: jnp.ndarray,
    anchors: jnp.ndarray,
    variances: tuple[float, float] = (VARIANCE_CENTER, VARIANCE_SIZE),
) -> jnp.ndarray:
    """SSD box encoding (SURVEY.md §2.2 "Box encode").

    tx = (cx - cx_a) / (w_a * v_c);  tw = log(w / w_a) / v_s  (same for y/h).

    Args:
      boxes: corner-format GT boxes (..., 4).
      anchors: center-format anchors (..., 4), broadcastable with boxes.
    Returns: regression targets (..., 4) = (tx, ty, tw, th).
    """
    vc, vs = variances
    g = corner_to_center(boxes)
    txy = (g[..., :2] - anchors[..., :2]) / (anchors[..., 2:] * vc)
    twh = jnp.log(jnp.maximum(g[..., 2:], _EPS) / anchors[..., 2:]) / vs
    return jnp.concatenate([txy, twh], axis=-1)


def decode_boxes(
    deltas: jnp.ndarray,
    anchors: jnp.ndarray,
    variances: tuple[float, float] = (VARIANCE_CENTER, VARIANCE_SIZE),
) -> jnp.ndarray:
    """Inverse of :func:`encode_boxes`; returns corner-format boxes.

    The reference runs this on host NumPy per image (SURVEY.md §2.2 "Box
    decode ... NumPy on host"); here it is a fused on-device op.
    """
    vc, vs = variances
    cxy = deltas[..., :2] * vc * anchors[..., 2:] + anchors[..., :2]
    wh = jnp.exp(deltas[..., 2:] * vs) * anchors[..., 2:]
    return center_to_corner(jnp.concatenate([cxy, wh], axis=-1))


def yolo_decode_boxes(
    deltas: jnp.ndarray, anchors: jnp.ndarray, cell_sizes: jnp.ndarray
) -> jnp.ndarray:
    """YOLO-style decode (SURVEY.md §2.2: bx = σ(tx)+cx_grid, bw = w_a·e^tw).

    Our anchors store cell *centers*, so bx = cx_a + (σ(tx) − 0.5)·cell.

    Args:
      deltas: (..., A, 4) raw head outputs (tx, ty, tw, th).
      anchors: (A, 4) center-format priors (cell-center cx, cy, prior w, h).
      cell_sizes: (A,) each anchor's grid cell size (1 / grid_size).
    Returns corner boxes (..., A, 4).
    """
    sxy = jax.nn.sigmoid(deltas[..., :2])
    cxy = anchors[..., :2] + (sxy - 0.5) * cell_sizes[..., None]
    wh = anchors[..., 2:] * jnp.exp(deltas[..., 2:])
    return center_to_corner(jnp.concatenate([cxy, wh], axis=-1))


def yolo_encode_boxes(
    boxes: jnp.ndarray, anchors: jnp.ndarray, cell_sizes: jnp.ndarray
) -> jnp.ndarray:
    """Inverse of :func:`yolo_decode_boxes` in σ-space.

    Returns (..., 4) = (σ(tx)*, σ(ty)*, tw, th) where σ(t)* ∈ (0, 1) is the
    *post-sigmoid* xy target (the canonical YOLO loss compares in σ-space to
    avoid the unstable logit inverse at cell borders).
    """
    g = corner_to_center(boxes)
    sxy = (g[..., :2] - anchors[..., :2]) / cell_sizes[..., None] + 0.5
    twh = jnp.log(jnp.maximum(g[..., 2:], _EPS) / anchors[..., 2:])
    return jnp.concatenate([sxy, twh], axis=-1)
