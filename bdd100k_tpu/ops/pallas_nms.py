"""Pallas TPU kernel: class-wise greedy NMS suppression in VMEM.

This is the hand-written half of the fused on-device postprocess
(SURVEY.md §2.2 "fused Pallas postprocess kernel", §2.7 native-equivalents
table: "NumPy host NMS + box decode → Pallas fused postprocess kernel").
Decode / scoring / per-class top-k preselection stay in XLA (lax.top_k is
already MXU/VPU-optimal); the greedy suppression chain — the part XLA
handles worst, a k-step sequential loop of tiny masked reductions — runs
here as ONE kernel per image with every candidate resident in VMEM.

Exact-greedy semantics (identical keep decisions to ops.nms.greedy_keep_mask,
asserted in tests per SURVEY.md §4.2): candidate i survives iff no surviving
higher-scored j (j < i in score order) overlaps it with IoU > threshold.

TPU-native design (pallas_guide.md):
  * classes are VECTORIZED, not looped: one program handles all C classes of
    one image; each greedy step is a handful of (C, K) VPU ops on 8×128
    lanes, so the only sequential extent is K (the per-class candidate
    count), not C·K.
  * the (C, K, K) IoU tensor is computed once into a VMEM scratch and row-
    sliced per step — no HBM traffic inside the loop.
  * the keep mask update is pure arithmetic (one-hot multiply), avoiding
    per-step scatter stores.
  * K is padded to a lane multiple (128) at the call boundary; C is padded
    to the f32 sublane multiple (8).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_LANE = 128
_SUBLANE = 8


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def _suppress_kernel(
    x1_ref, y1_ref, x2_ref, y2_ref, valid_ref, keep_ref, iou_ref,
    *, iou_threshold: float,
):
    """One image: refs are (1, C, K) in VMEM; iou_ref is (C, K, K) scratch."""
    x1 = x1_ref[0]
    y1 = y1_ref[0]
    x2 = x2_ref[0]
    y2 = y2_ref[0]  # each (C, K)

    # Pairwise suppression tensor in (I, C, J) layout — candidate index I
    # leads so the greedy loop slices a whole (C, J) plane with a leading-dim
    # dynamic index (the cheapest dynamic access Mosaic supports). IoU is
    # symmetric, so [i, c, j] == iou(box_ci, box_cj) either way.
    def bi(v):  # (C, K) -> (K, C, 1): per-candidate-i operand
        return v.T[:, :, None]

    def bj(v):  # (C, K) -> (1, C, K): per-candidate-j operand
        return v[None, :, :]

    ix1 = jnp.maximum(bi(x1), bj(x1))
    iy1 = jnp.maximum(bi(y1), bj(y1))
    ix2 = jnp.minimum(bi(x2), bj(x2))
    iy2 = jnp.minimum(bi(y2), bj(y2))
    inter = jnp.maximum(ix2 - ix1, 0.0) * jnp.maximum(iy2 - iy1, 0.0)
    a = jnp.maximum(x2 - x1, 0.0) * jnp.maximum(y2 - y1, 0.0)  # (C, K)
    union = bi(a) + bj(a) - inter
    iou = inter / jnp.maximum(union, 1e-8)
    iou_ref[:] = jnp.where(iou > iou_threshold, 1.0, 0.0)

    c, k = x1.shape
    lane_ids = jax.lax.broadcasted_iota(jnp.int32, (1, k), dimension=1)

    def body(i, keep):
        # suppression plane of candidate i, all classes: (C, K)
        row = iou_ref[i]
        earlier = (lane_ids < i).astype(jnp.float32)           # (1, K)
        # killed[c] = ∃ surviving earlier j with overlap: (C, 1)
        killed = jnp.max(row * earlier * keep, axis=-1, keepdims=True)
        onehot = (lane_ids == i).astype(jnp.float32)           # (1, K)
        return keep * (1.0 - onehot * killed)

    keep = jax.lax.fori_loop(0, k, body, valid_ref[0])
    keep_ref[0] = keep


@functools.partial(jax.jit, static_argnames=("iou_threshold", "interpret"))
def pallas_greedy_suppress(
    boxes: jnp.ndarray,
    valid: jnp.ndarray,
    iou_threshold: float = 0.45,
    interpret: bool = False,
) -> jnp.ndarray:
    """Batched class-wise greedy NMS keep mask.

    Args:
      boxes: (B, C, K, 4) corner boxes, score-sorted descending within each
        (image, class); K is the per-class top-k preselection.
      valid: (B, C, K) bool — candidate passes the score threshold.
      interpret: run the kernel in interpreter mode (CPU tests).

    Returns keep (B, C, K) bool with exact greedy semantics.
    """
    b, c, k, _ = boxes.shape
    kp = _round_up(k, _LANE)
    cp = _round_up(c, _SUBLANE)
    pad = ((0, 0), (0, cp - c), (0, kp - k))

    planes = [
        jnp.pad(boxes[..., i], pad) for i in range(4)
    ]  # 4 × (B, Cp, Kp)
    valid_f = jnp.pad(valid.astype(jnp.float32), pad)

    spec = pl.BlockSpec(
        (1, cp, kp), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
    )
    keep = pl.pallas_call(
        functools.partial(_suppress_kernel, iou_threshold=iou_threshold),
        grid=(b,),
        in_specs=[spec] * 5,
        out_specs=spec,
        out_shape=jax.ShapeDtypeStruct((b, cp, kp), jnp.float32),
        scratch_shapes=[pltpu.VMEM((kp, cp, kp), jnp.float32)],
        interpret=interpret,
    )(*planes, valid_f)
    return keep[:, :c, :k] > 0.5
