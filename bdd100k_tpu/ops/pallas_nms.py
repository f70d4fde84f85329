"""Pallas TPU kernel: class-wise greedy NMS suppression in VMEM.

This is the hand-written half of the fused on-device postprocess
(SURVEY.md §2.2 "fused Pallas postprocess kernel", §2.7 native-equivalents
table: "NumPy host NMS + box decode → Pallas fused postprocess kernel").
Decode / scoring / per-class top-k preselection stay in XLA (lax.top_k is
already MXU/VPU-optimal); the greedy suppression chain — the part XLA
handles worst, a k-step sequential loop of tiny masked reductions — runs
here with every candidate resident in VMEM.

Exact-greedy semantics (identical keep decisions to ops.nms.greedy_keep_mask,
asserted in tests per SURVEY.md §4.2): candidate i survives iff no surviving
higher-scored j (j < i in score order) overlaps it with IoU > threshold.

TPU-native design (pallas_guide.md):
  * the sequential extent is ONLY K (per-class candidate count). Classes are
    vectorized, and so is a CHUNK of images: one grid program owns `chunk`
    images × C classes, so each greedy step is a few VPU ops on a
    (chunk·C, K) tile and the whole batch costs (B/chunk)·K steps instead
    of B·C·K. Grid programs serialize on the TensorCore, so fewer, fatter
    programs win.
  * the (K, chunk·C, K) IoU tensor is computed once into a VMEM scratch
    laid out candidate-major, so the loop slices a contiguous (chunk·C, K)
    plane by leading index — the cheapest dynamic access Mosaic supports.
  * the keep-mask update is pure arithmetic (one-hot multiply): no scatter.
  * K pads to the 128-lane multiple; chunk·C pads to the f32 sublane
    multiple (8); chunk is sized so the scratch stays under ~10 MB of VMEM.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_LANE = 128
_SUBLANE = 8
_VMEM_BUDGET_BYTES = 10 * 1024 * 1024


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def _pick_chunk(c: int, kp: int) -> int:
    """Largest image chunk whose (kp, chunk*c, kp) bf16 scratch fits VMEM.

    Bigger chunks directly cut the kernel's sequential cost: grid programs
    serialize on the TensorCore and each runs the same K greedy steps, so
    B/chunk programs x K steps shrinks linearly in chunk. The suppression
    mask is stored binarized (exact 0/1) so bf16 loses nothing."""
    chunk = max(1, _VMEM_BUDGET_BYTES // (kp * kp * 2 * max(c, 1)))
    return min(chunk, 32)


def _suppress_kernel(
    x1_ref, y1_ref, x2_ref, y2_ref, valid_ref, keep_ref, iou_ref, t_ref,
    *, iou_threshold: float,
):
    """Refs are (chunk, C, K); iou_ref is (K, chunk*C, K) scratch."""
    chunk, c, k = x1_ref.shape
    cc = chunk * c

    def flat(ref):  # (chunk, C, K) -> (chunk*C, K): leading-dim merge
        return ref[...].reshape(cc, k)

    x1, y1, x2, y2 = flat(x1_ref), flat(y1_ref), flat(x2_ref), flat(y2_ref)

    # Pairwise suppression tensor in (I, CC, J) layout — candidate index I
    # leads so the greedy loop slices a whole (CC, J) plane per step. IoU is
    # symmetric, so [i, cc, j] == iou(box_cc_i, box_cc_j) either way.
    # Filled in I-slabs so only a (TI, CC, K) block is ever live as a value —
    # the full (K, CC, K) tensor lives ONLY in the scratch ref (materializing
    # it as a value too would double VMEM and bust the budget).
    a = jnp.maximum(x2 - x1, 0.0) * jnp.maximum(y2 - y1, 0.0)  # (CC, K)
    # stage candidate-major transposes in scratch so the fill loop can slice
    # them by REF (dynamic slicing of values isn't lowered by Mosaic)
    t_ref[0] = x1.T
    t_ref[1] = y1.T
    t_ref[2] = x2.T
    t_ref[3] = y2.T
    t_ref[4] = a.T  # each (K, CC)

    ti = _SUBLANE

    def fill(it, carry):
        s0 = it * ti

        def bi(plane):  # t_ref plane -> (TI, CC, 1): per-candidate-i operand
            return t_ref[plane, pl.ds(s0, ti)][:, :, None]

        def bj(v):  # (CC, K) -> (1, CC, K): per-candidate-j operand
            return v[None, :, :]

        ix1 = jnp.maximum(bi(0), bj(x1))
        iy1 = jnp.maximum(bi(1), bj(y1))
        ix2 = jnp.minimum(bi(2), bj(x2))
        iy2 = jnp.minimum(bi(3), bj(y2))
        inter = jnp.maximum(ix2 - ix1, 0.0) * jnp.maximum(iy2 - iy1, 0.0)
        union = bi(4) + bj(a) - inter
        iou = inter / jnp.maximum(union, 1e-8)
        # threshold at f32 precision, store the exact 0/1 mask as bf16
        # (halves the scratch → doubles the image chunk per program)
        iou_ref[pl.ds(s0, ti)] = jnp.where(
            iou > iou_threshold, 1.0, 0.0
        ).astype(jnp.bfloat16)
        return carry

    jax.lax.fori_loop(0, k // ti, fill, 0)

    lane_ids = jax.lax.broadcasted_iota(jnp.int32, (1, k), dimension=1)

    def body(i, keep):
        # suppression plane of candidate i for every (image, class): (CC, K)
        row = iou_ref[i].astype(jnp.float32)
        earlier = (lane_ids < i).astype(jnp.float32)           # (1, K)
        # killed[cc] = ∃ surviving earlier j with overlap: (CC, 1)
        killed = jnp.max(row * earlier * keep, axis=-1, keepdims=True)
        onehot = (lane_ids == i).astype(jnp.float32)           # (1, K)
        return keep * (1.0 - onehot * killed)

    # (Mosaic's fori_loop supports only unroll=1 or full unroll; the chunk
    # vectorization above is the big win, so keep unroll=1.)
    keep = jax.lax.fori_loop(0, k, body, flat(valid_ref))
    keep_ref[...] = keep.reshape(chunk, c, k)


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
    chunk = _pick_chunk(c, kp)
    # chunk*c must land on a sublane multiple for clean (CC, K) tiles
    # chunk*c must land on the bf16 sublane multiple (16) for the mask
    # scratch's (CC, K) tiles (also satisfies the f32 8-multiple)
    while chunk > 1 and (chunk * c) % 16:
        chunk -= 1
    bp = _round_up(b, chunk)
    pad = ((0, bp - b), (0, 0), (0, kp - k))

    planes = [
        jnp.pad(boxes[..., i], pad) for i in range(4)
    ]  # 4 × (Bp, C, Kp)
    valid_f = jnp.pad(valid.astype(jnp.float32), pad)

    spec = pl.BlockSpec(
        (chunk, c, kp), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
    )
    keep = pl.pallas_call(
        functools.partial(_suppress_kernel, iou_threshold=iou_threshold),
        grid=(bp // chunk,),
        in_specs=[spec] * 5,
        out_specs=spec,
        out_shape=jax.ShapeDtypeStruct((bp, c, kp), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((kp, chunk * c, kp), jnp.bfloat16),
            pltpu.VMEM((5, kp, chunk * c), jnp.float32),
        ],
        interpret=interpret,
    )(*planes, valid_f)
    return keep[:b, :, :k] > 0.5
