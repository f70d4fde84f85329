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
  * each greedy step computes its candidate's IoU row INLINE from the box
    planes (a dozen VPU ops on a (chunk·C, K) tile) instead of reading a
    precomputed (K, chunk·C, K) suppression tensor from scratch. Round 3
    change: the old fill-then-read design capped chunk at the scratch's
    VMEM footprint and paid the whole O(K²·chunk·C) tensor twice in VMEM
    traffic (write + read); inline recompute costs the same FLOPs as the
    fill ONCE, needs only the 5 transposed (K, chunk·C) box planes in
    scratch, and lets the chunk — and with it the per-step VPU occupancy
    and the number of serialized grid programs — grow ~4×.
  * box planes are staged TRANSPOSED (candidate-major) in scratch so the
    loop slices candidate i by leading index — the cheapest dynamic access
    Mosaic supports (value-side dynamic_slice isn't lowered).
  * the keep-mask update is pure arithmetic (one-hot multiply): no scatter.
  * K pads to the 128-lane multiple; chunk·C pads to the f32 sublane
    multiple (8); chunk is sized to a ~10 MB VMEM working set.
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
    """Largest image chunk whose working set fits the VMEM budget.

    Bigger chunks directly cut the kernel's sequential cost: grid programs
    serialize on the TensorCore and each runs the same K greedy steps, so
    B/chunk programs x K steps shrinks linearly in chunk. Working set per
    (image*class) row: 5 transposed box planes (5*kp*4 B in scratch),
    ~8 live (CC, K) f32 loop values (x1..y2, area, keep, row, temps), and
    6 in/out blocks."""
    per_cc = (5 + 8 + 6) * kp * 4
    chunk = max(1, _VMEM_BUDGET_BYTES // (per_cc * max(c, 1)))
    return min(chunk, 64)


def _suppress_kernel(
    x1_ref, y1_ref, x2_ref, y2_ref, valid_ref, keep_ref, t_ref,
    *, iou_threshold: float,
):
    """Refs are (chunk, C, K); t_ref is (5, K, chunk*C) f32 scratch holding
    the candidate-major transposed box planes + areas."""
    chunk, c, k = x1_ref.shape
    cc = chunk * c

    def flat(ref):  # (chunk, C, K) -> (chunk*C, K): leading-dim merge
        return ref[...].reshape(cc, k)

    x1, y1, x2, y2 = flat(x1_ref), flat(y1_ref), flat(x2_ref), flat(y2_ref)
    a = jnp.maximum(x2 - x1, 0.0) * jnp.maximum(y2 - y1, 0.0)  # (CC, K)
    # stage candidate-major transposes in scratch so the greedy loop can
    # slice candidate i by REF (value-side dynamic_slice isn't lowered)
    t_ref[0] = x1.T
    t_ref[1] = y1.T
    t_ref[2] = x2.T
    t_ref[3] = y2.T
    t_ref[4] = a.T  # each (K, CC)

    # j-side operands, broadcast-ready: (1, CC, K)
    x1j, y1j, x2j, y2j, aj = (v[None] for v in (x1, y1, x2, y2, a))
    lane_ids = jax.lax.broadcasted_iota(jnp.int32, (1, k), dimension=1)

    def body(i, keep):
        def bi(plane):  # candidate i's value for every cc: (1, CC, 1)
            return t_ref[plane, pl.ds(i, 1)][:, :, None]

        # IoU row of candidate i vs all j, computed inline (same f32 math
        # and threshold as the XLA oracle → identical keep decisions)
        ix1 = jnp.maximum(bi(0), x1j)
        iy1 = jnp.maximum(bi(1), y1j)
        ix2 = jnp.minimum(bi(2), x2j)
        iy2 = jnp.minimum(bi(3), y2j)
        inter = jnp.maximum(ix2 - ix1, 0.0) * jnp.maximum(iy2 - iy1, 0.0)
        union = bi(4) + aj - inter
        iou = (inter / jnp.maximum(union, 1e-8)).reshape(cc, k)
        row = jnp.where(iou > iou_threshold, 1.0, 0.0)         # (CC, K)
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
    # chunk*c must land on the f32 sublane multiple (8) for clean (CC, K)
    # tiles
    while chunk > 1 and (chunk * c) % _SUBLANE:
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
            pltpu.VMEM((5, kp, chunk * c), jnp.float32),
        ],
        interpret=interpret,
    )(*planes, valid_f)
    return keep[:b, :, :k] > 0.5
