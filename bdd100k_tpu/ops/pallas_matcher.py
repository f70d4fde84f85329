"""Pallas TPU kernel: fused anchor↔GT matching + target encoding.

The XLA matcher (ops/matching.py) makes several full passes over the
(max_boxes, A) IoU tensor — IoU, two argmaxes, a claim matrix, gathers,
encode — each a round trip through HBM (~10 ms per 64-image batch of
SSD300 anchors). This kernel is the BASELINE.json:5 "anchor-to-GT IoU
matching ... as batched TPU ops" made literal: ONE pass over anchor tiles
with every intermediate resident in VMEM, producing exactly the
ops/matching.py outputs (bit-identical keep/assign decisions; asserted in
tests).

Structure (per image = one grid program; anchors tiled on lanes):
  phase 1  — per tile: IoU (M, TA) → per-anchor best GT (argmax over
             sublanes, written straight to the outputs) and a running
             per-GT best-anchor (max over lanes, carried in VMEM scratch).
  phase 2  — per tile: forced claims by comparing the per-GT best-anchor
             ids against the tile's anchor ids (highest GT wins ties, the
             greedy last-write order), final matched index, then class and
             box-coordinate "gathers" as one-hot reductions over the M
             sublanes (M is small; no scatter/gather ops at all), and the
             SSD (tx, ty, tw, th) encode fused in.

Layouts: anchors prepacked as (4, A) center planes and GT as (M, 4)+
(M,)-labels per image; loc targets come back (B, 4, A) and are transposed
to (B, A, 4) by XLA outside (single cheap pass).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from bdd100k_tpu.ops import boxes as box_ops
from bdd100k_tpu.ops.matching import BACKGROUND_CLASS, MatchResult

_LANE = 128
_TILE_A = 512  # anchors per inner step (lanes)


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def _matcher_kernel(
    # inputs (blocks per image unless noted)
    gtb_ref,      # (1, M, 4) corner GT boxes
    gtl_ref,      # (1, 1, M) int32 labels
    gtm_ref,      # (1, 1, M) f32 mask (1 = real GT)
    anc_ref,      # (4, A) center anchor planes cx, cy, w, h — shared
    # outputs (per image)
    mg_ref,       # (1, 1, A) int32 matched GT index
    pos_ref,      # (1, 1, A) f32 positive mask
    cls_ref,      # (1, 1, A) int32 class targets
    loc_ref,      # (1, 4, A) f32 encoded loc targets
    # scratch
    bi_ref,       # (8, M) f32: row 0 = per-GT best IoU
    bx_ref,       # (8, M) i32: row 0 = per-GT best anchor id
    *,
    match_threshold: float,
    variance_center: float,
    variance_size: float,
    num_anchors: int,
):
    m = gtb_ref.shape[1]
    a = num_anchors
    n_tiles = a // _TILE_A

    gtb = gtb_ref[0]                       # (M, 4)
    gx1, gy1 = gtb[:, 0:1], gtb[:, 1:2]    # (M, 1)
    gx2, gy2 = gtb[:, 2:3], gtb[:, 3:4]
    garea = jnp.maximum(gx2 - gx1, 0.0) * jnp.maximum(gy2 - gy1, 0.0)
    gmask = gtm_ref[0]                     # (1, M)
    gmask_col = gmask.reshape(m, 1)

    bi_ref[0:1] = jnp.full((1, m), -1.0)   # padded GTs keep -1 (never match)
    bx_ref[0:1] = jnp.full((1, m), -1, jnp.int32)

    def iou_tile(it):
        """IoU of every GT against this anchor tile: (M, TILE_A)."""
        sl = pl.ds(it * _TILE_A, _TILE_A)
        acx = anc_ref[0:1, sl]             # (1, TA)
        acy = anc_ref[1:2, sl]
        aw = anc_ref[2:3, sl]
        ah = anc_ref[3:4, sl]
        ax1, ax2 = acx - 0.5 * aw, acx + 0.5 * aw
        ay1, ay2 = acy - 0.5 * ah, acy + 0.5 * ah
        ix1 = jnp.maximum(gx1, ax1)        # (M, TA)
        iy1 = jnp.maximum(gy1, ay1)
        ix2 = jnp.minimum(gx2, ax2)
        iy2 = jnp.minimum(gy2, ay2)
        inter = jnp.maximum(ix2 - ix1, 0.0) * jnp.maximum(iy2 - iy1, 0.0)
        # anchor area from the corner round trip, NOT aw*ah: the oracle
        # computes it this way and the ULP difference flips IoU ties
        aarea = jnp.maximum(ax2 - ax1, 0.0) * jnp.maximum(ay2 - ay1, 0.0)
        union = garea + aarea - inter
        iou = inter / jnp.maximum(union, 1e-8)
        # padded GT rows never match anything (mask broadcasts over lanes)
        return jnp.where(gmask_col > 0.0, iou, -1.0)

    # ---- phase 1: per-anchor best GT + running per-GT best anchor ----
    def phase1(it, carry):
        iou = iou_tile(it)                                     # (M, TA)
        sl = pl.ds(it * _TILE_A, _TILE_A)

        best_iou_a = jnp.max(iou, axis=0, keepdims=True)       # (1, TA)
        rows = jax.lax.broadcasted_iota(jnp.int32, iou.shape, 0)
        # first (lowest) GT index achieving the max — argmax tie rule
        best_gt_a = jnp.min(
            jnp.where(iou == best_iou_a, rows, m), axis=0, keepdims=True
        )
        mg_ref[0, 0:1, sl] = best_gt_a
        # stash per-anchor best IoU in pos_ref; finalized in phase 2
        pos_ref[0, 0:1, sl] = best_iou_a

        # running per-GT best anchor (ties: first/lowest anchor id wins,
        # matching argmax-over-axis-1 semantics — strict > keeps earlier)
        tile_best = jnp.max(iou, axis=1, keepdims=True)        # (M, 1)
        cols = jax.lax.broadcasted_iota(jnp.int32, iou.shape, 1)
        tile_arg = jnp.min(
            jnp.where(iou == tile_best, cols, a), axis=1, keepdims=True
        ) + it * _TILE_A                                        # (M, 1)
        cur_best = bi_ref[0:1].reshape(m, 1)
        cur_arg = bx_ref[0:1].reshape(m, 1)
        better = tile_best > cur_best
        bi_ref[0:1] = jnp.where(better, tile_best, cur_best).reshape(1, m)
        bx_ref[0:1] = jnp.where(better, tile_arg, cur_arg).reshape(1, m)
        return carry

    jax.lax.fori_loop(0, n_tiles, phase1, 0)

    # ---- phase 2: forced claims, final assignment, targets ----
    labels_col = gtl_ref[0].reshape(m, 1).astype(jnp.float32)  # (M, 1)
    gt_ids_col = jax.lax.broadcasted_iota(jnp.int32, (m, 1), 0)
    best_anchor_col = bx_ref[0:1].reshape(m, 1)                # (M, 1)
    claim_valid = (gmask_col > 0.0)

    vc, vs = variance_center, variance_size
    eps = 1e-8

    def phase2(it, carry):
        sl = pl.ds(it * _TILE_A, _TILE_A)
        anchor_ids = (
            jax.lax.broadcasted_iota(jnp.int32, (1, _TILE_A), 1)
            + it * _TILE_A
        )
        claims = claim_valid & (best_anchor_col == anchor_ids)  # (M, TA)
        forced = jnp.max(
            jnp.where(claims, 1.0, 0.0), axis=0, keepdims=True
        )                                                       # (1, TA)
        forced_gt = jnp.max(
            jnp.where(claims, gt_ids_col, -1), axis=0, keepdims=True
        )                                                       # highest wins

        best_iou_a = pos_ref[0, 0:1, sl]
        best_gt_a = mg_ref[0, 0:1, sl]
        positive = jnp.maximum(
            forced, jnp.where(best_iou_a > match_threshold, 1.0, 0.0)
        )
        matched = jnp.where(forced > 0.0, forced_gt, best_gt_a)  # (1, TA)
        mg_ref[0, 0:1, sl] = matched
        pos_ref[0, 0:1, sl] = positive

        # one-hot "gathers" over the M sublanes (exactly one row matches)
        onehot = (gt_ids_col == matched).astype(jnp.float32)    # (M, TA)

        def take(col):  # (M, 1) gt column -> (1, TA) matched values
            return jnp.sum(onehot * col, axis=0, keepdims=True)

        cls = take(labels_col)
        cls_ref[0, 0:1, sl] = jnp.where(positive > 0.0, cls, float(
            BACKGROUND_CLASS
        )).astype(jnp.int32)

        bx1, by1 = take(gx1), take(gy1)
        bx2, by2 = take(gx2), take(gy2)
        gcx, gcy = 0.5 * (bx1 + bx2), 0.5 * (by1 + by2)
        gw = jnp.maximum(bx2 - bx1, eps)
        gh = jnp.maximum(by2 - by1, eps)

        acx = anc_ref[0:1, sl]
        acy = anc_ref[1:2, sl]
        aw = anc_ref[2:3, sl]
        ah = anc_ref[3:4, sl]
        keep = positive > 0.0
        z = jnp.zeros_like(gcx)
        loc_ref[0, 0:1, sl] = jnp.where(keep, (gcx - acx) / (aw * vc), z)
        loc_ref[0, 1:2, sl] = jnp.where(keep, (gcy - acy) / (ah * vc), z)
        loc_ref[0, 2:3, sl] = jnp.where(keep, jnp.log(gw / aw) / vs, z)
        loc_ref[0, 3:4, sl] = jnp.where(keep, jnp.log(gh / ah) / vs, z)
        return carry

    jax.lax.fori_loop(0, n_tiles, phase2, 0)


@functools.partial(
    jax.jit, static_argnames=("match_threshold", "interpret")
)
def pallas_encode_targets(
    gt_boxes: jnp.ndarray,
    gt_labels: jnp.ndarray,
    gt_mask: jnp.ndarray,
    anchors_center: jnp.ndarray,
    match_threshold: float = 0.5,
    interpret: bool = False,
) -> MatchResult:
    """Drop-in fused replacement for ops.matching.encode_targets.

    Args mirror encode_targets: gt_boxes (B, M, 4) corner, gt_labels (B, M)
    int, gt_mask (B, M) bool, anchors_center (A, 4).
    """
    b, m, _ = gt_boxes.shape
    a = anchors_center.shape[0]
    ap = _round_up(a, _TILE_A)

    anc = jnp.pad(anchors_center.astype(jnp.float32).T, ((0, 0), (0, ap - a)))
    # padded anchors get w=h=0 → IoU 0 against everything; sliced off below
    gtb = gt_boxes.astype(jnp.float32)
    gtl = gt_labels.astype(jnp.int32).reshape(b, 1, m)
    gtm = gt_mask.astype(jnp.float32).reshape(b, 1, m)

    img_spec = lambda shape: pl.BlockSpec(
        shape, lambda i: (i,) + (0,) * (len(shape) - 1),
        memory_space=pltpu.VMEM,
    )
    mg, pos, cls, loc = pl.pallas_call(
        functools.partial(
            _matcher_kernel,
            match_threshold=match_threshold,
            variance_center=box_ops.VARIANCE_CENTER,
            variance_size=box_ops.VARIANCE_SIZE,
            num_anchors=ap,
        ),
        grid=(b,),
        in_specs=[
            img_spec((1, m, 4)),
            img_spec((1, 1, m)),
            img_spec((1, 1, m)),
            pl.BlockSpec((4, ap), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            img_spec((1, 1, ap)),
            img_spec((1, 1, ap)),
            img_spec((1, 1, ap)),
            img_spec((1, 4, ap)),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((b, 1, ap), jnp.int32),
            jax.ShapeDtypeStruct((b, 1, ap), jnp.float32),
            jax.ShapeDtypeStruct((b, 1, ap), jnp.int32),
            jax.ShapeDtypeStruct((b, 4, ap), jnp.float32),
        ),
        scratch_shapes=[
            pltpu.VMEM((8, m), jnp.float32),
            pltpu.VMEM((8, m), jnp.int32),
        ],
        interpret=interpret,
    )(gtb, gtl, gtm, anc)

    return MatchResult(
        matched_gt=mg[:, 0, :a],
        positive=pos[:, 0, :a] > 0.0,
        cls_targets=cls[:, 0, :a],
        loc_targets=jnp.swapaxes(loc[:, :, :a], 1, 2),
    )
