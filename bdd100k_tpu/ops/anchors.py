"""Anchor generation: SSD multibox priors and YOLO-style grid anchors.

Behavior spec: SURVEY.md §2.2 "Anchor generation" — canonical SSD formula
(arXiv:1512.02325 §2.2): per feature map k, scale s_k interpolates
[s_min, s_max]; aspect ratios {1, 2, 3, 1/2, 1/3} subsets plus an extra
sqrt(s_k * s_{k+1}) box at ar=1.  SSD300-VGG: maps 38²,19²,10²,5²,3²,1² with
4,6,6,6,4,4 boxes → 8732 anchors; SSD512 adds a 7th map → 24 564.

Anchors are precomputed once on host (NumPy would do, but jnp keeps dtype
discipline) and baked into the compiled program as constants — no per-step
work, which is the TPU-idiomatic placement.
"""

from __future__ import annotations

import dataclasses
from typing import Sequence

import numpy as np
import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class FeatureMapSpec:
    """One tapped feature map's anchor layout."""

    size: int                      # spatial resolution (square): f_k
    num_boxes: int                 # anchors per cell (4 or 6)
    scale: float                   # s_k (fraction of input size)
    next_scale: float              # s_{k+1}, for the extra ar=1 box


def _ssd_scales(num_maps: int, s_min: float, s_max: float, first_scale: float):
    """Scales per SSD §2.2; first map uses a special smaller scale
    (conv4_3 in the paper uses 0.1 while the rest interpolate [0.2, 0.9])."""
    rest = [
        s_min + (s_max - s_min) * k / (num_maps - 2) for k in range(num_maps - 1)
    ]
    # s_{K+1} extrapolates one step past s_max for the last extra box.
    step = (s_max - s_min) / (num_maps - 2)
    return [first_scale] + rest, rest[-1] + step


def make_ssd_feature_maps(
    map_sizes: Sequence[int],
    boxes_per_map: Sequence[int],
    s_min: float = 0.2,
    s_max: float = 0.9,
    first_scale: float = 0.1,
) -> tuple[FeatureMapSpec, ...]:
    scales, s_extra = _ssd_scales(len(map_sizes), s_min, s_max, first_scale)
    nexts = scales[1:] + [s_extra]
    return tuple(
        FeatureMapSpec(size=f, num_boxes=nb, scale=s, next_scale=sn)
        for f, nb, s, sn in zip(map_sizes, boxes_per_map, scales, nexts)
    )


# The two reference configs (SURVEY.md §2.2, BASELINE.md configs 1-2).
SSD300_FEATURE_MAPS = make_ssd_feature_maps(
    map_sizes=(38, 19, 10, 5, 3, 1),
    boxes_per_map=(4, 6, 6, 6, 4, 4),
)
SSD512_FEATURE_MAPS = make_ssd_feature_maps(
    map_sizes=(64, 32, 16, 8, 4, 2, 1),
    boxes_per_map=(4, 6, 6, 6, 6, 4, 4),
)

# Aspect-ratio sets by anchors-per-cell: ar=1 twice (s_k and sqrt(s_k s_{k+1})).
_AR_SETS = {
    4: (1.0, 2.0, 0.5),
    6: (1.0, 2.0, 3.0, 0.5, 1.0 / 3.0),
}


def ssd_anchors(
    feature_maps: Sequence[FeatureMapSpec] = SSD300_FEATURE_MAPS,
    dtype=jnp.float32,
) -> jnp.ndarray:
    """All anchors for an SSD config, center format (cx, cy, w, h), normalized.

    Returns (num_anchors, 4); 8732 for SSD300, 24 564 for SSD512 (asserted in
    tests per SURVEY.md §4.2). Layout: maps in order, then rows (y), cols (x),
    then the per-cell box set — matching how the head's conv outputs reshape.
    """
    out = []
    for fm in feature_maps:
        ars = _AR_SETS[fm.num_boxes]
        s = fm.scale
        s_extra = float(np.sqrt(fm.scale * fm.next_scale))
        # Paper order: [s@ar1, s'@ar1, s@ar2, (s@ar3,) s@1/2, (s@1/3)]
        whs = [(s, s), (s_extra, s_extra)] + [
            (s * float(np.sqrt(ar)), s / float(np.sqrt(ar)))
            for ar in ars[1:]
        ]
        whs = np.asarray(whs, dtype=np.float32)  # (nb, 2)
        assert whs.shape[0] == fm.num_boxes

        coords = (np.arange(fm.size, dtype=np.float32) + 0.5) / fm.size
        cy, cx = np.meshgrid(coords, coords, indexing="ij")
        centers = np.stack([cx, cy], axis=-1)  # (f, f, 2)
        centers = np.broadcast_to(
            centers[:, :, None, :], (fm.size, fm.size, fm.num_boxes, 2)
        )
        sizes = np.broadcast_to(
            whs[None, None, :, :], (fm.size, fm.size, fm.num_boxes, 2)
        )
        out.append(
            np.concatenate([centers, sizes], axis=-1).reshape(-1, 4)
        )
    return jnp.asarray(np.concatenate(out, axis=0), dtype=dtype)


def yolo_anchors(
    grid_sizes: Sequence[int],
    priors_per_scale: Sequence[Sequence[tuple[float, float]]],
    dtype=jnp.float32,
) -> jnp.ndarray:
    """YOLO-style anchors: k prior (w, h) pairs per grid cell per scale
    (SURVEY.md §2.2 "Anchor generation (YOLO-style)"). Priors are normalized
    fractions of the input size (k-means-style priors in the reference).

    Returns center-format (num_anchors, 4), same layout rule as ssd_anchors.
    """
    out = []
    for g, priors in zip(grid_sizes, priors_per_scale):
        priors = np.asarray(priors, dtype=np.float32)  # (k, 2)
        coords = (np.arange(g, dtype=np.float32) + 0.5) / g
        cy, cx = np.meshgrid(coords, coords, indexing="ij")
        centers = np.stack([cx, cy], axis=-1)
        k = priors.shape[0]
        centers = np.broadcast_to(centers[:, :, None, :], (g, g, k, 2))
        sizes = np.broadcast_to(priors[None, None, :, :], (g, g, k, 2))
        out.append(np.concatenate([centers, sizes], axis=-1).reshape(-1, 4))
    return jnp.asarray(np.concatenate(out, axis=0), dtype=dtype)


def yolo_cell_sizes(
    grid_sizes: Sequence[int],
    priors_per_scale: Sequence[Sequence[tuple[float, float]]],
    dtype=jnp.float32,
) -> jnp.ndarray:
    """Per-anchor grid cell size (1/g), aligned with :func:`yolo_anchors`."""
    out = [
        np.full(g * g * len(priors), 1.0 / g, dtype=np.float32)
        for g, priors in zip(grid_sizes, priors_per_scale)
    ]
    return jnp.asarray(np.concatenate(out), dtype=dtype)


# Default BDD100K YOLO priors (normalized w, h): small/med/large objects per
# scale, k-means-flavored spread for road scenes (cars dominate; traffic
# lights/signs are small). Three scales like the reference's multi-scale head
# (SURVEY.md §2.3, BASELINE config 3).
YOLO_BDD_PRIORS = (
    ((0.02, 0.03), (0.04, 0.06), (0.08, 0.06)),      # stride-8 grid: small
    ((0.10, 0.12), (0.16, 0.10), (0.22, 0.22)),      # stride-16: medium
    ((0.35, 0.25), (0.55, 0.45), (0.85, 0.75)),      # stride-32: large
)
