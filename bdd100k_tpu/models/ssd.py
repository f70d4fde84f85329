"""SSD multibox heads + detector assembly (SURVEY.md §2.3, SSD §2.1).

Per tapped feature map: 3×3 conv → 4k loc channels and 3×3 conv → (C+1)k
conf channels; outputs reshape to (N, anchors, 4) / (N, anchors, C+1) in the
same (row, col, box) order as `ops.anchors.ssd_anchors`, so predictions and
anchors align index-for-index.
"""

from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax.numpy as jnp

from bdd100k_tpu.models.layers import ConvBN
from bdd100k_tpu.ops.anchors import FeatureMapSpec


class MultiboxHead(nn.Module):
    """Loc + conf convs for one feature map."""

    num_boxes: int
    num_classes: int  # foreground classes C; conf outputs C+1
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        b = x.shape[0]
        loc = nn.Conv(
            self.num_boxes * 4,
            (3, 3),
            padding="SAME",
            dtype=self.dtype,
            param_dtype=jnp.float32,
            name="loc",
        )(x)
        conf = nn.Conv(
            self.num_boxes * (self.num_classes + 1),
            (3, 3),
            padding="SAME",
            dtype=self.dtype,
            param_dtype=jnp.float32,
            name="conf",
        )(x)
        # (B, H, W, nb*4) -> (B, H*W*nb, 4); row-major (y, x, box) matches
        # the anchor layout contract in ops/anchors.py.
        loc = loc.reshape(b, -1, 4).astype(jnp.float32)
        conf = conf.reshape(b, -1, self.num_classes + 1).astype(jnp.float32)
        return loc, conf


class ExtraFeatureStage(nn.Module):
    """1×1 squeeze + 3×3 downsample conv producing the next pyramid map."""

    mid: int
    out: int
    target_size: int
    dtype: jnp.dtype = jnp.bfloat16
    quant: str = "none"

    @nn.compact
    def __call__(self, x, train: bool = False):
        cur = x.shape[1]
        x = ConvBN(self.mid, kernel=(1, 1), dtype=self.dtype,
                   quant=self.quant, name="squeeze")(x, train)
        if self.target_size == -(-cur // 2):  # halve: 3×3 s2 SAME
            return ConvBN(
                self.out, strides=(2, 2), dtype=self.dtype,
                quant=self.quant, name="down",
            )(x, train)
        if self.target_size == cur - 2:  # e.g. 3→1: 3×3 VALID s1
            return ConvBN(
                self.out, padding="VALID", dtype=self.dtype,
                quant=self.quant, name="down",
            )(x, train)
        raise ValueError(
            f"can't reach map size {self.target_size} from {cur}"
        )


class SSDDetector(nn.Module):
    """Backbone taps + extra stages + multibox heads.

    `backbone` must return a list of taps whose spatial sizes match the first
    len(taps) entries of `feature_maps`; extra stages generate the rest.
    """

    backbone: nn.Module
    feature_maps: Sequence[FeatureMapSpec]
    num_classes: int = 10
    dtype: jnp.dtype = jnp.bfloat16
    # "int8" quantizes backbone + extra-stage convs; the loc/conf
    # prediction heads always stay bf16 (first/last-layer precision is the
    # cheapest accuracy insurance in PTQ, and head FLOPs are small)
    quant: str = "none"

    @nn.compact
    def __call__(self, images, train: bool = False):
        taps = self.backbone(images, train)
        for fm, tap in zip(self.feature_maps, taps):
            if tap.shape[1] != fm.size:
                raise ValueError(
                    f"backbone tap {tap.shape} != feature map {fm.size}"
                )
        feats = list(taps)
        x = taps[-1]
        extra_specs = self.feature_maps[len(taps):]
        for i, fm in enumerate(extra_specs):
            mid = 256 if i == 0 else 128
            out = 512 if i == 0 else 256
            x = ExtraFeatureStage(
                mid, out, fm.size, self.dtype, self.quant,
                name=f"extra{i + 1}",
            )(x, train)
            feats.append(x)

        locs, confs = [], []
        for i, (fm, f) in enumerate(zip(self.feature_maps, feats)):
            loc, conf = MultiboxHead(
                fm.num_boxes, self.num_classes, self.dtype, name=f"head{i}"
            )(f)
            locs.append(loc)
            confs.append(conf)
        return jnp.concatenate(locs, axis=1), jnp.concatenate(confs, axis=1)
