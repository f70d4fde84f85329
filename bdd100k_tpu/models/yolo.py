"""YOLO-style multi-scale detection head (SURVEY.md §2.3, BASELINE config 3).

Per scale: conv stack → k×(4+1+C) channels; outputs concat across scales in
the same (scale, row, col, prior) order as `ops.anchors.yolo_anchors`.
Column 0 of the class tensor is the objectness logit; postprocess scoring
uses sigmoid(obj)·sigmoid(cls) (SURVEY.md §2.2 "sigmoid objectness×class").
"""

from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax.numpy as jnp

from bdd100k_tpu.models.layers import ConvBN


class YOLOHead(nn.Module):
    """Detection head for one scale: 3×3 conv → 1×1 conv → k×(5+C)."""

    num_priors: int
    num_classes: int
    mid_channels: int = 256
    dtype: jnp.dtype = jnp.bfloat16
    quant: str = "none"

    @nn.compact
    def __call__(self, x, train: bool = False):
        b = x.shape[0]
        # mid conv quantizes; the final prediction conv stays bf16
        x = ConvBN(self.mid_channels, dtype=self.dtype, quant=self.quant,
                   name="conv")(x, train)
        out = nn.Conv(
            self.num_priors * (5 + self.num_classes),
            (1, 1),
            dtype=self.dtype,
            param_dtype=jnp.float32,
            name="out",
        )(x)
        out = out.reshape(b, -1, 5 + self.num_classes).astype(jnp.float32)
        # (tx, ty, tw, th) | (obj, cls...)
        return out[..., :4], out[..., 4:]


class YOLODetector(nn.Module):
    """Backbone taps (one per scale) + per-scale heads, concatenated."""

    backbone: nn.Module
    priors_per_scale: Sequence[int]
    num_classes: int = 10
    dtype: jnp.dtype = jnp.bfloat16
    quant: str = "none"

    @nn.compact
    def __call__(self, images, train: bool = False):
        taps = self.backbone(images, train)
        if len(taps) != len(self.priors_per_scale):
            raise ValueError(
                f"{len(taps)} taps for {len(self.priors_per_scale)} scales"
            )
        locs, objs = [], []
        for i, (tap, k) in enumerate(zip(taps, self.priors_per_scale)):
            loc, obj_cls = YOLOHead(
                k, self.num_classes, dtype=self.dtype, quant=self.quant,
                name=f"head{i}",
            )(tap, train)
            locs.append(loc)
            objs.append(obj_cls)
        return jnp.concatenate(locs, axis=1), jnp.concatenate(objs, axis=1)
