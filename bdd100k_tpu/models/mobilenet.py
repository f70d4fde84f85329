"""MobileNetV1 backbone with SSD feature taps (SURVEY.md §2.3).

Spec: depthwise-separable conv stack with a width multiplier; taps feed the
SSD300 anchor layout (38², 19², 10² for a 300×300 input — strides 8/16/32),
extra convs downstream produce the remaining maps (SSDDetector adds those).
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from bdd100k_tpu.models.layers import ConvBN, DepthwiseSeparable


def _w(ch: int, mult: float) -> int:
    """Width-multiplied channel count, kept a multiple of 8 for TPU tiling."""
    return max(8, int(ch * mult + 4) // 8 * 8)


class MobileNetBackbone(nn.Module):
    """Returns feature taps at strides (8, 16, 32): channels (256, 512, 1024)
    at width 1.0. Standard 13-block MobileNetV1 body."""

    width: float = 1.0
    dtype: jnp.dtype = jnp.bfloat16
    quant: str = "none"

    @nn.compact
    def __call__(self, x, train: bool = False):
        w = lambda ch: _w(ch, self.width)
        q = self.quant
        # the stem always stays bf16: first-layer precision is the cheapest
        # accuracy insurance in PTQ (its FLOPs are negligible anyway)
        x = ConvBN(w(32), strides=(2, 2), dtype=self.dtype,
                   name="stem")(x, train)
        x = DepthwiseSeparable(w(64), dtype=self.dtype, quant=q,
                               name="ds1")(x, train)
        x = DepthwiseSeparable(w(128), (2, 2), self.dtype, q, name="ds2")(x, train)
        x = DepthwiseSeparable(w(128), dtype=self.dtype, quant=q,
                               name="ds3")(x, train)
        x = DepthwiseSeparable(w(256), (2, 2), self.dtype, q, name="ds4")(x, train)
        x = DepthwiseSeparable(w(256), dtype=self.dtype, quant=q,
                               name="ds5")(x, train)
        tap8 = x  # stride 8
        x = DepthwiseSeparable(w(512), (2, 2), self.dtype, q, name="ds6")(x, train)
        for i in range(5):
            x = DepthwiseSeparable(
                w(512), dtype=self.dtype, quant=q, name=f"ds{7 + i}"
            )(x, train)
        tap16 = x  # stride 16
        x = DepthwiseSeparable(w(1024), (2, 2), self.dtype, q,
                               name="ds12")(x, train)
        x = DepthwiseSeparable(w(1024), dtype=self.dtype, quant=q,
                               name="ds13")(x, train)
        tap32 = x  # stride 32
        return [tap8, tap16, tap32]
