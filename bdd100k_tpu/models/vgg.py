"""VGG16 backbone, SSD variant (SURVEY.md §2.3).

Spec: conv1-5 stacks; pool5 is 3×3 stride-1 (SSD modification); fc6/fc7
become dilated 3×3 (rate 6) / 1×1 convs; conv4_3 gets an L2Norm tap.
Returns taps at stride 8 (conv4_3, L2-normalized) and stride 16 (fc7);
SSDDetector appends extra-conv maps for the rest of the pyramid.
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from bdd100k_tpu.models.layers import (
    L2Norm,
    VGGConvBlock,
    conv2d,
    max_pool_q,
    relu_q,
)


class VGG16Backbone(nn.Module):
    dtype: jnp.dtype = jnp.bfloat16
    quant: str = "none"

    @nn.compact
    def __call__(self, x, train: bool = False):
        # pools run on int8 codes when the requant pipeline is active
        # (max commutes with the positive-scale quantizer)
        pool = lambda y: max_pool_q(y, (2, 2), strides=(2, 2))
        q = self.quant
        # block1 always stays bf16 (first-layer precision, cheap FLOPs)
        x = VGGConvBlock(64, 2, self.dtype, name="block1")(x)
        x = pool(x)
        # emit_out: a block whose (pooled) output feeds another quantized
        # conv keeps the activation in int8 end-to-end ("int8_static"
        # requant pipeline); block4's output feeds the float L2Norm tap,
        # so its last conv dequantizes
        x = VGGConvBlock(128, 2, self.dtype, q, emit_out=True,
                         name="block2")(x)
        x = pool(x)
        x = VGGConvBlock(256, 3, self.dtype, q, emit_out=True,
                         name="block3")(x)
        x = pool(x)
        x = VGGConvBlock(512, 3, self.dtype, q, name="block4")(x)
        tap8 = L2Norm(name="conv4_3_norm")(x)  # stride 8, L2-normalized
        x = pool(x)
        x = VGGConvBlock(512, 3, self.dtype, q, emit_out=True,
                         name="block5")(x)
        # SSD's pool5: 3×3 stride 1 (keeps stride 16)
        x = max_pool_q(x, (3, 3), strides=(1, 1))
        # fc6 → dilated 3×3 conv, fc7 → 1×1 conv (SSD §3 "à trous");
        # fc6 feeds fc7 (quantized), so it emits codes too
        x = conv2d(
            q,
            1024,
            (3, 3),
            kernel_dilation=(6, 6),
            padding="SAME",
            dtype=self.dtype,
            emit_int8=True,
            name="fc6",
        )(x)
        x = relu_q(x)
        x = conv2d(
            q,
            1024,
            (1, 1),
            dtype=self.dtype,
            name="fc7",
        )(x)
        tap16 = nn.relu(x)  # stride 16
        return [tap8, tap16]
