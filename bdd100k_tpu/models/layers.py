"""Shared conv building blocks (SURVEY.md §2.3).

All modules take a `dtype` (compute dtype, default bfloat16 — the MXU-native
type) and keep params in fp32. BatchNorm runs in fp32 for stable statistics.
"""

from __future__ import annotations

from typing import Callable

import flax.linen as nn
import jax.numpy as jnp


class ConvBN(nn.Module):
    """Conv → BatchNorm → ReLU6 (MobileNet-style block)."""

    features: int
    kernel: tuple[int, int] = (3, 3)
    strides: tuple[int, int] = (1, 1)
    padding: str = "SAME"
    groups: int = 1
    dtype: jnp.dtype = jnp.bfloat16
    act: Callable = nn.relu6

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = nn.Conv(
            self.features,
            self.kernel,
            strides=self.strides,
            padding=self.padding,
            feature_group_count=self.groups,
            use_bias=False,
            dtype=self.dtype,
            param_dtype=jnp.float32,
        )(x)
        x = nn.BatchNorm(
            use_running_average=not train,
            momentum=0.97,
            epsilon=1e-3,
            dtype=jnp.float32,
        )(x)
        return self.act(x.astype(self.dtype))


class DepthwiseSeparable(nn.Module):
    """MobileNetV1 depthwise-separable block: 3×3 dw conv + 1×1 pw conv."""

    features: int
    strides: tuple[int, int] = (1, 1)
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x, train: bool = False):
        in_ch = x.shape[-1]
        x = ConvBN(
            in_ch,
            kernel=(3, 3),
            strides=self.strides,
            groups=in_ch,
            dtype=self.dtype,
            name="dw",
        )(x, train)
        return ConvBN(
            self.features, kernel=(1, 1), dtype=self.dtype, name="pw"
        )(x, train)


class L2Norm(nn.Module):
    """Channel-wise L2 normalization with a learned scale (init 20) — the
    SSD conv4_3 normalizer (SURVEY.md §2.3 "L2-norm layer on conv4_3")."""

    init_scale: float = 20.0

    @nn.compact
    def __call__(self, x):
        scale = self.param(
            "scale",
            lambda _, shape: jnp.full(shape, self.init_scale, jnp.float32),
            (x.shape[-1],),
        )
        xf = x.astype(jnp.float32)
        norm = jnp.sqrt(jnp.sum(xf * xf, axis=-1, keepdims=True) + 1e-10)
        return (xf / norm * scale).astype(x.dtype)


class VGGConvBlock(nn.Module):
    """n× (3×3 conv + ReLU); plain VGG block (no BN, matching classic VGG16)."""

    features: int
    num_convs: int
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        for i in range(self.num_convs):
            x = nn.Conv(
                self.features,
                (3, 3),
                padding="SAME",
                dtype=self.dtype,
                param_dtype=jnp.float32,
                name=f"conv{i + 1}",
            )(x)
            x = nn.relu(x)
        return x
