"""Shared conv building blocks (SURVEY.md §2.3).

All modules take a `dtype` (compute dtype, default bfloat16 — the MXU-native
type) and keep params in fp32. BatchNorm runs in fp32 for stable statistics.

Modules also take a `quant` mode ("none" | "int8" | "int8_static"). Both
int8 modes swap dense (groups == 1) convs for :class:`QuantConv` —
post-training int8 quantization that rides the v5e's int8 MXU path (2× the
bf16 peak). "int8" derives the activation scale dynamically (per batch, an
amax reduction over the activation tensor per layer); "int8_static" reads
it from a calibrated `quant` variable collection (models/quant.py), which
removes the per-layer reduction AND lets XLA fuse the quantize into the
producing op's epilogue — the activation is written to HBM once, as int8.
The `params` tree is IDENTICAL in every mode, so any f32/bf16 checkpoint
loads unchanged into a quantized model. Depthwise convs stay in bf16: they
are VPU-bound, so int8 buys nothing there, and they are the most
quantization-sensitive layers in MobileNet-style nets.
"""

from __future__ import annotations

from typing import Callable, NamedTuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from bdd100k_tpu.ops.pallas_depthwise import depthwise_conv3x3


class DepthwiseConv3x3(nn.Module):
    """3×3 SAME depthwise conv with a selectable backend
    (ops/pallas_depthwise.py): XLA by default — measured fastest on v5e
    at every flagship shape — with the exact Pallas kernels opt-in via
    ``BDD100K_TPU_DW=pallas|hybrid`` (kept for re-measurement on other
    TPU generations; see the kernel module docstring for the r5 study).
    Param layout is identical to ``nn.Conv(features=C,
    feature_group_count=C)`` — "kernel" (3, 3, 1, C) f32 — so checkpoints
    interchange freely and init draws from the same fan-in."""

    features: int
    strides: tuple[int, int] = (1, 1)
    use_bias: bool = False
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        assert x.shape[-1] == self.features, (
            f"depthwise conv needs in_ch == features, got {x.shape[-1]} "
            f"vs {self.features}"
        )
        kernel = self.param(
            "kernel", nn.initializers.lecun_normal(),
            (3, 3, 1, self.features), jnp.float32,
        )
        y = depthwise_conv3x3(
            x.astype(self.dtype), kernel.astype(self.dtype), self.strides
        )
        if self.use_bias:
            bias = self.param(
                "bias", nn.initializers.zeros, (self.features,), jnp.float32
            )
            y = y + bias.astype(self.dtype)
        return y


class Int8Act(NamedTuple):
    """A quantized activation travelling BETWEEN static-int8 convs:
    int8 codes plus the fp32 scalar dequant scale (value ≈ codes·scale).
    Produced by QuantConv(emit_int8=True) at inference; consumed by the
    next QuantConv (which then skips its own quantize) and by the
    code-domain relu/pool helpers below — max-pool and ReLU commute with
    the positive-scale quantizer, so the tensor crosses HBM once, as
    int8 (1 byte/elem), instead of dequant→bf16→requant (BENCH_MATRIX
    "Quant stage attribution": the per-layer float round-trip was the
    measured residual between int8_static and the 2× int8 ceiling)."""

    codes: jax.Array   # int8, post-ReLU so values in [0, 127]
    scale: jax.Array   # f32 scalar


def relu_q(x):
    """ReLU that is a no-op on Int8Act (the emitting conv already folded
    ReLU into its epilogue clip at 0)."""
    return x if isinstance(x, Int8Act) else nn.relu(x)


def max_pool_q(x, window, strides, padding="SAME"):
    """max_pool that runs directly on int8 codes for Int8Act inputs
    (max commutes with the monotone dequant map; the scale is unchanged)."""
    if isinstance(x, Int8Act):
        codes = jax.lax.reduce_window(
            x.codes, jnp.int8(-128), jax.lax.max,
            (1, *window, 1), (1, *strides, 1), padding,
        )
        return Int8Act(codes, x.scale)
    return nn.max_pool(x, window, strides=strides, padding=padding)


class QuantConv(nn.Module):
    """Dynamically-quantized int8 conv, checkpoint-compatible with nn.Conv.

    Post-training quantization, no calibration pass needed: weights get a
    per-OUTPUT-CHANNEL symmetric int8 scale computed from the f32 params at
    call time (tiny vs the conv itself, and shared across a resident-loop
    iteration by XLA CSE within one step); activations get a per-tensor
    dynamic scale from the batch's amax (one fused reduce over an array the
    producer already wrote). The conv itself runs int8×int8→int32 on the
    MXU (v5e int8 peak = 2× bf16), then dequantizes into `dtype`.

    Params are stored exactly like nn.Conv ("kernel" (H, W, I, O) f32,
    "bias" (O,)) so trained f32/bf16 checkpoints restore unchanged.

    `static_act=True` ("int8_static" mode): the activation amax lives in a
    `quant` variable collection instead of being recomputed per batch.
    Calibration = apply with `mutable=["quant"]` (the var keeps a running
    max over the calibration batches; models/quant.calibrate drives this);
    inference reads the frozen var. The scale is then a per-layer constant,
    so the quantize is pure elementwise — XLA fuses it into the previous
    op's epilogue and the fp32 amax reduction (an extra HBM read of every
    activation tensor) disappears from the program.

    `emit_int8=True` (static only — the requant-in-epilogue pipeline,
    r5 VERDICT #4): instead of dequantizing to `dtype`, the conv's int32
    accumulator is scaled by ONE fused per-channel fp32 factor
    (a_scale·w_scale·emit_inv, a frozen constant), the following ReLU is
    folded as the clip floor at 0, and the layer emits `Int8Act` codes
    directly — the inter-layer tensor crosses HBM as 1 byte/elem instead
    of round-tripping through `dtype`. The emit scale comes from a second
    calibrated running max (`out_amax`, the post-ReLU output amax — equal
    to the next layer's input amax since max-pool preserves maxima). A
    QuantConv RECEIVING Int8Act skips its own quantize and uses the
    incoming exact scale; calibration passes always run in float so both
    running maxes populate in one pass.
    """

    features: int
    kernel_size: tuple[int, int]
    strides: tuple[int, int] = (1, 1)
    padding: str = "SAME"
    kernel_dilation: tuple[int, int] = (1, 1)
    use_bias: bool = True
    dtype: jnp.dtype = jnp.bfloat16
    static_act: bool = False
    emit_int8: bool = False

    @nn.compact
    def __call__(self, x):
        kh, kw = self.kernel_size
        is_q_in = isinstance(x, Int8Act)
        in_ch = (x.codes if is_q_in else x).shape[-1]
        kernel = self.param(
            "kernel",
            nn.initializers.lecun_normal(),
            (kh, kw, in_ch, self.features),
            jnp.float32,
        )
        bias = self.param(
            "bias", nn.initializers.zeros, (self.features,), jnp.float32
        ) if self.use_bias else None
        # symmetric per-output-channel weight quant
        w_amax = jnp.max(jnp.abs(kernel), axis=(0, 1, 2))        # (O,)
        w_scale = jnp.maximum(w_amax, 1e-12) / 127.0
        w_q = jnp.clip(
            jnp.round(kernel / w_scale), -127, 127
        ).astype(jnp.int8)
        calibrating = self.is_mutable_collection("quant")
        if self.static_act:
            # calibrated per-tensor activation quant (running max while the
            # "quant" collection is mutable, frozen scale at inference)
            amax_var = self.variable(
                "quant", "act_amax", lambda: jnp.zeros((), jnp.float32)
            )
            out_amax_var = self.variable(
                "quant", "out_amax", lambda: jnp.zeros((), jnp.float32)
            ) if self.emit_int8 else None
            if is_q_in:
                # requant pipeline: the producer already emitted codes;
                # its emit scale is this input's EXACT dequant factor
                x_q, a_scale = x.codes, x.scale
            else:
                if calibrating:
                    amax_var.value = jnp.maximum(
                        amax_var.value,
                        jnp.max(jnp.abs(x.astype(jnp.float32))),
                    )
                a_amax = amax_var.value
                # Quantize in the INPUT dtype (bf16), not via an fp32
                # upcast: the scale is a frozen constant, so
                # mul+round+clip is a pure elementwise epilogue XLA fuses
                # into the previous op — the activation leaves HBM once,
                # as int8, and the fp32 round-trip between quantized
                # layers disappears. Dequant uses the exact fp32 inverse
                # of the (possibly bf16) multiplier, so there is no
                # systematic gain error; the bf16 mul itself rounds
                # ≤1 int8 LSB for |q|≥64 (8 significand bits) —
                # quantization-noise level (mAP delta in BENCH_MATRIX).
                # When the module runs in fp32 (tests), this is
                # bit-identical to the dynamic branch below.
                # clamp to the compute dtype's finite range BEFORE the
                # cast: fp16 would overflow to inf for amax < ~2e-3
                # (0·inf → NaN); no-op for bf16/fp32 (ADVICE r4)
                inv = jnp.minimum(
                    127.0 / jnp.maximum(a_amax, 1e-12),
                    float(jnp.finfo(x.dtype).max),
                ).astype(x.dtype)
                a_scale = 1.0 / inv.astype(jnp.float32)
                x_q = jnp.clip(
                    jnp.round(x * inv), -127, 127
                ).astype(jnp.int8)
        else:
            # dynamic per-tensor activation quant (amax is data-dependent,
            # so the quantize cannot be a frozen-constant epilogue; keep
            # the reduction and the quantize in fp32)
            xf = x.astype(jnp.float32)
            a_amax = jnp.max(jnp.abs(xf))
            inv = 127.0 / jnp.maximum(a_amax, 1e-12)
            a_scale = 1.0 / inv
            x_q = jnp.clip(jnp.round(xf * inv), -127, 127).astype(jnp.int8)

        acc = jax.lax.conv_general_dilated(
            x_q,
            w_q,
            window_strides=self.strides,
            padding=self.padding,
            rhs_dilation=self.kernel_dilation,
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.int32,
        )
        scale_c = a_scale * w_scale                               # (O,) f32
        if self.static_act and self.emit_int8 and not calibrating:
            # requant-in-epilogue: ONE fused per-channel multiply on the
            # int32 accumulator, ReLU folded as the clip floor, int8 out
            emit_inv = 127.0 / jnp.maximum(out_amax_var.value, 1e-12)
            val = acc.astype(jnp.float32) * (scale_c * emit_inv)
            if bias is not None:
                val = val + bias * emit_inv
            codes = jnp.clip(jnp.round(val), 0, 127).astype(jnp.int8)
            return Int8Act(codes, 1.0 / emit_inv)
        out = acc.astype(jnp.float32) * scale_c
        if bias is not None:
            out = out + bias
        if self.static_act and self.emit_int8 and calibrating:
            # post-ReLU output amax == the next quantized layer's input
            # amax (ReLU is folded at emit; max-pool preserves maxima)
            out_amax_var.value = jnp.maximum(
                out_amax_var.value, jnp.maximum(jnp.max(out), 0.0)
            )
        return out.astype(self.dtype)


def conv2d(
    quant: str,
    features: int,
    kernel_size: tuple[int, int],
    *,
    strides: tuple[int, int] = (1, 1),
    padding: str = "SAME",
    kernel_dilation: tuple[int, int] = (1, 1),
    feature_group_count: int = 1,
    use_bias: bool = True,
    dtype: jnp.dtype = jnp.bfloat16,
    emit_int8: bool = False,
    name: str | None = None,
) -> nn.Module:
    """nn.Conv, or its int8 drop-in for the int8 quant modes (same params).

    Grouped/depthwise convs always stay nn.Conv: they're VPU-bound (int8
    gains nothing) and the most quantization-sensitive layers.
    `emit_int8` marks a conv whose (post-ReLU) consumer is another
    static-int8 conv — in "int8_static" mode it then emits Int8Act codes
    straight from the conv epilogue (see QuantConv); inert in every other
    mode.
    """
    if (
        feature_group_count > 1
        and feature_group_count == features
        and tuple(kernel_size) == (3, 3)
        and padding == "SAME"
        and tuple(kernel_dilation) == (1, 1)
    ):
        # depthwise: selectable-backend module (stays bf16 in every quant
        # mode, as before — dw convs are VPU-bound and quant-sensitive)
        return DepthwiseConv3x3(
            features=features,
            strides=strides,
            use_bias=use_bias,
            dtype=dtype,
            name=name,
        )
    if quant in ("int8", "int8_static") and feature_group_count == 1:
        return QuantConv(
            features=features,
            kernel_size=kernel_size,
            strides=strides,
            padding=padding,
            kernel_dilation=kernel_dilation,
            use_bias=use_bias,
            dtype=dtype,
            static_act=quant == "int8_static",
            emit_int8=emit_int8 and quant == "int8_static",
            name=name,
        )
    if quant not in ("none", "int8", "int8_static"):
        raise ValueError(f"unknown quant mode {quant!r}")
    return nn.Conv(
        features,
        kernel_size,
        strides=strides,
        padding=padding,
        kernel_dilation=kernel_dilation,
        feature_group_count=feature_group_count,
        use_bias=use_bias,
        dtype=dtype,
        param_dtype=jnp.float32,
        name=name,
    )


class ConvBN(nn.Module):
    """Conv → BatchNorm → ReLU6 (MobileNet-style block)."""

    features: int
    kernel: tuple[int, int] = (3, 3)
    strides: tuple[int, int] = (1, 1)
    padding: str = "SAME"
    groups: int = 1
    dtype: jnp.dtype = jnp.bfloat16
    act: Callable = nn.relu6
    quant: str = "none"

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = conv2d(
            self.quant,
            self.features,
            self.kernel,
            strides=self.strides,
            padding=self.padding,
            feature_group_count=self.groups,
            use_bias=False,
            dtype=self.dtype,
            name="Conv_0",
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
    quant: str = "none"

    @nn.compact
    def __call__(self, x, train: bool = False):
        in_ch = x.shape[-1]
        # dw conv always stays bf16 (conv2d quantizes only groups == 1)
        x = ConvBN(
            in_ch,
            kernel=(3, 3),
            strides=self.strides,
            groups=in_ch,
            dtype=self.dtype,
            quant=self.quant,
            name="dw",
        )(x, train)
        return ConvBN(
            self.features, kernel=(1, 1), dtype=self.dtype,
            quant=self.quant, name="pw",
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
    """n× (3×3 conv + ReLU); plain VGG block (no BN, matching classic
    VGG16). In "int8_static" mode, intra-block convs always feed another
    quantized conv, so they emit int8 codes directly (requant pipeline);
    `emit_out` says whether the LAST conv may too (False when the block
    output feeds a float consumer, e.g. an L2Norm tap)."""

    features: int
    num_convs: int
    dtype: jnp.dtype = jnp.bfloat16
    quant: str = "none"
    emit_out: bool = False

    @nn.compact
    def __call__(self, x):
        for i in range(self.num_convs):
            x = conv2d(
                self.quant,
                self.features,
                (3, 3),
                padding="SAME",
                dtype=self.dtype,
                emit_int8=(i + 1 < self.num_convs) or self.emit_out,
                name=f"conv{i + 1}",
            )(x)
            x = relu_q(x)
        return x
