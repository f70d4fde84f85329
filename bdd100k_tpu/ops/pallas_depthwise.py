"""Pallas TPU kernels: 3×3 depthwise conv — forward, input-grad, filter-grad.

Depthwise convolutions are MobileNet's signature op (SURVEY.md §2.3) and
the round-4 attribution's named suspect ("backward is 54% of the YOLO
train step … a Pallas depthwise-bwd kernel is the next lever",
BENCH_MATRIX). Round 5 built that kernel and measured it — and the
attribution's predicted win did NOT materialize: XLA's depthwise
lowering on v5e beats this shift-FMA kernel on every piece and every
flagship shape (fwd 0.14-0.67× of XLA; full YOLO train step 683 imgs/s
vs XLA's 1258; even routing ONLY the filter-grad here — XLA's one
genuinely weak piece, whose isolated grad-conv doesn't even compile
through this box's AOT path — lands at 710). The W-tap sublane
relayouts dominate: each unaligned W-window load costs a full VMEM
relayout pass, and XLA's native conv is already within ~3.5× of the
HBM roofline (796 µs vs 225 at b64 150²×32), i.e. near the 128-lane-
padded VPU compute bound. Full numbers: BENCH_MATRIX "Depthwise
kernel study". The kernels stay in the tree as the exact, tested,
opt-in alternative backend (`BDD100K_TPU_DW=pallas|hybrid`); the
default is XLA — measured, not assumed.

Design (per image = one grid program, whole feature map in VMEM):
  * layout (H, W, C): W on sublanes, C on lanes — channel c stays on lane
    c across every shifted tap, so the per-channel weight is a plain
    broadcast multiply; H is an untiled dim, so the dh taps are free
    re-indexing.
  * SAME padding is materialized ONCE into a zeroed VMEM scratch
    (h+2, w+2, c): edges are zeroed only at grid step 0 (scratch persists
    across grid steps; the interior is overwritten per step), so padding
    costs a VMEM-to-VMEM copy, not an HBM round trip (jnp.pad in XLA
    would re-read and re-write the whole tensor through HBM).
  * the 9 taps are fully unrolled: acc[i, j, c] += xp[i+dh, j+dw, c] *
    k[dh, dw, c], accumulated in f32 (matching the conv's MXU/VPU f32
    accumulation semantics for bf16 inputs).
  * filter grad: same padded scratch; per tap, the (H·W) reduction of
    xp_slice * g runs in VMEM and a (9, C) f32 accumulator block (mapped
    to the same output block every grid step) integrates over the batch.
  * input grad for stride 1 is the forward kernel with the kernel flipped
    in both spatial dims (correlation transpose).

Stride-2 layers fall back to the XLA lowering: Mosaic cannot lower
strided sublane slices (`vector.extract_strided_slice` is stride-1 only —
probed r5), and stride-2 is 4 of MobileNet's 13 dw layers. The custom_vjp
below therefore wraps the stride-1 path only; `depthwise_conv3x3` routes
stride-2 (and non-TPU backends) to `lax.conv_general_dilated`.

Checkpoint compatibility: the flax module stores params exactly like
nn.Conv with feature_group_count=C ("kernel" (3, 3, 1, C) f32), so every
trained artifact loads unchanged (models/layers.py routes depthwise convs
here; set BDD100K_TPU_DW=xla to force the XLA lowering back).
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _dw_xla(x, k, strides=(1, 1)):
    """Reference XLA lowering (k in nn.Conv grouped layout (3, 3, 1, C))."""
    return lax.conv_general_dilated(
        x, k, strides, "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=x.shape[-1],
    )


# ---------------------------------------------------------------- kernels


# Rows per inner step: the kernels run a fori_loop over row chunks
# (Mosaic fully unrolls ops over untiled dims, so computing all H rows in
# one expression would emit H·9 taps of straight-line vector code — the
# first cut compiled for >40 min on 150²; a runtime loop keeps code size
# at one chunk).
_TILE_H = 16


def _loop_rows(n, th, fn):
    """Run fn(i0) on `th`-row windows covering [0, n); the remainder window
    sits at n-th and OVERLAPS the previous one — callers must be
    overlap-idempotent (pure writes) or mask (the filter grad does)."""
    jax.lax.fori_loop(0, n // th, lambda ci, _: (fn(ci * th), 0)[1], 0)
    if n % th:
        fn(n - th)


def _zero_rows(ref):
    """Chunked zero of a (R, W, C) VMEM ref (a single whole-ref store would
    unroll over every untiled row — same code-size blowup as the taps)."""
    r, w, c = ref.shape
    th = min(_TILE_H, r)

    def z(i0):
        ref[pl.ds(i0, th)] = jnp.zeros((th, w, c), ref.dtype)

    _loop_rows(r, th, z)


def _copy_interior(xp_ref, x_ref, h, w):
    """xp[1:h+1, 1:w+1, :] = x, in row chunks (overlap-idempotent)."""
    th = min(_TILE_H, h)

    def cp(i0):
        xp_ref[pl.ds(i0 + 1, th), 1:w + 1, :] = x_ref[0, pl.ds(i0, th)]

    _loop_rows(h, th, cp)


def _fwd_body(xp_ref, kv, o_ref, h, w, c):
    """Shared 9-tap row-chunk loop: o[i,j,c] = Σ xp[i+dh, j+dw, c]·k.
    The remainder pass recomputes the last `th` rows at offset h-th
    (overlap recompute is harmless — pure writes of identical values).

    The unaligned W-window loads are the expensive part (each is a
    sublane relayout); they are hoisted: the th+2 rows a chunk needs are
    shifted ONCE per dw and reused by all three dh taps — 3 relayouts of
    (th+2)/th the data instead of 9 (measured ~2× on the kernel)."""
    th = min(_TILE_H, h)

    def chunk(i0):
        # 3 W-shifted copies of the th+2 rows this chunk touches
        shifted = [
            xp_ref[pl.ds(i0, th + 2), dw:dw + w, :].astype(jnp.float32)
            for dw in range(3)
        ]
        acc = jnp.zeros((th, w, c), jnp.float32)
        for dh in range(3):
            for dw in range(3):
                acc = acc + shifted[dw][dh:dh + th] * kv[dh, dw].reshape(
                    1, 1, c
                )
        o_ref[0, pl.ds(i0, th)] = acc.astype(o_ref.dtype)

    _loop_rows(h, th, chunk)


def _fwd_kernel(x_ref, k_ref, o_ref, xp_ref):
    """One image per grid step: 3×3 stride-1 SAME depthwise conv."""
    _, h, w, c = x_ref.shape

    @pl.when(pl.program_id(0) == 0)
    def _():  # zero the pad border once; interior is overwritten per step
        _zero_rows(xp_ref)

    _copy_interior(xp_ref, x_ref, h, w)
    kv = k_ref[:].astype(jnp.float32)            # (3, 3, C)
    _fwd_body(xp_ref, kv, o_ref, h, w, c)


def _fgrad_kernel(x_ref, g_ref, dk_ref, xp_ref):
    """dk[dh,dw,c] = Σ_{b,i,j} g[b,i,j,c] * xp[b, i+dh, j+dw, c].

    Grid over the batch; dk block (9, C) f32 maps to the same output block
    every step and integrates the per-image partials. Rows are reduced in
    _TILE_H chunks through the same runtime loop as the forward (the
    remainder pass must NOT recompute overlapping rows here — it would
    double-count — so the remainder uses a masked chunk instead)."""
    _, h, w, c = x_ref.shape

    @pl.when(pl.program_id(0) == 0)
    def _():
        _zero_rows(xp_ref)
        dk_ref[:] = jnp.zeros_like(dk_ref)

    _copy_interior(xp_ref, x_ref, h, w)
    th = min(_TILE_H, h)

    def chunk(i0, skip):
        # skip: how many leading rows of this chunk were already reduced
        # by the full-chunk loop (static; >0 only for the remainder pass,
        # which re-reads the last `th` rows and masks the overlap off so
        # nothing double-counts)
        g = g_ref[0, pl.ds(i0, th), :, :].astype(jnp.float32)
        if skip:
            keep = jax.lax.broadcasted_iota(
                jnp.int32, (th, w, c), 0
            ) >= skip
            g = jnp.where(keep, g, 0.0)
        # hoist the W-window relayouts: 3 shifted loads of th+2 rows,
        # shared by the three dh taps (same trick as _fwd_body)
        shifted = [
            xp_ref[pl.ds(i0, th + 2), dw:dw + w, :].astype(jnp.float32)
            for dw in range(3)
        ]
        for dh in range(3):
            for dw in range(3):
                part = jnp.sum(
                    shifted[dw][dh:dh + th] * g, axis=(0, 1)
                ).reshape(1, c)
                t = dh * 3 + dw
                dk_ref[t:t + 1, :] = dk_ref[t:t + 1, :] + part

    jax.lax.fori_loop(
        0, h // th, lambda ci, _: (chunk(ci * th, 0), 0)[1], 0
    )
    if h % th:
        chunk(h - th, th - h % th)


def _vmem_limit(h: int, w: int, c: int, itemsize: int) -> int:
    # Two image-sized blocks double-buffered across grid steps (4 × block:
    # in+out for fwd, x+g for fgrad) plus the padded scratch and the f32
    # chunk temporaries (3 shifted (th+2)-row windows + acc + g chunk) —
    # all with C lane-padded to 128 (a C=32 map costs 4× its logical
    # bytes). 8 MiB slack on top; v5e's physical VMEM is far larger.
    cp = -(-c // 128) * 128
    blk = h * w * cp * itemsize
    th = min(_TILE_H, h)
    tmp = (3 * (th + 2) + 2 * th) * w * cp * 4
    return 4 * blk + (h + 2) * (w + 2) * cp * itemsize + tmp + (8 << 20)


def _fwd_pallas(x, k, interpret=False):
    """x (B, H, W, C), k (3, 3, C) → (B, H, W, C); stride 1, SAME."""
    b, h, w, c = x.shape
    img = pl.BlockSpec((1, h, w, c), lambda i: (i, 0, 0, 0),
                       memory_space=pltpu.VMEM)
    return pl.pallas_call(
        _fwd_kernel,
        grid=(b,),
        in_specs=[
            img,
            pl.BlockSpec((3, 3, c), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=img,
        out_shape=jax.ShapeDtypeStruct((b, h, w, c), x.dtype),
        scratch_shapes=[pltpu.VMEM((h + 2, w + 2, c), x.dtype)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_vmem_limit(h, w, c, x.dtype.itemsize),
        ),
        interpret=interpret,
    )(x, k)


def _fgrad_pallas(x, g, interpret=False):
    """x, g (B, H, W, C) → dk (3, 3, C) f32; stride 1, SAME."""
    b, h, w, c = x.shape
    img = pl.BlockSpec((1, h, w, c), lambda i: (i, 0, 0, 0),
                       memory_space=pltpu.VMEM)
    dk = pl.pallas_call(
        _fgrad_kernel,
        grid=(b,),
        in_specs=[img, img],
        out_specs=pl.BlockSpec((9, c), lambda i: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((9, c), jnp.float32),
        scratch_shapes=[pltpu.VMEM((h + 2, w + 2, c), x.dtype)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_vmem_limit(h, w, c, x.dtype.itemsize),
        ),
        interpret=interpret,
    )(x, g)
    return dk.reshape(3, 3, c)


# ------------------------------------------------- stride-1 custom VJPs


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def _dw3x3_s1(x, k, interpret=False):
    """Differentiable stride-1 SAME 3×3 depthwise conv (k: (3, 3, C)),
    all three pieces (fwd, dx, dk) on the Pallas kernels."""
    return _fwd_pallas(x, k, interpret)


def _dw3x3_s1_fwd(x, k, interpret):
    return _fwd_pallas(x, k, interpret), (x, k)


def _dw3x3_s1_bwd(interpret, res, g):
    x, k = res
    # input grad = correlation of g with the spatially-flipped kernel
    dx = _fwd_pallas(g, k[::-1, ::-1], interpret).astype(x.dtype)
    dk = _fgrad_pallas(x, g, interpret).astype(k.dtype)
    return dx, dk


_dw3x3_s1.defvjp(_dw3x3_s1_fwd, _dw3x3_s1_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def _dw3x3_s1_hybrid(x, k, interpret=False):
    """Stride-1 SAME 3×3 depthwise conv: XLA forward + XLA input-grad,
    Pallas FILTER-grad only — the narrowest possible routing of the one
    piece XLA handles worst (its isolated batch_group_count grad-conv
    doesn't compile through this box's AOT path at all). Measured r5:
    still slower than all-XLA in the real train step (710 vs 1258
    imgs/s) — XLA's in-situ fused dk beats the standalone kernel."""
    return _dw_xla(x, k.reshape(3, 3, 1, -1))


def _dw3x3_s1_hybrid_fwd(x, k, interpret):
    return _dw_xla(x, k.reshape(3, 3, 1, -1)), (x, k)


def _dw3x3_s1_hybrid_bwd(interpret, res, g):
    x, k = res
    # input grad = forward conv of g with the spatially-flipped kernel —
    # a plain grouped conv XLA lowers well (unlike its dk grad-conv)
    dx = _dw_xla(g, k[::-1, ::-1].reshape(3, 3, 1, -1)).astype(x.dtype)
    dk = _fgrad_pallas(x, g, interpret).astype(k.dtype)
    return dx, dk


_dw3x3_s1_hybrid.defvjp(_dw3x3_s1_hybrid_fwd, _dw3x3_s1_hybrid_bwd)


def depthwise_conv3x3(x, kernel, strides=(1, 1), *, impl="auto",
                      interpret=False):
    """3×3 SAME depthwise conv with selectable implementation.

    `kernel` in the nn.Conv grouped layout (3, 3, 1, C). `impl` (or env
    ``BDD100K_TPU_DW``): "auto" = "xla" — the measured-fastest choice on
    v5e at every flagship shape (see module docstring; the Pallas paths
    lost 1.8× in the real train step). "pallas" (all three pieces on the
    Pallas kernels; with interpret=True they run interpreted — the CPU
    test path) and "hybrid" (XLA fwd/dx + Pallas dk) stay available for
    re-measurement on other TPU generations. Stride-2 and non-TPU
    backends always take XLA.
    """
    if impl == "auto":
        impl = os.environ.get("BDD100K_TPU_DW", "auto")
    stride1 = tuple(strides) == (1, 1)
    if stride1 and impl == "pallas":
        return _dw3x3_s1(x, kernel.reshape(3, 3, -1), interpret)
    if stride1 and impl == "hybrid":
        return _dw3x3_s1_hybrid(x, kernel.reshape(3, 3, -1), interpret)
    return _dw_xla(x, kernel, strides)
