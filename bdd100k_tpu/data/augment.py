"""Fused on-device augmentation (SURVEY.md §2.1 "TPU-native equivalents").

The reference augments on host per image (SSD-style random crop with an
IoU-rejection loop, expand, flip, color jitter — SURVEY.md §2.1). Here the
whole stage is ONE jitted, batched program:

  * expand (zoom-out) + random IoU-constrained crop + resize fuse into a
    single affine resample per image (`jax.image.scale_and_translate`) —
    the sampled rect lives in original normalized coords and may extend
    beyond [0, 1] (that *is* expansion), mean-filled outside;
  * the data-dependent IoU-rejection loop becomes fixed-trials masked
    selection (SURVEY.md §7 "Input-bound risk ... fixed-trials masked
    selection on device to stay jittable");
  * photometric jitter (brightness/contrast/saturation/hue) runs on the
    resampled (S, S) image — pointwise, fused by XLA into the same program;
  * horizontal flip mirrors image + boxes with p=0.5.

Everything is static-shape; GT stays padded with a validity mask.
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class AugmentConfig:
    """SSD-sampler constants (SURVEY.md §7: kept in one place for re-diff
    against the reference if it ever reappears)."""

    out_size: int = 300
    # photometric (canonical TF/SSD ranges)
    brightness_delta: float = 0.125
    contrast_range: tuple[float, float] = (0.5, 1.5)
    saturation_range: tuple[float, float] = (0.5, 1.5)
    hue_delta: float = 0.1            # radians-fraction of full IQ rotation
    # geometric: SSD §2.2 sampler
    min_ious: tuple[float, ...] = (0.0, 0.1, 0.3, 0.5, 0.7, 0.9)
    crop_scale_range: tuple[float, float] = (0.3, 1.0)   # per-side scale
    crop_ar_range: tuple[float, float] = (0.5, 2.0)
    num_trials: int = 8
    expand_prob: float = 0.5
    expand_max: float = 4.0
    flip_prob: float = 0.5
    mean_fill: float = 0.5            # canvas fill (in [0,1] space)
    # output normalization: (x - mean) / std
    norm_mean: float = 0.5
    norm_std: float = 0.5


def _rect_gt_iou(rect: jnp.ndarray, boxes: jnp.ndarray) -> jnp.ndarray:
    """IoU of one rect (4,) vs boxes (M, 4), corner format."""
    x1 = jnp.maximum(rect[0], boxes[:, 0])
    y1 = jnp.maximum(rect[1], boxes[:, 1])
    x2 = jnp.minimum(rect[2], boxes[:, 2])
    y2 = jnp.minimum(rect[3], boxes[:, 3])
    inter = jnp.maximum(x2 - x1, 0.0) * jnp.maximum(y2 - y1, 0.0)
    ra = jnp.maximum(rect[2] - rect[0], 0.0) * jnp.maximum(rect[3] - rect[1], 0.0)
    ba = jnp.maximum(boxes[:, 2] - boxes[:, 0], 0.0) * jnp.maximum(
        boxes[:, 3] - boxes[:, 1], 0.0
    )
    return inter / jnp.maximum(ra + ba - inter, 1e-8)


def _sample_crop_rect(key, boxes, mask, cfg: AugmentConfig):
    """Pick the geometric rect for one image: maybe-expand ∘ maybe-crop.

    Returns rect (x1, y1, x2, y2) in original normalized coords (may exceed
    [0, 1] — that's the zoom-out canvas).
    """
    k_mode, k_exp, k_ratio, k_expoff, k_trials = jax.random.split(key, 5)

    # --- expansion canvas (SSD §3.6 zoom-out) ---
    do_expand = jax.random.uniform(k_exp) < cfg.expand_prob
    ratio = jax.random.uniform(k_ratio, (), minval=1.0, maxval=cfg.expand_max)
    ratio = jnp.where(do_expand, ratio, 1.0)
    off = jax.random.uniform(k_expoff, (2,)) * (ratio - 1.0)
    # canvas rect in original coords: image occupies [0,1]² inside it
    canvas = jnp.array([-off[0], -off[1], ratio - off[0], ratio - off[1]])

    # --- sampler mode: uniform over {keep-original} ∪ min_ious ---
    num_modes = len(cfg.min_ious) + 1
    mode = jax.random.randint(k_mode, (), 0, num_modes)
    min_iou = jnp.take(
        jnp.asarray((0.0,) + cfg.min_ious), mode
    )  # slot 0 unused when mode==0 (keep original canvas)

    # --- fixed trials of candidate rects inside the canvas ---
    tk = jax.random.split(k_trials, 4)
    lo, hi = cfg.crop_scale_range
    s = jax.random.uniform(tk[0], (cfg.num_trials,), minval=lo, maxval=hi)
    ar = jnp.exp(
        jax.random.uniform(
            tk[1],
            (cfg.num_trials,),
            minval=jnp.log(cfg.crop_ar_range[0]),
            maxval=jnp.log(cfg.crop_ar_range[1]),
        )
    )
    cw = jnp.clip(s * jnp.sqrt(ar), 0.05, 1.0) * ratio
    ch = jnp.clip(s / jnp.sqrt(ar), 0.05, 1.0) * ratio
    u = jax.random.uniform(tk[2], (cfg.num_trials, 2))
    rx1 = canvas[0] + u[:, 0] * (ratio - cw)
    ry1 = canvas[1] + u[:, 1] * (ratio - ch)
    rects = jnp.stack([rx1, ry1, rx1 + cw, ry1 + ch], axis=-1)  # (T, 4)

    # validity: some real GT has IoU ≥ min_iou with the rect AND its center
    # inside the rect (SSD keeps center-inside GTs; a crop that keeps none
    # is useless).
    centers = (boxes[:, :2] + boxes[:, 2:]) * 0.5  # (M, 2)

    def trial_valid(rect):
        iou = _rect_gt_iou(rect, boxes)
        inside = (
            (centers[:, 0] > rect[0])
            & (centers[:, 0] < rect[2])
            & (centers[:, 1] > rect[1])
            & (centers[:, 1] < rect[3])
        )
        ok = mask & inside & (iou >= min_iou)
        return jnp.any(ok)

    valid = jax.vmap(trial_valid)(rects)  # (T,)
    any_valid = jnp.any(valid)
    first = jnp.argmax(valid)  # first True (argmax on bool picks first max)
    chosen = rects[first]

    keep_canvas = (mode == 0) | ~any_valid
    return jnp.where(keep_canvas, canvas, chosen)


def _transform_boxes(rect, boxes, labels, mask):
    """Map GT into rect coords; keep center-inside boxes; clip to [0,1]."""
    rw = rect[2] - rect[0]
    rh = rect[3] - rect[1]
    centers = (boxes[:, :2] + boxes[:, 2:]) * 0.5
    inside = (
        (centers[:, 0] > rect[0])
        & (centers[:, 0] < rect[2])
        & (centers[:, 1] > rect[1])
        & (centers[:, 1] < rect[3])
    )
    new = jnp.stack(
        [
            (boxes[:, 0] - rect[0]) / rw,
            (boxes[:, 1] - rect[1]) / rh,
            (boxes[:, 2] - rect[0]) / rw,
            (boxes[:, 3] - rect[1]) / rh,
        ],
        axis=-1,
    )
    new = jnp.clip(new, 0.0, 1.0)
    new_mask = mask & inside
    return jnp.where(new_mask[:, None], new, 0.0), labels, new_mask


def _resample(image_f, rect, out_size, fill):
    """Crop-or-expand + resize as ONE scale_and_translate call.

    Desired: out pixel center o+0.5 samples input coordinate
    rect_lo_px + (o+0.5)·rect_extent_px/S − 0.5 (pixel-index space).
    scale_and_translate computes i = (o + 0.5 − t)/scale − 0.5 (verified
    empirically), so with scale = S/extent_px the offset solves to
    t = −scale · rect_lo_px. Outside-image samples read 0; resampling
    (img − fill) and adding `fill` back turns that into mean fill.
    """
    h, w = image_f.shape[0], image_f.shape[1]
    s = out_size
    rw = (rect[2] - rect[0]) * w
    rh = (rect[3] - rect[1]) * h
    scale = jnp.stack([s / rh, s / rw])
    t = jnp.stack([-scale[0] * rect[1] * h, -scale[1] * rect[0] * w])
    # The resample is a pair of separable weight matmuls over the full-res
    # frame — the most HBM/MXU-intensive part of the augment program (at
    # 720p→384² it is ~3.3 GFLOPs/img, more than the detector forward).
    # Run it in bf16 at DEFAULT matmul precision: sampling positions and
    # weights are still computed in fp32 (compute_weight_mat) and only
    # cast for the contraction, so the error is bounded by bf16 rounding
    # of [0,1] pixel values (~0.4%) — the same order as the uint8 source
    # quantization. The default HIGHEST precision would force the slow
    # multi-pass fp32 MXU path. Measured: augment stage 144 → 100 µs/img,
    # full YOLO-384 train step 1021 → 1233 imgs/s (bench_train_stages.py).
    out = jax.image.scale_and_translate(
        (image_f - fill).astype(jnp.bfloat16),
        (s, s, image_f.shape[2]),
        (0, 1),
        scale,
        t,
        method="linear",
        precision=jax.lax.Precision.DEFAULT,
    )
    return out.astype(jnp.float32) + fill


def _photometric(key, img, cfg: AugmentConfig):
    """Brightness / contrast / saturation / hue jitter, [0,1] space."""
    kb, kc, ks, kh, korder = jax.random.split(key, 5)
    b = jax.random.uniform(
        kb, (), minval=-cfg.brightness_delta, maxval=cfg.brightness_delta
    )
    c = jax.random.uniform(
        kc, (), minval=cfg.contrast_range[0], maxval=cfg.contrast_range[1]
    )
    s = jax.random.uniform(
        ks, (), minval=cfg.saturation_range[0], maxval=cfg.saturation_range[1]
    )
    theta = jax.random.uniform(
        kh, (), minval=-cfg.hue_delta, maxval=cfg.hue_delta
    ) * (2.0 * jnp.pi)

    img = img + b
    mean = jnp.mean(img, axis=(0, 1), keepdims=True)
    img = (img - mean) * c + mean
    gray = jnp.mean(img, axis=-1, keepdims=True)
    img = gray + (img - gray) * s
    # hue: rotate the IQ chroma plane (YIQ), a 3×3 matmul — VPU-cheap
    rgb2yiq = jnp.array(
        [[0.299, 0.587, 0.114],
         [0.596, -0.274, -0.322],
         [0.211, -0.523, 0.312]]
    )
    yiq2rgb = jnp.array(
        [[1.0, 0.956, 0.621],
         [1.0, -0.272, -0.647],
         [1.0, -1.106, 1.703]]
    )
    cos, sin = jnp.cos(theta), jnp.sin(theta)
    rot = jnp.array([[1.0, 0, 0], [0, cos, -sin], [0, sin, cos]])
    m = yiq2rgb @ rot @ rgb2yiq
    img = img @ m.T
    return jnp.clip(img, 0.0, 1.0)


def _augment_one(key, image_u8, boxes, labels, mask, cfg: AugmentConfig):
    k_rect, k_photo, k_flip = jax.random.split(key, 3)
    img = image_u8.astype(jnp.float32) / 255.0
    rect = _sample_crop_rect(k_rect, boxes, mask, cfg)
    out = _resample(img, rect, cfg.out_size, cfg.mean_fill)
    boxes, labels, mask = _transform_boxes(rect, boxes, labels, mask)

    flip = jax.random.uniform(k_flip) < cfg.flip_prob
    out = jnp.where(flip, out[:, ::-1, :], out)
    flipped = jnp.stack(
        [1.0 - boxes[:, 2], boxes[:, 1], 1.0 - boxes[:, 0], boxes[:, 3]],
        axis=-1,
    )
    boxes = jnp.where(flip, jnp.where(mask[:, None], flipped, 0.0), boxes)

    out = _photometric(k_photo, out, cfg)
    out = (out - cfg.norm_mean) / cfg.norm_std
    return out, boxes, labels, mask


@partial(jax.jit, static_argnames=("cfg",))
def augment_batch(
    rng: jax.Array,
    images_u8: jnp.ndarray,
    boxes: jnp.ndarray,
    labels: jnp.ndarray,
    mask: jnp.ndarray,
    cfg: AugmentConfig = AugmentConfig(),
):
    """Batched fused augment.

    Args:
      rng: PRNG key (one per step; split per image inside).
      images_u8: (B, H, W, 3) uint8 native-resolution frames.
      boxes/labels/mask: padded GT (B, M, 4)/(B, M)/(B, M).
    Returns (images (B, S, S, 3) float32 normalized, boxes, labels, mask).
    """
    keys = jax.random.split(rng, images_u8.shape[0])
    return jax.vmap(
        lambda k, i, b, l, m: _augment_one(k, i, b, l, m, cfg)
    )(keys, images_u8, boxes, labels, mask)


def yuv420_to_rgb_batch(y_u8: jnp.ndarray, uv_u8: jnp.ndarray) -> jnp.ndarray:
    """Planar YUV420 → float RGB in [0, 1], batched, on device.

    y: (B, S, S) uint8 luma; uv: (B, S/2, S/2, 2) uint8 interleaved CbCr.
    The host ships 1.5 B/px instead of 3 (native/decode_pool.cc
    dp_decode_batch_yuv420) and this reconstruction — nearest chroma
    upsample + the BT.601 full-range matrix libjpeg itself uses — fuses
    into the surrounding preprocess program, so it is free on the VPU while
    the wire carries half the bytes. JPEG chroma is 4:2:0 at the source, so
    nothing is lost relative to decoding RGB on host.
    """
    yf = y_u8.astype(jnp.float32)
    uvf = uv_u8.astype(jnp.float32) - 128.0
    uvf = jnp.repeat(jnp.repeat(uvf, 2, axis=1), 2, axis=2)
    cb, cr = uvf[..., 0], uvf[..., 1]
    r = yf + 1.402 * cr
    g = yf - 0.344136 * cb - 0.714136 * cr
    b = yf + 1.772 * cb
    return jnp.clip(jnp.stack([r, g, b], axis=-1) / 255.0, 0.0, 1.0)


@partial(jax.jit, static_argnames=("out_size", "norm_mean", "norm_std"))
def preprocess_eval_batch(
    images_u8,
    out_size: int,
    norm_mean: float = 0.5,
    norm_std: float = 0.5,
):
    """Eval/infer path: resize + normalize only (no augment), batched.

    `images_u8` is either (B, H, W, 3) uint8 RGB or a (y, uv) planar-YUV420
    tuple from the wire-efficient decode path (see yuv420_to_rgb_batch).
    If the input already arrives at (out_size, out_size) — e.g. the loader
    decoded straight to model size on host — the resize folds away and this
    is a pure normalize.
    """
    if isinstance(images_u8, (tuple, list)):
        img = yuv420_to_rgb_batch(*images_u8)
    else:
        img = images_u8.astype(jnp.float32) / 255.0
    b, h, w, c = img.shape
    if (h, w) != (out_size, out_size):
        img = jax.image.resize(
            img, (b, out_size, out_size, c), method="linear"
        )
    return (img - norm_mean) / norm_std
