"""Static int8 activation-scale calibration (quant mode "int8_static").

The dynamic int8 path (models/layers.py QuantConv) pays two hidden HBM
costs per quantized layer: an fp32 amax reduction over the full activation
tensor, and a quantize kernel that cannot fuse into the producer because
its scale depends on that reduction. With a CALIBRATED per-layer scale the
quantize is pure elementwise (XLA fuses it into the producing op's
epilogue) and the reduction disappears — the activation crosses HBM once,
as int8.

Calibration is post-training and tiny: run a few representative batches
through the model with the `quant` variable collection mutable; each
QuantConv keeps a running max of its input amax. The result is a pytree of
per-layer scalars that the eval/infer/export drivers close over.

Reference parity note: the reference repo has no quantized path at all
(SURVEY.md §2 — TF1-era fp32); this is a beyond-parity TPU capability like
the dynamic int8 mode it refines.
"""

from __future__ import annotations

from typing import Iterable

import jax
import jax.numpy as jnp


def init_quant_vars(bundle):
    """Zero-initialized `quant` collection for `bundle`'s model, or None
    when the model has no static-quant layers (quant != "int8_static").

    Uses eval_shape — no compute, no device dispatch (the collection is a
    pytree of scalar f32 running maxes)."""
    size = bundle.config.image_size
    img = jax.ShapeDtypeStruct((1, size, size, 3), jnp.float32)
    shapes = jax.eval_shape(
        lambda r, im: bundle.model.init(r, im, train=False),
        jax.random.PRNGKey(0),
        img,
    )
    if "quant" not in shapes:
        return None
    return jax.tree.map(
        lambda s: jnp.zeros(s.shape, s.dtype), shapes["quant"]
    )


def calibrate(bundle, params, batch_stats, batches: Iterable):
    """Run `batches` through the model with the `quant` collection mutable
    and return the accumulated (running-max) activation scales.

    `batches` yields what the eval step accepts: preprocessed float images,
    uint8 RGB, or a planar (y, uv) YUV420 wire tuple — the same device-side
    preprocess is applied. Returns None when the model has no static-quant
    layers. One extra forward-only compile is paid here (the calibration
    program is mutable-`quant`, so it differs from the eval program)."""
    from bdd100k_tpu.data.augment import preprocess_eval_batch

    quant = init_quant_vars(bundle)
    if quant is None:
        return None

    @jax.jit
    def calib_step(quant, params, batch_stats, images):
        variables = {"params": params, "quant": quant}
        if batch_stats:
            variables["batch_stats"] = batch_stats
        if isinstance(images, (tuple, list)) or images.dtype == jnp.uint8:
            images = preprocess_eval_batch(images, bundle.config.image_size)
        _, muts = bundle.model.apply(
            variables, images, train=False, mutable=["quant"]
        )
        return muts["quant"]

    n = 0
    for images in batches:
        quant = calib_step(quant, params, batch_stats, images)
        n += 1
    if n == 0:
        raise ValueError(
            "int8_static calibration got zero batches — the frozen "
            "activation scales would all be 0"
        )
    return quant


# The one documented calibration protocol (shared by evaluate/infer/
# export): up to CALIB_MAX_IMAGES representative frames, batched at
# CALIB_BATCH so every calib_step shares one compiled shape. Scales are
# running maxes, so MORE images can only widen them (less clipping);
# measured sensitivity on the VGG512 artifact is in BENCH_MATRIX.md
# "int8_static calibration".
CALIB_BATCH = 8
CALIB_MAX_IMAGES = 64


def calibration_batches_from_dataset(
    dataset, batch_size: int = CALIB_BATCH,
    num_batches: int = CALIB_MAX_IMAGES // CALIB_BATCH,
):
    """First `num_batches` image batches of `dataset` (decoded uint8 RGB),
    without spinning up the threaded loader — calibration reads a handful
    of images once, on the caller's thread.

    A trailing partial batch is padded by repeating its last image so all
    calibration batches share ONE compiled shape (XLA CPU compiles are
    slow; a second shape would double the calibration compile cost)."""
    import numpy as np

    out = []
    n = len(dataset)
    for b in range(num_batches):
        lo = b * batch_size
        if lo >= n:
            break
        idx = list(range(lo, min(lo + batch_size, n)))
        imgs = [dataset[i]["image"] for i in idx]
        while len(imgs) < batch_size:  # pad partial tail (running max:
            imgs.append(imgs[-1])      # duplicates cannot change scales)
        out.append(np.stack(imgs))
    return out


def calibrate_for_driver(bundle, params, batch_stats, *,
                         calib_images=None, dataset=None,
                         num_batches: int = CALIB_MAX_IMAGES // CALIB_BATCH):
    """The drivers' shared int8_static calibration entry point — ONE
    protocol everywhere (evaluate/infer/export): `--calib_images <dir>` of
    representative frames when given, else the head of `dataset`, batched
    at CALIB_BATCH. Returns (quant_vars, num_images_used).

    Calibrating on the eval set's head mildly leaks eval data into the
    quant parameters; pass --calib_images (e.g. train-split frames) when
    that matters. The returned count lets callers record the protocol in
    their results."""
    if calib_images is not None:
        batches = calibration_batches_from_images(
            calib_images, bundle.config.image_size,
        )
    elif dataset is not None:
        batches = calibration_batches_from_dataset(
            dataset, num_batches=num_batches
        )
    else:
        raise SystemExit(
            "--quant int8_static needs --calib_images (a directory of "
            "representative frames to freeze activation scales on)"
        )
    quant = calibrate(bundle, params, batch_stats, batches)
    return quant, sum(b.shape[0] for b in batches)


def calibration_batches_from_images(
    image_dir, image_size: int, batch_size: int = CALIB_BATCH,
    limit: int = CALIB_MAX_IMAGES,
):
    """Calibration batches from a directory of representative frames
    (--calib_images on evaluate/infer/export): decoded, resized to the
    model input, batched at one shared shape (padded tail)."""
    import numpy as np
    from PIL import Image
    from pathlib import Path

    paths = sorted(
        p for p in Path(image_dir).iterdir()
        if p.suffix.lower() in (".jpg", ".jpeg", ".png")
    )[:limit]
    if not paths:
        raise SystemExit(f"no images under {image_dir}")
    imgs = [
        np.asarray(
            Image.open(p).convert("RGB").resize((image_size, image_size))
        )
        for p in paths
    ]
    out = []
    for lo in range(0, len(imgs), batch_size):
        chunk = imgs[lo:lo + batch_size]
        while len(chunk) < batch_size:
            chunk.append(chunk[-1])
        out.append(np.stack(chunk))
    return out
