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


def calibration_batches_from_dataset(
    dataset, batch_size: int, num_batches: int
):
    """First `num_batches` image batches of `dataset` (decoded uint8 RGB),
    without spinning up the threaded loader — calibration reads a handful
    of images once, on the caller's thread."""
    import numpy as np

    out = []
    n = len(dataset)
    for b in range(num_batches):
        lo = b * batch_size
        if lo >= n:
            break
        idx = range(lo, min(lo + batch_size, n))
        out.append(np.stack([dataset[i]["image"] for i in idx]))
    return out
