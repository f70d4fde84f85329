"""Spatial partitioning: one image's convs across the whole mesh (§5.7).

The CNN analog of sequence/context parallelism. The reference repo is a
single-GPU detector with no sequence dimension, so SURVEY.md §5.7 records
the honest TPU equivalent instead: shard the image HEIGHT dim over a mesh
axis so a single frame's convolutions run on all chips at once. This is
the latency-scaling mode — batch=1 full-frame inference (the BASELINE
720p streaming config) where data parallelism cannot help because only
one image is in flight.

The TPU-native implementation is pure sharding annotation, not manual
stencil code: the SAME flax forward is jitted with the input's H dim
mapped to a mesh axis, and XLA's SPMD partitioner (GSPMD) derives the
halo exchanges — every 3×3 conv needs its neighbour shard's boundary
row, which the compiler materializes as collective-permutes riding ICI.
Writing those halos by hand (the shard_map + ppermute form) would
duplicate what the partitioner already proves correct for every window
shape, stride, and dilation in the net; annotate-and-let-XLA-partition
is the entire design, per the scaling-book recipe.

Head outputs are tiny ((N, A, 4) + (N, A, C+1) ≈ a few hundred KB), so
the fused postprocess (decode → score → class-wise NMS) runs replicated:
the compiler inserts one all-gather at the reshape off the feature maps
and the NMS proceeds exactly as in the single-chip program.
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from bdd100k_tpu.models.detector import DetectorBundle


def spatial_sharding(mesh: Mesh, axis: str = "data") -> NamedSharding:
    """NHWC images with H split over `axis` — rows 0..H/n-1 on shard 0, …"""
    return NamedSharding(mesh, P(None, axis, None, None))


def make_spatial_infer_fn(
    bundle: DetectorBundle,
    mesh: Mesh,
    axis: str = "data",
    norm_mean: float = 0.5,
    norm_std: float = 0.5,
) -> Callable:
    """fn(params, batch_stats, images) -> Detections, H-sharded over `axis`.

    `images` is (N, S, S, 3) uint8 or pre-normalized float at the model's
    input size S (S must divide by the mesh axis; resize happens upstream —
    a resize here would gather rows across shards and defeat the layout).
    Normalization is elementwise, so it runs shard-local; the backbone's
    convs are partitioned by GSPMD with automatic halo exchange.
    """
    size = bundle.config.image_size
    n_shards = mesh.shape[axis]
    if size % n_shards != 0:
        raise ValueError(
            f"image size {size} not divisible by mesh axis "
            f"{axis!r}={n_shards}; pick a mesh the input tiles over"
        )

    def fn(params, batch_stats, images):
        variables = {"params": params}
        if batch_stats:
            variables["batch_stats"] = batch_stats
        if images.dtype == jnp.uint8:
            images = images.astype(jnp.float32) / 255.0
            images = (images - norm_mean) / norm_std
        assert images.shape[1] == size and images.shape[2] == size, (
            f"spatial infer needs pre-resized {size}×{size} input, got "
            f"{images.shape}"
        )
        loc, cls = bundle.model.apply(variables, images, train=False)
        return bundle.postprocess(loc, cls)

    repl = NamedSharding(mesh, P())
    return jax.jit(
        fn,
        in_shardings=(repl, repl, spatial_sharding(mesh, axis)),
        out_shardings=repl,
    )
