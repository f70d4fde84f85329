"""BASELINE config 2: SSD-VGG16 512×512, batch=32 inference on a BDD100K
val shard, on-device NMS (SURVEY.md §2.5 eval stack).

End-to-end: host JPEG decode (threaded) → device preprocess → VGG16-SSD512
forward → fused decode/score/NMS; only fixed detection slots return to host.

Run: python benchmarks/bench_ssd_vgg16_512_b32.py [--images 128] [--rounds 3]
"""

from __future__ import annotations

import argparse
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from benchmarks.common import (  # noqa: E402
    TARGET_IMGS_PER_SEC_PER_CHIP,
    device_info,
    emit,
    log,
    synthetic_dataset,
)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--batch_size", type=int, default=32)
    p.add_argument("--images", type=int, default=128)
    p.add_argument("--rounds", type=int, default=3)
    p.add_argument("--num_workers", type=int, default=8)
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    from bdd100k_tpu.configs import get_config
    from bdd100k_tpu.data.augment import preprocess_eval_batch
    from bdd100k_tpu.data.pipeline import make_loader, prefetch_to_device
    from bdd100k_tpu.models.detector import build_detector

    log(f"device: {device_info()}")
    dataset = synthetic_dataset("/tmp/bdd_bench_val", args.images, split="val")
    dataset.decode_size = 512  # host decode straight to model size
    from bdd100k_tpu.data.pipeline import resolve_wire

    wire = resolve_wire(dataset=dataset)
    log(f"wire format: {wire}")
    bundle = build_detector(get_config("ssd_vgg16_512"))
    variables = bundle.init(jax.random.PRNGKey(0))

    @jax.jit
    def infer(variables, images_u8):
        images = preprocess_eval_batch(images_u8, bundle.config.image_size)
        loc, cls = bundle.model.apply(variables, images, train=False)
        return bundle.postprocess(loc, cls)

    if wire == "yuv420":
        warm = (
            jnp.zeros((args.batch_size, 512, 512), jnp.uint8),
            jnp.zeros((args.batch_size, 256, 256, 2), jnp.uint8),
        )
    else:
        warm = jnp.zeros((args.batch_size, 512, 512, 3), jnp.uint8)
    t0 = time.monotonic()
    jax.block_until_ready(infer(variables, warm))
    log(f"compile: {time.monotonic() - t0:.1f}s")

    def batches():
        for _ in range(args.rounds):
            yield from make_loader(
                dataset, args.batch_size, shuffle=False, num_epochs=1,
                num_workers=args.num_workers, wire_format=wire,
            )

    it = prefetch_to_device((b.images for b in batches()), size=3)
    det = infer(variables, next(it))  # exclude pool spin-up
    n = 0
    t0 = time.monotonic()
    for images in it:
        det = infer(variables, images)
        n += args.batch_size
    jax.block_until_ready(det)
    dt = time.monotonic() - t0
    emit(
        "ssd_vgg16_512 batch=32 eval images/sec/chip (decode->NMS)",
        n / dt,
        "images/sec/chip",
        vs_baseline=(n / dt) / TARGET_IMGS_PER_SEC_PER_CHIP,
        wire=wire,
    )


if __name__ == "__main__":
    main()
