"""Benchmark harness entry (driver contract): prints ONE JSON line.

Headline metric (BASELINE.json:2): end-to-end images/sec/chip, decode→NMS,
on the flagship SSD-MobileNet-300 inference path — host JPEG decode + device
(resize/normalize → backbone → heads → fused decode/score/NMS), steady
state. Baseline target: 5000 imgs/sec on v5e-8 ⇒ 625 imgs/sec/chip
(BASELINE.json:5); vs_baseline = value / 625.

Run: python bench.py [--batch_size 32] [--images 64] [--rounds 5]
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

import numpy as np


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--batch_size", type=int, default=32)
    p.add_argument("--images", type=int, default=64)
    p.add_argument("--rounds", type=int, default=5)
    p.add_argument("--num_workers", type=int, default=8)
    p.add_argument("--config", default="ssd_mobilenet_300")
    p.add_argument("--preselect", choices=("exact", "approx"), default="exact",
                   help="NMS candidate preselect; approx (TPU approx_max_k) "
                        "trades ~0.95 candidate recall for ~1.5x device "
                        "throughput")
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    from bdd100k_tpu.utils.compilation_cache import enable_compilation_cache

    enable_compilation_cache()

    from bdd100k_tpu.configs import get_config
    from bdd100k_tpu.data.augment import preprocess_eval_batch
    from bdd100k_tpu.data.pipeline import (
        DetectionDataset,
        make_loader,
        prefetch_to_device,
    )
    from bdd100k_tpu.data.synthetic import ensure_synthetic_dataset
    from bdd100k_tpu.models.detector import build_detector

    dev = jax.devices()[0]
    log(f"device: {dev.platform} {getattr(dev, 'device_kind', '?')}")

    cfg = get_config(args.config)
    if args.preselect != "exact":
        import dataclasses

        cfg = dataclasses.replace(
            cfg,
            postprocess=dataclasses.replace(
                cfg.postprocess, preselect=args.preselect
            ),
        )
    root = Path("/tmp/bdd_bench")
    labels = ensure_synthetic_dataset(root, num_images=args.images, seed=0)
    # decode straight to model size on host (DCT-domain downscale): same
    # host-side resize placement as the reference pipeline, ~10× less
    # host→HBM transfer than shipping 720p frames the device would resize.
    dataset = DetectionDataset.from_bdd100k(
        labels, root / "images" / "train", max_boxes=100,
        decode_size=cfg.image_size,
    )
    dataset.records = dataset.records[: args.images]

    bundle = build_detector(cfg)
    variables = bundle.init(jax.random.PRNGKey(0))

    @jax.jit
    def infer_step(variables, images_u8):
        images = preprocess_eval_batch(images_u8, bundle.config.image_size)
        loc, cls = bundle.model.apply(variables, images, train=False)
        return bundle.postprocess(loc, cls)

    # compile warmup
    s = cfg.image_size
    warm = np.zeros((args.batch_size, s, s, 3), np.uint8)
    t0 = time.monotonic()
    jax.block_until_ready(infer_step(variables, jnp.asarray(warm)))
    log(f"compile: {time.monotonic() - t0:.1f}s")

    # steady-state decode→NMS: host decode workers run ahead, the double-
    # buffered prefetcher overlaps host→HBM transfer with device compute,
    # and results are fetched one batch behind so the device never idles.
    def batches():
        for _ in range(args.rounds):
            yield from make_loader(
                dataset, args.batch_size, shuffle=False, num_epochs=1,
                num_workers=args.num_workers,
            )

    n_total = 0
    t0 = time.monotonic()
    det = None
    for batch in prefetch_to_device(
        (b.images for b in batches()), size=2
    ):
        det = infer_step(variables, batch)
        n_total += args.batch_size
    jax.block_until_ready(det)
    dt = time.monotonic() - t0
    imgs_per_sec = n_total / dt
    log(f"{n_total} images in {dt:.2f}s")

    # device-resident throughput (preprocess→fwd→NMS with input already in
    # HBM) — separates the chip's capability from this host's decode/link
    resident = jax.device_put(warm)
    jax.block_until_ready(infer_step(variables, resident))
    t0 = time.monotonic()
    for _ in range(10):
        det = infer_step(variables, resident)
    jax.block_until_ready(det)
    device_only = 10 * args.batch_size / (time.monotonic() - t0)
    log(f"device-resident: {device_only:.1f} imgs/sec")

    baseline_per_chip = 5000.0 / 8.0
    print(
        json.dumps(
            {
                "metric": "ssd_mobilenet_300 end-to-end images/sec/chip (decode->NMS)",
                "value": round(imgs_per_sec, 2),
                "unit": "images/sec/chip",
                "vs_baseline": round(imgs_per_sec / baseline_per_chip, 4),
                "device_resident_imgs_per_sec": round(device_only, 2),
                "note": "end-to-end bound by single-core host decode + "
                        "tunneled host-to-device link on this box",
            }
        )
    )


if __name__ == "__main__":
    main()
