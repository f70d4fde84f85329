"""Benchmark harness entry (driver contract): prints ONE JSON line.

Headline metric (BASELINE.json:2): end-to-end images/sec/chip, decode→NMS,
on the flagship SSD-MobileNet-300 inference path — host JPEG decode + device
(resize/normalize → backbone → heads → fused decode/score/NMS), steady
state. Baseline target: 5000 imgs/sec on v5e-8 ⇒ 625 imgs/sec/chip
(BASELINE.json:5); vs_baseline = value / 625.

The JSON line also reports the chip-capability numbers the e2e figure can't
show on this host (single core + ~55 MB/s tunnel): device-resident
throughput at batch 128 and p50 batch=1 latency (BASELINE.md:14-16).

A stage breakdown (decode / host→device transfer / device compute, measured
in isolation) is logged to stderr so pipeline regressions are attributable.

Run: python bench.py [--batch_size 32] [--images 256] [--rounds 2]
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
    p.add_argument("--batch_size", type=int, default=32,
                   help="end-to-end phase batch size")
    p.add_argument("--device_batch_size", type=int, default=128,
                   help="device-resident phase batch size (chip capability)")
    p.add_argument("--images", type=int, default=256)
    p.add_argument("--rounds", type=int, default=2)
    p.add_argument("--num_workers", type=int, default=8)
    p.add_argument("--config", default="ssd_mobilenet_300")
    p.add_argument("--preselect", choices=("exact", "approx"), default="exact",
                   help="NMS candidate preselect; approx (TPU approx_max_k) "
                        "trades ~0.95 candidate recall for ~1.5x device "
                        "throughput")
    p.add_argument("--skip_stages", action="store_true",
                   help="skip the isolated stage-breakdown measurements")
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

    # compile warmup for all three batch shapes used below
    s = cfg.image_size
    t0 = time.monotonic()
    for b in {args.batch_size, args.device_batch_size, 1}:
        warm = jnp.zeros((b, s, s, 3), jnp.uint8)
        jax.block_until_ready(infer_step(variables, warm))
    compile_s = time.monotonic() - t0
    log(f"compile (3 shapes): {compile_s:.1f}s")

    # ---- isolated stage rates (pipeline min sets the e2e ceiling) ----
    stages = {}
    if not args.skip_stages:
        n_stage = min(args.images, 4 * args.batch_size)

        # host decode (native pool / cv2), no device involvement
        loader = make_loader(
            dataset, args.batch_size, shuffle=False, num_epochs=None,
            num_workers=args.num_workers,
        )
        host_batches = []
        next(loader)  # warm the pool
        t0 = time.monotonic()
        for _ in range(n_stage // args.batch_size):
            host_batches.append(next(loader).images)
        stages["decode_imgs_per_sec"] = round(
            n_stage / (time.monotonic() - t0), 1
        )
        loader.close()

        # host→device transfer of pre-decoded batches (tunnel-bound here)
        jax.block_until_ready(jax.device_put(host_batches[0]))
        t0 = time.monotonic()
        moved = [jax.device_put(b) for b in host_batches]
        jax.block_until_ready(moved)
        stages["transfer_imgs_per_sec"] = round(
            len(host_batches) * args.batch_size / (time.monotonic() - t0), 1
        )
        mb = host_batches[0].nbytes / 1e6
        stages["transfer_MB_per_sec"] = round(
            stages["transfer_imgs_per_sec"] / args.batch_size * mb, 1
        )

        # device compute at the e2e batch size (input already in HBM)
        t0 = time.monotonic()
        det = None
        for b in moved:
            det = infer_step(variables, b)
        jax.block_until_ready(det)
        stages["device_imgs_per_sec"] = round(
            len(moved) * args.batch_size / (time.monotonic() - t0), 1
        )
        log(f"stage rates: {stages}")
        del host_batches, moved

    # ---- steady-state end-to-end decode→NMS ----
    # Host decode workers run ahead, the double-buffered prefetcher overlaps
    # host→HBM transfer with device compute, and dispatch runs one batch
    # behind so the device never idles.
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
    log(f"e2e: {n_total} images in {dt:.2f}s → {imgs_per_sec:.1f} imgs/s")

    # ---- device-resident throughput at the chip's best batch size ----
    resident = jnp.zeros((args.device_batch_size, s, s, 3), jnp.uint8)
    jax.block_until_ready(infer_step(variables, resident))
    t0 = time.monotonic()
    for _ in range(10):
        det = infer_step(variables, resident)
    jax.block_until_ready(det)
    device_only = 10 * args.device_batch_size / (time.monotonic() - t0)
    log(f"device-resident (b{args.device_batch_size}): {device_only:.1f} imgs/sec")

    # ---- p50 batch=1 latency, device-resident input ----
    one = jnp.zeros((1, s, s, 3), jnp.uint8)
    jax.block_until_ready(infer_step(variables, one))
    lat = []
    for _ in range(50):
        t0 = time.monotonic()
        jax.block_until_ready(infer_step(variables, one))
        lat.append((time.monotonic() - t0) * 1e3)
    p50_ms = float(np.percentile(lat, 50))
    log(f"p50 batch=1: {p50_ms:.2f} ms")

    baseline_per_chip = 5000.0 / 8.0
    out = {
        "metric": "ssd_mobilenet_300 end-to-end images/sec/chip (decode->NMS)",
        "value": round(imgs_per_sec, 2),
        "unit": "images/sec/chip",
        "vs_baseline": round(imgs_per_sec / baseline_per_chip, 4),
        "device_resident_imgs_per_sec": round(device_only, 2),
        "device_resident_batch": args.device_batch_size,
        "p50_batch1_ms": round(p50_ms, 2),
        "compile_s": round(compile_s, 1),
        "note": "e2e bound by single-core host decode + tunneled "
                "host-to-device link on this box",
    }
    out.update(stages)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
