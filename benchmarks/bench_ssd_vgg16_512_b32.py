"""BASELINE config 2: SSD-VGG16 512×512, batch=32 inference on a BDD100K
val shard, on-device NMS (SURVEY.md §2.5 eval stack).

End-to-end: host JPEG decode (threaded) → device preprocess → VGG16-SSD512
forward → fused decode/score/NMS; only fixed detection slots return to host.

Also reports the chip-capability numbers the e2e figure can't show on this
tunneled host (VERDICT r2 missing #1): device-resident throughput via ONE
dispatched fori_loop program, model GFLOPs/img from XLA cost analysis, and
MFU — VGG16 is the MXU-heavy model in the repo, so this is the headline
chip-utilization figure.

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
    CacheCounters,
    compiled_flops,
    device_info,
    emit,
    fetch_fence,
    log,
    mfu_fields,
    resident_infer_rate,
    synthetic_dataset,
)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--batch_size", type=int, default=32)
    p.add_argument("--images", type=int, default=128)
    p.add_argument("--rounds", type=int, default=3)
    p.add_argument("--num_workers", type=int, default=8)
    p.add_argument("--resident_iters", type=int, default=20)
    p.add_argument("--resident_only", action="store_true",
                   help="emit only the chip-capability (device-resident + "
                        "MFU) figures; skip the decode-bound e2e phase")
    p.add_argument("--quant", choices=("none", "int8", "int8_static"),
                   default="none",
                   help="post-training int8 for dense convs (v5e int8 MXU "
                        "= 2x the bf16 peak; VGG16 is the MXU-bound model, "
                        "so this is where int8 pays). int8_static freezes "
                        "calibrated activation scales: no per-layer amax "
                        "pass, quantize fuses into the producer")
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    from bdd100k_tpu.configs import get_config
    from bdd100k_tpu.data.augment import preprocess_eval_batch
    from bdd100k_tpu.data.pipeline import make_loader, prefetch_to_device
    from bdd100k_tpu.models.detector import build_detector

    cache = CacheCounters().install()
    log(f"device: {device_info()}")
    dataset = synthetic_dataset("/tmp/bdd_bench_val", args.images, split="val")
    dataset.decode_size = 512  # host decode straight to model size
    from bdd100k_tpu.data.pipeline import resolve_wire

    wire = resolve_wire(dataset=dataset)
    log(f"wire format: {wire}")
    cfg = get_config("ssd_vgg16_512")
    if args.quant != "none":
        import dataclasses

        cfg = dataclasses.replace(cfg, quant=args.quant)
    bundle = build_detector(cfg)
    # absorb the device server's one-time first-program setup in the
    # background (utils/server_warm.py); joined implicitly by the first
    # real dispatch, overlapped with data/init setup meanwhile
    from bdd100k_tpu.utils.server_warm import start_server_warm

    start_server_warm(bundle)

    variables = bundle.init(jax.random.PRNGKey(0))
    if args.quant == "int8_static":
        # honest scales for the timed program: calibrate on a random batch
        # (timing is data-independent; zeros scales would clip-to-zero)
        import numpy as np

        from bdd100k_tpu.models.quant import calibrate

        calib = np.random.RandomState(0).randint(
            0, 255, (args.batch_size, 512, 512, 3), np.uint8
        )
        variables = dict(variables)
        variables["quant"] = calibrate(
            bundle, variables["params"], variables.get("batch_stats", {}),
            [calib],
        )

    def infer_fn(variables, images_u8):
        images = preprocess_eval_batch(images_u8, bundle.config.image_size)
        loc, cls = bundle.model.apply(variables, images, train=False)
        return bundle.postprocess(loc, cls)

    infer = jax.jit(infer_fn)

    if wire == "yuv420":
        warm = (
            jnp.zeros((args.batch_size, 512, 512), jnp.uint8),
            jnp.zeros((args.batch_size, 256, 256, 2), jnp.uint8),
        )
    else:
        warm = jnp.zeros((args.batch_size, 512, 512, 3), jnp.uint8)
    t0 = time.monotonic()
    fetch_fence(infer(variables, warm))  # true first-run completion
    log(f"compile: {time.monotonic() - t0:.1f}s  cache {cache.fields}")

    # chip capability: FLOPs from the COMPILED program + one-dispatch
    # fori_loop resident throughput (tunnel-insensitive) → MFU
    flops_batch = compiled_flops(infer, variables, warm)
    flops_per_img = flops_batch / args.batch_size if flops_batch else None
    device_only, loop_compile_s = resident_infer_rate(
        infer_fn, variables, warm, args.batch_size,
        iters=args.resident_iters,
    )
    mfu = mfu_fields(flops_per_img, device_only)
    log(f"device-resident (b{args.batch_size}, fori_loop): "
        f"{device_only:.1f} imgs/sec  {mfu}")

    if args.resident_only:
        emit(
            "ssd_vgg16_512 device-resident images/sec/chip",
            device_only,
            "images/sec/chip",
            vs_baseline=device_only / TARGET_IMGS_PER_SEC_PER_CHIP,
            quant=args.quant,
            device_resident_batch=args.batch_size,
            **mfu,
            **cache.fields,
        )
        return

    def batches():
        for _ in range(args.rounds):
            yield from make_loader(
                dataset, args.batch_size, shuffle=False, num_epochs=1,
                num_workers=args.num_workers, wire_format=wire,
            )

    it = prefetch_to_device((b.images for b in batches()), size=3)
    fetch_fence(infer(variables, next(it)))  # exclude pool spin-up
    n = 0
    t0 = time.monotonic()
    for images in it:
        det = infer(variables, images)
        n += args.batch_size
    fetch_fence(det)  # true completion of the tail batch
    dt = time.monotonic() - t0
    emit(
        "ssd_vgg16_512 batch=32 eval images/sec/chip (decode->NMS)",
        n / dt,
        "images/sec/chip",
        vs_baseline=(n / dt) / TARGET_IMGS_PER_SEC_PER_CHIP,
        wire=wire,
        quant=args.quant,
        device_resident_imgs_per_sec=round(device_only, 1),
        device_resident_batch=args.batch_size,
        **mfu,
        **cache.fields,
    )


if __name__ == "__main__":
    main()
