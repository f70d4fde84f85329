"""BASELINE config 4: full BDD100K train epoch — fused augment pipeline
(crop/flip/jitter) → detector, global batch=256 DP over the mesh
(SURVEY.md §2.8: v5e-8 target; runs on whatever devices are visible).

End-to-end epoch: host JPEG decode workers → double-buffered HBM prefetch →
one pjit step per batch. Reports epoch images/sec (input-bound included).

Run: python benchmarks/bench_train_epoch_b256.py [--images 512] [--batch_size 256]
"""

from __future__ import annotations

import argparse
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from benchmarks.common import (  # noqa: E402
    TARGET_IMGS_PER_SEC_V5E8,
    device_info,
    emit,
    log,
    synthetic_dataset,
)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--config", default="ssd_mobilenet_300")
    p.add_argument("--batch_size", type=int, default=256)
    p.add_argument("--images", type=int, default=512)
    p.add_argument("--epochs", type=int, default=2, help="first epoch warms up")
    p.add_argument("--num_workers", type=int, default=16)
    p.add_argument("--decode_size", type=int, default=512,
                   help="host decode size fed to the device augment "
                        "(0 = native 720p; smaller cuts host→HBM transfer)")
    args = p.parse_args()

    import jax

    from bdd100k_tpu.configs import TrainConfig, get_config
    from bdd100k_tpu.data.augment import AugmentConfig
    from bdd100k_tpu.data.pipeline import make_loader, prefetch_to_device
    from bdd100k_tpu.models.detector import build_detector
    from bdd100k_tpu.parallel.mesh import batch_sharding, make_mesh
    from bdd100k_tpu.parallel.train_step import (
        create_train_state,
        make_train_step,
    )

    log(f"device: {device_info()}")
    det_cfg = get_config(args.config)
    cfg = TrainConfig(batch_size=args.batch_size, max_boxes=100)
    mesh = make_mesh()
    bundle = build_detector(det_cfg)
    # absorb the device server's one-time first-program setup in the
    # background (utils/server_warm.py); joined implicitly by the first
    # real dispatch, overlapped with data/init setup meanwhile
    from bdd100k_tpu.utils.server_warm import start_server_warm

    start_server_warm(bundle)

    state = create_train_state(bundle, cfg, jax.random.PRNGKey(0), mesh=mesh)
    step_fn = make_train_step(
        bundle, AugmentConfig(out_size=det_cfg.image_size), mesh=mesh
    )
    dataset = synthetic_dataset("/tmp/bdd_bench", args.images)
    dataset.decode_size = args.decode_size or None
    from bdd100k_tpu.data.pipeline import resolve_wire

    wire = resolve_wire(dataset=dataset)
    log(f"wire format: {wire}")
    rng = jax.random.PRNGKey(1)

    epoch_rates = []
    for epoch in range(args.epochs):
        loader = make_loader(
            dataset, args.batch_size, shuffle=True, seed=epoch,
            num_epochs=1, num_workers=args.num_workers, wire_format=wire,
        )
        batches = prefetch_to_device(
            loader, size=2, sharding=batch_sharding(mesh)
        )
        n = 0
        metrics = None
        t0 = time.monotonic()
        for batch in batches:
            rng, srng = jax.random.split(rng)
            state, metrics = step_fn(
                state, srng, batch.images, batch.boxes, batch.labels,
                batch.mask,
            )
            n += args.batch_size
        # fetch, not block: true completion of the tail step (block can
        # return early on a fresh executable — benchmarks.common.fetch_fence)
        float(jax.device_get(metrics["loss"]))
        dt = time.monotonic() - t0
        epoch_rates.append(n / dt)
        log(f"epoch {epoch}: {n} imgs in {dt:.1f}s = {n / dt:.1f} imgs/sec")

    steady = epoch_rates[-1]
    emit(
        f"{args.config} train epoch images/sec (decode->update, batch="
        f"{args.batch_size})",
        steady,
        "images/sec",
        vs_baseline=steady / TARGET_IMGS_PER_SEC_V5E8,
        n_devices=len(jax.devices()),
    )


if __name__ == "__main__":
    main()
