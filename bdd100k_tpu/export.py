"""Serialized serving artifacts via jax.export (StableHLO).

The reference's deployment story is a frozen TF1 graph; the TPU-native
equivalent is a `jax.export` artifact: ONE self-contained file holding the
whole inference program — device preprocess → backbone → heads → fused
decode/score/NMS — with the checkpoint's params baked in as constants.
A server loads it with `load()` and calls it on uint8 image batches; no
model code, config, or checkpoint plumbing needed at serving time.

Multi-platform: pass `--platforms tpu,cpu` to emit an artifact that runs
on either backend. That path forces `nms_impl="fixpoint"` (pure XLA —
see ops/nms.py) because Mosaic kernels lower to TPU-only custom calls.

CLI:
    python -m bdd100k_tpu.export --config ssd_mobilenet_300 \
        --ckpt_dir /ckpts/run1 --out model.jaxexp --batch_size 8
"""

from __future__ import annotations

import argparse
import dataclasses
from pathlib import Path


def parse_args(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--config", default="ssd_mobilenet_300")
    p.add_argument("--ckpt_dir", default=None,
                   help="checkpoint to bake in (fresh init if omitted)")
    p.add_argument("--out", required=True, help="output artifact path")
    p.add_argument("--batch_size", type=int, default=8)
    p.add_argument("--score_threshold", type=float, default=None,
                   help="override the config's postprocess threshold")
    p.add_argument("--nms", choices=("auto", "xla", "pallas", "fixpoint"),
                   default="auto")
    p.add_argument("--quant", choices=("none", "int8", "int8_static"),
                   default="none",
                   help="int8_static bakes CALIBRATED activation scales "
                        "into the artifact (needs --calib_images)")
    p.add_argument("--calib_images", default=None,
                   help="int8_static: directory of images to calibrate the "
                        "frozen activation scales on (a handful of "
                        "representative frames)")
    p.add_argument("--platforms", default=None,
                   help="comma list, e.g. 'tpu,cpu' for a multi-platform "
                        "artifact (forces --nms fixpoint); default: the "
                        "current backend only")
    return p.parse_args(argv)


def build_serving_fn(bundle, variables):
    """uint8 (B, S, S, 3) images → Detections, params closed over."""
    import jax.numpy as jnp

    from bdd100k_tpu.data.augment import preprocess_eval_batch

    def serve(images_u8):
        images = preprocess_eval_batch(images_u8, bundle.config.image_size)
        loc, cls = bundle.model.apply(variables, images, train=False)
        det = bundle.postprocess(loc, cls)
        return {
            "boxes": det.boxes,
            "scores": det.scores,
            "classes": det.classes,
            "valid": det.valid,
        }

    return serve


def export_model(args) -> Path:
    import jax
    import jax.numpy as jnp
    from jax import export as jexport

    from bdd100k_tpu.configs import TrainConfig, get_config
    from bdd100k_tpu.models.detector import build_detector
    from bdd100k_tpu.parallel.train_step import create_train_state
    from bdd100k_tpu.utils.weights import restore_eval_weights

    platforms = (
        [s.strip() for s in args.platforms.split(",")]
        if args.platforms
        else None
    )
    nms = args.nms
    if (
        platforms
        and set(platforms) != {jax.default_backend()}
        and nms in ("auto", "pallas")
    ):
        # Mosaic custom calls are TPU-only AND trace-time "auto" resolves
        # against the CURRENT backend, not the export target — any target
        # set beyond exactly-this-backend needs the pure-XLA fixpoint path
        nms = "fixpoint"

    cfg = get_config(args.config)
    pp = cfg.postprocess
    if nms != "auto":
        pp = dataclasses.replace(pp, nms_impl=nms)
    if args.score_threshold is not None:
        pp = dataclasses.replace(pp, score_threshold=args.score_threshold)
    cfg = dataclasses.replace(cfg, quant=args.quant, postprocess=pp)

    bundle = build_detector(cfg)
    state = create_train_state(bundle, TrainConfig(), jax.random.PRNGKey(0))
    step = 0
    if args.ckpt_dir:
        # orbax run dir OR single-file .npz artifact, same as evaluate/infer
        state, step = restore_eval_weights(
            state, args.ckpt_dir, expect_config=cfg.name
        )
        if step == 0:
            # an empty/mistyped --ckpt_dir must not silently bake
            # fresh-init weights into a serving artifact
            raise SystemExit(f"no checkpoint found under {args.ckpt_dir}")
    variables = {"params": state.params}
    if state.batch_stats:
        variables["batch_stats"] = state.batch_stats
    if args.quant == "int8_static":
        # frozen activation scales are part of the artifact: calibrate on
        # user-supplied representative frames before baking
        if not args.calib_images:
            raise SystemExit(
                "--quant int8_static needs --calib_images (a directory of "
                "representative frames to freeze activation scales on)"
            )
        from bdd100k_tpu.models.quant import calibrate_for_driver

        # shared driver protocol (models/quant.py): ≤64 frames in 8-image
        # batches — one small compiled shape instead of a single batch-64
        # full-res forward that can exceed single-chip memory at 512px
        variables["quant"], n = calibrate_for_driver(
            bundle, state.params, state.batch_stats,
            calib_images=args.calib_images,
        )
        print(f"int8_static: calibrated act scales on {n} frames")
    # materialize on host so the params bake into the module as constants
    variables = jax.device_get(variables)

    serve = build_serving_fn(bundle, variables)
    s = cfg.image_size
    spec = jax.ShapeDtypeStruct((args.batch_size, s, s, 3), jnp.uint8)
    kw = {"platforms": platforms} if platforms else {}
    exported = jexport.export(jax.jit(serve), **kw)(spec)
    blob = exported.serialize()
    out = Path(args.out)
    out.write_bytes(blob)
    print(
        f"exported {cfg.name} step={step} batch={args.batch_size} "
        f"nms={nms} quant={args.quant} "
        f"platforms={platforms or [jax.default_backend()]} "
        f"-> {out} ({len(blob) / 1e6:.1f} MB)"
    )
    return out


def load(path: str | Path):
    """Load a serving artifact; returns `fn(images_u8) -> dict` of
    {boxes, scores, classes, valid} arrays (fixed slots, validity-masked).
    """
    import jax
    from jax import export as jexport

    exported = jexport.deserialize(Path(path).read_bytes())
    return jax.jit(exported.call)


def main(argv=None):
    return export_model(parse_args(argv))


if __name__ == "__main__":
    main()
