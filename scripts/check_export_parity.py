"""Assert an exported int8_static serving artifact reproduces the
in-process quantized model's detections exactly (VERDICT r3 #6: "export +
load() an int8_static artifact on TPU ... asserting detections match").

Exports with the unified driver calibration protocol (models/quant.py
calibrate_for_driver), loads the artifact back, runs both on real frames,
and asserts bit-level agreement on boxes/scores/classes/valid.

Run: python scripts/check_export_parity.py \
         [--config ssd_mobilenet_300] \
         [--ckpt artifacts/ssd_mobilenet_300_synth9k.npz] \
         [--calib_images /tmp/bdd_synth/images/train] \
         [--quant int8_static]
"""

from __future__ import annotations

import argparse
import dataclasses
import sys
import tempfile
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--config", default="ssd_mobilenet_300")
    p.add_argument("--ckpt", default="artifacts/ssd_mobilenet_300_synth9k.npz")
    p.add_argument("--calib_images", default="/tmp/bdd_synth/images/train")
    p.add_argument("--quant", choices=("none", "int8", "int8_static"),
                   default="int8_static")
    p.add_argument("--batch_size", type=int, default=4)
    args = p.parse_args()

    import jax

    from bdd100k_tpu import export as export_mod
    from bdd100k_tpu.configs import TrainConfig, get_config
    from bdd100k_tpu.models.detector import build_detector
    from bdd100k_tpu.parallel.train_step import create_train_state
    from bdd100k_tpu.utils.compilation_cache import enable_compilation_cache
    from bdd100k_tpu.utils.weights import restore_eval_weights

    enable_compilation_cache()

    out = Path(tempfile.mkdtemp()) / "artifact.jaxexp"
    export_argv = [
        "--config", args.config, "--ckpt_dir", args.ckpt,
        "--out", str(out), "--batch_size", str(args.batch_size),
        "--quant", args.quant,
    ]
    if args.quant == "int8_static":
        export_argv += ["--calib_images", args.calib_images]
    export_mod.main(export_argv)
    serve = export_mod.load(out)

    cfg = dataclasses.replace(get_config(args.config), quant=args.quant)
    bundle = build_detector(cfg)
    state = create_train_state(bundle, TrainConfig(), jax.random.PRNGKey(0))
    state, _ = restore_eval_weights(state, args.ckpt, expect_config=cfg.name)
    variables = {"params": state.params}
    if state.batch_stats:
        variables["batch_stats"] = state.batch_stats
    if args.quant == "int8_static":
        from bdd100k_tpu.models.quant import calibrate_for_driver

        variables["quant"], _ = calibrate_for_driver(
            bundle, state.params, state.batch_stats,
            calib_images=args.calib_images,
        )
    live = jax.jit(export_mod.build_serving_fn(bundle, variables))

    from PIL import Image

    s = cfg.image_size
    frames = sorted(Path(args.calib_images).glob("*.jpg"))[: args.batch_size]
    if len(frames) < args.batch_size:
        raise SystemExit(f"need {args.batch_size} frames in "
                         f"{args.calib_images}, found {len(frames)}")
    imgs = np.stack(
        [np.array(Image.open(f).convert("RGB").resize((s, s)))
         for f in frames]
    ).astype(np.uint8)

    d_art, d_live = serve(imgs), live(imgs)
    for field in ("boxes", "scores", "classes", "valid"):
        a = np.asarray(d_art[field])
        b = np.asarray(d_live[field])
        np.testing.assert_allclose(a, b, atol=1e-5, err_msg=field)
    n_det = int(np.asarray(d_art["valid"]).sum())
    print(
        f"PARITY OK: exported {args.quant} artifact == in-process model "
        f"({n_det} detections across {args.batch_size} frames)"
    )


if __name__ == "__main__":
    main()
