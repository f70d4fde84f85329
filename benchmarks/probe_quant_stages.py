"""Where does the int8 gap live? (VERDICT r3 missing #4)

int8_static removed dynamic int8's per-layer amax pass and measured 722.5
imgs/s / 63.6% of the bf16 peak on VGG512-b32 — i.e. ~32% of the int8 MXU
peak. This probe attributes the residual: resident rates for progressively
longer prefixes of the eval program —

    pre      : uint8 → normalized float preprocess only
    backbone : + VGG16 conv stack (the quantized bulk)
    fwd      : + extra pyramid stages + multibox heads (full forward)
    full     : + fused postprocess

— for each --quant mode, so the bf16/int8/int8_static deltas land on the
stage that actually causes them.

Run: python benchmarks/probe_quant_stages.py [--config ssd_vgg16_512]
     [--batch_size 32] [--quants none,int8,int8_static]
"""

from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from benchmarks.common import log, resident_infer_rate  # noqa: E402


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--config", default="ssd_vgg16_512")
    p.add_argument("--batch_size", type=int, default=32)
    p.add_argument("--iters", type=int, default=30)
    p.add_argument("--quants", default="none,int8,int8_static")
    args = p.parse_args()

    import dataclasses

    import jax
    import jax.numpy as jnp
    import numpy as np

    from bdd100k_tpu.utils.compilation_cache import enable_compilation_cache

    enable_compilation_cache()

    from bdd100k_tpu.configs import get_config
    from bdd100k_tpu.data.augment import preprocess_eval_batch
    from bdd100k_tpu.models.detector import build_detector
    from bdd100k_tpu.utils.server_warm import start_server_warm

    base_cfg = get_config(args.config)
    s = base_cfg.image_size
    images = jnp.asarray(
        np.random.RandomState(1).randint(
            0, 255, (args.batch_size, s, s, 3), np.uint8
        )
    )

    class _D:  # .scores[0,0] carry hook for resident_infer_rate
        pass

    out = {"metric": "quant stage attribution (resident, us/img)",
           "config": args.config, "batch": args.batch_size, "modes": {}}
    warmed = False
    for quant in args.quants.split(","):
        cfg = dataclasses.replace(base_cfg, quant=quant)
        bundle = build_detector(cfg)
        if not warmed:
            start_server_warm(bundle).join()
            warmed = True
        variables = bundle.init(jax.random.PRNGKey(0))
        if quant == "int8_static":
            from bdd100k_tpu.models.quant import calibrate

            variables = dict(variables)
            variables["quant"] = calibrate(
                bundle, variables["params"], variables.get("batch_stats"),
                [np.asarray(images[:8])],
            )

        def make_stage(stop, bundle=bundle, quant=quant):
            def infer_fn(variables, images_u8):
                x = preprocess_eval_batch(images_u8, s)
                if stop == "pre":
                    d = _D()
                    d.scores = jnp.sum(x, axis=(1, 2, 3))[:, None]
                    return d
                if stop == "backbone":
                    sub = {"params": variables["params"]["backbone"]}
                    if "batch_stats" in variables and variables[
                        "batch_stats"
                    ].get("backbone"):
                        sub["batch_stats"] = variables["batch_stats"][
                            "backbone"
                        ]
                    if "quant" in variables and variables["quant"].get(
                        "backbone"
                    ):
                        sub["quant"] = variables["quant"]["backbone"]
                    taps = bundle.model.backbone.apply(
                        sub, x, False
                    )
                    d = _D()
                    # full reductions: no tap can be sliced/DCE'd away
                    d.scores = sum(
                        jnp.sum(t.astype(jnp.float32), axis=(1, 2, 3))
                        for t in taps
                    )[:, None]
                    return d
                loc, cls = bundle.model.apply(variables, x, train=False)
                if stop == "fwd":
                    d = _D()
                    d.scores = (
                        jnp.sum(loc.astype(jnp.float32), axis=(1, 2))
                        + jnp.sum(cls.astype(jnp.float32), axis=(1, 2))
                    )[:, None]
                    return d
                return bundle.postprocess(loc, cls)

            return infer_fn

        rates = {}
        for stage in ("pre", "backbone", "fwd", "full"):
            rate, c = resident_infer_rate(
                make_stage(stage), variables, images, args.batch_size,
                iters=args.iters,
            )
            rates[stage] = rate
            log(f"{quant} {stage}: {rate:.1f} imgs/s (compile {c:.1f}s)")
        us = {k: 1e6 / v for k, v in rates.items()}
        out["modes"][quant] = {
            "rate_full": round(rates["full"], 1),
            "us_pre": round(us["pre"], 1),
            "us_backbone": round(us["backbone"] - us["pre"], 1),
            "us_heads": round(us["fwd"] - us["backbone"], 1),
            "us_postprocess": round(us["full"] - us["fwd"], 1),
            "us_total": round(us["full"], 1),
        }
        log(f"{quant}: {out['modes'][quant]}")
    print(json.dumps(out))


if __name__ == "__main__":
    main()
