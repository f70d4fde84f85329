"""Device-resident NMS backend matrix on the flagship SSD300 path.

The flagship's device-side cost splits roughly 1/3 forward : 2/3 fused
postprocess (fwd+decode+score-only runs ~2.8× the full pipeline, see
BENCH_MATRIX.md), so the NMS backend choice is the biggest device-perf
lever the framework has. This script measures the resident fori_loop rate
(tunnel-insensitive, same method as bench.py) for every backend×preselect
combo plus the forward-only ceiling, and prints ONE JSON line.

Backends (identical keep decisions, tested in tests/test_nms.py):
  pallas   — VMEM chunk kernel for the greedy suppression chain
  fixpoint — greedy recurrence solved as a matmul fixpoint (MXU passes)
  xla      — fori_loop oracle (the correctness reference)

Run: python benchmarks/bench_nms_backends.py [--batch_size 128]
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from benchmarks.common import (  # noqa: E402
    log,
    resident_infer_rate,
)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--batch_size", type=int, default=128)
    p.add_argument("--config", default="ssd_mobilenet_300")
    p.add_argument("--iters", type=int, default=50)
    p.add_argument("--combos", default="pallas:exact,pallas:approx,"
                   "fixpoint:exact,fixpoint:approx",
                   help="comma-separated nms:preselect pairs to measure")
    p.add_argument("--topks", default="200",
                   help="comma-separated per_class_topk values; each combo "
                        "is measured at every k (VERDICT r3 #1 ablation)")
    p.add_argument("--weights", choices=("artifact", "random"),
                   default="artifact",
                   help="'artifact' (default): committed trained weights + "
                        "real synthetic scenes — the sparse score "
                        "distribution deployment sees (engages the pruned "
                        "preselect). 'random' reproduces the round-3 "
                        "dense worst case.")
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    from bdd100k_tpu.utils.compilation_cache import enable_compilation_cache

    enable_compilation_cache()

    from benchmarks.common import trained_inputs
    from bdd100k_tpu.configs import get_config
    from bdd100k_tpu.data.augment import preprocess_eval_batch
    from bdd100k_tpu.models.detector import build_detector
    from bdd100k_tpu.ops.postprocess import postprocess
    from bdd100k_tpu.utils.server_warm import start_server_warm

    base_cfg = get_config(args.config)
    bundle = build_detector(base_cfg)
    warm = start_server_warm(bundle)

    variables, images = trained_inputs(
        bundle, args.config, args.batch_size, args.weights
    )
    s = base_cfg.image_size
    warm.join()
    log(f"server warm (overlapped with init): {warm.seconds:.1f}s")

    def make_infer(pp_cfg):
        def infer_fn(variables, images_u8):
            x = preprocess_eval_batch(images_u8, s)
            loc, cls = bundle.model.apply(variables, x, train=False)
            return postprocess(
                loc, cls, bundle.anchors, pp_cfg, cell_sizes=bundle.cell_sizes
            )

        return infer_fn

    results = {}

    # forward(+decode+score)-only ceiling: what the chip would do if NMS
    # were free — measured with the same loop so ratios are apples/apples
    def fwd_only(variables, images_u8):
        x = preprocess_eval_batch(images_u8, s)
        loc, cls = bundle.model.apply(variables, x, train=False)
        from bdd100k_tpu.ops.postprocess import compute_scores
        from bdd100k_tpu.ops import boxes as box_ops

        decoded = box_ops.decode_boxes(
            loc.astype(jnp.float32), bundle.anchors,
            base_cfg.postprocess.variances,
        )
        scores = compute_scores(
            cls.astype(jnp.float32), base_cfg.postprocess.score_mode
        )

        class _D:  # minimal .scores[0,0] for the loop carry
            pass

        d = _D()
        d.scores = scores[..., 0]
        return d

    rate, c = resident_infer_rate(
        fwd_only, variables, images, args.batch_size, iters=args.iters
    )
    results["fwd_decode_score_only"] = round(rate, 1)
    log(f"fwd+decode+score only: {rate:.1f} imgs/s (compile {c:.1f}s)")

    topks = [int(t) for t in args.topks.split(",")]
    for combo in args.combos.split(","):
        nms_impl, preselect = combo.strip().split(":")
        for topk in topks:
            pp_cfg = dataclasses.replace(
                base_cfg.postprocess, nms_impl=nms_impl, preselect=preselect,
                per_class_topk=topk,
            )
            t0 = time.monotonic()
            rate, c = resident_infer_rate(
                make_infer(pp_cfg), variables, images, args.batch_size,
                iters=args.iters,
            )
            key = combo if topk == 200 else f"{combo}:k{topk}"
            results[key] = round(rate, 1)
            log(f"{key}: {rate:.1f} imgs/s (compile {c:.1f}s, "
                f"total {time.monotonic() - t0:.1f}s)")

    best = max(
        (k for k in results if ":" in k), key=lambda k: results[k]
    )
    out = {
        "metric": f"{args.config} device-resident imgs/s by NMS backend",
        "value": results[best],
        "unit": "images/sec/chip",
        "vs_baseline": round(results[best] / 625.0, 4),
        "best": best,
        "batch": args.batch_size,
        "weights": args.weights,
        **results,
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
