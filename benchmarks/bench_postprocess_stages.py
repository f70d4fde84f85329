"""Per-stage attribution of the fused postprocess (device-resident).

The flagship's device time is dominated by postprocess (BENCH_MATRIX.md
"NMS backend matrix"), so this script measures the resident rate of
progressively longer prefixes of the pipeline —

  fwd       : preprocess + model forward + box decode + scoring
  preselect : + per-class top-k candidate preselection
  suppress  : + greedy suppression (Pallas kernel)
  full      : + cross-class finalize (the shipped postprocess)

— and prints the per-stage µs/img deltas, at each requested
`per_class_topk`. Same fori_loop residency method as bench.py
(tunnel-insensitive; one dispatch, one scalar fetch).

Run: python benchmarks/bench_postprocess_stages.py [--topks 200,100,64]
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
    p.add_argument("--batch_size", type=int, default=128)
    p.add_argument("--config", default="ssd_mobilenet_300")
    p.add_argument("--iters", type=int, default=50)
    p.add_argument("--topks", default="200")
    p.add_argument("--preselect", default="exact")
    p.add_argument("--prune_m", type=int, default=None,
                   help="override PostprocessConfig.prune_m (0 = dense)")
    p.add_argument("--weights", choices=("artifact", "random"),
                   default="artifact")
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    from bdd100k_tpu.utils.compilation_cache import enable_compilation_cache

    enable_compilation_cache()

    from bdd100k_tpu.configs import get_config
    from bdd100k_tpu.data.augment import preprocess_eval_batch
    from bdd100k_tpu.models.detector import build_detector
    from bdd100k_tpu.ops import boxes as box_ops
    from bdd100k_tpu.ops.nms import (
        _finalize_detections,
        _preselect_candidates,
    )
    from bdd100k_tpu.ops.pallas_nms import pallas_greedy_suppress
    from bdd100k_tpu.ops.postprocess import compute_scores
    from bdd100k_tpu.utils.server_warm import start_server_warm

    from benchmarks.common import trained_inputs

    base_cfg = get_config(args.config)
    pp = base_cfg.postprocess
    if args.prune_m is not None:
        import dataclasses

        pp = dataclasses.replace(pp, prune_m=args.prune_m)
    bundle = build_detector(base_cfg)
    warm = start_server_warm(bundle)
    variables, images = trained_inputs(
        bundle, args.config, args.batch_size, args.weights
    )
    s = base_cfg.image_size
    warm.join()

    class _D:  # minimal .scores[0,0] carry hook for resident_infer_rate
        pass

    def make_stage(stop: str, topk: int):
        def infer_fn(variables, images_u8):
            x = preprocess_eval_batch(images_u8, s)
            loc, cls = bundle.model.apply(variables, x, train=False)
            decoded = box_ops.clip_boxes(box_ops.decode_boxes(
                loc.astype(jnp.float32), bundle.anchors, pp.variances
            ))
            scores = compute_scores(cls.astype(jnp.float32), pp.score_mode)
            if stop == "fwd":
                d = _D()
                d.scores = scores[..., 0]
                return d
            cand_boxes, top_scores, valid = _preselect_candidates(
                decoded, scores, pp.score_threshold, topk, args.preselect,
                pp.prune_m,
            )
            if stop == "preselect":
                d = _D()
                # consume boxes too so the gather isn't dead-code-eliminated
                d.scores = top_scores[..., 0] + cand_boxes[..., 0, 0]
                return d
            keep = pallas_greedy_suppress(cand_boxes, valid, pp.iou_threshold)
            if stop == "suppress":
                d = _D()
                d.scores = (
                    top_scores[..., 0]
                    + keep[..., 0].astype(jnp.float32)
                    + cand_boxes[..., 0, 0]
                )
                return d
            return _finalize_detections(
                cand_boxes, top_scores, keep, pp.max_detections
            )

        return infer_fn

    out = {"metric": "postprocess stage attribution (resident, us/img)",
           "batch": args.batch_size, "preselect": args.preselect,
           "prune_m": pp.prune_m, "weights": args.weights,
           "stages": {}}
    for topk in (int(t) for t in args.topks.split(",")):
        rates = {}
        for stage in ("fwd", "preselect", "suppress", "full"):
            rate, c = resident_infer_rate(
                make_stage(stage, topk), variables, images,
                args.batch_size, iters=args.iters,
            )
            rates[stage] = rate
            log(f"k={topk} {stage}: {rate:.1f} imgs/s (compile {c:.1f}s)")
        us = {k: 1e6 / v for k, v in rates.items()}
        out["stages"][str(topk)] = {
            "rate_full": round(rates["full"], 1),
            "us_fwd": round(us["fwd"], 1),
            "us_preselect": round(us["preselect"] - us["fwd"], 1),
            "us_suppress": round(us["suppress"] - us["preselect"], 1),
            "us_finalize": round(us["full"] - us["suppress"], 1),
            "us_total": round(us["full"], 1),
        }
        log(f"k={topk}: {out['stages'][str(topk)]}")
    out["value"] = out["stages"][args.topks.split(",")[0]]["rate_full"]
    out["unit"] = "images/sec/chip"
    print(json.dumps(out))


if __name__ == "__main__":
    main()
