"""per_class_topk / prune_m / preselect mAP ablation on the committed
trained artifacts (VERDICT r3 #1: "ablate per_class_topk 200→100→50 with
mAP deltas on all three committed artifacts").

One forward pass per model over the 64 held-out seed-1 val scenes; each
postprocess variant re-runs only decode→score→NMS on the cached logits,
so the whole matrix costs minutes, not an eval per cell.

Run: python scripts/ablate_postprocess.py [--configs ssd_mobilenet_300,...]
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--configs", default="ssd_mobilenet_300,"
                   "yolo_mobilenet_384,ssd_vgg16_512")
    p.add_argument("--topks", default="200,100,50")
    p.add_argument("--num_images", type=int, default=64)
    p.add_argument("--batch_size", type=int, default=16)
    args = p.parse_args(argv)

    import jax
    import jax.numpy as jnp
    import numpy as np

    from bdd100k_tpu.utils.compilation_cache import enable_compilation_cache

    enable_compilation_cache()

    from benchmarks.common import synthetic_dataset, trained_inputs
    from bdd100k_tpu.configs import get_config
    from bdd100k_tpu.data.augment import preprocess_eval_batch
    from bdd100k_tpu.models.detector import build_detector
    from bdd100k_tpu.ops.map_metric import DetectionEvaluator
    from bdd100k_tpu.ops.postprocess import postprocess

    out = {}
    for config_name in args.configs.split(","):
        cfg = get_config(config_name)
        bundle = build_detector(cfg)
        variables, _ = trained_inputs(bundle, config_name, 1)

        ds = synthetic_dataset("/tmp/bdd_synth_val", args.num_images,
                               split="val", seed=1)
        ds.decode_size = cfg.image_size

        fwd = jax.jit(
            lambda v, x: bundle.model.apply(
                v, preprocess_eval_batch(x, cfg.image_size), train=False
            )
        )
        batches = []
        for start in range(0, args.num_images, args.batch_size):
            idxs = range(start, min(start + args.batch_size,
                                    args.num_images))
            recs = [ds[i] for i in idxs]
            imgs = jnp.asarray(np.stack([r["image"] for r in recs]))
            loc, cls = fwd(variables, imgs)
            batches.append((jax.device_get(loc), jax.device_get(cls), recs))

        variants = [("exact", 0)] + [
            (pre, m)
            for pre in ("exact", "approx")
            for m in (2048,)
        ]
        results = {}
        for topk in (int(t) for t in args.topks.split(",")):
            for pre, m in variants:
                pp = dataclasses.replace(
                    cfg.postprocess, per_class_topk=topk, preselect=pre,
                    prune_m=m,
                    nms_impl="pallas" if jax.default_backend() == "tpu"
                    else "fixpoint",
                )
                ev = DetectionEvaluator(num_classes=10)
                pf = jax.jit(
                    lambda l, c, pp=pp: postprocess(
                        jnp.asarray(l), jnp.asarray(c), bundle.anchors, pp,
                        cell_sizes=bundle.cell_sizes,
                    )
                )
                for loc, cls, recs in batches:
                    det = jax.device_get(pf(loc, cls))
                    for i, r in enumerate(recs):
                        gt = r["boxes"][r["mask"]]
                        # labels are already 1-based (0 = background),
                        # matching Detections.classes
                        gl = r["labels"][r["mask"]]
                        ev.add_image(
                            det.boxes[i][det.valid[i]],
                            det.scores[i][det.valid[i]],
                            det.classes[i][det.valid[i]],
                            gt, gl,
                        )
                key = f"k{topk}.{pre}" + (".dense" if m == 0 else "")
                results[key] = round(ev.compute()["mAP"], 4)
                print(f"{config_name} {key}: mAP {results[key]}",
                      file=sys.stderr)
        out[config_name] = results
    print(json.dumps(out))


if __name__ == "__main__":
    main()
