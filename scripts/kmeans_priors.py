"""Fit YOLO anchor priors to a label set by k-means (1−IoU metric).

Reference-class workflow (SURVEY.md §2.2 "k-means priors"): run once over
the training labels, paste the printed tuple into a config (or pass
`--out priors.json` and load it where you build the DetectorConfig).

    python scripts/kmeans_priors.py --labels bdd100k_labels_train.json
    python scripts/kmeans_priors.py --synthetic 64        # air-gapped demo

Prints per-scale priors in the exact `DetectorConfig.yolo_priors` format
plus the mean best-IoU achieved, compared against the committed
`YOLO_BDD_PRIORS` defaults on the same boxes.
"""

from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))


def main(argv=None) -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--labels", default=None, help="BDD100K labels JSON")
    p.add_argument("--synthetic", type=int, default=0,
                   help="generate/use N synthetic images instead of --labels")
    p.add_argument("--synthetic_dir", default="/tmp/bdd_synth")
    p.add_argument("--k", type=int, default=9)
    p.add_argument("--scales", type=int, default=3)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--out", default=None, help="also write priors as JSON")
    args = p.parse_args(argv)

    from bdd100k_tpu.data.bdd100k import load_bdd100k_labels
    from bdd100k_tpu.data.priors import (
        collect_box_shapes,
        kmeans_priors,
        mean_best_iou,
        priors_to_scales,
    )

    if args.synthetic:
        from bdd100k_tpu.data.synthetic import ensure_synthetic_dataset

        labels_path = ensure_synthetic_dataset(
            args.synthetic_dir, num_images=args.synthetic, seed=0
        )
    elif args.labels:
        labels_path = args.labels
    else:
        p.error("need --labels or --synthetic N")

    records = load_bdd100k_labels(labels_path)
    wh = collect_box_shapes(records)
    print(f"{len(records)} images, {len(wh)} GT boxes")
    if len(records) < 512:
        # Measured r4 (BENCH_MATRIX "k-means priors"): a 64-image fit
        # looked better in-sample but cost 0.774→0.731 held-out YOLO
        # mAP — k·scales centroids overfit a small label sample.
        print(
            f"WARNING: only {len(records)} images — k-means priors "
            "overfit small samples (a 64-image fit regressed held-out "
            "mAP 0.774->0.731, BENCH_MATRIX.md); fit on >=512 images "
            "before shipping these priors.",
            file=sys.stderr,
        )

    centroids, fitted_iou = kmeans_priors(wh, k=args.k, seed=args.seed)
    priors = priors_to_scales(centroids, num_scales=args.scales)

    from bdd100k_tpu.ops.anchors import YOLO_BDD_PRIORS

    default_iou = mean_best_iou(wh, YOLO_BDD_PRIORS)
    print(f"mean best-IoU: fitted {fitted_iou:.4f}  "
          f"(committed YOLO_BDD_PRIORS on these boxes: {default_iou:.4f})")
    print("yolo_priors = (")
    for scale in priors:
        print(f"    {scale},")
    print(")")
    if args.out:
        Path(args.out).write_text(json.dumps(priors))
        print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
