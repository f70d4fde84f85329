"""Dataset preparation CLI: BDD100K labels JSON + JPEGs → record shards.

The reference's one-shot conversion step (SURVEY.md §3.4: labels json →
sharded records) as a command, wrapping data/records.py:

    python scripts/prepare_bdd100k.py \\
        --labels bdd100k/labels/det_20/det_train.json \\
        --image_dir bdd100k/images/100k/train \\
        --out_dir /data/bdd_train_ar [--format arrayrecord|tfrecord]

ArrayRecord (grain's random-access native format) is the plan-of-record;
--format tfrecord emits tf.train.Example shards for interop with
reference-era TFRecord corpora. Conversion is host-only and never touches
the TPU.
"""

from __future__ import annotations

import argparse
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))


def main(argv=None) -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--labels", required=True,
                   help="BDD100K detection labels JSON")
    p.add_argument("--image_dir", required=True)
    p.add_argument("--out_dir", required=True)
    p.add_argument("--format", choices=("arrayrecord", "tfrecord"),
                   default="arrayrecord")
    p.add_argument("--shard_size", type=int, default=1024)
    args = p.parse_args(argv)

    # host-only task: keep jax (pre-imported by sitecustomize on this box)
    # off the TPU tunnel — only while the backend is still undecided (it
    # freezes at first jax.devices(); in-process callers may already have
    # one, and conversion never dispatches to a device anyway)
    import jax
    import jax._src.xla_bridge as xb

    if not getattr(xb, "_backends", None):
        jax.config.update("jax_platforms", "cpu")

    from bdd100k_tpu.data.records import (
        convert_bdd100k_to_arrayrecord,
        convert_bdd100k_to_tfrecord,
    )

    convert = (
        convert_bdd100k_to_arrayrecord
        if args.format == "arrayrecord"
        else convert_bdd100k_to_tfrecord
    )
    t0 = time.monotonic()
    paths = convert(
        args.labels, args.image_dir, args.out_dir,
        shard_size=args.shard_size,
    )
    dt = time.monotonic() - t0
    total = sum(p.stat().st_size for p in paths)
    print(
        f"wrote {len(paths)} {args.format} shard(s), "
        f"{total / 1e6:.1f} MB in {dt:.1f}s → {args.out_dir}"
    )


if __name__ == "__main__":
    main()
