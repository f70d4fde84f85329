"""Shared benchmark plumbing (SURVEY.md §4.2 "Benchmark harness").

Each benchmarks/bench_*.py script measures ONE BASELINE.md config and prints
one JSON line: {"metric", "value", "unit", "vs_baseline", ...extras}.
`block_until_ready` fences around every timed region (SURVEY.md §5.1).
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

import numpy as np

# BASELINE.json:5 — ≥5000 imgs/sec end-to-end on v5e-8 ⇒ per-chip share.
TARGET_IMGS_PER_SEC_V5E8 = 5000.0
TARGET_IMGS_PER_SEC_PER_CHIP = TARGET_IMGS_PER_SEC_V5E8 / 8.0


def log(*a) -> None:
    print(*a, file=sys.stderr, flush=True)


def emit(metric: str, value: float, unit: str, vs_baseline: float, **extras):
    print(
        json.dumps(
            {
                "metric": metric,
                "value": round(float(value), 3),
                "unit": unit,
                "vs_baseline": round(float(vs_baseline), 4),
                **extras,
            }
        ),
        flush=True,
    )


def device_info() -> str:
    import jax

    from bdd100k_tpu.utils.compilation_cache import enable_compilation_cache

    enable_compilation_cache()
    d = jax.devices()[0]
    return f"{d.platform}:{getattr(d, 'device_kind', '?')} x{len(jax.devices())}"


def timed_loop(fn, iters: int, warmup: int = 2):
    """Run fn() `warmup + iters` times; returns (total_s, p50_s, times list)
    over the timed iterations, fencing with block_until_ready on fn's output.
    """
    import jax

    for _ in range(warmup):
        jax.block_until_ready(fn())
    times = []
    t_all = time.monotonic()
    for _ in range(iters):
        t0 = time.monotonic()
        jax.block_until_ready(fn())
        times.append(time.monotonic() - t0)
    total = time.monotonic() - t_all
    return total, float(np.percentile(times, 50)), times


def synthetic_dataset(root: str | Path, num_images: int, split: str = "train",
                      seed: int = 0):
    """Build (once) and open a synthetic BDD100K-format dataset."""
    from bdd100k_tpu.data.pipeline import DetectionDataset
    from bdd100k_tpu.data.synthetic import ensure_synthetic_dataset

    root = Path(root)
    labels = ensure_synthetic_dataset(
        root, num_images=num_images, seed=seed, split=split
    )
    ds = DetectionDataset.from_bdd100k(
        labels, root / "images" / split, max_boxes=100
    )
    ds.records = ds.records[:num_images]
    return ds
