"""Run every BASELINE.md benchmark config in sequence; one JSON line each
(SURVEY.md §4.2 "Benchmark harness"). Subprocess-per-bench so compiled
programs and device memory don't accumulate across configs.

Run: python benchmarks/run_all.py [--quick]
"""

from __future__ import annotations

import argparse
import subprocess
import sys
from pathlib import Path

BENCHES = [
    ("bench_ssd_mobilenet_300_b1.py", ["--iters", "20"]),
    ("bench_ssd_vgg16_512_b32.py", ["--images", "64", "--rounds", "2"]),
    ("bench_yolo_train_b64.py", ["--iters", "5"]),
    ("bench_train_epoch_b256.py", ["--images", "256", "--batch_size", "64"]),
    ("bench_streaming_720p.py", ["--frames", "128"]),
]

FULL = {
    "bench_ssd_mobilenet_300_b1.py": ["--iters", "100"],
    "bench_ssd_vgg16_512_b32.py": ["--images", "256", "--rounds", "3"],
    "bench_yolo_train_b64.py": ["--iters", "20"],
    "bench_train_epoch_b256.py": ["--images", "1024", "--batch_size", "256"],
    "bench_streaming_720p.py": ["--frames", "512"],
}


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--quick", action="store_true")
    args = p.parse_args()

    here = Path(__file__).resolve().parent
    failures = 0
    for script, quick_args in BENCHES:
        extra = quick_args if args.quick else FULL[script]
        print(f"--- {script} {' '.join(extra)}", file=sys.stderr, flush=True)
        r = subprocess.run(
            [sys.executable, str(here / script), *extra],
            cwd=here.parent,
        )
        failures += r.returncode != 0
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
