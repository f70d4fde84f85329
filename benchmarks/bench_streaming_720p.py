"""BASELINE config 5: mixed-resolution streaming eval — 720p driving-video
frames with continuous batched inference (SURVEY.md §2.6 video demo;
§3.5 "continuous batching for the [B:11] stream").

Simulates a frame stream arriving one at a time at mixed resolutions
(720p/1080p/480p); frames are normalized to 720p on host (the camera/decoder
contract), accumulate into a continuous batch, and flush to the compiled
fixed-batch program when full. Reports steady-state frames/sec.

Run: python benchmarks/bench_streaming_720p.py [--frames 256] [--batch_size 8]
"""

from __future__ import annotations

import argparse
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from benchmarks.common import (  # noqa: E402
    TARGET_IMGS_PER_SEC_PER_CHIP,
    device_info,
    emit,
    log,
)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--config", default="ssd_mobilenet_300")
    p.add_argument("--frames", type=int, default=256)
    p.add_argument("--batch_size", type=int, default=8)
    args = p.parse_args()

    import jax

    from bdd100k_tpu.configs import TrainConfig, get_config
    from bdd100k_tpu.infer import Predictor
    from bdd100k_tpu.models.detector import build_detector
    from bdd100k_tpu.parallel.train_step import create_train_state

    log(f"device: {device_info()}")
    bundle = build_detector(get_config(args.config))
    # absorb the device server's one-time first-program setup in the
    # background (utils/server_warm.py); joined implicitly by the first
    # real dispatch, overlapped with data/init setup meanwhile
    from bdd100k_tpu.utils.server_warm import start_server_warm

    start_server_warm(bundle)

    state = create_train_state(bundle, TrainConfig(), jax.random.PRNGKey(0))
    predictor = Predictor(
        bundle, state, batch_size=args.batch_size, host_resize=True,
        wire="yuv420",  # half the transfer bytes again on top of host_resize
    )

    # mixed-resolution source frames, normalized to 720p on host (cheap view
    # ops) before entering the stream — the decoder-side contract
    rs = np.random.RandomState(0)
    resolutions = [(720, 1280), (1080, 1920), (480, 854)]
    src = [
        rs.randint(0, 255, r + (3,), np.uint8)
        for r in resolutions
    ]

    def frame_at(i):
        f = src[i % len(src)]
        if f.shape[:2] != (720, 1280):  # nearest-neighbor host resize
            ys = (np.arange(720) * f.shape[0] // 720).astype(np.int32)
            xs = (np.arange(1280) * f.shape[1] // 1280).astype(np.int32)
            f = f[ys][:, xs]
        return f

    # warmup / compile
    predictor(np.stack([frame_at(0)] * args.batch_size))

    # dispatch-ahead: batch k computes on device while batch k-1's
    # detections fetch — the same overlap infer.run_video uses
    pending = []
    inflight = None
    n = 0
    t0 = time.monotonic()
    for i in range(args.frames):
        pending.append(frame_at(i))
        if len(pending) >= args.batch_size:
            det, k = predictor.dispatch(np.stack(pending))
            if inflight is not None:
                predictor.fetch(*inflight)
            inflight = (det, k)
            n += k
            pending.clear()
    if pending:
        det, k = predictor.dispatch(np.stack(pending))
        if inflight is not None:
            predictor.fetch(*inflight)
        inflight = (det, k)
        n += k
    if inflight is not None:
        predictor.fetch(*inflight)
    dt = time.monotonic() - t0
    emit(
        f"{args.config} streaming 720p continuous-batch frames/sec/chip",
        n / dt,
        "frames/sec/chip",
        vs_baseline=(n / dt) / TARGET_IMGS_PER_SEC_PER_CHIP,
    )


if __name__ == "__main__":
    main()
