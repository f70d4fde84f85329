"""Benchmark harness entry (driver contract): prints ONE JSON line.

Headline metric (BASELINE.json:2): end-to-end images/sec/chip, decode→NMS,
on the flagship SSD-MobileNet-300 inference path — host JPEG decode + device
(resize/normalize → backbone → heads → fused decode/score/NMS), steady
state. Baseline target: 5000 imgs/sec on v5e-8 ⇒ 625 imgs/sec/chip
(BASELINE.json:5); vs_baseline = value / 625.

The JSON line also reports the chip-capability numbers the e2e figure can't
show on this host (single core + ~55 MB/s tunnel):

  * device-resident throughput via ONE dispatched fori_loop program
    (tunnel-insensitive — per-dispatch latency cannot smear it), at the
    SHIPPED operating point (committed trained artifact + real val
    scenes; the pruned preselect is score-distribution-dependent) plus a
    random-init `device_resident_worstcase`,
  * model GFLOPs/img from XLA cost analysis and the resulting MFU,
  * p50 batch=1 latency, dispatched AND on-chip (one fori_loop dispatch),
  * a projected production-host e2e (per-core decode rate × a v5e-8
    host's 14 cores/chip vs the chip rate) so the BASELINE 5000/s target
    is a calculation rather than an extrapolation shrug,
  * persistent-cache hit/miss counts + per-shape compile seconds, so a
    large compile_s is attributable (recompilation vs device-server
    program load).

A stage breakdown (host decode steady state; tunnel pipeline = host→device
wire + device compute overlapped) is logged to stderr and included in the
JSON so pipeline regressions are attributable to a stage, each with its
system cpu-busy share. Because decode and the out-of-process tunnel proxy
contend for this host's ONE core, the e2e ceiling is the cpu-contention
one (ncores / Σ core-seconds per image), not min(stage); the JSON reports
e2e against both.

Run: python bench.py [--batch_size 32] [--images 384] [--rounds 3]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent))

from benchmarks.common import (  # noqa: E402
    CacheCounters,
    compiled_flops,
    fetch_fence,
    mfu_fields,
    resident_infer_rate,
)


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--batch_size", type=int, default=32,
                   help="end-to-end phase batch size")
    p.add_argument("--device_batch_size", type=int, default=128,
                   help="device-resident phase batch size (chip capability)")
    # enough batches that the steady-state e2e rate isn't inflated by the
    # ~7 batches the decode-ahead queues pre-fill during compile/warmup
    p.add_argument("--images", type=int, default=384)
    p.add_argument("--rounds", type=int, default=3)
    p.add_argument("--num_workers", type=int, default=8)
    p.add_argument("--e2e_workers", type=int, default=2,
                   help="decode workers for the END-TO-END phase. Default 2, "
                        "NOT num_workers: on this one-core host the tunnel "
                        "proxy is an external process needing ~0.7 core, and "
                        "a deeper decode pool starves it (measured: e2e is "
                        "~186 imgs/s stable at 2 workers vs 143-183 "
                        "fluctuating at 8). The isolated decode stage keeps "
                        "num_workers to report the pool's own capability")
    p.add_argument("--config", default="ssd_mobilenet_300")
    p.add_argument("--preselect", choices=("exact", "approx"), default="exact",
                   help="NMS candidate preselect; approx (TPU approx_max_k) "
                        "trades ~0.95 candidate recall for ~1.5x device "
                        "throughput")
    p.add_argument("--nms", choices=("auto", "xla", "pallas", "fixpoint"),
                   default="auto",
                   help="NMS backend (identical keep decisions in all; "
                        "see PostprocessConfig.nms_impl)")
    p.add_argument("--quant", choices=("none", "int8", "int8_static"),
                   default="none",
                   help="post-training int8 for dense convs (v5e int8 MXU "
                        "path); int8_static freezes activation scales via "
                        "the shared calibration protocol (models/quant.py) "
                        "— no per-layer amax pass in the compiled program")
    p.add_argument("--skip_stages", action="store_true",
                   help="skip the isolated stage-breakdown measurements")
    p.add_argument("--wire", choices=("auto", "rgb", "yuv420"), default="auto",
                   help="host->device wire format; yuv420 ships planar "
                        "Y + 2x2-subsampled CbCr (half the bytes of RGB, "
                        "reconstructed in the fused device preprocess). "
                        "auto = yuv420 when the native decode pool is built")
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    from bdd100k_tpu.utils.compilation_cache import enable_compilation_cache

    enable_compilation_cache()
    cache = CacheCounters().install()  # before any compile

    from bdd100k_tpu.configs import get_config
    from bdd100k_tpu.data.augment import preprocess_eval_batch
    from bdd100k_tpu.data.pipeline import (
        DetectionDataset,
        make_loader,
        prefetch_to_device,
    )
    from bdd100k_tpu.data.synthetic import ensure_synthetic_dataset
    from bdd100k_tpu.models.detector import build_detector

    dev = jax.devices()[0]
    log(f"device: {dev.platform} {getattr(dev, 'device_kind', '?')}")

    cfg = get_config(args.config)
    if args.preselect != "exact" or args.nms != "auto" or args.quant != "none":
        import dataclasses

        cfg = dataclasses.replace(
            cfg,
            quant=args.quant,
            postprocess=dataclasses.replace(
                cfg.postprocess, preselect=args.preselect, nms_impl=args.nms
            ),
        )
    # Absorb the device server's one-time first-program cost (55-400 s,
    # server-side, NOT recompilation — see utils/server_warm.py) in the
    # background while the host builds the dataset and measures stages.
    from bdd100k_tpu.utils.server_warm import start_server_warm

    bundle = build_detector(cfg)
    warm = start_server_warm(bundle)

    root = Path("/tmp/bdd_bench")
    labels = ensure_synthetic_dataset(root, num_images=args.images, seed=0)
    # decode straight to model size on host (DCT-domain downscale): same
    # host-side resize placement as the reference pipeline, ~10× less
    # host→HBM transfer than shipping 720p frames the device would resize.
    dataset = DetectionDataset.from_bdd100k(
        labels, root / "images" / "train", max_boxes=100,
        decode_size=cfg.image_size,
    )
    dataset.records = dataset.records[: args.images]

    from bdd100k_tpu.data.pipeline import resolve_wire

    wire = resolve_wire(args.wire, dataset)
    log(f"wire format: {wire}")

    # ---- host decode stage ----
    # The background server warm (a blocked RPC, ~no host CPU) is in
    # flight; anything measured now would be contaminated by its residual
    # host work, so while it runs the loader spins UNMEASURED (fills the
    # page cache, pays pool spin-up), and the measured pass starts only
    # after the join. Net effect: the warm's 1-9 min hides behind useful
    # host work instead of serializing in front of the compile phase.
    def _sys_busy():
        with open("/proc/stat") as f:
            v = list(map(int, f.readline().split()[1:]))
        return sum(v) - v[3] - v[4], sum(v)  # (busy, total) jiffies

    stages = {}
    cpu_s_per_img = 0.0  # Σ core-seconds per image across host stages
    host = None
    if not args.skip_stages:
        # host decode steady state (native pool / cv2), skip spin-up
        loader = make_loader(
            dataset, args.batch_size, shuffle=False, num_epochs=None,
            num_workers=args.num_workers, wire_format=wire,
        )
        n_batches = max(args.images // args.batch_size - 2, 1)
        for _ in range(2):  # pool spin-up + first fills
            next(loader)
        while warm.running():  # unmeasured spin during the warm
            next(loader)
            warm.join(timeout=0.05)
        t0, (b0, j0) = time.monotonic(), _sys_busy()
        for _ in range(n_batches):
            host = next(loader).images
        dt, (b1, j1) = time.monotonic() - t0, _sys_busy()
        rate = n_batches * args.batch_size / dt
        busy = (b1 - b0) / max(j1 - j0, 1)
        stages["decode_imgs_per_sec"] = round(rate, 1)
        stages["decode_cpu_busy"] = round(busy, 2)
        cpu_s_per_img += busy * os.cpu_count() / rate
        loader.close()

    warm.join()
    server_warm_s = warm.seconds
    log(f"server warm (overlapped): {server_warm_s:.1f}s"
        + (f"  [failed: {warm.error}]" if warm.error else ""))

    # The SHIPPED operating point: the committed trained artifact + real
    # synthetic val scenes for the device-resident phase. This matters
    # since round 4: the runtime-guarded anchor-pruned preselect
    # (ops.nms._preselect_pruned) branches on the score distribution, and
    # random-init weights produce dense scores that trip the guard onto
    # the slow dense path — random-init is the WORST case, reported
    # separately below as device_resident_worstcase.
    from benchmarks.common import trained_inputs

    try:
        variables, resident_images = trained_inputs(
            bundle, args.config, args.device_batch_size, "artifact"
        )
        weights_kind = "artifact"
    except SystemExit as e:
        log(f"no trained artifact ({e}); falling back to random init")
        variables, resident_images = trained_inputs(
            bundle, args.config, args.device_batch_size, "random"
        )
        weights_kind = "random"
    if cfg.quant == "int8_static":
        # shared driver calibration protocol (models/quant.py): scales are
        # frozen (calibrated on the bench dataset head with the restored
        # weights) before any timed region
        from bdd100k_tpu.models.quant import (
            calibrate,
            calibration_batches_from_dataset,
        )

        variables = dict(variables)
        variables["quant"] = calibrate(
            bundle, variables["params"], variables.get("batch_stats"),
            calibration_batches_from_dataset(dataset),
        )
        log("int8_static: calibrated act scales on the bench dataset head")

    def infer_fn(variables, images_u8):
        images = preprocess_eval_batch(images_u8, bundle.config.image_size)
        loc, cls = bundle.model.apply(variables, images, train=False)
        return bundle.postprocess(loc, cls)

    infer_step = jax.jit(infer_fn)

    # compile warmup for all three batch shapes used below; per-shape
    # timings + cache counters make a slow driver run attributable
    s = cfg.image_size

    def warm_input(b):
        if wire == "yuv420":
            return (
                jnp.zeros((b, s, s), jnp.uint8),
                jnp.zeros((b, s // 2, s // 2, 2), jnp.uint8),
            )
        return jnp.zeros((b, s, s, 3), jnp.uint8)

    compile_per_shape = {}
    t_all = time.monotonic()
    # e2e shape (wire format), resident shape (RGB trained scenes), b=1
    warm_shapes = {
        f"b{args.batch_size}": warm_input(args.batch_size),
        f"b{args.device_batch_size}_rgb": resident_images,
        "b1": warm_input(1),
    }
    for key, inp in warm_shapes.items():
        t0 = time.monotonic()
        # fetch-fenced: block_until_ready can return before a fresh
        # executable's first run really finishes on the axon tunnel
        # (benchmarks.common.fetch_fence), which would leak this shape's
        # first-run cost into whichever phase consumes it next
        fetch_fence(infer_step(variables, inp))
        compile_per_shape[key] = round(time.monotonic() - t0, 1)
    compile_s = time.monotonic() - t_all
    log(f"compile (3 shapes): {compile_s:.1f}s  per-shape {compile_per_shape}"
        f"  cache {cache.fields}")

    # FLOPs of the b=device_batch program (forward + fused postprocess),
    # from the COMPILED module's cost analysis — the basis for MFU
    flops_batch = compiled_flops(infer_step, variables, resident_images)
    flops_per_img = (
        flops_batch / args.device_batch_size if flops_batch else None
    )

    # ---- isolated stage rates (the binding one sets the e2e ceiling) ----
    # Measured the hard way because the obvious measurements lie on this
    # box: device_put returns after staging (~1.3 GB/s memcpy) while the
    # REAL wire transfer (~35-55 MB/s through the tunnel) happens lazily
    # when a program consumes the buffer — so the wire rate must be
    # measured as put→infer pipelined, and the decode rate must exclude
    # the decode pool's ~1.7 s spin-up to reflect steady state.
    #
    # Each stage also records the SYSTEM cpu-busy fraction while it ran
    # (/proc/stat, so the out-of-process tunnel proxy is counted): on this
    # one-core host the wire costs ~0.7 core — decode and transfer can
    # never both run at their isolated rates, so min(stage) is NOT the e2e
    # ceiling. The honest ceiling is the cpu-contention one:
    #     ncores / Σ_stage(core-seconds per image).
    # (decode stage already measured above, overlapped with the warm)
    if not args.skip_stages:
        # tunnel pipeline ceiling: put+infer with puts in a feeder thread
        # (the same overlap structure prefetch_to_device uses), fresh
        # arrays so nothing is cached. Upper-bounds e2e minus decode.
        import queue as _queue
        import threading as _threading

        xs = [  # distinct buffers, decoded-image dtype/shape/format
            jax.tree.map(lambda a: np.ascontiguousarray(a + i), host)
            for i in range(8)
        ]
        x_bytes = sum(a.nbytes for a in jax.tree.leaves(xs[0]))
        q: _queue.Queue = _queue.Queue(maxsize=2)

        def _feeder():
            for x in xs:
                q.put(jax.device_put(x))
            q.put(None)

        fetch_fence(infer_step(variables, jax.device_put(xs[0])))
        _threading.Thread(target=_feeder, daemon=True).start()
        t0, (b0, j0) = time.monotonic(), _sys_busy()
        while True:
            item = q.get()
            if item is None:
                break
            det = infer_step(variables, item)
        fetch_fence(det)  # true completion of the tail (see fetch_fence)
        dt, (b1, j1) = time.monotonic() - t0, _sys_busy()
        rate = len(xs) * args.batch_size / dt
        busy = (b1 - b0) / max(j1 - j0, 1)
        stages["tunnel_pipeline_imgs_per_sec"] = round(rate, 1)
        stages["tunnel_cpu_busy"] = round(busy, 2)
        cpu_s_per_img += busy * os.cpu_count() / rate
        stages["wire_MB_per_sec"] = round(len(xs) * x_bytes / 1e6 / dt, 1)
        if cpu_s_per_img > 0:
            stages["contention_ceiling_imgs_per_sec"] = round(
                min(
                    os.cpu_count() / cpu_s_per_img,
                    stages["decode_imgs_per_sec"],
                    stages["tunnel_pipeline_imgs_per_sec"],
                ),
                1,
            )
        log(f"stage rates: {stages}")

    # ---- steady-state end-to-end decode→NMS ----
    # Host decode workers run ahead, the double-buffered prefetcher overlaps
    # host→HBM transfer with device compute, and dispatch runs one batch
    # behind so the device never idles. host_wait tracks how long the
    # consumer blocked on the input side — the overlap diagnostic.
    def batches():
        for _ in range(args.rounds):
            yield from make_loader(
                dataset, args.batch_size, shuffle=False, num_epochs=1,
                num_workers=args.e2e_workers, wire_format=wire,
            )

    it = prefetch_to_device((b.images for b in batches()), size=3)
    # fetch-fenced: excludes pool spin-up AND settles the executable so
    # the loop's trailing fence is honest
    fetch_fence(infer_step(variables, next(it)))
    n_total = 0
    host_wait = 0.0
    t0 = time.monotonic()
    while True:
        t_w = time.monotonic()
        batch = next(it, None)
        if batch is None:
            break
        host_wait += time.monotonic() - t_w
        det = infer_step(variables, batch)
        n_total += args.batch_size
    fetch_fence(det)  # true completion of the tail batch
    dt = time.monotonic() - t0
    imgs_per_sec = n_total / dt
    log(f"e2e: {n_total} images in {dt:.2f}s → {imgs_per_sec:.1f} imgs/s "
        f"(host-wait {host_wait / dt:.0%})")

    # ---- device-resident throughput: ONE dispatch, fori_loop on device ----
    # Shipped operating point: trained weights + real val scenes (sparse
    # post-NMS score distribution → the pruned preselect's fast path).
    device_only, loop_compile_s = resident_infer_rate(
        infer_fn, variables, resident_images, args.device_batch_size,
    )
    log(f"device-resident (b{args.device_batch_size}, fori_loop, "
        f"{weights_kind} weights): {device_only:.1f} imgs/sec "
        f"(loop compile {loop_compile_s:.1f}s)")

    # Worst case: random-init weights + random pixels — every anchor
    # clears the score threshold, the runtime guard takes the dense path.
    # Same compiled loop (identical shapes/dtypes), different data.
    wc_vars, wc_images = trained_inputs(
        bundle, args.config, args.device_batch_size, "random"
    )
    if cfg.quant == "int8_static":
        wc_vars = dict(wc_vars)
        wc_vars["quant"] = variables["quant"]
    device_worst, _ = resident_infer_rate(
        infer_fn, wc_vars, wc_images, args.device_batch_size,
    )
    log(f"device-resident worst case (random init): "
        f"{device_worst:.1f} imgs/sec")

    # ---- p50 batch=1 latency ----
    # Dispatched (what THIS host observes — ~90% tunnel on the bench box)
    one = warm_input(1)
    fetch_fence(infer_step(variables, one))
    lat = []
    for _ in range(50):
        t0 = time.monotonic()
        jax.block_until_ready(infer_step(variables, one))
        lat.append((time.monotonic() - t0) * 1e3)
    p50_ms = float(np.percentile(lat, 50))
    # On-chip (what the HARDWARE takes, BASELINE.json:2's latency metric):
    # one dispatched fori_loop of 200 b=1 steps — per-iteration tunnel cost
    # is zero by construction, so ms/iter is the chip's own latency. An
    # on-device loop yields no per-iter jitter source, so mean ≈ p50.
    one_rgb = resident_images[:1]
    rate_b1, _ = resident_infer_rate(infer_fn, variables, one_rgb, 1,
                                     iters=200)
    p50_onchip_ms = 1000.0 / rate_b1
    log(f"p50 batch=1: {p50_ms:.2f} ms dispatched, "
        f"{p50_onchip_ms:.2f} ms on-chip")

    baseline_per_chip = 5000.0 / 8.0
    out = {
        "metric": "ssd_mobilenet_300 end-to-end images/sec/chip (decode->NMS)",
        "value": round(imgs_per_sec, 2),
        "unit": "images/sec/chip",
        "vs_baseline": round(imgs_per_sec / baseline_per_chip, 4),
        "device_resident_imgs_per_sec": round(device_only, 2),
        "device_resident_worstcase": round(device_worst, 2),
        "device_resident_weights": weights_kind,
        "device_resident_batch": args.device_batch_size,
        "p50_batch1_ms": round(p50_ms, 2),
        "p50_batch1_ms_onchip": round(p50_onchip_ms, 2),
        "compile_s": round(compile_s, 1),
        "compile_per_shape_s": compile_per_shape,
        "resident_loop_compile_s": round(loop_compile_s, 1),
        # one-time device-server first-program setup, absorbed in a
        # background thread overlapped with dataset+decode-stage work —
        # see utils/server_warm.py for the measurements behind this
        "server_warm_s": round(server_warm_s, 1) if server_warm_s else None,
        "wire": wire,
        "nms": args.nms,
        "preselect": args.preselect,
        "quant": args.quant,
        "e2e_host_wait_frac": round(host_wait / dt, 3),
        "note": "e2e bound by single-core host decode + tunneled "
                "host-to-device link on this box",
    }
    out.update(mfu_fields(flops_per_img, device_only))
    out.update(cache.fields)
    out.update(stages)
    binding = min(
        (stages[k] for k in ("decode_imgs_per_sec",
                             "tunnel_pipeline_imgs_per_sec") if k in stages),
        default=None,
    )
    if binding:
        out["e2e_over_binding_stage"] = round(imgs_per_sec / binding, 3)
    # the achievable ratio: e2e vs the cpu-contention ceiling (decode and
    # the out-of-process tunnel proxy share this host's one core, so
    # min(stage) is unreachable by construction — see the stage comment)
    ceiling = stages.get("contention_ceiling_imgs_per_sec")
    if ceiling:
        out["e2e_over_contention_ceiling"] = round(imgs_per_sec / ceiling, 3)
    # Projected production-host e2e: this box has ONE core shared by the
    # decode pool AND the out-of-process tunnel proxy, so its e2e says
    # nothing about a real deployment. A Cloud TPU v5e-8 host has 112
    # vCPUs (14 cores/chip) and a PCIe-local chip (no tunnel, no proxy
    # core, wire not binding at >10 GB/s). Projection = min(chip rate,
    # per-core decode rate × 14) — the BASELINE 5000/s-per-pod claim as a
    # calculation, not an assertion.
    if "decode_imgs_per_sec" in stages and stages.get("decode_cpu_busy"):
        per_core = stages["decode_imgs_per_sec"] / (
            stages["decode_cpu_busy"] * os.cpu_count()
        )
        projected = min(device_only, per_core * 14.0)
        out["decode_imgs_per_sec_per_core"] = round(per_core, 1)
        out["projected_production_host_imgs_per_sec_per_chip"] = round(
            projected, 1
        )
        out["projected_production_vs_baseline"] = round(
            projected / baseline_per_chip, 4
        )
        out["projection_assumptions"] = (
            "v5e-8 host: 112 vCPU / 8 chips = 14 decode cores per chip; "
            "PCIe-local chip (no tunnel); chip rate = measured "
            "device_resident_imgs_per_sec"
        )
    print(json.dumps(out))


if __name__ == "__main__":
    main()
