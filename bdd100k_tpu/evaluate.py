"""Eval driver: mAP@0.5 over a val split (SURVEY.md §2.5, §3.2).

TPU-native eval stack: pjit(forward → fused on-device decode/score/NMS),
then only fixed detection slots cross to host for the tiny mAP accumulation
— unlike the reference, which fetches raw per-anchor tensors and runs NMS in
host NumPy per image.

Usage:
    python -m bdd100k_tpu.evaluate --config ssd_vgg16_512 \
        --labels val.json --image_dir images/val --ckpt_dir runs/ssd512
"""

from __future__ import annotations

import argparse
import json
import time
from pathlib import Path

import jax

from bdd100k_tpu.configs import BDD100K_CLASSES, TrainConfig, get_config
from bdd100k_tpu.data.pipeline import (
    DetectionDataset,
    make_loader,
    prefetch_to_device,
)
from bdd100k_tpu.data.synthetic import ensure_synthetic_dataset
from bdd100k_tpu.models.detector import build_detector
from bdd100k_tpu.ops.map_metric import DetectionEvaluator
from bdd100k_tpu.parallel.mesh import batch_sharding, make_mesh
from bdd100k_tpu.parallel.train_step import create_train_state, make_eval_step
from bdd100k_tpu.utils.weights import restore_eval_weights


def parse_args(argv=None):
    p = argparse.ArgumentParser(description="BDD100K detector eval (TPU)")
    p.add_argument("--config", default="ssd_mobilenet_300")
    p.add_argument("--yolo_priors", default=None,
                   help="JSON from scripts/kmeans_priors.py --out: replace "
                        "the config's YOLO anchor priors with a fitted set")
    p.add_argument("--labels", default=None)
    p.add_argument("--image_dir", default=None)
    p.add_argument("--synthetic", type=int, default=0)
    p.add_argument("--synthetic_dir", default="/tmp/bdd_synth_val")
    p.add_argument("--batch_size", type=int, default=32)
    p.add_argument("--max_boxes", type=int, default=100)
    p.add_argument("--ckpt_dir", default=None,
                   help="orbax run dir (restore latest) or a single-file\n"
                        ".npz weights artifact (scripts/export_weights.py)")
    p.add_argument("--ema", action="store_true",
                   help="evaluate the checkpoint's EMA shadow weights "
                        "(runs trained with --ema_decay)")
    p.add_argument("--iou_threshold", type=float, default=0.5)
    p.add_argument("--coco_map", action="store_true",
                   help="also report COCO-style mAP@[.50:.05:.95] (matching "
                        "redone per threshold on the accumulated host "
                        "arrays; the device pass runs once)")
    p.add_argument("--dump_detections", default=None,
                   help="write all detections as BDD100K-format JSON "
                        "(name/category/box2d in source pixels + score) — "
                        "the reference-era submission/visualization file")
    p.add_argument("--num_workers", type=int, default=8)
    p.add_argument("--out", default=None, help="write results JSON here")
    p.add_argument("--mesh_data", type=int, default=None)
    p.add_argument("--nms", choices=("auto", "xla", "pallas", "fixpoint"),
                   default="auto",
                   help="NMS backend (identical keep decisions in all)")
    p.add_argument("--quant", choices=("none", "int8", "int8_static"),
                   default="none",
                   help="post-training int8 for dense convs (v5e int8 MXU; "
                        "same checkpoint, report the mAP delta vs none). "
                        "int8: dynamic per-batch activation scales; "
                        "int8_static: scales calibrated once on the first "
                        "--calib_batches val batches, then frozen into the "
                        "program (faster — no per-layer amax pass)")
    p.add_argument("--calib_images", default=None,
                   help="int8_static: directory of representative frames "
                        "for activation-scale calibration (e.g. train-split "
                        "images). Default: the eval set's head — which "
                        "mildly leaks eval data into the quant params; the "
                        "result JSON records calib_images_used either way")
    p.add_argument("--calib_batches", type=int, default=8,
                   help="int8_static: number of 8-image calibration "
                        "batches read from the eval set when "
                        "--calib_images is not given (models/quant.py "
                        "CALIB_BATCH protocol)")
    p.add_argument("--preselect", choices=("exact", "approx"), default="exact",
                   help="per-class candidate preselect: exact top-k or the "
                        "faster TPU approx_max_k (~0.95 candidate recall)")
    p.add_argument("--per_class_topk", type=int, default=None,
                   help="override PostprocessConfig.per_class_topk (NMS "
                        "candidate count per class; speed/recall ablation — "
                        "see BENCH_MATRIX.md)")
    p.add_argument("--wire", choices=("rgb", "yuv420"), default="rgb",
                   help="host->device wire format. Eval defaults to rgb so "
                        "reported mAP never depends on which host ran it "
                        "(yuv420's chroma path differs at the last bit); "
                        "pass yuv420 for throughput-oriented runs — mAP "
                        "shift is within noise (measured: see "
                        "BENCH_MATRIX.md approx/wire mAP-delta lines)")
    p.add_argument("--multihost", action="store_true",
                   help="multi-host eval: jax.distributed.initialize(), "
                        "each host evaluates its shard of the val set, "
                        "host 0 merges (needs --sync_dir or --ckpt_dir on "
                        "a shared filesystem)")
    p.add_argument("--sync_dir", default=None,
                   help="shared dir for multi-host shard merge (default: "
                        "<ckpt_dir>/eval_sync)")
    return p.parse_args(argv)


def _dump_image(dataset, idx: int, det, row: int) -> dict:
    """One image's detections in the BDD100K labels format (SURVEY.md §2.1
    field names): normalized corner boxes → source-resolution pixels."""
    w, h = dataset.image_width, dataset.image_height
    labels = []
    for box, score, cls, ok in zip(
        det.boxes[row], det.scores[row], det.classes[row], det.valid[row]
    ):
        if not ok:
            continue
        labels.append({
            "category": BDD100K_CLASSES[int(cls) - 1],
            "score": round(float(score), 4),
            "box2d": {
                "x1": round(float(box[0]) * w, 2),
                "y1": round(float(box[1]) * h, 2),
                "x2": round(float(box[2]) * w, 2),
                "y2": round(float(box[3]) * h, 2),
            },
        })
    return {"name": dataset.records[idx]["name"], "labels": labels}


def run_eval(bundle, state, dataset, args, mesh, compute: bool = True,
             quant_vars=None):
    """Evaluate `dataset`; returns the result dict, or the loaded
    DetectionEvaluator when `compute=False` (multi-host shard mode)."""
    n_calib = None
    if quant_vars is None and bundle.config.quant == "int8_static":
        from bdd100k_tpu.models.quant import calibrate_for_driver

        quant_vars, n_calib = calibrate_for_driver(
            bundle, state.params, state.batch_stats,
            calib_images=getattr(args, "calib_images", None),
            dataset=dataset,
            num_batches=getattr(args, "calib_batches", 8),
        )
        print(f"int8_static: calibrated act scales on {n_calib} images"
              + (" (eval-set head)" if not getattr(args, "calib_images",
                                                   None) else ""))
    eval_step = make_eval_step(bundle, mesh=mesh, quant_vars=quant_vars)
    wire = getattr(args, "wire", "rgb")
    print(f"wire format: {wire}")
    loader = make_loader(
        dataset, args.batch_size, shuffle=False, num_epochs=1,
        drop_last=False, num_workers=args.num_workers, wire_format=wire,
    )
    batches = prefetch_to_device(
        loader, size=2,
        sharding=batch_sharding(mesh) if mesh is not None else None,
    )
    evaluator = DetectionEvaluator(
        bundle.config.num_classes, list(BDD100K_CLASSES)
    )
    n_images = len(dataset)
    seen = 0
    dump = [] if getattr(args, "dump_detections", None) else None

    def accumulate(det, host):
        nonlocal seen
        det = jax.device_get(det)
        host = jax.device_get(host)
        for i in range(det.boxes.shape[0]):
            if seen >= n_images:
                break  # padded tail of final partial batch
            evaluator.add_image(
                det.boxes[i], det.scores[i], det.classes[i],
                host[0][i], host[1][i],
                det_valid=det.valid[i], gt_mask=host[2][i],
            )
            if dump is not None:
                dump.append(_dump_image(dataset, seen, det, i))
            seen += 1

    # one-batch pipeline: dispatch batch k+1 before fetching/accumulating
    # batch k, so the host-side mAP bookkeeping overlaps device compute
    pending = None
    t0 = None
    timed = 0  # images processed after the clock started
    for batch in batches:
        det = eval_step(state.params, state.batch_stats, batch.images)
        if t0 is None:
            # first batch pays compile (+ first weight transfer): fence it
            # out with a real fetch (block_until_ready can return early on
            # a fresh executable's first run over the axon tunnel), then
            # start the steady-state clock — on small --synthetic runs the
            # old folded-in compile dominated images_per_sec
            jax.device_get(det.scores[0, 0])
            t0 = time.monotonic()
        else:
            timed += det.boxes.shape[0]
        if pending is not None:
            accumulate(*pending)
        pending = (det, (batch.boxes, batch.labels, batch.mask))
    if pending is not None:
        accumulate(*pending)
    dt = (time.monotonic() - t0) if t0 is not None else 0.0
    if not compute:
        return evaluator, seen
    result = evaluator.compute(iou_threshold=args.iou_threshold)
    if getattr(args, "coco_map", False):
        result["coco"] = evaluator.compute_range()
    # steady-state rate; None when the whole run was one (compile) batch
    result["images_per_sec"] = (
        round(min(timed, seen) / dt, 2) if timed and dt > 0 else None
    )
    result["num_images"] = seen
    if n_calib is not None:
        result["calib_images_used"] = n_calib
        result["calib_source"] = (
            getattr(args, "calib_images", None) or "eval-set head"
        )
    if dump is not None:
        Path(args.dump_detections).write_text(json.dumps(dump))
        print(f"wrote {seen} images of detections to {args.dump_detections}")
    return result


def run_eval_multihost(bundle, state, dataset, args) -> dict:
    """Per-host sharded eval + file-based shard merge (SURVEY.md §2.8).

    Each process evaluates records[process_index::process_count] with a
    LOCAL jit (no cross-host collectives — detection eval is embarrassingly
    parallel), writes its accumulated evaluator state to the shared
    `sync_dir`, and host 0 merges all shards into one mAP. All hosts return
    the same merged result (read back after a barrier)."""
    import numpy as np
    from jax.experimental import multihost_utils

    proc, nproc = jax.process_index(), jax.process_count()
    sync_dir = args.sync_dir or (
        str(Path(args.ckpt_dir) / "eval_sync") if args.ckpt_dir else None
    )
    if sync_dir is None:
        raise SystemExit(
            "multi-host eval needs --sync_dir (or --ckpt_dir) on a shared "
            "filesystem for the shard merge"
        )
    sync = Path(sync_dir)
    if proc == 0:
        sync.mkdir(parents=True, exist_ok=True)
    multihost_utils.sync_global_devices("eval_sync_dir")

    # shard the RECORDS, not the loader: eval must not drop the remainder
    # rows (mAP is over the full set), so per-host shards may be unequal —
    # fine, there are no collectives to desynchronize.
    import copy

    shard = copy.copy(dataset)
    shard.records = dataset.records[proc::nproc]
    # int8_static: calibrate on the UNSHARDED dataset's head so every host
    # freezes identical activation scales (per-shard calibration would make
    # the merged mAP depend on the host count)
    quant_vars = None
    if bundle.config.quant == "int8_static":
        from bdd100k_tpu.models.quant import calibrate_for_driver

        quant_vars, _ = calibrate_for_driver(
            bundle, state.params, state.batch_stats,
            calib_images=getattr(args, "calib_images", None),
            dataset=dataset,
            num_batches=getattr(args, "calib_batches", 8),
        )
    evaluator, seen = run_eval(
        bundle, state, shard, args, mesh=None, compute=False,
        quant_vars=quant_vars,
    )
    np.savez(sync / f"shard_{proc}.npz", **evaluator.to_arrays())
    multihost_utils.sync_global_devices("eval_shards_written")

    if proc == 0:
        merged = DetectionEvaluator(
            bundle.config.num_classes, list(BDD100K_CLASSES)
        )
        for i in range(nproc):
            with np.load(sync / f"shard_{i}.npz") as blob:
                merged.merge_arrays(dict(blob))
        result = merged.compute(iou_threshold=args.iou_threshold)
        if getattr(args, "coco_map", False):
            result["coco"] = merged.compute_range()
        result["num_images"] = merged._next_img
        result["num_hosts"] = nproc
        (sync / "result.json").write_text(json.dumps(result))
    multihost_utils.sync_global_devices("eval_merged")
    return json.loads((sync / "result.json").read_text())


def main(argv=None):
    from bdd100k_tpu.utils.compilation_cache import enable_compilation_cache

    enable_compilation_cache()
    args = parse_args(argv)
    if args.multihost:
        import os

        kw = {}
        if os.environ.get("JAX_COORDINATOR_ADDRESS"):
            kw = dict(
                coordinator_address=os.environ["JAX_COORDINATOR_ADDRESS"],
                num_processes=int(os.environ["JAX_NUM_PROCESSES"]),
                process_id=int(os.environ["JAX_PROCESS_ID"]),
            )
        jax.distributed.initialize(**kw)
    det_cfg = get_config(args.config)
    if args.yolo_priors:
        from bdd100k_tpu.configs import apply_yolo_priors

        det_cfg = apply_yolo_priors(det_cfg, args.yolo_priors)
    if (args.nms != "auto" or args.preselect != "exact"
            or args.quant != "none" or args.per_class_topk is not None):
        import dataclasses

        pp_kw = dict(nms_impl=args.nms, preselect=args.preselect)
        if args.per_class_topk is not None:
            pp_kw["per_class_topk"] = args.per_class_topk
        det_cfg = dataclasses.replace(
            det_cfg,
            quant=args.quant,
            postprocess=dataclasses.replace(det_cfg.postprocess, **pp_kw),
        )
    multihost = jax.process_count() > 1
    if multihost and not args.multihost:
        # started under jax.distributed without opting in: the default
        # loader would decode the full set on EVERY host and double-count
        # mAP inputs — refuse instead of silently mis-measuring.
        raise SystemExit(
            "multiple jax processes detected; run eval with --multihost "
            "(per-host shards + merged mAP) or on a single process"
        )
    # multi-host eval runs per-host local programs (no global mesh): each
    # host's shard is independent and the merge is host-side (run_eval_multihost)
    mesh = None if multihost else make_mesh(num_data=args.mesh_data)
    if multihost:
        # un-meshed jit must land on THIS process's device, not global dev 0
        jax.config.update("jax_default_device", jax.local_devices()[0])
    bundle = build_detector(det_cfg)
    # absorb the device server's one-time first-program setup (minutes,
    # server-side — utils/server_warm.py) while the checkpoint restores
    # and the dataset/loader builds; no-op on CPU / multi-host
    from bdd100k_tpu.utils.server_warm import start_server_warm

    start_server_warm(bundle)
    state = create_train_state(
        bundle, TrainConfig(), jax.random.PRNGKey(0), mesh=mesh
    )
    if args.ckpt_dir:
        state, step = restore_eval_weights(
            state, args.ckpt_dir, ema=args.ema, expect_config=det_cfg.name
        )
        print(f"restored step {step}" + (" (EMA weights)" if args.ema else ""))

    # eval has no augment, so decode straight to model size on host — same
    # resize placement as the reference's input pipeline, ~10× less
    # host→HBM transfer (GT boxes are normalized; mAP unaffected)
    decode_size = det_cfg.image_size
    if args.synthetic:
        labels = ensure_synthetic_dataset(
            args.synthetic_dir, num_images=args.synthetic, seed=1, split="val"
        )
        dataset = DetectionDataset.from_bdd100k(
            labels, Path(args.synthetic_dir) / "images" / "val",
            max_boxes=args.max_boxes, decode_size=decode_size,
        )
        dataset.records = dataset.records[: args.synthetic]
    else:
        if not args.labels or not args.image_dir:
            raise SystemExit("need --labels + --image_dir (or --synthetic N)")
        dataset = DetectionDataset.from_bdd100k(
            args.labels, args.image_dir, max_boxes=args.max_boxes,
            decode_size=decode_size,
        )

    if multihost:
        if args.dump_detections:
            raise SystemExit(
                "--dump_detections is single-host only (per-host shards "
                "would each write a partial file)"
            )
        result = run_eval_multihost(bundle, state, dataset, args)
    else:
        result = run_eval(bundle, state, dataset, args, mesh)
    ips = result.get("images_per_sec")
    print(f"\nmAP@{args.iou_threshold}: {result['mAP']:.4f}"
          + (f" ({ips:.1f} imgs/sec steady-state)" if ips else ""))
    if "coco" in result:
        print(f"mAP@[.50:.95]: {result['coco']['mAP']:.4f}")
    for name, ap in result["per_class"].items():
        print(f"  {name:>14}: {'—' if ap is None else f'{ap:.4f}'}")
    if args.out:
        Path(args.out).write_text(json.dumps(result, indent=2))
    return result


if __name__ == "__main__":
    main()
