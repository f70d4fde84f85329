"""Inference / demo driver (SURVEY.md §2.6, §3.3).

Three modes mirroring the reference's infer + video-demo scripts:
  * single image  → boxes/classes/scores (+ optional drawn output)
  * directory     → batched inference over all images
  * video         → per-frame streaming demo with continuous batching
                    (BASELINE config 5): frames accumulate into a batch
                    until full or the queue drains, then one device call.

The whole postprocess (decode→score→NMS) runs on device; the host only
draws boxes.

Usage:
    python -m bdd100k_tpu.infer --config ssd_mobilenet_300 \
        --ckpt_dir runs/ssd300 --image road.jpg --out_dir out/
    python -m bdd100k_tpu.infer --video drive.mp4 --out_dir out/
"""

from __future__ import annotations

import argparse
import time
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

from bdd100k_tpu.configs import BDD100K_CLASSES, TrainConfig, get_config
from bdd100k_tpu.data.augment import preprocess_eval_batch
from bdd100k_tpu.models.detector import build_detector
from bdd100k_tpu.parallel.train_step import create_train_state
from bdd100k_tpu.utils.weights import restore_eval_weights
from bdd100k_tpu.utils.viz import draw_detections


def parse_args(argv=None):
    p = argparse.ArgumentParser(description="BDD100K detector inference (TPU)")
    p.add_argument("--config", default="ssd_mobilenet_300")
    p.add_argument("--yolo_priors", default=None,
                   help="JSON from scripts/kmeans_priors.py --out: replace "
                        "the config's YOLO anchor priors with a fitted set")
    p.add_argument("--ckpt_dir", default=None,
                   help="orbax run dir or a single-file .npz weights artifact")
    p.add_argument("--ema", action="store_true",
                   help="use the checkpoint's EMA shadow weights "
                        "(runs trained with --ema_decay)")
    p.add_argument("--image", default=None)
    p.add_argument("--image_dir", default=None)
    p.add_argument("--video", default=None)
    p.add_argument("--out_dir", default=None, help="write drawn outputs here")
    p.add_argument("--score_threshold", type=float, default=0.4,
                   help="demo-mode display threshold")
    p.add_argument("--batch_size", type=int, default=8,
                   help="max continuous-batch size for video/dir modes")
    p.add_argument("--host_resize", choices=("auto", "on", "off"),
                   default="auto",
                   help="resize frames to model size on host before the "
                        "device transfer (~10x less link traffic for 720p); "
                        "auto = on for video/dir modes, off for single image")
    p.add_argument("--drain_timeout", type=float, default=0.05,
                   help="video mode: max seconds to wait for more frames "
                        "before running a partial batch (continuous batching)")
    p.add_argument("--wire", choices=("auto", "rgb", "yuv420"),
                   default="auto",
                   help="host->device wire format; yuv420 (auto-on with "
                        "host_resize) ships planar Y + subsampled CbCr — "
                        "half the transfer bytes of RGB")
    p.add_argument("--nms", choices=("auto", "xla", "pallas", "fixpoint"),
                   default="auto",
                   help="NMS backend (identical keep decisions in all)")
    p.add_argument("--quant", choices=("none", "int8", "int8_static"),
                   default="none",
                   help="post-training int8 for dense convs; int8_static "
                        "freezes activation scales from --calib_images "
                        "(or, if absent, the FIRST batch — activations "
                        "above that batch's amax clip silently on later "
                        "frames, so prefer --calib_images for streams)")
    p.add_argument("--calib_images", default=None,
                   help="int8_static: directory of representative frames "
                        "to calibrate activation scales on (the shared "
                        "models/quant.py protocol, ≤64 frames)")
    return p.parse_args(argv)


class Predictor:
    """Compiled forward+postprocess at a fixed batch size, padding-safe.

    `host_resize=True` resizes frames to model size on host before the
    transfer (boxes come back normalized, so drawing on the original frame
    is unaffected) — ~10× less host→HBM traffic for 720p streams, the same
    resize placement the reference's input pipeline uses.
    """

    def __init__(self, bundle, state, batch_size: int = 1,
                 host_resize: bool = False, wire: str = "rgb",
                 calib_images: str | None = None):
        self.bundle = bundle
        self.state = state
        self.batch_size = batch_size
        self.host_resize = host_resize
        # yuv420 wire: convert host-resized frames to planar Y + subsampled
        # CbCr before the transfer — half the bytes again on top of
        # host_resize; the fused device preprocess reconstructs RGB.
        self.wire = wire
        self._native = None
        if wire == "yuv420" and host_resize:
            from bdd100k_tpu.data import native_decode as nd

            if nd.available():  # one C call: batched resize + conversion
                self._native = nd.NativeDecoder(4)

        # int8_static: scales come from --calib_images when given (the
        # shared models/quant.py protocol), else are calibrated lazily on
        # the first real batch — a one-batch calibration clips activations
        # that exceed that batch's amax on later frames, fine for a demo,
        # not for a long stream.
        self._quant_vars = None
        self._needs_calib = bundle.config.quant == "int8_static"
        if self._needs_calib and calib_images is not None:
            from bdd100k_tpu.models.quant import calibrate_for_driver

            self._quant_vars, n = calibrate_for_driver(
                bundle, state.params, state.batch_stats,
                calib_images=calib_images,
            )
            self._needs_calib = False
            print(f"int8_static: calibrated act scales on {n} frames "
                  f"from {calib_images}")

        def fwd(params, batch_stats, images_u8):
            images = preprocess_eval_batch(images_u8, bundle.config.image_size)
            variables = {"params": params}
            if batch_stats:
                variables["batch_stats"] = batch_stats
            if self._quant_vars is not None:
                variables["quant"] = self._quant_vars
            loc, cls = bundle.model.apply(variables, images, train=False)
            return bundle.postprocess(loc, cls)

        self._jit_fwd = jax.jit(fwd)

    def _fwd(self, params, batch_stats, images):
        if self._needs_calib:  # first batch doubles as the calibration set
            from bdd100k_tpu.models.quant import calibrate

            self._quant_vars = calibrate(
                self.bundle, params, batch_stats, [images]
            )
            self._needs_calib = False
            print("int8_static: calibrated act scales on the first batch")
        return self._jit_fwd(params, batch_stats, images)

    def _resize_host(self, frames_u8: np.ndarray) -> np.ndarray:
        s = self.bundle.config.image_size
        if frames_u8.shape[1:3] == (s, s):
            return frames_u8
        try:
            import cv2

            return np.stack(
                [cv2.resize(f, (s, s), interpolation=cv2.INTER_LINEAR)
                 for f in frames_u8]
            )
        except ImportError:
            from PIL import Image

            return np.stack(
                [np.asarray(Image.fromarray(f).resize((s, s)))
                 for f in frames_u8]
            )

    def dispatch(self, frames_u8: np.ndarray):
        """Async: launch the device step, return (device_det, n) without
        blocking — lets the caller overlap decode of the next batch with
        device compute of this one."""
        n = frames_u8.shape[0]
        if self._native is not None:
            # resize + YUV conversion fused into one GIL-releasing C call
            # (native/decode_pool.cc dp_resize_yuv420_batch), then pad the
            # small planes instead of full-res frames
            s = self.bundle.config.image_size
            y, uv = self._native.resize_yuv420_batch(frames_u8, s)
            if n < self.batch_size:
                k = self.batch_size - n
                y = np.concatenate([y, np.repeat(y[-1:], k, axis=0)])
                uv = np.concatenate([uv, np.repeat(uv[-1:], k, axis=0)])
            frames_u8 = (y, uv)
        else:
            if self.host_resize:
                frames_u8 = self._resize_host(frames_u8)
            if n < self.batch_size:  # pad to the compiled batch shape
                pad = np.repeat(frames_u8[-1:], self.batch_size - n, axis=0)
                frames_u8 = np.concatenate([frames_u8, pad], axis=0)
            if self.wire == "yuv420":
                from bdd100k_tpu.data.pipeline import rgb_to_yuv420_host

                h, w = frames_u8.shape[1:3]
                if h % 2 or w % 2:  # 4:2:0 needs even dims — drop edge px
                    frames_u8 = frames_u8[:, : h - h % 2, : w - w % 2]
                frames_u8 = rgb_to_yuv420_host(frames_u8)
        det = self._fwd(
            self.state.params, self.state.batch_stats,
            jax.tree.map(jnp.asarray, frames_u8),
        )
        return det, n

    @staticmethod
    def fetch(det, n: int):
        det = jax.device_get(det)
        return jax.tree.map(lambda x: x[:n], det)

    def __call__(self, frames_u8: np.ndarray):
        """frames (N≤batch_size, H, W, 3) uint8 → host Detections for N."""
        det, n = self.dispatch(frames_u8)
        return self.fetch(det, n)


def load_predictor(args, batch_size: int,
                   host_resize: bool = False) -> Predictor:
    det_cfg = get_config(args.config)
    if getattr(args, "yolo_priors", None):
        from bdd100k_tpu.configs import apply_yolo_priors

        det_cfg = apply_yolo_priors(det_cfg, args.yolo_priors)
    nms = getattr(args, "nms", "auto")
    quant = getattr(args, "quant", "none")
    if nms != "auto" or quant != "none":
        import dataclasses

        det_cfg = dataclasses.replace(
            det_cfg,
            quant=quant,
            postprocess=dataclasses.replace(
                det_cfg.postprocess, nms_impl=nms
            ),
        )
    bundle = build_detector(det_cfg)
    # absorb the device server's one-time first-program setup (minutes,
    # server-side — utils/server_warm.py) while the checkpoint restores;
    # no-op on CPU / multi-host
    from bdd100k_tpu.utils.server_warm import start_server_warm

    start_server_warm(bundle)
    state = create_train_state(bundle, TrainConfig(), jax.random.PRNGKey(0))
    if args.ckpt_dir:
        state, step = restore_eval_weights(
            state, args.ckpt_dir, ema=args.ema, expect_config=det_cfg.name
        )
        print(f"restored step {step}" + (" (EMA weights)" if args.ema else ""))
    # yuv420 wire rides on host_resize (frames are then at the even model
    # size); "auto" enables it there, halving transfer bytes again.
    wire_arg = getattr(args, "wire", "auto")
    wire = (
        "yuv420"
        if wire_arg == "yuv420"
        or (wire_arg == "auto" and host_resize
            and det_cfg.image_size % 2 == 0)
        else "rgb"
    )
    return Predictor(
        bundle, state, batch_size, host_resize=host_resize, wire=wire,
        calib_images=getattr(args, "calib_images", None),
    )


def _want_host_resize(args, default: bool) -> bool:
    return {"auto": default, "on": True, "off": False}[args.host_resize]


def _read_image(path) -> np.ndarray:
    from PIL import Image

    with Image.open(path) as im:
        return np.asarray(im.convert("RGB"), dtype=np.uint8)


def _emit(args, name, frame, det_i, out_dir):
    keep = det_i["valid"] & (det_i["scores"] >= args.score_threshold)
    for box, score, cls in zip(
        det_i["boxes"][keep], det_i["scores"][keep], det_i["classes"][keep]
    ):
        print(
            f"{name}: {BDD100K_CLASSES[int(cls) - 1]} {score:.3f} "
            f"[{box[0]:.3f} {box[1]:.3f} {box[2]:.3f} {box[3]:.3f}]"
        )
    if out_dir:
        drawn = draw_detections(
            frame, det_i["boxes"], det_i["scores"], det_i["classes"],
            det_i["valid"], score_threshold=args.score_threshold,
        )
        from PIL import Image

        Image.fromarray(drawn).save(Path(out_dir) / f"det_{Path(name).name}")


def _det_slice(det, i) -> dict:
    return {
        "boxes": det.boxes[i], "scores": det.scores[i],
        "classes": det.classes[i], "valid": det.valid[i],
    }


def run_single(args):
    predictor = load_predictor(
        args, batch_size=1,
        host_resize=_want_host_resize(args, default=False),
    )
    frame = _read_image(args.image)
    t0 = time.monotonic()
    det = predictor(frame[None])
    latency = time.monotonic() - t0
    _emit(args, args.image, frame, _det_slice(det, 0), args.out_dir)
    print(f"latency (incl. first compile): {latency * 1e3:.1f} ms")
    # warm path latency
    t0 = time.monotonic()
    predictor(frame[None])
    print(f"warm latency: {(time.monotonic() - t0) * 1e3:.1f} ms")


def run_dir(args):
    """Directory sweep, pipelined (SURVEY.md §2.6/§3.3).

    The most likely real-user batch path, so it gets the same overlap
    structure as video mode and bench.py: the native decode pool (or the
    cv2 DCT-downscale fallback) decodes straight to model size on loader
    threads while the device runs the previous batch, and dispatch runs one
    batch ahead of fetch/emit. With --out_dir, boxes are drawn on the
    model-size decode (boxes are normalized, so any size draws correctly);
    without it, frames ride the compact yuv420 wire and never materialize
    as RGB on host.
    """
    import queue
    import threading

    from bdd100k_tpu.data.pipeline import (
        DetectionDataset,
        make_loader,
        resolve_wire,
    )

    paths = sorted(
        p for p in Path(args.image_dir).iterdir()
        if p.suffix.lower() in (".jpg", ".jpeg", ".png")
    )
    if not paths:
        raise SystemExit(f"no images in {args.image_dir}")
    host_resize = _want_host_resize(args, default=True)
    # the loader does the host resize; the predictor sees ready frames
    predictor = load_predictor(
        args, batch_size=args.batch_size, host_resize=False
    )
    s = predictor.bundle.config.image_size
    records = [
        {"name": p.name, "boxes": np.zeros((0, 4), np.float32),
         "labels": np.zeros((0,), np.int32)}
        for p in paths
    ]
    dataset = DetectionDataset(
        records, args.image_dir, max_boxes=1,
        decode_size=s if host_resize else None,
    )
    # drawing needs host RGB frames; pure-throughput sweeps take the
    # half-the-bytes planar wire
    wire = (
        "rgb"
        if (args.out_dir or not host_resize)
        else resolve_wire(getattr(args, "wire", "auto"), dataset)
    )
    loader = make_loader(
        dataset, args.batch_size, shuffle=False, num_epochs=1,
        drop_last=False, num_workers=8, wire_format=wire,
    )

    hq: queue.Queue = queue.Queue(maxsize=4)
    _END = object()

    def producer():  # decode-ahead: loader threads run while device computes
        try:
            for b in loader:
                hq.put(b)
            hq.put(_END)
        except BaseException as e:  # noqa: BLE001 — re-raised in consumer
            # same failure-propagation discipline as prefetch_to_device: a
            # mid-sweep decode/IO error must NOT look like clean exhaustion
            # (the sweep would silently truncate with exit code 0)
            hq.put(e)

    threading.Thread(target=producer, daemon=True).start()

    n, t0 = 0, time.monotonic()
    pending = None  # (names, host_frames|None, device_det, count)

    def emit_pending(p):
        nonlocal n
        names, frames, det_dev, k = p
        det = predictor.fetch(det_dev, k)
        for i in range(k):
            frame = frames[i] if frames is not None else None
            _emit(args, names[i], frame, _det_slice(det, i), args.out_dir)
        n += k

    start = 0
    while True:
        item = hq.get()
        if item is _END:
            break
        if isinstance(item, BaseException):
            raise RuntimeError("image_dir pipeline failed; see cause") from item
        k = min(args.batch_size, len(paths) - start)
        names = [str(p) for p in paths[start : start + k]]
        start += args.batch_size
        det = predictor._fwd(
            predictor.state.params, predictor.state.batch_stats,
            jax.tree.map(jnp.asarray, item.images),
        )
        if pending is not None:  # fetch/draw batch k-1 while k computes
            emit_pending(pending)
        frames = np.asarray(item.images) if args.out_dir else None
        pending = (names, frames, det, k)
    if pending is not None:
        emit_pending(pending)
    dt = time.monotonic() - t0
    print(f"{n} images in {dt:.2f}s = {n / dt:.1f} imgs/sec (incl. compile)")


def run_video(args):
    """Streaming demo: continuous batched inference over decoded frames.

    Genuinely continuous (SURVEY.md §3.5 / BASELINE config 5):
      * a reader thread decodes frames into a bounded queue, overlapping
        video decode with device compute;
      * batches form from whatever the queue holds — full `batch_size` when
        the source keeps up, a partial batch after `drain_timeout` when it
        doesn't (a slow source never stalls the stream);
      * the device call for batch N is dispatched before batch N-1's
        detections are fetched/drawn, so transfer/compute/draw overlap;
      * frames are host-resized to model size before transfer (unless
        --host_resize off), ~10x less tunnel traffic than raw 720p.
    """
    import queue
    import threading

    import cv2

    cap = cv2.VideoCapture(args.video)
    if not cap.isOpened():
        raise SystemExit(f"cannot open {args.video}")
    predictor = load_predictor(
        args, batch_size=args.batch_size,
        host_resize=_want_host_resize(args, default=True),
    )
    writer = None
    if args.out_dir:
        Path(args.out_dir).mkdir(parents=True, exist_ok=True)
        fps = cap.get(cv2.CAP_PROP_FPS) or 30
        w = int(cap.get(cv2.CAP_PROP_FRAME_WIDTH))
        h = int(cap.get(cv2.CAP_PROP_FRAME_HEIGHT))
        writer = cv2.VideoWriter(
            str(Path(args.out_dir) / "det_video.mp4"),
            cv2.VideoWriter_fourcc(*"mp4v"), fps, (w, h),
        )

    frame_q: queue.Queue = queue.Queue(maxsize=4 * args.batch_size)
    _END = object()

    def reader():
        while True:
            ok, frame = cap.read()
            if not ok:
                break
            frame_q.put(cv2.cvtColor(frame, cv2.COLOR_BGR2RGB))
        frame_q.put(_END)

    threading.Thread(target=reader, daemon=True).start()

    n, t0 = 0, time.monotonic()
    inflight = None  # (frames, device_det, n) dispatched but not yet drawn

    def emit(frames, det_dev, k):
        nonlocal n
        det = predictor.fetch(det_dev, k)
        for i in range(k):
            if writer is not None:
                drawn = draw_detections(
                    frames[i], det.boxes[i], det.scores[i],
                    det.classes[i], det.valid[i],
                    score_threshold=args.score_threshold,
                )
                writer.write(cv2.cvtColor(drawn, cv2.COLOR_RGB2BGR))
        n += k

    done = False
    while not done:
        item = frame_q.get()  # block for at least one frame
        if item is _END:
            break
        pending = [item]
        deadline = time.monotonic() + args.drain_timeout
        while len(pending) < args.batch_size:
            try:
                item = frame_q.get(timeout=max(deadline - time.monotonic(), 0))
            except queue.Empty:
                break  # source is slow — run the partial batch now
            if item is _END:
                done = True
                break
            pending.append(item)
        det_dev, k = predictor.dispatch(np.stack(pending))
        if inflight is not None:
            emit(*inflight)
        inflight = (pending, det_dev, k)
    if inflight is not None:
        emit(*inflight)
    cap.release()
    if writer is not None:
        writer.release()
    dt = time.monotonic() - t0
    print(f"{n} frames in {dt:.2f}s = {n / dt:.1f} fps (incl. compile)")


def main(argv=None):
    from bdd100k_tpu.utils.compilation_cache import enable_compilation_cache

    enable_compilation_cache()
    args = parse_args(argv)
    if args.out_dir:
        Path(args.out_dir).mkdir(parents=True, exist_ok=True)
    if args.image:
        run_single(args)
    elif args.image_dir:
        run_dir(args)
    elif args.video:
        run_video(args)
    else:
        raise SystemExit("need one of --image / --image_dir / --video")


if __name__ == "__main__":
    main()
