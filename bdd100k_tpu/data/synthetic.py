"""Synthetic BDD100K-format dataset generator (SURVEY.md §7 step 2:
"no real dataset on this air-gapped box — generator is mandatory").

Produces driving-scene-shaped images (road trapezoid, sky gradient) with
class-colored rectangles as objects, JPEG-encoded, plus a labels JSON in the
exact BDD100K release format — so the parser, converter, loader, trainer and
evaluator all exercise the real format end-to-end.
"""

from __future__ import annotations

import json
from pathlib import Path

import numpy as np

from bdd100k_tpu.configs.detector_configs import BDD100K_CLASSES
from bdd100k_tpu.data.bdd100k import IMAGE_HEIGHT, IMAGE_WIDTH

# distinct fill color per class so a detector can actually learn the mapping
_CLASS_COLORS = np.asarray(
    [
        [200, 40, 40],    # car
        [240, 140, 30],   # bus
        [150, 90, 40],    # truck
        [40, 200, 60],    # person
        [40, 220, 160],   # rider
        [60, 80, 230],    # bike
        [140, 60, 220],   # motor
        [230, 220, 40],   # traffic light
        [230, 60, 200],   # traffic sign
        [90, 90, 90],     # train
    ],
    np.uint8,
)

_SIZE_RANGES = {  # rough per-class (w, h) pixel ranges at 1280×720
    "car": ((60, 260), (40, 160)),
    "bus": ((120, 400), (80, 240)),
    "truck": ((100, 360), (70, 220)),
    "person": ((20, 60), (50, 160)),
    "rider": ((20, 60), (50, 140)),
    "bike": ((30, 90), (30, 90)),
    "motor": ((30, 90), (30, 90)),
    "traffic light": ((10, 30), (25, 70)),
    "traffic sign": ((15, 50), (15, 50)),
    "train": ((200, 600), (80, 200)),
}


def _render_scene(rng: np.random.RandomState, boxes_px, classes) -> np.ndarray:
    h, w = IMAGE_HEIGHT, IMAGE_WIDTH
    img = np.zeros((h, w, 3), np.uint8)
    # sky gradient
    horizon = h // 2 + rng.randint(-40, 40)
    sky = np.linspace(180, 90, horizon)[:, None]
    img[:horizon] = np.stack(
        [sky * 0.7, sky * 0.8, sky], axis=-1
    ).astype(np.uint8)
    # ground / road
    img[horizon:] = (60, 62, 66)
    yy, xx = np.mgrid[horizon:h, 0:w]
    half_width = (yy - horizon + 1) * 0.9
    road = np.abs(xx - w / 2) < half_width
    img[horizon:][road] = (45, 45, 50)
    # objects (painted far-to-near for plausible occlusion)
    order = np.argsort([b[3] for b in boxes_px])
    for i in order:
        x1, y1, x2, y2 = (int(v) for v in boxes_px[i])
        color = _CLASS_COLORS[classes[i] - 1]
        jitter = rng.randint(-20, 20, 3)
        img[y1:y2, x1:x2] = np.clip(
            color.astype(int) + jitter, 0, 255
        ).astype(np.uint8)
        # darker outline to give gradients some structure
        img[y1 : min(y1 + 2, y2), x1:x2] //= 2
        img[max(y2 - 2, y1) : y2, x1:x2] //= 2
    noise = rng.randint(-8, 8, img.shape)
    return np.clip(img.astype(int) + noise, 0, 255).astype(np.uint8)


def ensure_synthetic_dataset(
    out_dir: str | Path,
    num_images: int = 32,
    seed: int = 0,
    max_objects: int = 12,
    split: str = "train",
) -> Path:
    """Idempotent wrapper: (re)generate only when the existing labels file
    is missing or holds fewer records than requested. Generation is
    sequential from the seed, so a larger existing set's first N records
    are exactly the N-record set — safe to reuse. Prevents one driver's
    smaller --synthetic run from silently shrinking a dataset another run
    is using.

    Multi-process safe: the check-then-generate idempotence races when
    every host runs it on a shared directory, so under `jax.distributed`
    process 0 generates first and the rest wait on a barrier. If the
    directory is NOT shared (e.g. the default /tmp on a real multi-machine
    pod), each machine still needs its own copy — after the barrier, any
    process that cannot see the labels file claims a local O_EXCL lock and
    generates (content is seed-deterministic, so every machine's copy is
    identical); lock losers poll for the labels JSON, which generation
    writes last."""
    out_dir = Path(out_dir)
    labels_path = out_dir / "labels" / f"{split}.json"

    def _complete() -> bool:
        try:
            return len(json.loads(labels_path.read_text())) >= num_images
        except (ValueError, OSError):
            return False

    def _ensure() -> Path:
        if _complete():
            return labels_path
        return generate_synthetic_dataset(
            out_dir, num_images=num_images, seed=seed,
            max_objects=max_objects, split=split,
        )

    def _ensure_claimed() -> None:
        """One generator per (machine, out_dir); others wait on the result."""
        import os
        import time

        out_dir.mkdir(parents=True, exist_ok=True)
        lock = out_dir / f".gen_lock_{split}"
        try:
            os.close(os.open(lock, os.O_CREAT | os.O_EXCL | os.O_WRONLY))
        except FileExistsError:
            deadline = time.monotonic() + 600.0
            while not _complete():
                if time.monotonic() > deadline:
                    raise TimeoutError(
                        f"waited 600s for {labels_path} — a previous "
                        f"generator may have crashed; remove stale {lock} "
                        "and retry"
                    )
                time.sleep(0.5)
            return
        try:
            _ensure()
        finally:
            lock.unlink(missing_ok=True)

    import jax

    if jax.process_count() > 1:
        from jax.experimental import multihost_utils

        if jax.process_index() == 0:
            _ensure()
        multihost_utils.sync_global_devices(f"synthetic_ready_{split}")
        if not _complete():
            # out_dir is host-local and this machine isn't proc 0's
            _ensure_claimed()
        return labels_path
    return _ensure()


def generate_synthetic_dataset(
    out_dir: str | Path,
    num_images: int = 32,
    seed: int = 0,
    max_objects: int = 12,
    split: str = "train",
) -> Path:
    """Writes images/<split>/*.jpg + labels/<split>.json (BDD100K layout).

    Returns the labels JSON path.
    """
    from PIL import Image

    out_dir = Path(out_dir)
    img_dir = out_dir / "images" / split
    img_dir.mkdir(parents=True, exist_ok=True)
    (out_dir / "labels").mkdir(parents=True, exist_ok=True)
    rng = np.random.RandomState(seed)

    records = []
    weathers = ["clear", "rainy", "snowy", "overcast", "foggy"]
    times = ["daytime", "night", "dawn/dusk"]
    for idx in range(num_images):
        n_obj = rng.randint(1, max_objects + 1)
        boxes_px, classes, labels_json = [], [], []
        for _ in range(n_obj):
            cls = int(rng.randint(1, len(BDD100K_CLASSES) + 1))
            name = BDD100K_CLASSES[cls - 1]
            (wmin, wmax), (hmin, hmax) = _SIZE_RANGES[name]
            bw = rng.randint(wmin, wmax + 1)
            bh = rng.randint(hmin, hmax + 1)
            x1 = rng.randint(0, max(IMAGE_WIDTH - bw, 1))
            y1 = rng.randint(IMAGE_HEIGHT // 4, max(IMAGE_HEIGHT - bh, IMAGE_HEIGHT // 4 + 1))
            box = (x1, y1, min(x1 + bw, IMAGE_WIDTH - 1), min(y1 + bh, IMAGE_HEIGHT - 1))
            boxes_px.append(box)
            classes.append(cls)
            labels_json.append(
                {
                    "category": name,
                    "attributes": {
                        "occluded": bool(rng.rand() < 0.3),
                        "truncated": bool(rng.rand() < 0.1),
                    },
                    "box2d": {
                        "x1": float(box[0]),
                        "y1": float(box[1]),
                        "x2": float(box[2]),
                        "y2": float(box[3]),
                    },
                }
            )
        img = _render_scene(rng, boxes_px, classes)
        fname = f"synthetic_{split}_{idx:05d}.jpg"
        Image.fromarray(img).save(img_dir / fname, quality=90)
        records.append(
            {
                "name": fname,
                "attributes": {
                    "weather": weathers[rng.randint(len(weathers))],
                    "scene": "city street",
                    "timeofday": times[rng.randint(len(times))],
                },
                "labels": labels_json,
            }
        )
    labels_path = out_dir / "labels" / f"{split}.json"
    labels_path.write_text(json.dumps(records))
    return labels_path
