"""BDD100K detection-label parsing (SURVEY.md §2.1).

Format (public BDD100K spec): a JSON list (or one JSON per image), each entry
  {"name": "xxx.jpg",
   "attributes": {"weather": ..., "scene": ..., "timeofday": ...},
   "labels": [{"category": "car", "box2d": {"x1":..,"y1":..,"x2":..,"y2":..},
               "attributes": {"occluded": bool, "truncated": bool}, ...}, ...]}

10 detection classes; boxes in pixels on the 1280×720 frames. We normalize
to [0, 1] and map categories to ids 1..10 (0 = background).
"""

from __future__ import annotations

import json
from pathlib import Path
from typing import Iterable

import numpy as np

from bdd100k_tpu.configs.detector_configs import BDD100K_CLASSES

BDD100K_CATEGORY_TO_ID = {name: i + 1 for i, name in enumerate(BDD100K_CLASSES)}
# Common alias spellings seen across BDD100K releases.
_ALIASES = {
    "bicycle": "bike",
    "motorcycle": "motor",
    "pedestrian": "person",
    "traffic_light": "traffic light",
    "traffic_sign": "traffic sign",
}

IMAGE_WIDTH = 1280
IMAGE_HEIGHT = 720


def parse_bdd100k_record(
    record: dict,
    image_width: int = IMAGE_WIDTH,
    image_height: int = IMAGE_HEIGHT,
) -> dict:
    """One image's JSON entry → {name, boxes (N,4) normalized, labels (N,),
    attributes, box_attributes}. Unknown categories (lane/area marks) skipped.
    """
    boxes, labels, box_attrs = [], [], []
    for lab in record.get("labels", []) or []:
        box = lab.get("box2d")
        if box is None:
            continue
        cat = lab.get("category", "")
        cat = _ALIASES.get(cat, cat)
        cls = BDD100K_CATEGORY_TO_ID.get(cat)
        if cls is None:
            continue
        # Clamp both ends: real BDD100K annotations occasionally carry
        # slightly negative or >image-size pixel coords.
        x1 = min(max(box["x1"] / image_width, 0.0), 1.0)
        y1 = min(max(box["y1"] / image_height, 0.0), 1.0)
        x2 = min(max(box["x2"] / image_width, 0.0), 1.0)
        y2 = min(max(box["y2"] / image_height, 0.0), 1.0)
        if x2 <= x1 or y2 <= y1:
            continue
        boxes.append([x1, y1, x2, y2])
        labels.append(cls)
        a = lab.get("attributes", {}) or {}
        box_attrs.append(
            {"occluded": bool(a.get("occluded", False)),
             "truncated": bool(a.get("truncated", False))}
        )
    return {
        "name": record.get("name", ""),
        "boxes": np.asarray(boxes, np.float32).reshape(-1, 4),
        "labels": np.asarray(labels, np.int32),
        "attributes": record.get("attributes", {}) or {},
        "box_attributes": box_attrs,
    }


def load_bdd100k_labels(path: str | Path) -> list[dict]:
    """Load a BDD100K label file: either one JSON list for the whole split
    (the standard release format) or a directory of per-image JSONs."""
    path = Path(path)
    if path.is_dir():
        records: Iterable[dict] = (
            json.loads(p.read_text()) for p in sorted(path.glob("*.json"))
        )
    else:
        data = json.loads(path.read_text())
        records = data if isinstance(data, list) else [data]
    return [parse_bdd100k_record(r) for r in records]


def pad_ground_truth(
    boxes: np.ndarray, labels: np.ndarray, max_boxes: int
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Fixed-size GT padding for static shapes (SURVEY.md §2.1)."""
    n = min(len(boxes), max_boxes)
    out_boxes = np.zeros((max_boxes, 4), np.float32)
    out_labels = np.zeros((max_boxes,), np.int32)
    out_mask = np.zeros((max_boxes,), bool)
    if n:
        out_boxes[:n] = boxes[:n]
        out_labels[:n] = labels[:n]
        out_mask[:n] = True
    return out_boxes, out_labels, out_mask
