"""Detection visualization (SURVEY.md §2.6): class-colored boxes + scores.

cv2 when available (matches the reference's demo path), PIL fallback.
"""

from __future__ import annotations

import numpy as np

from bdd100k_tpu.configs.detector_configs import BDD100K_CLASSES

# one distinct BGR-ish color per class id (1..10)
_COLORS = [
    (66, 135, 245), (245, 130, 48), (60, 180, 75), (255, 225, 25),
    (230, 25, 75), (145, 30, 180), (70, 240, 240), (240, 50, 230),
    (210, 245, 60), (0, 128, 128),
]


def draw_detections(
    image: np.ndarray,
    boxes: np.ndarray,
    scores: np.ndarray,
    classes: np.ndarray,
    valid: np.ndarray | None = None,
    class_names=BDD100K_CLASSES,
    score_threshold: float = 0.0,
) -> np.ndarray:
    """Draw normalized corner boxes on an HWC uint8 image; returns a copy."""
    img = np.ascontiguousarray(image.copy())
    h, w = img.shape[:2]
    keep = np.asarray(scores) >= score_threshold
    if valid is not None:
        keep &= np.asarray(valid).astype(bool)
    try:
        import cv2

        for box, score, cls in zip(
            np.asarray(boxes)[keep], np.asarray(scores)[keep],
            np.asarray(classes)[keep],
        ):
            x1, y1, x2, y2 = (
                int(box[0] * w), int(box[1] * h), int(box[2] * w), int(box[3] * h)
            )
            color = _COLORS[(int(cls) - 1) % len(_COLORS)]
            cv2.rectangle(img, (x1, y1), (x2, y2), color, 2)
            label = f"{class_names[int(cls) - 1]} {score:.2f}"
            cv2.putText(
                img, label, (x1, max(y1 - 4, 10)),
                cv2.FONT_HERSHEY_SIMPLEX, 0.45, color, 1, cv2.LINE_AA,
            )
        return img
    except ImportError:
        from PIL import Image, ImageDraw

        pil = Image.fromarray(img)
        draw = ImageDraw.Draw(pil)
        for box, score, cls in zip(
            np.asarray(boxes)[keep], np.asarray(scores)[keep],
            np.asarray(classes)[keep],
        ):
            xy = (box[0] * w, box[1] * h, box[2] * w, box[3] * h)
            color = tuple(_COLORS[(int(cls) - 1) % len(_COLORS)])
            draw.rectangle(xy, outline=color, width=2)
            draw.text(
                (xy[0], max(xy[1] - 12, 0)),
                f"{class_names[int(cls) - 1]} {score:.2f}",
                fill=color,
            )
        return np.asarray(pil)
