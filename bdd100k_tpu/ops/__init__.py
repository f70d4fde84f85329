"""L2 box/anchor ops — pure jittable functions (SURVEY.md §2.2).

Everything here is static-shape, mask-correct, and runs on device. This layer
replaces the reference's host-side NumPy box math (SURVEY.md §2.2: the
reference runs decode + class-wise NMS on host, per image).
"""

from bdd100k_tpu.ops.boxes import (
    area,
    center_to_corner,
    clip_boxes,
    corner_to_center,
    decode_boxes,
    encode_boxes,
    iou_pairwise,
    iou_aligned,
)
from bdd100k_tpu.ops.anchors import (
    ssd_anchors,
    yolo_anchors,
    SSD300_FEATURE_MAPS,
    SSD512_FEATURE_MAPS,
)
from bdd100k_tpu.ops.matching import match_anchors, encode_targets
from bdd100k_tpu.ops.mining import hard_negative_mask
from bdd100k_tpu.ops.nms import batched_class_nms, class_nms, nms_single_class
from bdd100k_tpu.ops.postprocess import postprocess, PostprocessConfig
from bdd100k_tpu.ops.map_metric import DetectionEvaluator, average_precision
