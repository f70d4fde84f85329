"""Dataclass configs — one per reference benchmark config (SURVEY.md §5.6).

All "constants most likely to differ from the reference" (encode variances,
NMS thresholds, crop-sampler params) live here or in PostprocessConfig so
re-verification against the real reference is a one-file diff (SURVEY.md §7).
"""

from bdd100k_tpu.configs.detector_configs import (
    BDD100K_CLASSES,
    DetectorConfig,
    SSD_MOBILENET_300,
    SSD_VGG16_512,
    YOLO_MOBILENET_384,
    apply_yolo_priors,
    get_config,
)
from bdd100k_tpu.configs.train_configs import TrainConfig
