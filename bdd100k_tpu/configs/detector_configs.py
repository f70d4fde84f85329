"""Model configs for the three reference detector variants (BASELINE.md)."""

from __future__ import annotations

import dataclasses

from bdd100k_tpu.ops.anchors import (
    SSD300_FEATURE_MAPS,
    SSD512_FEATURE_MAPS,
    YOLO_BDD_PRIORS,
    FeatureMapSpec,
)
from bdd100k_tpu.ops.postprocess import PostprocessConfig

# BDD100K detection classes (SURVEY.md §2.1); ids 1..10, 0 = background.
BDD100K_CLASSES = (
    "car",
    "bus",
    "truck",
    "person",
    "rider",
    "bike",
    "motor",
    "traffic light",
    "traffic sign",
    "train",
)


@dataclasses.dataclass(frozen=True)
class DetectorConfig:
    name: str
    image_size: int
    backbone: str = "mobilenet"            # "mobilenet" | "vgg16"
    head: str = "ssd"                      # "ssd" | "yolo"
    num_classes: int = len(BDD100K_CLASSES)
    width: float = 1.0                     # MobileNet width multiplier
    feature_maps: tuple[FeatureMapSpec, ...] = SSD300_FEATURE_MAPS
    yolo_grids: tuple[int, ...] = ()
    yolo_priors: tuple = ()
    match_threshold: float = 0.5
    neg_pos_ratio: float = 3.0
    postprocess: PostprocessConfig = PostprocessConfig()
    # anchor↔GT matcher backend: "auto" → fused Pallas kernel on TPU,
    # XLA elsewhere; "xla" | "pallas" force one (identical outputs).
    matcher_impl: str = "auto"
    # inference quantization: "none" | "int8" (post-training dynamic int8
    # for dense convs — rides the v5e int8 MXU at 2× the bf16 peak;
    # checkpoints are interchangeable, see models/layers.py QuantConv) |
    # "int8_static" (frozen activation scales — calibration protocol and
    # helpers in models/quant.py; kills the per-layer amax pass)
    quant: str = "none"

    @property
    def num_anchors(self) -> int:
        if self.head == "yolo":
            return sum(
                g * g * len(p) for g, p in zip(self.yolo_grids, self.yolo_priors)
            )
        return sum(f.size * f.size * f.num_boxes for f in self.feature_maps)


# BASELINE config 1: SSD-MobileNet 300×300 (batch=1 inference incl. NMS).
# per_class_topk=100: measured mAP delta vs 200 is 0.0000 on the committed
# trained artifact (scripts/ablate_postprocess.py, 64 held-out scenes) and
# the device postprocess drops 131→101 us/img (BENCH_MATRIX "NMS backend
# matrix"). The VGG512 config keeps 200 (−0.004 at 100).
SSD_MOBILENET_300 = DetectorConfig(
    name="ssd_mobilenet_300",
    image_size=300,
    backbone="mobilenet",
    head="ssd",
    feature_maps=SSD300_FEATURE_MAPS,
    postprocess=PostprocessConfig(
        score_mode="softmax", decode_mode="ssd", per_class_topk=100
    ),
)

# BASELINE config 2: SSD-VGG16 512×512 (batch=32 eval, on-device NMS).
SSD_VGG16_512 = DetectorConfig(
    name="ssd_vgg16_512",
    image_size=512,
    backbone="vgg16",
    head="ssd",
    feature_maps=SSD512_FEATURE_MAPS,
    postprocess=PostprocessConfig(score_mode="softmax", decode_mode="ssd"),
)

# BASELINE config 3: YOLO-style multi-scale head (batch=64 train step).
# 384 input → grids 48/24/12 at strides 8/16/32.
YOLO_MOBILENET_384 = DetectorConfig(
    name="yolo_mobilenet_384",
    image_size=384,
    backbone="mobilenet",
    head="yolo",
    yolo_grids=(48, 24, 12),
    yolo_priors=YOLO_BDD_PRIORS,
    # k=100: mAP delta 0.0000 vs 200 on the committed artifact (same
    # ablation as ssd_mobilenet_300 above)
    postprocess=PostprocessConfig(
        score_mode="sigmoid", decode_mode="yolo", per_class_topk=100
    ),
)

def tiny_test_config(head: str = "ssd") -> DetectorConfig:
    """Miniature configs (64×64 input, width-0.25 MobileNet) for fast
    compiles in tests and the multi-chip dry run."""
    from bdd100k_tpu.ops.anchors import make_ssd_feature_maps

    if head == "ssd":
        return DetectorConfig(
            name="ssd_tiny_64",
            image_size=64,
            backbone="mobilenet",
            head="ssd",
            width=0.25,
            feature_maps=make_ssd_feature_maps(
                map_sizes=(8, 4, 2), boxes_per_map=(4, 6, 4)
            ),
        )
    return DetectorConfig(
        name="yolo_tiny_64",
        image_size=64,
        backbone="mobilenet",
        head="yolo",
        width=0.25,
        yolo_grids=(8, 4, 2),
        yolo_priors=YOLO_BDD_PRIORS,
        postprocess=PostprocessConfig(score_mode="sigmoid", decode_mode="yolo"),
    )


def apply_yolo_priors(cfg: DetectorConfig, path: str) -> DetectorConfig:
    """Replace a YOLO config's anchor priors with a fitted set — the JSON
    written by `scripts/kmeans_priors.py --out` (nested [scale][prior][w,h]).

    Head param shapes depend only on priors-per-scale, so a checkpoint
    trained with one prior set restores under another of the same ks
    (anchor GEOMETRY changes; continue training or re-evaluate accordingly).
    """
    import json

    raw = json.loads(open(path).read())
    priors = tuple(tuple((float(w), float(h)) for w, h in s) for s in raw)
    if cfg.head != "yolo":
        raise ValueError(f"--yolo_priors needs a YOLO config, got {cfg.name}")
    if len(priors) != len(cfg.yolo_grids):
        raise ValueError(
            f"{path} has {len(priors)} scales; config {cfg.name} expects "
            f"{len(cfg.yolo_grids)}"
        )
    return dataclasses.replace(cfg, yolo_priors=priors)


_CONFIGS = {
    c.name: c for c in (SSD_MOBILENET_300, SSD_VGG16_512, YOLO_MOBILENET_384)
}


def get_config(name: str) -> DetectorConfig:
    if name == "ssd_tiny_64":  # second-scale compiles, for CLI smoke tests
        return tiny_test_config("ssd")
    if name == "yolo_tiny_64":
        return tiny_test_config("yolo")
    if name not in _CONFIGS:
        raise KeyError(
            f"unknown config {name!r}; have "
            f"{sorted(_CONFIGS) + ['ssd_tiny_64', 'yolo_tiny_64']}"
        )
    return _CONFIGS[name]
