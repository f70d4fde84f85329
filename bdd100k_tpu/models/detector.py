"""Detector assembly: config → (model, anchors, postprocess) bundle.

The single construction point used by the train/eval/infer drivers and the
benchmarks — mirrors the reference's per-model config dicts (SURVEY.md §5.6)
but strongly typed.
"""

from __future__ import annotations

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp

from bdd100k_tpu.configs.detector_configs import DetectorConfig
from bdd100k_tpu.models.mobilenet import MobileNetBackbone
from bdd100k_tpu.models.vgg import VGG16Backbone
from bdd100k_tpu.models.ssd import SSDDetector
from bdd100k_tpu.models.yolo import YOLODetector
from bdd100k_tpu.ops import anchors as anchor_ops
from bdd100k_tpu.ops.nms import Detections
from bdd100k_tpu.ops.postprocess import postprocess


@dataclasses.dataclass
class DetectorBundle:
    config: DetectorConfig
    model: Any                      # flax Module
    anchors: jnp.ndarray            # (A, 4) center format
    cell_sizes: jnp.ndarray | None  # (A,) for YOLO decode, else None

    def init(self, rng: jax.Array, batch_size: int = 1) -> dict:
        # One jitted program instead of eager per-param init: on this box
        # every eager dispatch pays ~10-30 ms of tunnel latency, so the
        # hundreds of initializer/transfer ops in a flax init cost >2 min
        # eager but one dispatch (plus a cacheable compile) under jit.
        images = jnp.zeros(
            (batch_size, self.config.image_size, self.config.image_size, 3),
            jnp.float32,
        )
        init_fn = jax.jit(self.model.init, static_argnames="train")
        return init_fn(rng, images, train=False)

    def apply(self, variables, images, train: bool = False, **kw):
        return self.model.apply(variables, images, train=train, **kw)

    def postprocess(self, loc_preds, cls_preds) -> Detections:
        return postprocess(
            loc_preds,
            cls_preds,
            self.anchors,
            self.config.postprocess,
            cell_sizes=self.cell_sizes,
        )


def _build_backbone(config: DetectorConfig, dtype):
    if config.backbone == "mobilenet":
        return MobileNetBackbone(
            width=config.width, dtype=dtype, quant=config.quant
        )
    if config.backbone == "vgg16":
        return VGG16Backbone(dtype=dtype, quant=config.quant)
    raise ValueError(f"unknown backbone {config.backbone!r}")


def build_detector(
    config: DetectorConfig, dtype=jnp.bfloat16
) -> DetectorBundle:
    backbone = _build_backbone(config, dtype)
    if config.head == "ssd":
        # MobileNet taps 3 maps (strides 8/16/32); VGG taps 2 (conv4_3, fc7).
        model = SSDDetector(
            backbone=backbone,
            feature_maps=config.feature_maps,
            num_classes=config.num_classes,
            dtype=dtype,
            quant=config.quant,
        )
        anchors = anchor_ops.ssd_anchors(config.feature_maps)
        cell_sizes = None
    elif config.head == "yolo":
        model = YOLODetector(
            backbone=backbone,
            priors_per_scale=tuple(len(p) for p in config.yolo_priors),
            num_classes=config.num_classes,
            dtype=dtype,
            quant=config.quant,
        )
        anchors = anchor_ops.yolo_anchors(config.yolo_grids, config.yolo_priors)
        cell_sizes = anchor_ops.yolo_cell_sizes(
            config.yolo_grids, config.yolo_priors
        )
    else:
        raise ValueError(f"unknown head {config.head!r}")
    assert anchors.shape[0] == config.num_anchors
    return DetectorBundle(config, model, anchors, cell_sizes)
