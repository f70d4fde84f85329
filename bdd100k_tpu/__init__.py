"""bdd100k_tpu — TPU-native road-object detection framework for BDD100K.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of the reference
repo ``YoungYoung619/road-object-detection-for-bdd100k`` (see SURVEY.md; the
reference checkout at /root/reference was empty at survey time, so behavior
specs follow SURVEY.md §2 / the SSD paper arXiv:1512.02325).

Layer map (SURVEY.md §1.2):
  ops/       — L2 box/anchor math: IoU, encode/decode, matching, mining,
               NMS (XLA + fused Pallas postprocess), mAP.
  models/    — L3 Flax models: VGG16 / MobileNet backbones, SSD multibox
               heads, YOLO-style multi-scale head, losses.
  data/      — L1 input pipeline: BDD100K JSON parser, record converter,
               host decode workers, jitted fused augment, HBM prefetch.
  parallel/  — L4 jax.sharding mesh + pjit/shard_map data-parallel scale-out.
  configs/   — dataclass model/train configs mirroring the reference CLIs.
  train / evaluate / infer — L5 drivers.
"""

__version__ = "0.1.0"
