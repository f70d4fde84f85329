"""L3 models: Flax backbones + detection heads (SURVEY.md §2.3).

MXU-friendly by construction: NHWC layout, bfloat16 compute with fp32
params, channel counts multiples of 8/16 so XLA tiles convs onto the
128×128 systolic array without padding waste.
"""

from bdd100k_tpu.models.mobilenet import MobileNetBackbone
from bdd100k_tpu.models.vgg import VGG16Backbone
from bdd100k_tpu.models.ssd import SSDDetector, MultiboxHead
from bdd100k_tpu.models.yolo import YOLODetector, YOLOHead
from bdd100k_tpu.models.losses import ssd_loss, yolo_loss
from bdd100k_tpu.models.detector import build_detector, DetectorBundle
