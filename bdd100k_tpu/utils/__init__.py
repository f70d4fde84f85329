"""Aux subsystems (SURVEY.md §5): checkpointing, metrics, viz, profiling."""

from bdd100k_tpu.utils.checkpoint import CheckpointManager
from bdd100k_tpu.utils.metrics import MetricsLogger
from bdd100k_tpu.utils.viz import draw_detections
