"""Utils coverage: metrics logger (JSONL contract) and visualization."""

import json

import numpy as np

from bdd100k_tpu.utils.metrics import MetricsLogger
from bdd100k_tpu.utils.viz import draw_detections


def test_metrics_logger_jsonl(tmp_path):
    logger = MetricsLogger(tmp_path, "train", stdout=False)
    logger.log(1, {"loss": 2.5, "grad_norm": np.float32(1.25)})
    logger.log(2, {"loss": 2.0, "skipme": object()})
    logger.close()
    lines = [
        json.loads(l)
        for l in (tmp_path / "train.jsonl").read_text().splitlines()
    ]
    assert lines[0]["step"] == 1 and lines[0]["loss"] == 2.5
    assert lines[0]["grad_norm"] == 1.25
    assert lines[1]["loss"] == 2.0 and "skipme" not in lines[1]


def test_draw_detections_modifies_copy():
    img = np.zeros((100, 200, 3), np.uint8)
    boxes = np.array([[0.1, 0.1, 0.5, 0.5], [0.6, 0.2, 0.9, 0.8]], np.float32)
    scores = np.array([0.9, 0.05], np.float32)
    classes = np.array([1, 2], np.int32)
    valid = np.array([True, True])
    out = draw_detections(
        img, boxes, scores, classes, valid, score_threshold=0.5
    )
    assert out.shape == img.shape
    assert img.sum() == 0            # original untouched
    assert out.sum() > 0             # box 1 drawn
    # the low-score box region stays empty (threshold filtered)
    assert out[30:70, 130:170].sum() == 0


def test_server_warm_is_noop_on_cpu():
    """On the CPU backend (tests) the server warm must not spawn a compile
    thread — it would contend for the single core and desync the
    lockstepped multi-host tests (utils/server_warm.py gate)."""
    from bdd100k_tpu.configs import get_config
    from bdd100k_tpu.models.detector import build_detector
    from bdd100k_tpu.utils.server_warm import start_server_warm

    handle = start_server_warm(build_detector(get_config("ssd_mobilenet_300")))
    handle.join(timeout=5)
    assert handle.seconds == 0.0
    assert handle.error is None
