"""mAP evaluator vs hand-built PR fixtures (SURVEY.md §4.2)."""

import numpy as np

from bdd100k_tpu.ops.map_metric import DetectionEvaluator, average_precision


def test_average_precision_perfect():
    r = np.array([0.5, 1.0])
    p = np.array([1.0, 1.0])
    assert abs(average_precision(r, p) - 1.0) < 1e-9


def test_average_precision_known_curve():
    # 1 TP then 1 FP then 1 TP over 2 GT: ranks -> P=[1, .5, 2/3], R=[.5,.5,1]
    r = np.array([0.5, 0.5, 1.0])
    p = np.array([1.0, 0.5, 2.0 / 3.0])
    # all-point: 0.5*1 + 0.5*(2/3)
    assert abs(average_precision(r, p) - (0.5 + 0.5 * 2 / 3)) < 1e-9


def test_eleven_point_interpolation():
    r = np.array([1.0])
    p = np.array([1.0])
    assert abs(average_precision(r, p, eleven_point=True) - 1.0) < 1e-9


def test_perfect_detection_map_is_one():
    ev = DetectionEvaluator(num_classes=3)
    gt = np.array([[0.1, 0.1, 0.4, 0.4], [0.5, 0.5, 0.9, 0.9]])
    ev.add_image(gt, np.array([0.9, 0.8]), np.array([1, 2]), gt, np.array([1, 2]))
    res = ev.compute()
    assert abs(res["mAP"] - 1.0) < 1e-9


def test_false_positive_halves_precision():
    ev = DetectionEvaluator(num_classes=1)
    gt = np.array([[0.1, 0.1, 0.4, 0.4]])
    dets = np.array([[0.1, 0.1, 0.4, 0.4], [0.6, 0.6, 0.9, 0.9]])
    ev.add_image(dets, np.array([0.9, 0.8]), np.array([1, 1]), gt, np.array([1]))
    res = ev.compute()
    # TP first (higher score): AP = 1.0 (recall saturates before the FP)
    assert abs(res["mAP"] - 1.0) < 1e-9
    # Now FP ranked first
    ev2 = DetectionEvaluator(num_classes=1)
    ev2.add_image(
        dets, np.array([0.5, 0.8]), np.array([1, 1]), gt, np.array([1])
    )
    res2 = ev2.compute()
    assert abs(res2["mAP"] - 0.5) < 1e-9


def test_duplicate_detection_is_fp():
    ev = DetectionEvaluator(num_classes=1)
    gt = np.array([[0.1, 0.1, 0.4, 0.4]])
    dets = np.tile(gt, (2, 1))
    ev.add_image(dets, np.array([0.9, 0.8]), np.array([1, 1]), gt, np.array([1]))
    res = ev.compute()
    assert abs(res["mAP"] - 1.0) < 1e-9  # recall 1 at rank 1; dup is FP after


def test_iou_threshold_rejects_loose_box():
    ev = DetectionEvaluator(num_classes=1)
    gt = np.array([[0.0, 0.0, 0.4, 0.4]])
    det = np.array([[0.2, 0.2, 0.6, 0.6]])  # IoU ~ 0.14
    ev.add_image(det, np.array([0.9]), np.array([1]), gt, np.array([1]))
    assert ev.compute(iou_threshold=0.5)["mAP"] == 0.0
    ev2 = DetectionEvaluator(num_classes=1)
    ev2.add_image(det, np.array([0.9]), np.array([1]), gt, np.array([1]))
    assert ev2.compute(iou_threshold=0.1)["mAP"] == 1.0


def test_missing_class_skipped_from_mean():
    ev = DetectionEvaluator(num_classes=10)
    gt = np.array([[0.1, 0.1, 0.4, 0.4]])
    ev.add_image(gt, np.array([0.9]), np.array([1]), gt, np.array([1]))
    res = ev.compute()
    assert abs(res["mAP"] - 1.0) < 1e-9  # classes 2..10 have no GT -> skipped


def test_validity_masks_respected():
    ev = DetectionEvaluator(num_classes=1)
    gt = np.zeros((5, 4))
    gt[0] = [0.1, 0.1, 0.4, 0.4]
    gt_mask = np.array([True, False, False, False, False])
    dets = np.zeros((3, 4))
    dets[0] = [0.1, 0.1, 0.4, 0.4]
    ev.add_image(
        dets,
        np.array([0.9, 0.0, 0.0]),
        np.array([1, 0, 0]),
        gt,
        np.array([1, 1, 1, 1, 1]),
        det_valid=np.array([True, False, False]),
        gt_mask=gt_mask,
    )
    assert abs(ev.compute()["mAP"] - 1.0) < 1e-9


def test_compute_range_coco_style():
    """mAP@[.50:.95]: a detection at IoU ~0.6 vs its GT counts as TP at
    thresholds <= 0.6 and FP above, so the range-mean sits between 0 and
    the @0.50 value."""
    ev = DetectionEvaluator(num_classes=1)
    gt = np.array([[0.0, 0.0, 1.0, 0.5]])
    det = np.array([[0.0, 0.0, 1.0, 0.8]])  # IoU = 0.5/0.8 = 0.625
    ev.add_image(det, np.array([0.9]), np.array([1]), gt, np.array([1]))
    res = ev.compute_range()
    assert len(res["per_iou"]) == 10
    assert res["per_iou"]["0.50"] == 1.0
    assert res["per_iou"]["0.60"] == 1.0
    assert res["per_iou"]["0.65"] == 0.0
    assert abs(res["mAP"] - 0.3) < 1e-9  # TP at .50/.55/.60 of 10 thresholds
