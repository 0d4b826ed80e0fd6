import numpy as np
import pytest

from tspn_tpu.detection.eval import evaluate_detections


def _rec(image_id, boxes, classes):
    return {
        "image_id": image_id,
        "annotations": [
            {"bbox": b, "category_id": c, "bbox_mode": "XYXY_ABS"}
            for b, c in zip(boxes, classes)
        ],
    }


def _det(boxes, scores, classes):
    boxes = np.asarray(boxes, np.float32).reshape(-1, 4)
    return {
        "boxes": boxes,
        "scores": np.asarray(scores, np.float32),
        "classes": np.asarray(classes, np.int64),
        "mask": np.ones(len(boxes), bool),
    }


def test_perfect_detections_map_one():
    records = [
        _rec(0, [[10, 10, 50, 50], [60, 60, 90, 90]], [0, 1]),
        _rec(1, [[5, 5, 40, 40]], [0]),
    ]
    detections = {
        0: _det([[10, 10, 50, 50], [60, 60, 90, 90]], [0.9, 0.8], [0, 1]),
        1: _det([[5, 5, 40, 40]], [0.95], [0]),
    }
    mean_ap, ap = evaluate_detections(records, detections)
    assert mean_ap == pytest.approx(1.0)
    assert ap[0] == pytest.approx(1.0) and ap[1] == pytest.approx(1.0)


def test_wrong_class_counts_as_fp():
    records = [_rec(0, [[10, 10, 50, 50]], [0])]
    detections = {0: _det([[10, 10, 50, 50]], [0.9], [1])}
    mean_ap, ap = evaluate_detections(records, detections)
    assert ap[0] == 0.0


def test_duplicate_detections_penalized():
    records = [_rec(0, [[10, 10, 50, 50]], [0])]
    detections = {
        0: _det([[10, 10, 50, 50], [11, 11, 51, 51]], [0.9, 0.8], [0, 0])
    }
    mean_ap, ap = evaluate_detections(records, detections)
    # second hit on a claimed GT is a false positive: AP = area under
    # precision envelope = 1.0 at the single recall step
    assert ap[0] == pytest.approx(1.0)
    detections_rev = {
        0: _det([[11, 11, 51, 51], [10, 10, 50, 50]], [0.8, 0.9], [0, 0])
    }
    # same result regardless of insertion order (sorted by score)
    _, ap2 = evaluate_detections(records, detections_rev)
    assert ap2[0] == pytest.approx(1.0)


def test_low_iou_miss():
    records = [_rec(0, [[10, 10, 50, 50]], [0])]
    detections = {0: _det([[100, 100, 140, 140]], [0.9], [0])}
    _, ap = evaluate_detections(records, detections)
    assert ap[0] == 0.0


def test_coco_protocol_thresholds():
    from tspn_tpu.detection.eval import evaluate_detections_coco

    records = [_rec(0, [[10, 10, 50, 50]], [0])]
    # perfect box: AP = 1 at every threshold
    metrics = evaluate_detections_coco(
        records, {0: _det([[10, 10, 50, 50]], [0.9], [0])}
    )
    assert metrics == {"AP": 1.0, "AP50": 1.0, "AP75": 1.0}
    # 2px-shifted 40px box: IoU = 38^2/(2*40^2-38^2) = 0.822 -> hits at
    # thresholds 0.50..0.80 (7 of 10), misses 0.85+ -> AP = 0.7
    metrics = evaluate_detections_coco(
        records, {0: _det([[12, 12, 52, 52]], [0.9], [0])}
    )
    assert metrics["AP50"] == 1.0 and metrics["AP75"] == 1.0
    assert metrics["AP"] == pytest.approx(0.7)
