"""Frame-level detection evaluation (per-class AP / mAP).

The reference's detector eval (/root/reference/detectron/eval.py) is a
non-runnable fragment (undefined cfg, balloon-dataset names); this is a
working VOC-style evaluator over COCO-format records + fixed-size
detection dicts from FasterRCNN.detect: per class, predictions sorted by
score greedily match unclaimed GT at IoU >= threshold; AP via the exact
PR-envelope integration shared with the video evaluators.
"""

from __future__ import annotations

from collections import defaultdict
from functools import lru_cache
from typing import Dict, List, Tuple

import numpy as np

from tspn_tpu.evaluation.common import voc_ap


def _frame_iou(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    lt = np.maximum(a[:, None, :2], b[None, :, :2])
    rb = np.minimum(a[:, None, 2:], b[None, :, 2:])
    wh = np.clip(rb - lt, 0, None)
    inter = wh[..., 0] * wh[..., 1]
    area = lambda x: np.clip(x[:, 2] - x[:, 0], 0, None) * np.clip(  # noqa: E731
        x[:, 3] - x[:, 1], 0, None
    )
    union = area(a)[:, None] + area(b)[None, :] - inter
    return np.where(union > 0, inter / union, 0.0)


def evaluate_detections(
    records: List[dict],
    detections: Dict[int, dict],
    iou_threshold: float = 0.5,
) -> Tuple[float, Dict[int, float]]:
    """records: COCO-format dicts (tspn_tpu.detection.coco_format);
    detections: {image_id: {boxes (D, 4), scores (D,), classes (D,),
    mask (D,)}}. Returns (mAP over classes with GT, per-class AP)."""
    return _evaluate_at_threshold(records, detections, iou_threshold)


def evaluate_detections_coco(
    records: List[dict],
    detections: Dict[int, dict],
) -> Dict[str, float]:
    """COCO-protocol summary metrics (the reference's detector eval
    delegates to detectron2's COCOEvaluator, detectron/train.py:52-58):
    AP = mean over IoU thresholds 0.50:0.95:0.05, plus AP50 / AP75.
    Returns {"AP": ..., "AP50": ..., "AP75": ...}."""
    thresholds = np.arange(0.50, 0.96, 0.05)
    maps = {
        round(float(t), 2): _evaluate_at_threshold(records, detections, float(t))[0]
        for t in thresholds
    }
    return {
        "AP": float(np.mean(list(maps.values()))),
        "AP50": maps[0.5],
        "AP75": maps[0.75],
    }


def _evaluate_at_threshold(
    records: List[dict],
    detections: Dict[int, dict],
    iou_threshold: float,
) -> Tuple[float, Dict[int, float]]:
    gt_by_class: Dict[int, Dict[int, np.ndarray]] = defaultdict(dict)
    for rec in records:
        by_cls = defaultdict(list)
        for ann in rec["annotations"]:
            by_cls[ann["category_id"]].append(ann["bbox"])
        for c, boxes in by_cls.items():
            gt_by_class[c][rec["image_id"]] = np.asarray(boxes, np.float64)

    preds_by_class: Dict[int, list] = defaultdict(list)
    for image_id, det in detections.items():
        mask = np.asarray(det["mask"], bool)
        for box, score, cls in zip(
            np.asarray(det["boxes"])[mask],
            np.asarray(det["scores"])[mask],
            np.asarray(det["classes"])[mask],
        ):
            preds_by_class[int(cls)].append((image_id, float(score), box))

    ap_per_class: Dict[int, float] = {}
    for c, gt_map in gt_by_class.items():
        npos = sum(len(v) for v in gt_map.values())
        preds = sorted(preds_by_class.get(c, []), key=lambda x: -x[1])
        claimed = {img: np.zeros(len(v), bool) for img, v in gt_map.items()}
        tp = np.zeros(len(preds))
        fp = np.zeros(len(preds))
        for i, (img, _score, box) in enumerate(preds):
            gts = gt_map.get(img)
            if gts is None or not len(gts):
                fp[i] = 1
                continue
            ious = _frame_iou(np.asarray(box, np.float64)[None], gts)[0]
            ious[claimed[img]] = -1
            j = int(np.argmax(ious))
            if ious[j] >= iou_threshold:
                tp[i] = 1
                claimed[img][j] = True
            else:
                fp[i] = 1
        cum_tp, cum_fp = np.cumsum(tp), np.cumsum(fp)
        recall = cum_tp / max(npos, 1)
        precision = cum_tp / np.maximum(cum_tp + cum_fp, np.finfo(np.float64).eps)
        ap_per_class[c] = voc_ap(recall, precision) if len(preds) else 0.0

    mean_ap = float(np.mean(list(ap_per_class.values()))) if ap_per_class else 0.0
    return mean_ap, ap_per_class


@lru_cache(maxsize=None)
def _jitted_detect(model, tta: bool):
    """One jitted detect per (model, tta), shared across eval rounds —
    a fresh jit closure per call would re-trace every image shape on
    every in-training eval invocation."""
    import jax

    from tspn_tpu.detection.rcnn import FasterRCNN

    method = FasterRCNN.detect_tta if tta else FasterRCNN.detect
    return jax.jit(lambda p, im: model.apply({"params": p}, im, method=method))


def run_detector_eval(
    model, params, records: List[dict], image_loader=None, tta: bool = False,
    train_cfg=None,
):
    """Run FasterRCNN.detect over records and evaluate; image_loader maps
    a record -> (H, W, 3) float image (defaults to the train module's).
    tta=True merges detections with the horizontal-flip augmentation
    (FasterRCNN.detect_tta — detectron2 GeneralizedRCNNWithTTA parity).

    train_cfg (a DetectorTrainConfig): apply the TRAINING input policy to
    eval images (letterbox / shortest_edge resize) and map detected boxes
    back to original coordinates — evaluating at raw scales a model never
    trained on systematically depresses mAP (detectron2 resizes test
    inputs with the same ResizeShortestEdge).
    """
    import jax.numpy as jnp

    from tspn_tpu.detection.train import (
        input_bucket_shape,
        letterbox,
        load_record_image,
        resize_shortest_edge,
    )

    loader = image_loader or load_record_image
    detect = _jitted_detect(model, tta)
    no_boxes = np.zeros((0, 4), np.float32)
    detections = {}
    for rec in records:
        img = loader(rec)
        scale = 1.0
        if train_cfg is not None:
            if train_cfg.input_policy == "letterbox":
                img, _, scale = letterbox(img, no_boxes, train_cfg.image_size)
            else:
                h0, w0 = img.shape[:2]
                img, _, scale = resize_shortest_edge(
                    img, no_boxes, train_cfg.min_size, train_cfg.max_size
                )
                # zero-pad into the TRAINING orientation bucket: unpadded
                # variable shapes would retrace/recompile the jitted
                # detect per distinct resolution (minutes each over the
                # dev tunnel), and the padded canvas matches the input
                # distribution the model trained on (train.py make_batch)
                bh, bw = input_bucket_shape(h0, w0, train_cfg)
                canvas = np.zeros((bh, bw, 3), np.float32)
                canvas[: img.shape[0], : img.shape[1]] = img
                img = canvas
        out = detect(params, jnp.asarray(img))
        out = {k: np.asarray(v) for k, v in out.items()}
        out["boxes"] = out["boxes"] / scale  # back to annotation coords
        detections[rec["image_id"]] = out
    return evaluate_detections(records, detections)
