"""Video object detection evaluation (trajectory-level per-class AP).

Metric-parity rebuild of
/root/reference/lib/evaluation/video_object_detection.py:12-129: the
graded tIoU (mean of frame-IoU fractions above 0.5/0.7/0.9 thresholds over
the union of frame ids) and VOC-07 per-class AP aggregation.
"""

from __future__ import annotations

from typing import Dict, List, Tuple

import numpy as np

from tspn_tpu.evaluation.common import iou, voc_ap


def trajectory_overlap(gt_trajs: List[dict], pred_traj: dict) -> Tuple[float, int]:
    """Graded temporal IoU of one predicted trajectory against each GT.

    Trajectories are {frame_id(str): (x0, y0, x1, y1)} dicts. Matches
    video_object_detection.py:12-43: per shared frame, count hits at IoU
    thresholds 0.5 / 0.7 / 0.9 (nested), normalize by 3x the union of
    frame ids, return the best-overlapping GT index.
    """
    best_overlap, best_index = 0.0, 0
    for t, gt_traj in enumerate(gt_trajs):
        total = len(set(gt_traj.keys()) | set(pred_traj.keys()))
        hits = 0
        for fid, gt_box in gt_traj.items():
            pred_box = pred_traj.get(fid)
            if pred_box is None:
                continue
            s = iou(gt_box, pred_box)
            hits += (s >= 0.5) + (s >= 0.7) + (s >= 0.9)
        t_iou = hits / (3.0 * total) if total else 0.0
        if t_iou > best_overlap:
            best_overlap, best_index = t_iou, t
    return best_overlap, best_index


def evaluate(
    gt: Dict[str, List[dict]],
    pred: Dict[str, List[dict]],
    use_07_metric: bool = True,
    thresh_t: float = 0.5,
    verbose: bool = True,
):
    """Per-class trajectory AP + mAP (video_object_detection.py:46-129)."""
    gt_classes = sorted({traj["category"] for tracks in gt.values() for traj in tracks})

    preds_by_class: Dict[str, list] = {}
    for vid, tracks in pred.items():
        for traj in tracks:
            preds_by_class.setdefault(traj["category"], []).append(
                (vid, traj["score"], traj["trajectory"])
            )

    if verbose:
        print("Computing average precision AP over {} classes...".format(len(gt_classes)))
    ap_class = {}
    for c in gt_classes:
        if c not in preds_by_class:
            ap_class[c] = 0.0
            continue
        npos = 0
        per_video_gt = {}
        for vid in gt:
            gt_trajs = [t["trajectory"] for t in gt[vid] if t["category"] == c]
            npos += len(gt_trajs)
            per_video_gt[vid] = {"trajectories": gt_trajs, "det": [False] * len(gt_trajs)}

        entries = preds_by_class[c]
        scores = np.array([e[1] for e in entries])
        order = np.argsort(-scores)
        tp = np.zeros(len(entries))
        fp = np.zeros(len(entries))
        for d, idx in enumerate(order):
            vid, _, trajectory = entries[idx]
            # predictions for a video with no GT entry (e.g. evaluating
            # against a GT subset) are false positives, not a KeyError
            record = per_video_gt.get(vid)
            if record is None:
                fp[d] = 1.0
                continue
            overlap, gt_idx = trajectory_overlap(record["trajectories"], trajectory)
            if overlap >= thresh_t and not record["det"][gt_idx]:
                tp[d] = 1.0
                record["det"][gt_idx] = True
            else:
                fp[d] = 1.0

        cum_tp = np.cumsum(tp)
        cum_fp = np.cumsum(fp)
        recall = cum_tp / float(npos)
        precision = cum_tp / np.maximum(cum_tp + cum_fp, np.finfo(np.float64).eps)
        ap_class[c] = voc_ap(recall, precision, use_07_metric)

    ap_sorted = sorted(ap_class.items())
    mean_ap = sum(ap for _, ap in ap_sorted) / len(gt_classes) if gt_classes else 0.0
    if verbose:
        print("=" * 30)
        for i, (category, ap) in enumerate(ap_sorted):
            print("{:>2}{:>20}\t{:.4f}".format(i + 1, category, ap))
        print("=" * 30)
        print("{:>22}\t{:.4f}".format("mean AP", mean_ap))
    return mean_ap, ap_sorted
