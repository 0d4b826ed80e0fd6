"""Action detection evaluation (per-class AP at vIoU >= 0.5).

Metric-parity rebuild of /root/reference/lib/evaluation/action_detection.py:
greedy per-class matching where a prediction hits a GT action of the same
video id with trajectory vIoU >= threshold.
"""

from __future__ import annotations

from typing import Dict, List

import numpy as np

from tspn_tpu.evaluation.common import viou, voc_ap


def _detection_pr_per_class(gt_actions, pred_actions, viou_threshold):
    """Greedy matching within one class (action_detection.py:6-31)."""
    order = sorted(pred_actions, key=lambda a: a["score"], reverse=True)
    taken = np.zeros(len(gt_actions), dtype=bool)
    hit_scores = np.full(len(order), -np.inf)
    for pi, pred in enumerate(order):
        best_ov, best_gi = -np.inf, -1
        for gi, gt in enumerate(gt_actions):
            if taken[gi] or pred["id"] != gt["id"]:
                continue
            ov = viou(pred["trajectory"], pred["duration"],
                      gt["trajectory"], gt["duration"])
            if ov >= viou_threshold and ov > best_ov:
                best_ov, best_gi = ov, gi
        if best_gi >= 0:
            taken[best_gi] = True
            hit_scores[pi] = pred["score"]
    tp = np.isfinite(hit_scores)
    cum_tp = np.cumsum(tp).astype(np.float32)
    cum_fp = np.cumsum(~tp).astype(np.float32)
    eps = np.finfo(np.float32).eps
    recall = cum_tp / max(len(gt_actions), eps)
    precision = cum_tp / np.maximum(cum_tp + cum_fp, eps)
    return precision, recall, hit_scores


def evaluate(
    groundtruth: Dict[str, List[dict]],
    prediction: Dict[str, List[dict]],
    viou_threshold: float = 0.5,
    verbose: bool = True,
):
    """Per-class action AP + mAP (action_detection.py:33-98)."""
    gt_classes = {t["category"] for tracks in groundtruth.values() for t in tracks}

    preds_by_class: Dict[str, list] = {}
    for vid, tracks in prediction.items():
        for traj in tracks:
            preds_by_class.setdefault(traj["category"], []).append({
                "id": vid,
                "score": traj["score"],
                "duration": traj["duration"],
                "trajectory": traj["trajectory"],
            })

    if verbose:
        print("Computing average precision AP over {} classes...".format(len(gt_classes)))
    ap_class = {}
    for action in gt_classes:
        if action not in preds_by_class:
            ap_class[action] = 0.0
            continue
        gt_actions = [
            {"id": vid, "duration": t["duration"], "trajectory": t["trajectory"]}
            for vid in groundtruth
            for t in groundtruth[vid]
            if t["category"] == action
        ]
        precision, recall, _ = _detection_pr_per_class(
            gt_actions, preds_by_class[action], viou_threshold
        )
        ap_class[action] = voc_ap(recall, precision)

    mean_ap = float(np.mean(list(ap_class.values()))) if ap_class else 0.0
    if verbose:
        print("=" * 30)
        for i, (category, ap) in enumerate(sorted(ap_class.items())):
            print("{:>2}{:>20}\t{:.4f}".format(i + 1, category, ap))
        print("=" * 30)
        print("{:>22}\t{:.4f}".format("mean AP", mean_ap))
    return mean_ap, ap_class
