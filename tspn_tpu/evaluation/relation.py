"""Visual relation detection / tagging evaluation.

Metric-parity rebuild of
/root/reference/lib/evaluation/visual_relation_detection.py:8-121:
relation detection mAP, Recall@{50,100,1000}, tagging Precision@{1,5,10}.
The greedy GT matching is restructured around per-triplet GT grouping so
the inner loop only touches same-triplet ground truth (vIoU runs per
(pred, gt) probe through the native kernel), but scores, ordering, and
tie behavior are identical.
"""

from __future__ import annotations

from collections import defaultdict
from typing import Dict, List, Tuple

import numpy as np

from tspn_tpu.evaluation.common import voc_ap
# native C++ vIoU when built (tools/build_native.sh), NumPy otherwise —
# identical values either way (tests/test_native.py)
from tspn_tpu.native import viou


def eval_detection_scores(
    gt_relations: List[dict], pred_relations: List[dict], viou_threshold: float
) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Greedy score-ordered matching of predictions to GT relations.

    A prediction hits iff an unmatched GT shares its exact triplet and
    min(subject vIoU, object vIoU) >= viou_threshold; among candidates the
    highest-overlap GT is consumed. Returns (precision, recall, hit_scores)
    exactly as the reference (visual_relation_detection.py:8-36).
    """
    order = sorted(range(len(pred_relations)),
                   key=lambda i: pred_relations[i]["score"], reverse=True)
    gt_by_triplet: Dict[tuple, List[int]] = defaultdict(list)
    for gi, gt in enumerate(gt_relations):
        gt_by_triplet[tuple(gt["triplet"])].append(gi)

    gt_taken = np.zeros(len(gt_relations), dtype=bool)
    hit_scores = np.full(len(pred_relations), -np.inf)
    for rank, pi in enumerate(order):
        pred = pred_relations[pi]
        best_ov, best_gi = -np.inf, -1
        for gi in gt_by_triplet.get(tuple(pred["triplet"]), ()):
            if gt_taken[gi]:
                continue
            gt = gt_relations[gi]
            s_ov = viou(pred["sub_traj"], pred["duration"], gt["sub_traj"], gt["duration"])
            o_ov = viou(pred["obj_traj"], pred["duration"], gt["obj_traj"], gt["duration"])
            ov = min(s_ov, o_ov)
            if ov >= viou_threshold and ov > best_ov:
                best_ov, best_gi = ov, gi
        if best_gi >= 0:
            gt_taken[best_gi] = True
            hit_scores[rank] = pred["score"]

    tp = np.isfinite(hit_scores)
    cum_tp = np.cumsum(tp).astype(np.float32)
    cum_fp = np.cumsum(~tp).astype(np.float32)
    eps = np.finfo(np.float32).eps
    recall = cum_tp / max(len(gt_relations), eps)
    precision = cum_tp / np.maximum(cum_tp + cum_fp, eps)
    return precision, recall, hit_scores


def eval_tagging_scores(
    gt_relations: List[dict], pred_relations: List[dict]
) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Triplet-set tagging precision (trajectories ignored).

    Matches /root/reference/lib/evaluation/visual_relation_detection.py:39-60.
    """
    order = sorted(pred_relations, key=lambda r: r["score"], reverse=True)
    gt_triplets = {tuple(r["triplet"]) for r in gt_relations}
    seen = set()
    hit_scores = []
    for r in order:
        t = tuple(r["triplet"])
        if t in seen:
            continue
        seen.add(t)
        hit_scores.append(r["score"] if t in gt_triplets else -np.inf)
    hit_scores = np.asarray(hit_scores, dtype=np.float64)
    tp = np.isfinite(hit_scores)
    cum_tp = np.cumsum(tp).astype(np.float32)
    cum_fp = np.cumsum(~tp).astype(np.float32)
    eps = np.finfo(np.float32).eps
    recall = cum_tp / max(len(gt_triplets), eps)
    precision = cum_tp / np.maximum(cum_tp + cum_fp, eps)
    return precision, recall, hit_scores


def evaluate(
    groundtruth: Dict[str, List[dict]],
    prediction: Dict[str, List[dict]],
    viou_threshold: float = 0.5,
    det_nreturns: Tuple[int, ...] = (50, 100, 1000),
    tag_nreturns: Tuple[int, ...] = (1, 5, 10),
    verbose: bool = True,
):
    """Aggregate relation detection + tagging metrics over a video set.

    Matches /root/reference/lib/evaluation/visual_relation_detection.py:63-121.
    Returns (mean_ap, recall_at_n, mean_precision_at_n).
    """
    video_ap = {}
    pooled_scores = defaultdict(list)
    pooled_tp = defaultdict(list)
    prec_at_n = defaultdict(list)
    total_gt = 0
    if verbose:
        print("Computing average precision AP over {} videos...".format(len(groundtruth)))
    for vid, gt_relations in groundtruth.items():
        if len(gt_relations) == 0:
            continue
        total_gt += len(gt_relations)
        preds = prediction.get(vid, [])
        det_prec, det_rec, det_scores = eval_detection_scores(
            gt_relations, preds, viou_threshold
        )
        video_ap[vid] = voc_ap(det_rec, det_prec)
        tp = np.isfinite(det_scores)
        for nre in det_nreturns:
            cut = min(nre, det_scores.size)
            pooled_scores[nre].append(det_scores[:cut])
            pooled_tp[nre].append(tp[:cut])
        tag_prec, _, _ = eval_tagging_scores(gt_relations, preds)
        for nre in tag_nreturns:
            cut = min(nre, tag_prec.size)
            prec_at_n[nre].append(float(tag_prec[cut - 1]) if cut > 0 else 0.0)

    mean_ap = float(np.mean(list(video_ap.values()))) if video_ap else 0.0
    rec_at_n = {}
    eps = np.finfo(np.float32).eps
    for nre in det_nreturns:
        scores = np.concatenate(pooled_scores[nre]) if pooled_scores[nre] else np.array([])
        tps = np.concatenate(pooled_tp[nre]) if pooled_tp[nre] else np.array([], dtype=bool)
        if scores.size == 0:
            rec_at_n[nre] = 0.0
            continue
        # reference ordering: argsort ascending then reversed
        tps = tps[np.argsort(scores)[::-1]]
        cum_tp = np.cumsum(tps).astype(np.float32)
        rec_at_n[nre] = float(cum_tp[-1] / max(total_gt, eps))
    mprec_at_n = {nre: float(np.mean(prec_at_n[nre])) if prec_at_n[nre] else 0.0
                  for nre in tag_nreturns}

    if verbose:
        print("detection mean AP (used in challenge): {}".format(mean_ap))
        for nre in det_nreturns:
            print("detection recall@{}: {}".format(nre, rec_at_n[nre]))
        for nre in tag_nreturns:
            print("tagging precision@{}: {}".format(nre, mprec_at_n[nre]))
    return mean_ap, rec_at_n, mprec_at_n
