"""Shared evaluation math: VOC AP, frame IoU, volumetric trajectory IoU.

Numerically matches the reference implementation
(/root/reference/lib/evaluation/common.py:4-106) including its +1-pixel
area convention and duration-intersection handling, but the per-frame
Python loops of `viou` are replaced by vectorized NumPy over the whole
overlap window.
"""

from __future__ import annotations

import numpy as np


def voc_ap(recall: np.ndarray, precision: np.ndarray, use_07_metric: bool = False) -> float:
    """PASCAL VOC average precision from a precision/recall curve.

    Matches /root/reference/lib/evaluation/common.py:4-37 (both the VOC-07
    11-point variant and the exact area-under-envelope variant).
    """
    recall = np.asarray(recall, dtype=np.float64)
    precision = np.asarray(precision, dtype=np.float64)
    if use_07_metric:
        ap = 0.0
        for t in np.arange(0.0, 1.1, 0.1):
            mask = recall >= t
            p = float(np.max(precision[mask])) if mask.any() else 0.0
            ap += p / 11.0
        return ap
    # Exact AP: envelope the precision curve, then integrate over recall steps.
    r = np.concatenate(([0.0], recall, [1.0]))
    p = np.concatenate(([0.0], precision, [0.0]))
    # running max from the right = precision envelope
    p = np.maximum.accumulate(p[::-1])[::-1]
    steps = np.flatnonzero(r[1:] != r[:-1])
    return float(np.sum((r[steps + 1] - r[steps]) * p[steps + 1]))


def iou(box_a, box_b) -> float:
    """Single-frame IoU with the reference's +1 pixel convention.

    Matches /root/reference/lib/evaluation/common.py:40-62.
    """
    ax0, ay0, ax1, ay1 = box_a[0], box_a[1], box_a[2], box_a[3]
    bx0, by0, bx1, by1 = box_b[0], box_b[1], box_b[2], box_b[3]
    area_a = (ax1 - ax0 + 1) * (ay1 - ay0 + 1)
    area_b = (bx1 - bx0 + 1) * (by1 - by0 + 1)
    iw = max(0, min(ax1, bx1) - max(ax0, bx0) + 1)
    ih = max(0, min(ay1, by1) - max(ay0, by0) + 1)
    inter = iw * ih
    return inter * 1.0 / (area_a + area_b - inter)


def _traj_volume(boxes: np.ndarray) -> float:
    """Summed +1-convention box area over all frames of a trajectory."""
    if boxes.size == 0:
        return 0.0
    return float(
        np.sum((boxes[:, 2] - boxes[:, 0] + 1) * (boxes[:, 3] - boxes[:, 1] + 1))
    )


def viou(traj_1, duration_1, traj_2, duration_2) -> float:
    """Volumetric IoU of two trajectories with durations [fstart, fend).

    Semantics of /root/reference/lib/evaluation/common.py:65-106: the
    intersection volume is accumulated only over the temporally
    overlapping frames, while each union term spans a trajectory's full
    duration. Vectorized instead of per-frame Python loops.
    """
    s = max(duration_1[0], duration_2[0])
    e = min(duration_1[1], duration_2[1])
    if e <= s:
        return 0.0
    b1 = np.asarray(traj_1, dtype=np.float64).reshape(-1, 4)
    b2 = np.asarray(traj_2, dtype=np.float64).reshape(-1, 4)
    a = b1[s - duration_1[0] : e - duration_1[0]]
    b = b2[s - duration_2[0] : e - duration_2[0]]
    iw = np.clip(np.minimum(a[:, 2], b[:, 2]) - np.maximum(a[:, 0], b[:, 0]) + 1, 0, None)
    ih = np.clip(np.minimum(a[:, 3], b[:, 3]) - np.maximum(a[:, 1], b[:, 1]) + 1, 0, None)
    inter = float(np.sum(iw * ih))
    union = _traj_volume(b1) + _traj_volume(b2) - inter
    return inter / union


