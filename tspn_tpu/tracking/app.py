"""MOT-format tracking application (host glue around track_video).

Counterpart of /root/reference/deep_sort/deep_sort_app.py:17-212 and
evaluate_motchallenge.py: load MOTChallenge-style detections (.npy rows
= 10 MOT columns + appearance feature), filter by confidence and box
height, NMS, then run the WHOLE sequence through the one-program scan
tracker and write MOT result rows (frame, id, x, y, w, h, 1, -1, -1, -1).

Where the reference steps frame-by-frame in Python with per-frame
Hungarian calls, this pads each frame's detections to a fixed capacity
and executes the full sequence as a single jit'd lax.scan on device.
"""

from __future__ import annotations

import os
from typing import Dict, List, Optional

import numpy as np

from tspn_tpu.ops.nms import nms_tlwh
from tspn_tpu.tracking.tracker import TrackerConfig, track_video


def gather_sequence_info(detection_file: str) -> Dict:
    """Load a detections .npy: rows [frame, id, x, y, w, h, conf, -1, -1, -1,
    feature...] (deep_sort_app.py:17-93 without the image directory)."""
    detections = np.load(detection_file)
    frame_indices = detections[:, 0].astype(int)
    return {
        "detections": detections,
        "min_frame_idx": int(frame_indices.min()),
        "max_frame_idx": int(frame_indices.max()),
        "feature_dim": detections.shape[1] - 10,
    }


def _frame_detections(detections, frame_idx, min_height):
    rows = detections[detections[:, 0].astype(int) == frame_idx]
    tlwh = rows[:, 2:6]
    conf = rows[:, 6]
    feats = rows[:, 10:]
    keep = tlwh[:, 3] > min_height
    return tlwh[keep], conf[keep], feats[keep]


def run(
    sequence_dir: Optional[str],
    detection_file: str,
    output_file: str,
    min_confidence: float = 0.8,
    nms_max_overlap: float = 1.0,
    min_detection_height: float = 0.0,
    max_cosine_distance: float = 0.2,
    nn_budget: Optional[int] = None,
    display: bool = False,
    max_detections_per_frame: int = 32,
    max_tracks: int = 64,
) -> List[List[float]]:
    """Track one sequence; writes and returns MOT result rows.

    Signature mirrors deep_sort_app.run (deep_sort_app.py:129-212);
    sequence_dir/display are accepted for compatibility (no GUI here).
    """
    info = gather_sequence_info(detection_file)
    detections = info["detections"]
    f_dim = info["feature_dim"]
    t0, t1 = info["min_frame_idx"], info["max_frame_idx"]
    num_frames = t1 - t0 + 1
    d_max = max_detections_per_frame

    det_tlwh = np.zeros((num_frames, d_max, 4), np.float32)
    det_feat = np.zeros((num_frames, d_max, max(f_dim, 1)), np.float32)
    det_mask = np.zeros((num_frames, d_max), bool)
    for t in range(num_frames):
        tlwh, conf, feats = _frame_detections(detections, t0 + t, min_detection_height)
        keep = conf >= min_confidence
        tlwh, conf, feats = tlwh[keep], conf[keep], feats[keep]
        if nms_max_overlap < 1.0 and len(tlwh) > 0:
            import jax.numpy as jnp

            idx, keep_mask = nms_tlwh(
                jnp.asarray(tlwh, jnp.float32), jnp.asarray(conf, jnp.float32),
                nms_max_overlap, len(tlwh),
            )
            sel = np.asarray(idx)[np.asarray(keep_mask)]
            tlwh, conf, feats = tlwh[sel], conf[sel], feats[sel]
        n = min(len(tlwh), d_max)
        det_tlwh[t, :n] = tlwh[:n]
        if f_dim:
            det_feat[t, :n] = feats[:n]
        det_mask[t, :n] = True

    cfg = TrackerConfig(
        matching_threshold=max_cosine_distance,
        gallery_size=nn_budget if nn_budget else 16,
        max_tracks=max_tracks,
    )
    outs = track_video(cfg, det_tlwh, det_feat, det_mask)
    tlwh_out = np.asarray(outs["tlwh"])
    ids_out = np.asarray(outs["track_id"])
    visible = np.asarray(outs["visible"])

    results = []
    for t in range(num_frames):
        for k in np.flatnonzero(visible[t]):
            x, y, w, h = tlwh_out[t, k]
            results.append([t0 + t, int(ids_out[t, k]), x, y, w, h])

    if output_file:
        os.makedirs(os.path.dirname(output_file) or ".", exist_ok=True)
        with open(output_file, "w") as f:
            for frame, tid, x, y, w, h in results:
                f.write(
                    f"{int(frame)},{int(tid)},{x:.2f},{y:.2f},{w:.2f},{h:.2f},1,-1,-1,-1\n"
                )
    return results


def evaluate_motchallenge(
    mot_dir: str, detection_dir: str, output_dir: str,
    min_confidence: float = 0.0, **kwargs
) -> None:
    """Batch driver over MOTChallenge sequences
    (evaluate_motchallenge.py:40-53)."""
    os.makedirs(output_dir, exist_ok=True)
    for sequence in sorted(os.listdir(mot_dir)):
        print(f"Running sequence {sequence}")
        run(
            sequence_dir=os.path.join(mot_dir, sequence),
            detection_file=os.path.join(detection_dir, f"{sequence}.npy"),
            output_file=os.path.join(output_dir, f"{sequence}.txt"),
            min_confidence=min_confidence,
            **kwargs,
        )
