"""Export video-object predictions (for evaluate.py --task object).

Neither the reference nor its helper publishes the producer for the
object-task prediction JSON ({vid: [{category, score, trajectory:
{fid: box}}]}, consumed by lib/evaluation/video_object_detection.py);
this builds it from this framework's tracker outputs + per-track
classemes, closing the loop detector -> tracker -> object eval.
"""

from __future__ import annotations

import argparse
import json
from typing import Dict, List

import numpy as np


def tracks_to_object_predictions(
    track_out: Dict[str, np.ndarray],   # track_video outputs (T, K, ...)
    slot_classemes: np.ndarray,         # (T, K, C) classeme per visible slot
    class_names: List[str],
    min_length: int = 5,
) -> List[dict]:
    """-> [{'category', 'score', 'trajectory': {str(fid): xyxy}}, ...]."""
    tlwh = np.asarray(track_out["tlwh"])
    ids = np.asarray(track_out["track_id"])
    visible = np.asarray(track_out["visible"])
    t_num = tlwh.shape[0]
    out = []
    for tid in np.unique(ids[visible]):
        trajectory = {}
        cls_acc = None
        for f in range(t_num):
            slots = np.flatnonzero((ids[f] == tid) & visible[f])
            if slots.size == 0:
                continue
            k = slots[0]
            x, y, w, h = tlwh[f, k]
            trajectory[str(f)] = [float(x), float(y), float(x + w), float(y + h)]
            c = slot_classemes[f, k]
            cls_acc = c if cls_acc is None else cls_acc + c
        if len(trajectory) < min_length or cls_acc is None:
            continue
        # mean over frames: a summed-logit softmax saturates with track
        # length, destroying cross-track score ranking
        cls_acc = cls_acc / len(trajectory)
        probs = np.exp(cls_acc - cls_acc.max())
        probs = probs / probs.sum()
        cid = int(np.argmax(probs))
        out.append({
            "category": class_names[cid],
            "score": float(probs[cid]),
            "trajectory": trajectory,
        })
    return out


def main():
    parser = argparse.ArgumentParser(
        description="Tracker outputs (.npz per video) -> object prediction JSON"
    )
    parser.add_argument("--tracks", nargs="+", required=True,
                        help="per-video .npz with tlwh/track_id/visible/classemes"
                             " arrays; filename stem = video id")
    parser.add_argument("--dataset", choices=["vidvrd", "vidor"], default="vidvrd")
    parser.add_argument("--output", required=True)
    args = parser.parse_args()

    from tspn_tpu.data.vocab import VIDOR_OBJECTS, VIDVRD_OBJECTS

    names = VIDVRD_OBJECTS if args.dataset == "vidvrd" else VIDOR_OBJECTS
    results = {}
    for path in args.tracks:
        import os

        vid = os.path.splitext(os.path.basename(path))[0]
        if vid in results:
            raise ValueError(f"duplicate video id from filename stem: {vid}")
        data = np.load(path)
        results[vid] = tracks_to_object_predictions(
            {k: data[k] for k in ("tlwh", "track_id", "visible")},
            data["classemes"], names,
        )
    with open(args.output, "w") as f:
        json.dump({"version": "VERSION 1.0", "results": results}, f)
    print(f"wrote object predictions for {len(results)} videos to {args.output}")


if __name__ == "__main__":
    main()
