"""Annotation inspector: print a video's objects, relations, and merged
per-triplet durations.

Counterpart of /root/reference/lib/dataset/vidvrd_vidor_dataset.py (the
standalone anno parser with `_merge_rel`, :130-160): per-segment relation
instances of the same (subject_tid, predicate, object_tid) triplet are
merged into maximal contiguous durations.
"""

from __future__ import annotations

import argparse
import os
from collections import defaultdict
from typing import Dict, List, Tuple


def merge_relations(relation_instances: List[dict]) -> List[dict]:
    """Merge same-triplet instances with touching/overlapping durations
    into maximal spans (vidvrd_vidor_dataset._merge_rel semantics)."""
    by_key: Dict[Tuple[int, str, int], List[Tuple[int, int]]] = defaultdict(list)
    for rel in relation_instances:
        key = (rel["subject_tid"], rel["predicate"], rel["object_tid"])
        by_key[key].append((rel["begin_fid"], rel["end_fid"]))
    merged = []
    for (s_tid, pred, o_tid), spans in by_key.items():
        spans.sort()
        cur_s, cur_e = spans[0]
        for fs, fe in spans[1:]:
            if fs <= cur_e:
                cur_e = max(cur_e, fe)
            else:
                merged.append({"subject_tid": s_tid, "predicate": pred,
                               "object_tid": o_tid, "duration": (cur_s, cur_e)})
                cur_s, cur_e = fs, fe
        merged.append({"subject_tid": s_tid, "predicate": pred,
                       "object_tid": o_tid, "duration": (cur_s, cur_e)})
    return merged


def inspect(dataset, vid: str) -> dict:
    anno = dataset.get_anno(vid)
    tid2cls = {o["tid"]: o["category"] for o in anno["subject/objects"]}
    merged = merge_relations(anno["relation_instances"])
    traj_lengths = defaultdict(int)
    for frame in anno["trajectories"]:
        for roi in frame:
            traj_lengths[roi["tid"]] += 1
    return {
        "video_id": vid,
        "frame_count": anno["frame_count"],
        "size": (anno["width"], anno["height"]),
        "objects": [
            {"tid": tid, "category": cls, "frames": traj_lengths[tid]}
            for tid, cls in sorted(tid2cls.items())
        ],
        "num_relation_instances": len(anno["relation_instances"]),
        "merged_relations": [
            {
                "triplet": (tid2cls[m["subject_tid"]], m["predicate"],
                            tid2cls[m["object_tid"]]),
                "duration": m["duration"],
            }
            for m in merged
        ],
    }


def main():
    parser = argparse.ArgumentParser(description="Inspect a video's annotation")
    parser.add_argument("--data_dir", required=True)
    parser.add_argument("--dataset", choices=["vidvrd", "vidor"], default="vidvrd")
    parser.add_argument("--vid", required=True)
    args = parser.parse_args()

    from tspn_tpu.data import BaseVidOR, BaseVidVRD

    root = os.path.join(args.data_dir, args.dataset)
    if args.dataset == "vidvrd":
        ds = BaseVidVRD(root, os.path.join(root, "videos"), ["train", "test"])
    else:
        ds = BaseVidOR(os.path.join(root, "annotation"),
                       os.path.join(root, "videos"), ["training", "validation"])
    info = inspect(ds, args.vid)
    print(f"video {info['video_id']}: {info['frame_count']} frames "
          f"{info['size'][0]}x{info['size'][1]}")
    print("objects:")
    for o in info["objects"]:
        print(f"  tid={o['tid']:3d} {o['category']:20s} {o['frames']} frames")
    print(f"relation instances: {info['num_relation_instances']}, "
          f"merged: {len(info['merged_relations'])}")
    for m in info["merged_relations"]:
        print(f"  {m['triplet']} {m['duration']}")


if __name__ == "__main__":
    main()
