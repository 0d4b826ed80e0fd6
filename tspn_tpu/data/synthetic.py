"""Synthetic VidVRD-format dataset + segment artifacts.

The real VidVRD/VidOR data and the VidVRD-helper's precomputed features
are not redistributable, so this module fabricates a miniature but
format-exact dataset: annotation JSONs (the schema consumed by
tspn_tpu.data.annotations), per-segment relation-feature h5 files and
traj_cls proposal JSONs (the schemas of /root/reference/lib/dataset/
vrdataset.py:165-216 and lib/modeling/trajectory.py:161-180).

Features carry a learnable signal: each pair's relative-position block
encodes its GT predicates, so the Linear(11070 -> 132) baseline can fit
them — giving the test-suite an end-to-end train -> predict -> associate
-> evaluate regression with nontrivial metric values.
"""

from __future__ import annotations

import json
import os
from typing import List, Sequence

import numpy as np

from tspn_tpu.data.feature_store import (
    FeatureLayout,
    SegmentFeatures,
    enumerate_ordered_pairs,
    write_segment_features,
)
from tspn_tpu.data.segments import segment_video, set_output_dir
from tspn_tpu.data.trajectory import Trajectory, cubic_iou, save_trajectory_proposals
from tspn_tpu.data.vocab import VIDVRD_OBJECTS, VIDVRD_PREDICATES

WIDTH, HEIGHT = 480, 360


def _linear_trajectory(rng, frame_count: int) -> np.ndarray:
    """(T, 4) smoothly moving box inside the frame."""
    w = rng.uniform(40, 120)
    h = rng.uniform(40, 120)
    x0 = rng.uniform(0, WIDTH - w)
    y0 = rng.uniform(0, HEIGHT - h)
    vx = rng.uniform(-2.0, 2.0)
    vy = rng.uniform(-1.5, 1.5)
    t = np.arange(frame_count)
    x = np.clip(x0 + vx * t, 0, WIDTH - w)
    y = np.clip(y0 + vy * t, 0, HEIGHT - h)
    return np.stack([x, y, x + w, y + h], axis=1)


def generate_annotations(
    root: str,
    num_train: int = 3,
    num_test: int = 2,
    frame_count: int = 75,
    objects_per_video: int = 3,
    relations_per_video: int = 4,
    seed: int = 0,
    object_vocab: Sequence[str] = None,
    predicate_vocab: Sequence[str] = None,
    num_categories: int = 0,
    num_predicate_types: int = 0,
    vidor_format: bool = False,
    splits: Sequence[str] = ("train", "test"),
    per_split_seed: bool = False,
) -> List[str]:
    """Write per-video annotations; returns video ids.

    VidVRD format: {split}/<vid>.json, no version field. VidOR format
    (vidor_format=True): {split}/<group>/<vid>.json with VERSION 1.0 +
    video_path fields (base_vidor.py's nested layout).

    num_categories / num_predicate_types > 0 restrict sampling to a small
    vocab slice so category pairs repeat across videos with different
    predicates — forcing models to use the pairwise feature signal rather
    than memorizing (subject, object) -> predicate shortcuts.

    per_split_seed=True reseeds the RNG at each split boundary
    (seed + split index) AND numbers videos split-locally, so the test
    split comes out byte-identical — content, ids, filenames, vidor
    group paths — regardless of num_train. Required for
    training-set-size sweeps (tools/bench_span_vs_segment.py
    --num_train). Default False keeps the original single-stream draw
    order + global counter that every seeded fixture and golden test in
    the repo depends on.
    """
    rng = np.random.RandomState(seed)
    objects = list(object_vocab or VIDVRD_OBJECTS)
    predicates = list(predicate_vocab or VIDVRD_PREDICATES)
    if num_categories:
        objects = objects[:num_categories]
    if num_predicate_types:
        predicates = predicates[:num_predicate_types]
    vids = []
    counter = 0
    for split_ix, (split, count) in enumerate(
        zip(splits, (num_train, num_test))
    ):
        if per_split_seed:
            rng = np.random.RandomState(seed + 7919 * (split_ix + 1))
        for idx_in_split in range(count):
            number = idx_in_split if per_split_seed else counter
            vid = f"SYN_{split}_{number:08d}"
            group = f"{number % 2:04d}"
            if vidor_format:
                os.makedirs(os.path.join(root, split, group), exist_ok=True)
            else:
                os.makedirs(os.path.join(root, split), exist_ok=True)
            counter += 1
            vids.append(vid)
            n_obj = objects_per_video
            cats = [objects[rng.randint(len(objects))] for _ in range(n_obj)]
            trajs = [_linear_trajectory(rng, frame_count) for _ in range(n_obj)]
            trajectories = []
            for f in range(frame_count):
                frame = []
                for tid in range(n_obj):
                    x0, y0, x1, y1 = trajs[tid][f]
                    frame.append({
                        "tid": tid,
                        "bbox": {
                            "xmin": int(x0), "ymin": int(y0),
                            "xmax": int(x1), "ymax": int(y1),
                        },
                    })
                trajectories.append(frame)
            relations = []
            for _ in range(relations_per_video):
                s, o = rng.choice(n_obj, size=2, replace=False)
                pred = predicates[rng.randint(len(predicates))]
                begin = int(rng.choice([0, 15]))
                end = int(min(frame_count, begin + int(rng.choice([30, 45, 60]))))
                relations.append({
                    "subject_tid": int(s),
                    "object_tid": int(o),
                    "predicate": pred,
                    "begin_fid": begin,
                    "end_fid": end,
                })
            anno = {
                "video_id": vid,
                "frame_count": frame_count,
                "fps": 25,
                "width": WIDTH,
                "height": HEIGHT,
                "subject/objects": [
                    {"tid": tid, "category": cats[tid]} for tid in range(n_obj)
                ],
                "trajectories": trajectories,
                "relation_instances": relations,
            }
            if vidor_format:
                anno["version"] = "VERSION 1.0"
                anno["video_path"] = f"{group}/{vid}.mp4"
                path = os.path.join(root, split, group, f"{vid}.json")
            else:
                path = os.path.join(root, split, f"{vid}.json")
            with open(path, "w") as f:
                json.dump(anno, f)
    return vids


def _classeme(category_id: int, num_objects: int, rng, sharp: float = 6.0):
    logits = rng.normal(0, 0.3, size=num_objects).astype(np.float32)
    logits[category_id] += sharp
    return logits


def generate_segment_artifacts(
    dataset,
    output_dir: str,
    splits: Sequence[str] = ("train", "test"),
    num_objects: int = 35,
    num_predicates: int = 132,
    jitter: float = 2.0,
    seed: int = 0,
    per_split_seed: bool = False,
) -> int:
    """Fabricate per-segment relation h5 + traj_cls JSON for every segment.

    Proposals = GT trajectories clipped to the segment + coordinate
    jitter (trackid -1), followed by the GT tracklets themselves
    (trackid = dataset tid) — the N+GT layout documented at
    /root/reference/lib/modeling/predict.py:125-160. Returns #segments.

    num_objects sets the classeme slot width of the feature layout
    (35 -> the reference's 11070-d layout; VidOR's 80 -> 11160-d); the
    dataset's category ids must fit, i.e. get_object_num() <= num_objects.

    per_split_seed=True reseeds the RNG at each split boundary (same
    scheme as generate_annotations) so test-split features/jitter are
    byte-identical across training-set sizes — without it a --num_train
    sweep evaluates on *different* artifacts each time because the train
    split's draws shift the single RNG stream (advisor finding, round 4).
    """
    assert dataset.get_object_num() <= num_objects, (
        f"dataset has {dataset.get_object_num()} object categories but the "
        f"feature layout's classeme width is {num_objects}"
    )
    set_output_dir(output_dir)
    rng = np.random.RandomState(seed)
    written = 0
    for split_ix, split in enumerate(splits):
        if per_split_seed:
            rng = np.random.RandomState(seed + 7919 * (split_ix + 1))
        for vid in dataset.get_index(split):
            anno = dataset.get_anno(vid)
            rel_insts = dataset.get_relation_insts(vid, no_traj=True)
            gt_trajs = {
                inst["tid"]: inst for inst in dataset.get_object_insts(vid)
            }
            for fstart, fend in segment_video(0, anno["frame_count"]):
                written += _write_one_segment(
                    dataset, vid, fstart, fend, rel_insts, gt_trajs,
                    num_objects, num_predicates, jitter, rng,
                )
    return written


def _traj_boxes(inst: dict, fstart: int, fend: int) -> np.ndarray:
    """(T, 4) boxes of a GT object instance over [fstart, fend)."""
    boxes = []
    for f in range(fstart, fend):
        b = inst["trajectory"].get(str(f))
        if b is None:
            return np.empty((0, 4))
        boxes.append(b)
    return np.asarray(boxes, dtype=np.float64)


def _write_one_segment(
    dataset, vid, fstart, fend, rel_insts, gt_trajs,
    num_objects, num_predicates, jitter, rng,
) -> int:
    # GT tracklets fully covering this segment
    gt_items = []
    for tid, inst in sorted(gt_trajs.items()):
        boxes = _traj_boxes(inst, fstart, fend)
        if boxes.shape[0] == fend - fstart:
            gt_items.append((tid, inst["category"], boxes))
    if len(gt_items) < 2:
        return 0

    # proposals: jittered copies of the GT boxes
    proposals = []
    for tid, category, boxes in gt_items:
        noisy = boxes + rng.normal(0, jitter, size=boxes.shape)
        proposals.append((tid, category, noisy))

    n = len(proposals)
    m = len(gt_items)
    all_boxes = np.stack([p[2] for p in proposals] + [g[2] for g in gt_items])
    iou = cubic_iou(all_boxes, all_boxes).astype(np.float32)
    trackid = np.array([-1] * n + [tid for tid, _, _ in gt_items], dtype=np.int64)
    pairs = enumerate_ordered_pairs(n + m)

    # per-pair features with a learnable predicate signal
    # a relation is "active" in a segment only when the segment lies fully
    # inside the relation's duration — the same convention the train-time
    # label enumeration uses (segment_video over the relation duration), so
    # features and labels agree
    active = {}  # (sub_tid, obj_tid) -> [pred ids] active in this segment
    for inst in rel_insts:
        begin, end = inst["duration"]
        if begin <= fstart and end >= fend:
            key = (inst["subject_tid"], inst["object_tid"])
            pid = dataset.get_predicate_id(inst["triplet"][1])
            active.setdefault(key, []).append(pid)

    tid_of = [p[0] for p in proposals] + [g[0] for g in gt_items]
    cls_of = [
        dataset.get_object_id(c) for _, c, _ in proposals
    ] + [dataset.get_object_id(c) for _, c, _ in gt_items]

    classemes = np.stack([
        _classeme(cid, num_objects, rng) for cid in cls_of
    ])
    layout = FeatureLayout.for_objects(num_objects)
    c = layout.classeme_dim
    feats = np.zeros((pairs.shape[0], layout.dim), dtype=np.float32)
    feats[:, :c] = classemes[pairs[:, 0]]
    feats[:, c : 2 * c] = classemes[pairs[:, 1]]
    # sparse BoW-ish noise in the motion blocks, PER TRACKLET and
    # expanded into pair rows — real artifacts are built that way (each
    # role's 4x1000 blocks describe one tracklet, vrdataset.py:219-242),
    # which is also what the factored q8f store relies on
    bow_half = layout.num_bow_blocks // 2 * layout.bow_block_size
    trk_bow = (rng.rand(n + m, bow_half) < 0.002).astype(np.float32)
    feats[:, layout.bow_start : layout.bow_start + bow_half] = trk_bow[pairs[:, 0]]
    feats[:, layout.bow_start + bow_half : layout.rel_start] = trk_bow[pairs[:, 1]]
    # relative-position block carries the predicate signal
    for row, (i, j) in enumerate(pairs):
        preds = active.get((tid_of[i], tid_of[j]), ())
        for pid in preds:
            feats[row, layout.rel_start + pid] = 3.0
    feats[:, layout.rel_start : layout.dim] += rng.normal(
        0, 0.05, size=(pairs.shape[0], layout.rel_dim)
    ).astype(np.float32)

    write_segment_features(
        vid, fstart, fend,
        SegmentFeatures(trackid=trackid, pairs=pairs, feats=feats, iou=iou),
    )
    # traj_cls proposals (classeme per proposal tracklet, trackid -1)
    trajs = [
        Trajectory(
            pstart=0, pend=fend - fstart, rois=boxes, score=float(rng.uniform(0.5, 1.0)),
            category=int(cls_of[k]), classeme=classemes[k].tolist(), gt_trackid=-1,
        )
        for k, (tid, _, boxes) in enumerate(proposals)
    ]
    save_trajectory_proposals(trajs, vid, fstart, fend, gt=False)
    return 1
