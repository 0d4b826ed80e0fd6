"""Video-level pair sequences for the Duration Proposal Network.

The paper's "when to look" operates on a tracklet pair's relation
features laid out over the WHOLE video time axis (the reference's
dpn_anchor.py sketches the head but nothing builds its input). This
module constructs that input from per-segment artifacts:

  1. tracklets of consecutive segments are chained when their
     trajectories overlap with cubic IoU >= 0.5 in the shared 15 frames
     — the same criterion greedy association uses
     (/root/reference/lib/modeling/association.py:152-168)
  2. each ordered chain pair becomes one sequence: its 11070-d pair
     feature per segment where both chains exist, zeros elsewhere
  3. GT relation instances attach (start, end) span targets to the
     chains matching their subject/object tracklets (vIoU >= 0.5)

Everything is padded to (P_max, S_max) so the span model compiles once
per video-shape bucket.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Dict, List, Optional, Tuple

import numpy as np

from tspn_tpu.data.trajectory import Trajectory, load_trajectory_proposals, overlap_traj_iou
from tspn_tpu.data.vrdataset import SegmentDataset


@dataclass
class PairChains:
    """Tracklet chains of one video.

    chain_slot[s][j] = chain id of segment s's tracklet j (or -1)
    num_chains: total chains
    segments: the (fstart, fend) list, sorted
    trajs: per segment, the loaded proposal Trajectory list
    """

    chain_slot: List[np.ndarray]
    num_chains: int
    segments: List[Tuple[int, int]]
    trajs: List[List[Trajectory]]


def build_chains(vid: str, segments: List[Tuple[int, int]], iou_thr=0.5) -> PairChains:
    segments = sorted(segments, key=lambda x: x[0])
    trajs: List[List[Trajectory]] = []
    for fstart, fend in segments:
        ts = load_trajectory_proposals(vid, fstart, fend)
        for t in ts:
            t.pstart, t.pend = fstart, fend
        trajs.append(ts)

    chain_slot: List[np.ndarray] = []
    next_chain = 0
    for s, ts in enumerate(trajs):
        slots = np.full(len(ts), -1, np.int64)
        if s > 0 and segments[s - 1][1] > segments[s][0]:
            prev_ts = trajs[s - 1]
            prev_slots = chain_slot[s - 1]
            taken = set()
            # greedy best-overlap matching in the shared window
            scores = []
            for j, t in enumerate(ts):
                for i, pt in enumerate(prev_ts):
                    if prev_slots[i] < 0:
                        continue
                    ov = overlap_traj_iou(pt, t)
                    if ov >= iou_thr:
                        scores.append((ov, i, j))
            for ov, i, j in sorted(scores, reverse=True):
                if j in taken or prev_slots[i] in set(slots[slots >= 0].tolist()):
                    continue
                slots[j] = prev_slots[i]
                taken.add(j)
        for j in range(len(ts)):
            if slots[j] < 0:
                slots[j] = next_chain
                next_chain += 1
        chain_slot.append(slots)
    return PairChains(chain_slot, next_chain, segments, trajs)


@dataclass
class VideoPairRecord:
    """Padded video-level pair sequences."""

    vid: str
    seq_feats: np.ndarray    # (P, S, D) per-segment pair features
    seq_mask: np.ndarray     # (P, S) 1 when both chains exist in segment
    pair_chains: np.ndarray  # (P, 2) chain ids
    chain_classeme: np.ndarray  # (C_max, num_obj) mean classeme per chain
    gt_spans: np.ndarray     # (P, G_max, 2) frame spans per pair
    gt_preds: np.ndarray     # (P, G_max) predicate ids
    gt_mask: np.ndarray      # (P, G_max)
    seg_labels: np.ndarray   # (P, S, R) per-segment predicate multi-hot
    num_pairs: int
    num_segments: int
    chains: PairChains


def build_video_pair_record(
    dataset,
    seg_dataset: SegmentDataset,
    vid: str,
    max_pairs: int = 64,
    max_gt_per_pair: int = 8,
    feature_dim: int = 11070,
    num_objects: int = 35,
    num_predicates: int = 132,
    iou_thr: float = 0.5,
    rank_pairs_fn=None,
) -> Optional[VideoPairRecord]:
    """Build the padded video-level pair record.

    rank_pairs_fn: optional PPN ranker — (chain_classeme (C, num_obj)) ->
    (C, C) relatedness scores. When given and the candidate chain-pair
    set exceeds max_pairs, the TOP-max_pairs pairs by PPN score are kept
    ("what to look" consumed at the video level; the reference computes
    pair proposals at test time, relpn/ppn.py:81-89, but never consumes
    them). Without it, pairs keep first-seen order (round-1 behavior).
    """
    seg_indices = [ix for ix in seg_dataset.index if ix[0] == vid]
    if not seg_indices:
        return None
    segments = sorted([(fs, fe) for _, fs, fe in seg_indices])
    chains = build_chains(vid, segments, iou_thr)
    s_num = len(segments)

    # chain classemes (mean over member tracklets)
    classeme_acc = np.zeros((chains.num_chains, num_objects), np.float64)
    classeme_cnt = np.zeros(chains.num_chains, np.int64)

    records = {}
    for ix in seg_indices:
        records[(ix[1], ix[2])] = seg_dataset.load_segment(seg_dataset.index.index(ix))

    # ---- pass 1: candidate chain pairs + classemes + GT hits per KEY ----
    candidates: Dict[Tuple[int, int], None] = {}  # insertion-ordered set
    gt_key_map: Dict[Tuple[int, int], List[Tuple[int, int, int]]] = {}
    for s, (fstart, fend) in enumerate(segments):
        rec = records[(fstart, fend)]
        slots = chains.chain_slot[s]
        n = min(rec.num_proposals, len(slots))
        for j in range(n):
            if rec.cls_logits.shape[0] > j:
                classeme_acc[slots[j]] += rec.cls_logits[j]
                classeme_cnt[slots[j]] += 1
        for row in range(rec.pairs.shape[0]):
            i, j = rec.pairs[row]
            if i >= n or j >= n:
                continue
            candidates.setdefault((int(slots[i]), int(slots[j])))

        # GT span targets: segment's GT-matched positive pairs
        insts = seg_dataset.gt_rel_insts.get((vid, fstart, fend), [])
        gt_pos = {int(t): k for k, t in enumerate(rec.trackid) if t >= 0}
        for sub_tid, obj_tid, _sc, _oc, pred in insts:
            if sub_tid not in gt_pos or obj_tid not in gt_pos:
                continue
            sub_hits = np.flatnonzero(rec.iou[:n, gt_pos[sub_tid]] >= iou_thr)
            obj_hits = np.flatnonzero(rec.iou[:n, gt_pos[obj_tid]] >= iou_thr)
            for i in sub_hits:
                for j in obj_hits:
                    if i == j:
                        continue
                    key = (int(slots[i]), int(slots[j]))
                    gt_key_map.setdefault(key, []).append((fstart, fend, pred))

    if not candidates:
        return None

    classeme = np.zeros((chains.num_chains, num_objects), np.float32)
    nonzero = classeme_cnt > 0
    classeme[nonzero] = (
        classeme_acc[nonzero] / classeme_cnt[nonzero, None]
    ).astype(np.float32)

    keys = list(candidates)
    if rank_pairs_fn is not None and len(keys) > max_pairs:
        score_matrix = np.asarray(rank_pairs_fn(classeme))
        order = np.argsort(
            [-float(score_matrix[a, b]) for a, b in keys], kind="stable"
        )
        keys = [keys[o] for o in order[:max_pairs]]
    else:
        keys = keys[:max_pairs]
    pair_rows: Dict[Tuple[int, int], int] = {k: r for r, k in enumerate(keys)}

    # ---- pass 2: fill sequences for the selected pairs ----
    seq_feats = np.zeros((max_pairs, s_num, feature_dim), np.float32)
    seq_mask = np.zeros((max_pairs, s_num), np.float32)
    pair_chain_arr = np.zeros((max_pairs, 2), np.int64)
    for key, p in pair_rows.items():
        pair_chain_arr[p] = key
    for s, (fstart, fend) in enumerate(segments):
        rec = records[(fstart, fend)]
        slots = chains.chain_slot[s]
        n = min(rec.num_proposals, len(slots))
        for row in range(rec.pairs.shape[0]):
            i, j = rec.pairs[row]
            if i >= n or j >= n:
                continue
            p = pair_rows.get((int(slots[i]), int(slots[j])))
            if p is None:
                continue
            seq_feats[p, s] = rec.feats[row]
            seq_mask[p, s] = 1.0

    gt_span_map: Dict[int, List[Tuple[int, int, int]]] = {
        pair_rows[key]: hits
        for key, hits in gt_key_map.items()
        if key in pair_rows
    }
    p_num = len(pair_rows)

    # per-(pair, segment) predicate multi-hot for the joint segment BCE
    seg_index = {seg: s for s, seg in enumerate(segments)}
    seg_labels = np.zeros((max_pairs, s_num, num_predicates), np.float32)
    for p, hits in gt_span_map.items():
        for fs, fe, pred in hits:
            if 0 <= pred < num_predicates:
                seg_labels[p, seg_index[(fs, fe)], pred] = 1.0

    # merge per-segment GT hits into maximal (pred, span) intervals per pair
    gt_spans = np.zeros((max_pairs, max_gt_per_pair, 2), np.float32)
    gt_preds = np.zeros((max_pairs, max_gt_per_pair), np.int64)
    gt_mask = np.zeros((max_pairs, max_gt_per_pair), np.float32)
    for p, hits in gt_span_map.items():
        by_pred: Dict[int, List[Tuple[int, int]]] = {}
        for fs, fe, pred in hits:
            by_pred.setdefault(pred, []).append((fs, fe))
        merged = []
        for pred, spans in by_pred.items():
            spans.sort()
            cur_s, cur_e = spans[0]
            for fs, fe in spans[1:]:
                if fs <= cur_e:
                    cur_e = max(cur_e, fe)
                else:
                    merged.append((pred, cur_s, cur_e))
                    cur_s, cur_e = fs, fe
            merged.append((pred, cur_s, cur_e))
        for g, (pred, fs, fe) in enumerate(merged[:max_gt_per_pair]):
            gt_spans[p, g] = (fs, fe)
            gt_preds[p, g] = pred
            gt_mask[p, g] = 1.0

    return VideoPairRecord(
        vid=vid,
        seq_feats=seq_feats,
        seq_mask=seq_mask,
        pair_chains=pair_chain_arr,
        chain_classeme=classeme,
        gt_spans=gt_spans,
        gt_preds=gt_preds,
        gt_mask=gt_mask,
        seg_labels=seg_labels,
        num_pairs=p_num,
        num_segments=s_num,
        chains=chains,
    )

