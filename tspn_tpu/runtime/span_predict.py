"""Video-level relation detection via span proposals (TSPN inference).

The paper's alternative to segment-scoring + greedy association
(README.md:17 claims ~2x efficiency): one forward over each video's
pair sequences proposes (start, end) spans and classifies predicates on
span-pooled features; relations are emitted directly with their spans —
no per-segment top-200 lists, no cross-segment merge loop.
"""

from __future__ import annotations

from functools import lru_cache
from typing import Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from tspn_tpu.data.trajectory import Trajectory, merge_trajectories
from tspn_tpu.data.video_pairs import PairChains, build_video_pair_record
from tspn_tpu.data.vrdataset import SegmentDataset
from tspn_tpu.models.span_tspn import SpanTSPN, propose_and_classify


def chain_trajectory(
    chains: PairChains, chain_id: int, fstart: int, fend: int
) -> Optional[Trajectory]:
    """Merge a chain's segment tracklets and clip to [fstart, fend)."""
    merged = None
    for s, (seg_start, seg_end) in enumerate(chains.segments):
        slots = chains.chain_slot[s]
        members = np.flatnonzero(slots == chain_id)
        if members.size == 0:
            continue
        t = chains.trajs[s][members[0]].copy()
        t.pstart, t.pend = seg_start, seg_end
        merged = t if merged is None else (
            merge_trajectories(merged, t) if t.pstart < merged.pend else merged
        )
    if merged is None:
        return None
    lo = max(fstart, merged.pstart)
    hi = min(fend, merged.pend)
    if hi <= lo:
        return None
    out = merged.copy()
    out.rois = merged.rois[lo - merged.pstart : hi - merged.pstart]
    out.pstart, out.pend = lo, hi
    return out


@lru_cache(maxsize=None)
def _jitted_propose(model: SpanTSPN, top_k_spans: int):
    """One COMPILED program per (model, top_k, sequence shape): without
    this, propose_and_classify runs op-by-op — every primitive is its
    own device dispatch, which dominates span inference on a tunneled
    chip. time_width is a traced scalar so videos sharing a segment
    count reuse the program.

    Besides the raw propose_and_classify outputs the program emits
    `score` (P, K, R): the in-span-evidence ranking score

        sqrt(relness) * rel_prob * mean_{s in span} seg_prob[s]

    where seg_prob is the SHARED RelationPredictor applied per segment
    (the joint objective's loss_seg_cls trains exactly this signal,
    models/span_tspn.py::span_tspn_joint_loss). Rationale, measured on
    the synthetic fixture (DESIGN §4 round 4): the DPN relness head
    memorizes its tiny video-level training set (loss_relationness hits
    0.0000 by iter ~40) and its held-out ordering is near-random, while
    the segment-level classifier generalizes (it is what segment mode
    ranks with, mAP 0.49 on the same fixture) — blending in-span
    segment evidence lifts span-mode mAP 0.118 -> 0.142 and R@50
    0.233 -> 0.30. relness enters at sqrt: it still selects spans well
    WITHIN a pair (rel_prob-only scoring collapses to mAP 0.007), it
    just cannot rank pairs."""

    @jax.jit
    def f(params, seq_feats, seq_mask, time_width, seg_bounds):
        outs = propose_and_classify(
            model, params, seq_feats, seq_mask, time_width,
            top_k_spans=top_k_spans,
        )
        seg_prob = jax.nn.sigmoid(
            model.apply(
                {"params": params}, seq_feats,
                method=SpanTSPN.classify_segments,
            )
        )  # (P, S, R)
        spans = outs["spans"]                       # (P, K, 2)
        ov = jnp.clip(
            jnp.minimum(seg_bounds[None, None, :, 1], spans[:, :, 1:2])
            - jnp.maximum(seg_bounds[None, None, :, 0], spans[:, :, 0:1]),
            0.0,
        )                                           # (P, K, S)
        w = ov * seq_mask[:, None, :]
        inspan = jnp.einsum(
            "pks,psr->pkr", w / (jnp.sum(w, -1, keepdims=True) + 1e-9),
            seg_prob,
        )
        outs["score"] = (
            jnp.sqrt(outs["relness"])[..., None]
            * outs["rel_prob"] * inspan * outs["span_mask"][..., None]
        )
        return outs

    return f


def predict_video_relations(
    dataset,
    seg_dataset: SegmentDataset,
    model: SpanTSPN,
    params,
    vid: str,
    top_per_video: int = 200,
    top_k_spans: int = 8,
    max_pairs: int = 64,
    rank_pairs_fn=None,
) -> List[dict]:
    """-> serialized relation dicts (triplet/score/duration/trajs).

    rank_pairs_fn: optional PPN chain-pair ranker (see
    models/ppn.make_chain_pair_ranker) — prunes the candidate chain-pair
    set to the top max_pairs before span proposal."""
    from tspn_tpu.data.vrdataset import effective_feature_dim

    record = build_video_pair_record(
        dataset, seg_dataset, vid, max_pairs=max_pairs,
        feature_dim=effective_feature_dim(seg_dataset.cfg),
        num_objects=seg_dataset.num_objects,
        num_predicates=seg_dataset.cfg.PREDICT.PREDICATE_NUM,
        rank_pairs_fn=rank_pairs_fn,
    )
    if record is None:
        return []
    anno = dataset.get_anno(vid)
    frame_count = anno["frame_count"]

    seg_bounds = np.asarray(record.chains.segments, np.float32)  # (S, 2)
    outs = _jitted_propose(model, top_k_spans)(
        params,
        jnp.asarray(record.seq_feats), jnp.asarray(record.seq_mask),
        jnp.float32(frame_count), jnp.asarray(seg_bounds),
    )
    return _assemble_relations(
        dataset, record, np.asarray(outs["spans"]),
        np.asarray(outs["score"]), frame_count, top_per_video,
    )


def _assemble_relations(
    dataset, record, spans, scores, frame_count, top_per_video
) -> List[dict]:
    """Host-side tail of span inference: rank (pair, span, predicate)
    cells, materialize chain trajectories, serialize relation dicts.
    Shared by the per-video and the mesh-sharded batch paths."""
    pair_valid = np.zeros(spans.shape[0], bool)
    pair_valid[: record.num_pairs] = True
    # in-span-evidence score (see _jitted_propose docstring), zeroed on
    # padding pairs
    scores = scores * pair_valid[:, None, None]

    flat = scores.reshape(-1)
    order = np.argsort(-flat)[: top_per_video * 4]
    k_dim, r_dim = scores.shape[1], scores.shape[2]

    chain_labels = np.argmax(record.chain_classeme, axis=1)
    relations = []
    for f in order:
        if flat[f] <= 0 or len(relations) >= top_per_video:
            break
        p = f // (k_dim * r_dim)
        k = (f // r_dim) % k_dim
        r = f % r_dim
        fstart, fend = spans[p, k]
        fstart = max(0, int(round(fstart)))
        fend = min(frame_count, int(round(fend)))
        if fend <= fstart:
            continue
        sub_chain, obj_chain = record.pair_chains[p]
        straj = chain_trajectory(record.chains, int(sub_chain), fstart, fend)
        otraj = chain_trajectory(record.chains, int(obj_chain), fstart, fend)
        if straj is None or otraj is None:
            continue
        # align both trajectories and the duration to their intersection
        lo = max(straj.pstart, otraj.pstart)
        hi = min(straj.pend, otraj.pend)
        if hi <= lo:
            continue

        def _clip(t):
            out = t.copy()
            out.rois = t.rois[lo - t.pstart : hi - t.pstart]
            out.pstart, out.pend = lo, hi
            return out

        straj, otraj = _clip(straj), _clip(otraj)
        relations.append({
            "triplet": [
                dataset.get_object_name(int(chain_labels[sub_chain])),
                dataset.get_predicate_name(int(r)),
                dataset.get_object_name(int(chain_labels[obj_chain])),
            ],
            "score": float(flat[f]),
            "duration": [int(lo), int(hi)],
            "sub_traj": [list(map(float, roi)) for roi in straj.rois],
            "obj_traj": [list(map(float, roi)) for roi in otraj.rois],
        })
    return relations


def _maybe_ppn_ranker(cfg, logger=None):
    """Build the chain-pair PPN ranker from the segment checkpoint when
    RELPN.PPN.PRUNE_AT_INFERENCE is set (returns None otherwise)."""
    if not (
        cfg.RELPN.USE_PPN and bool(cfg.RELPN.PPN.get("PRUNE_AT_INFERENCE", False))
    ):
        return None
    import os

    from tspn_tpu.data.segments import get_model_path
    from tspn_tpu.models.ppn import make_chain_pair_ranker
    from tspn_tpu.runtime.checkpoint import load_checkpoint_raw

    ckpt = os.path.join(get_model_path(), cfg.ETC.MODEL_DUMP_FILE)
    if not os.path.exists(ckpt):
        if logger:
            logger.info(f"PPN pruning requested but no segment ckpt at {ckpt}")
        return None
    restored = load_checkpoint_raw(ckpt)
    ppn_params = restored["params"].get("ppn_head")
    if ppn_params is None:
        if logger:
            logger.info("PPN pruning requested but checkpoint has no ppn_head")
        return None
    if logger:
        logger.info(f"PPN chain-pair pruning active (from {ckpt})")
    return make_chain_pair_ranker(
        ppn_params, cfg.RELPN.PPN.HIDDEN_CHANNELS, cfg.RELPN.PPN.OUT_CHANNELS
    )


@lru_cache(maxsize=None)
def _jitted_propose_batch(model: SpanTSPN, top_k_spans: int, mesh,
                          data_axis: str):
    """vmap of _jitted_propose's program over a VIDEO batch dimension,
    jitted with the batch sharded over the mesh's data axis and params
    replicated — span inference's multi-chip path (VERDICT r4 item 4).
    No cross-device communication: each device proposes/classifies its
    own videos, mirroring runtime/predict.py:292-326's segment sharding.
    """
    from jax.sharding import NamedSharding, PartitionSpec as P

    single = _jitted_propose(model, top_k_spans)
    rep = NamedSharding(mesh, P())
    shard = NamedSharding(mesh, P(data_axis))
    return jax.jit(
        jax.vmap(single, in_axes=(None, 0, 0, 0, 0)),
        in_shardings=(rep, shard, shard, shard, shard),
        out_shardings=shard,
    )


def detect_spans(
    cfg, dataset, model: SpanTSPN, params, logger=None,
    mesh=None, data_axis: str = "data",
) -> Dict[str, List[dict]]:
    """All test videos -> {vid: [relation dicts]} (prediction JSON body).

    With a mesh, videos sharing a pair-record shape are stacked, padded
    to a multiple of the mesh size, and proposed/classified in one
    sharded program per shape group; the host-side assembly is identical
    either way, so outputs match the single-device loop exactly
    (tests/test_span_tspn.py::test_detect_spans_sharded_equivalence).
    """
    test_split = dataset.infer_test_split()
    seg_dataset = SegmentDataset(cfg, dataset, phase=test_split)
    rank_pairs_fn = _maybe_ppn_ranker(cfg, logger)
    if mesh is None:
        results = {}
        for vid in dataset.get_index(test_split):
            results[vid] = predict_video_relations(
                dataset, seg_dataset, model, params, vid,
                top_per_video=cfg.PREDICT.TOPK_PER_SEG,
                rank_pairs_fn=rank_pairs_fn,
            )
            if logger:
                logger.info(f"{vid}: {len(results[vid])} span relations")
        return results
    return _detect_spans_sharded(
        cfg, dataset, seg_dataset, model, params, mesh, data_axis,
        rank_pairs_fn, logger,
    )


def _detect_spans_sharded(
    cfg, dataset, seg_dataset, model, params, mesh, data_axis,
    rank_pairs_fn, logger, top_k_spans: int = 8,
):
    from tspn_tpu.data.vrdataset import effective_feature_dim

    top_per_video = cfg.PREDICT.TOPK_PER_SEG
    n_dev = int(np.prod(mesh.devices.shape))
    results: Dict[str, List[dict]] = {}

    # build all records host-side, grouped by device shape (videos with
    # the same segment-count bucket share one compiled program)
    groups: Dict[tuple, list] = {}
    for vid in dataset.get_index(dataset.infer_test_split()):
        record = build_video_pair_record(
            dataset, seg_dataset, vid,
            feature_dim=effective_feature_dim(seg_dataset.cfg),
            num_objects=seg_dataset.num_objects,
            num_predicates=seg_dataset.cfg.PREDICT.PREDICATE_NUM,
            rank_pairs_fn=rank_pairs_fn,
        )
        if record is None:
            results[vid] = []
            continue
        frame_count = dataset.get_anno(vid)["frame_count"]
        bounds = np.asarray(record.chains.segments, np.float32)
        key = (record.seq_feats.shape, bounds.shape)
        groups.setdefault(key, []).append((vid, record, frame_count, bounds))

    run = _jitted_propose_batch(model, top_k_spans, mesh, data_axis)
    for key, items in groups.items():
        v = len(items)
        pad = (-v) % n_dev

        def stack(build):
            arrs = [build(it) for it in items]
            arrs += [np.zeros_like(arrs[0])] * pad
            return jnp.asarray(np.stack(arrs))

        outs = run(
            params,
            stack(lambda it: np.asarray(it[1].seq_feats)),
            stack(lambda it: np.asarray(it[1].seq_mask)),
            stack(lambda it: np.float32(it[2])),
            stack(lambda it: it[3]),
        )
        spans = np.asarray(outs["spans"])
        scores = np.asarray(outs["score"])
        for i, (vid, record, frame_count, _bounds) in enumerate(items):
            results[vid] = _assemble_relations(
                dataset, record, spans[i], scores[i], frame_count,
                top_per_video,
            )
            if logger:
                logger.info(f"{vid}: {len(results[vid])} span relations")
    return results
