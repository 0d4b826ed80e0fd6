"""Full-model path: PPN enabled (configs/tspn.yaml), train + predict,
and the PPN proposal pruning consumed at inference (the paper's "what
to look"; reference computes proposals at test time, relpn/ppn.py:81-89,
but never consumes them downstream)."""

import os
from collections import defaultdict

import numpy as np
import pytest

from tspn_tpu import association
from tspn_tpu.evaluation import eval_visual_relation


@pytest.fixture(scope="module")
def ppn_trained(tmp_path_factory):
    from tspn_tpu.config import get_default_config
    from tspn_tpu.data.annotations import VidVRD
    from tspn_tpu.data.segments import set_output_dir
    from tspn_tpu.data.synthetic import generate_annotations, generate_segment_artifacts
    from tspn_tpu.data.vrdataset import SegmentDataset
    from tspn_tpu.models.tspn import build_model
    from tspn_tpu.runtime.train import train

    tmp_path = tmp_path_factory.mktemp("ppn_pipe")
    data_dir = str(tmp_path / "vidvrd")
    generate_annotations(data_dir, num_train=4, num_test=2, seed=21,
                         num_categories=5, num_predicate_types=6)
    dataset = VidVRD(data_dir, os.path.join(data_dir, "videos"), ["train", "test"])
    set_output_dir(str(tmp_path / "out"))
    generate_segment_artifacts(dataset, str(tmp_path / "out"), seed=21)

    cfg = get_default_config()
    cfg.merge_from_file("configs/tspn.yaml")
    cfg.merge_from_dict({
        "PREDICT": {"PREDICATE_NUM": dataset.get_predicate_num()},
        "RELPN": {"USE_DPN": False},  # DPN is the video-level phase
        "SOLVER": {"MAX_ITER": 80,
                   "SCHEDULER": {"MILESTONES": [50, 70], "WARMUP_ITERS": 15}},
        "ETC": {"SAVE_FREQ": 80, "DISPLAY_FREQ": 40},
        "BUCKETS": {"SEGMENTS_PER_STEP": 4},
        "DATASET": {"TEST_BATCH_SIZE": 4},
    })
    state = train(cfg, dataset)
    assert state is not None
    assert "ppn_head" in state.params  # PPN actually trained

    model = build_model(cfg)
    seg_ds = SegmentDataset(cfg, dataset, phase="test")
    return cfg, dataset, model, state, seg_ds


def _eval_short_term(dataset, short_term):
    video_st = defaultdict(list)
    for index, st in short_term.items():
        video_st[index[0]].append((index, st))
    results = {
        vid: association.greedy_relational_association(dataset, rels, 100)
        for vid, rels in video_st.items()
    }
    gt = {vid: dataset.get_relation_insts(vid) for vid in dataset.get_index("test")}
    mean_ap, rec_at_n, _ = eval_visual_relation(gt, results, verbose=False)
    return mean_ap, rec_at_n


def test_tspn_config_trains_and_predicts(ppn_trained):
    import jax.numpy as jnp

    from tspn_tpu.models.ppn import top_pair_proposals
    from tspn_tpu.runtime.predict import predict_segments

    cfg, dataset, model, state, seg_ds = ppn_trained
    out = predict_segments(cfg, model, state.params, seg_ds)
    assert len(out) > 0

    # PPN pair proposals: top pairs from a real segment's classemes
    rec = seg_ds.load_segment(0)
    n = rec.cls_logits.shape[0]
    pair_logits = model.apply(
        {"params": state.params},
        {"feats": jnp.asarray(rec.feats[None]),
         "pairs": jnp.zeros((1, rec.feats.shape[0], 2), jnp.int32),
         "labels": jnp.zeros((1, rec.feats.shape[0], cfg.PREDICT.PREDICATE_NUM)),
         "pair_mask": jnp.ones((1, rec.feats.shape[0])),
         "cls_logits": jnp.asarray(rec.cls_logits[None]),
         "track_mask": jnp.ones((1, n))},
    )["pair_logits"]
    idx, scores = top_pair_proposals(
        pair_logits[0], jnp.ones(n), cfg.RELPN.PPN.NUM_PAIR_PROPOSALS
    )
    assert idx.shape[0] == min(cfg.RELPN.PPN.NUM_PAIR_PROPOSALS, n * n)
    assert np.all(np.asarray(scores) >= 0) and np.all(np.asarray(scores) <= 1)


def test_pruned_infer_equals_full_when_k_covers_all_pairs(ppn_trained):
    """num_pair_proposals = P must reproduce the unpruned selection
    exactly — validates the pruned path's row-index mapping."""
    from tspn_tpu.runtime.predict import _make_batched_infer

    cfg, dataset, model, state, seg_ds = ppn_trained
    from tspn_tpu.data.loader import BucketedLoader
    from tspn_tpu.data.vrdataset import effective_feature_dim

    loader = BucketedLoader(
        seg_ds, buckets=cfg.BUCKETS.NUM_TRACKLETS, batch_size=2,
        feature_dim=effective_feature_dim(cfg),
        num_predicates=cfg.PREDICT.PREDICATE_NUM,
        num_objects=cfg.PREDICT.OBJECT_NUM,
        max_iter=None, shuffle=False,
    )
    bucket, batch, *_ = next(iter(loader))
    p = batch["feats"].shape[1]
    full = _make_batched_infer(model, 5, 20)
    pruned = _make_batched_infer(model, 5, 20, num_pair_proposals=p)
    ref = [np.asarray(x) for x in full(state.params, batch)]
    got = [np.asarray(x) for x in pruned(state.params, batch)]
    np.testing.assert_allclose(got[0], ref[0], rtol=1e-5)   # scores
    np.testing.assert_array_equal(got[1][ref[3]], ref[1][ref[3]])  # pair rows
    np.testing.assert_array_equal(got[2][ref[3]], ref[2][ref[3]])  # predicates
    np.testing.assert_array_equal(got[3], ref[3])           # valid mask


def test_pruned_q8f_equals_full_q8f(ppn_trained, tmp_path):
    """PPN pruning composes with the factored (q8f) store: K = P must
    reproduce the unpruned q8f selection exactly (the factored kernel
    scores arbitrary pair lists, so pruning is just a row gather)."""
    import numpy as _np

    from tspn_tpu.data.loader import BucketedLoader
    from tspn_tpu.data.preprocess import (
        ConsolidatedSegmentDataset,
        consolidate_split,
    )
    from tspn_tpu.runtime.predict import (
        _make_batched_infer,
        _q8f_classifier_weights,
    )

    cfg, dataset, model, state, seg_ds = ppn_trained
    path = consolidate_split(
        cfg, dataset, "test", str(tmp_path / "q8f.hdf5"), quantize="q8f"
    )
    ds = ConsolidatedSegmentDataset(cfg, path)
    loader = BucketedLoader(
        ds, buckets=cfg.BUCKETS.NUM_TRACKLETS, batch_size=2,
        feature_dim=ds.feature_width(), feats_dtype=_np.int8,
        num_predicates=cfg.PREDICT.PREDICATE_NUM,
        num_objects=cfg.PREDICT.OBJECT_NUM,
        max_iter=None, shuffle=False,
    )
    bucket, batch, *_ = next(iter(loader))
    p = batch["feats"].shape[1]
    q8fw = _q8f_classifier_weights(cfg, state.params)
    full = _make_batched_infer(model, 5, 20, q8f_weights=q8fw)
    pruned = _make_batched_infer(
        model, 5, 20, num_pair_proposals=p, q8f_weights=q8fw
    )
    ref = [np.asarray(x) for x in full(state.params, batch)]
    got = [np.asarray(x) for x in pruned(state.params, batch)]
    np.testing.assert_allclose(got[0], ref[0], rtol=1e-5)          # scores
    np.testing.assert_array_equal(got[1][ref[3]], ref[1][ref[3]])  # pair rows
    np.testing.assert_array_equal(got[2][ref[3]], ref[2][ref[3]])  # predicates
    np.testing.assert_array_equal(got[3], ref[3])                  # valid


def test_ppn_pruning_keeps_map_with_fewer_scored_pairs(ppn_trained):
    """PPN-on must score materially fewer pairs without losing mAP
    (the trained PPN ranks the related pairs on top)."""
    from tspn_tpu.runtime.predict import predict_segments

    cfg, dataset, model, state, seg_ds = ppn_trained
    map_off, rec_off = _eval_short_term(
        dataset, predict_segments(cfg, model, state.params, seg_ds)
    )

    cfg_on = cfg.clone()
    cfg_on.RELPN.PPN.PRUNE_AT_INFERENCE = True
    cfg_on.RELPN.PPN.NUM_PAIR_PROPOSALS = 16  # < P for every bucket >= 8
    map_on, rec_on = _eval_short_term(
        dataset, predict_segments(cfg_on, model, state.params, seg_ds)
    )
    assert map_off > 0.1, f"baseline mAP {map_off} too low to compare"
    assert map_on >= 0.95 * map_off, (
        f"PPN pruning lost accuracy: on={map_on:.4f} off={map_off:.4f}"
    )


def test_ppn_score_fusion_runs(ppn_trained):
    from tspn_tpu.runtime.predict import predict_segments

    cfg, dataset, model, state, seg_ds = ppn_trained
    cfg_f = cfg.clone()
    cfg_f.RELPN.PPN.PRUNE_AT_INFERENCE = True
    cfg_f.RELPN.PPN.FUSE_SCORE = True
    cfg_f.RELPN.PPN.NUM_PAIR_PROPOSALS = 16
    out = predict_segments(cfg_f, model, state.params, seg_ds)
    assert len(out) > 0
    preds, _, _ = next(iter(out.values()))
    assert all(0.0 <= float(s) <= 1.0 for s, _, _ in preds)
