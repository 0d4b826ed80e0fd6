import numpy as np

from tspn_tpu.data.preprocess import consolidate_split, load_consolidated


def test_consolidate_roundtrip(cfg, synthetic_dataset, tmp_path):
    path = consolidate_split(
        cfg, synthetic_dataset, "train", str(tmp_path / "pre.hdf5")
    )
    data = load_consolidated(path)
    r = data["feats"].shape[0]
    assert r > 0
    assert data["feats"].shape[1] == cfg.PREDICT.FEATURE_DIM
    assert data["pairs"].shape == (r, 2)
    assert data["pred_label"].shape == (r, cfg.PREDICT.PREDICATE_NUM)
    assert data["segment_id"].shape == (r,)
    assert len(data["segments"]) == data["segment_id"].max() + 1
    # signatures follow the vsig convention
    assert all("-" in s for s in data["segments"])


def test_consolidated_store_serves_exact_records(cfg, synthetic_dataset, tmp_path):
    """ConsolidatedSegmentDataset (f32) must serve byte-identical records
    to the per-file SegmentDataset it was built from."""
    from tspn_tpu.data.preprocess import ConsolidatedSegmentDataset
    from tspn_tpu.data.vrdataset import SegmentDataset

    path = consolidate_split(
        cfg, synthetic_dataset, "test", str(tmp_path / "test_f32.hdf5")
    )
    cons = ConsolidatedSegmentDataset(cfg, path)
    std = SegmentDataset(cfg, synthetic_dataset, phase="test")
    assert len(cons) == len(std)
    by_index = {std.index[i]: i for i in range(len(std))}
    for k in range(len(cons)):
        ref = std.load_segment(by_index[cons.index[k]])
        rec = cons.load_segment(k)
        assert rec.q8_scales is None
        np.testing.assert_array_equal(rec.feats, ref.feats)
        np.testing.assert_array_equal(rec.pairs, ref.pairs)
        np.testing.assert_array_equal(rec.labels, ref.labels)
        np.testing.assert_array_equal(rec.cls_logits, ref.cls_logits)
        np.testing.assert_array_equal(rec.iou, ref.iou)
        np.testing.assert_array_equal(rec.trackid, ref.trackid)
        assert rec.num_proposals == ref.num_proposals
        assert cons.num_proposals_of(k) == ref.num_proposals


def test_consolidated_q8_predict_equivalence(cfg, synthetic_dataset, tmp_path):
    """End to end: predict_segments over a QUANTIZED consolidated store
    matches the standard per-file path (same segments; top predictions
    agree up to int8 rounding)."""
    import jax

    from tspn_tpu.data.preprocess import ConsolidatedSegmentDataset
    from tspn_tpu.data.vrdataset import SegmentDataset, effective_feature_dim
    from tspn_tpu.models.tspn import build_model
    from tspn_tpu.runtime.predict import predict_segments

    cfg = cfg.clone()
    cfg.RELPN.USE_PPN = False
    cfg.RELPN.USE_DPN = False
    cfg.DATASET.TEST_BATCH_SIZE = 4

    path = consolidate_split(
        cfg, synthetic_dataset, "test", str(tmp_path / "test_q8.hdf5"),
        quantize=True,
    )
    cons = ConsolidatedSegmentDataset(cfg, path)
    assert cons.quantized and cons.feature_width() > cfg.PREDICT.FEATURE_DIM
    rec = cons.load_segment(0)
    assert rec.feats.dtype == np.int8 and rec.q8_scales.shape == (rec.feats.shape[0], 16)

    std = SegmentDataset(cfg, synthetic_dataset, phase="test")
    model = build_model(cfg)
    bucket = min(cfg.BUCKETS.NUM_TRACKLETS)
    p = bucket * (bucket - 1)
    example = {
        "feats": np.zeros((1, p, effective_feature_dim(cfg)), np.float32),
        "pairs": np.zeros((1, p, 2), np.int32),
        "labels": np.zeros((1, p, cfg.PREDICT.PREDICATE_NUM), np.float32),
        "pair_mask": np.zeros((1, p), np.float32),
        "cls_logits": np.zeros((1, bucket, cfg.PREDICT.OBJECT_NUM), np.float32),
        "track_mask": np.zeros((1, bucket), np.float32),
    }
    params = model.init(jax.random.PRNGKey(3), example)["params"]

    out_std = predict_segments(cfg, model, params, std)
    out_q8 = predict_segments(cfg, model, params, cons)
    # q8 + SPMD: sharding the int8 batches over the 8-device mesh must
    # reproduce the single-device q8 output exactly
    cfg_sh = cfg.clone()
    cfg_sh.PREDICT.SHARD_INFERENCE = True
    cfg_sh.DATASET.TEST_BATCH_SIZE = 8
    out_q8_sh = predict_segments(cfg_sh, model, params, cons)
    assert set(out_q8_sh) == set(out_q8)
    for key in out_q8:
        p1 = out_q8[key][0]
        p8 = out_q8_sh[key][0]
        assert len(p1) == len(p8)
        for (s1, t1, i1), (s8, t8, i8) in zip(p1[:10], p8[:10]):
            assert abs(float(s1) - float(s8)) < 1e-5
            np.testing.assert_array_equal(t1, t8)
    assert set(out_std) == set(out_q8)
    agree = 0
    for key in out_std:
        preds_s, iou_s, tid_s = out_std[key]
        preds_q, iou_q, tid_q = out_q8[key]
        np.testing.assert_array_equal(iou_s, iou_q)
        np.testing.assert_array_equal(tid_s, tid_q)
        if not preds_s or not preds_q:
            continue
        s_score, s_trip, s_tids = preds_s[0]
        q_score, q_trip, q_tids = preds_q[0]
        assert abs(float(s_score) - float(q_score)) < 5e-3
        if (s_trip == q_trip).all() and (s_tids == q_tids).all():
            agree += 1
    assert agree >= 0.8 * len(out_std), (agree, len(out_std))


def test_train_from_consolidated_store_matches_per_file(
    cfg, synthetic_dataset, tmp_path, monkeypatch
):
    """Training from the f32 consolidated store must be bit-equivalent
    to per-file training (identical records in identical order -> same
    seeded batches -> same parameters)."""
    import jax
    import numpy as np

    from tspn_tpu.data import preprocess as pp
    from tspn_tpu.runtime.train import train

    cfg = cfg.clone()
    cfg.merge_from_dict({
        "SOLVER": {"MAX_ITER": 5,
                   "SCHEDULER": {"MILESTONES": [3, 4], "WARMUP_ITERS": 2}},
        "DATASET": {"LOGIT_ONLY": True},
        "RELPN": {"USE_PPN": False, "USE_DPN": False},
        "ETC": {"SAVE_FREQ": 50, "DISPLAY_FREQ": 5},
        "BUCKETS": {"SEGMENTS_PER_STEP": 2},
    })
    state_file = train(cfg, synthetic_dataset)

    path = consolidate_split(
        cfg, synthetic_dataset, "train", str(tmp_path / "train_f32.hdf5")
    )
    monkeypatch.setattr(pp, "consolidated_path", lambda phase: path)
    cfg_c = cfg.clone()
    cfg_c.PREDICT.CONSOLIDATED = "f32"
    state_cons = train(cfg_c, synthetic_dataset)

    flat_a = jax.tree_util.tree_leaves(state_file.params)
    flat_b = jax.tree_util.tree_leaves(state_cons.params)
    for a, b in zip(flat_a, flat_b):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-6)


def test_profiling_helpers():
    import jax.numpy as jnp

    from tspn_tpu.runtime.profiling import StepTimer, annotate, trace

    with trace(None):  # no-op path
        with annotate("test_region"):
            x = jnp.ones(8) * 2
    t = StepTimer()
    t.data_ready()
    t.step_done(x)
    assert t.data_time >= 0 and t.step_time >= 0


def test_consolidated_q8f_predict_equivalence(cfg, synthetic_dataset, tmp_path):
    """End to end: predict_segments over the FACTORED int8 store (q8f —
    per-tracklet descriptors + per-pair relative rows, ~3.4x smaller)
    matches the standard per-file path up to int8 rounding."""
    import jax

    from tspn_tpu.data.preprocess import ConsolidatedSegmentDataset
    from tspn_tpu.data.vrdataset import SegmentDataset, effective_feature_dim
    from tspn_tpu.models.tspn import build_model
    from tspn_tpu.runtime.predict import predict_segments

    cfg = cfg.clone()
    cfg.RELPN.USE_PPN = False
    cfg.RELPN.USE_DPN = False
    cfg.DATASET.TEST_BATCH_SIZE = 4

    path = consolidate_split(
        cfg, synthetic_dataset, "test", str(tmp_path / "test_q8f.hdf5"),
        quantize="q8f",
    )
    cons = ConsolidatedSegmentDataset(cfg, path)
    assert cons.quantized and cons.factored
    rec = cons.load_segment(0)
    from tspn_tpu.ops.pairwise import rel_geom, tracklet_geom

    assert rec.feats.dtype == np.int8
    assert rec.feats.shape[1] == rel_geom().device_dim
    assert rec.trk_feats.dtype == np.int8
    assert rec.trk_feats.shape == (rec.num_proposals, tracklet_geom().device_dim)
    assert rec.trk_scales.shape == (rec.num_proposals, 16)

    std = SegmentDataset(cfg, synthetic_dataset, phase="test")
    model = build_model(cfg)
    bucket = min(cfg.BUCKETS.NUM_TRACKLETS)
    p = bucket * (bucket - 1)
    example = {
        "feats": np.zeros((1, p, effective_feature_dim(cfg)), np.float32),
        "pairs": np.zeros((1, p, 2), np.int32),
        "labels": np.zeros((1, p, cfg.PREDICT.PREDICATE_NUM), np.float32),
        "pair_mask": np.zeros((1, p), np.float32),
        "cls_logits": np.zeros((1, bucket, cfg.PREDICT.OBJECT_NUM), np.float32),
        "track_mask": np.zeros((1, bucket), np.float32),
    }
    params = model.init(jax.random.PRNGKey(3), example)["params"]

    out_std = predict_segments(cfg, model, params, std)
    out_q8f = predict_segments(cfg, model, params, cons)
    assert set(out_std) == set(out_q8f)
    # factored + SPMD: sharding the factored batches over the 8-device
    # mesh must reproduce the single-device factored output exactly
    cfg_sh = cfg.clone()
    cfg_sh.PREDICT.SHARD_INFERENCE = True
    cfg_sh.DATASET.TEST_BATCH_SIZE = 8
    out_sh = predict_segments(cfg_sh, model, params, cons)
    assert set(out_sh) == set(out_q8f)
    for key in out_q8f:
        p1, p8 = out_q8f[key][0], out_sh[key][0]
        assert len(p1) == len(p8)
        for (s1, t1, _i1), (s8, t8, _i8) in zip(p1[:10], p8[:10]):
            assert abs(float(s1) - float(s8)) < 1e-5
            np.testing.assert_array_equal(t1, t8)
    agree = 0
    for key in out_std:
        preds_s, iou_s, tid_s = out_std[key]
        preds_q, iou_q, tid_q = out_q8f[key]
        np.testing.assert_array_equal(iou_s, iou_q)
        np.testing.assert_array_equal(tid_s, tid_q)
        if not preds_s or not preds_q:
            continue
        s_score, s_trip, s_tids = preds_s[0]
        q_score, q_trip, q_tids = preds_q[0]
        assert abs(float(s_score) - float(q_score)) < 5e-3
        if (s_trip == q_trip).all() and (s_tids == q_tids).all():
            agree += 1
    assert agree >= 0.8 * len(out_std), (agree, len(out_std))
