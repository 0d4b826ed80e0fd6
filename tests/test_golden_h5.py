"""Byte-frozen artifact-contract regression (VERDICT r2 item 7).

tests/fixtures/golden_vidvrd holds a tiny VidVRD dataset's annotation
JSONs, per-segment relation h5 files, and traj_cls JSONs frozen
BYTE-FOR-BYTE (tools/make_golden_fixture.py), plus golden expectations.
These tests assert the current code consumes those exact bytes into the
exact recorded values — any drift in the h5 schema (trackid/pairs/feats/
iou, vrdataset.py:190-217 of the reference), the segment signature
paths, the label-matching semantics, or the top-k prediction contract
fails here first.
"""

import json
import os

import numpy as np
import pytest

FIXTURE = os.path.join(os.path.dirname(__file__), "fixtures", "golden_vidvrd")


@pytest.fixture(scope="module")
def golden_dataset():
    from tspn_tpu.data.annotations import VidVRD
    from tspn_tpu.data.segments import set_output_dir

    set_output_dir(os.path.join(FIXTURE, "output"))
    data_dir = os.path.join(FIXTURE, "vidvrd")
    ds = VidVRD(data_dir, os.path.join(data_dir, "videos"), ["train", "test"])
    yield ds
    set_output_dir("./vidvrd-baseline-output")


def test_reader_returns_recorded_bytes(golden_dataset):
    """read_segment_features on the frozen h5 must reproduce the recorded
    arrays exactly (dtype-level: trackid/pairs int, feats/iou f32)."""
    from tspn_tpu.data.feature_store import read_segment_features
    from tspn_tpu.data.segments import set_output_dir

    set_output_dir(os.path.join(FIXTURE, "output"))
    vid = golden_dataset.get_index(split="test")[0]
    seg = read_segment_features(vid, 0, 30)
    assert seg is not None
    exp = np.load(os.path.join(FIXTURE, "expected_read.npz"))
    np.testing.assert_array_equal(seg.trackid, exp["trackid"])
    np.testing.assert_array_equal(seg.pairs, exp["pairs"])
    np.testing.assert_array_equal(seg.feats, exp["feats"])
    np.testing.assert_array_equal(seg.iou, exp["iou"])
    # schema invariants of the reference layout
    assert seg.feats.shape[1] == 11070
    assert seg.pairs.shape[0] == seg.feats.shape[0]
    assert seg.iou.shape == (seg.trackid.shape[0], seg.trackid.shape[0])


def test_detect_path_consumes_frozen_artifacts(golden_dataset):
    """predict_segments over the frozen bytes with numpy-seeded weights
    must reproduce the recorded top predictions (scores to 5e-6, triplet
    and pair indices exactly)."""
    from tspn_tpu.config import get_default_config
    from tspn_tpu.data.segments import set_output_dir
    from tspn_tpu.data.vrdataset import SegmentDataset
    from tspn_tpu.models.tspn import build_model
    from tspn_tpu.runtime.predict import predict_segments
    from tools.make_golden_fixture import _seeded_params

    set_output_dir(os.path.join(FIXTURE, "output"))
    cfg = get_default_config()
    cfg.PREDICT.PREDICATE_NUM = golden_dataset.get_predicate_num()
    cfg.RELPN.USE_PPN = False
    cfg.RELPN.USE_DPN = False
    cfg.DATASET.TEST_BATCH_SIZE = 1

    sds = SegmentDataset(cfg, golden_dataset, phase="test")
    model = build_model(cfg)
    params = _seeded_params(model, cfg, sds)
    out = predict_segments(cfg, model, params, sds)

    with open(os.path.join(FIXTURE, "golden_predictions.json")) as f:
        golden = json.load(f)["predictions"]

    got = {}
    for (v, fs, fe), (preds, _iou, _tid) in out.items():
        got[f"{v}-{fs:04d}-{fe:04d}"] = [
            [float(s), [int(x) for x in trip], [int(x) for x in pair]]
            for s, trip, pair in preds[:10]
        ]
    assert set(got) == set(golden)
    for key in golden:
        assert len(got[key]) == len(golden[key])
        for (s_g, trip_g, pair_g), (s_n, trip_n, pair_n) in zip(
            golden[key], got[key]
        ):
            assert abs(s_g - s_n) < 5e-6, key
            assert trip_g == trip_n, key
            assert pair_g == pair_n, key


def test_predict_pipeline_depth_parity(golden_dataset):
    """The deferred-readback software pipeline in predict_segments
    (pipeline_depth=2, the default) must produce bit-identical results to
    the fully synchronous loop (depth 0, the reference's structure)."""
    from tspn_tpu.config import get_default_config
    from tspn_tpu.data.segments import set_output_dir
    from tspn_tpu.data.vrdataset import SegmentDataset
    from tspn_tpu.models.tspn import build_model
    from tspn_tpu.runtime.predict import build_infer, predict_segments
    from tools.make_golden_fixture import _seeded_params

    set_output_dir(os.path.join(FIXTURE, "output"))
    cfg = get_default_config()
    cfg.PREDICT.PREDICATE_NUM = golden_dataset.get_predicate_num()
    cfg.RELPN.USE_PPN = False
    cfg.RELPN.USE_DPN = False
    cfg.DATASET.TEST_BATCH_SIZE = 1

    sds = SegmentDataset(cfg, golden_dataset, phase="test")
    model = build_model(cfg)
    params = _seeded_params(model, cfg, sds)
    # one shared traced program: isolates the variable under test (the
    # readback scheduling) and avoids double trace/compile cost
    infer = build_infer(cfg, model, params, sds)
    out_sync = predict_segments(
        cfg, model, params, sds, infer=infer, pipeline_depth=0
    )
    out_pipe = predict_segments(
        cfg, model, params, sds, infer=infer, pipeline_depth=2
    )

    assert set(out_sync) == set(out_pipe)
    for key in out_sync:
        preds_s, iou_s, tid_s = out_sync[key]
        preds_p, iou_p, tid_p = out_pipe[key]
        np.testing.assert_array_equal(iou_s, iou_p)
        np.testing.assert_array_equal(tid_s, tid_p)
        assert len(preds_s) == len(preds_p)
        for (s_a, trip_a, pair_a), (s_b, trip_b, pair_b) in zip(
            preds_s, preds_p
        ):
            assert s_a == s_b
            np.testing.assert_array_equal(trip_a, trip_b)
            np.testing.assert_array_equal(pair_a, pair_b)


def test_train_labels_from_frozen_artifacts(golden_dataset):
    """Label matching over the frozen train segment: multi-hot rows keyed
    by pair row (the documented fix of the reference's scrambled label
    dict, DESIGN.md §3.1) must stay deterministic."""
    from tspn_tpu.config import get_default_config
    from tspn_tpu.data.segments import set_output_dir
    from tspn_tpu.data.vrdataset import SegmentDataset

    set_output_dir(os.path.join(FIXTURE, "output"))
    cfg = get_default_config()
    cfg.PREDICT.PREDICATE_NUM = golden_dataset.get_predicate_num()
    sds = SegmentDataset(cfg, golden_dataset, phase="train")
    assert len(sds) > 0
    rec = sds.load_segment(0)
    # positives exist and every label row aligns with a proposal pair row
    assert rec.labels.shape == (rec.feats.shape[0], cfg.PREDICT.PREDICATE_NUM)
    assert rec.labels.sum() > 0
    assert rec.labels.max() <= 1.0
