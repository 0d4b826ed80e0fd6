"""VidOR-format pipeline (BASELINE config 4): nested VERSION-1.0 annos,
low-memory mode, action eval, and the relation path end to end."""

import os

import numpy as np
import pytest

from tspn_tpu.data.annotations import VidOR
from tspn_tpu.data.vocab import VIDOR_OBJECTS, VIDOR_PREDICATES


@pytest.fixture(scope="module")
def vidor_env(tmp_path_factory):
    from tspn_tpu.config import get_default_config
    from tspn_tpu.data.segments import set_output_dir
    from tspn_tpu.data.synthetic import generate_annotations, generate_segment_artifacts

    root = tmp_path_factory.mktemp("vidor")
    anno_dir = str(root / "annotation")
    out_dir = str(root / "out")
    # action-only predicates so VidOR's action eval has instances
    generate_annotations(
        anno_dir, num_train=3, num_test=2, seed=9,
        object_vocab=VIDOR_OBJECTS, predicate_vocab=VIDOR_PREDICATES,
        num_categories=6, num_predicate_types=0,
        vidor_format=True, splits=("training", "validation"),
    )
    dataset = VidOR(anno_dir, str(root / "videos"), ["training", "validation"],
                    low_memory=True)
    cfg = get_default_config()
    cfg.merge_from_file(os.path.join(
        os.path.dirname(__file__), "..", "configs", "vidor.yaml"
    ))  # 80-wide classeme, 11160-d feature layout
    cfg.PREDICT.PREDICATE_NUM = dataset.get_predicate_num()
    set_output_dir(out_dir)
    generate_segment_artifacts(
        dataset, out_dir, splits=("training", "validation"), seed=9,
        num_objects=cfg.PREDICT.OBJECT_NUM,
        num_predicates=cfg.PREDICT.PREDICATE_NUM,
    )
    return cfg, dataset


def test_vidor_low_memory_annotations(vidor_env):
    cfg, dataset = vidor_env
    assert len(dataset.get_index("training")) == 3
    assert len(dataset.get_index("validation")) == 2
    vid = dataset.get_index("training")[0]
    # low-memory mode re-reads trajectories from disk on demand
    anno = dataset.get_anno(vid)
    assert "trajectories" in anno
    assert anno["version"] == "VERSION 1.0"
    insts = dataset.get_relation_insts(vid)
    assert insts and len(insts[0]["sub_traj"]) > 0


def test_vidor_action_predicates(vidor_env, monkeypatch):
    cfg, dataset = vidor_env
    # contract parity (base_vidor.py:40-42): the full 42-verb action list
    # must exist in the vocabulary; a partial synthetic vocab asserts
    with pytest.raises(AssertionError):
        dataset._get_action_predicates()
    # with the action list restricted to observed predicates,
    # get_action_insts returns subject trajectories per action instance
    observed = [p for p in VidOR.ACTIONS if p in dataset.pred2pid]
    monkeypatch.setattr(VidOR, "ACTIONS", observed)
    found = 0
    for vid in dataset.get_index("training"):
        for inst in dataset.get_action_insts(vid):
            assert inst["category"] in observed
            assert len(inst["trajectory"]) == inst["duration"][1] - inst["duration"][0]
            found += 1
    assert len(VidOR.ACTIONS) == len(observed)


def test_vidor_feature_layout_width(vidor_env):
    """The 80-wide classeme layout (VERDICT item 7): stored artifacts are
    11160-d = 2*80 + 11000 and load through the same data path."""
    from tspn_tpu.data.feature_store import FeatureLayout
    from tspn_tpu.data.vrdataset import SegmentDataset, effective_feature_dim

    cfg, dataset = vidor_env
    layout = FeatureLayout.for_objects(cfg.PREDICT.OBJECT_NUM)
    assert layout.dim == 11160 == cfg.PREDICT.FEATURE_DIM
    assert effective_feature_dim(cfg) == 11160
    seg_ds = SegmentDataset(cfg, dataset, phase="training")
    rec = seg_ds.load_segment(0)
    assert rec.feats.shape[1] == 11160
    assert rec.cls_logits.shape[1] == 80


def test_vidor_preprocess_cli(vidor_env, tmp_path):
    """base.py --preprocess works for VidOR-width vocabularies (the
    reference's base.py:29 path is broken; round 1 refused >35 classes)."""
    import argparse
    import glob

    import h5py

    import base as base_mod
    from tspn_tpu.data.feature_store import FeatureLayout
    from tspn_tpu.data.segments import get_output_dir, set_output_dir

    cfg, dataset = vidor_env
    cfg = cfg.clone()
    cfg.ETC.OUTPUT_DIR = str(tmp_path / "pp_out")

    layout = FeatureLayout.for_objects(cfg.PREDICT.OBJECT_NUM)
    assert cfg.PREDICT.FEATURE_DIM == layout.dim  # vidor.yaml consistency

    bad = cfg.clone()
    bad.PREDICT.FEATURE_DIM = 11070  # stale VidVRD width with 80 classes

    args = argparse.Namespace(dataset="vidor")
    fixture_out_dir = get_output_dir()
    real_build = base_mod._build_basedata
    base_mod._build_basedata = lambda a, d: dataset
    try:
        with pytest.raises(ValueError, match="FEATURE_DIM"):
            base_mod.preprocessing(bad, args, "unused")
        base_mod.preprocessing(cfg, args, "unused")
    finally:
        base_mod._build_basedata = real_build
        set_output_dir(fixture_out_dir)  # restore the module fixture's root
    h5s = glob.glob(os.path.join(cfg.ETC.OUTPUT_DIR, "**", "*.h5"),
                    recursive=True)
    assert h5s, "preprocessing wrote no segment artifacts"
    with h5py.File(h5s[0], "r") as f:
        assert f["feats"].shape[1] == 11160


def test_vidor_relation_pipeline_end_to_end(vidor_env):
    from tspn_tpu.data.vrdataset import SegmentDataset
    from tspn_tpu.runtime.train import train
    from tspn_tpu.runtime.predict import predict_segments
    from tspn_tpu.models.tspn import build_model
    from tspn_tpu.runtime.checkpoint import latest_checkpoint, load_checkpoint
    from tspn_tpu.data.segments import get_model_path
    import jax

    cfg, dataset = vidor_env
    cfg = cfg.clone()
    cfg.merge_from_dict({
        "SOLVER": {"MAX_ITER": 60,
                   "SCHEDULER": {"MILESTONES": [40, 50], "WARMUP_ITERS": 10}},
        "DATASET": {"LOGIT_ONLY": True, "TEST_BATCH_SIZE": 4},
        "RELPN": {"USE_PPN": False, "USE_DPN": False},
        "ETC": {"SAVE_FREQ": 60, "DISPLAY_FREQ": 30},
        "BUCKETS": {"SEGMENTS_PER_STEP": 4},
    })
    # 'train' split name is inferred from 'training' (dataset.py:104-115)
    state = train(cfg, dataset)
    assert state is not None

    seg_ds = SegmentDataset(cfg, dataset, phase="validation")
    model = build_model(cfg)
    out = predict_segments(cfg, model, state.params, seg_ds)
    assert len(out) > 0
    preds, iou, trackid = next(iter(out.values()))
    assert len(preds) > 0


def test_vidor_long_video_scale(tmp_path):
    """VidOR-length stress at test scale (SURVEY §5.7's concern; the
    full-scale numbers come from tools/stress_vidor.py): a 1200-frame
    video produces ~79 stride-15 segments, every record lands in a
    configured fixed-shape tracklet bucket, and batched inference walks
    the whole video without ragged shapes or memory growth per segment.
    """
    import resource

    import jax

    from tspn_tpu.config import get_default_config
    from tspn_tpu.data.segments import (
        get_output_dir,
        segment_video,
        set_output_dir,
    )
    from tspn_tpu.data.synthetic import (
        generate_annotations,
        generate_segment_artifacts,
    )
    from tspn_tpu.data.vrdataset import SegmentDataset, effective_feature_dim
    from tspn_tpu.models.tspn import build_model
    from tspn_tpu.runtime.predict import predict_segments

    frames = 1200
    anno_dir = str(tmp_path / "annotation")
    generate_annotations(
        anno_dir, num_train=1, num_test=1, frame_count=frames,
        objects_per_video=5, relations_per_video=6, seed=17,
        object_vocab=VIDOR_OBJECTS, predicate_vocab=VIDOR_PREDICATES,
        num_categories=10, num_predicate_types=8,
        vidor_format=True, splits=("training", "validation"),
    )
    dataset = VidOR(anno_dir, str(tmp_path / "videos"),
                    ["training", "validation"], low_memory=True)
    cfg = get_default_config()
    cfg.merge_from_file(os.path.join(
        os.path.dirname(__file__), "..", "configs", "vidor.yaml"
    ))
    cfg.PREDICT.PREDICATE_NUM = dataset.get_predicate_num()
    cfg.DATASET.TEST_BATCH_SIZE = 16

    prev_out = get_output_dir()
    set_output_dir(str(tmp_path / "out"))
    try:
        generate_segment_artifacts(
            dataset, str(tmp_path / "out"),
            splits=("training", "validation"), seed=17,
            num_objects=cfg.PREDICT.OBJECT_NUM,
        )
        # 30/15 tiling count holds at length
        assert len(segment_video(0, frames)) == frames // 15 - 1

        test_ds = SegmentDataset(cfg, dataset, phase="validation")
        assert len(test_ds) >= frames // 15 - 5
        from tspn_tpu.data.vrdataset import pick_bucket

        buckets = {
            pick_bucket(
                test_ds.load_segment(i).num_proposals,
                cfg.BUCKETS.NUM_TRACKLETS,
            )
            for i in range(0, len(test_ds), 7)
        }
        assert buckets <= set(cfg.BUCKETS.NUM_TRACKLETS), buckets

        model = build_model(cfg)
        bucket = min(cfg.BUCKETS.NUM_TRACKLETS)
        p = bucket * (bucket - 1)
        example = {
            "feats": np.zeros((1, p, effective_feature_dim(cfg)), np.float32),
            "pairs": np.zeros((1, p, 2), np.int32),
            "labels": np.zeros((1, p, cfg.PREDICT.PREDICATE_NUM), np.float32),
            "pair_mask": np.zeros((1, p), np.float32),
            "cls_logits": np.zeros(
                (1, bucket, cfg.PREDICT.OBJECT_NUM), np.float32
            ),
            "track_mask": np.zeros((1, bucket), np.float32),
        }
        params = model.init(jax.random.PRNGKey(0), example)["params"]

        rss_before = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss
        out = predict_segments(cfg, model, params, test_ds)
        rss_growth_mb = (
            resource.getrusage(resource.RUSAGE_SELF).ru_maxrss - rss_before
        ) / 1024.0
        assert len(out) == len(test_ds)
        preds, iou, trackid = next(iter(out.values()))
        assert len(preds) > 0
        # fixed-shape batching: walking 79 segments must not accumulate
        # per-segment device programs or host buffers (generous ceiling —
        # the batch buffers themselves are ~100 MB at this layout)
        assert rss_growth_mb < 1500, f"rss grew {rss_growth_mb:.0f} MB"
    finally:
        set_output_dir(prev_out)


def test_vidor_span_mode_end_to_end(vidor_env):
    """Span mode ("when to look") over the VidOR layout: train the span
    model and detect spans on the validation split — the bounded pin of
    tools/stress_vidor.py --span (VERDICT r4 item 6). Exercises the
    80-class / 11160-d feature width through build_video_pair_record,
    span training's segment-count buckets, and span inference."""
    from tspn_tpu.runtime.span_predict import detect_spans
    from tspn_tpu.runtime.span_train import train_span_model

    cfg, dataset = vidor_env
    cfg = cfg.clone()
    cfg.RELPN.USE_PPN = False
    cfg.RELPN.USE_DPN = True
    cfg.RELPN.DPN.JOINT_OBJECTIVE = True
    model, params = train_span_model(cfg, dataset, max_iter=40, lr=2e-3)
    results = detect_spans(cfg, dataset, model, params)
    assert set(results) == set(dataset.get_index("validation"))
    rels = [r for v in results.values() for r in v]
    assert rels, "span mode produced no relations on the VidOR fixture"
    frame_count = dataset.get_anno(dataset.get_index("validation")[0])[
        "frame_count"
    ]
    for r in rels:
        assert 0 <= r["duration"][0] < r["duration"][1] <= frame_count
        assert len(r["sub_traj"]) == r["duration"][1] - r["duration"][0]
