"""End-to-end slice: synthetic data -> train -> predict -> associate -> eval.

This is the golden regression the reference never had (SURVEY.md section
4): the full baseline pipeline (configs/baseline.yaml semantics:
LOGIT_ONLY, PPN/DPN off, Linear(11070->132)+sigmoid) must learn the
synthetic predicate signal and produce a prediction JSON whose relation
mAP is far above chance.
"""

import json
import os
from collections import defaultdict

import numpy as np
import pytest

from tspn_tpu import association
from tspn_tpu.data.segments import get_model_path
from tspn_tpu.evaluation import eval_visual_relation


@pytest.fixture(scope="module")
def trained(tmp_path_factory):
    import tests.conftest as C
    from tspn_tpu.config import get_default_config
    from tspn_tpu.data.annotations import VidVRD
    from tspn_tpu.data.segments import set_output_dir
    from tspn_tpu.data.synthetic import generate_annotations, generate_segment_artifacts
    from tspn_tpu.runtime.train import train

    root = tmp_path_factory.mktemp("e2e")
    data_dir = str(root / "vidvrd")
    out_dir = str(root / "out")
    generate_annotations(
        data_dir, num_train=6, num_test=2, seed=3,
        num_categories=5, num_predicate_types=8,
    )
    dataset = VidVRD(data_dir, os.path.join(data_dir, "videos"), ["train", "test"])
    generate_segment_artifacts(dataset, out_dir, seed=3)

    cfg = get_default_config()
    cfg.merge_from_file("configs/baseline.yaml")
    # the predicate head must match the dataset vocabulary (the reference
    # hard-codes 132 because full VidVRD observes all 132 predicates; the
    # synthetic mini-set observes fewer)
    cfg.PREDICT.PREDICATE_NUM = dataset.get_predicate_num()
    cfg.SOLVER.MAX_ITER = 150
    cfg.SOLVER.SCHEDULER.MILESTONES = [80, 120]
    cfg.SOLVER.SCHEDULER.WARMUP_ITERS = 30
    cfg.ETC.SAVE_FREQ = 150
    cfg.BUCKETS.SEGMENTS_PER_STEP = 8
    set_output_dir(out_dir)
    state = train(cfg, dataset)
    cfg.ETC.MODEL_DUMP_FILE = "baseline_weights_iter_150.pt"
    return cfg, dataset, out_dir, state


def test_training_reduces_loss(trained, capsys):
    cfg, dataset, out_dir, state = trained
    assert state is not None
    assert int(np.asarray(state.step)) == 150


def test_checkpoint_written(trained):
    cfg, dataset, out_dir, _ = trained
    assert os.path.exists(os.path.join(get_model_path(), cfg.ETC.MODEL_DUMP_FILE))


def test_predict_detect_eval(trained):
    cfg, dataset, out_dir, _ = trained
    from tspn_tpu.runtime.predict import predict

    short_term = predict(cfg, dataset)
    assert len(short_term) > 0
    # output contract: (predictions, iou, trackid)
    preds, iou, trackid = next(iter(short_term.values()))
    assert len(preds) > 0
    score, triplet, pair_tid = preds[0]
    assert triplet.shape == (3,)
    assert pair_tid.shape == (2,)
    assert iou.ndim == 2 and trackid.ndim == 1

    video_st = defaultdict(list)
    for index, st in short_term.items():
        video_st[index[0]].append((index, st))
    results = {
        vid: association.greedy_relational_association(dataset, rels, 100)
        for vid, rels in video_st.items()
    }
    out_path = os.path.join(get_model_path(), "baseline_relation_prediction.json")
    with open(out_path, "w") as f:
        json.dump({"version": "VERSION 1.0", "results": results}, f)

    groundtruth = {
        vid: dataset.get_relation_insts(vid) for vid in dataset.get_index("test")
    }
    mean_ap, rec_at_n, mprec_at_n = eval_visual_relation(
        groundtruth, results, verbose=False
    )
    # strong synthetic signal -> must beat chance by a wide margin
    assert mean_ap > 0.15, f"mAP {mean_ap} too low"
    assert rec_at_n[50] > 0.2, f"R@50 {rec_at_n[50]} too low"
