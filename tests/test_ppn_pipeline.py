"""Full-model path: PPN enabled (configs/tspn.yaml), train + predict."""

import os

import numpy as np
import pytest


def test_tspn_config_trains_and_predicts(tmp_path):
    import jax

    from tspn_tpu.config import get_default_config
    from tspn_tpu.data.annotations import VidVRD
    from tspn_tpu.data.segments import set_output_dir
    from tspn_tpu.data.synthetic import generate_annotations, generate_segment_artifacts
    from tspn_tpu.data.vrdataset import SegmentDataset
    from tspn_tpu.models.ppn import top_pair_proposals
    from tspn_tpu.models.tspn import build_model
    from tspn_tpu.runtime.predict import predict_segments
    from tspn_tpu.runtime.train import train

    data_dir = str(tmp_path / "vidvrd")
    generate_annotations(data_dir, num_train=4, num_test=1, seed=21,
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
    out = predict_segments(cfg, model, state.params, seg_ds)
    assert len(out) > 0

    # PPN pair proposals: top pairs from a real segment's classemes
    import jax.numpy as jnp

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
