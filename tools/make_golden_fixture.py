"""Generate the byte-frozen golden fixture under tests/fixtures/golden_vidvrd.

The fixture pins the on-disk artifact contract (VERDICT r2 item 7): one
tiny synthetic VidVRD video's annotation JSON, per-segment relation h5
files (trackid/pairs/feats/iou — the reference's schema,
/root/reference/lib/dataset/vrdataset.py:190-217), and traj_cls JSONs,
all checked in BYTE-FOR-BYTE, plus golden expected values:

  * expected_read.npz   — exact arrays read_segment_features must return
  * golden_predictions.json — top predictions from predict_segments with
    numpy-seeded weights (stable across platforms, no stored checkpoint)

tests/test_golden_h5.py asserts both; any future drift in the h5 layout,
the feature permutation, the label matching, or the top-k selection
changes the outputs and fails the regression.

Run ONCE (python tools/make_golden_fixture.py) and commit the output;
re-running must be a deliberate contract change.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

FIXTURE = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "tests", "fixtures", "golden_vidvrd",
)


def main():
    import jax

    jax.config.update("jax_platforms", "cpu")

    from tspn_tpu.config import get_default_config
    from tspn_tpu.data.annotations import VidVRD
    from tspn_tpu.data.feature_store import read_segment_features
    from tspn_tpu.data.segments import set_output_dir
    from tspn_tpu.data.synthetic import (
        generate_annotations,
        generate_segment_artifacts,
    )
    from tspn_tpu.data.vrdataset import SegmentDataset
    from tspn_tpu.models.tspn import build_model
    from tspn_tpu.runtime.predict import predict_segments

    work = tempfile.mkdtemp()
    data_dir = os.path.join(work, "vidvrd")
    out_dir = os.path.join(work, "output")
    # one tiny test video: 45 frames -> 2 segments (30/15 tiling)
    generate_annotations(
        data_dir, num_train=1, num_test=1, frame_count=45,
        objects_per_video=2, relations_per_video=2, seed=23,
        num_categories=4, num_predicate_types=6,
    )
    dataset = VidVRD(
        data_dir, os.path.join(data_dir, "videos"), ["train", "test"]
    )
    generate_segment_artifacts(dataset, out_dir, seed=23)

    if os.path.exists(FIXTURE):
        shutil.rmtree(FIXTURE)
    os.makedirs(FIXTURE)
    # freeze annotation + artifact trees byte-for-byte
    shutil.copytree(data_dir, os.path.join(FIXTURE, "vidvrd"))
    shutil.copytree(out_dir, os.path.join(FIXTURE, "output"))

    set_output_dir(os.path.join(FIXTURE, "output"))
    test_vids = dataset.get_index(split="test")
    vid = test_vids[0]

    # ---- golden reader expectation for the first test segment
    seg = read_segment_features(vid, 0, 30)
    np.savez_compressed(
        os.path.join(FIXTURE, "expected_read.npz"),
        trackid=seg.trackid, pairs=seg.pairs, feats=seg.feats, iou=seg.iou,
    )

    # ---- golden predictions with numpy-seeded weights
    cfg = get_default_config()
    cfg.PREDICT.PREDICATE_NUM = dataset.get_predicate_num()
    cfg.RELPN.USE_PPN = False
    cfg.RELPN.USE_DPN = False
    cfg.DATASET.TEST_BATCH_SIZE = 1

    sds = SegmentDataset(cfg, dataset, phase="test")
    model = build_model(cfg)
    params = _seeded_params(model, cfg, sds)
    out = predict_segments(cfg, model, params, sds)

    golden = {}
    for (v, fs, fe), (preds, _iou, _tid) in out.items():
        golden[f"{v}-{fs:04d}-{fe:04d}"] = [
            [round(float(s), 6), [int(x) for x in trip], [int(x) for x in pair]]
            for s, trip, pair in preds[:10]
        ]
    with open(os.path.join(FIXTURE, "golden_predictions.json"), "w") as f:
        json.dump({"vid": vid, "predictions": golden}, f, indent=1, sort_keys=True)

    print(f"fixture written to {FIXTURE}")
    for root, _dirs, files in os.walk(FIXTURE):
        for fn in files:
            p = os.path.join(root, fn)
            print(f"  {os.path.relpath(p, FIXTURE):60s} {os.path.getsize(p):8d} B")


def _seeded_params(model, cfg, sds):
    """Deterministic parameters from numpy (stable across jax versions):
    shapes taken from a normal init, values replaced via RandomState."""
    import jax

    from tspn_tpu.data.vrdataset import effective_feature_dim

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
    params = model.init(jax.random.PRNGKey(0), example)["params"]
    rng = np.random.RandomState(1234)
    leaves, treedef = jax.tree_util.tree_flatten(params)
    leaves = [
        np.asarray(rng.randn(*np.shape(leaf)) * 0.01, np.float32)
        for leaf in leaves
    ]
    return jax.tree_util.tree_unflatten(treedef, leaves)


if __name__ == "__main__":
    main()
