import numpy as np
import pytest

from tspn_tpu.data.vrdataset import SegmentDataset, pad_record, pick_bucket


@pytest.fixture()
def train_ds(cfg, synthetic_dataset):
    return SegmentDataset(cfg, synthetic_dataset, phase="train")


def test_enumerates_segments_with_features(train_ds):
    assert len(train_ds) > 0
    for vid, fstart, fend in train_ds.index:
        assert fend - fstart == 30


def test_segment_record_shapes(train_ds, cfg):
    rec = train_ds.load_segment(0)
    n = rec.num_proposals
    assert rec.feats.shape[1] == cfg.PREDICT.FEATURE_DIM
    assert rec.labels.shape == (rec.feats.shape[0], cfg.PREDICT.PREDICATE_NUM)
    assert rec.pairs.shape == (rec.feats.shape[0], 2)
    # proposal-proposal pairs only: n*(n-1) rows
    assert rec.feats.shape[0] == n * (n - 1)
    assert rec.cls_logits.shape == (n, cfg.PREDICT.OBJECT_NUM)


def test_labels_aligned_with_pairs(train_ds, synthetic_dataset, cfg):
    """Positive labels sit on rows whose pair overlaps GT sub/obj —
    regression test for the reference's scrambled label dict
    (vrdataset.py:85-138)."""
    found_positive = False
    for i in range(len(train_ds)):
        rec = train_ds.load_segment(i)
        pos_rows = np.where(rec.labels.sum(axis=1) > 0)[0]
        if pos_rows.size == 0:
            continue
        found_positive = True
        index = train_ds.index[i]
        insts = train_ds.gt_rel_insts[index]
        gt_pos = {int(t): k for k, t in enumerate(rec.trackid) if t >= 0}
        for row in pos_rows:
            i1, i2 = rec.pairs[row]
            preds = np.where(rec.labels[row] > 0)[0]
            # every active predicate must be justified by some GT inst
            for p in preds:
                ok = any(
                    pid == p
                    and rec.iou[i1, gt_pos[st]] >= 0.5
                    and rec.iou[i2, gt_pos[ot]] >= 0.5
                    for st, ot, _, _, pid in insts
                    if st in gt_pos and ot in gt_pos
                )
                assert ok
    assert found_positive, "synthetic data should produce positive pairs"


def test_bow_blocks_l1_normalized(train_ds):
    rec = train_ds.load_segment(0)
    blocks = rec.feats[:, 70:8070].reshape(rec.feats.shape[0], 8, 1000)
    sums = np.abs(blocks).sum(axis=-1)
    nonzero = sums > 1e-6
    assert np.allclose(sums[nonzero], 1.0, atol=1e-5)


def test_pick_bucket():
    assert pick_bucket(3, [8, 16, 32]) == 8
    assert pick_bucket(8, [8, 16, 32]) == 8
    assert pick_bucket(9, [8, 16, 32]) == 16
    assert pick_bucket(99, [8, 16, 32]) == 32  # truncation case


def test_pad_record_fixed_shapes(train_ds, cfg):
    rec = train_ds.load_segment(0)
    bucket = pick_bucket(rec.num_proposals, cfg.BUCKETS.NUM_TRACKLETS)
    padded = pad_record(
        rec, bucket, cfg.PREDICT.PREDICATE_NUM, cfg.PREDICT.OBJECT_NUM,
        cfg.PREDICT.FEATURE_DIM,
    )
    p_max = bucket * (bucket - 1)
    assert padded["feats"].shape == (p_max, cfg.PREDICT.FEATURE_DIM)
    assert padded["pair_mask"].shape == (p_max,)
    assert padded["pair_mask"].sum() == rec.feats.shape[0]
    assert padded["track_mask"].sum() == rec.num_proposals
    # real rows preserved
    real = int(padded["pair_mask"].sum())
    assert np.allclose(padded["feats"][:real], rec.feats)
    assert np.allclose(padded["labels"][:real], rec.labels)


def test_test_phase_enumerates_whole_videos(cfg, synthetic_dataset):
    ds = SegmentDataset(cfg, synthetic_dataset, phase="test")
    vids = {vid for vid, _, _ in ds.index}
    assert vids == set(synthetic_dataset.get_index("test"))
    # 75-frame videos -> 4 segments each
    counts = {}
    for vid, fs, fe in ds.index:
        counts[vid] = counts.get(vid, 0) + 1
    assert all(c == 4 for c in counts.values())
