"""Per-segment relation feature store (HDF5), read AND write.

The reference only consumes these files
(/root/reference/lib/dataset/vrdataset.py:190-217 loads
<vsig>-relation.h5 with datasets trackid/pairs/feats/iou); the code that
produces them was never shipped. This module implements both directions
with the identical schema, so (a) precomputed reference artifacts load
directly and (b) our own on-device feature extractor can persist results
for the relation stage.

Feature layout of the 11070-d vector (vrdataset.py:219-242):
    [    0,    70)  subject + object classeme           (35 + 35)
    [   70,  4070)  subject iDT TrajectoryShape/HoG/HoF/MBH BoW (4 x 1000)
    [ 4070,  8070)  object  iDT TrajectoryShape/HoG/HoF/MBH BoW (4 x 1000)
    [ 8070, 11070)  relative position / size / motion   (3 x 1000)
"""

from __future__ import annotations

import os
from dataclasses import dataclass
from typing import Optional

import h5py
import numpy as np

from tspn_tpu.data.segments import get_relation_feature_file

FEATURE_DIM = 11070
CLASSEME_DIM = 35
# L1-normalized bag-of-words blocks: eight 1000-d blocks in [70, 8070)
BOW_BLOCK_STARTS = tuple(range(70, 8070, 1000))
BOW_BLOCK_SIZE = 1000


@dataclass
class SegmentFeatures:
    """Raw contents of one <vsig>-relation.h5 file.

    trackid: (N+GT,) int — proposals are -1, GT tracks carry dataset tids
    pairs:   (P, 2) int  — ordered pairs among the N+GT tracklets
    feats:   (P, FEATURE_DIM) float32 — per-pair relation feature
    iou:     (N+GT, N+GT) float32 — cubic IoU between tracklets
    """

    trackid: np.ndarray
    pairs: np.ndarray
    feats: np.ndarray
    iou: np.ndarray

    @property
    def num_tracklets(self) -> int:
        return int(self.trackid.shape[0])

    @property
    def num_proposals(self) -> int:
        return int(np.sum(self.trackid < 0))


def segment_feature_exists(vid: str, fstart: int, fend: int) -> bool:
    return os.path.exists(get_relation_feature_file(vid, fstart, fend))


def read_segment_features(vid: str, fstart: int, fend: int) -> Optional[SegmentFeatures]:
    path = get_relation_feature_file(vid, fstart, fend)
    if not os.path.exists(path):
        return None
    with h5py.File(path, "r") as f:
        return SegmentFeatures(
            trackid=np.asarray(f["trackid"][:]),
            pairs=np.asarray(f["pairs"][:]),
            feats=np.asarray(f["feats"][:], dtype=np.float32),
            iou=np.asarray(f["iou"][:], dtype=np.float32),
        )


def write_segment_features(
    vid: str, fstart: int, fend: int, features: SegmentFeatures
) -> str:
    path = get_relation_feature_file(vid, fstart, fend)
    with h5py.File(path, "w") as f:
        f.create_dataset("trackid", data=np.asarray(features.trackid, dtype=np.int64))
        f.create_dataset("pairs", data=np.asarray(features.pairs, dtype=np.int64))
        f.create_dataset("feats", data=np.asarray(features.feats, dtype=np.float32))
        f.create_dataset("iou", data=np.asarray(features.iou, dtype=np.float32))
    return path


def enumerate_ordered_pairs(num_tracklets: int) -> np.ndarray:
    """All ordered (i, j), i != j, in subject-major order.

    This is the row order the reference's precomputed features use (see
    the worked example at /root/reference/lib/modeling/predict.py:131-139):
    pair row k = (i, j) with i = k // (n-1); subject i's first row is at
    k = i*(n-1).
    """
    n = num_tracklets
    idx = np.arange(n)
    sub = np.repeat(idx, n - 1)
    obj = np.concatenate([np.delete(idx, i) for i in range(n)]) if n > 1 else np.empty(0, np.int64)
    return np.stack([sub, obj], axis=1).astype(np.int64)


def l1_normalize_bow_blocks(feats: np.ndarray) -> np.ndarray:
    """L1-normalize the eight 1000-d bag-of-words blocks in place-free form.

    Matches VRDataset._feature_preprocess (vrdataset.py:219-242): each
    1000-d motion block becomes a fraction distribution; zero rows are
    left unchanged. Vectorized over all eight blocks at once.
    """
    out = np.array(feats, dtype=np.float32, copy=True)
    bow = out[:, 70:8070].reshape(out.shape[0], 8, BOW_BLOCK_SIZE)
    denom = np.sum(np.abs(bow), axis=-1, keepdims=True)
    denom[denom == 0] = 1.0
    out[:, 70:8070] = (bow / denom).reshape(out.shape[0], 8 * BOW_BLOCK_SIZE)
    return out
