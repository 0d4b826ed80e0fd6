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

The reference hard-codes the 35-wide VidVRD classeme; `FeatureLayout`
generalizes the same structural layout to any object-vocabulary width C
(VidOR: C=80 -> 11160-d) while keeping C=35 bit-compatible with the
reference's precomputed artifacts.
"""

from __future__ import annotations

import os
from dataclasses import dataclass
from functools import lru_cache
from typing import Optional

import h5py
import numpy as np

from tspn_tpu.data.segments import get_relation_feature_file


def _round_up(x: int, mult: int) -> int:
    return ((x + mult - 1) // mult) * mult


@dataclass(frozen=True)
class FeatureLayout:
    """Geometry of the per-pair relation feature vector for a dataset
    with ``classeme_dim`` object categories (VidVRD 35, VidOR 80).

    Storage layout (h5 on disk; generalizes vrdataset.py:219-242):
        [0, 2C)              subject + object classeme
        [2C, 2C+8000)        8 x 1000 BoW blocks (sub 4, obj 4), L1-normed
        [2C+8000, 2C+11000)  relative position / size / motion (3 x 1000)

    Device layout (TPU; see tspn_tpu/ops/pairwise.py): columns reordered
    to [classeme | relative | pad-to-128 | 8 x (BoW 1000 + 24 pad)] so
    every L1-normalized block starts on a 128-lane boundary.
    Frozen/hashable so it can be a jit static argument.
    """

    classeme_dim: int = 35
    num_bow_blocks: int = 8
    bow_block_size: int = 1000
    rel_dim: int = 3000
    dev_block: int = 1024  # BoW block slot in device layout (1000 + 24 pad)

    # ---- storage layout ----
    @property
    def head(self) -> int:
        return 2 * self.classeme_dim

    @property
    def bow_start(self) -> int:
        return self.head

    @property
    def rel_start(self) -> int:
        return self.head + self.num_bow_blocks * self.bow_block_size

    @property
    def dim(self) -> int:
        return self.rel_start + self.rel_dim

    @property
    def bow_block_starts(self) -> tuple:
        return tuple(
            self.bow_start + k * self.bow_block_size
            for k in range(self.num_bow_blocks)
        )

    # ---- device layout ----
    @property
    def dev_head_dim(self) -> int:
        return self.head + self.rel_dim

    @property
    def dev_head_pad(self) -> int:
        return _round_up(self.dev_head_dim, 128)

    @property
    def device_dim(self) -> int:
        return self.dev_head_pad + self.num_bow_blocks * self.dev_block

    # ---- constructors ----
    @classmethod
    def for_objects(cls, num_objects: int) -> "FeatureLayout":
        return cls(classeme_dim=int(num_objects))

    @classmethod
    def from_dim(cls, dim: int) -> "FeatureLayout":
        """Infer the layout from a STORED feature width: dim = 2C + 11000.

        Rejects widths that are device-layout widths (e.g. 11264/11392):
        silently interpreting an already-relayouted array as storage
        layout would re-permute it at wrong offsets.
        """
        c2 = dim - (8 * 1000 + 3000)
        if c2 < 2 or c2 % 2 or dim in _device_dims():
            raise ValueError(
                f"feature width {dim} does not match a 2C+11000 storage "
                "layout" + (
                    " (it IS a device-layout width — pass the layout "
                    "explicitly)" if dim in _device_dims() else ""
                )
            )
        return cls(classeme_dim=c2 // 2)


@lru_cache(maxsize=1)
def _device_dims() -> frozenset:
    """Device-layout widths for every plausible classeme width."""
    return frozenset(
        FeatureLayout(classeme_dim=c).device_dim for c in range(1, 513)
    )


DEFAULT_LAYOUT = FeatureLayout()  # VidVRD: 35-wide classeme, 11070-d
FEATURE_DIM = DEFAULT_LAYOUT.dim
CLASSEME_DIM = DEFAULT_LAYOUT.classeme_dim
# L1-normalized bag-of-words blocks: eight 1000-d blocks in [70, 8070)
BOW_BLOCK_STARTS = DEFAULT_LAYOUT.bow_block_starts
BOW_BLOCK_SIZE = DEFAULT_LAYOUT.bow_block_size


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


def l1_normalize_bow_blocks(
    feats: np.ndarray, layout: Optional[FeatureLayout] = None
) -> np.ndarray:
    """L1-normalize the eight 1000-d bag-of-words blocks in place-free form.

    Matches VRDataset._feature_preprocess (vrdataset.py:219-242): each
    1000-d motion block becomes a fraction distribution; zero rows are
    left unchanged. Vectorized over all eight blocks at once. The layout
    is inferred from the feature width when not given.
    """
    if layout is None:
        layout = FeatureLayout.from_dim(feats.shape[-1])
    lo, hi = layout.bow_start, layout.rel_start
    out = np.array(feats, dtype=np.float32, copy=True)
    bow = out[:, lo:hi].reshape(
        out.shape[0], layout.num_bow_blocks, layout.bow_block_size
    )
    denom = np.sum(np.abs(bow), axis=-1, keepdims=True)
    denom[denom == 0] = 1.0
    out[:, lo:hi] = (bow / denom).reshape(out.shape[0], hi - lo)
    return out
