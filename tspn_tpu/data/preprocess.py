"""Consolidated preprocessing: per-segment artifacts -> one HDF5.

The reference's --preprocess entry point is broken (base.py:29 calls
vrdataset.preprocess_data which only exists under lib/deprecated/); its
intent (base.py:36-39 + lib/deprecated/preprocess.py:217-227) was a
single preprocessed_{split}_dataset.hdf5 holding feats / pairs /
pred_label for the whole split. This implements that contract on top of
SegmentDataset: one pass over all segments, rows concatenated, with a
segment index table so samples remain traceable.
"""

from __future__ import annotations

import os
from typing import Optional

import h5py
import numpy as np

from tspn_tpu.data.segments import get_output_dir
from tspn_tpu.data.vrdataset import SegmentDataset


def consolidate_split(
    cfg, dataset, phase: str, output_path: Optional[str] = None
) -> str:
    """Write preprocessed_{phase}_dataset.hdf5; returns the path.

    Datasets: feats (R, D), pairs (R, 2), pred_label (R, P),
    segment_id (R,) int index into the string table `segments`.
    """
    seg_dataset = SegmentDataset(cfg, dataset, phase=phase)
    assert len(seg_dataset) > 0, f"no segments with features for phase {phase}"
    if output_path is None:
        root = os.path.join(get_output_dir(), "preprocessed_data")
        os.makedirs(root, exist_ok=True)
        output_path = os.path.join(root, f"preprocessed_{phase}_dataset.hdf5")

    feats, pairs, labels, seg_ids, signatures = [], [], [], [], []
    for i in range(len(seg_dataset)):
        rec = seg_dataset.load_segment(i)
        vid, fstart, fend = rec.index
        signatures.append(f"{vid}-{fstart:04d}-{fend:04d}")
        feats.append(rec.feats)
        pairs.append(rec.pairs)
        labels.append(rec.labels)
        seg_ids.append(np.full(rec.feats.shape[0], i, np.int64))

    with h5py.File(output_path, "w") as f:
        f.create_dataset("feats", data=np.concatenate(feats).astype(np.float32))
        f.create_dataset("pairs", data=np.concatenate(pairs).astype(np.int64))
        f.create_dataset("pred_label", data=np.concatenate(labels).astype(np.float32))
        f.create_dataset("segment_id", data=np.concatenate(seg_ids))
        f.create_dataset(
            "segments",
            data=np.asarray(signatures, dtype=h5py.string_dtype()),
        )
    return output_path


def load_consolidated(path: str) -> dict:
    with h5py.File(path, "r") as f:
        return {
            "feats": np.asarray(f["feats"]),
            "pairs": np.asarray(f["pairs"]),
            "pred_label": np.asarray(f["pred_label"]),
            "segment_id": np.asarray(f["segment_id"]),
            "segments": [s.decode() if isinstance(s, bytes) else s
                         for s in f["segments"]],
        }
