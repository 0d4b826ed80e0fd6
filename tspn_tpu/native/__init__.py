"""Native (C++) host-side kernels with transparent NumPy fallback.

Build once with `python setup.py build_ext --inplace` (repo root) or
`bash tools/build_native.sh`; the wrappers fall back to vectorized NumPy
when the extension is absent so nothing hard-depends on the toolchain.
"""

from __future__ import annotations

from typing import Sequence, Tuple

import numpy as np

try:
    from tspn_tpu.native import _viou_native  # type: ignore

    HAVE_NATIVE = True
except ImportError:
    _viou_native = None
    HAVE_NATIVE = False


def cubic_iou(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """(n, t, 4) x (m, t, 4) -> (n, m) volumetric IoU (+1 convention)."""
    a = np.ascontiguousarray(a, np.float64)
    b = np.ascontiguousarray(b, np.float64)
    if HAVE_NATIVE:
        raw = _viou_native.cubic_iou(a, b)
        return np.frombuffer(bytes(raw), np.float64).reshape(a.shape[0], b.shape[0])
    from tspn_tpu.data.trajectory import cubic_iou as np_cubic_iou

    return np_cubic_iou(a, b)


def viou(traj_1, duration_1, traj_2, duration_2) -> float:
    """Volumetric IoU of two trajectories with [start, end) durations."""
    if HAVE_NATIVE:
        a = np.ascontiguousarray(traj_1, np.float64).reshape(-1, 4)
        b = np.ascontiguousarray(traj_2, np.float64).reshape(-1, 4)
        return _viou_native.viou(
            a, int(duration_1[0]), int(duration_1[1]),
            b, int(duration_2[0]), int(duration_2[1]),
        )
    from tspn_tpu.evaluation.common import viou as np_viou

    return np_viou(traj_1, duration_1, traj_2, duration_2)


def _pack(trajs: Sequence, durations: Sequence[Tuple[int, int]]):
    boxes = (
        np.concatenate([np.asarray(t, np.float64).reshape(-1, 4) for t in trajs])
        if trajs
        else np.zeros((0, 4))
    )
    offsets = np.zeros(len(trajs) + 1, np.int64)
    for i, t in enumerate(trajs):
        offsets[i + 1] = offsets[i] + np.asarray(t).reshape(-1, 4).shape[0]
    dur = np.asarray(durations, np.int64).reshape(-1, 2)
    return np.ascontiguousarray(boxes), offsets, np.ascontiguousarray(dur)


def viou_matrix(
    trajs_a: Sequence, durations_a: Sequence, trajs_b: Sequence, durations_b: Sequence
) -> np.ndarray:
    """Dense (len_a, len_b) vIoU matrix between ragged trajectory sets."""
    if not len(trajs_a) or not len(trajs_b):
        return np.zeros((len(trajs_a), len(trajs_b)))
    if HAVE_NATIVE:
        ab, ao, ad = _pack(trajs_a, durations_a)
        bb, bo, bd = _pack(trajs_b, durations_b)
        raw = _viou_native.viou_matrix(ab, ao, ad, bb, bo, bd)
        return np.frombuffer(bytes(raw), np.float64).reshape(
            len(trajs_a), len(trajs_b)
        )
    from tspn_tpu.evaluation.common import viou as np_viou

    out = np.zeros((len(trajs_a), len(trajs_b)))
    for i, (ta, da) in enumerate(zip(trajs_a, durations_a)):
        for j, (tb, db) in enumerate(zip(trajs_b, durations_b)):
            out[i, j] = np_viou(ta, da, tb, db)
    return out
