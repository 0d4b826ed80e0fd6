"""1-D temporal anchors for duration proposals.

Functional rebuild of the reference's AnchorGenerator
(/root/reference/lib/modeling/relpn/anchor_generator.py:31-104): base
anchors are centered intervals [-s/2, +s/2] per size, tiled at every
`stride` along the time axis including the endpoint (shifts
0, stride, ..., <= T). Here it is a pure function of static shapes — no
buffers, no modules — so it folds into the jitted program as a constant.
"""

from __future__ import annotations

from functools import lru_cache
from typing import Sequence, Tuple

import numpy as np


@lru_cache(maxsize=None)
def _grid_anchors_cached(time_width: int, sizes: Tuple[float, ...], stride: float):
    base = np.array([[-0.5 * s, 0.5 * s] for s in sizes], dtype=np.float32)  # (A, 2)
    shifts = np.arange(0.0, time_width + 1, stride, dtype=np.float32)  # (K,)
    anchors = shifts[:, None, None] + base[None, :, :]  # (K, A, 2)
    return anchors.reshape(-1, 2)


def grid_anchors(
    time_width: int, sizes: Sequence[float], stride: float
) -> np.ndarray:
    """All anchors over a time axis of `time_width`: ((K*A), 2) float32.

    Row-major over (shift, size) exactly as anchor_generator.py:48-59
    flattens (shifts + base).reshape(-1, 2).
    """
    return _grid_anchors_cached(int(time_width), tuple(float(s) for s in sizes), float(stride))


def num_anchors(time_width: int, sizes: Sequence[float], stride: float) -> int:
    return grid_anchors(time_width, sizes, stride).shape[0]
