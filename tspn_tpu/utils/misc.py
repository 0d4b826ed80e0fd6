"""Small numeric helpers (counterpart of lib/utils/miscellaneous.py)."""

from __future__ import annotations

import numpy as np


class AverageMeter:
    def __init__(self):
        self.reset()

    def reset(self):
        self.val = 0.0
        self.avg = 0.0
        self.sum = 0.0
        self.count = 0

    def update(self, val, n=1):
        self.val = val
        self.sum += val
        self.count += n
        self.avg = self.sum / self.count


def normalize(x: np.ndarray, axis: int = -1, order: int = 2) -> np.ndarray:
    """Lp-normalize, zero-safe (miscellaneous.py:33-36 semantics)."""
    norm = np.atleast_1d(np.linalg.norm(x, order, axis))
    norm[norm == 0] = 1
    return x / np.expand_dims(norm, axis)


def to_onehot(x, num_classes: int) -> np.ndarray:
    return np.eye(num_classes, dtype="float32")[x]


def to_multi_onehot(x, num_classes: int) -> np.ndarray:
    out = np.zeros(num_classes, dtype="float32")
    out[x] = 1
    return out
