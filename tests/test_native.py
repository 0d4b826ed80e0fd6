"""Native C++ kernels vs the NumPy reference implementations."""

import numpy as np
import pytest

from tspn_tpu import native
from tspn_tpu.data.trajectory import cubic_iou as np_cubic_iou
from tspn_tpu.evaluation.common import viou as np_viou


def _trajs(n, t, rng):
    xy = rng.rand(n, t, 2) * 100
    wh = rng.rand(n, t, 2) * 50 + 5
    return np.concatenate([xy, xy + wh], axis=-1)


def test_native_available():
    # the build step is part of the repo contract (tools/build_native.sh)
    assert native.HAVE_NATIVE


def test_cubic_iou_matches_numpy(rng):
    a = _trajs(6, 12, rng)
    b = _trajs(4, 12, rng)
    got = native.cubic_iou(a, b)
    want = np_cubic_iou(a, b)
    assert np.allclose(got, want, atol=1e-10)


def test_viou_matches_numpy(rng):
    for _ in range(10):
        d1 = (int(rng.randint(0, 10)), 0)
        d1 = (d1[0], d1[0] + int(rng.randint(5, 25)))
        d2 = (int(rng.randint(0, 10)), 0)
        d2 = (d2[0], d2[0] + int(rng.randint(5, 25)))
        t1 = _trajs(1, d1[1] - d1[0], rng)[0]
        t2 = _trajs(1, d2[1] - d2[0], rng)[0]
        assert native.viou(t1, d1, t2, d2) == pytest.approx(
            np_viou(t1, d1, t2, d2), abs=1e-12
        )


def test_viou_matrix_matches_pairwise(rng):
    trajs_a, dur_a, trajs_b, dur_b = [], [], [], []
    for _ in range(5):
        s = int(rng.randint(0, 10))
        e = s + int(rng.randint(5, 20))
        trajs_a.append(_trajs(1, e - s, rng)[0])
        dur_a.append((s, e))
    for _ in range(4):
        s = int(rng.randint(0, 10))
        e = s + int(rng.randint(5, 20))
        trajs_b.append(_trajs(1, e - s, rng)[0])
        dur_b.append((s, e))
    got = native.viou_matrix(trajs_a, dur_a, trajs_b, dur_b)
    for i in range(5):
        for j in range(4):
            assert got[i, j] == pytest.approx(
                np_viou(trajs_a[i], dur_a[i], trajs_b[j], dur_b[j]), abs=1e-12
            )


def test_empty_sets():
    assert native.viou_matrix([], [], [], []).shape == (0, 0)
