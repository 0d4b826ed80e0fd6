import jax.numpy as jnp
import numpy as np
import pytest

from tspn_tpu.ops.temporal import decode_spans, encode_spans, interval_iou, nms_1d


def test_interval_iou_basic():
    a = jnp.array([[0.0, 10.0], [0.0, 10.0], [20.0, 30.0]])
    b = jnp.array([[0.0, 10.0], [5.0, 15.0]])
    m = np.asarray(interval_iou(a, b))
    assert m[0, 0] == pytest.approx(1.0)
    assert m[0, 1] == pytest.approx(5 / 15)
    assert m[2, 0] == pytest.approx(0.0)


def test_encode_decode_roundtrip(rng):
    anchors = jnp.asarray(
        np.stack([rng.uniform(0, 50, 20), rng.uniform(60, 100, 20)], axis=1)
    )
    gt = jnp.asarray(
        np.stack([rng.uniform(0, 40, 20), rng.uniform(50, 120, 20)], axis=1)
    )
    deltas = encode_spans(gt, anchors)
    rec = decode_spans(deltas, anchors)
    assert np.allclose(np.asarray(rec), np.asarray(gt), atol=1e-2)


def _greedy_nms_oracle(spans, scores, thr):
    order = np.argsort(-scores)
    kept = []
    for i in order:
        s, e = spans[i]
        ok = True
        for j in kept:
            s2, e2 = spans[j]
            inter = max(0.0, min(e, e2) - max(s, s2))
            union = (e - s) + (e2 - s2) - inter
            if union > 0 and inter / union > thr:
                ok = False
                break
        if ok:
            kept.append(i)
    return kept


def test_nms_1d_matches_oracle(rng):
    for trial in range(10):
        k = 24
        starts = rng.uniform(0, 100, k)
        widths = rng.uniform(5, 40, k)
        spans = np.stack([starts, starts + widths], axis=1).astype(np.float32)
        scores = rng.uniform(0, 1, k).astype(np.float32)
        idx, keep = nms_1d(jnp.asarray(spans), jnp.asarray(scores), 0.5, k)
        got = [int(i) for i, m in zip(np.asarray(idx), np.asarray(keep)) if m]
        assert got == _greedy_nms_oracle(spans, scores, 0.5)


def test_nms_1d_top_k_truncation():
    spans = jnp.asarray(
        np.stack([np.arange(10) * 100.0, np.arange(10) * 100.0 + 50], axis=1)
    )
    scores = jnp.asarray(np.linspace(1.0, 0.1, 10))
    idx, keep = nms_1d(spans, scores, 0.5, 4)
    assert idx.shape == (4,)
    assert bool(np.all(np.asarray(keep)))
    assert list(np.asarray(idx)) == [0, 1, 2, 3]


def test_nms_1d_respects_valid_mask():
    spans = jnp.asarray([[0.0, 10.0], [100.0, 110.0]])
    scores = jnp.asarray([0.9, 0.8])
    valid = jnp.asarray([False, True])
    idx, keep = nms_1d(spans, scores, 0.5, 2, valid=valid)
    kept = [int(i) for i, m in zip(np.asarray(idx), np.asarray(keep)) if m]
    assert kept == [1]
