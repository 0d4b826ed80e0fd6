import jax.numpy as jnp
import numpy as np

from tspn_tpu.ops.nms import box_iou, nms, nms_sequential


def _oracle_nms(boxes, scores, thr):
    order = np.argsort(-scores)
    kept = []
    for i in order:
        ok = True
        for j in kept:
            lt = np.maximum(boxes[i, :2], boxes[j, :2])
            rb = np.minimum(boxes[i, 2:], boxes[j, 2:])
            wh = np.clip(rb - lt, 0, None)
            inter = wh[0] * wh[1]
            area = lambda b: (b[2] - b[0]) * (b[3] - b[1])  # noqa: E731
            if inter / (area(boxes[i]) + area(boxes[j]) - inter) > thr:
                ok = False
                break
        if ok:
            kept.append(i)
    return kept


def test_box_iou_basics():
    a = jnp.asarray([[0.0, 0, 10, 10]])
    b = jnp.asarray([[0.0, 0, 10, 10], [5, 0, 15, 10], [20, 20, 30, 30]])
    m = np.asarray(box_iou(a, b))
    assert m[0, 0] == 1.0
    assert abs(m[0, 1] - 50 / 150) < 1e-6
    assert m[0, 2] == 0.0


def test_nms_matches_oracle(rng):
    for _ in range(8):
        n = 20
        xy = rng.rand(n, 2) * 60
        wh = rng.rand(n, 2) * 40 + 5
        boxes = np.concatenate([xy, xy + wh], 1).astype(np.float32)
        scores = rng.rand(n).astype(np.float32)
        idx, keep = nms(jnp.asarray(boxes), jnp.asarray(scores), 0.5, n)
        got = [int(i) for i, k in zip(np.asarray(idx), np.asarray(keep)) if k]
        assert got == _oracle_nms(boxes, scores, 0.5)


def test_nms_valid_mask_and_topk(rng):
    boxes = jnp.asarray(
        [[0.0, 0, 10, 10], [100, 100, 110, 110], [200, 200, 210, 210]]
    )
    scores = jnp.asarray([0.9, 0.8, 0.7])
    idx, keep = nms(boxes, scores, 0.5, 2, valid=jnp.asarray([False, True, True]))
    got = [int(i) for i, k in zip(np.asarray(idx), np.asarray(keep)) if k]
    assert got == [1, 2]


def _assert_same(boxes, scores, thr, top_k, valid=None, block=16):
    a_idx, a_keep = nms_sequential(
        jnp.asarray(boxes), jnp.asarray(scores), thr, top_k, valid=valid
    )
    b_idx, b_keep = nms(
        jnp.asarray(boxes), jnp.asarray(scores), thr, top_k,
        valid=valid, block=block,
    )
    np.testing.assert_array_equal(np.asarray(a_keep), np.asarray(b_keep))
    # padded slots (keep False) index 0 in both; compare kept entries
    np.testing.assert_array_equal(
        np.asarray(a_idx) * np.asarray(a_keep),
        np.asarray(b_idx) * np.asarray(b_keep),
    )


def test_blocked_nms_equals_sequential(rng):
    """The blocked formulation must reproduce the sequential greedy
    output slot for slot across dense, clustered, and chained inputs."""
    for trial in range(6):
        n = 60
        xy = rng.rand(n, 2) * 80
        wh = rng.rand(n, 2) * 30 + 4
        boxes = np.concatenate([xy, xy + wh], 1).astype(np.float32)
        scores = rng.rand(n).astype(np.float32)
        for top_k in (1, 7, 32, n):
            for block in (1, 4, 16, 64):
                _assert_same(boxes, scores, 0.5, top_k, block=block)

    # pathological: every box identical -> exactly one keep
    boxes = np.tile(np.array([[5.0, 5, 20, 20]], np.float32), (40, 1))
    scores = rng.rand(40).astype(np.float32)
    _assert_same(boxes, scores, 0.5, 10)
    # chain of partial overlaps (suppression cascades matter)
    xs = np.arange(30, dtype=np.float32) * 4
    boxes = np.stack([xs, np.zeros(30, np.float32), xs + 10,
                      np.full(30, 10, np.float32)], 1)
    scores = np.linspace(1.0, 0.1, 30).astype(np.float32)
    _assert_same(boxes, scores, 0.3, 30, block=8)
    # valid mask + degenerate zero-area boxes
    boxes = np.concatenate(
        [boxes, np.array([[3.0, 3, 3, 3]], np.float32)], 0
    )
    scores = np.concatenate([scores, np.array([0.95], np.float32)])
    valid = jnp.asarray(np.arange(31) % 3 != 0)
    _assert_same(boxes, scores, 0.3, 12, valid=valid)
    # tie scores resolve identically (lowest index first)
    scores = np.full(31, 0.5, np.float32)
    _assert_same(boxes, scores, 0.3, 12, block=4)
