import jax.numpy as jnp
import numpy as np

from tspn_tpu.ops.nms import box_iou, nms


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
