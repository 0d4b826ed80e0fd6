"""Held-out detector quality floor (VERDICT r4 stretch item 8).

The overfit test (test_detection.py) proves the Faster R-CNN learns ONE
scene; nothing guarded generalization. This trains on N synthetic scenes
and pins a held-out mAP floor via detection/eval.py — the same kind of
quality regression the relation path gets from its e2e tests. Scene
family: axis-aligned colored rectangles (class = color) with background
noise; COCO-checkpoint-level accuracy parity remains environment-blocked
(no weights/dataset here, DESIGN.md §6), but within-family generalization
is now a tested invariant rather than an assumption.
Ref: /root/reference/detectron/trainer.py:23-40 (recipe + eval hook).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tspn_tpu.detection.eval import evaluate_detections
from tspn_tpu.detection.rcnn import DetectionConfig, FasterRCNN

CFG = DetectionConfig(
    num_classes=3,
    depth=26,
    anchor_sizes=(32, 64),
    anchor_ratios=(0.5, 1.0, 2.0),
    pre_nms_topk_train=200,
    post_nms_topk_train=64,
    pre_nms_topk_test=200,
    post_nms_topk_test=64,
    roi_batch_size=32,
    max_detections=16,
)
MAX_GT = 4
SIZE = 128


def _scene(rng):
    """One image: 1-3 colored rectangles (class == color channel) over
    low-amplitude noise."""
    img = rng.uniform(0, 0.15, (SIZE, SIZE, 3)).astype(np.float32)
    n = rng.randint(1, 4)
    boxes = np.zeros((MAX_GT, 4), np.float32)
    classes = np.zeros((MAX_GT,), np.int32)
    mask = np.zeros((MAX_GT,), np.float32)
    for k in range(n):
        w = rng.randint(28, 56)
        h = rng.randint(28, 56)
        x0 = rng.randint(0, SIZE - w)
        y0 = rng.randint(0, SIZE - h)
        c = rng.randint(0, 3)
        img[y0:y0 + h, x0:x0 + w, c] = rng.uniform(0.8, 1.0)
        boxes[k] = [x0, y0, x0 + w, y0 + h]
        classes[k] = c
        mask[k] = 1.0
    return img, boxes, classes, mask


def _dataset(rng, n):
    scenes = [_scene(rng) for _ in range(n)]
    return tuple(
        np.stack([s[i] for s in scenes]) for i in range(4)
    )


@pytest.mark.slow
def test_detector_held_out_map_floor():
    import optax

    rng = np.random.RandomState(0)
    train = _dataset(rng, 12)
    test = _dataset(rng, 6)

    model = FasterRCNN(cfg=CFG)
    params = model.init(
        jax.random.PRNGKey(0), jnp.asarray(train[0][0]),
        jnp.asarray(train[1][0]), jnp.asarray(train[2][0]),
        jnp.asarray(train[3][0]),
    )["params"]
    opt = optax.adam(1e-3)
    opt_state = opt.init(params)

    @jax.jit
    def step(params, opt_state, imgs, boxes, classes, masks):
        def loss_fn(p):
            losses = jax.vmap(
                lambda i, b, c, m: model.apply({"params": p}, i, b, c, m)
            )(imgs, boxes, classes, masks)
            return sum(jnp.mean(v) for v in losses.values())

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = opt.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    bsz = 4
    order = np.arange(len(train[0]))
    srng = np.random.RandomState(1)
    for it in range(120):
        if it % (len(order) // bsz) == 0:
            srng.shuffle(order)
        sel = order[(it * bsz) % len(order): (it * bsz) % len(order) + bsz]
        if len(sel) < bsz:
            sel = order[:bsz]
        _, _, loss = (params, opt_state, None)
        params, opt_state, loss = step(
            params, opt_state,
            jnp.asarray(train[0][sel]), jnp.asarray(train[1][sel]),
            jnp.asarray(train[2][sel]), jnp.asarray(train[3][sel]),
        )
    assert np.isfinite(float(loss))

    detect = jax.jit(
        lambda p, im: model.apply({"params": p}, im, method=FasterRCNN.detect)
    )
    records, detections = [], {}
    for i in range(len(test[0])):
        anns = [
            {"bbox": test[1][i][k].tolist(), "category_id": int(test[2][i][k])}
            for k in range(MAX_GT) if test[3][i][k] > 0
        ]
        records.append({"image_id": i, "annotations": anns})
        det = detect(params, jnp.asarray(test[0][i]))
        detections[i] = {
            "boxes": np.asarray(det["boxes"]),
            "scores": np.asarray(det["scores"]),
            "classes": np.asarray(det["classes"]),
            "mask": np.asarray(det["mask"]),
        }
    mean_ap, per_class = evaluate_detections(records, detections)
    # floor: measured 3 seeds at this budget gave mAP well above this;
    # a generalization regression (not noise) is what should trip it
    assert mean_ap >= 0.30, (mean_ap, per_class)
