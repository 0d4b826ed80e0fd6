"""Worker for test_detection_quality: train on synthetic scenes, print
held-out mAP as one JSON line.

Runs as a SUBPROCESS of the test (like tests/distributed_worker.py): a
fresh single-purpose process keeps the heavy train-graph compile
isolated from suite-wide jit-cache state and compiles with a clean
thread pool on the 1-core host.
"""

import json
import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ.setdefault("TSPN_NO_COMPILE_CACHE", "1")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import optax

    from tests.test_detection_quality import CFG, MAX_GT, _dataset
    from tspn_tpu.detection.eval import evaluate_detections
    from tspn_tpu.detection.rcnn import FasterRCNN

    rng = np.random.RandomState(0)
    train = _dataset(rng, 12)
    test = _dataset(rng, 6)

    model = FasterRCNN(cfg=CFG)
    # jitted init: the eager train-graph init runs op-by-op (~20x cost)
    params = jax.jit(model.init)(
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

    bsz = 2  # vmap width 2: halves the compiled train graph
    order = np.arange(len(train[0]))
    srng = np.random.RandomState(1)
    loss = None
    for it in range(240):
        if it % (len(order) // bsz) == 0:
            srng.shuffle(order)
        sel = order[(it * bsz) % len(order): (it * bsz) % len(order) + bsz]
        if len(sel) < bsz:
            sel = order[:bsz]
        params, opt_state, loss = step(
            params, opt_state,
            jnp.asarray(train[0][sel]), jnp.asarray(train[1][sel]),
            jnp.asarray(train[2][sel]), jnp.asarray(train[3][sel]),
        )
    final_loss = float(loss)

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
            k: np.asarray(det[k])
            for k in ("boxes", "scores", "classes", "mask")
        }
    mean_ap, per_class = evaluate_detections(records, detections)
    print(json.dumps({
        "mean_ap": float(mean_ap),
        "per_class": {str(k): float(v) for k, v in per_class.items()},
        "final_loss": final_loss,
    }))


if __name__ == "__main__":
    main()
