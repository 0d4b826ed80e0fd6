"""Held-out detector quality floor (VERDICT r4 stretch item 8).

The overfit test (test_detection.py) proves the Faster R-CNN learns ONE
scene; nothing guarded generalization. This trains on 12 synthetic
scenes and pins a held-out mAP floor via detection/eval.py — the same
kind of quality regression the relation path gets from its e2e tests.
Scene family: axis-aligned colored rectangles (class = color) with
background noise; COCO-checkpoint-level accuracy parity remains
environment-blocked (no weights/dataset here, DESIGN.md §6), but
within-family generalization is now a tested invariant rather than an
assumption. Ref: /root/reference/detectron/trainer.py:23-40.

The train/eval workload runs in a SUBPROCESS
(tests/detector_quality_worker.py, like the distributed-launch test):
a fresh single-purpose process keeps the heavy train-graph compile
isolated from suite-wide jit-cache state. Two wall-clock levers matter
on the 1-core host: jax.jit(model.init) (eager init of the train graph
runs op-by-op at ~20x the cost) and vmap width 2 (halves the compiled
graph). ~80 s in-suite on an idle host.
"""

import json
import os
import subprocess
import sys

import numpy as np

from tspn_tpu.detection.rcnn import DetectionConfig

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


def test_detector_held_out_map_floor():
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    out = subprocess.run(
        [sys.executable, os.path.join(os.path.dirname(__file__),
                                      "detector_quality_worker.py")],
        capture_output=True, text=True, timeout=1200, env=env,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    result = json.loads(out.stdout.strip().splitlines()[-1])
    assert np.isfinite(result["final_loss"])
    # floor: measured 0.823 at this budget/seed (~3 min standalone);
    # 0.40 leaves seed-variance headroom — a generalization regression,
    # not noise, is what should trip it
    assert result["mean_ap"] >= 0.40, result
