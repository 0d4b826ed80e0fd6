"""Detector input policy (detectron2 ResizeShortestEdge semantics +
aspect-ratio bucketing) and the in-training evaluation hook.

The reference inherits the 800/1333 min/max-size resize and aspect
grouping from detectron2 (/root/reference/lib/dataset/transforms/
transforms.py:31-63, lib/dataset/samplers/grouped_batch_sampler.py:10-115)
and periodic evaluation from DefaultTrainer (detectron/train.py:44-128);
round 1 shipped only a fixed 640^2 letterbox.
"""

import numpy as np
import pytest

from tspn_tpu.detection.rcnn import DetectionConfig
from tspn_tpu.detection.train import (
    DetectorTrainConfig,
    group_by_orientation,
    input_bucket_shape,
    make_batch,
    resize_shortest_edge,
    shortest_edge_scale,
    train_detector,
)

SE_CFG = DetectorTrainConfig(
    input_policy="shortest_edge", min_size=64, max_size=106, pad_multiple=32,
    max_gt_boxes=8,
)


def test_shortest_edge_scale_semantics(rng):
    # plain case: short side lands exactly on min_size
    s = shortest_edge_scale(480, 640, 800, 1333)
    assert 480 * s == pytest.approx(800)
    assert 640 * s <= 1333
    # capped case: a very wide image is limited by max_size instead
    s = shortest_edge_scale(400, 1600, 800, 1333)
    assert 1600 * s == pytest.approx(1333)
    assert 400 * s < 800
    # invariants over random shapes
    for _ in range(50):
        h, w = rng.randint(50, 2000, size=2)
        s = shortest_edge_scale(h, w, 800, 1333)
        assert min(h, w) * s <= 800 + 1e-6
        assert max(h, w) * s <= 1333 + 1e-6
        assert (min(h, w) * s == pytest.approx(800)) or (
            max(h, w) * s == pytest.approx(1333)
        )


def test_resize_boxes_follow_image_content(rng):
    """Scale consistency: a GT box must still bound its pixels after the
    resize (the VERDICT item's boxes/losses-scale-consistent check)."""
    img = np.zeros((90, 150, 3), np.float32)
    img[30:60, 40:100, 0] = 1.0
    boxes = np.asarray([[40, 30, 100, 60]], np.float32)
    out, nboxes, scale = resize_shortest_edge(img, boxes, 64, 106)
    # aspect preserved within rounding
    assert out.shape[0] == int(round(90 * scale))
    assert out.shape[1] == int(round(150 * scale))
    ys, xs = np.nonzero(out[..., 0] > 0.5)
    x0, y0, x1, y1 = nboxes[0]
    assert abs(xs.min() - x0) <= 2 and abs(ys.min() - y0) <= 2
    assert abs(xs.max() + 1 - x1) <= 2 and abs(ys.max() + 1 - y1) <= 2


def test_input_bucket_shapes():
    # letterbox: one square program
    lb = DetectorTrainConfig(input_policy="letterbox", image_size=640)
    assert input_bucket_shape(480, 640, lb) == (640, 640)
    # shortest_edge: exactly two orientation buckets, lane-padded
    assert input_bucket_shape(480, 640, SE_CFG) == (64, 128)
    assert input_bucket_shape(640, 480, SE_CFG) == (128, 64)
    # every resized image fits its bucket
    rng = np.random.RandomState(3)
    for _ in range(50):
        h, w = rng.randint(40, 500, size=2)
        s = shortest_edge_scale(h, w, SE_CFG.min_size, SE_CFG.max_size)
        bh, bw = input_bucket_shape(h, w, SE_CFG)
        assert int(round(h * s)) <= bh and int(round(w * s)) <= bw


def _record(h, w, image_id=0):
    img = np.zeros((h, w, 3), np.float32)
    img[h // 4 : h // 2, w // 4 : w // 2, 0] = 1.0
    return {
        "image": img, "height": h, "width": w, "image_id": image_id,
        "annotations": [{
            "bbox": [w / 4, h / 4, w / 2, h / 2], "category_id": 0,
            "bbox_mode": "XYXY_ABS",
        }],
    }


def test_make_batch_shortest_edge_and_grouping():
    records = [_record(90, 150, 0), _record(150, 90, 1), _record(100, 160, 2)]
    groups = group_by_orientation(records, SE_CFG)
    assert sorted(len(g) for g in groups) == [1, 2]
    land = [records[i] for g in groups for i in g
            if records[g[0]]["width"] >= records[g[0]]["height"]]
    batch = make_batch([records[0], records[2]], SE_CFG)
    assert batch["image"].shape == (2, 64, 128, 3)
    assert len(land) == 2
    # boxes scaled into the bucket's coordinate frame
    assert batch["gt_boxes"][0].max() <= 128
    # mixed orientations in one batch must be refused
    with pytest.raises(AssertionError, match="orientation"):
        make_batch([records[0], records[1]], SE_CFG)
    # letterbox groups everything together
    lb = DetectorTrainConfig(input_policy="letterbox")
    assert [len(g) for g in group_by_orientation(records, lb)] == [3]


def test_train_detector_eval_hook_tracks_best():
    """The in-training evaluator logs held-out mAP and returns best-mAP
    params (detectron2 DefaultTrainer-hook parity)."""
    tiny = DetectionConfig(
        num_classes=2, depth=26, anchor_sizes=(32, 64),
        anchor_ratios=(1.0,), pre_nms_topk_train=100, post_nms_topk_train=32,
        pre_nms_topk_test=100, post_nms_topk_test=32, roi_batch_size=16,
        max_detections=8,
    )
    img = np.zeros((96, 96, 3), np.float32)
    img[20:60, 10:50, 0] = 1.0
    rec = {
        "image": img, "height": 96, "width": 96, "image_id": 0,
        "annotations": [{
            "bbox": [10, 20, 50, 60], "category_id": 0, "bbox_mode": "XYXY_ABS",
        }],
    }
    cfg = DetectorTrainConfig(
        ims_per_batch=2, base_lr=1e-3, max_iter=6, warmup_iters=2,
        image_size=96, max_gt_boxes=4, log_every=3, eval_every=3,
        keep_best=True,
    )
    model, params = train_detector(
        [rec], tiny, cfg, eval_records=[rec],
    )
    assert params is not None
    # the hook must not break plain training either
    cfg_off = cfg._replace(eval_every=0, max_iter=2)
    model, params = train_detector([rec], tiny, cfg_off)
    assert params is not None
