"""Transforms, I3D backbone, comm helpers, misc utils, visualizer."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tspn_tpu.data.transforms import (
    ColorJitter,
    Compose,
    Normalize,
    RandomHorizontalFlip,
    Resize,
    build_transforms,
)
from tspn_tpu.models.i3d import I3ResNet
from tspn_tpu.utils import comm
from tspn_tpu.utils.misc import AverageMeter, normalize, to_multi_onehot, to_onehot


def test_resize_min_max_logic():
    r = Resize(min_size=100, max_size=150)
    # short side would scale 50->100 but long 200->400 > 150 -> cap
    assert r.target_size(50, 200) == (38, 150)
    assert r.target_size(100, 120) == (100, 120)
    img = np.zeros((50, 200, 3), np.float32)
    boxes = np.array([[0, 0, 200, 50]], np.float32)
    out, b = r(img, boxes)
    assert out.shape[:2] == (38, 150)
    assert b[0, 2] == pytest.approx(150, abs=1)


def test_flip_boxes():
    f = RandomHorizontalFlip(prob=1.0)
    img = np.zeros((10, 100, 3))
    boxes = np.array([[10, 0, 30, 10]], np.float32)
    _, b = f(img, boxes)
    assert b[0].tolist() == [70, 0, 90, 10]


def test_default_pipeline_has_no_flip():
    pipeline = build_transforms(is_train=True, brightness=0.1)
    assert not any(isinstance(t, RandomHorizontalFlip) for t in pipeline.transforms)


def test_normalize_bgr255():
    n = Normalize(mean=[1.0, 2.0, 3.0], std=[1.0, 1.0, 1.0], to_bgr255=True)
    img = np.ones((2, 2, 3), np.float32) * np.array([0.1, 0.2, 0.3])
    out, _ = n(img)
    # channel reversal then *255 then mean subtraction
    assert out[0, 0, 0] == pytest.approx(0.3 * 255 - 1.0)


def test_i3d_shapes():
    model = I3ResNet(depth=26)
    clip = jnp.asarray(np.random.RandomState(0).rand(8, 64, 64, 3), jnp.float32)
    params = model.init(jax.random.PRNGKey(0), clip)
    out = model.apply(params, clip)
    # temporal stride tied to spatial stride: res3+res4 halve T twice
    assert out.shape == (2, 4, 4, 1024)
    assert np.isfinite(np.asarray(out)).all()


def test_inflate_conv_kernel_preserves_2d_output():
    """Center inflation: conv3d(tiled clip) at interior frames equals
    conv2d(frame) — the invariant the reference's inflate_resnet.py
    driver checks (2D vs inflated-3D comparison)."""
    from tspn_tpu.models.i3d import inflate_conv_kernel

    rng = np.random.RandomState(0)
    img = rng.rand(1, 16, 16, 3).astype(np.float32)
    k2d = rng.rand(3, 3, 3, 8).astype(np.float32)
    out2d = jax.lax.conv_general_dilated(
        img, k2d, (1, 1), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    clip = np.tile(img[:, None], (1, 5, 1, 1, 1))  # (1, T, H, W, 3)
    k3d = inflate_conv_kernel(k2d, 3)
    out3d = jax.lax.conv_general_dilated(
        clip, k3d, (1, 1, 1), "SAME",
        dimension_numbers=("NTHWC", "THWIO", "NTHWC"),
    )
    # interior frames (away from temporal zero-padding) match exactly
    assert np.allclose(np.asarray(out3d)[0, 2], np.asarray(out2d)[0], atol=1e-5)


def test_comm_single_process():
    assert comm.get_world_size() == 1
    assert comm.is_main_process()
    comm.synchronize()  # no-op
    assert comm.all_gather({"a": 1}) == [{"a": 1}]
    out = comm.reduce_dict({"x": jnp.asarray(2.0)})
    assert out == {"x": 2.0}


def test_misc_helpers():
    m = AverageMeter()
    m.update(1.0)
    m.update(3.0)
    assert m.avg == 2.0
    x = np.array([[3.0, 4.0], [0.0, 0.0]])
    n = normalize(x)
    assert np.allclose(n[0], [0.6, 0.8])
    assert np.allclose(n[1], 0.0)  # zero-safe
    assert to_onehot(2, 4).tolist() == [0, 0, 1, 0]
    assert to_multi_onehot([0, 3], 4).tolist() == [1, 0, 0, 1]


def test_visualizer_draws_frames(tmp_path):
    from visualize import visualize_video

    vid = "VIZ01"
    src = tmp_path / "frames" / vid
    os.makedirs(src)
    from PIL import Image

    for f in range(1, 6):
        Image.fromarray(np.zeros((60, 80, 3), np.uint8)).save(src / f"{f:05d}.jpg")
    relations = [{
        "triplet": ["dog", "chase", "cat"],
        "score": 0.9,
        "duration": [0, 5],
        "sub_traj": [[5, 5, 30, 30]] * 5,
        "obj_traj": [[40, 20, 70, 50]] * 5,
    }]
    n = visualize_video(vid, relations, str(tmp_path / "frames"), str(tmp_path / "out"))
    assert n == 5
    out0 = np.asarray(Image.open(tmp_path / "out" / vid / "00001.jpg"))
    assert out0.sum() > 0  # something was drawn on the black frame


def test_merge_relations_maximal_spans():
    from tools.inspect_anno import merge_relations

    rels = [
        {"subject_tid": 0, "object_tid": 1, "predicate": "chase",
         "begin_fid": 0, "end_fid": 30},
        {"subject_tid": 0, "object_tid": 1, "predicate": "chase",
         "begin_fid": 15, "end_fid": 45},
        {"subject_tid": 0, "object_tid": 1, "predicate": "chase",
         "begin_fid": 60, "end_fid": 90},
        {"subject_tid": 1, "object_tid": 0, "predicate": "watch",
         "begin_fid": 0, "end_fid": 30},
    ]
    merged = merge_relations(rels)
    chase = sorted(
        m["duration"] for m in merged if m["predicate"] == "chase"
    )
    assert chase == [(0, 45), (60, 90)]
    assert len([m for m in merged if m["predicate"] == "watch"]) == 1


def test_inspect_anno(synthetic_dataset):
    from tools.inspect_anno import inspect

    vid = synthetic_dataset.get_index("train")[0]
    info = inspect(synthetic_dataset, vid)
    assert info["frame_count"] == 75
    assert len(info["objects"]) == 3
    assert all(o["frames"] == 75 for o in info["objects"])
    assert info["merged_relations"]
