import jax.numpy as jnp
import numpy as np
import pytest

from tspn_tpu.data.feature_store import (
    FEATURE_DIM,
    enumerate_ordered_pairs,
    read_segment_features,
)
from tspn_tpu.data.segments import set_output_dir
from tspn_tpu.data.trajectory import Trajectory
from tspn_tpu.features.extraction import (
    assemble_pair_features,
    extract_segment_artifacts,
    pair_relative_bow,
    tracklet_motion_bow,
)


def _boxes(n, t, rng):
    xy = rng.rand(n, 1, 2) * 200 + rng.rand(n, t, 2) * 4
    wh = rng.rand(n, 1, 2) * 60 + 20
    return np.concatenate([xy, xy + wh], axis=-1).astype(np.float32)


def test_motion_bow_shape_and_l1(rng):
    boxes = jnp.asarray(_boxes(4, 30, rng))
    bow = np.asarray(tracklet_motion_bow(boxes, (480.0, 360.0)))
    assert bow.shape == (4, 4000)
    sums = np.abs(bow).reshape(4, 4, 1000).sum(-1)
    assert np.allclose(sums, 1.0, atol=1e-4)  # each block L1-normalized
    assert (bow >= 0).all()


def test_relative_bow_discriminates_geometry(rng):
    t = 30
    base = _boxes(1, t, rng)[0]
    above = base - np.array([0, 100, 0, 100], np.float32)  # clearly above
    below = base + np.array([0, 100, 0, 100], np.float32)
    s = jnp.asarray(np.stack([base, base]))
    o = jnp.asarray(np.stack([above, below]))
    rel = np.asarray(pair_relative_bow(s, o))
    assert rel.shape == (2, 3000)
    # above vs below must produce different position histograms
    assert np.abs(rel[0, :1000] - rel[1, :1000]).sum() > 0.1


def test_assemble_full_layout(rng):
    n, t = 5, 30
    boxes = jnp.asarray(_boxes(n, t, rng))
    classemes = jnp.asarray(rng.rand(n, 35).astype(np.float32))
    pairs = jnp.asarray(enumerate_ordered_pairs(n))
    feats = np.asarray(
        assemble_pair_features(boxes, classemes, pairs, image_wh=(480.0, 360.0))
    )
    assert feats.shape == (n * (n - 1), FEATURE_DIM)
    # classeme slots carry the sub/obj classemes
    assert np.allclose(feats[0, :35], np.asarray(classemes)[0])
    assert np.allclose(feats[0, 35:70], np.asarray(classemes)[1])
    # symmetric pair rows differ only in role ordering
    row_01 = feats[0]           # pair (0, 1)
    row_10 = feats[n - 1]       # pair (1, 0)
    assert np.allclose(row_01[:35], row_10[35:70])
    assert np.allclose(row_01[70:4070], row_10[4070:8070])


def test_extract_segment_artifacts_roundtrip(tmp_path, rng):
    set_output_dir(str(tmp_path))
    t = 30
    props = [
        Trajectory(0, t, _boxes(1, t, rng)[0], 0.9, 3,
                   rng.rand(35).tolist(), gt_trackid=-1)
        for _ in range(3)
    ]
    gts = [
        Trajectory(0, t, _boxes(1, t, rng)[0], 1.0, 3,
                   rng.rand(35).tolist(), gt_trackid=k)
        for k in range(2)
    ]
    seg = extract_segment_artifacts("vidZ", 0, 30, props, gts, (480.0, 360.0))
    assert seg is not None
    loaded = read_segment_features("vidZ", 0, 30)
    assert loaded.feats.shape == (5 * 4, FEATURE_DIM)
    assert loaded.iou.shape == (5, 5)
    assert loaded.trackid.tolist() == [-1, -1, -1, 0, 1]
    assert np.allclose(np.diag(loaded.iou), 1.0, atol=1e-5)
    # consumable by the relation data path: BoW blocks already L1
    from tspn_tpu.data.feature_store import l1_normalize_bow_blocks

    normalized = l1_normalize_bow_blocks(loaded.feats)
    assert np.allclose(normalized, loaded.feats, atol=1e-4)


def test_too_few_tracklets_returns_none(tmp_path, rng):
    set_output_dir(str(tmp_path))
    props = [Trajectory(0, 30, _boxes(1, 30, rng)[0], 0.9, 0, [0.0] * 35)]
    assert extract_segment_artifacts("vidY", 0, 30, props) is None
