"""FeatureLayout: the classeme-width-parameterized feature geometry.

The reference hard-codes the 35-wide VidVRD classeme
(/root/reference/lib/dataset/vrdataset.py:219-242 documents the 11070-d
layout); FeatureLayout generalizes it to any object-vocabulary width
(VidOR: 80 -> 11160-d) — these tests pin the VidVRD default to the
reference constants and check the VidOR-width device path end to end.
"""

import numpy as np
import pytest

from tspn_tpu.data.feature_store import (
    BOW_BLOCK_STARTS,
    CLASSEME_DIM,
    DEFAULT_LAYOUT,
    FEATURE_DIM,
    FeatureLayout,
    l1_normalize_bow_blocks,
)
from tspn_tpu.ops.pairwise import (
    DEVICE_DIM,
    normalize_classify,
    normalize_classify_device,
    normalize_classify_pallas,
    to_device_layout,
    weights_to_device_layout,
)


def test_default_layout_matches_reference_constants():
    lo = DEFAULT_LAYOUT
    assert lo.classeme_dim == CLASSEME_DIM == 35
    assert lo.dim == FEATURE_DIM == 11070
    assert lo.bow_block_starts == BOW_BLOCK_STARTS == tuple(range(70, 8070, 1000))
    assert lo.rel_start == 8070
    assert lo.dev_head_pad == 3072
    assert lo.device_dim == DEVICE_DIM == 11264 == 88 * 128


def test_vidor_layout_geometry():
    lo = FeatureLayout.for_objects(80)
    assert lo.head == 160
    assert lo.bow_block_starts == tuple(range(160, 8160, 1000))
    assert lo.rel_start == 8160
    assert lo.dim == 11160
    # device layout stays lane-aligned for any classeme width
    assert lo.dev_head_pad % 128 == 0
    assert lo.dev_head_pad >= lo.dev_head_dim == 3160
    assert lo.device_dim == lo.dev_head_pad + 8 * 1024 == 11392
    assert lo.device_dim % 128 == 0


def test_from_dim_round_trip():
    for c in (2, 6, 35, 80, 200):
        assert FeatureLayout.from_dim(FeatureLayout.for_objects(c).dim).classeme_dim == c
    with pytest.raises(ValueError):
        FeatureLayout.from_dim(11071)  # odd 2C
    with pytest.raises(ValueError):
        FeatureLayout.from_dim(64)


def test_l1_normalize_infers_width():
    rng = np.random.RandomState(0)
    lo = FeatureLayout.for_objects(80)
    feats = rng.rand(4, lo.dim).astype(np.float32)
    out = l1_normalize_bow_blocks(feats)
    # head + tail untouched
    np.testing.assert_array_equal(out[:, : lo.head], feats[:, : lo.head])
    np.testing.assert_array_equal(out[:, lo.rel_start :], feats[:, lo.rel_start :])
    blocks = out[:, lo.bow_start : lo.rel_start].reshape(4, 8, 1000)
    np.testing.assert_allclose(np.abs(blocks).sum(-1), 1.0, rtol=1e-5)


@pytest.fixture
def vidor_inputs():
    rng = np.random.RandomState(1)
    lo = FeatureLayout.for_objects(80)
    p, r = 5, 7
    feats = (rng.rand(p, lo.dim) * (rng.rand(p, lo.dim) < 0.05)).astype(np.float32)
    feats[:, : lo.head] = rng.randn(p, lo.head)
    feats[:, lo.rel_start :] = rng.randn(p, lo.rel_dim) * 0.1
    w = (rng.randn(lo.dim, r) * 0.01).astype(np.float32)
    b = rng.randn(r).astype(np.float32)
    return lo, feats, w, b


def test_vidor_device_layout_round_trip(vidor_inputs):
    lo, feats, w, b = vidor_inputs
    fd = to_device_layout(feats)  # layout inferred from width
    assert fd.shape[-1] == lo.device_dim
    wd = weights_to_device_layout(w)
    assert wd.shape[0] == lo.device_dim
    # reference result: host-normalize then matmul on the raw layout
    ref = l1_normalize_bow_blocks(feats) @ w + b
    out_raw = np.asarray(normalize_classify(feats, w, b))
    out_dev = np.asarray(normalize_classify_device(fd, wd, b, layout=lo))
    np.testing.assert_allclose(out_raw, ref, rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(out_dev, ref, rtol=1e-4, atol=1e-5)


def test_vidor_pallas_kernel_parity(vidor_inputs):
    lo, feats, w, b = vidor_inputs
    fd = to_device_layout(feats)
    wd = weights_to_device_layout(w)
    ref = l1_normalize_bow_blocks(feats) @ w + b
    out = np.asarray(normalize_classify_pallas(fd, wd, b, layout=lo))
    np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-5)


def test_vidor_fused_model_forward():
    """RelationPredictor(fused) at VidOR width builds an 11392-wide kernel
    and matches the host-normalized reference."""
    import jax

    from tspn_tpu.models.tspn import RelationPredictor

    rng = np.random.RandomState(2)
    lo = FeatureLayout.for_objects(80)
    feats = rng.rand(3, lo.dim).astype(np.float32)
    model = RelationPredictor(num_predicates=9, fused=True, num_objects=80)
    fd = to_device_layout(feats)
    params = model.init(jax.random.PRNGKey(0), fd)["params"]
    assert params["kernel"].shape == (lo.device_dim, 9)
    out = np.asarray(model.apply({"params": params}, fd))
    w_raw = np.zeros((lo.dim, 9), np.float32)
    # invert the device permutation to compare against the raw-layout path
    from tspn_tpu.ops.pairwise import _permutation

    perm = _permutation(lo)
    valid = perm >= 0
    w_raw[perm[valid]] = np.asarray(params["kernel"])[valid]
    ref = l1_normalize_bow_blocks(feats) @ w_raw + np.asarray(params["bias"])
    np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-5)
