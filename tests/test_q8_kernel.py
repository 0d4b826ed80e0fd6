"""int8 feature path for the fused pair-scoring kernel.

Quantization design (ops/pairwise.py): BoW blocks quantize per-block
max-scaled — the scale cancels exactly in L1 normalization; head columns
quantize per-row with one stored f32 scale that factors out of the
linear map. These tests pin the exactness arguments and the Pallas/XLA
parity.
"""

import numpy as np
import pytest

from tspn_tpu.data.feature_store import FeatureLayout, l1_normalize_bow_blocks
from tspn_tpu.ops.pairwise import (
    DEFAULT_LAYOUT,
    normalize_classify,
    normalize_classify_q8,
    normalize_classify_q8_pallas,
    to_device_layout,
    to_device_layout_q8,
    weights_to_device_layout,
)


@pytest.fixture
def inputs(rng):
    lo = DEFAULT_LAYOUT
    p, r = 7, 5
    feats = np.zeros((p, lo.dim), np.float32)
    feats[:, : lo.head] = rng.randn(p, lo.head) * 3
    # sparse small-count BoW (the real features are histogram counts)
    feats[:, lo.bow_start : lo.rel_start] = (
        rng.randint(0, 6, size=(p, lo.rel_start - lo.bow_start))
        * (rng.rand(p, lo.rel_start - lo.bow_start) < 0.05)
    )
    feats[:, lo.rel_start :] = rng.randn(p, lo.rel_dim) * 0.2
    w = (rng.randn(lo.dim, r) * 0.01).astype(np.float32)
    b = rng.randn(r).astype(np.float32)
    return lo, feats, w, b


def test_quantizer_shapes_and_range(inputs):
    lo, feats, w, b = inputs
    q, s = to_device_layout_q8(feats)
    assert q.shape == (feats.shape[0], lo.device_dim) and q.dtype == np.int8
    assert s.shape == (feats.shape[0],) and (s > 0).all()
    assert np.abs(q).max() <= 127
    # head reconstruction error bounded by half a quantization step
    dev = to_device_layout(feats)
    hp = lo.dev_head_pad
    np.testing.assert_allclose(
        q[:, :hp].astype(np.float32) * s[:, None], dev[:, :hp],
        atol=(s.max() / 2) + 1e-6,
    )


def test_bow_scale_cancellation_binary_exact(rng):
    """Binary BoW blocks quantize to exactly 127*x, so the normalized
    ratios — and hence the BoW logit contribution — are EXACT."""
    lo = DEFAULT_LAYOUT
    p, r = 5, 4
    feats = np.zeros((p, lo.dim), np.float32)
    feats[:, lo.bow_start : lo.rel_start] = (
        rng.rand(p, lo.rel_start - lo.bow_start) < 0.01
    )
    w = (rng.randn(lo.dim, r) * 0.01).astype(np.float32)
    b = np.zeros(r, np.float32)
    q, s = to_device_layout_q8(feats)
    w_dev = weights_to_device_layout(w)
    ref = l1_normalize_bow_blocks(feats) @ w + b
    out = np.asarray(normalize_classify_q8(q, s, w_dev, b))
    np.testing.assert_allclose(out, ref, rtol=1e-5, atol=1e-6)


def test_q8_close_to_f32_generic(inputs):
    """Generic data: quantization error on the logits stays small
    relative to the logit scale (head: per-row 1/254 relative steps;
    BoW: ratio rounding)."""
    lo, feats, w, b = inputs
    q, s = to_device_layout_q8(feats)
    w_dev = weights_to_device_layout(w)
    ref = np.asarray(normalize_classify(feats, w, b))
    out = np.asarray(normalize_classify_q8(q, s, w_dev, b))
    scale = max(np.abs(ref).max(), 1e-3)
    assert np.abs(out - ref).max() / scale < 0.02, (
        np.abs(out - ref).max(), scale
    )


def test_q8_pallas_matches_xla(inputs):
    lo, feats, w, b = inputs
    q, s = to_device_layout_q8(feats)
    w_dev = weights_to_device_layout(w)
    ref = np.asarray(normalize_classify_q8(q, s, w_dev, b))
    out = np.asarray(normalize_classify_q8_pallas(q, s, w_dev, b))
    # kernel computes the matmul in bf16 (int8 values are exact in bf16;
    # the accumulation is f32) — tolerance covers the bf16 WEIGHTS
    np.testing.assert_allclose(out, ref, rtol=2e-2, atol=2e-2)


def test_q8i8_weight_quantization_roundtrip(rng):
    from tspn_tpu.ops.pairwise import quantize_weights_percol

    w = (rng.randn(100, 7) * 0.01).astype(np.float32)
    qw, sw = quantize_weights_percol(w)
    assert qw.dtype == np.int8 and sw.shape == (7,)
    np.testing.assert_allclose(
        qw.astype(np.float32) * sw[None, :], w, atol=(sw.max() / 2) + 1e-9
    )


def test_q8i8_close_to_f32(inputs):
    from tspn_tpu.ops.pairwise import (
        normalize_classify_q8i8,
        quantize_weights_percol,
    )

    lo, feats, w, b = inputs
    q, s = to_device_layout_q8(feats)
    qw, sw = quantize_weights_percol(weights_to_device_layout(w))
    ref = np.asarray(normalize_classify(feats, w, b))
    out = np.asarray(normalize_classify_q8i8(q, s, qw, sw, b))
    scale = max(np.abs(ref).max(), 1e-3)
    assert np.abs(out - ref).max() / scale < 0.03, (
        np.abs(out - ref).max(), scale
    )


def test_q8i8_pallas_matches_xla(inputs):
    from tspn_tpu.ops.pairwise import (
        normalize_classify_q8i8,
        normalize_classify_q8i8_pallas,
        quantize_weights_percol,
    )

    lo, feats, w, b = inputs
    q, s = to_device_layout_q8(feats)
    qw, sw = quantize_weights_percol(weights_to_device_layout(w))
    ref = np.asarray(normalize_classify_q8i8(q, s, qw, sw, b))
    out = np.asarray(normalize_classify_q8i8_pallas(q, s, qw, sw, b))
    # integer dots are exact; scales are f32 in both — tight tolerance
    np.testing.assert_allclose(out, ref, rtol=1e-5, atol=1e-5)


def test_q8s_precomputed_scales_match_q8i8(inputs):
    """The scales-precomputed kernel must equal the in-kernel-reduction
    int8 path exactly (same integer dots, same f32 scale algebra)."""
    from tspn_tpu.ops.pairwise import (
        normalize_classify_q8i8,
        normalize_classify_q8s_pallas,
        precompute_q8_scales,
        quantize_weights_percol,
    )

    lo, feats, w, b = inputs
    q, s = to_device_layout_q8(feats)
    scales = precompute_q8_scales(q, s)
    assert scales.shape == (feats.shape[0], 16)
    qw, sw = quantize_weights_percol(weights_to_device_layout(w))
    ref = np.asarray(normalize_classify_q8i8(q, s, qw, sw, b))
    out = np.asarray(normalize_classify_q8s_pallas(q, scales, qw, sw, b))
    np.testing.assert_allclose(out, ref, rtol=1e-5, atol=1e-5)


def test_q8_vidor_layout(rng):
    lo = FeatureLayout.for_objects(80)
    p, r = 4, 3
    feats = rng.rand(p, lo.dim).astype(np.float32)
    q, s = to_device_layout_q8(feats)
    assert q.shape[-1] == lo.device_dim
    w = (rng.randn(lo.dim, r) * 0.01).astype(np.float32)
    b = np.zeros(r, np.float32)
    ref = np.asarray(normalize_classify_q8(q, s, weights_to_device_layout(w), b, layout=lo))
    out = np.asarray(normalize_classify_q8_pallas(
        q, s, weights_to_device_layout(w), b, layout=lo
    ))
    np.testing.assert_allclose(out, ref, rtol=2e-2, atol=2e-2)


def test_q8t_transposed_matches_q8s(inputs):
    """The transposed kernel (predicates on the MXU sublane axis, pairs
    on lanes) must reproduce the q8s kernel: same integer dots, same f32
    scale-accumulate order."""
    from tspn_tpu.ops.pairwise import (
        normalize_classify_q8s_pallas,
        normalize_classify_q8t_pallas,
        precompute_q8_scales,
        quantize_weights_percol,
    )

    lo, feats, w, b = inputs
    q, s = to_device_layout_q8(feats)
    scales = precompute_q8_scales(q, s)
    qw, sw = quantize_weights_percol(weights_to_device_layout(w))
    ref = np.asarray(normalize_classify_q8s_pallas(q, scales, qw, sw, b))
    out = np.asarray(normalize_classify_q8t_pallas(
        np.ascontiguousarray(q.T), np.ascontiguousarray(scales.T),
        np.ascontiguousarray(qw.T), sw, b,
    ))
    assert out.shape == (w.shape[1], feats.shape[0])
    np.testing.assert_allclose(out.T, ref, rtol=1e-6, atol=1e-6)


def test_q8t_vidor_layout(rng):
    """VidOR geometry (C=80, 3328-wide head) through the transposed
    kernel: the head is one non-1024 slice — exercises the static-slice
    path at a different alignment."""
    from tspn_tpu.ops.pairwise import (
        normalize_classify_q8i8,
        normalize_classify_q8t_pallas,
        precompute_q8_scales,
        quantize_weights_percol,
    )

    lo = FeatureLayout.for_objects(80)
    p, r = 5, 6
    feats = rng.rand(p, lo.dim).astype(np.float32)
    q, s = to_device_layout_q8(feats, lo)
    scales = precompute_q8_scales(q, s, lo)
    qw, sw = quantize_weights_percol(
        weights_to_device_layout((rng.randn(lo.dim, r) * 0.01).astype(np.float32), lo)
    )
    b = rng.randn(r).astype(np.float32)
    ref = np.asarray(normalize_classify_q8i8(q, s, qw, sw, b, layout=lo))
    out = np.asarray(normalize_classify_q8t_pallas(
        np.ascontiguousarray(q.T), np.ascontiguousarray(scales.T),
        np.ascontiguousarray(qw.T), sw, b, layout=lo,
    ))
    np.testing.assert_allclose(out.T, ref, rtol=1e-5, atol=1e-5)


# ---------------------------------------------------------------------------
# Factored feature path (round 3): per-tracklet + per-pair representation
# ---------------------------------------------------------------------------

@pytest.fixture
def factored_inputs(rng):
    """Structurally consistent pair features: rows expanded from
    per-tracklet descriptors + per-pair relative blocks (the layout's
    actual redundancy, vrdataset.py:219-242)."""
    from tspn_tpu.data.feature_store import enumerate_ordered_pairs

    lo = DEFAULT_LAYOUT
    n, r = 5, 7
    cls = (rng.randn(n, lo.classeme_dim) * 2).astype(np.float32)
    bow = (
        rng.randint(0, 9, size=(n, 4 * lo.bow_block_size))
        * (rng.rand(n, 4 * lo.bow_block_size) < 0.08)
    ).astype(np.float32)
    pairs = enumerate_ordered_pairs(n)
    p = pairs.shape[0]
    rel = (rng.randn(p, lo.rel_dim) * 0.3).astype(np.float32)
    feats = np.zeros((p, lo.dim), np.float32)
    sub, obj = pairs[:, 0], pairs[:, 1]
    feats[:, : lo.classeme_dim] = cls[sub]
    feats[:, lo.classeme_dim : 2 * lo.classeme_dim] = cls[obj]
    half = 4 * lo.bow_block_size
    feats[:, lo.bow_start : lo.bow_start + half] = bow[sub]
    feats[:, lo.bow_start + half : lo.rel_start] = bow[obj]
    feats[:, lo.rel_start :] = rel
    w = (rng.randn(lo.dim, r) * 0.01).astype(np.float32)
    b = rng.randn(r).astype(np.float32)
    return lo, cls, bow, rel, pairs, feats, w, b


def test_factored_close_to_f32(factored_inputs):
    """Exact-factorization check: the factored q8 path must match the
    expanded f32 classifier within the q8 quantization tolerance."""
    import jax.numpy as jnp

    from tspn_tpu.ops.pairwise import (
        factor_rel_features_q8,
        factor_tracklet_features_q8,
        factored_classify_q8,
        split_weights_factored,
    )

    lo, cls, bow, rel, pairs, feats, w, b = factored_inputs
    trk_q, trk_s = factor_tracklet_features_q8(cls, bow, lo)
    rel_q, rel_s = factor_rel_features_q8(rel, lo)
    wq = {k: jnp.asarray(v) for k, v in split_weights_factored(w, lo).items()}
    out = np.asarray(factored_classify_q8(
        jnp.asarray(trk_q), jnp.asarray(trk_s),
        jnp.asarray(rel_q), jnp.asarray(rel_s),
        jnp.asarray(pairs.astype(np.int32)), wq, jnp.asarray(b), layout=lo,
    ))
    ref = np.asarray(normalize_classify(feats, w, b))
    scale = max(np.abs(ref).max(), 1e-3)
    assert out.shape == ref.shape
    assert np.abs(out - ref).max() / scale < 0.03, (
        np.abs(out - ref).max(), scale
    )


def test_factor_expanded_rows_roundtrip(factored_inputs):
    """Factoring EXPANDED rows recovers exactly the quantization of the
    original per-tracklet descriptors."""
    from tspn_tpu.ops.pairwise import (
        factor_expanded_rows_q8,
        factor_rel_features_q8,
        factor_tracklet_features_q8,
    )

    lo, cls, bow, rel, pairs, feats, w, b = factored_inputs
    tq1, ts1 = factor_tracklet_features_q8(cls, bow, lo)
    rq1, rs1 = factor_rel_features_q8(rel, lo)
    tq2, ts2, rq2, rs2 = factor_expanded_rows_q8(
        feats, pairs, num_tracklets=cls.shape[0], layout=lo
    )
    np.testing.assert_array_equal(tq1, tq2)
    np.testing.assert_allclose(ts1, ts2, rtol=1e-6)
    np.testing.assert_array_equal(rq1, rq2)
    np.testing.assert_allclose(rs1, rs2, rtol=1e-6)


def test_fused_factored_matches_unfused(factored_inputs):
    """The single-pass fused kernel (A-table add in-kernel) must match
    the two-kernel factored path on identical quantized inputs. n=5 ->
    P_seg=20, which exercises the tile-illegal row pad branch (pp=32)."""
    import jax.numpy as jnp

    from tspn_tpu.ops.pairwise import (
        factor_rel_features_q8,
        factor_tracklet_features_q8,
        factored_classify_q8_bucketed,
        factored_classify_q8_bucketed_fused,
        split_weights_factored,
    )

    lo, cls, bow, rel, pairs, feats, w, b = factored_inputs
    n = cls.shape[0]
    trk_q, trk_s = factor_tracklet_features_q8(cls, bow, lo)
    rel_q, rel_s = factor_rel_features_q8(rel, lo)
    wq = {k: jnp.asarray(v) for k, v in split_weights_factored(w, lo).items()}
    args = (
        jnp.asarray(trk_q), jnp.asarray(trk_s),
        jnp.asarray(rel_q), jnp.asarray(rel_s),
        wq, jnp.asarray(b),
    )
    ref = np.asarray(factored_classify_q8_bucketed(*args, num_tracklets=n))
    out = np.asarray(
        factored_classify_q8_bucketed_fused(*args, num_tracklets=n)
    )
    assert out.shape == ref.shape
    np.testing.assert_allclose(out, ref, atol=1e-4)


def test_fused_factored_batched_multi_segment(rng):
    """Fused kernel across a multi-segment batch with per-segment
    tracklet descriptors: each segment must pick up ITS OWN A-table
    block (grid dim 0), with explicit (non-canonical) pair indices."""
    import jax.numpy as jnp

    from tspn_tpu.ops.pairwise import (
        factored_classify_q8_batched,
        factored_classify_q8_fused,
        pack_rel_sidecar,
        split_weights_factored,
        rel_geom,
        tracklet_geom,
    )

    lo = DEFAULT_LAYOUT
    bsz, n, p, r = 3, 4, 64, 7  # p=64: tile-legal, no pad branch
    gt, gr = tracklet_geom(lo), rel_geom(lo)
    trk_q = rng.randint(-127, 128, size=(bsz, n, gt.device_dim)).astype(np.int8)
    trk_s = (rng.rand(bsz, n, 16) * 0.01 + 1e-4).astype(np.float32)
    rel_q = rng.randint(-127, 128, size=(bsz, p, gr.device_dim)).astype(np.int8)
    rel_s = (rng.rand(bsz, p, 16) * 0.01 + 1e-4).astype(np.float32)
    pairs = rng.randint(0, n, size=(bsz, p, 2)).astype(np.int32)
    w = (rng.randn(lo.dim, r) * 0.01).astype(np.float32)
    b = rng.randn(r).astype(np.float32)
    wq = {k: jnp.asarray(v) for k, v in split_weights_factored(w, lo).items()}

    ref = np.asarray(factored_classify_q8_batched(
        jnp.asarray(trk_q), jnp.asarray(trk_s),
        jnp.asarray(rel_q), jnp.asarray(rel_s),
        jnp.asarray(pairs), wq, jnp.asarray(b), layout=lo,
    ))
    sidecar = pack_rel_sidecar(jnp.asarray(rel_s), jnp.asarray(pairs))
    out = np.asarray(factored_classify_q8_fused(
        jnp.asarray(trk_q), jnp.asarray(trk_s),
        jnp.asarray(rel_q), sidecar, wq, jnp.asarray(b), layout=lo,
    ))
    assert out.shape == ref.shape
    np.testing.assert_allclose(out, ref, atol=1e-4)


def test_factored_vidor_layout(rng):
    """Factored path at VidOR geometry (C=80)."""
    import jax.numpy as jnp

    from tspn_tpu.data.feature_store import enumerate_ordered_pairs
    from tspn_tpu.ops.pairwise import (
        factor_rel_features_q8,
        factor_tracklet_features_q8,
        factored_classify_q8,
        split_weights_factored,
    )

    lo = FeatureLayout.for_objects(80)
    n, r = 4, 6
    cls = rng.randn(n, 80).astype(np.float32)
    bow = (rng.rand(n, 4000) < 0.02).astype(np.float32) * 3
    pairs = enumerate_ordered_pairs(n)
    rel = rng.randn(pairs.shape[0], 3000).astype(np.float32)
    w = (rng.randn(lo.dim, r) * 0.01).astype(np.float32)
    b = np.zeros(r, np.float32)

    feats = np.zeros((pairs.shape[0], lo.dim), np.float32)
    feats[:, :80] = cls[pairs[:, 0]]
    feats[:, 80:160] = cls[pairs[:, 1]]
    feats[:, lo.bow_start : lo.bow_start + 4000] = bow[pairs[:, 0]]
    feats[:, lo.bow_start + 4000 : lo.rel_start] = bow[pairs[:, 1]]
    feats[:, lo.rel_start :] = rel

    trk_q, trk_s = factor_tracklet_features_q8(cls, bow, lo)
    rel_q, rel_s = factor_rel_features_q8(rel, lo)
    wq = {k: jnp.asarray(v) for k, v in split_weights_factored(w, lo).items()}
    out = np.asarray(factored_classify_q8(
        jnp.asarray(trk_q), jnp.asarray(trk_s),
        jnp.asarray(rel_q), jnp.asarray(rel_s),
        jnp.asarray(pairs.astype(np.int32)), wq, jnp.asarray(b), layout=lo,
    ))
    ref = np.asarray(normalize_classify(feats, w, b))
    scale = max(np.abs(ref).max(), 1e-3)
    assert np.abs(out - ref).max() / scale < 0.03
