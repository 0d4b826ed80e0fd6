"""Fused normalize+classify: XLA and Pallas paths vs the host reference."""

import jax.numpy as jnp
import numpy as np
import pytest

from tspn_tpu.data.feature_store import FEATURE_DIM, l1_normalize_bow_blocks
from tspn_tpu.ops.pairwise import (
    DEVICE_DIM,
    normalize_classify,
    normalize_classify_pallas,
    to_device_layout,
    weights_to_device_layout,
)


@pytest.fixture()
def problem(rng):
    p, r = 20, 12
    feats = (rng.rand(p, FEATURE_DIM) * (rng.rand(p, FEATURE_DIM) < 0.05)).astype(
        np.float32
    )
    feats[:, :70] = rng.randn(p, 70)
    feats[:, 8070:] = rng.randn(p, 3000) * 0.1
    feats[3, 70:1070] = 0.0  # a zero BoW block -> zero-safe path
    w = rng.randn(FEATURE_DIM, r).astype(np.float32) * 0.01
    b = rng.randn(r).astype(np.float32)
    expected = l1_normalize_bow_blocks(feats) @ w + b
    return feats, w, b, expected


def test_xla_path_matches_host(problem):
    feats, w, b, expected = problem
    got = np.asarray(
        normalize_classify(jnp.asarray(feats), jnp.asarray(w), jnp.asarray(b))
    )
    assert np.allclose(got, expected, atol=2e-4), np.abs(got - expected).max()


def test_device_layout_roundtrip_preserves_product(problem):
    """Permuted layout with permuted weights gives the same logits."""
    feats, w, b, expected = problem
    fd = to_device_layout(l1_normalize_bow_blocks(feats))
    wd = weights_to_device_layout(w)
    assert fd.shape[-1] == DEVICE_DIM
    got = fd @ wd + b
    assert np.allclose(got, expected, atol=2e-4)


def test_pallas_path_matches_host(problem):
    feats, w, b, expected = problem
    fd = jnp.asarray(to_device_layout(feats))
    wd = jnp.asarray(weights_to_device_layout(w))
    got = np.asarray(normalize_classify_pallas(fd, wd, jnp.asarray(b)))
    assert np.allclose(got, expected, atol=2e-4), np.abs(got - expected).max()


def test_pallas_handles_non_tile_multiple_rows(rng):
    feats = rng.rand(7, FEATURE_DIM).astype(np.float32)
    w = rng.randn(FEATURE_DIM, 5).astype(np.float32) * 0.01
    b = np.zeros(5, np.float32)
    got = np.asarray(
        normalize_classify_pallas(
            jnp.asarray(to_device_layout(feats)),
            jnp.asarray(weights_to_device_layout(w)),
            jnp.asarray(b),
            row_tile=64,
        )
    )
    expected = l1_normalize_bow_blocks(feats) @ w
    assert got.shape == (7, 5)
    assert np.allclose(got, expected, atol=2e-4)


def test_fused_custom_vjp_matches_autodiff(rng):
    """Gradients of the Pallas-forward custom-VJP path equal jax.grad of
    the XLA device-layout formulation."""
    import jax

    from tspn_tpu.ops.pairwise import (
        normalize_classify_device,
        normalize_classify_fused,
        to_device_layout,
        weights_to_device_layout,
    )

    p, r = 12, 6
    feats = (rng.rand(p, FEATURE_DIM) * (rng.rand(p, FEATURE_DIM) < 0.1)).astype(
        np.float32
    )
    feats[:, :70] = rng.randn(p, 70)
    feats[2, 70:1070] = 0.0  # zero block: subgradient path
    x = jnp.asarray(to_device_layout(feats))
    w = jnp.asarray(weights_to_device_layout(
        (rng.randn(FEATURE_DIM, r) * 0.01).astype(np.float32)))
    b = jnp.asarray(rng.randn(r).astype(np.float32))
    g_out = jnp.asarray(rng.randn(p, r).astype(np.float32))

    def loss_ref(x, w, b):
        return jnp.sum(normalize_classify_device(x, w, b) * g_out)

    def loss_fused(x, w, b):
        return jnp.sum(normalize_classify_fused(x, w, b) * g_out)

    ref_grads = jax.grad(loss_ref, argnums=(0, 1, 2))(x, w, b)
    fused_grads = jax.grad(loss_fused, argnums=(0, 1, 2))(x, w, b)
    for a, c in zip(ref_grads, fused_grads):
        assert np.allclose(np.asarray(a), np.asarray(c), atol=2e-3), (
            np.abs(np.asarray(a) - np.asarray(c)).max()
        )
    # forward values agree too
    assert np.allclose(
        np.asarray(normalize_classify_fused(x, w, b)),
        np.asarray(normalize_classify_device(x, w, b)),
        atol=2e-3,
    )


def test_nofeatgrad_vjp_matches_param_grads(rng):
    """The training VJP (dW/db only) must match the differentiable XLA
    path's parameter gradients exactly; its feature cotangent is zero by
    contract (pair features are pipeline inputs)."""
    import jax
    import jax.numpy as jnp

    from tspn_tpu.ops.pairwise import (
        DEFAULT_LAYOUT,
        normalize_classify_device,
        normalize_classify_fused_nofeatgrad,
        to_device_layout,
    )

    lo = DEFAULT_LAYOUT
    p, r = 6, 5
    feats = rng.randn(p, lo.dim).astype(np.float32)
    x = jnp.asarray(to_device_layout(feats))
    w = jnp.asarray((rng.randn(lo.device_dim, r) * 0.01).astype(np.float32))
    b = jnp.asarray(rng.randn(r).astype(np.float32))
    g = jnp.asarray(rng.randn(p, r).astype(np.float32))

    def loss_ref(x, w, b):
        return jnp.sum(normalize_classify_device(x, w, b) * g)

    def loss_fused(x, w, b):
        return jnp.sum(normalize_classify_fused_nofeatgrad(x, w, b) * g)

    dx_r, dw_r, db_r = jax.grad(loss_ref, argnums=(0, 1, 2))(x, w, b)
    dx_f, dw_f, db_f = jax.grad(loss_fused, argnums=(0, 1, 2))(x, w, b)
    np.testing.assert_allclose(np.asarray(dw_f), np.asarray(dw_r), rtol=2e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(db_f), np.asarray(db_r), rtol=2e-5, atol=1e-6)
    assert float(jnp.abs(dx_f).max()) == 0.0
    # and the reference dx is generally nonzero — the zero is a contract,
    # not an accident of the data
    assert float(jnp.abs(dx_r).max()) > 0.0


def test_fused_vjps_mixed_dtype_bf16_kernel_f32_bias(rng):
    """The production bf16 config (MODEL.DTYPE='bfloat16') casts the
    kernel to bf16 while the Flax bias stays f32: both custom VJPs must
    return cotangents in each primal's OWN dtype (db in f32) and compute
    the normalization in f32 (regression: db was cast to the weight
    dtype — a custom_vjp dtype-mismatch crash — and the nofeatgrad
    backward normalized in bf16)."""
    import jax
    import jax.numpy as jnp

    from tspn_tpu.ops.pairwise import (
        DEFAULT_LAYOUT,
        normalize_classify_device,
        normalize_classify_fused,
        normalize_classify_fused_nofeatgrad,
        to_device_layout,
    )

    lo = DEFAULT_LAYOUT
    p, r = 6, 5
    feats = rng.randn(p, lo.dim).astype(np.float32)
    x = jnp.asarray(to_device_layout(feats)).astype(jnp.bfloat16)
    w = jnp.asarray(
        (rng.randn(lo.device_dim, r) * 0.01).astype(np.float32)
    ).astype(jnp.bfloat16)
    b = jnp.asarray(rng.randn(r).astype(np.float32))  # f32, like Flax
    g = jnp.asarray(rng.randn(p, r).astype(np.float32))

    def loss_ref(x, w, b):
        return jnp.sum(
            normalize_classify_device(
                x.astype(jnp.float32), w.astype(jnp.float32), b
            ) * g
        )

    dw_r, db_r = jax.grad(loss_ref, argnums=(1, 2))(x, w, b)
    for fn in (normalize_classify_fused, normalize_classify_fused_nofeatgrad):
        def loss(x, w, b, _fn=fn):
            return jnp.sum(_fn(x, w, b) * g)

        dw, db = jax.grad(loss, argnums=(1, 2))(x, w, b)  # must not raise
        assert dw.dtype == jnp.bfloat16 and db.dtype == jnp.float32
        np.testing.assert_allclose(
            np.asarray(db), np.asarray(db_r), rtol=1e-5, atol=1e-6
        )
        np.testing.assert_allclose(
            np.asarray(dw, np.float32), np.asarray(dw_r, np.float32),
            rtol=0.05, atol=2e-3,  # bf16 forward/storage rounding
        )
