import jax.numpy as jnp
import numpy as np


from tspn_tpu.ops.roi_align import (
    roi_align,
    roi_align_pallas,
    roi_align_separable,
    roi_align_xla,
)


def _oracle_roi_align(feat, boxes, output_size, sampling_ratio):
    """Faithful NumPy port of torchvision's bilinear_interpolate
    (aligned=True): zero outside [-1, size]; coords in [-1, 0] clamp to
    index 0 with FULL weight; coords >= size-1 collapse to the last
    index with zero frac."""
    h, w, c = feat.shape
    s = sampling_ratio
    out = np.zeros((len(boxes), output_size, output_size, c), np.float64)

    def axis(coord, size):
        if coord < -1.0 or coord > size:
            return None
        coord = max(coord, 0.0)
        low = int(np.floor(coord))
        if low >= size - 1:
            return size - 1, size - 1, 0.0
        return low, low + 1, coord - low

    def sample(y, x):
        ay = axis(y, h)
        ax = axis(x, w)
        if ay is None or ax is None:
            return np.zeros(c)
        y0, y1, fy = ay
        x0, x1, fx = ax
        return (
            feat[y0, x0] * (1 - fy) * (1 - fx)
            + feat[y0, x1] * (1 - fy) * fx
            + feat[y1, x0] * fy * (1 - fx)
            + feat[y1, x1] * fy * fx
        )

    for r, (bx0, by0, bx1, by1) in enumerate(boxes):
        bw = max(bx1 - bx0, 1e-6)
        bh = max(by1 - by0, 1e-6)
        bx0, by0 = bx0 - 0.5, by0 - 0.5
        for i in range(output_size):
            for j in range(output_size):
                acc = np.zeros(c)
                for ky in range(s):
                    for kx in range(s):
                        y = by0 + (i + (ky + 0.5) / s) * bh / output_size
                        x = bx0 + (j + (kx + 0.5) / s) * bw / output_size
                        acc += sample(y, x)
                out[r, i, j] = acc / (s * s)
    return out


def test_roi_align_matches_oracle(rng):
    h, w, c = 20, 24, 2
    feat = rng.rand(h, w, c).astype(np.float32)
    xy = rng.rand(4, 2) * np.array([w - 12, h - 12]) + 2
    wh = rng.rand(4, 2) * 6 + 3
    boxes = np.concatenate([xy, xy + wh], axis=1).astype(np.float32)
    # border/off-map boxes exercise torchvision's clamp conventions
    boxes = np.concatenate([
        boxes,
        np.array([
            [0.0, 0.0, 6.0, 6.0],          # touches the top-left corner
            [-4.0, -3.0, 5.0, 6.0],        # hangs off the top-left
            [w - 6.0, h - 6.0, w + 4.0, h + 4.0],  # hangs off bottom-right
        ], np.float32),
    ])
    for out_size, s in [(7, 2), (4, 1)]:
        for impl in (roi_align_xla, roi_align_pallas, roi_align_separable):
            ours = np.asarray(
                impl(jnp.asarray(feat), jnp.asarray(boxes), out_size, s)
            )
            ref = _oracle_roi_align(feat, boxes, out_size, s)
            assert np.allclose(ours, ref, atol=1e-4), (
                impl.__name__, np.abs(ours - ref).max()
            )


def test_roi_align_constant_feature_is_exact(rng):
    """A constant feature map must pool to the constant everywhere the
    box lies inside the map."""
    feat = np.full((16, 16, 3), 2.5, np.float32)
    boxes = np.array([[2.0, 2.0, 10.0, 12.0]], np.float32)
    out = np.asarray(roi_align(jnp.asarray(feat), jnp.asarray(boxes), 7, 2))
    assert np.allclose(out, 2.5, atol=1e-5)


def test_roi_align_pallas_matches_xla(rng):
    """The matmul-formulation kernel (one pooled interpolation matrix
    per RoI) must equal the gather formulation, including boundary boxes
    that hang off the feature map."""
    h, w, c = 20, 24, 8
    feat = rng.rand(h, w, c).astype(np.float32)
    boxes = np.array(
        [
            [2.0, 3.0, 10.0, 12.0],
            [-3.0, -2.0, 5.0, 6.0],      # hangs off the top-left
            [18.0, 14.0, 30.0, 26.0],    # hangs off the bottom-right
            [0.0, 0.0, 24.0, 20.0],      # whole map
            [5.0, 5.0, 5.0, 5.0],        # degenerate
        ],
        np.float32,
    )
    for out_size, s in [(7, 2), (4, 1), (14, 2)]:
        ref = np.asarray(
            roi_align_xla(jnp.asarray(feat), jnp.asarray(boxes), out_size, s)
        )
        ours = np.asarray(
            roi_align_pallas(jnp.asarray(feat), jnp.asarray(boxes), out_size, s)
        )
        assert ours.shape == ref.shape
        np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-4)


def test_roi_align_separable_matches_xla_and_differentiates(rng):
    """The separable two-einsum formulation (the TPU default) must equal
    the gather formulation — including boundary boxes — and its feature
    gradients must match the gather path's (it replaces roi_align_xla on
    the detector TRAINING path, detection/rcnn.py::_roi_forward)."""
    import jax

    h, w, c = 20, 24, 8
    feat = rng.rand(h, w, c).astype(np.float32)
    boxes = np.array(
        [
            [2.0, 3.0, 10.0, 12.0],
            [-3.0, -2.0, 5.0, 6.0],
            [18.0, 14.0, 30.0, 26.0],
            [0.0, 0.0, 24.0, 20.0],
            [5.0, 5.0, 5.0, 5.0],
        ],
        np.float32,
    )
    for out_size, s in [(7, 2), (4, 1), (14, 2)]:
        ref = np.asarray(
            roi_align_xla(jnp.asarray(feat), jnp.asarray(boxes), out_size, s)
        )
        ours = np.asarray(
            roi_align_separable(
                jnp.asarray(feat), jnp.asarray(boxes), out_size, s
            )
        )
        np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-4)

    cot = rng.rand(len(boxes), 7, 7, c).astype(np.float32)

    def pooled_sum(impl, f):
        out = impl(f, jnp.asarray(boxes), 7, 2)
        return jnp.sum(out * jnp.asarray(cot))

    g_ref = jax.grad(lambda f: pooled_sum(roi_align_xla, f))(jnp.asarray(feat))
    g_sep = jax.grad(lambda f: pooled_sum(roi_align_separable, f))(
        jnp.asarray(feat)
    )
    np.testing.assert_allclose(
        np.asarray(g_sep), np.asarray(g_ref), rtol=1e-4, atol=1e-4
    )


def test_roi_align_linear_gradient(rng):
    """Pooling a linear ramp recovers the ramp at bin centers."""
    h, w = 32, 32
    ramp = np.tile(np.arange(w, dtype=np.float32)[None, :, None], (h, 1, 1))
    box = np.array([[4.0, 4.0, 20.0, 20.0]], np.float32)
    out = np.asarray(roi_align(jnp.asarray(ramp), jnp.asarray(box), 4, 2))[0, :, :, 0]
    # x bin centers: x0-0.5 + (i+0.5)*bw/4 with bw=16
    centers = (4 - 0.5) + (np.arange(4) + 0.5) * 16 / 4
    assert np.allclose(out[0], centers, atol=1e-3)
    # constant along y
    assert np.allclose(out, out[0][None, :], atol=1e-5)
