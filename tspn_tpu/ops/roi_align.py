"""RoIAlign as a fixed-shape gather + bilinear interpolation.

Replaces detectron2's C++/CUDA ROIAlign (used implicitly by the
reference's Faster R-CNN C4 head) with an XLA formulation: sampling
coordinates are computed analytically, the four neighbor taps become
two batched gathers along H then W, and the sample average pools to the
output bin. Everything is dense and static-shaped, so XLA fuses it into
neighboring ops; a Pallas kernel slot exists for the gather-heavy case.

Semantics match torchvision/detectron2 `roi_align` with `aligned=True`
(half-pixel offset) and sampling_ratio fixed per call.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


@partial(jax.jit, static_argnames=("output_size", "sampling_ratio"))
def roi_align(
    features: jnp.ndarray,   # (H, W, C)
    boxes: jnp.ndarray,      # (R, 4) xyxy in feature coordinates
    output_size: int = 14,
    sampling_ratio: int = 2,
) -> jnp.ndarray:
    """Pool each box to (output_size, output_size, C).

    Boxes are in the feature map's coordinate system (divide image boxes
    by the stride first). aligned=True convention: coordinates shifted
    by -0.5 so bin centers are half-pixel aligned.
    """
    h, w, c = features.shape
    r = boxes.shape[0]
    s = sampling_ratio
    n = output_size * s  # sample grid per side

    x0 = boxes[:, 0] - 0.5
    y0 = boxes[:, 1] - 0.5
    bw = jnp.clip(boxes[:, 2] - boxes[:, 0], 1e-6)
    bh = jnp.clip(boxes[:, 3] - boxes[:, 1], 1e-6)

    # sample centers: for output bin i, samples at (i + (k+.5)/s) * bin
    grid = (jnp.arange(n) + 0.5) / s  # in units of output bins
    sx = x0[:, None] + grid[None, :] * (bw[:, None] / output_size)  # (R, n)
    sy = y0[:, None] + grid[None, :] * (bh[:, None] / output_size)

    def bilinear_1d(coord, size):
        c0 = jnp.floor(coord)
        frac = coord - c0
        i0 = jnp.clip(c0.astype(jnp.int32), 0, size - 1)
        i1 = jnp.clip(i0 + 1, 0, size - 1)
        # zero weight outside the valid range (torchvision zero-pads)
        inside = (coord > -1.0) & (coord < size)
        w0 = jnp.where(inside, 1.0 - frac, 0.0)
        w1 = jnp.where(inside, frac, 0.0)
        return i0, i1, w0, w1

    yi0, yi1, wy0, wy1 = bilinear_1d(sy, h)  # (R, n)
    xi0, xi1, wx0, wx1 = bilinear_1d(sx, w)

    # gather rows then columns: (R, n, W, C) -> (R, n, n, C)
    rows = (
        features[yi0] * wy0[..., None, None]
        + features[yi1] * wy1[..., None, None]
    )  # (R, n, W, C)
    cols0 = jnp.take_along_axis(
        rows, xi0[:, None, :, None].repeat(n, 1), axis=2
    )
    cols1 = jnp.take_along_axis(
        rows, xi1[:, None, :, None].repeat(n, 1), axis=2
    )
    samples = cols0 * wx0[:, None, :, None] + cols1 * wx1[:, None, :, None]
    # (R, n, n, C) -> average pool s x s -> (R, out, out, C)
    samples = samples.reshape(r, output_size, s, output_size, s, c)
    return samples.mean(axis=(2, 4))
