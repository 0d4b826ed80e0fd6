"""RoIAlign: fixed-shape bilinear pooling, XLA and Pallas formulations.

Replaces detectron2's C++/CUDA ROIAlign (used implicitly by the
reference's Faster R-CNN C4 head). Semantics match torchvision /
detectron2 `roi_align` with `aligned=True` (half-pixel offset) and
static sampling_ratio, INCLUDING the border conventions of
torchvision's bilinear_interpolate: samples strictly outside
[-1, size] contribute zero, samples in [-1, 0] clamp to index 0 with
full weight, and samples past size-1 collapse to the last index.

Two formulations:

- `roi_align_xla`: two batched gathers along H then W. Correct but
  materializes a (R, n, W, C) intermediate — >1 GB of HBM traffic at
  C4-head shapes (256 RoIs x 28 samples x 40 x 1024), measured 38 ms of
  a 42 ms detect on the v5e chip.

- `roi_align_pallas`: per RoI, the ENTIRE bilinear sample + s x s
  average pool collapses into one matmul
      out[(i,j), c] = sum_{y,x} G[(i,j), (y,x)] * F[(y,x), c]
  because the pooled weight factorizes separably:
      G[(i,j), (y,x)] = (1/s^2) * (sum_a wy[i*s+a, y]) * (sum_b wx[j*s+b, x]).
  G is built pointwise on a (out^2, H*W) grid from the box coordinates
  (no gathers at all) and hits the MXU against the feature map, which
  stays resident in VMEM across the RoI grid. ~10x the gather
  formulation.

- `roi_align_separable` (default on TPU): exploits the SAME separable
  factorization but never materializes the big G — two chained einsums
      tmp[(r,i),w,c] = sum_h wy[r,i,h] * F[h,w,c]
      out[r,i,j,c]   = sum_w wx[r,j,w] * tmp[r,i,w,c]
  need ~out/(2*HW-per-axis) = ~11x fewer FLOPs than the big-G dot at
  C4-head shapes. Measured (tools/bench_roialign_variants.py, v5e,
  batch 4 x 256 RoIs x 40^2 x 1024): 8.3 ms vs the Pallas kernel's
  11.2 ms at f32 — and the Pallas kernel's const-G lower bound is
  9.4 ms, i.e. its main dot ALONE costs more than the whole separable
  pass; no in-kernel schedule can win, the FLOP count is the lever
  (DESIGN §6c). Pure XLA and differentiable, so it also replaces the
  gather formulation on the detector TRAINING path.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tspn_tpu.data.feature_store import _round_up


@partial(jax.jit, static_argnames=("output_size", "sampling_ratio"))
def roi_align_xla(
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
        # torchvision bilinear_interpolate semantics exactly: zero weight
        # strictly outside [-1, size]; coords in [-1, 0] clamp to 0 with
        # FULL weight on index 0 (not a split), and coords >= size-1
        # collapse to index size-1 with frac 0
        inside = (coord >= -1.0) & (coord <= size)
        c = jnp.maximum(coord, 0.0)
        low = jnp.floor(c).astype(jnp.int32)
        at_top = low >= size - 1
        i0 = jnp.minimum(low, size - 1)
        i1 = jnp.minimum(low + 1, size - 1)
        frac = jnp.where(at_top, 0.0, c - low)
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


def _pooled_axis_weights(lo, extent, size, out, s, coords):
    """Pointwise pooled interpolation weight of feature index `coords`
    for each output bin row of a (out^2, HWp) grid.

    lo/extent: box start (already -0.5 shifted) and length along this
    axis (scalars); bin_of: (P, Q) output-bin index along this axis;
    coords: (P, Q) feature index along this axis. Returns the summed
    bilinear weight over the s sub-samples of the bin (the separable
    factor of the pooled G matrix).
    """
    def one_sample(bin_of, a):
        # torchvision bilinear_interpolate semantics (see bilinear_1d)
        pos = lo + (bin_of * s + a + 0.5) / s * (extent / out)
        inside = (pos >= -1.0) & (pos <= size)
        c = jnp.maximum(pos, 0.0)
        low = jnp.floor(c).astype(jnp.int32)
        at_top = low >= size - 1
        i0 = jnp.minimum(low, size - 1)
        i1 = jnp.minimum(low + 1, size - 1)
        frac = jnp.where(at_top, 0.0, c - low)
        w = jnp.where(inside & (coords == i0), 1.0 - frac, 0.0)
        return w + jnp.where(inside & (coords == i1), frac, 0.0)

    return one_sample  # caller sums over a in range(s)


def _kernel_roi(b_ref, f_ref, o_ref, *, h, w, out, s, hwp, pp):
    """One RoI per grid step: build the pooled interpolation matrix
    G (out^2 padded to pp, HWp) pointwise from the box coords, one MXU
    pass against the VMEM-resident feature map (HWp, C). Rows >= out^2
    are sublane padding (sliced off outside)."""
    x0 = b_ref[0, 0, 0] - 0.5
    y0 = b_ref[0, 0, 1] - 0.5
    bw = jnp.maximum(b_ref[0, 0, 2] - b_ref[0, 0, 0], 1e-6)
    bh = jnp.maximum(b_ref[0, 0, 3] - b_ref[0, 0, 1], 1e-6)

    rows = jax.lax.broadcasted_iota(jnp.int32, (pp, hwp), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (pp, hwp), 1)
    i_bin = rows // out          # output row (y direction)
    j_bin = rows % out           # output col (x direction)
    y_of = cols // w             # feature row; >= h in the padding tail
    x_of = cols % w

    wy_fn = _pooled_axis_weights(y0, bh, h, out, s, y_of)
    wx_fn = _pooled_axis_weights(x0, bw, w, out, s, x_of)
    wy = sum(wy_fn(i_bin, a) for a in range(s))
    wx = sum(wx_fn(j_bin, b) for b in range(s))
    g = (wy * wx * (1.0 / (s * s))).astype(f_ref.dtype)
    # padding tail (cols >= h*w) reads zero feature rows — weight irrelevant
    o_ref[0] = jnp.dot(g, f_ref[:], preferred_element_type=jnp.float32)


@partial(jax.jit, static_argnames=("output_size", "sampling_ratio"))
def roi_align_pallas(
    features: jnp.ndarray,
    boxes: jnp.ndarray,
    output_size: int = 14,
    sampling_ratio: int = 2,
) -> jnp.ndarray:
    h, w, c = features.shape
    r = boxes.shape[0]
    out, s = output_size, sampling_ratio
    hwp = _round_up(h * w, 128)
    pp = _round_up(out * out, 8)  # sublane-aligned sample-row count

    f2 = jnp.zeros((hwp, c), features.dtype).at[: h * w].set(
        features.reshape(h * w, c)
    )
    # (r, 8, 128) carrier: TPU blocks need (8, 128)-aligned trailing dims
    bp = jnp.zeros((r, 8, 128), jnp.float32).at[:, 0, :4].set(
        boxes.astype(jnp.float32)
    )

    pooled = pl.pallas_call(
        partial(_kernel_roi, h=h, w=w, out=out, s=s, hwp=hwp, pp=pp),
        out_shape=jax.ShapeDtypeStruct((r, pp, c), jnp.float32),
        grid=(r,),
        in_specs=[
            pl.BlockSpec((1, 8, 128), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((hwp, c), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, pp, c), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * r * pp * hwp * c,
            bytes_accessed=hwp * c * features.dtype.itemsize
            + r * pp * c * 4,
            transcendentals=0,
        ),
        # under vmap (batched detect) the feature block double-buffers
        # per batch element and the default 16 MB scoped-VMEM limit
        # overflows; the kernel's true working set is modest
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=64 * 1024 * 1024),
        interpret=jax.default_backend() == "cpu",
    )(bp, f2)
    return pooled[:, : out * out].reshape(r, out, out, c).astype(features.dtype)


@partial(jax.jit, static_argnames=("output_size", "sampling_ratio"))
def roi_align_separable(
    features: jnp.ndarray,   # (H, W, C)
    boxes: jnp.ndarray,      # (R, 4) xyxy in feature coordinates
    output_size: int = 14,
    sampling_ratio: int = 2,
) -> jnp.ndarray:
    """Separable two-einsum formulation (see module docstring): the
    per-axis pooled weight tables are tiny ((R, out, H) / (R, out, W)),
    built pointwise, and the pool is two chained contractions — ~11x
    fewer FLOPs than the big-G matmul at C4-head shapes, differentiable,
    and the fastest variant measured on the v5e
    (tools/bench_roialign_variants.py)."""
    h, w, _c = features.shape
    out, s = output_size, sampling_ratio

    lo_x = boxes[:, 0] - 0.5
    lo_y = boxes[:, 1] - 0.5
    bw = jnp.clip(boxes[:, 2] - boxes[:, 0], 1e-6)
    bh = jnp.clip(boxes[:, 3] - boxes[:, 1], 1e-6)

    def tables(lo, extent, size):
        bin_of = jnp.arange(out)[:, None]
        coords = jnp.arange(size)[None, :]
        fn = _pooled_axis_weights(
            lo[:, None, None], extent[:, None, None], size, out, s,
            coords[None],
        )
        return sum(fn(bin_of[None], a) for a in range(s))  # (R, out, size)

    wy = tables(lo_y, bh, h).astype(features.dtype)
    wx = tables(lo_x, bw, w).astype(features.dtype)
    tmp = jnp.einsum("rih,hwc->riwc", wy, features)
    pooled = jnp.einsum("rjw,riwc->rijc", wx, tmp)
    return (pooled * (1.0 / (s * s))).astype(features.dtype)


def roi_align(
    features: jnp.ndarray,
    boxes: jnp.ndarray,
    output_size: int = 14,
    sampling_ratio: int = 2,
) -> jnp.ndarray:
    """Dispatch: separable two-einsum formulation on TPU (fastest
    measured variant, tools/bench_roialign_variants.py), gather
    formulation elsewhere (fewer tiny-op dispatches on CPU)."""
    if jax.default_backend() == "tpu":
        return roi_align_separable(features, boxes, output_size,
                                   sampling_ratio)
    return roi_align_xla(features, boxes, output_size, sampling_ratio)
