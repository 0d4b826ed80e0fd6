"""RoIAlign kernel variants probe (VERDICT r3 item 2 follow-through).

tools/profile_detect.py attributed the detect bf16 non-gain to the
Pallas RoIAlign: isolated it measures the SAME time at f32 and bf16
(14.6 vs 14.5 ms, batch 4 x 256 RoIs), i.e. it is not MXU-bound — the
suspect is the pointwise G-matrix build (tens of f32 VPU ops over the
(200, 1664) grid per RoI, per axis, per sub-sample). Variants:

  grid      — the shipped kernel (ops/roi_align.roi_align_pallas)
  constg    — same kernel with the G build replaced by a constant
              broadcast (NOT correct; isolates the build cost as a
              lower bound: dot + output write + step overhead)
  selector  — G built by SELECTOR MATMULS: the tiny per-RoI axis-weight
              tables wy (out, h) / wx (out, w) are built pointwise
              (2k elements instead of 333k) and expanded to the
              (pp, hwp) grid via constant one-hot matrices
              (S_row @ wy @ S_colT) — ~28 MFLOP of extra MXU work per
              RoI replaces ~20M VPU ops (the gather-free expansion
              trick of the factored rel pass, DESIGN §7 r3).
  xlasep    — no Pallas: separable two-einsum XLA formulation
              (R, out, h) x (h, w, c) x (R, out, w); materializes the
              (R, out, w, c) intermediate in HBM but needs 11x fewer
              FLOPs than the big-G dot.

selector/xlasep are parity-gated against roi_align_xla before timing.

Usage: python tools/bench_roialign_variants.py [--batch 4] [--rois 256]
Prints one JSON line.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
from functools import partial

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--batch", type=int, default=4)
    parser.add_argument("--rois", type=int, default=256)
    parser.add_argument("--hw", type=int, default=40)
    parser.add_argument("--channels", type=int, default=1024)
    parser.add_argument("--iters", type=int, default=6)
    parser.add_argument("--rounds", type=int, default=5)
    parser.add_argument("--dtype", default="f32", choices=["f32", "bf16"])
    args = parser.parse_args()

    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from tspn_tpu.data.feature_store import _round_up
    from tspn_tpu.ops.roi_align import (
        _kernel_roi,
        _pooled_axis_weights,
        roi_align_pallas,
        roi_align_xla,
    )

    b, r, hw, c = args.batch, args.rois, args.hw, args.channels
    out, s = 14, 2
    h = w = hw
    hwp = _round_up(h * w, 128)
    pp = _round_up(out * out, 8)
    fdt = jnp.float32 if args.dtype == "f32" else jnp.bfloat16

    rng = np.random.RandomState(0)
    feats = jnp.asarray(rng.randn(b, h, w, c).astype(np.float32))
    bx = rng.uniform(0, hw - 2, (b, r, 2))
    wh_ = rng.uniform(1, hw / 2, (b, r, 2))
    boxes = jnp.asarray(
        np.concatenate([bx, bx + wh_], axis=-1).astype(np.float32)
    )

    # ---------------- selector-matmul kernel --------------------------
    outp = _round_up(out, 8)  # sublane-padded tiny table rows
    hp = 128  # lane-padded axis length (h, w <= 128 at C4 shapes)
    assert h <= hp and w <= hp

    # constant one-hot expanders (host-built once per shape)
    rows = np.arange(pp)
    s_row_i = np.zeros((pp, outp), np.float32)
    s_row_j = np.zeros((pp, outp), np.float32)
    ok = rows < out * out
    s_row_i[ok, (rows // out)[ok]] = 1.0
    s_row_j[ok, (rows % out)[ok]] = 1.0
    cols = np.arange(hwp)
    s_col_y = np.zeros((hp, hwp), np.float32)  # wy lanes -> grid cols
    s_col_x = np.zeros((hp, hwp), np.float32)
    okc = cols < h * w
    s_col_y[(cols // w)[okc], cols[okc]] = 1.0
    s_col_x[(cols % w)[okc], cols[okc]] = 1.0

    def _axis_table(lo, extent, size, coords_1d):
        """(outp, hp) pooled axis weights built pointwise on the TINY
        grid: rows = output bin, cols = feature index along the axis."""
        bin_of = jax.lax.broadcasted_iota(jnp.int32, (outp, hp), 0)
        coords = jax.lax.broadcasted_iota(jnp.int32, (outp, hp), 1)
        fn = _pooled_axis_weights(lo, extent, size, out, s, coords)
        return sum(fn(bin_of, a) for a in range(s))

    def _kernel_sel(b_ref, f_ref, sri_ref, srj_ref, scy_ref, scx_ref, o_ref):
        x0 = b_ref[0, 0, 0] - 0.5
        y0 = b_ref[0, 0, 1] - 0.5
        bw = jnp.maximum(b_ref[0, 0, 2] - b_ref[0, 0, 0], 1e-6)
        bh = jnp.maximum(b_ref[0, 0, 3] - b_ref[0, 0, 1], 1e-6)
        wy = _axis_table(y0, bh, h, None)   # (outp, hp)
        wx = _axis_table(x0, bw, w, None)
        f32 = jnp.float32
        # HIGHEST precision: the default TPU f32 dot rounds inputs to
        # bf16, which corrupts the one-hot expansion's weight VALUES
        # (measured 5e-3 vs the pointwise build); full f32 on these tiny
        # dots costs ~nothing next to the main G @ F pass
        hi = jax.lax.Precision.HIGHEST
        wyg = jnp.dot(
            sri_ref[:],
            jnp.dot(wy, scy_ref[:], preferred_element_type=f32, precision=hi),
            preferred_element_type=f32, precision=hi,
        )  # (pp, hwp)
        wxg = jnp.dot(
            srj_ref[:],
            jnp.dot(wx, scx_ref[:], preferred_element_type=f32, precision=hi),
            preferred_element_type=f32, precision=hi,
        )
        g = (wyg * wxg * (1.0 / (s * s))).astype(f_ref.dtype)
        o_ref[0] = jnp.dot(g, f_ref[:], preferred_element_type=jnp.float32)

    @jax.jit
    def roi_selector(features, bxs):
        f2 = jnp.zeros((hwp, c), features.dtype).at[: h * w].set(
            features.reshape(h * w, c)
        )
        bp = jnp.zeros((bxs.shape[0], 8, 128), jnp.float32).at[:, 0, :4].set(
            bxs.astype(jnp.float32)
        )
        pooled = pl.pallas_call(
            _kernel_sel,
            out_shape=jax.ShapeDtypeStruct((bxs.shape[0], pp, c), jnp.float32),
            grid=(bxs.shape[0],),
            in_specs=[
                pl.BlockSpec((1, 8, 128), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((hwp, c), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((pp, outp), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((pp, outp), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((hp, hwp), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((hp, hwp), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, pp, c), lambda i: (i, 0, 0),
                                   memory_space=pltpu.VMEM),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=64 * 1024 * 1024
            ),
            interpret=jax.default_backend() == "cpu",
        )(bp, f2, jnp.asarray(s_row_i), jnp.asarray(s_row_j),
          jnp.asarray(s_col_y), jnp.asarray(s_col_x))
        return (
            pooled[:, : out * out]
            .reshape(bxs.shape[0], out, out, c)
            .astype(features.dtype)
        )

    # ---------------- const-G bound check ------------------------------
    def _kernel_const(b_ref, f_ref, o_ref):
        g = jnp.full((pp, hwp), b_ref[0, 0, 0] * 1e-6, f_ref.dtype)
        o_ref[0] = jnp.dot(g, f_ref[:], preferred_element_type=jnp.float32)

    @jax.jit
    def roi_constg(features, bxs):
        f2 = jnp.zeros((hwp, c), features.dtype).at[: h * w].set(
            features.reshape(h * w, c)
        )
        bp = jnp.zeros((bxs.shape[0], 8, 128), jnp.float32).at[:, 0, :4].set(
            bxs.astype(jnp.float32)
        )
        pooled = pl.pallas_call(
            _kernel_const,
            out_shape=jax.ShapeDtypeStruct((bxs.shape[0], pp, c), jnp.float32),
            grid=(bxs.shape[0],),
            in_specs=[
                pl.BlockSpec((1, 8, 128), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((hwp, c), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, pp, c), lambda i: (i, 0, 0),
                                   memory_space=pltpu.VMEM),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=64 * 1024 * 1024
            ),
            interpret=jax.default_backend() == "cpu",
        )(bp, f2)
        return pooled[:, : out * out].reshape(bxs.shape[0], out, out, c)

    # ---------------- XLA separable two-einsum -------------------------
    @jax.jit
    def roi_xlasep(features, bxs):
        lo_x = bxs[:, 0] - 0.5
        lo_y = bxs[:, 1] - 0.5
        bw = jnp.clip(bxs[:, 2] - bxs[:, 0], 1e-6)
        bh = jnp.clip(bxs[:, 3] - bxs[:, 1], 1e-6)

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

    # ---------------- XLA separable, transpose-free batched dot --------
    # The two-einsum form leaves XLA to plan 'rjw,riwc->rijc', which can
    # materialize a transposed (r, w, i*c) intermediate. This variant
    # pins the schedule: tmp (r, i, w, c) comes out of one big GEMM
    # naturally, and the second contraction is a dot_general with batch
    # dims (r, i) — wx broadcast over i is tiny — so no big relayout can
    # appear.
    @jax.jit
    def roi_xlasep2(features, bxs):
        lo_x = bxs[:, 0] - 0.5
        lo_y = bxs[:, 1] - 0.5
        bw = jnp.clip(bxs[:, 2] - bxs[:, 0], 1e-6)
        bh = jnp.clip(bxs[:, 3] - bxs[:, 1], 1e-6)

        def tables(lo, extent, size):
            bin_of = jnp.arange(out)[:, None]
            coords = jnp.arange(size)[None, :]
            fn = _pooled_axis_weights(
                lo[:, None, None], extent[:, None, None], size, out, s,
                coords[None],
            )
            return sum(fn(bin_of[None], a) for a in range(s))

        wy = tables(lo_y, bh, h).astype(features.dtype)   # (R, out, h)
        wx = tables(lo_x, bw, w).astype(features.dtype)   # (R, out, w)
        rr = bxs.shape[0]
        tmp = jax.lax.dot_general(
            wy, features.reshape(h, w * c),
            (((2,), (0,)), ((), ())),
        ).reshape(rr, out, w, c)                          # (R, i, w, c)
        wx_b = jnp.broadcast_to(wx[:, None], (rr, out, out, w))
        pooled = jax.lax.dot_general(
            wx_b, tmp, (((3,), (2,)), ((0, 1), (0, 1))),
        )                                                 # (R, i, j, c)
        return (pooled * (1.0 / (s * s))).astype(features.dtype)

    # ---------------- parity gates -------------------------------------
    # vs the gather oracle the tolerance absorbs TPU f32 MATMUL precision
    # (the shipped grid kernel itself differs from the oracle by ~5e-3 on
    # chip, DESIGN §6b); the selector-vs-grid gate is TIGHT because both
    # share the same main dot — it isolates the one-hot expansion, which
    # must be (near-)exact.
    import time as _time

    f0 = feats[0].astype(fdt)
    b0 = boxes[0]
    t0 = _time.perf_counter()
    oracle = np.asarray(
        roi_align_xla(feats[0], boxes[0], output_size=out, sampling_ratio=s)
    )
    got_grid = np.asarray(
        roi_align_pallas(f0, b0, output_size=out, sampling_ratio=s),
        np.float32,
    )
    got_sel = np.asarray(roi_selector(f0, b0), np.float32)
    got_sep = np.asarray(roi_xlasep(f0, b0), np.float32)
    got_sep2 = np.asarray(roi_xlasep2(f0, b0), np.float32)
    tol = 1.5e-2 if args.dtype == "f32" else 4e-2
    scale = float(np.max(np.abs(oracle)) + 1e-9)
    err_sel = float(np.max(np.abs(got_sel - oracle)))
    err_sep = float(np.max(np.abs(got_sep - oracle)))
    err_sep2 = float(np.max(np.abs(got_sep2 - oracle)))
    err_sel_grid = float(np.max(np.abs(got_sel - got_grid)))
    assert err_sel / scale < tol, f"selector parity {err_sel / scale}"
    assert err_sep / scale < tol, f"xlasep parity {err_sep / scale}"
    assert err_sep2 / scale < tol, f"xlasep2 parity {err_sep2 / scale}"
    assert err_sel_grid / scale < 2e-3, (
        f"selector-vs-grid {err_sel_grid / scale} (expansion not exact?)"
    )
    print(f"# parity ok ({_time.perf_counter() - t0:.1f}s): "
          f"sel {err_sel / scale:.2e} sep {err_sep / scale:.2e} "
          f"sel-vs-grid {err_sel_grid / scale:.2e}",
          file=sys.stderr, flush=True)

    # ---------------- timing -------------------------------------------
    from bench import _time_interleaved

    feats_d = feats.astype(fdt)

    def make_leg(fn):
        @jax.jit
        def step(f, bxs, tag, carry):
            f = f + (1e-4 * (tag + carry)).astype(f.dtype)
            o = jax.vmap(lambda ff, bb: fn(ff, bb))(f, bxs)
            return jnp.sum(o.astype(jnp.float32)) * 1e-9

        return lambda tag, cr: step(feats_d, boxes, jnp.float32(tag), cr)

    legs = {
        "grid": (make_leg(partial(roi_align_pallas, output_size=out,
                                  sampling_ratio=s)), args.iters),
        "constg": (make_leg(roi_constg), args.iters),
        "selector": (make_leg(roi_selector), args.iters),
        "xlasep": (make_leg(roi_xlasep), args.iters),
        "xlasep2": (make_leg(roi_xlasep2), args.iters),
    }
    t = _time_interleaved(legs, rounds=args.rounds, warmup=2)
    res = {
        "metric": "roialign_variants",
        "dtype": args.dtype,
        "batch": b,
        "rois": r,
        "parity_rel_err": {"selector": round(err_sel / scale, 5),
                           "xlasep": round(err_sep / scale, 5)},
    }
    for name, ts in t.items():
        med = float(np.median(ts))
        lo, hi = np.percentile(ts, [25, 75])
        res[f"{name}_ms"] = round(med * 1e3, 2)
        res[f"{name}_iqr_ms"] = [round(lo * 1e3, 2), round(hi * 1e3, 2)]
    print(json.dumps(res))


if __name__ == "__main__":
    main()
