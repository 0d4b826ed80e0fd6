"""Fused separable RoIAlign probe (round 4 follow-through of DESIGN §6c).

The shipped separable two-einsum (ops/roi_align.roi_align_separable,
8.3 ms at batch 4 x 256 RoIs x 40^2 x 1024) is dtype-flat — bound by
the HBM round trip of the (R, out, W, C) intermediate between the two
contractions (f32: 2.35 GB written + read per batch), not by compute.
Two candidate fixes, measured here against the shipped form:

  sep       — shipped separable two-einsum (baseline)
  sep_b16t  — same, but the intermediate is cast to bf16 between the
              einsums (halves the round trip; f32 inputs/outputs)
  fused     — Pallas kernel: grid (batch, roi_tile); per step the
              (RT*out, W*C) intermediate lives in a VMEM scratch and
              never touches HBM. Stage 1 is one RoI-batched MXU dot
              (wy_tile (RT*out, H) @ F (H, W*C)); stage 2 contracts W
              on the VPU — for each w, a (RT*out, out) per-row weight
              column (expanded from the tiny wx tile by a constant
              one-hot matmul, the gather-free trick of DESIGN §7) is
              broadcast-FMA'd into the (RT*out, out*C) accumulator.
              No transposes, no gathers, no relayouts.

All legs parity-gated against roi_align_xla (the gather oracle) before
timing. Reference shapes: detectron2 RoIAlign on the C4 head,
/root/reference/detectron/trainer.py:24-33 (R101-C4, pooled 14x14).

Measured outcome (TPU, 2026-08-19, DESIGN §6c round 4): FALSIFIED on
both counts — sep 8.61 ms / sep_b16t 8.67 ms (halving the intermediate
round trip changes nothing, so sep is NOT intermediate-bandwidth-bound)
and fused 13.76 ms = 0.63x sep (the VPU stage-2 broadcast-FMA loop and
small-K per-tile dots cost more than the HBM round trip they avoid).
The fused kernel therefore lives HERE, not in ops/roi_align.py; the
shipped production path stays `roi_align_separable`.

Usage: python tools/bench_roialign_fused.py [--batch 4] [--rois 256]
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


def _kernel_sep_fused(wy_ref, f_ref, wx_ref, o_ref, tmp_ref, acc_ref,
                      *, c, out, rt):
    """Fused separable RoIAlign grid step (one RoI tile).

    Stage 1 (MXU): tmp[(r,i), (w,c)] = sum_h wy[(r,i), h] * F[h, (w,c)]
    — one RoI-batched dot; the (rt*out, W*C) intermediate lives in the
    tmp VMEM scratch and never round-trips HBM (the shipped two-einsum
    form writes + reads it per batch).

    Stage 2 (VPU): out[(r,i), (j,c)] = sum_w wx[r, j, w] * tmp[(r,i), (w,c)]
    — per w, the tiny (rt, out) wx slab expands to a per-row column
    matrix by a constant one-hot dot (rows (r,i) -> r; the gather-free
    expansion trick of the factored rel pass, DESIGN §7) and
    broadcast-FMAs into the accumulator. No transposes, no gathers."""
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl

    f32 = jnp.float32
    rows, hpad = wy_ref.shape[0], f_ref.shape[0]
    w = wx_ref.shape[1]
    tmp_ref[:] = jnp.dot(
        wy_ref[:, :hpad], f_ref[:], preferred_element_type=f32
    )
    ii = jax.lax.broadcasted_iota(jnp.int32, (rows, rt), 0)
    jj = jax.lax.broadcasted_iota(jnp.int32, (rows, rt), 1)
    ee = (ii // out == jj).astype(f32)  # (rows, rt) one-hot row->RoI
    acc_ref[:] = jnp.zeros((rows, out * c), f32)

    def body(wi, carry):
        tmp_w = tmp_ref[:, pl.dslice(wi * c, c)]
        wx_w = jnp.dot(
            ee, wx_ref[0, wi].astype(f32), preferred_element_type=f32
        )  # (rows, 128): lane j holds wx[r(row), j, wi]
        for j in range(out):
            sl = pl.dslice(j * c, c)
            acc_ref[:, sl] = acc_ref[:, sl] + wx_w[:, j:(j + 1)] * tmp_w
        return carry

    jax.lax.fori_loop(0, w, body, 0)
    o_ref[:] = acc_ref[:].astype(o_ref.dtype)


def _make_roi_align_sep_fused():
    """Build the fused-kernel entry point (probe-only; see module doc)."""
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from tspn_tpu.data.feature_store import _round_up
    from tspn_tpu.ops.roi_align import _pooled_axis_weights

    @partial(jax.jit,
             static_argnames=("output_size", "sampling_ratio", "roi_tile"))
    def roi_align_sep_fused(
        features: jnp.ndarray,   # (H, W, C)
        boxes: jnp.ndarray,      # (R, 4) xyxy in feature coordinates
        output_size: int = 14,
        sampling_ratio: int = 2,
        roi_tile: int = 8,
    ) -> jnp.ndarray:
        """Pallas fused separable RoIAlign: same math as
        `roi_align_separable` but the per-tile intermediate stays in
        VMEM (see `_kernel_sep_fused`). Shape constraints (all hold at
        C4-head shapes): R % roi_tile == 0, roi_tile % 8 == 0,
        C % 128 == 0."""
        h, w, c = features.shape
        r = boxes.shape[0]
        out, s = output_size, sampling_ratio
        rt = roi_tile
        assert r % rt == 0 and rt % 8 == 0 and c % 128 == 0, (r, rt, c)
        tiles = r // rt
        rows = rt * out
        hpad = _round_up(h, 8)

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

        fdt = features.dtype
        # 1/s^2 pool normalization folded into wy
        wy = (tables(lo_y, bh, h) * (1.0 / (s * s))).astype(fdt)  # (R, out, h)
        wx = tables(lo_x, bw, w).astype(fdt)                      # (R, out, w)
        wy_p = jnp.zeros((r * out, 128), fdt).at[:, :h].set(
            wy.reshape(r * out, h)
        )
        # (tiles, w, rt, out) lane-padded to 128: stage 2 reads one
        # (rt, out) slab per w with a dynamic index on the untiled w dim
        wx3 = jnp.zeros((tiles, w, rt, 128), fdt).at[:, :, :, :out].set(
            jnp.transpose(wx.reshape(tiles, rt, out, w), (0, 3, 1, 2))
        )
        f2 = jnp.zeros((hpad, w * c), fdt).at[:h].set(
            features.reshape(h, w * c)
        )

        pooled = pl.pallas_call(
            partial(_kernel_sep_fused, c=c, out=out, rt=rt),
            out_shape=jax.ShapeDtypeStruct((r * out, out * c), fdt),
            grid=(tiles,),
            in_specs=[
                pl.BlockSpec((rows, 128), lambda t: (t, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((hpad, w * c), lambda t: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, w, rt, 128), lambda t: (t, 0, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((rows, out * c), lambda t: (t, 0),
                                   memory_space=pltpu.VMEM),
            scratch_shapes=[
                pltpu.VMEM((rows, w * c), jnp.float32),
                pltpu.VMEM((rows, out * c), jnp.float32),
            ],
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024
            ),
            interpret=jax.default_backend() == "cpu",
        )(wy_p, f2, wx3)
        return pooled.reshape(r, out, out, c)

    return roi_align_sep_fused


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--batch", type=int, default=4)
    parser.add_argument("--rois", type=int, default=256)
    parser.add_argument("--hw", type=int, default=40)
    parser.add_argument("--channels", type=int, default=1024)
    parser.add_argument("--roi-tile", type=int, default=8)
    parser.add_argument("--iters", type=int, default=6)
    parser.add_argument("--rounds", type=int, default=5)
    parser.add_argument("--dtype", default="f32", choices=["f32", "bf16"])
    args = parser.parse_args()

    import jax
    import jax.numpy as jnp

    from tspn_tpu.ops.roi_align import roi_align_separable, roi_align_xla

    roi_align_sep_fused = _make_roi_align_sep_fused()

    b, r, hw, c = args.batch, args.rois, args.hw, args.channels
    out, s = 14, 2
    h = w = hw
    fdt = jnp.float32 if args.dtype == "f32" else jnp.bfloat16

    rng = np.random.RandomState(0)
    feats = jnp.asarray(rng.randn(b, h, w, c).astype(np.float32))
    bx = rng.uniform(0, hw - 2, (b, r, 2))
    wh_ = rng.uniform(1, hw / 2, (b, r, 2))
    boxes = jnp.asarray(
        np.concatenate([bx, bx + wh_], axis=-1).astype(np.float32)
    )

    # ---- bf16-intermediate separable variant ---------------------------
    @jax.jit
    def roi_sep_b16t(features, bxs):
        from tspn_tpu.ops.roi_align import _pooled_axis_weights

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

        wy = tables(lo_y, bh, h).astype(features.dtype)
        wx = tables(lo_x, bw, w).astype(features.dtype)
        tmp = jnp.einsum("rih,hwc->riwc", wy, features).astype(jnp.bfloat16)
        pooled = jnp.einsum("rjw,riwc->rijc", wx.astype(jnp.bfloat16), tmp)
        return (pooled.astype(jnp.float32) * (1.0 / (s * s))).astype(
            features.dtype
        )

    fused = partial(roi_align_sep_fused, output_size=out, sampling_ratio=s,
                    roi_tile=args.roi_tile)

    # ---- parity gates ---------------------------------------------------
    import time as _time

    f0 = feats[0].astype(fdt)
    b0 = boxes[0]
    t0 = _time.perf_counter()
    oracle = np.asarray(
        roi_align_xla(feats[0], boxes[0], output_size=out, sampling_ratio=s)
    )
    got_sep = np.asarray(
        roi_align_separable(f0, b0, output_size=out, sampling_ratio=s),
        np.float32,
    )
    got_b16t = np.asarray(roi_sep_b16t(f0, b0), np.float32)
    got_fused = np.asarray(fused(f0, b0), np.float32)
    scale = float(np.max(np.abs(oracle)) + 1e-9)
    tol = 1.5e-2 if args.dtype == "f32" else 4e-2
    err_sep = float(np.max(np.abs(got_sep - oracle))) / scale
    err_b16t = float(np.max(np.abs(got_b16t - oracle))) / scale
    err_fused = float(np.max(np.abs(got_fused - oracle))) / scale
    # fused shares the dot class with sep: gate it against sep tightly
    err_fused_sep = float(np.max(np.abs(got_fused - got_sep))) / scale
    assert err_sep < tol, f"sep parity {err_sep}"
    assert err_b16t < 3e-2 if args.dtype == "f32" else tol, (
        f"b16t parity {err_b16t}"
    )
    assert err_fused < tol, f"fused parity {err_fused}"
    print(
        f"# parity ok ({_time.perf_counter() - t0:.1f}s): sep {err_sep:.2e} "
        f"b16t {err_b16t:.2e} fused {err_fused:.2e} "
        f"fused-vs-sep {err_fused_sep:.2e}",
        file=sys.stderr, flush=True,
    )

    # ---- timing ----------------------------------------------------------
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
        "sep": (make_leg(partial(roi_align_separable, output_size=out,
                                 sampling_ratio=s)), args.iters),
        "sep_b16t": (make_leg(roi_sep_b16t), args.iters),
        "fused": (make_leg(fused), args.iters),
    }
    t = _time_interleaved(legs, rounds=args.rounds, warmup=2)
    res = {
        "metric": "roialign_fused",
        "dtype": args.dtype,
        "batch": b,
        "rois": r,
        "roi_tile": args.roi_tile,
        "parity": {"sep": err_sep, "sep_b16t": err_b16t, "fused": err_fused,
                   "fused_vs_sep": err_fused_sep},
    }
    medians = {}
    for name, ts in t.items():
        med = float(np.median(ts))
        lo, hi = np.percentile(ts, [25, 75])
        medians[name] = med
        res[f"{name}_ms"] = round(med * 1e3, 3)
        res[f"{name}_iqr_ms"] = [round(lo * 1e3, 3), round(hi * 1e3, 3)]
    res["fused_speedup_vs_sep"] = round(medians["sep"] / medians["fused"], 3)
    print(json.dumps(res), flush=True)


if __name__ == "__main__":
    main()
