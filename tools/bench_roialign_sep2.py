"""RoIAlign separable second-contraction geometry probe (round 5).

At detect bs16 the separable RoIAlign is 41% of wall (34.4 ms/batch,
dtype-flat, ~4% MFU on its own einsums — tools/profile_detect.py).
Round 4 concluded "scheduling/launch floor of the two einsums"
(DESIGN §6c) after falsifying the fused-VMEM and bf16-intermediate
candidates. This probe attacks the remaining suspect: the SECOND
contraction runs as R=256 batched GEMMs with M=out=14 — 14/128 MXU rows.

Variants (all parity-gated against the shipped sep):
  sep      — shipped two-einsum (ops/roi_align.py:218)
  sepT     — second contraction transposed: per-r (i*c, w) @ (w, j),
             large-M small-N instead of small-M large-N
  sep1     — one jnp.einsum("rih,rjw,hwc->rijc") letting XLA pick the
             full contraction path
  sepflip  — wx contracted against F first (symmetric association)

Usage: python tools/bench_roialign_sep2.py [--batch 16] [--rounds 5]
Prints one JSON line.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--batch", type=int, default=16)
    parser.add_argument("--rounds", type=int, default=5)
    parser.add_argument("--iters", type=int, default=4)
    parser.add_argument("--cpu", action="store_true")
    args = parser.parse_args()
    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")
    import jax
    import jax.numpy as jnp

    from tspn_tpu.ops.roi_align import _pooled_axis_weights, roi_align_separable

    h = w = 40
    c = 1024
    r_count = 256
    out, s = 14, 2
    b = args.batch

    rng = np.random.RandomState(0)
    feats = jnp.asarray(rng.randn(b, h, w, c).astype(np.float32))
    boxes_np = np.stack([
        np.stack([
            rng.uniform(0, w - 8, r_count),
            rng.uniform(0, h - 8, r_count),
        ], axis=1)
        for _ in range(b)
    ])
    wh_np = rng.uniform(4, 30, (b, r_count, 2))
    boxes = jnp.asarray(
        np.concatenate([boxes_np, boxes_np + wh_np], axis=2).astype(np.float32)
    )

    def tables(lo, extent, size):
        bin_of = jnp.arange(out)[:, None]
        coords = jnp.arange(size)[None, :]
        fn = _pooled_axis_weights(
            lo[:, None, None], extent[:, None, None], size, out, s,
            coords[None],
        )
        return sum(fn(bin_of[None], a) for a in range(s))

    def make_tables(bx):
        lo_x = bx[:, 0] - 0.5
        lo_y = bx[:, 1] - 0.5
        bw = jnp.clip(bx[:, 2] - bx[:, 0], 1e-6)
        bh = jnp.clip(bx[:, 3] - bx[:, 1], 1e-6)
        return tables(lo_y, bh, h), tables(lo_x, bw, w)

    def sep(f1, bx):
        return roi_align_separable(f1, bx, out, s)

    def sepT(f1, bx):
        wy, wx = make_tables(bx)
        tmp = jnp.einsum("rih,hwc->riwc", wy, f1)         # shared-F GEMM
        # transposed per-r GEMM: (i*c, w) @ (w, j) — large M, N=14
        tmp2 = tmp.transpose(0, 1, 3, 2).reshape(r_count, out * c, w)
        o = jnp.einsum("rmw,rjw->rmj", tmp2, wx)          # (R, i*c, j)
        o = o.reshape(r_count, out, c, out).transpose(0, 1, 3, 2)
        return o * (1.0 / (s * s))

    def sep1(f1, bx):
        wy, wx = make_tables(bx)
        o = jnp.einsum("rih,rjw,hwc->rijc", wy, wx, f1)
        return o * (1.0 / (s * s))

    def sepflip(f1, bx):
        wy, wx = make_tables(bx)
        tmp = jnp.einsum("rjw,hwc->rjhc", wx, f1)
        o = jnp.einsum("rih,rjhc->rijc", wy, tmp)
        return o * (1.0 / (s * s))

    variants = {"sep": sep, "sepT": sepT, "sep1": sep1, "sepflip": sepflip}

    # parity gate (single image). IMPORTANT: under DEFAULT matmul
    # precision the backend contracts f32 einsums through bf16 passes,
    # so different association orders differ by ~0.7% — measured, and
    # verified symbolically identical in float64. Gate under "highest"
    # precision where true-f32 reassociation noise is ~1e-6.
    with jax.default_matmul_precision("highest"):
        refv = np.asarray(jax.jit(sep)(feats[0], boxes[0]))
        for name, fn in variants.items():
            got = np.asarray(jax.jit(fn)(feats[0], boxes[0]))
            err = float(np.abs(got - refv).max())
            assert err < 1e-3, (name, err)

    # timed legs in bf16 (the detect hot path's dtype; also halves the
    # (R, out, W, C) intermediates so four compiled variants fit HBM at
    # batch 16 — f32 would need ~9.4 GB live per program)
    feats16 = feats.astype(jnp.bfloat16)
    legs = {}
    for name, fn in variants.items():
        jf = jax.jit(
            lambda f1, bx, tag, carry, fn=fn: jnp.sum(
                jax.vmap(fn)(
                    f1 + (1e-3 * (tag + carry)).astype(jnp.bfloat16), bx
                ).astype(jnp.float32)
            ) * 1e-9
        )

        def leg(tag, carry, jf=jf):
            return jf(feats16, boxes, jnp.float32(tag), carry)

        legs[name] = (leg, args.iters)

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)) + "/..")
    from bench import _time_interleaved

    t = _time_interleaved(legs, rounds=args.rounds, warmup=2)
    res = {"metric": "roialign_sep2_probe", "batch": b}
    for name in variants:
        ts = np.asarray(t[name]) * 1000
        lo, hi = np.percentile(ts, [25, 75])
        res[f"{name}_ms"] = round(float(np.median(ts)), 2)
        res[f"{name}_iqr_ms"] = [round(float(lo), 2), round(float(hi), 2)]
    print(json.dumps(res))


if __name__ == "__main__":
    main()
