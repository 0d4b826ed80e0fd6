"""Stepwise isolation probe for the rel-pass q8s-vs-raw gap (round 3c).

Legs (cumulative deltas from the raw int8 matmul kernel):
  v0_raw      int32 out, no sidecar, vmem_limit 100MB
  v1_f32      + f32 out with per-column scale & bias
  v2_side16   + per-row scale from a (P, 16) f32 sidecar block
  v3_side128  as v2 but sidecar host-padded to (P, 128)
  v4_q8s      the production normalize_classify_q8s_pallas (rel geom)
  v5_vmem     as v2 but DEFAULT vmem limit (no CompilerParams)

Usage: python tools/bench_rel_steps.py
"""

from __future__ import annotations

import time
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

D = 3072
RP = 256


def _time_interleaved(legs, rounds=5, warmup=2):
    for name in list(legs):
        step_fn, _ = legs[name]
        carry = jnp.float32(0.0)
        try:
            for i in range(warmup):
                carry = step_fn(float(i + 1), carry)
            _ = float(np.asarray(carry))
        except Exception as e:  # noqa: BLE001
            print(f"  {name}: FAILED ({type(e).__name__}: {str(e)[:140]})")
            del legs[name]
    per_leg = {name: [] for name in legs}
    tag = 100.0
    for _r in range(rounds):
        for name, (step_fn, iters) in legs.items():
            carry = jnp.float32(0.0)
            start = time.perf_counter()
            for _i in range(iters):
                carry = step_fn(tag, carry)
                tag += 1.0
            _ = float(np.asarray(carry))
            per_leg[name].append((time.perf_counter() - start) / iters)
    return {name: np.asarray(ts) for name, ts in per_leg.items()}


def _k_raw(x_ref, w_ref, o_ref):
    o_ref[:] = jax.lax.dot_general(
        x_ref[...], w_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32)


def _k_f32(x_ref, w_ref, swb_ref, o_ref):
    acc = jax.lax.dot_general(
        x_ref[...], w_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32)
    o_ref[:] = acc.astype(jnp.float32) * swb_ref[0:1, :] + swb_ref[1:2, :]


def _k_side(x_ref, s_ref, w_ref, swb_ref, o_ref):
    acc = jax.lax.dot_general(
        x_ref[...], w_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32)
    accf = acc.astype(jnp.float32) * s_ref[:, 0:1]
    o_ref[:] = accf * swb_ref[0:1, :] + swb_ref[1:2, :]


def make_call(mode, row_tile, vmem=True, cost=False, side_w=16):
    cp = (pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024)
          if vmem else None)

    def call(x, s, w, swb):
        p = x.shape[0]
        n_tiles = p // row_tile
        kw = {}
        if cp is not None:
            kw["compiler_params"] = cp
        if cost:
            kw["cost_estimate"] = pl.CostEstimate(
                flops=2 * p * D * RP,
                bytes_accessed=p * D + p * side_w * 4 + D * RP + p * RP * 4,
                transcendentals=0)
        if mode == "raw":
            return pl.pallas_call(
                _k_raw,
                out_shape=jax.ShapeDtypeStruct((p, RP), jnp.int32),
                grid=(n_tiles,),
                in_specs=[
                    pl.BlockSpec((row_tile, D), lambda i: (i, 0)),
                    pl.BlockSpec((D, RP), lambda i: (0, 0)),
                ],
                out_specs=pl.BlockSpec((row_tile, RP), lambda i: (i, 0)),
                **kw)(x, w)
        if mode == "f32":
            return pl.pallas_call(
                _k_f32,
                out_shape=jax.ShapeDtypeStruct((p, RP), jnp.float32),
                grid=(n_tiles,),
                in_specs=[
                    pl.BlockSpec((row_tile, D), lambda i: (i, 0)),
                    pl.BlockSpec((D, RP), lambda i: (0, 0)),
                    pl.BlockSpec((2, RP), lambda i: (0, 0)),
                ],
                out_specs=pl.BlockSpec((row_tile, RP), lambda i: (i, 0)),
                **kw)(x, w, swb)
        return pl.pallas_call(
            _k_side,
            out_shape=jax.ShapeDtypeStruct((p, RP), jnp.float32),
            grid=(n_tiles,),
            in_specs=[
                pl.BlockSpec((row_tile, D), lambda i: (i, 0)),
                pl.BlockSpec((row_tile, side_w), lambda i: (i, 0)),
                pl.BlockSpec((D, RP), lambda i: (0, 0)),
                pl.BlockSpec((2, RP), lambda i: (0, 0)),
            ],
            out_specs=pl.BlockSpec((row_tile, RP), lambda i: (i, 0)),
            **kw)(x, s, w, swb)

    return call


def main():
    import argparse
    ap = argparse.ArgumentParser()
    ap.add_argument("--legs", default="v0,v1,v2,v3,v4,v5")
    args = ap.parse_args()
    want = set(args.legs.split(","))
    from tspn_tpu.ops.pairwise import (
        normalize_classify_q8s_pallas, rel_geom,
    )

    p_total = 96 * 32 * 31  # 95232 = 93 * 1024
    row_tile = 1024
    print(f"pairs/dispatch: {p_total}  D={D} RP={RP} tile={row_tile}")

    rng = np.random.RandomState(0)
    w8 = jnp.asarray(rng.randint(-127, 128, (D, RP)).astype(np.int8))
    x8 = jax.jit(
        lambda k: (jax.random.bits(k, (p_total, D), jnp.uint8) & 0x7F)
        .astype(jnp.int8))(jax.random.PRNGKey(1))
    s16 = (jax.random.uniform(jax.random.PRNGKey(2), (p_total, 16),
                              jnp.float32) * 0.01 + 1e-4)
    s128 = jnp.zeros((p_total, 128), jnp.float32).at[:, :16].set(s16)
    s128 = jax.block_until_ready(s128)
    swb = jnp.concatenate([
        jnp.asarray(rng.rand(1, RP).astype(np.float32) * 0.01),
        jnp.zeros((1, RP), jnp.float32)], axis=0)
    sw132 = jnp.asarray(rng.rand(132).astype(np.float32) * 0.01)
    b132 = jnp.zeros((132,), jnp.float32)

    legs = {}
    c0 = make_call("raw", row_tile)

    @jax.jit
    def v0_step(x, w, tag, carry):
        wi = (w + (tag + carry).astype(jnp.int8)).astype(jnp.int8)
        return jnp.max(c0(x, None, wi, None)).astype(jnp.float32)
    legs["v0_raw"] = (lambda tag, cr: v0_step(x8, w8, jnp.float32(tag), cr),
                      20)
    c1 = make_call("f32", row_tile)

    @jax.jit
    def v1_step(x, w, swb_, tag, carry):
        swi = swb_.at[0].mul(1.0 + 1e-6 * (tag + carry))
        return jnp.max(c1(x, None, w, swi))
    legs["v1_f32"] = (lambda tag, cr: v1_step(x8, w8, swb, jnp.float32(tag),
                                              cr), 20)

    c2 = make_call("side", row_tile, side_w=16)

    @jax.jit
    def v2_step(x, s, w, swb_, tag, carry):
        swi = swb_.at[0].mul(1.0 + 1e-6 * (tag + carry))
        return jnp.max(c2(x, s, w, swi))
    legs["v2_side16"] = (lambda tag, cr: v2_step(x8, s16, w8, swb,
                                                 jnp.float32(tag), cr), 20)

    c3 = make_call("side", row_tile, side_w=128)

    @jax.jit
    def v3_step(x, s, w, swb_, tag, carry):
        swi = swb_.at[0].mul(1.0 + 1e-6 * (tag + carry))
        return jnp.max(c3(x, s, w, swi))
    legs["v3_side128"] = (lambda tag, cr: v3_step(x8, s128, w8, swb,
                                                  jnp.float32(tag), cr), 20)

    @jax.jit
    def v4_step(x, s, w, sw_, b_, tag, carry):
        swi = sw_ * (1.0 + 1e-6 * (tag + carry))
        out = normalize_classify_q8s_pallas(
            x, s, w, swi, b_, row_tile=row_tile, layout=rel_geom())
        return jnp.max(out)
    legs["v4_q8s"] = (lambda tag, cr: v4_step(
        x8, s16, w8[:, :132], sw132, b132, jnp.float32(tag), cr), 20)

    c5 = make_call("side", row_tile, vmem=False, side_w=16)

    @jax.jit
    def v5_step(x, s, w, swb_, tag, carry):
        swi = swb_.at[0].mul(1.0 + 1e-6 * (tag + carry))
        return jnp.max(c5(x, s, w, swi))
    legs["v5_vmem"] = (lambda tag, cr: v5_step(x8, s16, w8, swb,
                                               jnp.float32(tag), cr), 20)

    c6 = make_call("side", row_tile, side_w=16)

    @jax.jit
    def v6_step(x, s, w, swb_, tag, carry):
        swi = swb_.at[0].mul(1.0 + 1e-6 * (tag + carry))
        out = c6(x, s, w, swi)
        return jnp.max(out[:, :132])
    legs["v6_slice"] = (lambda tag, cr: v6_step(x8, s16, w8, swb,
                                                jnp.float32(tag), cr), 20)

    c7 = make_call("side", row_tile, side_w=16)

    @jax.jit
    def v7_step(x, s, w132, sw_, b_, tag, carry):
        swi = sw_ * (1.0 + 1e-6 * (tag + carry))
        wp = jnp.zeros((D, RP), jnp.int8).at[:, :132].set(w132)
        swb_ = jnp.concatenate([
            jnp.zeros((1, RP), jnp.float32).at[0, :132].set(swi),
            jnp.zeros((1, RP), jnp.float32).at[0, :132].set(b_)], axis=0)
        out = c7(x, s, wp, swb_)
        return jnp.max(out)
    legs["v7_wpad"] = (lambda tag, cr: v7_step(
        x8, s16, w8[:, :132], sw132, b132, jnp.float32(tag), cr), 20)

    legs = {k: v for k, v in legs.items() if k.split("_")[0] in want}
    t = _time_interleaved(legs, rounds=5)
    for name, ts in t.items():
        med = np.median(ts)
        print(f"{name:11s}: {med*1e3:7.2f} ms  {p_total/med/1e6:6.1f} Mpairs/s"
              f"  (iqr {p_total/np.percentile(ts,75)/1e6:.1f}-"
              f"{p_total/np.percentile(ts,25)/1e6:.1f})")


if __name__ == "__main__":
    main()
