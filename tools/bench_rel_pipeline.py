"""Pipelining probe for the factored rel pass (round 3d).

DESIGN.md §7 round 3: the rel pass (the factored path's throughput
term — (P, 3072) int8 x (3072, 256) int8 -> (P, 256) f32) measures
~1.6x the SERIAL sum of its per-step DMA and MXU times, i.e. the
default pallas_call grid pipeline neither overlaps nor saturates.
With ideal double buffering the step should cost ~max(DMA, MXU)
— ~3x headroom. These legs isolate schedule-level levers that need
no kernel rewrite, plus a manual emit_pipeline rewrite:

  p0_q8s    production normalize_classify_q8s_pallas (rel geometry)
  p1_par    + dimension_semantics=("parallel",) (grid steps declared
            independent; Mosaic may reorder/overlap)
  p2_buf3   + pl.Buffered(buffer_count=3) on the streamed row input
  p3_buf4   + buffer_count=4 with lookahead
  p4_xla    NO pallas: plain XLA int8 dot_general (preferred int32)
            with the f32 scale/bias epilogue — XLA's own matmul
            pipeline is the thing the custom kernel must beat
  p5_emit   manual pltpu.emit_pipeline over row tiles inside one
            kernel invocation (grid=(1,)): explicit inner pipeline
  p6/p7     k-split: grid=(row_tiles, 2|4) halves/quarters the
            contraction per step (int32 scratch accumulator, bit-exact)
            — finer DMA granularity than the row-only grid (round 4,
            VERDICT r3 item 7)

MEASURED (round 3e, DESIGN.md §7): p1 no gain; p2/p3 unsupported by
this toolchain (only single/double buffering); p5 needs the scale
sidecar block padded to 128 lanes (narrow blocks crash the Mosaic
remote compiler inside emit_pipeline) and cannot run under CPU
interpret. Decisive 11-round interleaved run: p0 40.2 / p4 39.9 /
p5 37.9 Mpairs/s, IQRs overlapping — three independent schedules
converge at the same rate, so the schedule-level levers are
exhausted for this shape.

All legs compute the SAME math (parity-checked at startup against the
XLA oracle) under the chained-unique protocol (memory:
axon-tpu-quirks) and are measured in interleaved rounds with per-leg
medians (tunnel load swings make sequential timing useless).

Usage: python tools/bench_rel_pipeline.py [--small] [--legs p0,p4,...]
       --small: tiny shapes + CPU interpret (correctness only)
"""

from __future__ import annotations

import argparse
import time
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

D = 3072
RP = 256


def _interp():
    return jax.default_backend() == "cpu"


def _kernel(x_ref, s_ref, w_ref, sw_ref, b_ref, o_ref):
    """The rel-geometry q8s body: one int8 MXU pass + f32 epilogue."""
    acc = jax.lax.dot_general(
        x_ref[...], w_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    o_ref[:] = (
        acc.astype(jnp.float32) * s_ref[:, 0:1] * sw_ref[:] + b_ref[:]
    )


def make_grid_call(row_tile, *, parallel=False, buffers=None,
                   lookahead=False):
    """pallas_call over a row grid; optional schedule hints."""
    kw = {}
    if parallel:
        kw["compiler_params"] = pltpu.CompilerParams(
            dimension_semantics=("parallel",)
        )
    x_mode = (
        pl.Buffered(buffer_count=buffers, use_lookahead=lookahead)
        if buffers else None
    )

    def call(x, s, w, sw, b):
        p = x.shape[0]
        n_tiles = -(-p // row_tile)
        return pl.pallas_call(
            _kernel,
            out_shape=jax.ShapeDtypeStruct((p, RP), jnp.float32),
            grid=(n_tiles,),
            in_specs=[
                pl.BlockSpec((row_tile, D), lambda i: (i, 0),
                             pipeline_mode=x_mode,
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((row_tile, 16), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((D, RP), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, RP), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, RP), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((row_tile, RP), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM),
            interpret=_interp(),
            **kw,
        )(x, s, w, sw.reshape(1, RP), b.reshape(1, RP))

    return call


def xla_rel(x, s, w, sw, b):
    """Plain XLA: int8 matmul on the MXU integer path + fused epilogue."""
    acc = jax.lax.dot_general(
        x, w, (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32
    )
    return acc.astype(jnp.float32) * s[:, 0:1] * sw[None, :] + b[None, :]


def make_emit_call(row_tile, buffers=2):
    """grid=(1,) pallas_call whose body runs pltpu.emit_pipeline over
    row tiles; x/s/out stay in HBM (pl.ANY) and the inner pipeline DMAs
    tiles itself. The scale sidecar is padded to a 128-lane block:
    narrow (rows, 16) blocks crash the Mosaic remote compiler inside
    emit_pipeline on this toolchain (round 3e). buffers>2 is likewise
    unsupported ("Only single (1) and double (2) buffering")."""

    def body(x_hbm, s_hbm, w_ref, sw_ref, b_ref, o_hbm):
        def step(x_ref, s_ref, o_ref):
            _kernel(x_ref, s_ref, w_ref, sw_ref, b_ref, o_ref)

        p = x_hbm.shape[0]
        n_tiles = p // row_tile
        pipeline = pltpu.emit_pipeline(
            step,
            grid=(n_tiles,),
            in_specs=[
                pl.BlockSpec((row_tile, D), lambda i: (i, 0),
                             pipeline_mode=pl.Buffered(buffer_count=buffers)),
                pl.BlockSpec((row_tile, 128), lambda i: (i, 0)),
            ],
            out_specs=[pl.BlockSpec((row_tile, RP), lambda i: (i, 0))],
        )
        pipeline(x_hbm, s_hbm, o_hbm)

    def call(x, s, w, sw, b):
        p = x.shape[0]
        assert p % row_tile == 0
        s128 = jnp.pad(s, ((0, 0), (0, 128 - s.shape[1])))
        return pl.pallas_call(
            body,
            out_shape=jax.ShapeDtypeStruct((p, RP), jnp.float32),
            in_specs=[
                pl.BlockSpec(memory_space=pl.ANY),
                pl.BlockSpec(memory_space=pl.ANY),
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec(memory_space=pl.ANY),
            interpret=_interp(),
        )(x, s128, w, sw.reshape(1, RP), b.reshape(1, RP))

    return call


def make_ksplit_call(row_tile, ks=2):
    """grid=(row_tiles, ks): the 3072-wide contraction split into ks
    half/quarter passes with an int32 VMEM scratch accumulator (bit-exact
    — f32 accumulation would round: |acc| can exceed 2^24). Each grid
    step's x-DMA is D/ks wide, so DMA granularity halves/quarters while
    the MXU work per step shrinks the same way — finer-grained
    DMA/compute interleaving than the row-only grid (VERDICT r3 item 7's
    "1536-wide half-pass" experiment)."""
    dk = D // ks

    def kern(x_ref, s_ref, w_ref, sw_ref, b_ref, o_ref, acc_ref):
        k = pl.program_id(1)
        part = jax.lax.dot_general(
            x_ref[...], w_ref[...], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        )

        @pl.when(k == 0)
        def _init():
            acc_ref[...] = part

        @pl.when(k > 0)
        def _accum():
            acc_ref[...] = acc_ref[...] + part

        @pl.when(k == ks - 1)
        def _epilogue():
            o_ref[:] = (
                acc_ref[...].astype(jnp.float32) * s_ref[:, 0:1] * sw_ref[:]
                + b_ref[:]
            )

    def call(x, s, w, sw, b):
        p = x.shape[0]
        n_tiles = -(-p // row_tile)
        return pl.pallas_call(
            kern,
            out_shape=jax.ShapeDtypeStruct((p, RP), jnp.float32),
            grid=(n_tiles, ks),
            in_specs=[
                pl.BlockSpec((row_tile, dk), lambda i, k: (i, k),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((row_tile, 16), lambda i, k: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((dk, RP), lambda i, k: (k, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, RP), lambda i, k: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, RP), lambda i, k: (0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((row_tile, RP), lambda i, k: (i, 0),
                                   memory_space=pltpu.VMEM),
            scratch_shapes=[pltpu.VMEM((row_tile, RP), jnp.int32)],
            interpret=_interp(),
        )(x, s, w, sw.reshape(1, RP), b.reshape(1, RP))

    return call


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


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--legs", default="p0,p1,p2,p3,p4,p5,p6,p7")
    ap.add_argument("--small", action="store_true",
                    help="tiny shapes on CPU interpret (correctness only)")
    ap.add_argument("--rounds", type=int, default=5)
    ap.add_argument("--tile", type=int, default=1024)
    args = ap.parse_args()
    want = set(args.legs.split(","))

    if args.small:
        jax.config.update("jax_platforms", "cpu")

    p_total = 2048 if args.small else 96 * 32 * 31  # 95232 = 93 * 1024
    row_tile = min(args.tile, p_total)
    print(f"pairs/dispatch: {p_total}  D={D} RP={RP} tile={row_tile}"
          f"  backend={jax.default_backend()}")

    rng = np.random.RandomState(0)
    w8 = jnp.asarray(rng.randint(-127, 128, (D, RP)).astype(np.int8))
    x8 = jax.jit(
        lambda k: (jax.random.bits(k, (p_total, D), jnp.uint8) & 0x7F)
        .astype(jnp.int8))(jax.random.PRNGKey(1))
    s16 = (jax.random.uniform(jax.random.PRNGKey(2), (p_total, 16),
                              jnp.float32) * 0.01 + 1e-4)
    sw = jnp.asarray(rng.rand(RP).astype(np.float32) * 0.01)
    b = jnp.asarray(rng.rand(RP).astype(np.float32) * 0.1)

    calls = {
        "p0": ("q8s-grid", make_grid_call(row_tile)),
        "p1": ("parallel", make_grid_call(row_tile, parallel=True)),
        "p2": ("buf3", make_grid_call(row_tile, buffers=3)),
        "p3": ("buf4+la", make_grid_call(row_tile, buffers=4,
                                         lookahead=True)),
        "p4": ("xla-int8", xla_rel),
        "p5": ("emit-pipe", make_emit_call(row_tile)),
        "p6": ("ksplit2", make_ksplit_call(row_tile, ks=2)),
        "p7": ("ksplit4", make_ksplit_call(row_tile, ks=4)),
    }

    # parity gate: every leg must match the XLA oracle bit-for-bit
    # (identical op order: int32 matmul then the same f32 epilogue)
    ref = np.asarray(jax.jit(xla_rel)(x8, s16, w8, sw, b))
    for key, (label, call) in list(calls.items()):
        if key not in want:
            continue
        try:
            got = np.asarray(jax.jit(call)(x8, s16, w8, sw, b))
        except Exception as e:  # noqa: BLE001
            print(f"parity {label}: FAILED ({type(e).__name__}: "
                  f"{str(e)[:140]})")
            del calls[key]
            continue
        ok = np.array_equal(got, ref)
        print(f"parity {label}: {'bit-exact' if ok else 'MISMATCH'}"
              f" (max |d| {np.max(np.abs(got - ref)):.3g})")
        if not ok and not np.allclose(got, ref, rtol=1e-6, atol=1e-4):
            del calls[key]

    if args.small:
        return

    legs = {}
    for key, (label, call) in calls.items():
        if key not in want:
            continue
        cj = jax.jit(call)

        @partial(jax.jit, static_argnames=())
        def step(x, s, w, sw_, b_, tag, carry, _c=cj):
            swi = sw_ * (1.0 + 1e-6 * (tag + carry))
            return jnp.max(_c(x, s, w, swi, b_))

        legs[f"{key}_{label}"] = (
            lambda tag, cr, _s=step: _s(x8, s16, w8, sw, b,
                                        jnp.float32(tag), cr),
            20,
        )

    t = _time_interleaved(legs, rounds=args.rounds)
    for name, ts in t.items():
        med = np.median(ts)
        print(f"{name:14s}: {med*1e3:7.2f} ms  "
              f"{p_total/med/1e6:6.1f} Mpairs/s"
              f"  (iqr {p_total/np.percentile(ts,75)/1e6:.1f}-"
              f"{p_total/np.percentile(ts,25)/1e6:.1f})")


if __name__ == "__main__":
    main()
