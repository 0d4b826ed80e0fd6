"""Probe harness for the FACTORED rel pass (the round-3 headline's
dominant leg): candidate kernel formulations measured in interleaved
rounds in ONE process (memory: axon-tpu-quirks — sequential A-then-B
across processes cannot rank variants on the tunneled chip).

Legs:
  q8s_<tile>   current normalize_classify_q8s_pallas over rel geometry
  raw_<tile>   int8 matmul only, no sidecar, int32 out  (upper bound)
  mdma_<tile>  manual multi-buffered DMA kernel (N_BUF slots)
  nib_<tile>   nibble-packed int4 features, in-kernel unpack + int8 MXU
  int4_<tile>  native jnp.int4 feature ref (if Mosaic supports it)

Usage: python tools/bench_rel_probe.py [--legs q8s,raw,mdma,nib]
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

D = 3072      # rel device width
RP = 256      # padded predicate lanes
N_BUF = 4


def _time_interleaved(legs, rounds=5, warmup=2):
    for name, (step_fn, _) in legs.items():
        carry = jnp.float32(0.0)
        try:
            for i in range(warmup):
                carry = step_fn(float(i + 1), carry)
            _ = float(np.asarray(carry))
        except Exception as e:  # noqa: BLE001
            print(f"  {name}: FAILED ({type(e).__name__}: {str(e)[:140]})")
            legs[name] = None
    legs = {k: v for k, v in legs.items() if v is not None}
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


# ---------------------------------------------------------------- kernels

def _kernel_raw(x_ref, w_ref, o_ref):
    o_ref[:] = jax.lax.dot_general(
        x_ref[...], w_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )


def raw_call(x, w, row_tile):
    p = x.shape[0]
    return pl.pallas_call(
        _kernel_raw,
        out_shape=jax.ShapeDtypeStruct((p, RP), jnp.int32),
        grid=(p // row_tile,),
        in_specs=[
            pl.BlockSpec((row_tile, D), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((D, RP), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((row_tile, RP), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
    )(x, w)


def _kernel_mdma(x_hbm, w_ref, o_hbm, xbuf, obuf, xsem, osem, *, row_tile,
                 n_tiles):
    def xdma(slot, t):
        return pltpu.make_async_copy(
            x_hbm.at[pl.ds(t * row_tile, row_tile), :], xbuf.at[slot],
            xsem.at[slot])

    def odma(slot, t):
        return pltpu.make_async_copy(
            obuf.at[slot], o_hbm.at[pl.ds(t * row_tile, row_tile), :],
            osem.at[slot])

    for s in range(N_BUF):
        xdma(s, s).start()

    def body(t, _):
        slot = jax.lax.rem(t, N_BUF)
        xdma(slot, t).wait()

        @pl.when(t >= N_BUF)
        def _():
            odma(slot, t - N_BUF).wait()

        obuf[slot] = jax.lax.dot_general(
            xbuf[slot], w_ref[...], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        )
        odma(slot, t).start()

        @pl.when(t + N_BUF < n_tiles)
        def _():
            xdma(slot, t + N_BUF).start()

        return 0

    jax.lax.fori_loop(0, n_tiles, body, 0)
    for s in range(N_BUF):
        t_last = n_tiles - N_BUF + s
        @pl.when(t_last >= 0)
        def _():
            odma(jax.lax.rem(t_last, N_BUF), t_last).wait()


def mdma_call(x, w, row_tile):
    p = x.shape[0]
    n_tiles = p // row_tile
    return pl.pallas_call(
        partial(_kernel_mdma, row_tile=row_tile, n_tiles=n_tiles),
        out_shape=jax.ShapeDtypeStruct((p, RP), jnp.int32),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec((D, RP), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.ANY),
        scratch_shapes=[
            pltpu.VMEM((N_BUF, row_tile, D), jnp.int8),
            pltpu.VMEM((N_BUF, row_tile, RP), jnp.int32),
            pltpu.SemaphoreType.DMA((N_BUF,)),
            pltpu.SemaphoreType.DMA((N_BUF,)),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=110 * 1024 * 1024),
    )(x, w)


def _kernel_nib(x_ref, we_ref, wo_ref, o_ref):
    """Nibble-packed int4: even cols in low nibble vs W_even, odd cols
    in high nibble vs W_odd — no interleave relayout needed."""
    packed = x_ref[...]                      # (T, D//2) int8: two nibbles
    hi = jax.lax.shift_right_arithmetic(packed, jnp.int8(4))
    lo = jax.lax.shift_right_arithmetic(
        jax.lax.shift_left(packed, jnp.int8(4)), jnp.int8(4))

    def idot(a, w):
        return jax.lax.dot_general(
            a, w, (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32)

    o_ref[:] = idot(lo, we_ref[...]) + idot(hi, wo_ref[...])


def nib_call(xp, we, wo, row_tile):
    p = xp.shape[0]
    return pl.pallas_call(
        _kernel_nib,
        out_shape=jax.ShapeDtypeStruct((p, RP), jnp.int32),
        grid=(p // row_tile,),
        in_specs=[
            pl.BlockSpec((row_tile, D // 2), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((D // 2, RP), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((D // 2, RP), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((row_tile, RP), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
    )(xp, we, wo)


def _kernel_mdma_full(x_hbm, s_hbm, w_ref, sw_ref, b_ref, o_hbm,
                      xbuf, sbuf, obuf, xsem, ssem, osem, *, row_tile,
                      n_tiles):
    """Manual multi-buffer DMA with the FULL q8s rel semantics: sidecar
    row scale + per-column weight scale + bias, f32 out."""
    def xdma(slot, t):
        return pltpu.make_async_copy(
            x_hbm.at[pl.ds(t * row_tile, row_tile), :], xbuf.at[slot],
            xsem.at[slot])

    def sdma(slot, t):
        return pltpu.make_async_copy(
            s_hbm.at[pl.ds(t * row_tile, row_tile), :], sbuf.at[slot],
            ssem.at[slot])

    def odma(slot, t):
        return pltpu.make_async_copy(
            obuf.at[slot], o_hbm.at[pl.ds(t * row_tile, row_tile), :],
            osem.at[slot])

    for s in range(N_BUF):
        xdma(s, s).start()
        sdma(s, s).start()

    def body(t, _):
        slot = jax.lax.rem(t, N_BUF)
        xdma(slot, t).wait()
        sdma(slot, t).wait()

        @pl.when(t >= N_BUF)
        def _():
            odma(slot, t - N_BUF).wait()

        acc = jax.lax.dot_general(
            xbuf[slot], w_ref[...], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        ).astype(jnp.float32) * sbuf[slot][:, 0:1]
        obuf[slot] = acc * sw_ref[...] + b_ref[...]
        odma(slot, t).start()

        @pl.when(t + N_BUF < n_tiles)
        def _():
            xdma(slot, t + N_BUF).start()
            sdma(slot, t + N_BUF).start()

        return 0

    jax.lax.fori_loop(0, n_tiles, body, 0)
    for s in range(N_BUF):
        t_last = n_tiles - N_BUF + s
        @pl.when(t_last >= 0)
        def _():
            odma(jax.lax.rem(t_last, N_BUF), t_last).wait()


def mdma_full_call(x, s, w, sw, b, row_tile):
    p = x.shape[0]
    n_tiles = p // row_tile
    return pl.pallas_call(
        partial(_kernel_mdma_full, row_tile=row_tile, n_tiles=n_tiles),
        out_shape=jax.ShapeDtypeStruct((p, RP), jnp.float32),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec((D, RP), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, RP), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, RP), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.ANY),
        scratch_shapes=[
            pltpu.VMEM((N_BUF, row_tile, D), jnp.int8),
            pltpu.VMEM((N_BUF, row_tile, 16), jnp.float32),
            pltpu.VMEM((N_BUF, row_tile, RP), jnp.float32),
            pltpu.SemaphoreType.DMA((N_BUF,)),
            pltpu.SemaphoreType.DMA((N_BUF,)),
            pltpu.SemaphoreType.DMA((N_BUF,)),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=110 * 1024 * 1024),
    )(x, s, w, sw, b)


def _kernel_i4(x_ref, w_ref, o_ref):
    o_ref[:] = jax.lax.dot_general(
        x_ref[...].astype(jnp.int8), w_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )


def i4_call(x4, w, row_tile):
    p = x4.shape[0]
    return pl.pallas_call(
        _kernel_i4,
        out_shape=jax.ShapeDtypeStruct((p, RP), jnp.int32),
        grid=(p // row_tile,),
        in_specs=[
            pl.BlockSpec((row_tile, D), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((D, RP), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((row_tile, RP), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
    )(x4, w)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--legs", default="q8s,raw,mdma,nib,int4")
    ap.add_argument("--tiles", default="512,1024")
    ap.add_argument("--segments", type=int, default=96)
    ap.add_argument("--rounds", type=int, default=5)
    args = ap.parse_args()
    want = set(args.legs.split(","))
    tiles = [int(t) for t in args.tiles.split(",")]

    from tspn_tpu.ops.pairwise import (
        normalize_classify_q8s_pallas,
        rel_geom,
    )

    p_total = args.segments * 32 * 31  # 95232 at 96 segments
    p_pad = (p_total + 2047) // 2048 * 2048
    print(f"pairs/dispatch: {p_total} (padded {p_pad})  D={D} RP={RP}")

    rng = np.random.RandomState(0)
    w8 = jnp.asarray(rng.randint(-127, 128, (D, RP)).astype(np.int8))
    x8 = jax.jit(
        lambda k: (jax.random.bits(k, (p_pad, D), jnp.uint8) & 0x7F)
        .astype(jnp.int8)
    )(jax.random.PRNGKey(1))
    scales = (
        jax.random.uniform(jax.random.PRNGKey(2), (p_total, 16), jnp.float32)
        * 0.01 + 1e-4
    )
    sw = jnp.asarray(rng.rand(RP).astype(np.float32) * 0.01)
    b = jnp.zeros((RP,), jnp.float32)
    # nibble-packed: even col in low nibble, odd col in high nibble
    x8_np = np.asarray(x8, np.int8).astype(np.int32)
    lo = np.clip(x8_np[:, 0::2], -8, 7)
    hi = np.clip(x8_np[:, 1::2], -8, 7)
    xp = jnp.asarray(((hi << 4) | (lo & 0xF)).astype(np.int8))
    try:
        x4 = jnp.asarray(np.clip(x8_np, -8, 7), jnp.int4)
    except Exception as e:  # noqa: BLE001
        print(f"int4 array creation failed: {e}")
        x4 = None

    legs = {}
    for tile in tiles:
        if "q8s" in want:
            @jax.jit
            def q8s_step(x, s, w_, sw_, b_, tag, carry, _t=tile):
                swi = sw_ * (1.0 + 1e-6 * (tag + carry))
                out = normalize_classify_q8s_pallas(
                    x, s, w_, swi, b_, row_tile=_t, layout=rel_geom())
                return jnp.max(out)

            legs[f"q8s_{tile}"] = (
                lambda tag, c, f=q8s_step: f(
                    x8[:p_total, :], scales, w8[:, :132], sw[:132], b[:132],
                    jnp.float32(tag), c),
                20,
            )
        if "mdma_full" in want:
            @jax.jit
            def mf_step(x, s, w_, sw_, b_, tag, carry, _t=tile):
                swi = (sw_ * (1.0 + 1e-6 * (tag + carry))).reshape(1, RP)
                out = mdma_full_call(x, s, w_, swi, b_.reshape(1, RP), _t)
                return jnp.max(out)

            legs[f"mdma_full_{tile}"] = (
                lambda tag, c, f=mf_step: f(
                    x8[:p_total, :], scales, w8, sw, b, jnp.float32(tag), c),
                20,
            )
        if "nib" in want:
            @jax.jit
            def nib_step(x, we_, wo_, tag, carry, _t=tile):
                wei = (we_ + (tag + carry).astype(jnp.int8)).astype(jnp.int8)
                out = nib_call(x, wei, wo_, _t)
                return jnp.max(out).astype(jnp.float32)

            legs[f"nib_{tile}"] = (
                lambda tag, c, f=nib_step: f(
                    xp, w8[0::2, :], w8[1::2, :], jnp.float32(tag), c),
                20,
            )
        for nm, call, xin in (
            ("raw", raw_call, x8),
            ("mdma", mdma_call, x8),
            ("int4", i4_call, x4),
        ):
            if nm not in want or xin is None:
                continue

            @jax.jit
            def step(x, w_, tag, carry, _call=call, _t=tile):
                wi = (w_ + (tag + carry).astype(jnp.int8)).astype(jnp.int8)
                out = _call(x, wi, _t)
                return jnp.max(out).astype(jnp.float32)

            legs[f"{nm}_{tile}"] = (
                lambda tag, c, f=step, xi=xin: f(xi, w8, jnp.float32(tag), c),
                20,
            )

    t = _time_interleaved(legs, rounds=args.rounds)
    for name, ts in t.items():
        med = np.median(ts)
        gbs = p_total * D / med / 1e9
        if name.startswith(("nib", "int4")):
            gbs /= 2
        print(
            f"{name:12s}: {med*1e3:7.2f} ms  {p_total/med/1e6:6.1f} Mpairs/s"
            f"  ~{gbs:5.0f} GB/s feat  (iqr"
            f" {p_total/np.percentile(ts,75)/1e6:.1f}-"
            f"{p_total/np.percentile(ts,25)/1e6:.1f})"
        )


if __name__ == "__main__":
    main()
