"""Micro-bench: q8s (row-major) vs q8t (transposed) pair-scoring kernels
on the real chip, under the chained-unique protocol (bench.py / memory:
axon-tpu-quirks). Not part of bench.py — a tuning harness for DESIGN §7.

Usage: python tools/bench_pair_kernels.py [--tiles 256,512,1024]
"""

from __future__ import annotations

import argparse
import time

import jax
import jax.numpy as jnp
import numpy as np


def time_chained(step_fn, iters=50, repeats=5, warmup=3):
    carry = jnp.float32(0.0)
    for i in range(warmup):
        carry = step_fn(float(i + 1), carry)
    _ = float(np.asarray(carry))
    per_iter = []
    tag = 100.0
    for _ in range(repeats):
        start = time.perf_counter()
        for _ in range(iters):
            carry = step_fn(tag, carry)
            tag += 1.0
        _ = float(np.asarray(carry))
        per_iter.append((time.perf_counter() - start) / iters)
    return np.asarray(per_iter)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--tiles", default="256,512,1024")
    ap.add_argument("--segments", type=int, default=96)
    args = ap.parse_args()

    from tspn_tpu.data.feature_store import FEATURE_DIM
    from tspn_tpu.ops.pairwise import (
        DEVICE_DIM,
        _permutation,
        normalize_classify_q8s_pallas,
        normalize_classify_q8t_pallas,
        quantize_weights_percol,
        weights_to_device_layout,
    )

    num_predicates = 132
    pairs_per_seg = 32 * 31
    p_total = args.segments * pairs_per_seg
    print(f"pairs/dispatch: {p_total}")

    rng = np.random.RandomState(0)
    w = (rng.randn(FEATURE_DIM, num_predicates) * 0.01).astype(np.float32)
    b = np.zeros(num_predicates, np.float32)
    qw, sw = quantize_weights_percol(weights_to_device_layout(w))
    qw_dev, sw_dev = jnp.asarray(qw), jnp.asarray(sw)
    qwt_dev = jnp.asarray(np.ascontiguousarray(qw.T))
    b_dev = jax.device_put(b)

    col_valid_i8 = jnp.asarray((_permutation() >= 0), jnp.int8)
    key = jax.random.PRNGKey(0)

    # row-major features + (P, 16) scales
    mk_q8 = jax.jit(
        lambda k: (jax.random.bits(k, (p_total, DEVICE_DIM), jnp.uint8) & 0x7F)
        .astype(jnp.int8) * col_valid_i8
    )
    feats_q8 = mk_q8(key)
    scales = jnp.concatenate(
        [
            jax.random.uniform(jax.random.PRNGKey(1), (p_total, 9), jnp.float32)
            * 0.01 + 1e-4,
            jnp.zeros((p_total, 7), jnp.float32),
        ],
        axis=1,
    )
    # transposed copies (device-side transpose once, outside timing)
    feats_q8t = jnp.asarray(np.ascontiguousarray(np.asarray(feats_q8).T))
    scales_t = jnp.asarray(np.ascontiguousarray(np.asarray(scales).T))

    @jax.jit
    def q8s_step(x, s, qw_, sw_, b_, tag, carry):
        swi = sw_ * (1.0 + 1e-6 * (tag + carry))
        out = normalize_classify_q8s_pallas(x, s, qw_, swi, b_, row_tile=256)
        return jnp.max(out)

    t = time_chained(
        lambda tag, c: q8s_step(
            feats_q8, scales, qw_dev, sw_dev, b_dev, jnp.float32(tag), c
        )
    )
    print(
        f"q8s row_tile=256:   {np.median(t)*1e3:7.2f} ms  "
        f"{p_total/np.median(t)/1e6:6.1f} Mpairs/s  (iqr {p_total/np.percentile(t,75)/1e6:.1f}-{p_total/np.percentile(t,25)/1e6:.1f})"
    )

    # ---- probe variants: isolate what binds the transposed kernel.
    # Uniqueness + chain ride through the SMALL weight operand; the big
    # feature buffer is never perturbed (memory: axon-tpu-quirks).
    from functools import partial

    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    RP = 160

    def _mk_probe(mode, ct):
        def kern(x_ref, w_ref, o_ref):
            def idot(w, x):
                return jax.lax.dot_general(
                    w, x, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.int32,
                )
            if mode == "stream":  # one M=32 pass over the whole column
                o_ref[:32, :] = idot(w_ref[:32, :], x_ref[...])
                o_ref[32:, :] = jnp.zeros_like(o_ref[32:, :])
            elif mode == "onedot":  # single K=11264 dot, int32 out
                o_ref[:] = idot(w_ref[...], x_ref[...])
            elif mode == "blocks_noscale":  # 9 dots, int32 accumulate
                hp = 3072
                acc = idot(w_ref[:, :hp], x_ref[:hp, :])
                for k in range(8):
                    lo = hp + k * 1024
                    acc += idot(w_ref[:, lo:lo + 1024], x_ref[lo:lo + 1024, :])
                o_ref[:] = acc
            return None

        @jax.jit
        def run(x, w, tag, carry):
            wi = (w + (tag + carry).astype(jnp.int8)).astype(jnp.int8)
            d, p = x.shape
            out = pl.pallas_call(
                kern,
                out_shape=jax.ShapeDtypeStruct((RP, p), jnp.int32),
                grid=(p // ct,),
                in_specs=[
                    pl.BlockSpec((d, ct), lambda i: (0, i), memory_space=pltpu.VMEM),
                    pl.BlockSpec((RP, d), lambda i: (0, 0), memory_space=pltpu.VMEM),
                ],
                out_specs=pl.BlockSpec((RP, ct), lambda i: (0, i), memory_space=pltpu.VMEM),
                compiler_params=pltpu.CompilerParams(
                    vmem_limit_bytes=100 * 1024 * 1024
                ),
            )(x, wi)
            return jnp.max(out).astype(jnp.float32)

        return run

    wprobe = jnp.asarray(np.ones((RP, DEVICE_DIM), np.int8))
    for mode in ("stream", "onedot", "blocks_noscale"):
        for ct in (512, 1024):
            run = _mk_probe(mode, ct)
            t = time_chained(
                lambda tag, c: run(feats_q8t, wprobe, jnp.float32(tag), c)
            )
            gbs = p_total * DEVICE_DIM / np.median(t) / 1e9
            print(
                f"probe {mode:15s} ct={ct:5d}: {np.median(t)*1e3:7.2f} ms  "
                f"{p_total/np.median(t)/1e6:6.1f} Mpairs/s  {gbs:6.1f} GB/s"
            )

    for ct in [int(x) for x in args.tiles.split(",")]:

        @jax.jit
        def q8t_step(x, s, qw_, sw_, b_, tag, carry, _ct=ct):
            swi = sw_ * (1.0 + 1e-6 * (tag + carry))
            out = normalize_classify_q8t_pallas(
                x, s, qw_, swi, b_, col_tile=_ct
            )
            return jnp.max(out)

        try:
            t = time_chained(
                lambda tag, c: q8t_step(
                    feats_q8t, scales_t, qwt_dev, sw_dev, b_dev,
                    jnp.float32(tag), c,
                )
            )
        except Exception as e:  # noqa: BLE001 — VMEM overflow at big tiles
            print(f"q8t col_tile={ct}: FAILED ({type(e).__name__}: {str(e)[:120]})")
            continue
        print(
            f"q8t col_tile={ct:5d}: {np.median(t)*1e3:7.2f} ms  "
            f"{p_total/np.median(t)/1e6:6.1f} Mpairs/s  (iqr {p_total/np.percentile(t,75)/1e6:.1f}-{p_total/np.percentile(t,25)/1e6:.1f})"
        )


if __name__ == "__main__":
    main()
