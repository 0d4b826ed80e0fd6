"""Feasibility + throughput probe: int4 features for the factored rel
pass.

The rel pass is streaming-bound (DESIGN.md §7): pairs/s = achieved-BW /
bytes-per-pair. int4 rel rows would halve the dominant stream
(3072 B -> 1536 B/pair). This probe answers, on the real chip:

  1. does a Pallas int4 x int8 (or int4 x int4) dot_general compile and
     run through the Mosaic remote compiler at all?
  2. if so, what does the (P, 3072) x (3072, 256) pass measure vs the
     int8 kernel, interleaved?
  3. what is the quantization error vs f32 on realistic sparse
     BoW-like rows (max-abs per-row scaling, 7 levels vs 127)?

Usage: python tools/bench_rel_int4.py [--rows 95232] [--iters 10]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time
from functools import partial

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

D = 3072
RP = 256


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--rows", type=int, default=95232)
    parser.add_argument("--iters", type=int, default=10)
    parser.add_argument("--rounds", type=int, default=5)
    parser.add_argument("--row_tile", type=int, default=256)
    args = parser.parse_args()

    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl

    p, tile = args.rows, args.row_tile
    assert p % tile == 0

    def kernel(x_ref, w_ref, o_ref):
        o_ref[:] = jax.lax.dot_general(
            x_ref[:], w_ref[:], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        )

    def make_call(xdtype, wdtype):
        # tag/carry ride INSIDE the jit (unique content + dependency
        # chain per iteration — tunnel memoization, memory:
        # axon-tpu-quirks) so each iteration is ONE dispatch
        @jax.jit
        def call(x, w, tag, carry):
            w = w.at[0, 0].set(((tag + carry) % 127).astype(jnp.int8))
            out = pl.pallas_call(
                kernel,
                out_shape=jax.ShapeDtypeStruct((p, RP), jnp.int32),
                grid=(p // tile,),
                in_specs=[
                    pl.BlockSpec((tile, D), lambda i: (i, 0)),
                    pl.BlockSpec((D, RP), lambda i: (0, 0)),
                ],
                out_specs=pl.BlockSpec((tile, RP), lambda i: (i, 0)),
            )(x.astype(xdtype), w.astype(wdtype))
            return jnp.max(out)

        def full(x, w):  # correctness entry: full int32 output
            return pl.pallas_call(
                kernel,
                out_shape=jax.ShapeDtypeStruct((p, RP), jnp.int32),
                grid=(p // tile,),
                in_specs=[
                    pl.BlockSpec((tile, D), lambda i: (i, 0)),
                    pl.BlockSpec((D, RP), lambda i: (0, 0)),
                ],
                out_specs=pl.BlockSpec((tile, RP), lambda i: (i, 0)),
            )(x.astype(xdtype), w.astype(wdtype))

        return call, jax.jit(full)

    rng = np.random.RandomState(0)
    x8 = rng.randint(-7, 8, (p, D)).astype(np.int8)
    w8 = rng.randint(-127, 128, (D, RP)).astype(np.int8)

    out = {"metric": "rel_pass_int4_probe", "rows": p, "row_tile": tile}
    # correctness oracle: f64 BLAS matmul is EXACT here (|x|<=7, |w|<=127,
    # D=3072 -> |sum| < 2^23 << 2^53) and ~100x faster than numpy's
    # non-BLAS integer matmul on the 1-core host
    ref = (x8.astype(np.float64) @ w8.astype(np.float64)).astype(np.int64)
    # astype(int4) WRAPS (two's-complement truncation), not clamps
    w4 = ((w8.astype(np.int64) + 8) % 16) - 8
    ref4 = (x8.astype(np.float64) @ w4.astype(np.float64)).astype(np.int64)

    legs = {}
    x_dev, w_dev = jnp.asarray(x8), jnp.asarray(w8)
    for name, (xd, wd) in {
        "i8xi8": (jnp.int8, jnp.int8),
        "i4xi8": (jnp.int4, jnp.int8),
        "i4xi4": (jnp.int4, jnp.int4),
    }.items():
        t0 = time.perf_counter()
        try:
            call, full = make_call(xd, wd)
            got = np.asarray(full(x_dev, w_dev), np.int64)
            exact = bool((got == (ref4 if name == "i4xi4" else ref)).all())
            out[f"{name}_compiles"] = True
            out[f"{name}_exact"] = exact
            legs[name] = call
        except Exception as exc:  # noqa: BLE001
            out[f"{name}_compiles"] = False
            out[f"{name}_error"] = f"{type(exc).__name__}: {exc}"[:160]
        print(
            f"# {name}: compile+check {time.perf_counter() - t0:.1f}s "
            f"-> {out.get(f'{name}_compiles')}",
            file=sys.stderr, flush=True,
        )

    # interleaved timing with chained-unique content
    times = {name: [] for name in legs}
    for name, call in legs.items():  # warm the timing program
        _ = float(np.asarray(call(x_dev, w_dev, jnp.int32(0), jnp.int32(0))))
    tag = 1
    for r in range(args.rounds):
        for name, call in legs.items():
            carry = jnp.int32(0)
            t0 = time.perf_counter()
            for _i in range(args.iters):
                carry = call(x_dev, w_dev, jnp.int32(tag), carry)
                tag += 1
            _ = int(np.asarray(carry))
            times[name].append((time.perf_counter() - t0) / args.iters)
        print(f"# round {r + 1}/{args.rounds} done", file=sys.stderr,
              flush=True)

    for name, ts in times.items():
        med = float(np.median(ts))
        out[f"{name}_ms"] = round(med * 1e3, 2)
        out[f"{name}_mpairs_s"] = round(p / med / 1e6, 1)

    # int4 quantization error on realistic sparse BoW-like rows
    bow = rng.gamma(0.3, 1.0, (2048, D)).astype(np.float32)
    bow[rng.rand(2048, D) > 0.15] = 0  # ~85% sparse counts
    wf = rng.randn(D, 132).astype(np.float32) * 0.01
    y_true = (bow / np.maximum(bow.sum(1, keepdims=True), 1e-9)) @ wf
    for bits, lim in (("int8", 127), ("int4", 7)):
        s = np.maximum(np.abs(bow).max(1, keepdims=True), 1e-9) / lim
        q = np.clip(np.rint(bow / s), -lim, lim)
        deq = q * s
        y = (deq / np.maximum(deq.sum(1, keepdims=True), 1e-9)) @ wf
        err = np.abs(y - y_true).max() / (np.abs(y_true).max() + 1e-9)
        top_agree = float(
            (y.argmax(1) == y_true.argmax(1)).mean()
        )
        out[f"{bits}_rel_err"] = round(float(err), 4)
        out[f"{bits}_top1_agree"] = round(top_agree, 4)

    print(json.dumps(out))


if __name__ == "__main__":
    main()
