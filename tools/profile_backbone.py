"""Backbone substage breakdown + space-to-depth stem probe (round 4).

After the separable RoIAlign fix the backbone is detect's dominant
stage (~12-14 ms of ~28-32 at batch 4, DESIGN.md §6c) yet runs well
under the MXU roofline. This probe attributes the time across the
backbone's own stages — CUMULATIVE legs stem -> +res2 -> +res3 ->
+res4 (= full backbone) at f32 and bf16 — and measures the classic TPU
stem fix: a 2x2 space-to-depth rewrite of the 7x7/2 stem conv
((B,640,640,3) conv pads its 3-channel contraction dim to the MXU's
128 lanes, wasting ~98% of the systolic array; the s2d form contracts
over 4x4x12=192 rearranged taps instead). The rewrite is numerically
exact (kernel re-indexing, zero-padded taps) and parity-gated here on
the chip before timing.

Cites: reference backbone is detectron2 model-zoo R101-C4
(/root/reference/detectron/trainer.py:24-28); the s2d trick is the
standard MLPerf-TPU ResNet stem transformation.

Usage: python tools/profile_backbone.py [--batch 4] [--iters 6]
       [--rounds 5] [--image_size 640]
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


def s2d_kernel_from_stem(w7: np.ndarray) -> np.ndarray:
    """Rearrange a (7,7,3,64) stride-2 stem kernel into the equivalent
    (4,4,12,64) stride-1 kernel over a 2x2 space-to-depth input.

    out[y,x] = sum_{ky,kx} w7[ky,kx] * in[2y+ky-3, 2x+kx-3]; writing
    input row r = 2u+a (u = s2d row, a = block slot) gives
    ky = 2s+a-1 for s = u-(y-2) in 0..3, so the s2d conv needs kernel 4,
    stride 1, padding (2,1). Taps with ky/kx outside 0..6 are zero."""
    kh, kw, cin, cout = w7.shape
    assert (kh, kw, cin) == (7, 7, 3)
    w4 = np.zeros((4, 4, 4 * cin, cout), w7.dtype)
    for s in range(4):
        for t in range(4):
            for a in range(2):
                for b_ in range(2):
                    ky, kx = 2 * s + a - 1, 2 * t + b_ - 1
                    if 0 <= ky <= 6 and 0 <= kx <= 6:
                        w4[s, t, (a * 2 + b_) * cin:(a * 2 + b_ + 1) * cin] = (
                            w7[ky, kx]
                        )
    return w4


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--batch", type=int, default=4)
    parser.add_argument("--iters", type=int, default=6)
    parser.add_argument("--rounds", type=int, default=5)
    parser.add_argument("--image_size", type=int, default=640)
    parser.add_argument("--depth", type=int, default=101)
    parser.add_argument("--cpu", action="store_true")
    args = parser.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    import flax.linen as nn
    import jax.numpy as jnp
    from jax import lax

    from tspn_tpu.detection.resnet import (
        FrozenAffine,
        RESNET_DEPTHS,
        ResNetC4Backbone,
        ResStage,
    )

    b, size = args.batch, args.image_size
    img0 = jax.random.uniform(
        jax.random.PRNGKey(0), (size, size, 3), jnp.float32, 0.0, 255.0
    )
    imgs = jnp.stack([img0] * b)

    params = ResNetC4Backbone(depth=args.depth).init(
        jax.random.PRNGKey(1), img0
    )["params"]

    d2, d3, d4, _ = RESNET_DEPTHS[args.depth]

    # ---- cumulative substage models (same param names as the backbone,
    # applied with the params subtree the truncated forward touches) ----
    class UpTo(nn.Module):
        stop: str
        dtype: jnp.dtype = jnp.float32

        @nn.compact
        def __call__(self, image):
            dt = self.dtype
            x = nn.Conv(64, (7, 7), strides=2, padding=[(3, 3), (3, 3)],
                        use_bias=False, dtype=dt, name="stem_conv")(image)
            x = nn.relu(FrozenAffine(dtype=dt, name="stem_norm")(x))
            x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=[(1, 1), (1, 1)])
            if self.stop == "stem":
                return x
            x = ResStage(d2, 256, 64, first_stride=1, dtype=dt, name="res2")(x)
            if self.stop == "res2":
                return x
            x = ResStage(d3, 512, 128, dtype=dt, name="res3")(x)
            if self.stop == "res3":
                return x
            return ResStage(d4, 1024, 256, dtype=dt, name="res4")(x)

    stage_keys = {
        "stem": ("stem_conv", "stem_norm"),
        "res2": ("stem_conv", "stem_norm", "res2"),
        "res3": ("stem_conv", "stem_norm", "res2", "res3"),
        "res4": ("stem_conv", "stem_norm", "res2", "res3", "res4"),
    }

    legs = {}
    for dt_name, dt in (("f32", jnp.float32), ("bf16", jnp.bfloat16)):
        for st_name, keys in stage_keys.items():
            sub = UpTo(stop=st_name, dtype=dt)
            p_sub = {k: params[k] for k in keys}

            @jax.jit
            def step(p, ims, tag, carry, _m=sub):
                ims = ims + 1e-4 * (tag + carry)
                out = jax.vmap(lambda im: _m.apply({"params": p}, im))(ims)
                return jnp.sum(out.astype(jnp.float32)) * 1e-9

            legs[f"{st_name}_{dt_name}"] = (
                lambda tag, c, _s=step, _p=p_sub: _s(
                    _p, imgs, jnp.float32(tag), c
                ),
                args.iters,
            )

    # ---- s2d stem variant: exact rewrite, parity-gated -----------------
    w7 = np.asarray(params["stem_conv"]["kernel"], np.float32)
    w4 = jnp.asarray(s2d_kernel_from_stem(w7))
    scale = jnp.asarray(params["stem_norm"]["scale"])
    bias = jnp.asarray(params["stem_norm"]["bias"])

    def stem_s2d(ims, dt):
        B, H, W, C = ims.shape
        xs = ims.reshape(B, H // 2, 2, W // 2, 2, C)
        xs = xs.transpose(0, 1, 3, 2, 4, 5).reshape(B, H // 2, W // 2, 4 * C)
        x = lax.conv_general_dilated(
            xs.astype(dt), w4.astype(dt), window_strides=(1, 1),
            padding=[(2, 1), (2, 1)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        x = nn.relu(x * scale.astype(dt) + bias.astype(dt))
        return nn.max_pool(x, (3, 3), strides=(2, 2), padding=[(1, 1), (1, 1)])

    def stem_ref(ims, dt):
        x = lax.conv_general_dilated(
            ims.astype(dt), jnp.asarray(w7).astype(dt), window_strides=(2, 2),
            padding=[(3, 3), (3, 3)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        x = nn.relu(x * scale.astype(dt) + bias.astype(dt))
        return nn.max_pool(x, (3, 3), strides=(2, 2), padding=[(1, 1), (1, 1)])

    # parity gate (f32, on device)
    a = jax.jit(lambda x: stem_ref(x, jnp.float32))(imgs)
    c = jax.jit(lambda x: stem_s2d(x, jnp.float32))(imgs)
    parity = float(jnp.max(jnp.abs(a - c)))
    rel = parity / float(jnp.max(jnp.abs(a)) + 1e-12)
    if rel > 1e-4:
        print(json.dumps({"error": "s2d parity fail", "max_abs": parity,
                          "rel": rel}))
        return

    for dt_name, dt in (("f32", jnp.float32), ("bf16", jnp.bfloat16)):
        @jax.jit
        def s2d_step(ims, tag, carry, _dt=dt):
            ims = ims + 1e-4 * (tag + carry)
            return jnp.sum(stem_s2d(ims, _dt).astype(jnp.float32)) * 1e-9

        @jax.jit
        def ref_step(ims, tag, carry, _dt=dt):
            ims = ims + 1e-4 * (tag + carry)
            return jnp.sum(stem_ref(ims, _dt).astype(jnp.float32)) * 1e-9

        legs[f"iso_stem_s2d_{dt_name}"] = (
            lambda tag, c_, _s=s2d_step: _s(imgs, jnp.float32(tag), c_),
            args.iters,
        )
        legs[f"iso_stem_conv_{dt_name}"] = (
            lambda tag, c_, _s=ref_step: _s(imgs, jnp.float32(tag), c_),
            args.iters,
        )

    # ---- null leg: measures the per-iteration chained-dispatch floor
    # (tunnel RTT / iters + dispatch cost) so stage times can be read
    # net of it — at batch 4 the substage legs are near this floor.
    tiny = jnp.ones((8, 128), jnp.float32)

    @jax.jit
    def null_step(x, tag, carry):
        return jnp.sum(x * (tag + carry)) * 1e-9

    legs["null"] = (
        lambda tag, c: null_step(tiny, jnp.float32(tag), c),
        args.iters,
    )

    from bench import _time_interleaved

    print(f"# compiling {len(legs)} legs ...", file=sys.stderr, flush=True)
    t0 = time.perf_counter()
    t = _time_interleaved(legs, rounds=args.rounds, warmup=2)
    out = {
        "metric": "backbone_stage_breakdown",
        "batch": b,
        "image_size": size,
        "s2d_parity_max_abs": round(parity, 6),
        "total_probe_s": round(time.perf_counter() - t0, 1),
    }
    for name, ts in t.items():
        med = float(np.median(ts))
        p25, p75 = np.percentile(ts, [25, 75])
        out[f"{name}_ms"] = round(med * 1e3, 2)
        out[f"{name}_iqr_ms"] = [round(p25 * 1e3, 2), round(p75 * 1e3, 2)]
    print(json.dumps(out))


if __name__ == "__main__":
    main()
