"""Detect-path stage breakdown, f32 vs bf16 (VERDICT r3 item 2).

Round 3 measured bf16 detect at only +11% over f32 (102 -> 114 f/s,
batch 4) — if detect were MXU-bound after the RoIAlign kernel, bf16
should buy far more. This probe produces the round-3-style breakdown on
the real chip so the non-gain is attributable: CUMULATIVE stages
(backbone -> +rpn head -> +proposal top-k/NMS -> +RoI head -> full
detect incl. final class-aware NMS) plus two ISOLATED legs (RoIAlign
kernel alone on fixed boxes; final NMS alone on fixed candidates), each
at f32 and bf16, batch 4, interleaved rounds under the chained-unique
protocol (see bench.py docstring / memory: axon-tpu-quirks).

Marginal stage cost = difference of adjacent cumulative legs; the
isolated legs cross-check the two suspects (f32-only VPU work in the
Pallas RoIAlign G-matrix build; sequential NMS steps).

Usage: python tools/profile_detect.py [--batch 4] [--iters 4]
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


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--batch", type=int, default=4)
    parser.add_argument("--iters", type=int, default=4)
    parser.add_argument("--rounds", type=int, default=5)
    parser.add_argument("--image_size", type=int, default=640)
    parser.add_argument("--depth", type=int, default=101)
    args = parser.parse_args()

    import jax
    import jax.numpy as jnp

    from tspn_tpu.detection.rcnn import DetectionConfig, FasterRCNN
    from tspn_tpu.detection.rpn import make_anchors, select_proposals

    cfg = DetectionConfig(depth=args.depth)
    b, size = args.batch, args.image_size

    img0 = jax.random.uniform(
        jax.random.PRNGKey(0), (size, size, 3), jnp.float32, 0.0, 255.0
    )
    models = {
        "f32": FasterRCNN(cfg=cfg),
        "bf16": FasterRCNN(cfg=cfg, dtype=jnp.bfloat16),
    }
    params = models["f32"].init(
        jax.random.PRNGKey(1), img0, method=FasterRCNN.detect
    )["params"]
    imgs = jnp.stack([img0] * b)

    # ---- cumulative stage functions (method= callables over the module)
    def st_backbone(m, image):
        return m._features(image)

    def st_rpn(m, image):
        feats = m._features(image)
        logits, deltas = m.rpn_head(feats)
        return logits, deltas

    def st_props(m, image):
        c = m.cfg
        h, w = image.shape[:2]
        feats = m._features(image)
        logits, deltas = m.rpn_head(feats)
        anchors = make_anchors(
            feats.shape[0], feats.shape[1], c.stride,
            c.anchor_sizes, c.anchor_ratios,
        )
        props = select_proposals(
            logits, deltas, anchors, (h, w),
            c.pre_nms_topk_test, c.post_nms_topk_test, c.rpn_nms_threshold,
        )
        return props.boxes, props.scores

    def st_roi(m, image):
        c = m.cfg
        h, w = image.shape[:2]
        feats = m._features(image)
        logits, deltas = m.rpn_head(feats)
        anchors = make_anchors(
            feats.shape[0], feats.shape[1], c.stride,
            c.anchor_sizes, c.anchor_ratios,
        )
        props = select_proposals(
            logits, deltas, anchors, (h, w),
            c.pre_nms_topk_test, c.post_nms_topk_test, c.rpn_nms_threshold,
        )
        cls_logits, box_deltas = m._roi_forward(
            feats, props.boxes, inference=True
        )
        return cls_logits, box_deltas

    stages = {
        "backbone": st_backbone,
        "rpn": st_rpn,
        "props": st_props,
        "roi": st_roi,
        "full": FasterRCNN.detect,
    }

    def reduce_out(out):
        leaves = jax.tree_util.tree_leaves(out)
        return sum(jnp.sum(x.astype(jnp.float32)) for x in leaves) * 1e-9

    legs = {}
    for dt, model in models.items():
        for name, fn in stages.items():
            @jax.jit
            def step(p, ims, tag, carry, _m=model, _fn=fn):
                ims = ims + 1e-4 * (tag + carry)
                out = jax.vmap(
                    lambda im: _m.apply({"params": p}, im, method=_fn)
                )(ims)
                return reduce_out(out)

            legs[f"{name}_{dt}"] = (
                lambda tag, c, _s=step: _s(params, imgs, jnp.float32(tag), c),
                args.iters,
            )

    # ---- isolated legs: RoIAlign kernel alone; final NMS alone --------
    from tspn_tpu.ops.nms import nms
    from tspn_tpu.ops.roi_align import roi_align_pallas

    fh = size // cfg.stride
    feats32 = jax.random.normal(
        jax.random.PRNGKey(2), (b, fh, fh, 1024), jnp.float32
    )
    rboxes = jnp.tile(
        jax.random.uniform(
            jax.random.PRNGKey(3), (cfg.post_nms_topk_test, 4),
            jnp.float32, 0.0, fh - 1.0,
        ),
        (b, 1, 1),
    )
    rboxes = jnp.concatenate(
        [rboxes[..., :2], rboxes[..., :2] + 1.0 + rboxes[..., 2:] * 0.2],
        axis=-1,
    )

    for dt, fdt in (("f32", jnp.float32), ("bf16", jnp.bfloat16)):
        @jax.jit
        def roi_step(f, bx, tag, carry, _fdt=fdt):
            f = (f + 1e-4 * (tag + carry)).astype(_fdt)
            out = jax.vmap(
                lambda ff, bb: roi_align_pallas(
                    ff, bb, output_size=cfg.roi_pool_size, sampling_ratio=2
                )
            )(f, bx)
            return jnp.sum(out.astype(jnp.float32)) * 1e-9

        legs[f"iso_roialign_{dt}"] = (
            lambda tag, c, _s=roi_step: _s(
                feats32, rboxes, jnp.float32(tag), c
            ),
            args.iters,
        )

    n_cand = cfg.post_nms_topk_test * cfg.num_classes
    cboxes = jax.random.uniform(
        jax.random.PRNGKey(4), (b, n_cand, 4), jnp.float32, 0.0, size
    )
    cboxes = jnp.concatenate(
        [cboxes[..., :2], cboxes[..., :2] + 8.0 + cboxes[..., 2:] * 0.1],
        axis=-1,
    )
    cscores0 = jax.random.uniform(jax.random.PRNGKey(5), (b, n_cand))

    @jax.jit
    def nms_step(bx, sc, tag, carry):
        sc = sc * (1.0 + 1e-6 * (tag + carry))
        idx, keep = jax.vmap(
            lambda bb, ss: nms(
                bb, ss, cfg.test_nms_threshold, cfg.max_detections,
                valid=ss > cfg.score_threshold,
            )
        )(bx, sc)
        return (jnp.sum(idx) + jnp.sum(keep)).astype(jnp.float32) * 1e-9

    legs["iso_finalnms"] = (
        lambda tag, c: nms_step(cboxes, cscores0, jnp.float32(tag), c),
        args.iters,
    )

    # ---- measure -------------------------------------------------------
    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    from bench import _time_interleaved

    print(f"# compiling {len(legs)} legs ...", file=sys.stderr, flush=True)
    t0 = time.perf_counter()
    t = _time_interleaved(legs, rounds=args.rounds, warmup=2)
    out = {
        "metric": "detect_stage_breakdown",
        "batch": b,
        "image_size": size,
        "total_probe_s": round(time.perf_counter() - t0, 1),
    }
    for name, ts in t.items():
        med = float(np.median(ts))
        p25, p75 = np.percentile(ts, [25, 75])
        out[f"{name}_ms"] = round(med * 1e3, 2)
        out[f"{name}_iqr_ms"] = [round(p25 * 1e3, 2), round(p75 * 1e3, 2)]
    for dt in ("f32", "bf16"):
        out[f"frames_per_sec_{dt}"] = round(b / (out[f"full_{dt}_ms"] / 1e3), 1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
