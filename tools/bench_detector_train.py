"""Detector TRAIN-step throughput probe: f32 vs bf16 activations.

The detector stage is the framework's heaviest training compute (the
reference recipe runs 100k iterations — /root/reference/detectron/
trainer.py:31); this measures the jitted fused train step (loss + grads
+ SGD update, donated buffers) at the recipe's operating point on the
real chip, interleaved f32/bf16 rounds under the chained-unique
protocol (see bench.py's module docstring for why both properties are
required on the dev tunnel).

Usage: python tools/bench_detector_train.py [--image_size 640]
       [--batch 4] [--iters 4] [--rounds 5]
Prints one JSON line. NOTE: two cold detector-train compiles over the
tunnel take ~5-10 min total; subsequent in-process use is cached.
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
    parser.add_argument("--image_size", type=int, default=640)
    parser.add_argument("--batch", type=int, default=4)
    parser.add_argument("--iters", type=int, default=4)
    parser.add_argument("--rounds", type=int, default=5)
    parser.add_argument("--depth", type=int, default=101)
    args = parser.parse_args()

    import jax
    import jax.numpy as jnp

    from tspn_tpu.detection.rcnn import DetectionConfig, FasterRCNN
    from tspn_tpu.detection.train import (
        DetectorTrainConfig,
        build_detector_optimizer,
        make_detector_train_step,
    )

    det_cfg = DetectionConfig(num_classes=35, depth=args.depth)
    train_cfg = DetectorTrainConfig(
        ims_per_batch=args.batch, image_size=args.image_size
    )
    s, b, g = args.image_size, args.batch, train_cfg.max_gt_boxes

    rng = np.random.RandomState(0)
    batch = {
        "image": jnp.asarray(
            rng.uniform(0, 255, (b, s, s, 3)).astype(np.float32)
        ),
        "gt_boxes": jnp.asarray(
            np.concatenate(
                [
                    rng.uniform(0, s / 2, (b, g, 2)),
                    rng.uniform(s / 2, s, (b, g, 2)),
                ],
                axis=-1,
            ).astype(np.float32)
        ),
        "gt_classes": jnp.asarray(rng.randint(0, 35, (b, g), np.int32)),
        "gt_mask": jnp.asarray(
            (np.arange(g)[None] < 8).repeat(b, 0).astype(np.float32)
        ),
    }
    optimizer = build_detector_optimizer(train_cfg)

    legs = {}
    for name, dtype in (("f32", jnp.float32), ("bf16", jnp.bfloat16)):
        model = FasterRCNN(cfg=det_cfg, dtype=dtype)
        params = model.init(
            jax.random.PRNGKey(0), batch["image"][0], batch["gt_boxes"][0],
            batch["gt_classes"][0], batch["gt_mask"][0],
        )["params"]
        # the fused step donates (params, opt_state); keep a mutable cell
        # per leg so the chain is real (step N+1 consumes step N's params)
        state = [params, optimizer.init(params)]
        step_fn = make_detector_train_step(model, optimizer)

        def leg(tag, carry, state=state, step_fn=step_fn):
            bt = dict(batch)
            # unique content + dependency chain through the small gt
            bt["gt_boxes"] = batch["gt_boxes"] + (tag % 7 + carry) * 1e-3
            state[0], state[1], losses = step_fn(state[0], state[1], bt)
            return losses["loss"]

        legs[name] = leg

    # warm (compiles both programs)
    import jax.numpy as jnp  # noqa: F811

    for name, leg in legs.items():
        t0 = time.perf_counter()
        _ = float(np.asarray(leg(1.0, jnp.float32(0.0))))
        print(f"# {name} compile+first-step: "
              f"{time.perf_counter() - t0:.1f}s", file=sys.stderr)

    times = {name: [] for name in legs}
    tag = 10.0
    for _r in range(args.rounds):
        for name, leg in legs.items():
            carry = jnp.float32(0.0)
            t0 = time.perf_counter()
            for _i in range(args.iters):
                carry = leg(tag, carry)
                tag += 1.0
            _ = float(np.asarray(carry))
            times[name].append((time.perf_counter() - t0) / args.iters)

    med = {name: float(np.median(ts)) for name, ts in times.items()}
    print(json.dumps({
        "metric": "detector_train_step",
        "image_size": s, "batch": b, "depth": args.depth,
        "f32_ms_per_step": round(med["f32"] * 1e3, 2),
        "bf16_ms_per_step": round(med["bf16"] * 1e3, 2),
        "bf16_speedup": round(med["f32"] / med["bf16"], 2),
        "f32_images_per_sec": round(b / med["f32"], 1),
        "bf16_images_per_sec": round(b / med["bf16"], 1),
    }))


if __name__ == "__main__":
    main()
