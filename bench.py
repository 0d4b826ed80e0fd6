"""Benchmark: tracklet-pair relation scoring throughput on one TPU chip.

Workload = the relation-stage hot path (BASELINE.json metric "tracklet
pairs scored/sec/chip"): the flagship TSPN forward (PPN pair matrix +
predicate classifier) over padded segment batches at production shapes
(32-tracklet bucket -> 992 pairs x 11070-d features per segment).

vs_baseline compares against the reference's execution style measured on
the SAME chip with the SAME framework: per-segment batch-1 float32
forwards (the reference runs TEST_BATCH_SIZE=1 fp32, one DataLoader item
at a time — /root/reference/lib/modeling/predict.py:41-63,
configs/baseline.yaml). Both sides use device-resident inputs so the
ratio reflects compute organization (batching + bf16), not host-link
speed. Each timed iteration consumes the previous iteration's output, so
executions serialize and cannot overlap or be elided.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}
"""

from __future__ import annotations

import json
import time

import jax
import jax.numpy as jnp
import numpy as np


def _make_batch(rng, b, n, d, num_obj):
    p = n * (n - 1)
    idx = np.arange(n)
    sub = np.repeat(idx, n - 1)
    obj = np.concatenate([np.delete(idx, i) for i in range(n)])
    pairs = np.tile(np.stack([sub, obj], 1)[None], (b, 1, 1)).astype(np.int32)
    return {
        "feats": rng.rand(b, p, d).astype(np.float32),
        "pairs": pairs,
        "labels": np.zeros((b, p, 1), np.float32),  # unused in forward
        "pair_mask": np.ones((b, p), np.float32),
        "cls_logits": rng.rand(b, n, num_obj).astype(np.float32),
        "track_mask": np.ones((b, n), np.float32),
    }


def _time_chained(step_fn, batch, iters=20, warmup=3):
    """Time fn(batch, carry)->carry with a serializing data dependency."""
    carry = jnp.zeros((), jnp.float32)
    for _ in range(warmup):
        carry = step_fn(batch, carry)
    jax.block_until_ready(carry)
    start = time.perf_counter()
    for _ in range(iters):
        carry = step_fn(batch, carry)
    jax.block_until_ready(carry)
    return (time.perf_counter() - start) / iters


def main():
    from tspn_tpu.config import get_default_config
    from tspn_tpu.models.tspn import build_model

    cfg = get_default_config()
    cfg.RELPN.USE_PPN = True
    cfg.RELPN.USE_DPN = False

    n_tracklets = 32
    pairs_per_seg = n_tracklets * (n_tracklets - 1)
    d = cfg.PREDICT.FEATURE_DIM
    batch = 64

    rng = np.random.RandomState(0)
    host_batch = _make_batch(rng, batch, n_tracklets, d, cfg.PREDICT.OBJECT_NUM)
    host_single = {k: v[:1] for k, v in host_batch.items()}

    def make_step(model, params):
        @jax.jit
        def step(b, carry):
            # fold the carry into the input so iteration i+1 depends on i
            b = dict(b, feats=b["feats"] + carry)
            out = model.apply({"params": params}, b)
            return jnp.max(jax.nn.sigmoid(out["rel_logits"])) * 0.0

        return step

    # ---- optimized path: big batch, bf16 compute
    cfg_opt = cfg.clone()
    cfg_opt.MODEL.DTYPE = "bfloat16"
    model_opt = build_model(cfg_opt)
    params = model_opt.init(jax.random.PRNGKey(0), host_single)["params"]
    dev_batch = jax.device_put(host_batch)
    t_opt = _time_chained(make_step(model_opt, params), dev_batch)
    pairs_per_sec = batch * pairs_per_seg / t_opt

    # ---- reference-style: batch-1 fp32, one segment per dispatch
    model_ref = build_model(cfg)
    params_ref = model_ref.init(jax.random.PRNGKey(0), host_single)["params"]
    dev_single = jax.device_put(host_single)
    step_ref = make_step(model_ref, params_ref)

    def ref_epoch(b, carry):
        for _ in range(batch):
            carry = step_ref(b, carry)
        return carry

    t_ref = _time_chained(ref_epoch, dev_single, iters=3, warmup=1)
    ref_pairs_per_sec = batch * pairs_per_seg / t_ref

    print(json.dumps({
        "metric": "tracklet_pairs_scored_per_sec_per_chip",
        "value": round(pairs_per_sec, 1),
        "unit": "pairs/s",
        "vs_baseline": round(pairs_per_sec / ref_pairs_per_sec, 2),
    }))


if __name__ == "__main__":
    main()
