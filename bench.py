"""Benchmark: tracklet-pair relation scoring throughput on one TPU chip.

Workload = the relation-stage hot path (BASELINE.json metric "tracklet
pairs scored/sec/chip"): L1 block normalization + Linear(11070 -> 132)
predicate scoring over tracklet-pair features — the compute the
reference splits across a host-side per-sample normalize
(vrdataset.py:219-242) and a batch-1 fp32 GPU Linear
(model.py:76-88, TEST_BATCH_SIZE=1 in configs/baseline.yaml).

Optimized path: the fused Pallas kernel (tspn_tpu.ops.pairwise) over
bfloat16 device-layout features, 64 segments (63488 pairs) per dispatch
— features are read from HBM once, normalized in VMEM, accumulated in
fp32 on the MXU.

vs_baseline: the same math as the reference executes it — unfused
float32 XLA, one 992-pair segment per dispatch — measured on the SAME
chip. Each timed iteration consumes the previous one's output so
executions serialize (no pipelining illusions).

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}
"""

from __future__ import annotations

import json
import time

import jax
import jax.numpy as jnp
import numpy as np


def _time_chained_unique(step_fn, iters=50, warmup=3):
    """Timing under the dev tunnel needs BOTH properties (memory:
    axon-tpu-quirks): every dispatch must carry unique input content
    (identical dispatches are memoized) AND iterations must form a data
    dependency chain (independent dispatches give async illusions).
    step_fn(tag, carry) -> scalar carry; one host readback at the end
    bounds the whole chain."""
    carry = None
    for i in range(warmup):
        carry = step_fn(float(i + 1), carry)
    _ = float(np.asarray(carry))  # forced sync
    start = time.perf_counter()
    for i in range(iters):
        carry = step_fn(float(100 + i), carry)
    _ = float(np.asarray(carry))
    return (time.perf_counter() - start) / iters


def main():
    from tspn_tpu.data.feature_store import FEATURE_DIM
    from tspn_tpu.ops.pairwise import (
        normalize_classify,
        normalize_classify_pallas,
        to_device_layout,
        weights_to_device_layout,
    )

    num_predicates = 132
    pairs_per_seg = 32 * 31  # 32-tracklet bucket
    segments = 64
    p_total = segments * pairs_per_seg

    rng = np.random.RandomState(0)
    w = (rng.randn(FEATURE_DIM, num_predicates) * 0.01).astype(np.float32)
    b = np.zeros(num_predicates, np.float32)

    # features are generated ON DEVICE (host->device of multi-GB arrays
    # over the dev tunnel would dominate the measurement); the valid-column
    # mask reproduces the device layout's zero padding
    from tspn_tpu.ops.pairwise import DEVICE_DIM, _permutation

    col_valid = jnp.asarray((_permutation() >= 0), jnp.bfloat16)
    key = jax.random.PRNGKey(0)
    feats_dev = (
        jax.random.uniform(key, (p_total, DEVICE_DIM), jnp.bfloat16) * col_valid
    )
    w_dev = jnp.asarray(weights_to_device_layout(w), jnp.bfloat16)
    b_dev = jax.device_put(b)

    # NOTE: all large buffers are explicit jit ARGUMENTS — closing over
    # them embeds GB-scale constants in the HLO, which the remote TPU
    # compiler chokes on (see memory: axon-tpu-quirks)
    @jax.jit
    def opt_step(x0, w_, b_, tag, carry):
        # unique content per call + dependency on the previous iteration
        x = x0 + (tag + carry).astype(x0.dtype)
        out = normalize_classify_pallas(x, w_, b_, row_tile=256)
        return jnp.max(out)

    def opt_fn(tag, carry):
        c = jnp.float32(0.0) if carry is None else carry
        return opt_step(feats_dev, w_dev, b_dev, jnp.float32(tag), c)

    t_opt = _time_chained_unique(opt_fn)
    pairs_per_sec = p_total / t_opt

    # ---- reference-style: unfused f32, one segment per dispatch
    seg = jax.random.uniform(key, (pairs_per_seg, FEATURE_DIM), jnp.float32)
    w32, b32 = jax.device_put(w), jax.device_put(b)

    @jax.jit
    def ref_one(x, w_, b_, tag, carry):
        out = normalize_classify(x + tag + carry, w_, b_)
        return jnp.max(out)

    def ref_step(tag, carry):
        c = jnp.float32(0.0) if carry is None else carry
        for s in range(segments):
            c = ref_one(seg, w32, b32, jnp.float32(tag * segments + s), c)
        return c

    t_ref = _time_chained_unique(ref_step, iters=5, warmup=1)
    ref_pairs_per_sec = p_total / t_ref

    print(json.dumps({
        "metric": "tracklet_pairs_scored_per_sec_per_chip",
        "value": round(pairs_per_sec, 1),
        "unit": "pairs/s",
        "vs_baseline": round(pairs_per_sec / ref_pairs_per_sec, 2),
    }))


if __name__ == "__main__":
    main()
