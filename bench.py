"""Benchmark: tracklet-pair relation scoring throughput on one TPU chip.

Workload = the relation-stage hot path (BASELINE.json metric "tracklet
pairs scored/sec/chip"): L1 block normalization + Linear(11070 -> 132)
predicate scoring over tracklet-pair features — the compute the
reference splits across a host-side per-sample normalize
(vrdataset.py:219-242) and a batch-1 fp32 GPU Linear
(model.py:76-88, TEST_BATCH_SIZE=1 in configs/baseline.yaml).

Optimized path: the scales-precomputed int8 x int8 Pallas kernel
(tspn_tpu.ops.pairwise.normalize_classify_q8s_pallas) over quantized
device-layout features, 64 segments (63488 pairs) per dispatch — one
int8 HBM read of the features, every MXU pass integer, all scales (per-
row head / per-block 1/L1 / per-column weight) applied to the small f32
accumulator. This is the kernel the consolidated q8 inference path
(PREDICT.CONSOLIDATED="q8") actually runs; quantization is near-lossless
(block scales cancel in L1 normalization — tests/test_q8_kernel.py; on
the synthetic e2e fixture top predictions agree with f32 within int8
rounding, see test_consolidated_q8_predict_equivalence). The bf16 fused kernel's
throughput is reported alongside as "bf16_fused_value".

vs_baseline: the same math as the reference executes it — unfused
float32 XLA, one 992-pair segment per dispatch — measured on the SAME
chip with the SAME protocol.

Measurement protocol (memory: axon-tpu-quirks): the dev tunnel memoizes
identical dispatches and pipelines independent ones, so every iteration
must (a) carry unique input content and (b) depend on the previous
iteration's output. Both are satisfied by scaling the SMALL weight
matrix with (1 + eps*(tag + carry)) — a ~3 MB side input — rather than
perturbing the multi-GB feature buffer: an elementwise add on the
features costs a full extra HBM read+write that XLA fuses into its own
matmuls but a custom-call kernel cannot, which previously understated
the fused kernel by ~2.4x. Both legs use >= 20 timed iterations and the
spread is reported.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N,
   "value_iqr": [p25, p75], "baseline_value": N, "iters": [opt, ref]}
"""

from __future__ import annotations

import json
import time

import jax
import jax.numpy as jnp
import numpy as np


def _time_chained_unique(step_fn, iters, repeats=5, warmup=3):
    """Per-iteration time (one value per repeat) under the chained-unique
    protocol.

    step_fn(tag, carry) -> scalar carry. Each repeat times `iters`
    chained iterations bounded by a single scalar readback: the dev
    tunnel's host<->device round trip is ~25 ms, so per-iteration syncs
    would swamp the kernel — the one RTT per repeat is amortized over
    `iters` dispatches instead (and slightly UNDERSTATES throughput)."""
    carry = jnp.float32(0.0)
    for i in range(warmup):
        carry = step_fn(float(i + 1), carry)
    _ = float(np.asarray(carry))  # forced sync
    per_iter = []
    tag = 100.0
    for _r in range(repeats):
        start = time.perf_counter()
        for _i in range(iters):
            carry = step_fn(tag, carry)
            tag += 1.0
        _ = float(np.asarray(carry))
        per_iter.append((time.perf_counter() - start) / iters)
    return np.asarray(per_iter)


def main():
    from tspn_tpu.ops.pairwise import (
        DEVICE_DIM,
        _permutation,
        normalize_classify,
        normalize_classify_pallas,
        normalize_classify_q8s_pallas,
        quantize_weights_percol,
        weights_to_device_layout,
    )
    from tspn_tpu.data.feature_store import FEATURE_DIM

    num_predicates = 132
    pairs_per_seg = 32 * 31  # 32-tracklet bucket
    segments = 96  # ~95k pairs/dispatch: amortizes tunnel dispatch latency
    p_total = segments * pairs_per_seg

    rng = np.random.RandomState(0)
    w = (rng.randn(FEATURE_DIM, num_predicates) * 0.01).astype(np.float32)
    b = np.zeros(num_predicates, np.float32)

    # features are generated ON DEVICE (host->device of multi-GB arrays
    # over the dev tunnel would dominate the measurement); the valid-column
    # mask reproduces the device layout's zero padding
    col_valid_i8 = jnp.asarray((_permutation() >= 0), jnp.int8)
    col_valid = col_valid_i8.astype(jnp.bfloat16)
    key = jax.random.PRNGKey(0)
    w_dev = jnp.asarray(weights_to_device_layout(w), jnp.bfloat16)
    qw, sw = quantize_weights_percol(weights_to_device_layout(w))
    qw_dev, sw_dev = jnp.asarray(qw), jnp.asarray(sw)
    b_dev = jax.device_put(b)

    # headline leg: int8 rows + (P, 16) precomputed scales (col 0 head
    # scale, cols 1..8 inverse block-L1 sums — representative magnitudes)
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

    # NOTE: all large buffers are explicit jit ARGUMENTS — closing over
    # them embeds GB-scale constants in the HLO, which the remote TPU
    # compiler chokes on (see memory: axon-tpu-quirks)
    @jax.jit
    def q8_step(x, s, qw_, sw_, b_, tag, carry):
        # unique content + dependency chain through the SMALL col scales
        swi = sw_ * (1.0 + 1e-6 * (tag + carry))
        out = normalize_classify_q8s_pallas(x, s, qw_, swi, b_, row_tile=256)
        return jnp.max(out)

    def q8_fn(tag, carry):
        return q8_step(
            feats_q8, scales, qw_dev, sw_dev, b_dev, jnp.float32(tag), carry
        )

    OPT_ITERS, OPT_REPEATS = 50, 7
    t_opt = _time_chained_unique(q8_fn, iters=OPT_ITERS, repeats=OPT_REPEATS)
    pairs_per_sec = p_total / np.median(t_opt)
    p25, p75 = np.percentile(t_opt, [25, 75])

    # ---- bf16 fused kernel (the training-compatible fused path)
    feats_dev = (
        jax.random.uniform(key, (p_total, DEVICE_DIM), jnp.bfloat16) * col_valid
    )

    @jax.jit
    def bf16_step(x, w_, b_, tag, carry):
        wi = (w_ * (1.0 + 1e-6 * (tag + carry)).astype(w_.dtype))
        out = normalize_classify_pallas(x, wi, b_, row_tile=128)
        return jnp.max(out)

    t_bf16 = _time_chained_unique(
        lambda tag, carry: bf16_step(
            feats_dev, w_dev, b_dev, jnp.float32(tag), carry
        ),
        iters=50,
        repeats=5,
    )
    bf16_pairs_per_sec = p_total / np.median(t_bf16)

    # ---- reference-style: unfused f32, one segment per dispatch
    seg = jax.random.uniform(key, (pairs_per_seg, FEATURE_DIM), jnp.float32)
    w32, b32 = jax.device_put(w), jax.device_put(b)

    @jax.jit
    def ref_one(x, w_, b_, tag, carry):
        wi = w_ * (1.0 + 1e-6 * (tag + carry))
        out = normalize_classify(x, wi, b_)
        return jnp.max(out)

    def ref_step(tag, carry):
        c = carry
        for s in range(segments):
            c = ref_one(seg, w32, b32, jnp.float32(tag * segments + s), c)
        return c

    # the baseline leg is dispatch-heavy (one 992-pair segment per
    # dispatch); extra repeats damp tunnel-load variance in the ratio
    REF_ITERS, REF_REPEATS = 5, 7
    t_ref = _time_chained_unique(ref_step, iters=REF_ITERS, repeats=REF_REPEATS, warmup=2)
    ref_pairs_per_sec = p_total / np.median(t_ref)

    print(json.dumps({
        "metric": "tracklet_pairs_scored_per_sec_per_chip",
        "value": round(pairs_per_sec, 1),
        "unit": "pairs/s",
        "vs_baseline": round(pairs_per_sec / ref_pairs_per_sec, 2),
        "value_iqr": [round(p_total / p75, 1), round(p_total / p25, 1)],
        "baseline_value": round(ref_pairs_per_sec, 1),
        "bf16_fused_value": round(bf16_pairs_per_sec, 1),
        "iters": [OPT_REPEATS * OPT_ITERS, REF_REPEATS * REF_ITERS],
    }))


if __name__ == "__main__":
    main()
