"""Benchmark: tracklet-pair relation scoring throughput on one TPU chip,
plus an end-to-end --detect leg.

Workload = the relation-stage hot path (BASELINE.json metric "tracklet
pairs scored/sec/chip"): L1 block normalization + Linear(11070 -> 132)
predicate scoring over tracklet-pair features — the compute the
reference splits across a host-side per-sample normalize
(vrdataset.py:219-242) and a batch-1 fp32 GPU Linear
(model.py:76-88, TEST_BATCH_SIZE=1 in configs/baseline.yaml).

Optimized path (round 3): the FACTORED int8 pipeline
(ops/pairwise.factored_classify_q8_bucketed). Round-3 roofline work
showed every dense kernel variant pins at this chip's achieved HBM
streaming rate (~460 GB/s; XLA's own reductions measure 320-380 GB/s),
so throughput is set by bytes/pair. The expanded 11264-byte rows are
redundant — classeme + BoW blocks are per-tracklet, only the 3000-d
relative block is pair-specific — so the factored path streams ~3.4x
fewer bytes for the SAME math at the same int8 tier: per-tracklet
partial logits (one q8s pass over N rows) + per-pair relative logits
(one q8s pass over P rows) + a gather-free one-hot-matmul A-table add.
This is what the consolidated q8f inference path
(PREDICT.CONSOLIDATED="q8f") actually runs; quantization is
near-lossless (top predictions agree with f32 within int8 rounding —
tests/test_preprocess.py::test_consolidated_q8f_predict_equivalence).
The previous rounds' expanded-row q8s kernel is reported alongside as
"q8s_value" for continuity.

vs_baseline: the same math as the reference executes it — unfused
float32 XLA over expanded rows, one 992-pair segment per dispatch —
measured on the SAME chip with the SAME protocol.

e2e leg (VERDICT r2 item 3): synthetic-fixture predict_segments
(scored portion; process startup and artifact generation excluded),
q8f-consolidated store vs the reference-style per-segment-file f32 path
at TEST_BATCH_SIZE=1 — emitted as "e2e_segments_per_sec" and
"e2e_vs_per_file_f32" so BASELINE.json's >=5x end-to-end north star is
a tracked number.

Measurement protocol (memory: axon-tpu-quirks): the dev tunnel memoizes
identical dispatches and pipelines independent ones, so every iteration
must (a) carry unique input content and (b) depend on the previous
iteration's output. Both are satisfied by scaling SMALL side inputs
(weight column scales / classifier params) with (1 + eps*(tag + carry))
rather than perturbing the multi-GB feature buffers: an elementwise add
on the features costs a full extra HBM read+write that XLA fuses into
its own matmuls but a custom-call kernel cannot, which previously
understated the fused kernel by ~2.4x.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N, ...}
"""

from __future__ import annotations

import json
import os
import shutil
import tempfile
import time

import jax
import jax.numpy as jnp
import numpy as np


# ---- TPU v5e single-chip peaks (the tunneled chip reports "TPU v5
# lite" = v5e). bf16 MXU 197 TFLOP/s, int8 394 TOP/s, HBM 819 GB/s.
# MFU convention: float legs are normalized to the bf16 peak — XLA's
# default f32 matmul precision on TPU runs bf16 passes on the MXU, so
# bf16 peak is the honest ceiling for both "f32" and bf16 legs; int8
# Pallas legs normalize to the int8 peak. hbm_frac normalizes the
# leg's known streamed bytes to the 819 GB/s theoretical peak (the
# chip's own measured streaming rate over this tunnel is ~460 GB/s,
# DESIGN.md §7 — so ~0.56 hbm_frac is this environment's speed of
# light for HBM-bound kernels).
V5E_PEAK_BF16_FLOPS = 197e12
V5E_PEAK_INT8_OPS = 394e12
V5E_PEAK_HBM_BYTES = 819e9


def _xla_cost(jitted, *args):
    """FLOPs + HBM bytes of a compiled program via XLA's own
    cost_analysis (VERDICT r4 item 3). Pallas custom calls inside the
    program contribute ZERO to these numbers — use analytic counts for
    kernel legs, this for XLA-compiled legs."""
    try:
        c = jitted.lower(*args).compile().cost_analysis()
        d = c[0] if isinstance(c, (list, tuple)) else c
        return {
            "flops": float(d.get("flops", 0.0)),
            "bytes": float(d.get("bytes accessed", 0.0)),
        }
    except Exception:
        return None


def _time_interleaved(legs, rounds=7, warmup=3, max_rounds=None,
                      stable_leg=None, rel_iqr=0.15):
    """Per-iteration times for several legs measured in INTERLEAVED
    rounds (leg A, leg B, ... repeated `rounds` times), medianed per leg.

    legs: {name: (step_fn, iters_per_round)} with
    step_fn(tag, carry) -> scalar carry. Each round times `iters`
    chained iterations bounded by a single scalar readback: the dev
    tunnel's host<->device round trip is ~25 ms, so per-iteration syncs
    would swamp the kernel — the one RTT per round is amortized over
    `iters` dispatches instead (and slightly UNDERSTATES throughput).

    Interleaving matters: the tunneled chip's minute-scale load swings
    have moved the SAME compiled kernel between 29 and 67 Mpairs/s
    across processes (DESIGN.md §7 round 3b), so sequential
    leg-after-leg timing would bake drift into every ratio. Rounds
    alternate legs so each leg samples the same load profile; medians
    across rounds then cancel the swings from the reported ratios.

    stable_leg + max_rounds: keep adding rounds past `rounds` (up to
    `max_rounds`) while that leg's IQR/median exceeds `rel_iqr` — an
    external-load slowdown mid-run otherwise leaves a wide, arbitrary
    spread in whichever rounds it happened to hit."""
    for step_fn, _ in legs.values():
        carry = jnp.float32(0.0)
        for i in range(warmup):
            carry = step_fn(float(i + 1), carry)
        _ = float(np.asarray(carry))  # forced sync
    per_leg = {name: [] for name in legs}
    tag = 100.0

    def run_round():
        nonlocal tag
        for name, (step_fn, iters) in legs.items():
            carry = jnp.float32(0.0)
            start = time.perf_counter()
            for _i in range(iters):
                carry = step_fn(tag, carry)
                tag += 1.0
            _ = float(np.asarray(carry))
            per_leg[name].append((time.perf_counter() - start) / iters)

    stable_legs = (
        [stable_leg] if isinstance(stable_leg, str) else list(stable_leg or [])
    )

    def _unstable():
        for name in stable_legs:
            ts = np.asarray(per_leg[name])
            p25, p75 = np.percentile(ts, [25, 75])
            if (p75 - p25) / np.median(ts) > rel_iqr:
                return True
        return False

    for _r in range(rounds):
        run_round()
    # round-4 lesson (VERDICT r4 weak 5): the headline/baseline RATIO
    # drifted round-over-round because only the headline leg was held to
    # an IQR bar — stabilize EVERY leg named in stable_leg so the ratio
    # is reproducible within IQR, not just the numerator
    while stable_legs and max_rounds and len(
        per_leg[stable_legs[0]]
    ) < max_rounds and _unstable():
        run_round()
    return {name: np.asarray(ts) for name, ts in per_leg.items()}


def bench_kernels():
    from tspn_tpu.data.feature_store import FEATURE_DIM
    from tspn_tpu.ops.pairwise import (
        DEVICE_DIM,
        _permutation,
        factored_classify_q8_bucketed,
        normalize_classify,
        normalize_classify_q8s_pallas,
        quantize_weights_percol,
        rel_geom,
        split_weights_factored,
        tracklet_geom,
        weights_to_device_layout,
    )

    num_predicates = 132
    n_trk = 32
    pairs_per_seg = n_trk * (n_trk - 1)  # 992
    segments = 96  # ~95k pairs/dispatch: amortizes tunnel dispatch latency
    p_total = segments * pairs_per_seg
    nt_total = segments * n_trk

    rng = np.random.RandomState(0)
    w = (rng.randn(FEATURE_DIM, num_predicates) * 0.01).astype(np.float32)
    b = np.zeros(num_predicates, np.float32)
    b_dev = jax.device_put(b)

    # ---- headline: factored int8 pipeline (the q8f store's scorer).
    # Features generated ON DEVICE (host->device of GB arrays over the
    # dev tunnel would dominate); large buffers are jit ARGUMENTS, never
    # closed-over constants (remote-compiler hangs otherwise).
    geo_t, geo_r = tracklet_geom(), rel_geom()
    wq = {k: jnp.asarray(v) for k, v in split_weights_factored(w).items()}
    trk_q = jax.jit(
        lambda k: (jax.random.bits(k, (nt_total, geo_t.device_dim), jnp.uint8)
                   & 0x7F).astype(jnp.int8)
    )(jax.random.PRNGKey(1))
    trk_s = (
        jax.random.uniform(jax.random.PRNGKey(2), (nt_total, 16), jnp.float32)
        * 0.01 + 1e-4
    )
    rel_q = jax.jit(
        lambda k: (jax.random.bits(k, (p_total, geo_r.device_dim), jnp.uint8)
                   & 0x7F).astype(jnp.int8)
    )(jax.random.PRNGKey(3))
    rel_s = (
        jax.random.uniform(jax.random.PRNGKey(4), (p_total, 16), jnp.float32)
        * 0.01 + 1e-4
    )

    @jax.jit
    def fact_step(tq, ts, rq, rs, swr, tag, carry):
        wqi = dict(wq)
        # unique content + dependency chain through the SMALL col scales
        # (sw_rel_pad is the one the padded-operand path actually reads)
        wqi["sw_rel_pad"] = swr * (1.0 + 1e-6 * (tag + carry))
        out = factored_classify_q8_bucketed(
            tq, ts, rq, rs, wqi, b_dev, num_tracklets=n_trk
        )
        return jnp.max(out)

    # ---- expanded-row q8s kernel (rounds 1-2 headline, for continuity)
    col_valid_i8 = jnp.asarray((_permutation() >= 0), jnp.int8)
    qw, sw = quantize_weights_percol(weights_to_device_layout(w))
    qw_dev, sw_dev = jnp.asarray(qw), jnp.asarray(sw)
    feats_q8 = jax.jit(
        lambda k: (jax.random.bits(k, (p_total, DEVICE_DIM), jnp.uint8) & 0x7F)
        .astype(jnp.int8) * col_valid_i8
    )(jax.random.PRNGKey(0))
    scales = jnp.concatenate(
        [
            jax.random.uniform(jax.random.PRNGKey(1), (p_total, 9), jnp.float32)
            * 0.01 + 1e-4,
            jnp.zeros((p_total, 7), jnp.float32),
        ],
        axis=1,
    )

    @jax.jit
    def q8_step(x, s, qw_, sw_, b_, tag, carry):
        swi = sw_ * (1.0 + 1e-6 * (tag + carry))
        out = normalize_classify_q8s_pallas(x, s, qw_, swi, b_, row_tile=256)
        return jnp.max(out)

    # ---- reference-style: unfused f32, one segment per dispatch
    seg = jax.random.uniform(
        jax.random.PRNGKey(0), (pairs_per_seg, FEATURE_DIM), jnp.float32
    )
    w32 = jax.device_put(w)

    @jax.jit
    def ref_one(x, w_, b_, tag, carry):
        wi = w_ * (1.0 + 1e-6 * (tag + carry))
        out = normalize_classify(x, wi, b_)
        return jnp.max(out)

    def ref_step(tag, carry):
        c = carry
        for s in range(segments):
            c = ref_one(seg, w32, b_dev, jnp.float32(tag * segments + s), c)
        return c

    ROUNDS = 7
    legs = {
        "opt": (
            lambda tag, c: fact_step(
                trk_q, trk_s, rel_q, rel_s, wq["sw_rel_pad"],
                jnp.float32(tag), c
            ),
            25,
        ),
        "q8s": (
            lambda tag, c: q8_step(
                feats_q8, scales, qw_dev, sw_dev, b_dev, jnp.float32(tag), c
            ),
            10,
        ),
        "ref": (ref_step, 2),  # each ref iter = `segments` dispatches
    }
    t = _time_interleaved(
        legs, rounds=ROUNDS, max_rounds=21, stable_leg=("opt", "ref")
    )
    pairs_per_sec = p_total / np.median(t["opt"])
    p25, p75 = np.percentile(t["opt"], [25, 75])
    q8s_pairs_per_sec = p_total / np.median(t["q8s"])
    ref_pairs_per_sec = p_total / np.median(t["ref"])

    def iqr(ts):
        lo, hi = np.percentile(ts, [25, 75])
        return [round(p_total / hi, 1), round(p_total / lo, 1)]

    # ---- roofline normalization (VERDICT r4 item 3). Pallas custom
    # calls are invisible to XLA cost_analysis, so the two int8 legs use
    # ANALYTIC matmul flops + streamed bytes from the actual array
    # shapes; the f32 reference leg uses XLA's own numbers.
    rp = int(wq["sw_rel_pad"].shape[-1]) if hasattr(
        wq["sw_rel_pad"], "shape"
    ) else 256
    fact_flops = 2.0 * (
        nt_total * geo_t.device_dim * 2 * rp      # per-tracklet pass
        + p_total * geo_r.device_dim * rp         # per-pair relative pass
        + 2 * p_total * n_trk * rp                # one-hot A-table adds
    )
    fact_bytes = (
        trk_q.nbytes + trk_s.nbytes + rel_q.nbytes + rel_s.nbytes
        + 2 * p_total * rp * 4      # y intermediate: pallas write + XLA read
        + p_total * rp * 4          # final logits write
    )
    ncols = int(sw_dev.shape[0])  # 132 — the q8s kernel's output width
    q8s_flops = 2.0 * p_total * DEVICE_DIM * ncols
    q8s_bytes = (
        feats_q8.nbytes + scales.nbytes + p_total * ncols * 4
    )
    t_opt, t_q8s, t_ref = (
        float(np.median(t["opt"])), float(np.median(t["q8s"])),
        float(np.median(t["ref"])),
    )
    ref_cost = _xla_cost(
        ref_one, seg, w32, b_dev, jnp.float32(0.0), jnp.float32(0.0)
    )
    roofline = {
        "opt_mfu_int8": round(fact_flops / t_opt / V5E_PEAK_INT8_OPS, 4),
        "opt_hbm_frac": round(fact_bytes / t_opt / V5E_PEAK_HBM_BYTES, 4),
        "opt_achieved_gbps": round(fact_bytes / t_opt / 1e9, 1),
        "q8s_mfu_int8": round(q8s_flops / t_q8s / V5E_PEAK_INT8_OPS, 4),
        "q8s_hbm_frac": round(q8s_bytes / t_q8s / V5E_PEAK_HBM_BYTES, 4),
        "q8s_achieved_gbps": round(q8s_bytes / t_q8s / 1e9, 1),
    }
    if ref_cost:
        roofline["baseline_mfu_bf16"] = round(
            ref_cost["flops"] * segments / t_ref / V5E_PEAK_BF16_FLOPS, 4
        )
        roofline["baseline_hbm_frac"] = round(
            ref_cost["bytes"] * segments / t_ref / V5E_PEAK_HBM_BYTES, 4
        )
        roofline["baseline_achieved_gbps"] = round(
            ref_cost["bytes"] * segments / t_ref / 1e9, 1
        )

    return {
        "value": round(pairs_per_sec, 1),
        "vs_baseline": round(pairs_per_sec / ref_pairs_per_sec, 2),
        "value_iqr": [round(p_total / p75, 1), round(p_total / p25, 1)],
        "baseline_value": round(ref_pairs_per_sec, 1),
        "baseline_iqr": iqr(t["ref"]),
        "q8s_value": round(q8s_pairs_per_sec, 1),
        "q8s_iqr": iqr(t["q8s"]),
        "iters": {"opt": len(t["opt"]) * 25, "q8s": len(t["q8s"]) * 10,
                  "ref": len(t["ref"]) * 2 * segments},
        **roofline,
    }


def bench_e2e():
    """Scored-portion segments/s of predict_segments: q8f consolidated
    store vs the reference-style per-segment-file f32 path (batch 1)."""
    from tspn_tpu.config import get_default_config
    from tspn_tpu.data.annotations import VidVRD
    from tspn_tpu.data.preprocess import (
        ConsolidatedSegmentDataset,
        consolidate_split,
    )
    from tspn_tpu.data.segments import set_output_dir
    from tspn_tpu.data.synthetic import (
        generate_annotations,
        generate_segment_artifacts,
    )
    from tspn_tpu.data.vrdataset import SegmentDataset, effective_feature_dim
    from tspn_tpu.models.tspn import build_model
    from tspn_tpu.runtime.predict import build_infer, predict_segments

    work = tempfile.mkdtemp(prefix="tspn_bench_e2e_")
    try:
        data_dir = os.path.join(work, "vidvrd")
        out_dir = os.path.join(work, "out")
        generate_annotations(
            data_dir, num_train=1, num_test=6, frame_count=120,
            objects_per_video=4, relations_per_video=5, seed=5,
            num_categories=8, num_predicate_types=16,
        )
        dataset = VidVRD(
            data_dir, os.path.join(data_dir, "videos"), ["train", "test"]
        )
        set_output_dir(out_dir)
        generate_segment_artifacts(dataset, out_dir, seed=5)

        cfg = get_default_config()
        cfg.PREDICT.PREDICATE_NUM = dataset.get_predicate_num()
        cfg.RELPN.USE_PPN = False
        cfg.RELPN.USE_DPN = False

        q8f_path = consolidate_split(
            cfg, dataset, "test", os.path.join(work, "q8f.hdf5"),
            quantize="q8f",
        )

        model = build_model(cfg)
        bucket = min(cfg.BUCKETS.NUM_TRACKLETS)
        p = bucket * (bucket - 1)
        example = {
            "feats": np.zeros((1, p, effective_feature_dim(cfg)), np.float32),
            "pairs": np.zeros((1, p, 2), np.int32),
            "labels": np.zeros((1, p, cfg.PREDICT.PREDICATE_NUM), np.float32),
            "pair_mask": np.zeros((1, p), np.float32),
            "cls_logits": np.zeros((1, bucket, cfg.PREDICT.OBJECT_NUM), np.float32),
            "track_mask": np.zeros((1, bucket), np.float32),
        }
        params0 = model.init(jax.random.PRNGKey(0), example)["params"]

        def prepare_leg(make_dataset, cfg_leg, pipeline_depth=2):
            """One traced program per leg (trace/compile = startup,
            excluded per the e2e metric definition); each timed run's
            dispatches carry unique content via a cls_logits epsilon
            (the tunnel memoizes repeated identical dispatches).
            Returns run_once() -> (seconds, n_segments)."""
            ds0 = make_dataset()
            infer = build_infer(cfg_leg, model, params0, ds0)
            rep = [0]

            def hook(batch):
                b = dict(batch)
                b["cls_logits"] = b["cls_logits"] + 1e-7 * rep[0]
                return b

            predict_segments(  # warm pass: traces + compiles + warms IO
                cfg_leg, model, params0, ds0, infer=infer, batch_hook=hook,
                pipeline_depth=pipeline_depth,
            )

            def run_once():
                rep[0] += 1
                ds = make_dataset()
                t0 = time.perf_counter()
                out = predict_segments(
                    cfg_leg, model, params0, ds, infer=infer,
                    batch_hook=hook, pipeline_depth=pipeline_depth,
                )
                return time.perf_counter() - t0, len(out)

            return run_once

        cfg_q8f = cfg.clone()
        # batch 16 = configs/tspn.yaml's recommended inference batch; the
        # round-3e sweep (bs 4/8/16/32 x depth 2/3 on this fixture) put
        # bs=16 ~1.8x over bs=8 with diminishing returns past it
        cfg_q8f.DATASET.TEST_BATCH_SIZE = 16
        run_q8f = prepare_leg(
            lambda: ConsolidatedSegmentDataset(cfg_q8f, q8f_path), cfg_q8f
        )

        cfg_f32 = cfg.clone()
        cfg_f32.DATASET.TEST_BATCH_SIZE = 1  # reference's TEST_BATCH_SIZE
        # pipeline_depth=0: the reference's loop syncs per segment
        # (predict.py:66-117 converts to CPU inside the batch loop), so
        # the baseline leg keeps that structure
        run_f32 = prepare_leg(
            lambda: SegmentDataset(cfg_f32, dataset, phase="test"), cfg_f32,
            pipeline_depth=0,
        )

        # INTERLEAVED rounds (drift protocol, same rationale as
        # _time_interleaved): both legs sample the same tunnel load
        q8f_times, f32_times, n_segs = [], [], 0
        for _i in range(5):
            t_q, n_segs = run_q8f()
            q8f_times.append(t_q)
            t_f, _ = run_f32()
            f32_times.append(t_f)
        q8f_rate = n_segs / float(np.median(q8f_times))
        f32_rate = n_segs / float(np.median(f32_times))
        q_lo, q_hi = np.percentile(q8f_times, [25, 75])
        return {
            "e2e_segments_per_sec": round(q8f_rate, 2),
            "e2e_iqr": [round(n_segs / q_hi, 2), round(n_segs / q_lo, 2)],
            "e2e_vs_per_file_f32": round(q8f_rate / f32_rate, 2),
            "e2e_num_segments": n_segs,
        }
    finally:
        shutil.rmtree(work, ignore_errors=True)


def bench_detector():
    """Faster R-CNN R101-C4 detect throughput (640x640, 256 post-NMS
    RoIs, Pallas RoIAlign), vmapped batch 4 — the per-frame stage the
    reference delegates to detectron2's CUDA ops
    (/root/reference/detectron/trainer.py:24-33)."""
    from tspn_tpu.detection.rcnn import DetectionConfig, FasterRCNN

    batch = 4
    model = FasterRCNN(cfg=DetectionConfig())
    model16 = FasterRCNN(cfg=DetectionConfig(), dtype=jnp.bfloat16)
    img0 = jax.random.uniform(
        jax.random.PRNGKey(0), (640, 640, 3), jnp.float32, 0.0, 255.0
    )
    params = model.init(jax.random.PRNGKey(1), img0, method=FasterRCNN.detect)[
        "params"
    ]
    imgs = jnp.stack([img0] * batch)

    def make_step(m):
        @jax.jit
        def det_step(p, ims, tag, carry):
            # unique content + dependency chain (tunnel memoization — see
            # module docstring): per-iteration epsilon on the input pixels
            ims = ims + 1e-4 * (tag + carry)
            det = jax.vmap(
                lambda im: m.apply({"params": p}, im, method=FasterRCNN.detect)
            )(ims)
            return jnp.sum(det["scores"].astype(jnp.float32)) * 1e-6

        return det_step, (
            lambda tag, c: det_step(params, imgs, jnp.float32(tag), c)
        )

    # larger-batch bf16 companion legs. bs8 was round 4's best measured
    # operating point; the round-5 sweep (8/16/32) found bs16 +9% and
    # bs32 flat vs bs16 — throughput saturates at ~195 f/s / 0.54 MFU,
    # the rest living in the non-conv machinery (RPN NMS, RoI ops)
    @jax.jit
    def det_step_b(p, ims, tag, carry):
        ims = ims + 1e-4 * (tag + carry)
        det = jax.vmap(
            lambda im: model16.apply(
                {"params": p}, im, method=FasterRCNN.detect
            )
        )(ims)
        return jnp.sum(det["scores"].astype(jnp.float32)) * 1e-6

    imgs8 = jnp.stack([img0] * 8)
    imgs16 = jnp.stack([img0] * 16)

    step_f32, leg_f32 = make_step(model)
    step_bf16, leg_bf16 = make_step(model16)
    t = _time_interleaved(
        {
            "f32": (leg_f32, 5),
            "bf16": (leg_bf16, 5),
            "bf16_bs8": (
                lambda tag, c: det_step_b(params, imgs8, jnp.float32(tag), c),
                5,
            ),
            "bf16_bs16": (
                lambda tag, c: det_step_b(params, imgs16, jnp.float32(tag), c),
                3,
            ),
        },
        rounds=5, warmup=2,
    )

    def iqr(ts, n=batch):
        lo, hi = np.percentile(ts, [25, 75])
        return [round(n / hi, 1), round(n / lo, 1)]

    out = {
        "detector_frames_per_sec": round(batch / float(np.median(t["f32"])), 1),
        "detector_iqr": iqr(t["f32"]),
        "detector_bf16_frames_per_sec": round(
            batch / float(np.median(t["bf16"])), 1
        ),
        "detector_bf16_iqr": iqr(t["bf16"]),
        "detector_batch": batch,
        "detector_bs8_bf16_frames_per_sec": round(
            8 / float(np.median(t["bf16_bs8"])), 1
        ),
        "detector_bs8_bf16_iqr": iqr(t["bf16_bs8"], 8),
        "detector_bs16_bf16_frames_per_sec": round(
            16 / float(np.median(t["bf16_bs16"])), 1
        ),
        "detector_bs16_bf16_iqr": iqr(t["bf16_bs16"], 16),
    }
    # MFU vs the bf16 MXU peak (the R101-C4 conv stack dominates; the
    # Pallas RoIAlign's flops are uncounted but negligible next to it)
    zero = jnp.float32(0.0)
    for key, step, args, n in (
        ("detector_mfu", step_f32, (params, imgs), batch),
        ("detector_bf16_mfu", step_bf16, (params, imgs), batch),
        ("detector_bs8_bf16_mfu", det_step_b, (params, imgs8), 8),
        ("detector_bs16_bf16_mfu", det_step_b, (params, imgs16), 16),
    ):
        cost = _xla_cost(step, *args, zero, zero)
        if cost:
            leg = {"detector_mfu": "f32", "detector_bf16_mfu": "bf16",
                   "detector_bs8_bf16_mfu": "bf16_bs8",
                   "detector_bs16_bf16_mfu": "bf16_bs16"}[key]
            out[key] = round(
                cost["flops"] / float(np.median(t[leg]))
                / V5E_PEAK_BF16_FLOPS, 4
            )
            out.setdefault(
                "detector_flops_per_frame", round(cost["flops"] / n)
            )
    return out


def bench_tracker():
    """Whole-video scan tracker at full reference cascade depth,
    batched over videos (deep_sort equivalent:
    /root/reference/deep_sort/deep_sort/tracker.py:10-138)."""
    from tspn_tpu.tracking.tracker import TrackerConfig, track_videos_batch

    b, t_frames, d, f = 8, 100, 16, 128
    cfg = TrackerConfig(cascade_depth=30)
    rng = np.random.RandomState(0)
    # plausible drifting boxes so tracks persist across frames
    base = rng.uniform(50, 400, (b, 1, d, 2))
    drift = np.cumsum(rng.randn(b, t_frames, d, 2) * 2.0, axis=1)
    xy = (base + drift).astype(np.float32)
    wh = rng.uniform(20, 60, (b, 1, d, 2)).astype(np.float32)
    tlwh = jnp.asarray(
        np.concatenate([xy, np.broadcast_to(wh, xy.shape)], axis=-1)
    )
    feats = jnp.asarray(rng.randn(b, t_frames, d, f).astype(np.float32))
    mask = jnp.ones((b, t_frames, d), bool)

    @jax.jit
    def trk_step(boxes, fts, tag, carry):
        boxes = boxes + 1e-3 * (tag + carry)
        outs = track_videos_batch(cfg, boxes, fts, mask)
        return jnp.sum(outs["tlwh"]) * 1e-9

    t = _time_interleaved(
        {"trk": (lambda tag, c: trk_step(tlwh, feats, jnp.float32(tag), c), 3)},
        rounds=5, warmup=2,
    )
    fps = (b * t_frames) / float(np.median(t["trk"]))
    lo, hi = np.percentile(t["trk"], [25, 75])
    out = {
        "tracker_frames_per_sec": round(fps, 1),
        "tracker_iqr": [
            round(b * t_frames / hi, 1), round(b * t_frames / lo, 1)
        ],
        "tracker_batch": b,
        "tracker_cascade_depth": cfg.cascade_depth,
    }
    # the tracker is latency/sequential-scan bound, not FLOP bound — its
    # MFU is expected to be tiny; reported so "fast" is falsifiable.
    # XLA cost_analysis attributes ~0 flops to while/scan BODIES, so use
    # an analytic per-frame count of the dominant dense work instead:
    # Kalman predict/update/gating on (K,8,8) covariances + the (K,D)
    # appearance cost against a (K,G,F) gallery + LAPJV's (K+D)^3 bound.
    k_trk, g, fdim = cfg.max_tracks, cfg.gallery_size, f
    flops_frame = (
        k_trk * (8 * 8 * 8 * 4)            # F@cov@F^T, gain solves, etc.
        + k_trk * g * fdim * 2 * d         # gallery @ detection features
        + (k_trk + d) ** 3                 # LAPJV worst-case bound
    )
    out["tracker_flops_per_frame_analytic"] = flops_frame
    out["tracker_mfu_analytic"] = round(
        flops_frame * b * t_frames / float(np.median(t["trk"]))
        / V5E_PEAK_BF16_FLOPS, 8,
    )
    return out


def _run_guarded(out, name, fn, timeout_s):
    """Run an optional leg with a SIGALRM bound so a tunnel hang cannot
    lose the whole bench line (best effort: the alarm fires at the next
    Python bytecode boundary)."""
    import signal

    def _raise(signum, frame):
        raise TimeoutError(f"{name} leg exceeded {timeout_s}s")

    old = signal.signal(signal.SIGALRM, _raise)
    signal.alarm(timeout_s)
    try:
        out.update(fn())
    except Exception as exc:  # noqa: BLE001 — primary metric still reports
        out[f"{name}_error"] = f"{type(exc).__name__}: {exc}"[:200]
    finally:
        signal.alarm(0)
        signal.signal(signal.SIGALRM, old)


def main():
    start = time.perf_counter()
    out = {
        "metric": "tracklet_pairs_scored_per_sec_per_chip",
        "unit": "pairs/s",
    }
    # the primary leg is guarded too: a tunnel hang mid-kernels must
    # still emit the one JSON line (with a kernels_error field) rather
    # than lose the whole bench record
    _run_guarded(out, "kernels", bench_kernels, 1500)
    if "value" not in out:
        out.setdefault("value", 0.0)
        out.setdefault("vs_baseline", 0.0)
    _run_guarded(out, "e2e", bench_e2e, 900)
    # secondary stage legs (skippable: TSPN_BENCH_FAST=1, or if the
    # primary legs already ate the time budget on a slow tunnel)
    if not os.environ.get("TSPN_BENCH_FAST") and (
        time.perf_counter() - start < 1500
    ):
        _run_guarded(out, "detector", bench_detector, 600)
        _run_guarded(out, "tracker", bench_tracker, 600)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
