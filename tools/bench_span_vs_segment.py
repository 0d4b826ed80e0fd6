"""Measure the paper's headline efficiency claim in-framework:
span-mode inference ("what and when to look", one span model pass per
video) vs segment-mode inference (score EVERY 30/15-overlapped segment,
then greedy association) on the same fixture and the same chip.

The TSPN paper (arXiv:2107.07154; /root/reference/README.md:17) claims
the span formulation is "twice as efficient as a popular segment-based
approach" because stride-15 segment tiling re-scores every frame's
pairs twice and re-associates them on the host, while span proposals
classify each candidate pair ONCE over its proposed duration. The
reference never ships runnable DPN/span inference, so the claim is not
measurable there; here both modes are complete, so this probe puts a
number on it.

Protocol: synthetic fixture (same generator as bench.py's e2e leg),
both modes warmed (trace/compile excluded), wall-clock of the
scored+assembled portion per mode, medians over repeats. Modes share
the same per-segment h5 artifacts; timing is what differs (segment mode
pays per-segment scoring + host association, span mode pays per-video
chain building + span scoring).

Quality column (VERDICT r3 item 3): BOTH models are trained on the
fixture's train split (segment: the baseline recipe of
tests/test_e2e_pipeline.py; span: the joint objective), and both modes'
outputs are scored with the SAME relation evaluation
(tspn_tpu/evaluation/relation.py, the reference's
visual_relation_detection.py:63 metrics) against the fixture GT — so
the speed ratio is reported AT a measured quality, not in a vacuum.

Usage: python tools/bench_span_vs_segment.py [--repeats 3] [--cpu]
Prints one JSON line.
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import tempfile
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--repeats", type=int, default=3)
    # 600: the video-level model converges slower than the segment one
    # (DESIGN §8 round 4); quality numbers are recorded at this budget
    parser.add_argument("--span_iters", type=int, default=600)
    parser.add_argument(
        "--cpu", action="store_true", help="force the CPU backend"
    )
    # scaling knobs (round 4): DESIGN §8 diagnoses the span-mode
    # quality gap as relness memorization of a tiny video-level
    # training set; sweeping --num_train measures whether the gap
    # closes as the video count grows (the claim's test, not a guess)
    parser.add_argument("--num_train", type=int, default=6)
    parser.add_argument("--num_test", type=int, default=6)
    parser.add_argument(
        "--augment", action="store_true",
        help="train the span model with temporal-crop + feature-dropout "
             "augmentation (runtime/span_train.augment_video_batch)",
    )
    parser.add_argument(
        "--aug_shift", type=float, default=0.25,
        help="max temporal-crop fraction (augment_video_batch "
             "max_shift_frac); ablation knob",
    )
    parser.add_argument(
        "--aug_dropout", type=float, default=0.1,
        help="feature dropout rate (augment_video_batch feat_dropout); "
             "ablation knob",
    )
    args = parser.parse_args()
    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")

    import jax

    from tspn_tpu import association
    from tspn_tpu.config import get_default_config
    from tspn_tpu.data.annotations import VidVRD
    from tspn_tpu.data.segments import set_output_dir
    from tspn_tpu.data.synthetic import (
        generate_annotations,
        generate_segment_artifacts,
    )
    from tspn_tpu.data.vrdataset import SegmentDataset
    from tspn_tpu.evaluation import eval_visual_relation
    from tspn_tpu.models.tspn import build_model
    from tspn_tpu.runtime.predict import build_infer, predict_segments
    from tspn_tpu.runtime.span_predict import detect_spans
    from tspn_tpu.runtime.span_train import train_span_model
    from tspn_tpu.runtime.train import train

    work = tempfile.mkdtemp(prefix="tspn_span_vs_seg_")
    try:
        data_dir = os.path.join(work, "vidvrd")
        out_dir = os.path.join(work, "out")
        # per_split_seed: the test videos must be IDENTICAL across
        # --num_train values or the scaling sweep compares different
        # eval sets (the single-stream default draws test after train)
        generate_annotations(
            data_dir, num_train=args.num_train, num_test=args.num_test,
            frame_count=120,
            objects_per_video=4, relations_per_video=5, seed=5,
            num_categories=8, num_predicate_types=16,
            per_split_seed=True,
        )
        dataset = VidVRD(
            data_dir, os.path.join(data_dir, "videos"), ["train", "test"]
        )
        set_output_dir(out_dir)
        # per_split_seed here too: test-split FEATURES and proposal
        # jitter must also be byte-identical across --num_train values
        # (advisor finding r4 — vIoU matching depends on the jitter)
        generate_segment_artifacts(
            dataset, out_dir, seed=5, per_split_seed=True
        )

        cfg = get_default_config()
        cfg.PREDICT.PREDICATE_NUM = dataset.get_predicate_num()
        cfg.DATASET.TEST_BATCH_SIZE = 16
        cfg.SOLVER.MAX_ITER = 150
        cfg.SOLVER.SCHEDULER.MILESTONES = [80, 120]
        cfg.SOLVER.SCHEDULER.WARMUP_ITERS = 30
        cfg.ETC.SAVE_FREQ = 150
        cfg.BUCKETS.SEGMENTS_PER_STEP = 8

        # segment leg = the shipped baseline semantics (PPN/DPN off,
        # configs/baseline.yaml:16-17); span leg = the joint objective
        cfg_seg = cfg.clone()
        cfg_seg.RELPN.USE_PPN = False
        cfg_seg.RELPN.USE_DPN = False
        cfg_span = cfg.clone()
        cfg_span.RELPN.USE_PPN = False
        cfg_span.RELPN.USE_DPN = True
        cfg_span.RELPN.DPN.JOINT_OBJECTIVE = True

        # ---- train both models on the fixture's train split ----------
        seg_model = build_model(cfg_seg)
        seg_state = train(cfg_seg, dataset)
        seg_params = seg_state.params
        span_model, span_params = train_span_model(
            cfg_span, dataset, max_iter=args.span_iters, lr=2e-3,
            augment=args.augment,
            aug_kwargs={"max_shift_frac": args.aug_shift,
                        "feat_dropout": args.aug_dropout},
        )

        # ---- segment mode: per-segment scoring + greedy association --
        cfg = cfg_seg
        test_ds = SegmentDataset(cfg, dataset, phase="test")
        infer = build_infer(cfg, seg_model, seg_params, test_ds)

        def run_segment_mode():
            rels = predict_segments(cfg, seg_model, seg_params, test_ds,
                                    infer=infer)
            by_vid = {}
            for index, payload in rels.items():
                by_vid.setdefault(index[0], []).append((index, payload))
            return {
                vid: association.greedy_relational_association(
                    dataset, v, max_traj_num_in_clip=100
                )
                for vid, v in by_vid.items()
            }

        # ---- span mode: one span pass per video ----------------------
        def run_span_mode():
            return detect_spans(cfg_span, dataset, span_model, span_params)

        n_segments = len(test_ds)
        n_videos = len(dataset.get_index("test"))

        for fn in (run_segment_mode, run_span_mode):  # warm both
            fn()
        seg_times, span_times = [], []
        for _ in range(args.repeats):
            t0 = time.perf_counter()
            seg_out = run_segment_mode()
            seg_times.append(time.perf_counter() - t0)
            t0 = time.perf_counter()
            span_out = run_span_mode()
            span_times.append(time.perf_counter() - t0)

        seg_t = float(np.median(seg_times))
        span_t = float(np.median(span_times))

        # ---- quality: same relation metrics on both modes' outputs ---
        groundtruth = {
            vid: dataset.get_relation_insts(vid)
            for vid in dataset.get_index("test")
        }
        seg_map, seg_rec, _ = eval_visual_relation(
            groundtruth, seg_out, verbose=False
        )
        span_map, span_rec, _ = eval_visual_relation(
            groundtruth, span_out, verbose=False
        )
        print(json.dumps({
            "metric": "span_vs_segment_inference_speedup",
            "value": round(seg_t / span_t, 2),
            "unit": "x (segment-mode time / span-mode time)",
            "segment_mode_s": round(seg_t, 3),
            "span_mode_s": round(span_t, 3),
            "num_videos": n_videos,
            "num_train_videos": args.num_train,
            "num_segments": n_segments,
            "segment_mode_relations": sum(len(v) for v in seg_out.values()),
            "span_mode_relations": sum(len(v) for v in span_out.values()),
            "segment_mode_map": round(float(seg_map), 4),
            "segment_mode_r50": round(float(seg_rec[50]), 4),
            "span_mode_map": round(float(span_map), 4),
            "span_mode_r50": round(float(span_rec[50]), 4),
            "span_augment": bool(args.augment),
            "aug_shift": args.aug_shift if args.augment else None,
            "aug_dropout": args.aug_dropout if args.augment else None,
            "backend": jax.default_backend(),
        }))
    finally:
        shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    main()
