"""VidOR-scale stress run (VERDICT r3 item 8, SURVEY §5.7's
VidOR-length concern): thousands-of-frames videos in the 80-class
layout driven through the REAL CLI surface — `base.py --preprocess
--train --detect` with configs/vidor.yaml semantics — recording
wall-clock and peak host RSS per stage, plus an iDT-chunking leg
(features/idt.idt_per_slot with the memory-bounded window) on a long
clip.

The reference preprocesses VidOR in "7-8 hours" (README.md:32-33) and
its per-segment Python loops scale linearly with segment count; this
probe pins that the rebuilt pipeline's fixed-shape buckets and
chunked iDT hold at VidOR video lengths on the 1-core host.

Usage: python tools/stress_vidor.py [--frames 3000] [--videos 2]
       [--idt_frames 400] [--cpu]
Prints one JSON line.
"""

from __future__ import annotations

import argparse
import json
import os
import resource
import shutil
import sys
import tempfile
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def rss_mb() -> float:
    return resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1024.0


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--frames", type=int, default=3000)
    parser.add_argument("--videos", type=int, default=2,
                        help="videos per split (training/validation)")
    parser.add_argument("--train_iters", type=int, default=60)
    parser.add_argument("--idt_frames", type=int, default=400)
    parser.add_argument("--idt_hw", type=int, default=192)
    parser.add_argument(
        "--span", action="store_true",
        help="also drive SPAN mode (tspn.yaml semantics: span train + "
             "span detect) at the same video length — the span path is "
             "the reference's intended long-video mechanism "
             "(relpn/dpn_anchor.py:36-48) and stacks videos by "
             "segment-count bucket, so 199-segment buckets are exactly "
             "what this exercises (VERDICT r4 item 6)",
    )
    parser.add_argument("--span_iters", type=int, default=60)
    parser.add_argument("--cpu", action="store_true")
    args = parser.parse_args()

    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")
    import jax  # noqa: F811

    import base as base_mod
    import evaluate as eval_mod  # noqa: F401  (import parity with the CLI)
    from tspn_tpu.config import get_default_config
    from tspn_tpu.data.annotations import VidOR
    from tspn_tpu.data.segments import set_output_dir
    from tspn_tpu.data.synthetic import (
        generate_annotations,
        generate_segment_artifacts,
    )
    from tspn_tpu.data.vocab import VIDOR_OBJECTS, VIDOR_PREDICATES

    out = {"metric": "vidor_scale_stress", "frames_per_video": args.frames,
           "videos_per_split": args.videos, "backend": jax.default_backend()}
    work = tempfile.mkdtemp(prefix="tspn_stress_")
    cwd = os.getcwd()
    try:
        anno_dir = os.path.join(work, "data", "vidor", "annotation")
        t0 = time.perf_counter()
        generate_annotations(
            anno_dir, num_train=args.videos, num_test=args.videos,
            frame_count=args.frames, objects_per_video=5,
            relations_per_video=8, seed=21,
            object_vocab=VIDOR_OBJECTS, predicate_vocab=VIDOR_PREDICATES,
            num_categories=12, num_predicate_types=10,
            vidor_format=True, splits=("training", "validation"),
        )
        out["gen_anno_s"] = round(time.perf_counter() - t0, 1)

        dataset = VidOR(
            anno_dir, os.path.join(work, "videos"),
            ["training", "validation"], low_memory=True,
        )
        out_dir = os.path.join(work, "vidvrd-baseline-output")
        set_output_dir(out_dir)
        t0 = time.perf_counter()
        generate_segment_artifacts(
            dataset, out_dir, splits=("training", "validation"), seed=21,
            num_objects=len(VIDOR_OBJECTS),
        )
        out["gen_artifacts_s"] = round(time.perf_counter() - t0, 1)
        out["rss_after_gen_mb"] = round(rss_mb(), 1)

        cfg = get_default_config()
        cfg.merge_from_file(os.path.join(REPO, "configs", "vidor.yaml"))
        cfg.PREDICT.PREDICATE_NUM = dataset.get_predicate_num()
        cfg.SOLVER.MAX_ITER = args.train_iters
        cfg.SOLVER.SCHEDULER.MILESTONES = [
            int(args.train_iters * 0.6), int(args.train_iters * 0.8)
        ]
        cfg.SOLVER.SCHEDULER.WARMUP_ITERS = max(args.train_iters // 10, 1)
        cfg.ETC.SAVE_FREQ = args.train_iters
        cfg.ETC.MODEL_DUMP_FILE = (
            f"{cfg.MODEL.NAME}_weights_iter_{args.train_iters}.pt"
        )
        cfg.ETC.OUTPUT_DIR = out_dir
        cfg.DATASET.TEST_BATCH_SIZE = 16
        cfg.BUCKETS.SEGMENTS_PER_STEP = 8
        cfg_path = os.path.join(work, "config.yaml")
        with open(cfg_path, "w") as f:
            f.write(cfg.dump())

        # segment-count sanity: 30/15 tiling over `frames` frames
        from tspn_tpu.data.segments import segment_video
        from tspn_tpu.data.vrdataset import SegmentDataset

        segs = segment_video(0, args.frames)
        out["segments_per_video"] = len(segs)
        test_ds = SegmentDataset(cfg, dataset, phase="validation")
        out["test_segments"] = len(test_ds)
        assert len(test_ds) >= args.videos * (args.frames // 15 - 5)

        # fixed-shape bucket check: every record PADS into a configured
        # tracklet bucket (records are raw; bucketing happens at batch
        # time via pick_bucket, data/vrdataset.py)
        from tspn_tpu.data.vrdataset import pick_bucket

        buckets = set()
        for i in range(0, len(test_ds), max(len(test_ds) // 16, 1)):
            rec = test_ds.load_segment(i)
            buckets.add(pick_bucket(rec.num_proposals,
                                    cfg.BUCKETS.NUM_TRACKLETS))
        assert buckets <= set(cfg.BUCKETS.NUM_TRACKLETS), buckets
        out["tracklet_buckets_seen"] = sorted(buckets)

        os.chdir(work)  # ETC.OUTPUT_DIR conventions are cwd-relative
        argv_base = ["base.py", "--config", cfg_path,
                     "--data_dir", "data", "--dataset", "vidor"]
        for stage in ("preprocess", "train", "detect"):
            t0 = time.perf_counter()
            sys.argv = argv_base + [f"--{stage}"]
            base_mod.main()
            out[f"{stage}_s"] = round(time.perf_counter() - t0, 1)
            out[f"rss_after_{stage}_mb"] = round(rss_mb(), 1)

        # the CLI writes a fixed file name regardless of MODEL.NAME,
        # matching the reference contract (base.py:158)
        pred_path = os.path.join(
            out_dir, "models", "baseline_relation_prediction.json"
        )
        assert os.path.exists(pred_path), pred_path
        with open(pred_path) as f:
            payload = json.load(f)
        out["predicted_videos"] = len(payload["results"])
        out["predicted_relations"] = sum(
            len(v) for v in payload["results"].values()
        )
        assert out["predicted_videos"] == args.videos

        # ---- span-mode leg: span train + span detect at the same
        # video length (the 199-segment fixed-shape bucket path) -------
        if args.span:
            from tspn_tpu.runtime.span_predict import detect_spans
            from tspn_tpu.runtime.span_train import train_span_model

            cfg_span = cfg.clone()
            cfg_span.RELPN.USE_PPN = False
            cfg_span.RELPN.USE_DPN = True
            cfg_span.RELPN.DPN.JOINT_OBJECTIVE = True
            rss_before = rss_mb()
            t0 = time.perf_counter()
            span_model, span_params = train_span_model(
                cfg_span, dataset, max_iter=args.span_iters, lr=2e-3,
            )
            out["span_train_s"] = round(time.perf_counter() - t0, 1)
            out["span_train_iters"] = args.span_iters
            out["rss_after_span_train_mb"] = round(rss_mb(), 1)
            t0 = time.perf_counter()
            span_results = detect_spans(
                cfg_span, dataset, span_model, span_params
            )
            out["span_detect_s"] = round(time.perf_counter() - t0, 1)
            out["rss_after_span_detect_mb"] = round(rss_mb(), 1)
            out["span_relations"] = sum(
                len(v) for v in span_results.values()
            )
            out["span_rss_growth_mb"] = round(rss_mb() - rss_before, 1)
            assert set(span_results) == set(dataset.get_index("validation"))
            for rels in span_results.values():
                for r in rels:
                    assert r["duration"][1] <= args.frames
                    assert len(r["sub_traj"]) == (
                        r["duration"][1] - r["duration"][0]
                    )

        # ---- iDT chunking leg: long clip, memory-bounded windows ------
        from tspn_tpu.features.idt import idt_per_slot

        t_f, hw, k = args.idt_frames, args.idt_hw, 4
        rng = np.random.RandomState(0)
        frames = rng.randint(
            0, 255, (t_f, hw, hw, 3)
        ).astype(np.float32)
        tlwh = np.zeros((t_f, k, 4), np.float32)
        tlwh[..., :2] = rng.uniform(0, hw - 40, (t_f, k, 2))
        tlwh[..., 2:] = rng.uniform(16, 40, (t_f, k, 2))
        track_out = {"tlwh": tlwh, "visible": np.ones((t_f, k), bool)}
        rss_before = rss_mb()
        t0 = time.perf_counter()
        assigns = idt_per_slot(frames, track_out, chunk=64)
        out["idt_s"] = round(time.perf_counter() - t0, 1)
        out["idt_frames"] = t_f
        out["idt_rss_growth_mb"] = round(rss_mb() - rss_before, 1)
        assert assigns.shape == (t_f, k, 3000)
        assert np.isfinite(assigns).all()

        out["rss_peak_mb"] = round(rss_mb(), 1)
        print(json.dumps(out))
    finally:
        os.chdir(cwd)
        shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    main()
