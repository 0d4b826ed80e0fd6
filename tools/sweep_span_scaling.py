"""Span-quality scaling curve (VERDICT r4 item 2 / DESIGN §8's own ask).

DESIGN §8 diagnosed span-mode's quality gap as relness memorization of a
tiny video-level training set and predicted the gap closes with more
training VIDEOS — an unmeasured claim until now. This driver runs
tools/bench_span_vs_segment.py at a sweep of --num_train values (test
split pinned byte-identically across sizes via per_split_seed) and
aggregates the span/segment mAP and R@50 ratios into one JSON line.

Interpretation contract (from the VERDICT): if span/segment mAP ratio
trends toward ~1 with size, the data-starvation hypothesis stands; if it
stays flat, the hypothesis is falsified and the relness head needs a
training-side fix.

Usage: python tools/sweep_span_scaling.py [--sizes 6 12 24 48]
       [--cpu] [--span_iters 600]
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--sizes", type=int, nargs="+",
                        default=[6, 12, 24, 48, 96])
    parser.add_argument("--num_test", type=int, default=6)
    parser.add_argument("--span_iters", type=int, default=600)
    parser.add_argument("--repeats", type=int, default=1)
    parser.add_argument("--cpu", action="store_true")
    args = parser.parse_args()

    points = []
    for n in args.sizes:
        cmd = [
            sys.executable, os.path.join(REPO, "tools", "bench_span_vs_segment.py"),
            "--num_train", str(n), "--num_test", str(args.num_test),
            "--span_iters", str(args.span_iters),
            "--repeats", str(args.repeats),
        ]
        if args.cpu:
            cmd.append("--cpu")
        out = subprocess.run(
            cmd, capture_output=True, text=True, cwd=REPO, check=False
        )
        line = out.stdout.strip().splitlines()[-1] if out.stdout.strip() else ""
        try:
            rec = json.loads(line)
        except (json.JSONDecodeError, IndexError):
            print(json.dumps({
                "num_train": n, "error": (out.stderr or out.stdout)[-400:],
            }), file=sys.stderr)
            continue
        point = {
            "num_train": n,
            "segment_map": rec["segment_mode_map"],
            "span_map": rec["span_mode_map"],
            "segment_r50": rec["segment_mode_r50"],
            "span_r50": rec["span_mode_r50"],
            "map_ratio": round(
                rec["span_mode_map"] / max(rec["segment_mode_map"], 1e-9), 3
            ),
            "r50_ratio": round(
                rec["span_mode_r50"] / max(rec["segment_mode_r50"], 1e-9), 3
            ),
            "speedup": rec["value"],
        }
        points.append(point)
        print("POINT " + json.dumps(point), file=sys.stderr, flush=True)

    print(json.dumps({
        "metric": "span_quality_scaling_curve",
        "span_iters": args.span_iters,
        "num_test": args.num_test,
        "points": points,
    }))


if __name__ == "__main__":
    main()
