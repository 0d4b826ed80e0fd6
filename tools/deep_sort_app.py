"""Tracking CLI: MOT-format detections -> MOT result rows.

Interface-parity with /root/reference/deep_sort/deep_sort_app.py's
argparse surface (sequence_dir/detection_file/output_file/
min_confidence/nms_max_overlap/min_detection_height/
max_cosine_distance/nn_budget/display); the tracking itself runs as one
jitted lax.scan device program per sequence.
"""

from __future__ import annotations

import argparse

from tspn_tpu.tracking.app import run


def parse_args():
    parser = argparse.ArgumentParser(description="Deep SORT (TPU-native)")
    parser.add_argument("--sequence_dir", default=None,
                        help="Path to the MOTChallenge sequence directory (optional)")
    parser.add_argument("--detection_file", required=True,
                        help="Path to custom detections .npy")
    parser.add_argument("--output_file", default="/tmp/hypotheses.txt",
                        help="Path to the tracking output file")
    parser.add_argument("--min_confidence", type=float, default=0.8)
    parser.add_argument("--min_detection_height", type=int, default=0)
    parser.add_argument("--nms_max_overlap", type=float, default=1.0)
    parser.add_argument("--max_cosine_distance", type=float, default=0.2)
    parser.add_argument("--nn_budget", type=int, default=None)
    parser.add_argument("--display", default=False, action="store_true")
    return parser.parse_args()


if __name__ == "__main__":
    args = parse_args()
    results = run(
        args.sequence_dir, args.detection_file, args.output_file,
        args.min_confidence, args.nms_max_overlap, args.min_detection_height,
        args.max_cosine_distance, args.nn_budget, args.display,
    )
    print(f"wrote {len(results)} rows to {args.output_file}")
