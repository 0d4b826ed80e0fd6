"""Batch track-overlay video export over MOTChallenge-style results.

Counterpart of /root/reference/deep_sort/generate_videos.py:38-66: for
every result file <sequence>.txt in --result_dir whose sequence exists
under --mot_dir, render identity-colored track overlays onto the
sequence frames and write <sequence>.mp4 (when ffmpeg is on PATH; the
annotated frames are always written). Frame rate comes from the
sequence's seqinfo.ini when present, like the reference's update_ms
default.
"""

from __future__ import annotations

import argparse
import configparser
import os
import shutil

try:  # imported as tools.generate_track_videos (repo root on sys.path)
    from tools.show_mot_results import render_sequence
except ImportError:  # run directly: python tools/generate_track_videos.py
    from show_mot_results import render_sequence


def sequence_fps(sequence_dir: str, default: int = 25) -> int:
    """frameRate from seqinfo.ini (MOTChallenge layout), else default."""
    path = os.path.join(sequence_dir, "seqinfo.ini")
    if not os.path.exists(path):
        return default
    parser = configparser.ConfigParser()
    parser.read(path)
    try:
        return int(float(parser["Sequence"]["frameRate"]))
    except (KeyError, ValueError):
        return default


def generate_videos(
    mot_dir: str, result_dir: str, output_dir: str, fps: int | None = None
) -> list:
    """Render every sequence with results; returns [(sequence, n_frames,
    video_path_or_None)]."""
    os.makedirs(output_dir, exist_ok=True)
    have_ffmpeg = shutil.which("ffmpeg") is not None
    rendered = []
    for result_txt in sorted(os.listdir(result_dir)):
        if not result_txt.endswith(".txt"):
            continue
        sequence = os.path.splitext(result_txt)[0]
        sequence_dir = os.path.join(mot_dir, sequence)
        if not os.path.isdir(sequence_dir):
            continue
        frame_out = os.path.join(output_dir, sequence)
        video_out = (
            os.path.join(output_dir, f"{sequence}.mp4") if have_ffmpeg else None
        )
        n = render_sequence(
            sequence_dir,
            os.path.join(result_dir, result_txt),
            frame_out,
            fps=fps or sequence_fps(sequence_dir),
            video_out=video_out,
        )
        rendered.append((sequence, n, video_out))
        print(f"{sequence}: {n} frames -> {video_out or frame_out}")
    return rendered


def main():
    parser = argparse.ArgumentParser(
        description="Export track-overlay videos for MOT results"
    )
    parser.add_argument("--mot_dir", required=True,
                        help="MOTChallenge directory (train or test)")
    parser.add_argument("--result_dir", required=True,
                        help="folder with <sequence>.txt tracking output")
    parser.add_argument("--output_dir", required=True)
    parser.add_argument("--fps", type=int, default=None,
                        help="override the per-sequence seqinfo.ini rate")
    args = parser.parse_args()
    rendered = generate_videos(
        args.mot_dir, args.result_dir, args.output_dir, fps=args.fps
    )
    if not rendered:
        raise SystemExit("no result/sequence pairs found")


if __name__ == "__main__":
    main()
