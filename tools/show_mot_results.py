"""Render MOT tracking results onto sequence frames.

Counterpart of /root/reference/deep_sort/show_results.py +
generate_videos.py (OpenCV playback/export): draws each frame's tracked
boxes colored by identity, writes annotated frames, and assembles an
mp4 when ffmpeg is on PATH.
"""

from __future__ import annotations

import argparse
import os
import shutil
import subprocess
from collections import defaultdict

import numpy as np
from PIL import Image, ImageDraw

_PALETTE = [
    (235, 87, 87), (87, 148, 235), (106, 212, 114), (242, 201, 76),
    (155, 81, 224), (242, 153, 74), (86, 204, 194), (229, 115, 183),
]


def render_sequence(
    sequence_dir: str, result_file: str, out_dir: str,
    fps: int = 25, video_out: str | None = None,
) -> int:
    rows = np.loadtxt(result_file, delimiter=",").reshape(-1, 10)
    by_frame = defaultdict(list)
    for r in rows:
        by_frame[int(r[0])].append((int(r[1]), r[2:6]))

    img_dir = os.path.join(sequence_dir, "img1")
    if not os.path.isdir(img_dir):
        img_dir = sequence_dir
    os.makedirs(out_dir, exist_ok=True)
    count = 0
    for fname in sorted(os.listdir(img_dir)):
        if not fname.endswith((".jpg", ".png")):
            continue
        frame_idx = int(os.path.splitext(fname)[0])
        with Image.open(os.path.join(img_dir, fname)) as im:
            img = im.convert("RGB")
        draw = ImageDraw.Draw(img)
        for tid, (x, y, w, h) in by_frame.get(frame_idx, []):
            color = _PALETTE[tid % len(_PALETTE)]
            draw.rectangle([x, y, x + w, y + h], outline=color, width=2)
            draw.text((x + 2, y + 2), str(tid), fill=color)
        img.save(os.path.join(out_dir, fname))
        count += 1
        last_name = fname
    if video_out and count and shutil.which("ffmpeg"):
        # derive the input pattern from the actual frame names (MOT16/17
        # uses six digits, other dumps five; extensions vary)
        stem, ext = os.path.splitext(last_name)
        pattern = os.path.join(out_dir, f"%0{len(stem)}d{ext}")
        proc = subprocess.run(
            ["ffmpeg", "-y", "-framerate", str(fps), "-i", pattern,
             "-pix_fmt", "yuv420p", video_out],
            capture_output=True,
        )
        if proc.returncode != 0:
            raise RuntimeError(f"ffmpeg failed: {proc.stderr.decode()[-500:]}")
    return count


def main():
    parser = argparse.ArgumentParser(description="Show MOT tracking results")
    parser.add_argument("--sequence_dir", required=True)
    parser.add_argument("--result_file", required=True)
    parser.add_argument("--output_dir", default="mot_viz")
    parser.add_argument("--video_out", default=None)
    args = parser.parse_args()
    n = render_sequence(
        args.sequence_dir, args.result_file, args.output_dir,
        video_out=args.video_out,
    )
    print(f"rendered {n} frames to {args.output_dir}")


if __name__ == "__main__":
    main()
