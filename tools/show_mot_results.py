"""Render MOT tracking results onto sequence frames.

Counterpart of /root/reference/deep_sort/show_results.py +
generate_videos.py (OpenCV playback/export): draws each frame's tracked
boxes colored by identity, writes annotated frames, and assembles an
mp4 when ffmpeg is on PATH.

--interactive: a stepping viewer equivalent of the reference's
ImageViewer loop (application_util/image_viewer.py: space pauses, s
steps, ESC quits). Uses a matplotlib window when a display is
available; otherwise a terminal-driven loop that renders the current
frame to disk and reads single-key commands — same controls:
[Enter/s] step, [b] back, [a] autoplay toggle, [g N] goto frame,
[q] quit.
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


def _load_results(sequence_dir: str, result_file: str):
    """-> (sorted frame file list, img_dir, {frame_idx: [(tid, tlwh)]})."""
    rows = np.loadtxt(result_file, delimiter=",").reshape(-1, 10)
    by_frame = defaultdict(list)
    for r in rows:
        by_frame[int(r[0])].append((int(r[1]), r[2:6]))
    img_dir = os.path.join(sequence_dir, "img1")
    if not os.path.isdir(img_dir):
        img_dir = sequence_dir
    frames = sorted(
        f for f in os.listdir(img_dir) if f.endswith((".jpg", ".png"))
    )
    return frames, img_dir, by_frame


def _draw_frame(img_dir: str, fname: str, by_frame) -> Image.Image:
    frame_idx = int(os.path.splitext(fname)[0])
    with Image.open(os.path.join(img_dir, fname)) as im:
        img = im.convert("RGB")
    draw = ImageDraw.Draw(img)
    for tid, (x, y, w, h) in by_frame.get(frame_idx, []):
        color = _PALETTE[tid % len(_PALETTE)]
        draw.rectangle([x, y, x + w, y + h], outline=color, width=2)
        draw.text((x + 2, y + 2), str(tid), fill=color)
    return img


def interactive_view(
    sequence_dir: str, result_file: str, out_dir: str = "mot_viz",
    input_fn=input, display_fn=None, max_steps: int | None = None,
) -> int:
    """Step through tracked frames interactively (image_viewer.py parity).

    Controls: Enter/s = next, b = back, a = autoplay toggle,
    g <N> = goto frame N (list position), q = quit. Returns the number
    of frames displayed. input_fn/display_fn/max_steps are injectable
    for testing and headless use.
    """
    frames, img_dir, by_frame = _load_results(sequence_dir, result_file)
    if not frames:
        print("no frames found")
        return 0

    plt = None
    if display_fn is None:
        if os.environ.get("DISPLAY") or os.environ.get("MPLBACKEND"):
            try:
                import matplotlib.pyplot as plt  # noqa: F811
            except Exception:  # noqa: BLE001 — fall back to file mode
                plt = None
        os.makedirs(out_dir, exist_ok=True)

    pos, autoplay, shown = 0, False, 0
    fig = ax = im_artist = None
    while 0 <= pos < len(frames):
        if max_steps is not None and shown >= max_steps:
            break
        img = _draw_frame(img_dir, frames[pos], by_frame)
        n_tracks = len(by_frame.get(int(os.path.splitext(frames[pos])[0]), []))
        status = f"[{pos + 1}/{len(frames)}] {frames[pos]} — {n_tracks} tracks"
        if display_fn is not None:
            display_fn(img, status)
        elif plt is not None:
            if fig is None:
                fig, ax = plt.subplots()
                ax.set_axis_off()
                im_artist = ax.imshow(np.asarray(img))
                plt.ion()
                plt.show()
            else:
                im_artist.set_data(np.asarray(img))
            ax.set_title(status)
            fig.canvas.draw_idle()
            plt.pause(0.001)
        else:
            path = os.path.join(out_dir, "current.png")
            img.save(path)
            print(f"{status} -> {path}")
        shown += 1

        if autoplay:
            pos += 1
            continue
        try:
            cmd = input_fn(
                "[Enter/s] next  [b] back  [a] autoplay  [g N] goto  [q] quit > "
            ).strip().lower()
        except EOFError:
            break
        if cmd in ("q", "esc"):
            break
        elif cmd == "b":
            pos = max(0, pos - 1)
        elif cmd == "a":
            autoplay = True
            pos += 1
        elif cmd.startswith("g"):
            try:
                pos = min(max(int(cmd[1:].strip()) - 1, 0), len(frames) - 1)
            except ValueError:
                print("usage: g <frame number>")
        else:  # Enter / s
            pos += 1
    return shown


def main():
    parser = argparse.ArgumentParser(description="Show MOT tracking results")
    parser.add_argument("--sequence_dir", required=True)
    parser.add_argument("--result_file", required=True)
    parser.add_argument("--output_dir", default="mot_viz")
    parser.add_argument("--video_out", default=None)
    parser.add_argument(
        "--interactive", action="store_true",
        help="step through frames (image_viewer.py-style controls)",
    )
    args = parser.parse_args()
    if args.interactive:
        n = interactive_view(
            args.sequence_dir, args.result_file, args.output_dir
        )
        print(f"viewed {n} frames")
        return
    n = render_sequence(
        args.sequence_dir, args.result_file, args.output_dir,
        video_out=args.video_out,
    )
    print(f"rendered {n} frames to {args.output_dir}")


if __name__ == "__main__":
    main()
