"""Visualize GT or predicted relations on video frames.

Counterpart of /root/reference/visualize.py:28-125 (OpenCV mp4 writer)
using PIL: draws per-frame boxes + triplet labels for every relation
active at that frame, writes annotated frames to a directory, and — when
ffmpeg is on PATH — assembles an mp4.
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import subprocess
from typing import Dict, List, Optional

import numpy as np
from PIL import Image, ImageDraw

_PALETTE = [
    (235, 87, 87), (87, 148, 235), (106, 212, 114), (242, 201, 76),
    (155, 81, 224), (242, 153, 74), (86, 204, 194), (229, 115, 183),
]


def _color(i: int):
    return _PALETTE[i % len(_PALETTE)]


def draw_relations_on_frame(
    image: np.ndarray, fid: int, relations: List[dict], top_k: int = 10
) -> np.ndarray:
    """Overlay boxes + '<sub> <pred> <obj>' labels for relations whose
    duration contains fid."""
    img = Image.fromarray(np.asarray(image, np.uint8))
    draw = ImageDraw.Draw(img)
    shown = 0
    for ridx, rel in enumerate(relations):
        fs, fe = rel["duration"]
        if not (fs <= fid < fe) or shown >= top_k:
            continue
        color = _color(ridx)
        sub_box = rel["sub_traj"][fid - fs]
        obj_box = rel["obj_traj"][fid - fs]
        draw.rectangle(list(map(float, sub_box)), outline=color, width=2)
        draw.rectangle(list(map(float, obj_box)), outline=color, width=2)
        label = "{} {} {} ({:.2f})".format(*rel["triplet"], rel.get("score", 1.0))
        draw.text((float(sub_box[0]) + 2, float(sub_box[1]) + 2), label, fill=color)
        # subject -> object line between centers
        sc = ((sub_box[0] + sub_box[2]) / 2, (sub_box[1] + sub_box[3]) / 2)
        oc = ((obj_box[0] + obj_box[2]) / 2, (obj_box[1] + obj_box[3]) / 2)
        draw.line([sc, oc], fill=color, width=1)
        shown += 1
    return np.asarray(img)


def visualize_video(
    vid: str,
    relations: List[dict],
    frame_dir: str,
    out_dir: str,
    fps: int = 25,
    max_relations: int = 10,
    video_out: Optional[str] = None,
) -> int:
    """Render frames from frame_dir (%05d.jpg) with overlays; returns the
    number of frames written. Writes an mp4 when ffmpeg is available and
    video_out is set."""
    relations = sorted(relations, key=lambda r: -r.get("score", 1.0))[:max_relations]
    src = os.path.join(frame_dir, vid)
    dst = os.path.join(out_dir, vid)
    os.makedirs(dst, exist_ok=True)
    count = 0
    for fname in sorted(os.listdir(src)):
        if not fname.endswith(".jpg"):
            continue
        fid = int(os.path.splitext(fname)[0]) - 1  # frames are 1-based on disk
        with Image.open(os.path.join(src, fname)) as im:
            frame = np.asarray(im.convert("RGB"))
        out = draw_relations_on_frame(frame, fid, relations)
        Image.fromarray(out).save(os.path.join(dst, fname))
        count += 1
    if video_out and shutil.which("ffmpeg"):
        subprocess.run(
            ["ffmpeg", "-y", "-framerate", str(fps), "-i",
             os.path.join(dst, "%05d.jpg"), "-pix_fmt", "yuv420p", video_out],
            check=True, capture_output=True,
        )
    return count


def main():
    parser = argparse.ArgumentParser(description="Visualize video relations")
    parser.add_argument("--data_dir", required=True)
    parser.add_argument("--dataset", default="vidvrd")
    parser.add_argument("--vid", required=True)
    parser.add_argument("--frame_dir", default="image")
    parser.add_argument("--out_dir", default="viz")
    parser.add_argument("--prediction", default=None,
                        help="prediction JSON; omit to draw ground truth")
    parser.add_argument("--video_out", default=None)
    args = parser.parse_args()

    if args.prediction:
        with open(args.prediction) as f:
            relations = json.load(f)["results"].get(args.vid, [])
    else:
        from tspn_tpu.data import BaseVidOR, BaseVidVRD

        root = os.path.join(args.data_dir, args.dataset)
        if args.dataset == "vidvrd":
            ds = BaseVidVRD(root, os.path.join(root, "videos"), ["train", "test"])
        else:
            ds = BaseVidOR(os.path.join(root, "annotation"),
                           os.path.join(root, "videos"), ["train", "test"])
        relations = [
            {
                "triplet": list(r["triplet"]),
                "score": 1.0,
                "duration": list(r["duration"]),
                "sub_traj": r["sub_traj"],
                "obj_traj": r["obj_traj"],
            }
            for r in ds.get_relation_insts(args.vid)
        ]
    n = visualize_video(
        args.vid, relations, args.frame_dir, args.out_dir,
        video_out=args.video_out,
    )
    print(f"wrote {n} annotated frames to {args.out_dir}/{args.vid}")


if __name__ == "__main__":
    main()
