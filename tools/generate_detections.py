"""Append appearance features to MOT detection files.

Counterpart of /root/reference/deep_sort/tools/generate_detections.py:
for each MOTChallenge sequence, crop every detection's patch, encode it
with the appearance network (flax AppearanceEncoder instead of the TF1
frozen graph), and write rows [10 MOT columns + feature] as .npy.
"""

from __future__ import annotations

import argparse
import os

import jax
import jax.numpy as jnp
import numpy as np

from tspn_tpu.models.reid import AppearanceEncoder, extract_patches
from tspn_tpu.runtime.checkpoint import load_checkpoint


def _load_encoder(checkpoint: str | None):
    encoder = AppearanceEncoder()
    dummy = jnp.zeros((1, 128, 64, 3))
    variables = encoder.init(jax.random.PRNGKey(0), dummy, train=False)
    if checkpoint:
        restored = load_checkpoint(checkpoint, variables)
        variables = restored["params"]

    @jax.jit
    def encode(patches):
        return encoder.apply(variables, patches, train=False)

    return lambda p: np.asarray(encode(jnp.asarray(p)))


def generate_sequence(sequence_dir: str, det_file: str, out_file: str, encode,
                      batch_size: int = 32):
    from PIL import Image

    detections = np.loadtxt(det_file, delimiter=",").reshape(-1, 10)
    img_dir = os.path.join(sequence_dir, "img1")
    frames = {
        int(os.path.splitext(f)[0]): os.path.join(img_dir, f)
        for f in os.listdir(img_dir)
        if f.endswith((".jpg", ".png"))
    }
    rows_out = []
    for frame_idx in sorted(set(detections[:, 0].astype(int))):
        rows = detections[detections[:, 0].astype(int) == frame_idx]
        with Image.open(frames[frame_idx]) as im:
            image = np.asarray(im.convert("RGB"))
        patches = extract_patches(image, rows[:, 2:6])
        feats = np.concatenate(
            [encode(patches[i : i + batch_size])
             for i in range(0, len(patches), batch_size)]
        ) if len(patches) else np.zeros((0, 128))
        rows_out.append(np.concatenate([rows, feats], axis=1))
    out = np.concatenate(rows_out) if rows_out else np.zeros((0, 138))
    np.save(out_file, out.astype(np.float32))
    return out


def main():
    parser = argparse.ArgumentParser(description="Generate re-ID detections")
    parser.add_argument("--model", default=None, help="encoder checkpoint (.pt)")
    parser.add_argument("--mot_dir", required=True)
    parser.add_argument("--detection_dir", default=None,
                        help="det.txt root; defaults to mot_dir")
    parser.add_argument("--output_dir", default="./detections")
    args = parser.parse_args()

    encode = _load_encoder(args.model)
    os.makedirs(args.output_dir, exist_ok=True)
    det_dir = args.detection_dir or args.mot_dir
    for sequence in sorted(os.listdir(args.mot_dir)):
        print(f"Processing {sequence}")
        generate_sequence(
            os.path.join(args.mot_dir, sequence),
            os.path.join(det_dir, sequence, "det", "det.txt"),
            os.path.join(args.output_dir, f"{sequence}.npy"),
            encode,
        )


if __name__ == "__main__":
    main()
