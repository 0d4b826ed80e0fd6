"""Production preprocessing CLI: frames -> detector -> tracker -> segment
artifacts for a whole dataset split.

The real-data counterpart of base.py --preprocess (which fabricates
features from annotations): loads each video's extracted frames
(vidvrd_to_image.sh layout), runs the trained Faster R-CNN, tracks the
whole video with the scan tracker, and writes traj_cls JSON + relation
h5 per 30/15 segment — everything base.py --train / --detect consumes.
"""

from __future__ import annotations

import argparse
import os

import numpy as np


def load_video_frames(frame_dir: str, vid: str, size: int) -> tuple:
    """-> (frames (T, size, size, 3) float32, scale) letterboxed."""
    from PIL import Image

    from tspn_tpu.detection.train import letterbox

    vdir = os.path.join(frame_dir, vid)
    files = sorted(f for f in os.listdir(vdir) if f.endswith(".jpg"))
    frames = []
    scale = 1.0
    for fname in files:
        with Image.open(os.path.join(vdir, fname)) as im:
            img = np.asarray(im.convert("RGB"), np.float32) / 255.0
        boxed, _, scale = letterbox(img, np.zeros((0, 4), np.float32), size)
        frames.append(boxed)
    return np.stack(frames), scale


def main():
    parser = argparse.ArgumentParser(
        description="frames -> detect -> track -> segment artifacts"
    )
    parser.add_argument("--data_dir", required=True)
    parser.add_argument("--dataset", choices=["vidvrd", "vidor"], default="vidvrd")
    parser.add_argument("--split", default="test")
    parser.add_argument("--frame_dir", default="image")
    parser.add_argument("--detector_ckpt", required=True)
    parser.add_argument("--depth", type=int, default=101)
    parser.add_argument("--image_size", type=int, default=640)
    parser.add_argument("--output_dir", default="./vidvrd-baseline-output")
    parser.add_argument("--max_videos", type=int, default=0)
    parser.add_argument("--bf16", action="store_true",
                        help="bfloat16 detector inference (f32 params)")
    parser.add_argument("--appearance",
                        choices=["learned", "geometric", "idt"],
                        default=None,
                        help="visual-feature source for the relation "
                             "features (default: the config default, "
                             "FEATURES.APPEARANCE; 'idt' = pixel "
                             "HoG/HoF/MBH bags, features/idt)")
    parser.add_argument("--reid_ckpt", default=None,
                        help="appearance-encoder checkpoint "
                             "(tracking/reid_train output) for the "
                             "learned source; random-init otherwise")
    args = parser.parse_args()

    import jax
    import jax.numpy as jnp

    from tspn_tpu.config import get_default_config
    from tspn_tpu.data import BaseVidOR, BaseVidVRD
    from tspn_tpu.data.segments import set_output_dir
    from tspn_tpu.data.vocab import VIDOR_OBJECTS, VIDVRD_OBJECTS
    from tspn_tpu.detection.rcnn import DetectionConfig, FasterRCNN
    from tspn_tpu.pipeline import (
        appearance_from_config,
        detect_video_frames,
        extract_video_artifacts,
        idt_from_config,
        slot_features_from_detections,
        tracks_from_detections,
    )
    from tspn_tpu.runtime.checkpoint import load_checkpoint
    from tspn_tpu.runtime.logging_utils import setup_logger

    logger = setup_logger("run_pipeline", save_dir="logs")
    set_output_dir(args.output_dir)

    cfg = get_default_config()
    if args.appearance:
        cfg.FEATURES.APPEARANCE = args.appearance
    encode_fn = None
    if cfg.FEATURES.APPEARANCE == "learned":
        from tspn_tpu.pipeline import build_appearance_encoder

        encode_fn = build_appearance_encoder(args.reid_ckpt)
    logger.info(f"visual-feature source: {cfg.FEATURES.APPEARANCE}")

    root = os.path.join(args.data_dir, args.dataset)
    if args.dataset == "vidvrd":
        basedata = BaseVidVRD(root, os.path.join(root, "videos"),
                              ["train", "test"])
        num_classes = len(VIDVRD_OBJECTS)
    else:
        basedata = BaseVidOR(os.path.join(root, "annotation"),
                             os.path.join(root, "videos"),
                             ["training", "validation"])
        num_classes = len(VIDOR_OBJECTS)

    if cfg.FEATURES.APPEARANCE == "idt":
        # learned BoW codebooks: fit once on train-split frames at
        # preprocess time, stored as an artifact; seeded-random codebooks
        # remain the automatic fallback when no artifact exists
        # (the reference's BoW blocks likewise come from codebooks trained
        # on dataset descriptors, lib/dataset/vrdataset.py:219-242)
        from tspn_tpu.features.idt import (
            fit_codebooks,
            load_codebooks,
            save_codebooks,
            set_codebooks,
        )

        cb_path = os.path.join(args.output_dir, "features",
                               "idt_codebooks.npz")
        if os.path.exists(cb_path):
            set_codebooks(load_codebooks(cb_path))
            logger.info(f"idt codebooks loaded: {cb_path}")
        else:
            fit_split = next(
                (s for s in ("train", "training")
                 if s in basedata.split_index),
                args.split,
            )
            fit_vids = basedata.get_index(fit_split)[:8]
            cbs = fit_codebooks(
                load_video_frames(args.frame_dir, v, args.image_size)[0]
                for v in fit_vids
            )
            save_codebooks(cb_path, cbs)
            set_codebooks(cbs)
            logger.info(
                f"idt codebooks fit on {len(fit_vids)} {fit_split} "
                f"videos -> {cb_path}"
            )

    det_cfg = DetectionConfig(num_classes=num_classes, depth=args.depth)
    model = FasterRCNN(
        cfg=det_cfg, dtype=jnp.bfloat16 if args.bf16 else jnp.float32
    )
    dummy = jnp.zeros((args.image_size, args.image_size, 3))
    params = model.init(
        jax.random.PRNGKey(0), dummy, jnp.zeros((4, 4)),
        jnp.zeros(4, jnp.int32), jnp.zeros(4),
    )["params"]
    params = load_checkpoint(args.detector_ckpt, params)["params"]
    logger.info(f"detector loaded from {args.detector_ckpt}")

    classeme_fn = jax.jit(
        lambda p, im, bx: model.apply({"params": p}, im, bx,
                                      method=FasterRCNN.roi_classeme)
    )

    vids = basedata.get_index(args.split)
    if args.max_videos:
        vids = vids[: args.max_videos]
    total = 0
    for vid in vids:
        frames, scale = load_video_frames(args.frame_dir, vid, args.image_size)
        dets = detect_video_frames(model, params, frames)
        # learned embeddings crop patches from the (letterboxed) frames,
        # so compute them while boxes are still in frame coordinates
        app = appearance_from_config(cfg, frames, dets, encode_fn=encode_fn)
        # boxes back to original-resolution coordinates
        dets["boxes"] = dets["boxes"] / scale
        t_num, d_num = dets["classes"].shape
        classemes = np.stack([
            np.asarray(classeme_fn(
                params, jnp.asarray(frames[t]),
                jnp.asarray(dets["boxes"][t] * scale),
            ))[:, :num_classes]
            for t in range(t_num)
        ])
        dets["classeme"] = classemes
        if app is not None:
            dets["appearance"] = app
        tracks = tracks_from_detections(
            dets, classeme_as_appearance=app is None
        )
        # idt bags pool frame content inside the TRACK slots (computed
        # after tracking); slot boxes go back to frame coordinates
        slot_idt = idt_from_config(
            cfg, frames,
            {"tlwh": tracks["tlwh"] * scale, "visible": tracks["visible"]},
        )

        # per-slot classemes (+ learned appearance) by nearest detection
        # center (masked detection slots excluded)
        per_det = {"classeme": classemes}
        if app is not None:
            per_det["appearance"] = app
        slots = slot_features_from_detections(tracks, dets, per_det)
        slot_classemes = slots["classeme"]
        slot_app = slots.get("appearance")
        n = extract_video_artifacts(
            basedata, vid, tracks, slot_classemes,
            include_gt="train" in args.split, num_classes=num_classes,
            appearance_per_frame=slot_app, idt_per_frame=slot_idt,
        )
        total += n
        logger.info(f"{vid}: {n} segments")
    logger.info(f"wrote artifacts for {total} segments over {len(vids)} videos")


if __name__ == "__main__":
    main()
