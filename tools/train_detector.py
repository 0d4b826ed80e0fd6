"""Detector training CLI.

Counterpart of /root/reference/detectron/train.py:130-173 /
trainer.py:23-40: registers the VidVRD/VidOR frames in COCO format and
trains Faster R-CNN R101-C4 with the reference recipe (IMS_PER_BATCH 4,
lr 2.5e-4, 100k iters, ROI batch 128) on the local device mesh.
"""

from __future__ import annotations

import argparse
import os

from tspn_tpu.data.vocab import VIDOR_OBJECTS, VIDVRD_OBJECTS
from tspn_tpu.detection.coco_format import vidor_to_coco_format, vidvrd_to_coco_format
from tspn_tpu.detection.rcnn import DetectionConfig
from tspn_tpu.detection.train import DetectorTrainConfig, train_detector


def main():
    parser = argparse.ArgumentParser(description="Train Faster R-CNN R101-C4")
    parser.add_argument("--data_dir", required=True)
    parser.add_argument("--dataset", choices=["vidvrd", "vidor"], default="vidvrd")
    parser.add_argument("--split", default="train")
    parser.add_argument("--image_root", default="image")
    parser.add_argument("--max_iter", type=int, default=100000)
    parser.add_argument("--ims_per_batch", type=int, default=4)
    parser.add_argument("--base_lr", type=float, default=2.5e-4)
    parser.add_argument("--image_size", type=int, default=640)
    parser.add_argument("--depth", type=int, default=101)
    parser.add_argument("--output", default="./vidvrd-baseline-output/models/detector.pt")
    args = parser.parse_args()

    root = os.path.join(args.data_dir, args.dataset)
    if args.dataset == "vidvrd":
        records = vidvrd_to_coco_format(root, args.split, args.image_root)
        num_classes = len(VIDVRD_OBJECTS)
    else:
        records = vidor_to_coco_format(
            os.path.join(root, "annotation"), args.split, args.image_root
        )
        num_classes = len(VIDOR_OBJECTS)

    det_cfg = DetectionConfig(num_classes=num_classes, depth=args.depth)
    train_cfg = DetectorTrainConfig(
        ims_per_batch=args.ims_per_batch,
        base_lr=args.base_lr,
        max_iter=args.max_iter,
        image_size=args.image_size,
    )
    train_detector(
        records, det_cfg, train_cfg, use_mesh=True, checkpoint_path=args.output
    )


if __name__ == "__main__":
    main()
