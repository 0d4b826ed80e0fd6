"""Detector training CLI.

Counterpart of /root/reference/detectron/train.py:130-173 /
trainer.py:23-40: registers the VidVRD/VidOR frames in COCO format and
trains Faster R-CNN R101-C4 with the reference recipe (IMS_PER_BATCH 4,
lr 2.5e-4, 100k iters, ROI batch 128) on the local device mesh.

Adds the full trainer's surface: the detectron2 ResizeShortestEdge input
policy (--input_policy shortest_edge, 800/1333), periodic in-training
evaluation on a held-out split with best-checkpoint selection
(--eval_split/--eval_every), and multi-machine launch (--num_machines /
--machine_rank / --dist_url; detectron/train.py:159-173's contract over
jax.distributed instead of NCCL).
"""

from __future__ import annotations

import argparse
import os

from tspn_tpu.data.vocab import VIDOR_OBJECTS, VIDVRD_OBJECTS
from tspn_tpu.detection.coco_format import vidor_to_coco_format, vidvrd_to_coco_format
from tspn_tpu.detection.rcnn import DetectionConfig
from tspn_tpu.detection.train import DetectorTrainConfig, launch, train_detector


def _load_records(args, split):
    root = os.path.join(args.data_dir, args.dataset)
    if args.dataset == "vidvrd":
        return vidvrd_to_coco_format(root, split, args.image_root)
    return vidor_to_coco_format(
        os.path.join(root, "annotation"), split, args.image_root
    )


def main():
    parser = argparse.ArgumentParser(description="Train Faster R-CNN R101-C4")
    parser.add_argument("--data_dir", required=True)
    parser.add_argument("--dataset", choices=["vidvrd", "vidor"], default="vidvrd")
    parser.add_argument("--split", default="train")
    parser.add_argument("--image_root", default="image")
    parser.add_argument("--max_iter", type=int, default=100000)
    parser.add_argument("--ims_per_batch", type=int, default=4)
    parser.add_argument("--base_lr", type=float, default=2.5e-4)
    parser.add_argument("--input_policy", choices=["letterbox", "shortest_edge"],
                        default="letterbox")
    parser.add_argument("--image_size", type=int, default=640,
                        help="square letterbox target (letterbox policy)")
    parser.add_argument("--min_size", type=int, default=800)
    parser.add_argument("--max_size", type=int, default=1333)
    parser.add_argument("--depth", type=int, default=101)
    parser.add_argument("--eval_split", default=None,
                        help="held-out split for in-training evaluation")
    parser.add_argument("--eval_every", type=int, default=5000)
    parser.add_argument("--eval_max_images", type=int, default=500)
    parser.add_argument("--output", default="./vidvrd-baseline-output/models/detector.pt")
    # multi-machine launch (detectron2 launch() contract)
    parser.add_argument("--num_machines", type=int, default=1)
    parser.add_argument("--machine_rank", type=int, default=0)
    parser.add_argument("--dist_url", default=None)
    parser.add_argument("--bf16", action="store_true",
                        help="bf16 activations, f32 params/grads")
    args = parser.parse_args()

    records = _load_records(args, args.split)
    num_classes = (
        len(VIDVRD_OBJECTS) if args.dataset == "vidvrd" else len(VIDOR_OBJECTS)
    )
    eval_records = None
    if args.eval_split:
        eval_records = _load_records(args, args.eval_split)[: args.eval_max_images]

    det_cfg = DetectionConfig(num_classes=num_classes, depth=args.depth)
    train_cfg = DetectorTrainConfig(
        ims_per_batch=args.ims_per_batch,
        base_lr=args.base_lr,
        max_iter=args.max_iter,
        image_size=args.image_size,
        input_policy=args.input_policy,
        min_size=args.min_size,
        max_size=args.max_size,
        eval_every=args.eval_every if eval_records else 0,
        mixed_precision=args.bf16,
    )

    def run():
        train_detector(
            records, det_cfg, train_cfg, use_mesh=True,
            checkpoint_path=args.output, eval_records=eval_records,
        )

    launch(run, args.num_machines, args.machine_rank, args.dist_url)


if __name__ == "__main__":
    main()
