"""Span-mode TSPN pipeline CLI: train DPN -> span detection -> eval.

The paper's "what and when" inference path as one driver: trains the
video-level span model on the train split, emits span-based relation
predictions for the test split (no greedy association), writes the
standard prediction JSON, and runs relation evaluation.
"""

from __future__ import annotations

import argparse
import json
import os

from tspn_tpu.config import get_default_config
from tspn_tpu.data import BaseVidOR, BaseVidVRD
from tspn_tpu.data.segments import get_model_path, set_output_dir
from tspn_tpu.evaluation import eval_visual_relation
from tspn_tpu.runtime.logging_utils import setup_logger
from tspn_tpu.runtime.span_predict import detect_spans
from tspn_tpu.runtime.span_train import train_span_model


def main():
    parser = argparse.ArgumentParser(description="TSPN span-mode pipeline")
    parser.add_argument("--config", default="configs/tspn.yaml")
    parser.add_argument("--data_dir", required=True)
    parser.add_argument("--dataset", choices=["vidvrd", "vidor"], default="vidvrd")
    parser.add_argument("--max_iter", type=int, default=None)
    parser.add_argument("--lr", type=float, default=1e-3)
    parser.add_argument("--skip_eval", action="store_true")
    args = parser.parse_args()

    cfg = get_default_config()
    if os.path.exists(args.config):
        cfg.merge_from_file(args.config)
    set_output_dir(cfg.ETC.OUTPUT_DIR)
    logger = setup_logger("span_pipeline", save_dir="logs")

    root = os.path.join(args.data_dir, args.dataset)
    if args.dataset == "vidvrd":
        basedata = BaseVidVRD(root, os.path.join(root, "videos"), ["train", "test"])
    else:
        basedata = BaseVidOR(
            os.path.join(root, "annotation"), os.path.join(root, "videos"),
            ["train", "test"],
        )
    # predicate head sized to the loaded vocabulary
    cfg.PREDICT.PREDICATE_NUM = basedata.get_predicate_num()

    logger.info("training span model (DPN + span classifier)...")
    model, params = train_span_model(
        cfg, basedata, max_iter=args.max_iter, lr=args.lr, logger=logger
    )

    logger.info("span-mode relation detection...")
    results = detect_spans(cfg, basedata, model, params, logger=logger)
    out_path = os.path.join(get_model_path(), "span_relation_prediction.json")
    with open(out_path, "w") as f:
        json.dump({"version": "VERSION 1.0", "results": results}, f)
    logger.info(f"wrote {out_path}")

    if not args.skip_eval:
        groundtruth = {
            vid: basedata.get_relation_insts(vid)
            for vid in basedata.get_index("test")
        }
        eval_visual_relation(groundtruth, results)


if __name__ == "__main__":
    main()
