"""Main driver CLI: --preprocess / --train / --detect.

Interface-parity rebuild of /root/reference/base.py:116-139 (same flags,
same prediction-JSON output contract), TPU-native internals: no
mp.spawn / NCCL — one process drives all local devices via a jitted,
mesh-sharded train step (multi-host pods initialize jax.distributed
once at startup). The --preprocess path, broken in the reference
(base.py:29 calls a function that only exists under lib/deprecated/),
here materializes segment artifacts from annotations.
"""

from __future__ import annotations

import argparse
import json
import os
from collections import defaultdict

from tspn_tpu.config import get_default_config
from tspn_tpu import association
from tspn_tpu.data import BaseVidOR, BaseVidVRD
from tspn_tpu.data.segments import get_model_path, set_output_dir
from tspn_tpu.runtime.logging_utils import get_timestamp, setup_logger


def _build_basedata(args, data_dir):
    if args.dataset == "vidvrd":
        return BaseVidVRD(data_dir, os.path.join(data_dir, "videos"), ["train", "test"])
    if args.dataset == "vidor":
        # VidOR's split directories are training/validation (the reference
        # passes ['train','test'] here too and would fail the same way)
        return BaseVidOR(
            os.path.join(data_dir, "annotation"),
            os.path.join(data_dir, "videos"),
            ["training", "validation"],
        )
    raise ValueError(f"No dataset named {args.dataset}")


def preprocessing(cfg, args, data_dir):
    logger = setup_logger("preprocess", "logs", 0, f"{get_timestamp()}_preprocess.txt")
    basedata = _build_basedata(args, data_dir)
    from tspn_tpu.data.feature_store import FeatureLayout
    from tspn_tpu.data.synthetic import generate_segment_artifacts

    # the feature layout's classeme slot width comes from the config
    # (PREDICT.OBJECT_NUM: 35 -> the reference's 11070-d VidVRD layout,
    # 80 -> VidOR's 11160-d); the dataset's category ids must fit it
    num_objects = cfg.PREDICT.OBJECT_NUM
    layout = FeatureLayout.for_objects(num_objects)
    if basedata.get_object_num() > num_objects:
        raise ValueError(
            f"dataset has {basedata.get_object_num()} object categories but "
            f"PREDICT.OBJECT_NUM is {num_objects}; raise it (and set "
            f"PREDICT.FEATURE_DIM to {FeatureLayout.for_objects(basedata.get_object_num()).dim})"
        )
    if cfg.PREDICT.FEATURE_DIM != layout.dim:
        raise ValueError(
            f"PREDICT.FEATURE_DIM={cfg.PREDICT.FEATURE_DIM} does not match "
            f"the {num_objects}-wide classeme layout ({layout.dim}); see "
            "configs/vidor.yaml for the VidOR widths"
        )
    mode = str(cfg.PREDICT.get("CONSOLIDATED", "") or "")
    assert mode in ("", "f32", "q8", "q8f"), (
        f"PREDICT.CONSOLIDATED={mode!r}; expected '', 'f32', 'q8' or 'q8f'"
    )  # validate BEFORE the slow artifact pass
    splits = (
        ("training", "validation") if args.dataset == "vidor" else ("train", "test")
    )
    logger.info(
        f"materializing per-segment relation features from annotations "
        f"(classeme width {num_objects}, feature dim {layout.dim})..."
    )
    count = generate_segment_artifacts(
        basedata, cfg.ETC.OUTPUT_DIR, splits=splits,
        num_objects=num_objects, num_predicates=cfg.PREDICT.PREDICATE_NUM,
    )
    logger.info(f"wrote artifacts for {count} segments")

    if mode:
        # the reference's actual --preprocess intent (base.py:36-39 there):
        # one consolidated hdf5 per split; "q8" additionally quantizes to
        # int8 device-layout rows for the fast inference path; "q8f"
        # stores the FACTORED representation (per-tracklet descriptors +
        # per-pair relative rows — ~3.4x smaller, ops/pairwise)
        from tspn_tpu.data.preprocess import consolidate_split

        for split in splits:
            path = consolidate_split(
                cfg, basedata, split, quantize=(mode if mode != "f32" else False)
            )
            logger.info(f"consolidated {split} -> {path}")


def _maybe_init_distributed():
    """Multi-host rendezvous via env (set by dist_train.sh), replacing the
    reference's MASTER_ADDR/mp.spawn/NCCL setup (base.py:60-65 there)."""
    num = int(os.environ.get("JAX_NUM_PROCESSES", "1"))
    if num > 1:
        import jax

        jax.distributed.initialize(
            coordinator_address=os.environ["JAX_COORDINATOR_ADDRESS"],
            num_processes=num,
            process_id=int(os.environ["JAX_PROCESS_ID"]),
        )


def training(cfg, args, data_dir):
    _maybe_init_distributed()
    basedata = _build_basedata(args, data_dir)
    from tspn_tpu.runtime.train import train

    train(cfg, basedata, resume=args.resume)
    if cfg.RELPN.USE_DPN:
        # phase 2 of the full TSPN: the video-level span model ("when to
        # look") trains on pair sequences after the segment model, its
        # video batch sharded over the same device mesh
        from tspn_tpu.runtime.span_train import train_span_model

        train_span_model(
            cfg, basedata, use_mesh=True,
            augment=bool(cfg.RELPN.DPN.get("AUGMENT", False)),
        )


def detect(cfg, args, data_dir):
    basedata = _build_basedata(args, data_dir)
    logger = setup_logger("detect", "logs", 0, f"{get_timestamp()}_detect.txt")

    if cfg.RELPN.USE_DPN:
        # span mode: DPN proposes durations directly; no greedy association
        from tspn_tpu.data.segments import get_model_path as _mp
        from tspn_tpu.data.video_pairs import build_video_pair_record
        from tspn_tpu.data.vrdataset import SegmentDataset, effective_feature_dim
        from tspn_tpu.runtime.checkpoint import latest_checkpoint
        from tspn_tpu.runtime.span_predict import detect_spans
        from tspn_tpu.runtime.span_train import load_span_model

        seg_ds = SegmentDataset(cfg, basedata, phase=basedata.infer_test_split())
        assert seg_ds.index, "no test segments with cached features found"
        example = None
        for vid0 in dict.fromkeys(ix[0] for ix in seg_ds.index):
            example = build_video_pair_record(
                basedata, seg_ds, vid0,
                feature_dim=effective_feature_dim(cfg),
                num_objects=cfg.PREDICT.OBJECT_NUM,
                num_predicates=cfg.PREDICT.PREDICATE_NUM,
            )
            if example is not None:
                break
        assert example is not None, (
            "no test video yields proposal pair sequences; cannot build "
            "the span model template"
        )
        ckpt = latest_checkpoint(_mp(), f"{cfg.MODEL.NAME}_span")
        assert ckpt, "no span checkpoint found; run --train with USE_DPN first"
        model, params = load_span_model(cfg, example, ckpt)
        logger.info(f"span-mode detection with {ckpt}")
        mesh = None
        if bool(cfg.PREDICT.get("SHARD_INFERENCE", False)):
            # same knob as segment-mode inference (runtime/predict.py):
            # videos shard over the mesh data axis
            from tspn_tpu.parallel.mesh import make_mesh

            mesh = make_mesh(cfg.MESH.NUM_DEVICES, cfg.MESH.DATA_AXIS)
            logger.info(f"span inference sharded over {mesh.devices.size} device(s)")
        video_relations = detect_spans(
            cfg, basedata, model, params, logger=logger,
            mesh=mesh, data_axis=cfg.MESH.DATA_AXIS,
        )
        out_path = os.path.join(get_model_path(), "baseline_relation_prediction.json")
        with open(out_path, "w") as f:
            json.dump({"version": "VERSION 1.0", "results": video_relations}, f)
        logger.info(f"wrote {out_path}")
        return

    from tspn_tpu.runtime.predict import predict

    logger.info("predict short term relations")
    short_term_relations = predict(cfg, basedata, logger)

    logger.info("group short term relations by video")
    video_st_relations = defaultdict(list)
    for index, st_rel in short_term_relations.items():
        video_st_relations[index[0]].append((index, st_rel))

    logger.info("video-level visual relation detection by greedy relational association")
    video_relations = {
        vid: association.greedy_relational_association(
            basedata, rels, max_traj_num_in_clip=100
        )
        for vid, rels in video_st_relations.items()
    }

    logger.info("saving detection result")
    out_path = os.path.join(get_model_path(), "baseline_relation_prediction.json")
    with open(out_path, "w") as f:
        json.dump({"version": "VERSION 1.0", "results": video_relations}, f)
    logger.info(f"wrote {out_path}")


def main():
    parser = argparse.ArgumentParser(description="VidVRD TSPN (TPU-native)")
    parser.add_argument("--config", type=str, default="configs/baseline.yaml")
    parser.add_argument("--data_dir", type=str, help="dataset directory")
    parser.add_argument("--dataset", type=str, help="the dataset name for training")
    parser.add_argument("--preprocess", action="store_true", help="Preprocess dataset")
    parser.add_argument("--train", action="store_true", help="Train model")
    parser.add_argument("--detect", action="store_true", help="Detect video visual relation")
    parser.add_argument("--resume", action="store_true", help="Resume from latest checkpoint")
    # accepted for reference CLI compatibility; mesh config supersedes them
    parser.add_argument("--nodes", type=int, default=1)
    parser.add_argument("--ngpus_per_node", type=int, default=1)
    parser.add_argument("--local_rank", type=int, default=0)
    args = parser.parse_args()

    if not (args.train or args.detect or args.preprocess):
        parser.print_help()
        return

    cfg = get_default_config()
    cfg.merge_from_file(args.config)
    set_output_dir(cfg.ETC.OUTPUT_DIR)
    data_dir = os.path.join(args.data_dir, args.dataset)
    if args.preprocess:
        preprocessing(cfg, args, data_dir)
    if args.train:
        training(cfg, args, data_dir)
    if args.detect:
        detect(cfg, args, data_dir)


if __name__ == "__main__":
    main()
