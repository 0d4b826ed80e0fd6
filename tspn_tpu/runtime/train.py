"""Training driver: dataset -> bucketed loader -> pjit step loop.

Counterpart of /root/reference/lib/modeling/train.py:23-138, minus the
process spawning: one Python process drives all local devices through a
jitted, mesh-sharded train step (multi-host runs call
jax.distributed.initialize before this). Adds what the reference lacks:
true resume (optimizer state + step restored) and per-bucket compiled
programs.
"""

from __future__ import annotations

import logging
import os
import time
from typing import Optional

import jax
import numpy as np

from tspn_tpu.data.loader import BucketedLoader
from tspn_tpu.data.segments import get_model_path
from tspn_tpu.data.vrdataset import (
    SegmentDataset,
    effective_feats_dtype,
    effective_feature_dim,
)
from tspn_tpu.models.tspn import build_model
from tspn_tpu.parallel.mesh import make_mesh, shard_batch
from tspn_tpu.parallel.train_step import TrainState, make_train_step
from tspn_tpu.runtime.checkpoint import latest_checkpoint, load_checkpoint, save_checkpoint
from tspn_tpu.runtime.logging_utils import MetricLogger, eta_string, setup_logger
from tspn_tpu.solver.optim import ReduceOnPlateauState, build_optimizer


def _example_batch(bucket: int, batch: int, cfg) -> dict:
    p = bucket * (bucket - 1)
    return {
        "feats": np.zeros((batch, p, effective_feature_dim(cfg)), np.float32),
        "pairs": np.zeros((batch, p, 2), np.int32),
        "labels": np.zeros((batch, p, cfg.PREDICT.PREDICATE_NUM), np.float32),
        "pair_mask": np.zeros((batch, p), np.float32),
        "cls_logits": np.zeros((batch, bucket, cfg.PREDICT.OBJECT_NUM), np.float32),
        "track_mask": np.zeros((batch, bucket), np.float32),
    }


def train(cfg, basedata, logger: Optional[logging.Logger] = None, resume: bool = False):
    """Train the relation model; returns the final TrainState."""
    rank = jax.process_index()
    if logger is None:
        logger = setup_logger("train", save_dir="logs", distributed_rank=rank)
    logger.info(f"config:\n{cfg.dump()}")

    mesh = make_mesh(cfg.MESH.NUM_DEVICES, cfg.MESH.DATA_AXIS)
    n_dev = mesh.devices.size
    batch_size = max(cfg.BUCKETS.SEGMENTS_PER_STEP, n_dev)
    batch_size -= batch_size % n_dev  # divisible so the data axis shards evenly
    logger.info(f"mesh: {n_dev} device(s), per-step segments: {batch_size}")

    dataset = None
    if str(cfg.PREDICT.get("CONSOLIDATED", "") or "") == "f32":
        # one open handle + contiguous slabs beats per-segment h5 opens
        # on the 1-core host for training too (labels are stored); the
        # "q8" store is inference-only (int8 is not the training repr)
        from tspn_tpu.data.preprocess import (
            ConsolidatedSegmentDataset,
            consolidated_path,
        )

        for split in ("train", "training"):
            path = consolidated_path(split)
            if os.path.exists(path):
                dataset = ConsolidatedSegmentDataset(cfg, path)
                assert not dataset.quantized, (
                    f"{path} is a QUANTIZED (q8) store — training needs the "
                    "f32 representation; re-run --preprocess with "
                    "PREDICT.CONSOLIDATED='f32'"
                )
                assert dataset.feature_width() == effective_feature_dim(cfg)
                logger.info(f"training from consolidated store: {path}")
                break
    if dataset is None:
        dataset = SegmentDataset(cfg, basedata, phase="train")
    assert len(dataset) > 0, "no train segments with cached features found"

    model = build_model(cfg)
    rng = jax.random.PRNGKey(cfg.ETC.RANDOM_SEED)
    init_bucket = min(cfg.BUCKETS.NUM_TRACKLETS)

    meters = MetricLogger()
    model_name = cfg.MODEL.NAME
    save_freq = cfg.ETC.SAVE_FREQ
    display_freq = cfg.ETC.DISPLAY_FREQ
    max_iter = cfg.SOLVER.MAX_ITER
    start_iter = 0

    params = model.init(rng, _example_batch(init_bucket, 1, cfg))["params"]
    optimizer, _ = build_optimizer(cfg, params)
    state = TrainState(
        step=np.zeros((), np.int32),
        params=params,
        opt_state=optimizer.init(params),
    )
    if resume:
        ckpt_path = latest_checkpoint(get_model_path(), model_name)
        if ckpt_path:
            restored = load_checkpoint(ckpt_path, state.params, state.opt_state)
            state = TrainState(
                step=np.asarray(restored["step"], np.int32),
                params=restored["params"],
                opt_state=restored["opt_state"],
            )
            start_iter = restored["step"]
            logger.info(f"resumed from {ckpt_path} at iter {start_iter}")
    state = jax.device_put(
        state, jax.sharding.NamedSharding(mesh, jax.sharding.PartitionSpec())
    )

    # the loader is built AFTER resume so the deterministic batch stream
    # fast-forwards to the checkpoint's position (a resumed run continues
    # on stream positions [start_iter, MAX_ITER), not 0..remaining)
    loader = BucketedLoader(
        dataset,
        buckets=cfg.BUCKETS.NUM_TRACKLETS,
        batch_size=batch_size,
        feature_dim=effective_feature_dim(cfg),
        feats_dtype=effective_feats_dtype(cfg),
        num_predicates=cfg.PREDICT.PREDICATE_NUM,
        num_objects=cfg.PREDICT.OBJECT_NUM,
        max_iter=max_iter,
        shuffle=True,
        seed=cfg.ETC.RANDOM_SEED,
        rank=rank,
        world_size=jax.process_count(),
        skip_batches=int(start_iter),
    )
    # one step program — jit retraces per batch shape (bucket) on its own
    use_plateau = cfg.SOLVER.SCHEDULER.TYPE == "plateau"
    step_fn = make_train_step(
        model, optimizer, mesh=mesh, data_axis=cfg.MESH.DATA_AXIS,
        with_lr_scale=use_plateau,
    )
    plateau = ReduceOnPlateauState() if use_plateau else None

    end = time.time()
    global_iter = start_iter
    pending = []  # (global_iter, device metric dicts) awaiting readback
    for iteration, (bucket, batch, _indices) in enumerate(loader):
        global_iter = start_iter + iteration
        if global_iter >= max_iter:
            break  # resumed runs finish at MAX_ITER total, not +MAX_ITER
        data_time = time.time() - end

        batch = shard_batch(batch, mesh, cfg.MESH.DATA_AXIS)
        if use_plateau:
            # reference semantics (scheduler.step(loss) every iteration,
            # lib/modeling/train.py:77-78 intent): the per-step loss
            # readback blocks, giving up async pipelining only when the
            # plateau scheduler is actually selected
            state, metrics = step_fn(
                state, batch, np.float32(plateau.lr_scale)
            )
            plateau = plateau.update(float(metrics["loss"]))
        else:
            state, metrics = step_fn(state, batch)
        # defer the float() readbacks to display/save boundaries so up
        # to display_freq steps pipeline through JAX's async dispatch
        # (a per-step float(v) blocked on every tunnel round trip)
        pending.append(metrics)

        batch_time = time.time() - end
        end = time.time()
        meters.update(time=batch_time, data=data_time)

        at_display = iteration % display_freq == 0
        at_save = (global_iter + 1) % save_freq == 0
        if (at_display or at_save) and rank == 0:
            for entry in pending:
                meters.update(**{k: float(v) for k, v in entry.items()})
            pending.clear()
        if at_display and rank == 0:
            logger.info(
                f"[{global_iter + 1}/{max_iter}]  {meters}  "
                f"eta: {eta_string(meters.time.global_avg, global_iter, max_iter)}"
            )
        if at_save and rank == 0:
            _save(cfg, state, meters, model_name, global_iter + 1, logger)

    if rank == 0 and state is not None:
        for entry in pending:
            meters.update(**{k: float(v) for k, v in entry.items()})
        pending.clear()
        _save(cfg, state, meters, model_name, max_iter, logger)
        os.makedirs("configs", exist_ok=True)
        cfg.dump_to_file(os.path.join("configs", f"{model_name}_config.yaml"))
        logger.info("Training Finished Successfully.")
    return state


def _save(cfg, state, meters, model_name, iteration, logger):
    fname = f"{model_name}_weights_iter_{iteration}.pt"
    cfg.ETC.MODEL_DUMP_FILE = fname
    path = os.path.join(get_model_path(), fname)
    loss = meters.loss.global_avg if "loss" in meters.meters else 0.0
    save_checkpoint(path, state.params, state.opt_state, step=iteration, loss=loss)
    logger.info(f"checkpoint saved: {path}")
