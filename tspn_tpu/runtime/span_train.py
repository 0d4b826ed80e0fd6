"""Span-model (DPN) training driver.

Second training phase of the full TSPN: after (or alongside) the
segment-level classifier, the span model learns relationness + duration
regression + span classification from the video-level pair sequences.
One jitted step per (P_max, S) shape; batches are videos.
"""

from __future__ import annotations

import time
from typing import List, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from tspn_tpu.data.video_pairs import VideoPairRecord, build_video_pair_record
from tspn_tpu.data.vrdataset import SegmentDataset
from tspn_tpu.models.span_tspn import SpanTSPN, span_tspn_loss
from tspn_tpu.runtime.logging_utils import MetricLogger, setup_logger


def record_to_batch(record: VideoPairRecord) -> dict:
    pair_mask = np.zeros(record.seq_feats.shape[0], np.float32)
    pair_mask[: record.num_pairs] = 1.0
    return {
        "seq_feats": record.seq_feats,
        "seq_mask": record.seq_mask,
        "pair_mask": pair_mask,
        "gt_spans": record.gt_spans,
        "gt_preds": record.gt_preds,
        "gt_mask": record.gt_mask,
        "seg_labels": record.seg_labels,
    }


def stack_video_batches(records: List[VideoPairRecord]) -> dict:
    """Stack same-segment-count videos into a leading batch dimension:
    {key: (B, P, ...)} — SpanTSPN ops vmap over it."""
    batches = [record_to_batch(r) for r in records]
    return {k: np.stack([b[k] for b in batches]) for k in batches[0]}


def augment_video_batch(
    batch: dict,
    key: jax.Array,
    frames_per_step: float,
    max_shift_frac: float = 0.25,
    feat_dropout: float = 0.1,
) -> dict:
    """Temporal-crop + feature-dropout augmentation for a stacked video
    batch {seq_feats (B,P,S,D), seq_mask (B,P,S), gt_spans (B,P,G,2),
    gt_mask (B,P,G), seg_labels (B,P,S,R), ...} — jit-friendly, shapes
    unchanged.

    Why: the video-level DPN relness head memorizes at small scale
    (loss_relationness -> 0 by iter ~40 on the fixture, DESIGN §8) —
    it sees one sequence per chain pair where the segment model sees
    one row per (pair, segment). A random temporal left-crop re-anchors
    every sequence against the anchor grid each step (the conv trunk is
    translation-equivariant but anchor MATCHING is positional), and
    element dropout on the BoW-heavy features breaks exact-sequence
    memorization. Both are identity at inference.

    Per video: sample t0 in [0, floor(S * max_shift_frac)], roll
    feats/mask/labels left by t0 segments (wrapped tail re-zeroed),
    shift GT spans by -t0 * frames_per_step and drop GTs whose
    remaining length < frames_per_step / 2."""
    bsz, _p, s_num = batch["seq_mask"].shape
    k_shift, k_drop = jax.random.split(key)
    max_shift = int(s_num * max_shift_frac)
    t0 = jax.random.randint(k_shift, (bsz,), 0, max_shift + 1)  # (B,)

    keep = (
        jnp.arange(s_num)[None, :] < (s_num - t0)[:, None]
    ).astype(batch["seq_mask"].dtype)  # (B, S) zero the wrapped tail

    def roll_s(x, axis):
        # per-video roll along the segment axis (vmap over B)
        return jax.vmap(lambda v, t: jnp.roll(v, -t, axis=axis - 1))(x, t0)

    out = dict(batch)
    out["seq_feats"] = roll_s(batch["seq_feats"], 2) * keep[:, None, :, None]
    out["seq_mask"] = roll_s(batch["seq_mask"], 2) * keep[:, None, :]
    out["seg_labels"] = roll_s(batch["seg_labels"], 2) * keep[:, None, :, None]

    shift_frames = (t0 * frames_per_step).astype(batch["gt_spans"].dtype)
    spans = batch["gt_spans"] - shift_frames[:, None, None, None]
    spans = jnp.maximum(spans, 0.0)
    alive = (spans[..., 1] - spans[..., 0]) > (frames_per_step * 0.5)
    out["gt_spans"] = spans
    out["gt_mask"] = batch["gt_mask"] * alive.astype(batch["gt_mask"].dtype)

    if feat_dropout > 0.0:
        keep_p = 1.0 - feat_dropout
        mask = jax.random.bernoulli(
            k_drop, keep_p, out["seq_feats"].shape
        ).astype(out["seq_feats"].dtype)
        out["seq_feats"] = out["seq_feats"] * mask / keep_p
    return out


def build_span_model(cfg) -> SpanTSPN:
    return SpanTSPN(
        num_predicates=cfg.PREDICT.PREDICATE_NUM,
        proj_channels=cfg.RELPN.DPN.IN_CHANNELS,
        anchor_sizes=tuple(float(s) for s in cfg.RELPN.DPN.ANCHOR_SIZES),
        anchor_stride=float(cfg.RELPN.DPN.ANCHOR_STRIDE),
        num_duration_proposals=cfg.RELPN.DPN.NUM_DURATION_PROPOSALS,
        nms_threshold=cfg.RELPN.DPN.NMS_THRESHOLD,
        fused_classifier=bool(cfg.MODEL.get("FUSED_CLASSIFIER", False)),
        num_objects=cfg.PREDICT.OBJECT_NUM,
    )


def train_span_model(
    cfg,
    dataset,
    max_iter: Optional[int] = None,
    lr: float = 1e-3,
    logger=None,
    seed: int = 0,
    videos_per_step: int = 4,
    joint_kwargs: Optional[dict] = None,
    use_mesh: bool = False,
    weight_decay: float = 0.0,
    augment: bool = False,
    aug_kwargs: Optional[dict] = None,
):
    """Train SpanTSPN over the train split's video pair records.

    Returns (model, params). Videos are grouped by segment count
    (one compiled program per S, like the segment loader's shape
    buckets) and each step consumes up to `videos_per_step` same-S
    videos stacked into a leading batch dimension.

    use_mesh=True shards the VIDEO batch over the device mesh's data
    axis (params replicated — the same DP mapping as the segment
    trainer); batches pad by repetition to a mesh multiple and padded
    videos carry zero loss weight, so the objective is unchanged."""
    if logger is None:
        logger = setup_logger("span_train", save_dir="logs")
    from tspn_tpu.data.vrdataset import effective_feature_dim

    seg_dataset = SegmentDataset(cfg, dataset, phase="train")
    vids = sorted({ix[0] for ix in seg_dataset.index})
    records: List[VideoPairRecord] = []
    for vid in vids:
        rec = build_video_pair_record(
            dataset, seg_dataset, vid,
            feature_dim=effective_feature_dim(cfg),
            num_objects=cfg.PREDICT.OBJECT_NUM,
            num_predicates=cfg.PREDICT.PREDICATE_NUM,
        )
        if rec is not None and rec.gt_mask.sum() > 0:
            records.append(rec)
    assert records, "no video pair records with GT spans"
    joint = bool(cfg.RELPN.DPN.get("JOINT_OBJECTIVE", False))
    logger.info(
        f"span training over {len(records)} videos "
        f"({'joint' if joint else 'teacher-forced'} objective)"
    )

    model = build_span_model(cfg)
    example = record_to_batch(records[0])
    params = model.init(
        jax.random.PRNGKey(seed),
        jnp.asarray(example["seq_feats"]), jnp.asarray(example["seq_mask"]),
        method=SpanTSPN.init_all,
    )["params"]
    # weight_decay: a video-level model sees ORDERS fewer training rows
    # than the segment model on the same data (one sequence per chain
    # pair vs one row per segment pair) and the DPN relness head
    # memorizes (loss_relationness hits 0.0000 by iter ~40 on the
    # synthetic fixture while held-out relness ordering stays
    # near-random). NOTE: decoupled decay was swept (0 / 1e-3 / 1e-2,
    # DESIGN §4 round 4) and did NOT restore relness generalization at
    # fixture scale — the inference-side in-span evidence score
    # (runtime/span_predict._jitted_propose) is what recovers ranking;
    # the knob is kept for real-dataset scale where decay has data to
    # trade against.
    optimizer = (
        optax.adamw(lr, weight_decay=weight_decay)
        if weight_decay > 0.0
        else optax.adam(lr)
    )
    opt_state = optimizer.init(params)

    from tspn_tpu.models.span_tspn import span_tspn_joint_loss

    jkw = joint_kwargs or {}
    loss_impl = (
        (lambda m, p, b: span_tspn_joint_loss(m, p, b, **jkw))
        if joint
        else span_tspn_loss
    )

    akw = dict(aug_kwargs or {})

    def step_impl(params, opt_state, batch, video_w, aug_key):
        if augment:
            batch = augment_video_batch(
                batch, aug_key, float(model.frames_per_step), **akw
            )

        def loss_fn(p):
            # vmap the per-video loss over the stacked video batch;
            # video_w zeroes mesh-padding repeats (weighted mean equals
            # the unpadded plain mean)
            per_video = jax.vmap(lambda b: loss_impl(model, p, b))(batch)
            denom = jnp.clip(jnp.sum(video_w), 1.0)
            losses = {
                k: jnp.sum(v * video_w) / denom for k, v in per_video.items()
            }
            return jnp.asarray(sum(losses.values())), losses

        (total, losses), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        losses["loss"] = total
        return params, opt_state, losses

    mesh = None
    if use_mesh:
        from jax.sharding import NamedSharding, PartitionSpec as P

        from tspn_tpu.parallel.mesh import make_mesh

        mesh = make_mesh(cfg.MESH.NUM_DEVICES, cfg.MESH.DATA_AXIS)
        rep = NamedSharding(mesh, P())
        shard = NamedSharding(mesh, P(cfg.MESH.DATA_AXIS))
        step = jax.jit(
            step_impl,
            in_shardings=(rep, rep, shard, shard, rep),
            out_shardings=(rep, rep, rep),
        )
        logger.info(f"span training sharded over {mesh.devices.size} device(s)")
    else:
        step = jax.jit(step_impl)

    def pad_for_mesh(batch, b_real):
        """Repeat-pad the video dim to a mesh multiple (wrapped indices —
        the pad may exceed the real batch); returns (batch, video_w)."""
        if mesh is None:
            return batch, jnp.ones(b_real, jnp.float32)
        n = mesh.devices.size
        target = b_real + (-b_real % n)
        if target != b_real:
            idx = jnp.arange(target) % b_real
            batch = {k: v[idx] for k, v in batch.items()}
        w = (jnp.arange(target) < b_real).astype(jnp.float32)
        return batch, w

    # group by segment count: one compiled program per (S, B) shape
    groups: dict = {}
    for rec in records:
        groups.setdefault(rec.num_segments, []).append(rec)
    group_keys = sorted(groups)
    # sample groups proportional to their size so the per-video training
    # distribution matches the dataset (round-robin would overweight
    # rare-shape videos by 1/len(group))
    group_probs = np.array([len(groups[k]) for k in group_keys], np.float64)
    group_probs /= group_probs.sum()
    # small groups always yield the same video set: cache their batch on
    # device instead of re-stacking ~GB of host arrays every visit
    static_batch_cache: dict = {}

    max_iter = max_iter or cfg.SOLVER.MAX_ITER
    meters = MetricLogger()
    rng_np = np.random.RandomState(seed)
    aug_base = jax.random.PRNGKey(seed + 1)
    end = time.time()
    for it in range(max_iter):
        key = group_keys[rng_np.choice(len(group_keys), p=group_probs)]
        group = groups[key]
        b = min(videos_per_step, len(group))
        if len(group) <= videos_per_step:
            if key not in static_batch_cache:
                static_batch_cache[key] = pad_for_mesh(
                    {
                        k: jnp.asarray(v)
                        for k, v in stack_video_batches(group).items()
                    },
                    len(group),
                )
            batch, video_w = static_batch_cache[key]
        else:
            picks = [
                group[i] for i in rng_np.choice(len(group), size=b, replace=False)
            ]
            batch, video_w = pad_for_mesh(
                {
                    k: jnp.asarray(v)
                    for k, v in stack_video_batches(picks).items()
                },
                b,
            )
        params, opt_state, losses = step(
            params, opt_state, batch, video_w, jax.random.fold_in(aug_base, it)
        )
        meters.update(time=time.time() - end,
                      **{k: float(v) for k, v in losses.items()})
        end = time.time()
        if it % max(cfg.ETC.DISPLAY_FREQ * 20, 20) == 0:
            logger.info(f"[span {it + 1}/{max_iter}]  {meters}")

    from tspn_tpu.data.segments import get_model_path
    import os

    from tspn_tpu.runtime.checkpoint import save_checkpoint

    path = os.path.join(
        get_model_path(), f"{cfg.MODEL.NAME}_span_weights_iter_{max_iter}.pt"
    )
    save_checkpoint(path, params, opt_state, step=max_iter,
                    loss=meters.loss.global_avg if "loss" in meters.meters else 0.0)
    logger.info(f"span checkpoint saved: {path}")
    return model, params


def load_span_model(cfg, example_record: VideoPairRecord, checkpoint_path: str):
    """Rebuild SpanTSPN + params from a checkpoint."""
    import jax

    from tspn_tpu.runtime.checkpoint import load_checkpoint

    model = build_span_model(cfg)
    batch = record_to_batch(example_record)
    params = model.init(
        jax.random.PRNGKey(0),
        jnp.asarray(batch["seq_feats"]), jnp.asarray(batch["seq_mask"]),
        method=SpanTSPN.init_all,
    )["params"]
    restored = load_checkpoint(checkpoint_path, params)
    return model, restored["params"]
