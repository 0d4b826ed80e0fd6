"""Detection training driver (reference recipe, mesh data-parallel).

Counterpart of /root/reference/detectron/trainer.py:23-40 /
train.py:130-173 without detectron2: the same operating point
(IMS_PER_BATCH 4, BASE_LR 2.5e-4, MAX_ITER 100k, ROI batch 128,
NUM_CLASSES 35 — trainer.py:29-33) driving the flax FasterRCNN with an
SGD+momentum optax chain, batch sharded over the device mesh.

Input policies (config-selectable):
  - "letterbox": scale the long side to a fixed square — one XLA program
    for the whole run (cheapest; round-1 behavior).
  - "shortest_edge": detectron2's ResizeShortestEdge semantics (the
    policy the reference inherits — min side -> 800 unless the long side
    would exceed 1333, /root/reference/lib/dataset/transforms/
    transforms.py:31-63 and detectron2's defaults at trainer.py:24-33),
    padded into one of TWO orientation buckets (landscape / portrait) so
    XLA compiles exactly two programs; batches are grouped by
    orientation like the reference's GroupedBatchSampler
    (lib/dataset/samplers/grouped_batch_sampler.py:10-115).
"""

from __future__ import annotations

import os
import time
from typing import Dict, List, NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from tspn_tpu.data.feature_store import _round_up
from tspn_tpu.detection.rcnn import DetectionConfig, FasterRCNN
from tspn_tpu.parallel.mesh import make_mesh, shard_batch
from tspn_tpu.runtime.logging_utils import MetricLogger, setup_logger


class DetectorTrainConfig(NamedTuple):
    ims_per_batch: int = 4        # trainer.py:29
    base_lr: float = 2.5e-4       # trainer.py:30
    max_iter: int = 100000        # trainer.py:31
    momentum: float = 0.9
    weight_decay: float = 1e-4
    warmup_iters: int = 1000
    image_size: int = 640         # square letterbox target
    max_gt_boxes: int = 32
    log_every: int = 20
    # input policy: "letterbox" (fixed square) or "shortest_edge"
    # (detectron2 800/1333 semantics, two orientation buckets)
    input_policy: str = "letterbox"
    min_size: int = 800           # detectron2 MIN_SIZE_TRAIN default
    max_size: int = 1333          # detectron2 MAX_SIZE_TRAIN default
    pad_multiple: int = 32        # bucket dims round up to this
    # in-training evaluation (reference inherits detectron2's
    # DefaultTrainer evaluator hooks, detectron/train.py:44-128)
    eval_every: int = 0           # 0 disables the hook
    keep_best: bool = True        # track/save best-mAP params
    # bf16 activations with f32 parameters/gradients (flax dtype casts
    # compute only; grads come back in the param dtype). The reference's
    # detectron2 recipe is f32 throughout, so this defaults off.
    mixed_precision: bool = False


def shortest_edge_scale(h: int, w: int, min_size: int, max_size: int) -> float:
    """detectron2 ResizeShortestEdge: scale the short side to min_size
    unless that would push the long side past max_size."""
    scale = min_size / min(h, w)
    if max(h, w) * scale > max_size:
        scale = max_size / max(h, w)
    return scale


def input_bucket_shape(
    h: int, w: int, cfg: "DetectorTrainConfig"
) -> tuple[int, int]:
    """Padded canvas for an image under the active policy: the square
    letterbox, or one of exactly two orientation buckets — landscape
    (min, max) / portrait (max, min) — so XLA compiles two programs."""
    if cfg.input_policy == "letterbox":
        return cfg.image_size, cfg.image_size
    short = _round_up(cfg.min_size, cfg.pad_multiple)
    long_ = _round_up(cfg.max_size, cfg.pad_multiple)
    return (short, long_) if w >= h else (long_, short)


def _bilinear_resize(image: np.ndarray, nh: int, nw: int) -> np.ndarray:
    """Separable bilinear resample at half-pixel-center convention
    (torchvision/PIL `align_corners=False`), border-replicated — matches
    detectron2's PIL-bilinear ResizeShortestEdge up to PIL's adaptive
    antialias on strong downscales (deviation recorded in DESIGN.md §5)."""
    h, w = image.shape[:2]
    ys = (np.arange(nh) + 0.5) * (h / nh) - 0.5
    xs = (np.arange(nw) + 0.5) * (w / nw) - 0.5
    y0 = np.clip(np.floor(ys).astype(int), 0, h - 1)
    x0 = np.clip(np.floor(xs).astype(int), 0, w - 1)
    wy = np.clip(ys - y0, 0.0, 1.0)[:, None, None]
    wx = np.clip(xs - x0, 0.0, 1.0)[None, :, None]
    y1 = np.minimum(y0 + 1, h - 1)
    x1 = np.minimum(x0 + 1, w - 1)
    rows = image[y0] * (1.0 - wy) + image[y1] * wy  # (nh, w, C)
    out = rows[:, x0] * (1.0 - wx) + rows[:, x1] * wx
    return out.astype(image.dtype, copy=False)


def resize_shortest_edge(
    image: np.ndarray, boxes: np.ndarray, min_size: int, max_size: int
) -> tuple[np.ndarray, np.ndarray, float]:
    """Aspect-preserving bilinear resize at detectron2 semantics; returns
    (resized image, scaled boxes, scale)."""
    h, w = image.shape[:2]
    scale = shortest_edge_scale(h, w, min_size, max_size)
    nh, nw = int(round(h * scale)), int(round(w * scale))
    return _bilinear_resize(image, nh, nw), boxes * scale, scale


def load_record_image(record: dict) -> np.ndarray:
    """Record -> float32 HWC image in [0, 1]; accepts in-memory arrays
    (tests/synthetic) or file paths (ffmpeg frame dumps)."""
    if "image" in record:
        arr = np.asarray(record["image"])
        img = arr.astype(np.float32)
        # integer arrays are always 0..255 — a max()>1.5 heuristic
        # misclassifies near-black uint8 frames as already normalized,
        # scaling them 255x brighter than their neighbors; the heuristic
        # remains only for float inputs of unknown provenance
        if np.issubdtype(arr.dtype, np.integer):
            return img / 255.0
        return img / 255.0 if img.max() > 1.5 else img
    from PIL import Image

    with Image.open(record["file_name"]) as im:
        return np.asarray(im.convert("RGB"), np.float32) / 255.0


def letterbox(
    image: np.ndarray, boxes: np.ndarray, size: int
) -> tuple[np.ndarray, np.ndarray, float]:
    """Scale the long side to `size`, pad bottom/right; returns
    (image (size, size, 3), scaled boxes, scale)."""
    h, w = image.shape[:2]
    scale = size / max(h, w)
    nh, nw = int(round(h * scale)), int(round(w * scale))
    resized = _bilinear_resize(image, nh, nw)
    out = np.zeros((size, size, 3), np.float32)
    out[:nh, :nw] = resized
    return out, boxes * scale, scale


def record_hw(rec: dict) -> tuple[int, int]:
    """(height, width) without decoding the image when possible."""
    if "height" in rec and "width" in rec:
        return int(rec["height"]), int(rec["width"])
    img = np.asarray(rec["image"]) if "image" in rec else load_record_image(rec)
    return img.shape[0], img.shape[1]


def make_batch(
    records: List[dict], cfg: DetectorTrainConfig
) -> Dict[str, np.ndarray]:
    """Records -> padded batch under the active input policy. With
    "shortest_edge", every record must share an orientation bucket (the
    train loop groups by aspect ratio, mirroring GroupedBatchSampler)."""
    b = len(records)
    g = cfg.max_gt_boxes
    h0, w0 = record_hw(records[0])
    ch, cw = input_bucket_shape(h0, w0, cfg)
    images = np.zeros((b, ch, cw, 3), np.float32)
    gt_boxes = np.zeros((b, g, 4), np.float32)
    gt_classes = np.zeros((b, g), np.int32)
    gt_mask = np.zeros((b, g), np.float32)
    for i, rec in enumerate(records):
        img = load_record_image(rec)
        boxes = np.asarray(
            [a["bbox"] for a in rec["annotations"]], np.float32
        ).reshape(-1, 4)
        if cfg.input_policy == "letterbox":
            img, boxes, _ = letterbox(img, boxes, cfg.image_size)
            images[i] = img
        else:
            assert input_bucket_shape(*img.shape[:2], cfg) == (ch, cw), (
                "mixed orientation buckets in one batch — group records "
                "by aspect ratio before batching"
            )
            img, boxes, _ = resize_shortest_edge(
                img, boxes, cfg.min_size, cfg.max_size
            )
            images[i, : img.shape[0], : img.shape[1]] = img
        n = min(len(boxes), g)
        gt_boxes[i, :n] = boxes[:n]
        gt_classes[i, :n] = [a["category_id"] for a in rec["annotations"]][:n]
        gt_mask[i, :n] = 1.0
    return {
        "image": images, "gt_boxes": gt_boxes,
        "gt_classes": gt_classes, "gt_mask": gt_mask,
    }


def group_by_orientation(
    records: List[dict], cfg: DetectorTrainConfig
) -> List[np.ndarray]:
    """Index groups whose members share an input bucket (one group for
    letterbox; landscape/portrait for shortest_edge). Mirrors the
    reference's aspect-ratio grouping
    (lib/dataset/samplers/grouped_batch_sampler.py:10-115)."""
    if cfg.input_policy == "letterbox":
        return [np.arange(len(records))]
    buckets: Dict[tuple, list] = {}
    for i, rec in enumerate(records):
        h, w = record_hw(rec)
        buckets.setdefault(input_bucket_shape(h, w, cfg), []).append(i)
    return [np.asarray(v) for v in buckets.values()]


def build_detector_optimizer(cfg: DetectorTrainConfig) -> optax.GradientTransformation:
    schedule = optax.join_schedules(
        [
            optax.linear_schedule(cfg.base_lr / 3, cfg.base_lr, cfg.warmup_iters),
            optax.constant_schedule(cfg.base_lr),
        ],
        [cfg.warmup_iters],
    )
    return optax.chain(
        optax.add_decayed_weights(cfg.weight_decay),
        optax.trace(decay=cfg.momentum),
        optax.scale_by_schedule(schedule),
        optax.scale(-1.0),
    )


def make_detector_train_step(model: FasterRCNN, optimizer, mesh=None):
    def loss_fn(params, batch):
        losses = jax.vmap(
            lambda im, gb, gc, gm: model.apply(
                {"params": params}, im, gb, gc, gm
            )
        )(batch["image"], batch["gt_boxes"], batch["gt_classes"], batch["gt_mask"])
        losses = {k: jnp.mean(v) for k, v in losses.items()}
        return jnp.asarray(sum(losses.values())), losses

    def step(params, opt_state, batch):
        (total, losses), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            params, batch
        )
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        losses["loss"] = total
        return params, opt_state, losses

    if mesh is None:
        return jax.jit(step, donate_argnums=(0, 1))
    from jax.sharding import NamedSharding, PartitionSpec as P

    rep = NamedSharding(mesh, P())
    shard = NamedSharding(mesh, P("data"))
    return jax.jit(
        step,
        in_shardings=(rep, rep, shard),
        out_shardings=(rep, rep, rep),
        donate_argnums=(0, 1),
    )


def train_detector(
    records: List[dict],
    det_cfg: DetectionConfig,
    train_cfg: DetectorTrainConfig,
    seed: int = 0,
    logger=None,
    use_mesh: bool = False,
    checkpoint_path: Optional[str] = None,
    eval_records: Optional[List[dict]] = None,
):
    """Train and return (model, params).

    With eval_records and train_cfg.eval_every > 0, a periodic in-training
    evaluation hook (the reference inherits this from detectron2's
    DefaultTrainer evaluator zoo, detectron/train.py:44-128) computes
    held-out mAP, logs it, and — with keep_best — returns/saves the
    best-mAP parameters instead of the last ones.
    """
    if logger is None:
        logger = setup_logger("detector_train", save_dir="logs")
    model = FasterRCNN(
        cfg=det_cfg,
        dtype=jnp.bfloat16 if train_cfg.mixed_precision else jnp.float32,
    )
    rng = np.random.RandomState(seed)

    example = make_batch(records[:1], train_cfg)
    params = model.init(
        jax.random.PRNGKey(seed),
        example["image"][0], example["gt_boxes"][0],
        example["gt_classes"][0], example["gt_mask"][0],
    )["params"]
    optimizer = build_detector_optimizer(train_cfg)
    opt_state = optimizer.init(params)

    mesh = make_mesh() if use_mesh else None
    if mesh is not None:
        assert train_cfg.ims_per_batch % mesh.size == 0, (
            f"ims_per_batch {train_cfg.ims_per_batch} must divide evenly "
            f"over the {mesh.size}-device mesh (each device takes "
            f"ims_per_batch/n_devices images)"
        )
    step_fn = make_detector_train_step(model, optimizer, mesh)

    groups = group_by_orientation(records, train_cfg)
    weights = np.asarray([len(g) for g in groups], np.float64)
    weights /= weights.sum()

    do_eval = bool(eval_records) and train_cfg.eval_every > 0
    best_map, best_iter, best_params, eval_history = -1.0, 0, None, []

    # host/device overlap: batch assembly (PIL decode + NumPy resize) on
    # a producer thread so the device never waits on the host; loss
    # readbacks deferred to log boundaries so up to log_every steps
    # pipeline through JAX's async dispatch instead of one blocking
    # float() per step
    import queue as _queue
    import threading as _threading

    batch_q: _queue.Queue = _queue.Queue(maxsize=2)

    def _producer():
        for _ in range(train_cfg.max_iter):
            group = groups[rng.choice(len(groups), p=weights)]
            idx = group[rng.choice(len(group), size=train_cfg.ims_per_batch,
                                   replace=True)]
            batch_q.put(make_batch([records[i] for i in idx], train_cfg))

    _threading.Thread(target=_producer, daemon=True).start()

    meters = MetricLogger()
    pending_losses: list = []
    end = time.time()
    for it in range(train_cfg.max_iter):
        batch = batch_q.get()
        if mesh is not None:
            batch = shard_batch(batch, mesh)
        params, opt_state, losses = step_fn(params, opt_state, batch)
        pending_losses.append(losses)
        meters.update(time=time.time() - end)
        end = time.time()
        if it % train_cfg.log_every == 0:
            for entry in pending_losses:
                meters.update(**{k: float(v) for k, v in entry.items()})
            pending_losses.clear()
            logger.info(f"[{it + 1}/{train_cfg.max_iter}]  {meters}")
        if do_eval and (it + 1) % train_cfg.eval_every == 0:
            from tspn_tpu.detection.eval import run_detector_eval

            mean_ap, _per_class = run_detector_eval(
                model, params, eval_records, train_cfg=train_cfg
            )
            eval_history.append((it + 1, mean_ap))
            if train_cfg.keep_best and mean_ap > best_map:
                best_map = mean_ap
                best_iter = it + 1
                best_params = jax.tree_util.tree_map(np.asarray, params)
            logger.info(f"[eval @ {it + 1}] mAP = {mean_ap:.4f} (best {best_map:.4f})")
            end = time.time()  # eval time is not step time

    if checkpoint_path:
        from tspn_tpu.runtime.checkpoint import save_checkpoint

        # the main checkpoint is always the FINAL (params, opt_state,
        # step) triple so resume stays consistent; best-mAP params go to
        # a params-only sibling stamped with their own iteration
        save_checkpoint(checkpoint_path, params, opt_state, step=train_cfg.max_iter)
        logger.info(f"detector checkpoint saved: {checkpoint_path}")
        if do_eval and train_cfg.keep_best and best_params is not None:
            root, ext = os.path.splitext(checkpoint_path)
            best_path = f"{root}_best{ext}"
            save_checkpoint(best_path, best_params, None, step=best_iter)
            logger.info(
                f"best-mAP checkpoint saved: {best_path} "
                f"(mAP {best_map:.4f} @ iter {best_iter})"
            )

    if do_eval and train_cfg.keep_best and best_params is not None:
        logger.info(f"returning best-mAP params (mAP {best_map:.4f})")
        params = best_params
    return model, params


def launch(
    main_fn,
    num_machines: int = 1,
    machine_rank: int = 0,
    dist_url: Optional[str] = None,
    args: tuple = (),
):
    """Multi-machine launcher with the reference's detectron2 `launch`
    contract (/root/reference/detectron/train.py:159-173), TPU-native:
    instead of spawning one process per GPU and rendezvousing over NCCL,
    each MACHINE runs one process that drives all its local chips through
    the mesh; cross-machine collectives ride jax.distributed (ICI/DCN).

    dist_url: "host:port" of machine 0 (detectron2's tcp:// prefix is
    accepted and stripped). With num_machines == 1 this is a plain call.
    """
    if num_machines > 1:
        coordinator = (dist_url or "").replace("tcp://", "")
        assert coordinator, "dist_url required for multi-machine launch"
        jax.distributed.initialize(
            coordinator_address=coordinator,
            num_processes=num_machines,
            process_id=machine_rank,
        )
    return main_fn(*args)
