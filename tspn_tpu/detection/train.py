"""Detection training driver (reference recipe, mesh data-parallel).

Counterpart of /root/reference/detectron/trainer.py:23-40 /
train.py:130-173 without detectron2: the same operating point
(IMS_PER_BATCH 4, BASE_LR 2.5e-4, MAX_ITER 100k, ROI batch 128,
NUM_CLASSES 35 — trainer.py:29-33) driving the flax FasterRCNN with an
SGD+momentum optax chain, batch sharded over the device mesh. Images
are letterbox-resized to a fixed training resolution so one XLA program
serves the whole run.
"""

from __future__ import annotations

import time
from typing import Dict, List, NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

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


def load_record_image(record: dict) -> np.ndarray:
    """Record -> float32 HWC image in [0, 1]; accepts in-memory arrays
    (tests/synthetic) or file paths (ffmpeg frame dumps)."""
    if "image" in record:
        img = np.asarray(record["image"], np.float32)
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
    ys = np.clip((np.arange(nh) / scale).astype(int), 0, h - 1)
    xs = np.clip((np.arange(nw) / scale).astype(int), 0, w - 1)
    resized = image[ys][:, xs]
    out = np.zeros((size, size, 3), np.float32)
    out[:nh, :nw] = resized
    return out, boxes * scale, scale


def make_batch(
    records: List[dict], cfg: DetectorTrainConfig
) -> Dict[str, np.ndarray]:
    b = len(records)
    g = cfg.max_gt_boxes
    images = np.zeros((b, cfg.image_size, cfg.image_size, 3), np.float32)
    gt_boxes = np.zeros((b, g, 4), np.float32)
    gt_classes = np.zeros((b, g), np.int32)
    gt_mask = np.zeros((b, g), np.float32)
    for i, rec in enumerate(records):
        img = load_record_image(rec)
        boxes = np.asarray(
            [a["bbox"] for a in rec["annotations"]], np.float32
        ).reshape(-1, 4)
        img, boxes, _ = letterbox(img, boxes, cfg.image_size)
        images[i] = img
        n = min(len(boxes), g)
        gt_boxes[i, :n] = boxes[:n]
        gt_classes[i, :n] = [a["category_id"] for a in rec["annotations"]][:n]
        gt_mask[i, :n] = 1.0
    return {
        "image": images, "gt_boxes": gt_boxes,
        "gt_classes": gt_classes, "gt_mask": gt_mask,
    }


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
):
    """Train and return (model, params)."""
    if logger is None:
        logger = setup_logger("detector_train", save_dir="logs")
    model = FasterRCNN(cfg=det_cfg)
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
    step_fn = make_detector_train_step(model, optimizer, mesh)

    meters = MetricLogger()
    end = time.time()
    for it in range(train_cfg.max_iter):
        idx = rng.choice(len(records), size=train_cfg.ims_per_batch, replace=True)
        batch = make_batch([records[i] for i in idx], train_cfg)
        if mesh is not None:
            batch = shard_batch(batch, mesh)
        params, opt_state, losses = step_fn(params, opt_state, batch)
        meters.update(time=time.time() - end, **{k: float(v) for k, v in losses.items()})
        end = time.time()
        if it % train_cfg.log_every == 0:
            logger.info(f"[{it + 1}/{train_cfg.max_iter}]  {meters}")

    if checkpoint_path:
        from tspn_tpu.runtime.checkpoint import save_checkpoint

        save_checkpoint(checkpoint_path, params, opt_state, step=train_cfg.max_iter)
        logger.info(f"detector checkpoint saved: {checkpoint_path}")
    return model, params
