"""2-D box coding utilities for the detection stage (jnp, fixed-shape).

The reference delegates all of this to detectron2's C++/CUDA ops
(/root/reference/detectron/trainer.py:24-33 pulls the model-zoo Faster
R-CNN); here it is explicit JAX: standard R-CNN box-delta coding
(dx, dy, dw, dh), clipping, validity filtering, and anchor generation
for the RPN.
"""

from __future__ import annotations

from functools import lru_cache
from typing import Sequence, Tuple

import jax.numpy as jnp
import numpy as np

# detectron2's default clamp on dw/dh: log(1000/16)
BBOX_XFORM_CLIP = float(np.log(1000.0 / 16.0))


def encode_boxes(gt: jnp.ndarray, anchors: jnp.ndarray) -> jnp.ndarray:
    """xyxy gt/anchors (..., 4) -> deltas (dx, dy, dw, dh)."""
    aw = anchors[..., 2] - anchors[..., 0]
    ah = anchors[..., 3] - anchors[..., 1]
    ax = anchors[..., 0] + 0.5 * aw
    ay = anchors[..., 1] + 0.5 * ah
    gw = gt[..., 2] - gt[..., 0]
    gh = gt[..., 3] - gt[..., 1]
    gx = gt[..., 0] + 0.5 * gw
    gy = gt[..., 1] + 0.5 * gh
    dx = (gx - ax) / jnp.clip(aw, 1e-6)
    dy = (gy - ay) / jnp.clip(ah, 1e-6)
    dw = jnp.log(jnp.clip(gw, 1e-6) / jnp.clip(aw, 1e-6))
    dh = jnp.log(jnp.clip(gh, 1e-6) / jnp.clip(ah, 1e-6))
    return jnp.stack([dx, dy, dw, dh], axis=-1)


def decode_boxes(deltas: jnp.ndarray, anchors: jnp.ndarray) -> jnp.ndarray:
    """Inverse of encode_boxes with detectron2's dw/dh clamp."""
    aw = anchors[..., 2] - anchors[..., 0]
    ah = anchors[..., 3] - anchors[..., 1]
    ax = anchors[..., 0] + 0.5 * aw
    ay = anchors[..., 1] + 0.5 * ah
    dx, dy = deltas[..., 0], deltas[..., 1]
    dw = jnp.clip(deltas[..., 2], -BBOX_XFORM_CLIP, BBOX_XFORM_CLIP)
    dh = jnp.clip(deltas[..., 3], -BBOX_XFORM_CLIP, BBOX_XFORM_CLIP)
    cx = dx * aw + ax
    cy = dy * ah + ay
    w = jnp.exp(dw) * aw
    h = jnp.exp(dh) * ah
    return jnp.stack(
        [cx - 0.5 * w, cy - 0.5 * h, cx + 0.5 * w, cy + 0.5 * h], axis=-1
    )


def clip_boxes(boxes: jnp.ndarray, height: float, width: float) -> jnp.ndarray:
    x0 = jnp.clip(boxes[..., 0], 0.0, width)
    y0 = jnp.clip(boxes[..., 1], 0.0, height)
    x1 = jnp.clip(boxes[..., 2], 0.0, width)
    y1 = jnp.clip(boxes[..., 3], 0.0, height)
    return jnp.stack([x0, y0, x1, y1], axis=-1)


def hflip_boxes(boxes: jnp.ndarray, width: float) -> jnp.ndarray:
    """Map xyxy boxes between an image and its horizontal mirror
    (self-inverse). Used by detector test-time augmentation."""
    return jnp.stack(
        [width - boxes[..., 2], boxes[..., 1], width - boxes[..., 0], boxes[..., 3]],
        axis=-1,
    )


def box_area(boxes: jnp.ndarray) -> jnp.ndarray:
    return jnp.clip(boxes[..., 2] - boxes[..., 0], 0.0) * jnp.clip(
        boxes[..., 3] - boxes[..., 1], 0.0
    )


@lru_cache(maxsize=None)
def _anchor_grid_cached(
    feat_h: int, feat_w: int, stride: int,
    sizes: Tuple[float, ...], ratios: Tuple[float, ...],
) -> np.ndarray:
    base = []
    for size in sizes:
        area = float(size) ** 2
        for ratio in ratios:
            w = np.sqrt(area / ratio)
            h = w * ratio
            base.append([-w / 2, -h / 2, w / 2, h / 2])
    base = np.asarray(base, np.float32)  # (A, 4)
    sx = (np.arange(feat_w) + 0.5) * stride
    sy = (np.arange(feat_h) + 0.5) * stride
    cx, cy = np.meshgrid(sx, sy)  # (H, W)
    shifts = np.stack([cx, cy, cx, cy], axis=-1).reshape(-1, 1, 4)
    return (shifts + base[None]).reshape(-1, 4)  # (H*W*A, 4)


def anchor_grid(
    feat_h: int, feat_w: int, stride: int,
    sizes: Sequence[float], ratios: Sequence[float],
) -> np.ndarray:
    """RPN anchors over a feature map: (H*W*A, 4) xyxy, row-major over
    (y, x, anchor) with centers at (x + .5)*stride."""
    return _anchor_grid_cached(
        int(feat_h), int(feat_w), int(stride),
        tuple(float(s) for s in sizes), tuple(float(r) for r in ratios),
    )
