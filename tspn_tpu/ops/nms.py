"""Greedy 2-D box NMS with fixed output shape (jit/vmap-safe).

Used by the tracking app (detection preprocessing, replacing
/root/reference/deep_sort/application_util/preprocessing.py:6-73) and by
the detection stage's RPN/RoI heads.

Formulation: loop over the top_k OUTPUT slots, each iteration picking
the highest-scoring still-active candidate and deactivating everything
it overlaps above the threshold — O(top_k * N) work instead of the
naive O(N^3) candidate loop, with identical greedy semantics (a box
suppressed by a kept box can never suppress others).
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


def _iou_one_to_many(box: jnp.ndarray, boxes: jnp.ndarray) -> jnp.ndarray:
    """(4,) vs (N, 4) -> (N,)."""
    lt = jnp.maximum(box[:2], boxes[:, :2])
    rb = jnp.minimum(box[2:], boxes[:, 2:])
    wh = jnp.clip(rb - lt, 0.0)
    inter = wh[:, 0] * wh[:, 1]
    area = jnp.clip(box[2] - box[0], 0.0) * jnp.clip(box[3] - box[1], 0.0)
    areas = jnp.clip(boxes[:, 2] - boxes[:, 0], 0.0) * jnp.clip(
        boxes[:, 3] - boxes[:, 1], 0.0
    )
    union = area + areas - inter
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
    active = jnp.ones(n, bool) if valid is None else jnp.asarray(valid, bool)

    def body(s, carry):
        active, out_idx, out_keep = carry
        masked = jnp.where(active, scores, -jnp.inf)
        i = jnp.argmax(masked).astype(jnp.int32)
        ok = jnp.isfinite(masked[i])
        out_idx = out_idx.at[s].set(jnp.where(ok, i, 0))
        out_keep = out_keep.at[s].set(ok)
        overlap = _iou_one_to_many(boxes[i], boxes) > iou_threshold
        active = active & ~(overlap & ok) & (jnp.arange(n) != i)
        return active, out_idx, out_keep

    _, out_idx, out_keep = jax.lax.fori_loop(
        0,
        top_k,
        body,
        (active, jnp.zeros(top_k, jnp.int32), jnp.zeros(top_k, bool)),
    )
    return out_idx, out_keep


def nms_tlwh(boxes_tlwh, scores, iou_threshold, top_k, valid=None):
    """NMS over top-left-width-height boxes (the tracking app's format,
    preprocessing.py:6-73; its threshold is an overlap fraction but the
    operational effect at DeepSORT settings matches IoU suppression)."""
    xyxy = jnp.concatenate(
        [boxes_tlwh[:, :2], boxes_tlwh[:, :2] + boxes_tlwh[:, 2:]], axis=-1
    )
    return nms(xyxy, scores, iou_threshold, top_k, valid=valid)
