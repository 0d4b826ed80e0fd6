"""Greedy 2-D box NMS with fixed output shape (jit/vmap-safe).

Used by the tracking app (detection preprocessing, replacing
/root/reference/deep_sort/application_util/preprocessing.py:6-73) and by
the detection stage's RPN/RoI heads.

Two formulations with IDENTICAL greedy semantics:

- `nms_sequential`: one output slot per loop iteration (argmax + one
  suppression row). Exact but top_k sequential steps — on TPU the
  per-iteration loop overhead dominates (measured ~5.6 ms for each of
  the detect path's two NMS passes).

- `nms` (default): BLOCKED greedy. Each while_loop step takes the
  top-`block` still-active candidates in score order, resolves the
  whole chunk with an unrolled triangular pass (a candidate is kept iff
  no higher-scoring KEPT chunk member overlaps it — exactly what the
  sequential order does, since suppressed candidates never suppress),
  scatters the kept ones into their output slots, and suppresses the
  rest of the field against the chunk's kept boxes. Every chunk member
  is provably resolved (kept or suppressed by a kept member), so the
  kept sequence equals the sequential one element for element; the loop
  ends when top_k slots fill or no candidate remains. Dense-keep inputs
  (RPN top-256) finish in top_k/block iterations.
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
def nms_sequential(
    boxes: jnp.ndarray,
    scores: jnp.ndarray,
    iou_threshold: float,
    top_k: int,
    valid: jnp.ndarray | None = None,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Exact greedy NMS, one kept box per iteration (the oracle for the
    blocked formulation). boxes (N, 4) xyxy, scores (N,).

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


@partial(jax.jit, static_argnames=("iou_threshold", "top_k", "block"))
def nms(
    boxes: jnp.ndarray,
    scores: jnp.ndarray,
    iou_threshold: float,
    top_k: int,
    valid: jnp.ndarray | None = None,
    block: int = 16,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Blocked exact greedy NMS (see module docstring). Same contract as
    nms_sequential: (indices (top_k,), keep_mask (top_k,)), padded slots
    index 0 with keep False. Identical outputs, far fewer sequential
    steps on dense-keep inputs.
    """
    n = boxes.shape[0]
    top_k = min(top_k, n)
    b = min(block, top_k, n)
    active0 = jnp.ones(n, bool) if valid is None else jnp.asarray(valid, bool)

    def cond(carry):
        active, _idx, _keep, count = carry
        return (count < top_k) & jnp.any(active)

    def body(carry):
        active, out_idx, out_keep, count = carry
        masked = jnp.where(active, scores, -jnp.inf)
        top_s, top_i = jax.lax.top_k(masked, b)  # score order, ties by index
        cand_ok = jnp.isfinite(top_s)
        cand_boxes = boxes[top_i]
        iou_cc = box_iou(cand_boxes, cand_boxes)  # (b, b)

        # unrolled triangular pass: kept iff no higher-scoring KEPT
        # chunk member overlaps (suppressed members never suppress)
        keep_list = [cand_ok[0]]
        for i in range(1, b):
            sup = jnp.zeros((), bool)
            for j in range(i):
                sup = sup | (keep_list[j] & (iou_cc[i, j] > iou_threshold))
            keep_list.append(cand_ok[i] & ~sup)
        keep_c = jnp.stack(keep_list)  # (b,)

        # scatter kept candidates into output slots in kept order; slots
        # beyond top_k (or non-kept) are dropped via out-of-range index
        offs = jnp.cumsum(keep_c) - keep_c.astype(jnp.int32)
        pos = jnp.where(keep_c, count + offs, top_k)
        out_idx = out_idx.at[pos].set(top_i, mode="drop")
        out_keep = out_keep.at[pos].set(keep_c, mode="drop")
        count = count + jnp.sum(keep_c & (pos < top_k))

        # field suppression by the chunk's kept boxes; every chunk
        # candidate is resolved either way
        iou_all = box_iou(boxes, cand_boxes)  # (n, b)
        sup_any = jnp.any(
            keep_c[None, :] & (iou_all > iou_threshold), axis=1
        )
        active = active & ~sup_any
        active = active.at[top_i].set(False)
        return active, out_idx, out_keep, count

    _, out_idx, out_keep, _ = jax.lax.while_loop(
        cond,
        body,
        (
            active0,
            jnp.zeros(top_k, jnp.int32),
            jnp.zeros(top_k, bool),
            jnp.zeros((), jnp.int32),
        ),
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
