"""Temporal-interval primitives for the Duration Proposal Network.

All fixed-shape jnp functions safe under jit/vmap/pjit. These complete
the unfinished temporal machinery of the reference: interval IoU and NMS
were declared but stubbed there (/root/reference/lib/modeling/relpn/
rel_nms.py:14-15 has an empty forward), and span encode/decode never
existed (dpn.py regression had no target transform).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


def interval_iou(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Pairwise IoU between interval sets a (K, 2) and b (G, 2).

    Intervals are [start, end) on a continuous axis; degenerate or
    inverted intervals yield 0.
    """
    inter = jnp.clip(
        jnp.minimum(a[:, None, 1], b[None, :, 1])
        - jnp.maximum(a[:, None, 0], b[None, :, 0]),
        0.0,
    )
    len_a = jnp.clip(a[:, 1] - a[:, 0], 0.0)
    len_b = jnp.clip(b[:, 1] - b[:, 0], 0.0)
    union = len_a[:, None] + len_b[None, :] - inter
    return jnp.where(union > 0, inter / union, 0.0)


def encode_spans(gt: jnp.ndarray, anchors: jnp.ndarray) -> jnp.ndarray:
    """Span -> (d_center, d_log_width) deltas relative to anchors.

    gt, anchors: (..., 2) as [start, end). Standard RPN-style coding on
    one axis: dc = (gc - ac) / aw, dw = log(gw / aw).
    """
    ac = 0.5 * (anchors[..., 0] + anchors[..., 1])
    aw = anchors[..., 1] - anchors[..., 0]
    gc = 0.5 * (gt[..., 0] + gt[..., 1])
    gw = gt[..., 1] - gt[..., 0]
    dc = (gc - ac) / aw
    dw = jnp.log(jnp.clip(gw, 1e-6) / aw)
    return jnp.stack([dc, dw], axis=-1)


def decode_spans(deltas: jnp.ndarray, anchors: jnp.ndarray) -> jnp.ndarray:
    """Inverse of encode_spans; clamps d_log_width for stability."""
    ac = 0.5 * (anchors[..., 0] + anchors[..., 1])
    aw = anchors[..., 1] - anchors[..., 0]
    c = deltas[..., 0] * aw + ac
    w = jnp.exp(jnp.clip(deltas[..., 1], -8.0, 8.0)) * aw
    return jnp.stack([c - 0.5 * w, c + 0.5 * w], axis=-1)


@partial(jax.jit, static_argnames=("iou_threshold", "top_k"))
def nms_1d(
    spans: jnp.ndarray,
    scores: jnp.ndarray,
    iou_threshold: float,
    top_k: int,
    valid: jnp.ndarray | None = None,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Exact greedy temporal NMS with fixed output size.

    spans (K, 2), scores (K,), optional valid (K,) mask. Returns
    (indices (top_k,) int32, keep_mask (top_k,) bool). Padded slots point
    at index 0 with keep_mask False. Greedy semantics match classic
    NMS: process by descending score, drop anything with IoU > threshold
    against an already-kept span. Implemented as a lax.fori_loop over the
    score-sorted candidate list with a suppression mask — fixed shapes,
    no data-dependent control flow, so it compiles once per K.
    """
    k = spans.shape[0]
    top_k = min(top_k, k)
    active = jnp.ones(k, bool) if valid is None else jnp.asarray(valid, bool)
    lengths = jnp.clip(spans[:, 1] - spans[:, 0], 0.0)

    def body(s, carry):
        # each output slot picks the best remaining candidate and
        # deactivates its overlaps — O(top_k * K), exact greedy
        active, out_idx, out_keep = carry
        masked = jnp.where(active, scores, -jnp.inf)
        i = jnp.argmax(masked).astype(jnp.int32)
        ok = jnp.isfinite(masked[i])
        out_idx = out_idx.at[s].set(jnp.where(ok, i, 0))
        out_keep = out_keep.at[s].set(ok)
        inter = jnp.clip(
            jnp.minimum(spans[i, 1], spans[:, 1])
            - jnp.maximum(spans[i, 0], spans[:, 0]),
            0.0,
        )
        union = lengths[i] + lengths - inter
        iou_row = jnp.where(union > 0, inter / union, 0.0)
        active = active & ~((iou_row > iou_threshold) & ok) & (jnp.arange(k) != i)
        return active, out_idx, out_keep

    _, indices, keep_mask = jax.lax.fori_loop(
        0, top_k, body,
        (active, jnp.zeros(top_k, jnp.int32), jnp.zeros(top_k, bool)),
    )
    return indices, keep_mask
