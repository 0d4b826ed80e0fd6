"""Duration Proposal Network — "when to look".

The reference ships two broken variants (relpn/dpn.py:24-28 references
undefined names; relpn/dpn_anchor.py:21-23 calls factories that don't
exist; relpn/rel_nms.py:14-15 is an empty stub). This module implements
the design those files sketch — the paper's intent (arXiv:2107.07154):

  * per-pair relation features laid out over the video time axis (C, T)
  * a Conv1d tower predicting, per temporal location, `A` anchor
    relationness logits and `2A` span-regression deltas
    (dpn_anchor.py:82-108's DPNHead)
  * 1-D interval anchors of several widths tiled along time
    (anchor_generator.py:31-64)
  * anchor<->GT-span matching with fg/bg IoU thresholds 0.7/0.3 and
    per-GT best-anchor forcing (thresholds from rel_nms.py:8-10)
  * BCE relationness loss + smooth-L1 span regression on foreground
    anchors (the loss sketch at dpn_anchor.py:67-70)
  * temporal NMS at IoU 0.5 keeping NUM_DURATION_PROPOSALS spans — the
    RelNMS stub completed (ops/temporal.nms_1d).

Everything is fixed-shape and vmap-friendly: batch of pair-sequences in,
(top_k spans, scores, keep mask) out.
"""

from __future__ import annotations

from typing import NamedTuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
import optax

from tspn_tpu.models.anchors import grid_anchors
from tspn_tpu.ops.temporal import decode_spans, encode_spans, interval_iou, nms_1d


class DPNHead(nn.Module):
    """Conv1d tower over the time axis (feature-last layout).

    Matches dpn_anchor.DPNHead (dpn_anchor.py:82-108): conv(k=3, same) +
    ReLU, then two 1x1 conv heads for relationness (A per location) and
    span deltas (2A per location). Returns logits.
    """

    num_anchor_sizes: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, feats: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
        """feats (..., T, C) -> (relness (..., T, A), deltas (..., T, A, 2))."""
        a = self.num_anchor_sizes
        h = nn.Conv(feats.shape[-1], kernel_size=(3,), padding="SAME",
                    dtype=self.dtype, name="conv")(feats)
        h = nn.relu(h)
        relness = nn.Conv(a, kernel_size=(1,), dtype=self.dtype, name="relness")(h)
        deltas = nn.Conv(2 * a, kernel_size=(1,), dtype=self.dtype, name="duration")(h)
        return relness, deltas.reshape(*deltas.shape[:-1], a, 2)


class DPNTargets(NamedTuple):
    relness_target: jnp.ndarray  # (K,) in {1 fg, 0 bg, -1 ignore}
    span_target: jnp.ndarray     # (K, 2) encoded deltas (fg rows meaningful)


def match_anchors(
    anchors: jnp.ndarray,
    gt_spans: jnp.ndarray,
    gt_mask: jnp.ndarray,
    fg_threshold: float = 0.7,
    bg_threshold: float = 0.3,
) -> DPNTargets:
    """Assign each anchor fg/bg/ignore + a regression target.

    anchors (K, 2); gt_spans (G, 2) padded, gt_mask (G,). An anchor is
    foreground if its best IoU >= fg_threshold OR it is the argmax
    anchor of some GT span (RPN-style forcing so every span owns at
    least one anchor); background if best IoU < bg_threshold.
    """
    iou = interval_iou(anchors, gt_spans)  # (K, G)
    iou = jnp.where(gt_mask[None, :] > 0, iou, -1.0)
    best_iou = jnp.max(iou, axis=1)
    best_gt = jnp.argmax(iou, axis=1)

    # anchor forced fg when it is some valid GT's best anchor
    best_anchor_of_gt = jnp.argmax(iou, axis=0)  # (G,)
    forced = jnp.zeros(anchors.shape[0], dtype=bool).at[best_anchor_of_gt].max(
        gt_mask > 0
    )

    any_gt = jnp.any(gt_mask > 0)
    fg = ((best_iou >= fg_threshold) | forced) & any_gt
    bg = (best_iou < bg_threshold) | ~any_gt
    relness_target = jnp.where(fg, 1.0, jnp.where(bg, 0.0, -1.0))

    matched = gt_spans[best_gt]
    span_target = encode_spans(matched, anchors)
    return DPNTargets(relness_target, span_target)


def dpn_loss(
    relness_logits: jnp.ndarray,
    span_deltas: jnp.ndarray,
    targets: DPNTargets,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """(relationness BCE over fg+bg anchors, smooth-L1 over fg anchors)."""
    t = targets.relness_target
    attend = t >= 0.0
    bce = optax.sigmoid_binary_cross_entropy(relness_logits, jnp.clip(t, 0.0, 1.0))
    loss_relness = jnp.sum(bce * attend) / jnp.clip(jnp.sum(attend), 1.0)

    fg = t == 1.0
    huber = optax.huber_loss(span_deltas, targets.span_target, delta=1.0)
    loss_span = jnp.sum(huber * fg[:, None]) / jnp.clip(jnp.sum(fg) * 2.0, 1.0)
    return loss_relness, loss_span


class DurationProposals(NamedTuple):
    spans: jnp.ndarray   # (top_k, 2) frame-space [start, end)
    scores: jnp.ndarray  # (top_k,)
    mask: jnp.ndarray    # (top_k,) bool


def propose_durations(
    relness_logits: jnp.ndarray,
    span_deltas: jnp.ndarray,
    anchors: jnp.ndarray,
    time_width: float,
    nms_threshold: float,
    top_k: int,
) -> DurationProposals:
    """Decode + clip + temporal-NMS one sequence's duration proposals.

    relness_logits (K,), span_deltas (K, 2), anchors (K, 2).
    """
    spans = decode_spans(span_deltas, anchors)
    spans = jnp.clip(spans, 0.0, time_width)
    scores = jax.nn.sigmoid(relness_logits)
    valid = (spans[:, 1] - spans[:, 0]) > 0
    idx, keep = nms_1d(spans, scores, nms_threshold, top_k, valid=valid)
    return DurationProposals(spans[idx], scores[idx] * keep, keep)


class DPN(nn.Module):
    """Full duration-proposal module over batched pair feature sequences.

    __call__ input: feats (B, T, C) — per-pair relation features along
    the video time axis (T in segment-grid units; `frames_per_step`
    converts anchor units to frames).
    """

    anchor_sizes: tuple = (15, 30, 45, 60)
    anchor_stride: float = 15.0
    num_duration_proposals: int = 64
    fg_iou_threshold: float = 0.7
    bg_iou_threshold: float = 0.3
    nms_threshold: float = 0.5
    frames_per_step: float = 1.0
    dtype: jnp.dtype = jnp.float32

    def _anchors(self, num_steps: int) -> jnp.ndarray:
        time_width = num_steps * self.frames_per_step
        return jnp.asarray(
            grid_anchors(int(np.ceil(time_width)), self.anchor_sizes, self.anchor_stride)
        )

    @nn.compact
    def __call__(self, feats: jnp.ndarray):
        """feats (B, T, C) -> (relness (B, K), deltas (B, K, 2), anchors (K, 2)).

        Per-location head outputs are upsampled from the conv grid to the
        anchor grid by nearest-location gather (anchor center -> conv
        step), so anchor stride and conv stride need not coincide.
        """
        head = DPNHead(num_anchor_sizes=len(self.anchor_sizes), dtype=self.dtype)
        relness_loc, deltas_loc = head(feats)  # (B, T, A), (B, T, A, 2)

        anchors = self._anchors(feats.shape[-2])  # (K, 2)
        centers = 0.5 * (anchors[:, 0] + anchors[:, 1]) / self.frames_per_step
        loc = jnp.clip(jnp.round(centers).astype(jnp.int32), 0, feats.shape[-2] - 1)
        size_idx = (
            jnp.arange(anchors.shape[0]) % len(self.anchor_sizes)
        ).astype(jnp.int32)

        relness = relness_loc[..., loc, size_idx]  # (B, K)
        deltas = deltas_loc[..., loc, size_idx, :]  # (B, K, 2)
        return relness, deltas, anchors
