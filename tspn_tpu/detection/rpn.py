"""Region Proposal Network (single-level C4 variant), fixed-shape.

Semantics follow the standard Faster R-CNN RPN the reference consumes
through detectron2 (COCO-Detection/faster_rcnn_R_101_C4_3x.yaml via
/root/reference/detectron/trainer.py:24): 3x3 conv + 1x1 objectness /
delta heads over stride-16 anchors (sizes 32..512, ratios .5/1/2),
IoU-based anchor matching (fg 0.7 / bg 0.3 / per-GT forcing), and
pre/post-NMS top-k proposal selection. Differences for XLA:

  * proposal lists are fixed-size (top-k + validity masks)
  * the 256-anchor train-time sample is a deterministic top-scoring
    subset rather than a random permutation (no RNG threading through
    pjit; the balance fractions match)
"""

from __future__ import annotations

from typing import NamedTuple, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp
import optax

from tspn_tpu.ops.boxes import anchor_grid, clip_boxes, decode_boxes, encode_boxes
from tspn_tpu.ops.nms import box_iou, nms


class RPNHead(nn.Module):
    num_anchors: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, feats: jnp.ndarray):
        """(H, W, C) -> objectness (H*W*A,), deltas (H*W*A, 4)."""
        t = nn.Conv(feats.shape[-1], (3, 3), padding="SAME",
                    kernel_init=nn.initializers.normal(0.01),
                    dtype=self.dtype, name="conv")(feats)
        t = nn.relu(t)
        logits = nn.Conv(self.num_anchors, (1, 1),
                         kernel_init=nn.initializers.normal(0.01),
                         dtype=self.dtype, name="objectness")(t)
        deltas = nn.Conv(self.num_anchors * 4, (1, 1),
                         kernel_init=nn.initializers.normal(0.01),
                         dtype=self.dtype, name="deltas")(t)
        h, w = feats.shape[:2]
        return (
            logits.reshape(h * w * self.num_anchors),
            deltas.reshape(h * w * self.num_anchors, 4),
        )


class Proposals(NamedTuple):
    boxes: jnp.ndarray   # (P, 4) xyxy image coords
    scores: jnp.ndarray  # (P,)
    mask: jnp.ndarray    # (P,) bool


def select_proposals(
    logits: jnp.ndarray,
    deltas: jnp.ndarray,
    anchors: jnp.ndarray,
    image_hw: tuple,
    pre_nms_topk: int,
    post_nms_topk: int,
    nms_threshold: float = 0.7,
    min_size: float = 0.0,
) -> Proposals:
    """Decode + clip + NMS the top anchors into fixed-size proposals."""
    k = min(pre_nms_topk, logits.shape[0])
    top_scores, top_idx = jax.lax.top_k(logits, k)
    boxes = decode_boxes(deltas[top_idx], anchors[top_idx])
    boxes = clip_boxes(boxes, image_hw[0], image_hw[1])
    wh_ok = (
        (boxes[:, 2] - boxes[:, 0]) > min_size
    ) & ((boxes[:, 3] - boxes[:, 1]) > min_size)
    idx, keep = nms(boxes, top_scores, nms_threshold, post_nms_topk, valid=wh_ok)
    return Proposals(
        boxes=boxes[idx],
        scores=jax.nn.sigmoid(top_scores[idx]) * keep,
        mask=keep,
    )


class RPNTargets(NamedTuple):
    labels: jnp.ndarray       # (K,) 1 fg / 0 bg / -1 ignore
    matched_gt: jnp.ndarray   # (K, 4)


def match_anchors_to_gt(
    anchors: jnp.ndarray,
    gt_boxes: jnp.ndarray,
    gt_mask: jnp.ndarray,
    fg_threshold: float = 0.7,
    bg_threshold: float = 0.3,
) -> RPNTargets:
    iou = box_iou(anchors, gt_boxes)
    iou = jnp.where(gt_mask[None, :] > 0, iou, -1.0)
    best_iou = jnp.max(iou, axis=1)
    best_gt = jnp.argmax(iou, axis=1)
    # force each GT's best anchor fg (ties included via max-iou equality)
    gt_best_iou = jnp.max(iou, axis=0)  # (G,)
    forced = jnp.any(
        (iou >= gt_best_iou[None, :]) & (gt_mask[None, :] > 0) & (iou > 0), axis=1
    )
    any_gt = jnp.any(gt_mask > 0)
    fg = ((best_iou >= fg_threshold) | forced) & any_gt
    bg = (best_iou < bg_threshold) | ~any_gt
    labels = jnp.where(fg, 1.0, jnp.where(bg, 0.0, -1.0))
    return RPNTargets(labels, gt_boxes[best_gt])


def sample_targets(
    labels: jnp.ndarray,
    batch_size: int,
    positive_fraction: float,
    priority: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """Deterministic balanced attention mask over fg/bg anchors.

    Returns (K,) float weights in {0, 1}: up to batch_size*fraction
    foreground plus background to fill. Replaces the reference sampler's
    randperm (lib/modeling/relpn/sampler.py:3-66 is the same maskrcnn
    pattern) with a deterministic choice: HIGHEST-`priority` elements
    when a priority is given (hard-example mining), raster index order
    otherwise (note: index order is spatially biased toward low anchor
    indices whenever candidates exceed the budget — prefer passing a
    priority).
    """
    num_pos = int(batch_size * positive_fraction)
    is_fg = labels == 1.0
    is_bg = labels == 0.0

    def take(mask, budget):
        if priority is None:
            rank = jnp.where(mask, jnp.cumsum(mask), 10**9)
            return mask & (rank <= budget)
        key = jnp.where(mask, priority, -jnp.inf)
        order = jnp.argsort(-key)  # descending priority
        rank = jnp.zeros_like(order).at[order].set(jnp.arange(order.shape[0]))
        return mask & (rank < budget)

    take_fg = take(is_fg, num_pos)
    n_fg = jnp.sum(take_fg)
    take_bg = take(is_bg, batch_size - n_fg)
    return (take_fg | take_bg).astype(jnp.float32)


def rpn_loss(
    logits: jnp.ndarray,
    deltas: jnp.ndarray,
    anchors: jnp.ndarray,
    targets: RPNTargets,
    batch_size: int = 256,
    positive_fraction: float = 0.5,
):
    """(objectness BCE, smooth-L1 box loss) over the sampled anchors.

    Sampling priority = hardness: low-scoring foreground and high-scoring
    background anchors first (deterministic hard-example mining in place
    of the reference's randperm)."""
    hardness = jnp.where(targets.labels == 1.0, -logits, logits)
    weights = sample_targets(
        targets.labels, batch_size, positive_fraction, priority=hardness
    )
    bce = optax.sigmoid_binary_cross_entropy(
        logits, jnp.clip(targets.labels, 0.0, 1.0)
    )
    denom = jnp.clip(jnp.sum(weights), 1.0)
    loss_obj = jnp.sum(bce * weights) / denom

    fg = (targets.labels == 1.0).astype(jnp.float32)
    delta_targets = encode_boxes(targets.matched_gt, anchors)
    # detectron2 C4 recipe uses SMOOTH_L1_BETA=0.0 == pure L1
    l1 = jnp.abs(deltas - delta_targets).sum(-1)
    loss_box = jnp.sum(l1 * fg * weights) / denom
    return loss_obj, loss_box


def make_anchors(
    feat_h: int, feat_w: int,
    stride: int = 16,
    sizes: Sequence[float] = (32, 64, 128, 256, 512),
    ratios: Sequence[float] = (0.5, 1.0, 2.0),
) -> jnp.ndarray:
    return jnp.asarray(anchor_grid(feat_h, feat_w, stride, sizes, ratios))
