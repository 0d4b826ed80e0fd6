"""SpanTSPN: the paper's full "what + when" model at video level.

Combines the pieces the reference left disconnected: per-pair relation
feature sequences -> Conv1d DPN head over temporal anchors (the
dpn_anchor.py design) -> temporal NMS (the rel_nms.py stub, completed)
-> span-pooled relation classification (RelOIPool + RelationPredictor,
model.py:68-88 — there RelOIPool degenerates to identity; here it is a
real masked mean over the proposed span).

All batched over pairs: one jitted forward scores every pair's spans
and predicates for a whole video at once.
"""

from __future__ import annotations

from typing import Dict

import flax.linen as nn
import jax
import jax.numpy as jnp
import optax

from tspn_tpu.models.dpn import DPN, dpn_loss, match_anchors, propose_durations
from tspn_tpu.models.tspn import RelationPredictor
from tspn_tpu.ops.temporal import interval_iou


class SpanTSPN(nn.Module):
    """Video-level duration proposal + span classification."""

    num_predicates: int = 132
    proj_channels: int = 1024        # RELPN.DPN.IN_CHANNELS
    anchor_sizes: tuple = (15.0, 30.0, 45.0, 60.0)
    anchor_stride: float = 15.0
    num_duration_proposals: int = 64
    nms_threshold: float = 0.5
    frames_per_step: float = 15.0    # segment stride
    # True when sequences carry RAW device-layout features (the fused
    # classifier normalizes its span-pooled input on device)
    fused_classifier: bool = False
    # object-vocabulary width — sets the fused device layout's geometry
    num_objects: int = 35
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        self.proj = nn.Dense(self.proj_channels, dtype=self.dtype, name="proj")
        self.dpn = DPN(
            anchor_sizes=self.anchor_sizes,
            anchor_stride=self.anchor_stride,
            num_duration_proposals=self.num_duration_proposals,
            nms_threshold=self.nms_threshold,
            frames_per_step=self.frames_per_step,
            dtype=self.dtype,
        )
        self.classifier = RelationPredictor(
            num_predicates=self.num_predicates,
            fused=self.fused_classifier,
            num_objects=self.num_objects,
            dtype=self.dtype,
        )

    def __call__(self, seq_feats: jnp.ndarray, seq_mask: jnp.ndarray):
        """seq_feats (P, S, D), seq_mask (P, S) ->
        (relness (P, K), deltas (P, K, 2), anchors (K, 2))."""
        h = nn.relu(self.proj(seq_feats)) * seq_mask[..., None]
        return self.dpn(h)

    def init_all(self, seq_feats: jnp.ndarray, seq_mask: jnp.ndarray):
        """Initialization entry touching every submodule (classify_spans
        is a separate method, so plain init would skip the classifier)."""
        out = self(seq_feats, seq_mask)
        dummy_spans = jnp.zeros((seq_feats.shape[0], 1, 2), seq_feats.dtype)
        self.classify_spans(seq_feats, seq_mask, dummy_spans)
        return out

    def classify_segments(self, seq_feats: jnp.ndarray) -> jnp.ndarray:
        """Per-(pair, segment) predicate logits through the SHARED
        classifier — the joint objective's segment-level BCE term uses
        the same RelationPredictor the span-pooled classification uses
        (the reference trains them as one module, model.py:14-18)."""
        return self.classifier(seq_feats)

    def classify_spans(
        self,
        seq_feats: jnp.ndarray,  # (P, S, D)
        seq_mask: jnp.ndarray,   # (P, S)
        spans: jnp.ndarray,      # (P, K, 2) in FRAME units
    ) -> jnp.ndarray:
        """RelOIPool + classifier: masked mean of the raw pair features
        over the segments inside each span -> predicate logits
        (P, K, num_predicates)."""
        s = seq_feats.shape[1]
        # segment s covers frames [s*stride, s*stride + 2*stride)
        starts = jnp.arange(s) * self.frames_per_step
        ends = starts + 2 * self.frames_per_step
        inside = (
            (starts[None, None, :] < spans[..., 1:2])
            & (ends[None, None, :] > spans[..., 0:1])
        )  # (P, K, S)
        weights = inside * seq_mask[:, None, :]
        denom = jnp.clip(jnp.sum(weights, axis=-1, keepdims=True), 1.0)
        pooled = jnp.einsum("pks,psd->pkd", weights / denom, seq_feats)
        return self.classifier(pooled)


def span_tspn_loss(
    model: SpanTSPN,
    params,
    batch: Dict[str, jnp.ndarray],
) -> Dict[str, jnp.ndarray]:
    """DPN relationness + span-regression + span classification losses.

    batch: seq_feats (P, S, D), seq_mask (P, S), pair_mask (P,),
    gt_spans (P, G, 2), gt_preds (P, G), gt_mask (P, G).
    """
    relness, deltas, anchors = model.apply(
        {"params": params}, batch["seq_feats"], batch["seq_mask"]
    )

    targets = jax.vmap(
        lambda spans_p, mask_p: match_anchors(anchors, spans_p, mask_p)
    )(batch["gt_spans"], batch["gt_mask"])
    l_rel, l_span = jax.vmap(dpn_loss)(relness, deltas, targets)
    pair_mask = batch["pair_mask"]
    denom = jnp.clip(jnp.sum(pair_mask), 1.0)
    loss_relness = jnp.sum(l_rel * pair_mask) / denom
    loss_span = jnp.sum(l_span * pair_mask) / denom

    # classification on the GT spans (teacher-forced RelOIPool)
    logits = model.apply(
        {"params": params}, batch["seq_feats"], batch["seq_mask"],
        batch["gt_spans"], method=SpanTSPN.classify_spans,
    )  # (P, G, R)
    labels = jax.nn.one_hot(batch["gt_preds"], logits.shape[-1])
    bce = optax.sigmoid_binary_cross_entropy(logits, labels)
    w = (batch["gt_mask"] * pair_mask[:, None])[..., None]
    loss_cls = jnp.sum(bce * w) / jnp.clip(jnp.sum(w) * 1.0, 1.0)

    return {
        "loss_relationness": loss_relness,
        "loss_duration": loss_span,
        "loss_span_cls": loss_cls,
    }


def span_tspn_joint_loss(
    model: SpanTSPN,
    params,
    batch: Dict[str, jnp.ndarray],
    top_k_spans: int = 8,
    match_iou: float = 0.5,
    # defaults from the round-2 weight sweep (synthetic e2e): joint mAP
    # 0.1315 vs the two-phase pipeline's 0.0689; background_weight is
    # the sensitive one — at 0.1 the early all-background proposals
    # suppress the classifier globally (mAP 0.038)
    seg_weight: float = 0.25,
    pred_span_weight: float = 0.5,
    background_weight: float = 0.02,
) -> Dict[str, jnp.ndarray]:
    """Joint objective: the teacher-forced losses PLUS

    - segment BCE: per-(pair, segment) predicate labels classified by
      the SHARED RelationPredictor on the raw sequence features — ties
      the segment-level signal and the span-pooled classification to
      one set of classifier weights;
    - predicted-span classification: the DPN's OWN NMS'd proposals are
      span-pooled and classified against the predicates of IoU-matched
      GT spans (unmatched proposals learn all-zero / background) — what
      inference does, so train matches test (fixes the GT-span-only
      teacher forcing skew).

    batch additionally carries seg_labels (P, S, R).
    """
    losses = span_tspn_loss(model, params, batch)

    # ---- segment-level BCE through the shared classifier
    seg_logits = model.apply(
        {"params": params}, batch["seq_feats"],
        method=SpanTSPN.classify_segments,
    )  # (P, S, R)
    w_seg = (batch["seq_mask"] * batch["pair_mask"][:, None])[..., None]
    bce_seg = optax.sigmoid_binary_cross_entropy(seg_logits, batch["seg_labels"])
    losses["loss_seg_cls"] = seg_weight * jnp.sum(bce_seg * w_seg) / jnp.clip(
        jnp.sum(w_seg), 1.0
    )

    # ---- classification on PREDICTED spans (matched to GT by 1-D IoU)
    relness_logits, deltas, anchors = model.apply(
        {"params": params}, batch["seq_feats"], batch["seq_mask"]
    )
    s = batch["seq_feats"].shape[1]
    time_width = (s + 1) * model.frames_per_step
    props = jax.vmap(
        lambda rl, dl: propose_durations(
            rl, dl, anchors, time_width, model.nms_threshold, top_k_spans
        )
    )(relness_logits, deltas)  # decode+clip+sigmoid+NMS, one source (dpn)
    spans, keep = props.spans, props.mask  # (P, K, 2), (P, K)
    spans = jax.lax.stop_gradient(spans)  # proposal SELECTION is not a
    # gradient path; the regression term already trains the deltas
    logits_pred = model.apply(
        {"params": params}, batch["seq_feats"], batch["seq_mask"], spans,
        method=SpanTSPN.classify_spans,
    )  # (P, K, R)
    iou = jax.vmap(interval_iou)(spans, batch["gt_spans"])  # (P, K, G)
    matched = (iou >= match_iou) & (batch["gt_mask"][:, None, :] > 0)  # (P,K,G)
    onehot = jax.nn.one_hot(batch["gt_preds"], logits_pred.shape[-1])  # (P,G,R)
    targets = jnp.clip(
        jnp.einsum("pkg,pgr->pkr", matched.astype(jnp.float32), onehot), 0.0, 1.0
    )
    # unmatched (background) proposals are down-weighted: early in
    # training every proposal is background and a full-weight term just
    # suppresses the classifier globally; matched proposals carry the
    # train-matches-test signal
    is_fg = jnp.any(matched, axis=-1).astype(jnp.float32)  # (P, K)
    w_pred = (
        keep
        * batch["pair_mask"][:, None]
        * (is_fg + background_weight * (1.0 - is_fg))
    )[..., None]
    bce_pred = optax.sigmoid_binary_cross_entropy(logits_pred, targets)
    losses["loss_pred_span_cls"] = pred_span_weight * jnp.sum(
        bce_pred * w_pred
    ) / jnp.clip(jnp.sum(w_pred), 1.0)
    return losses


def propose_and_classify(
    model: SpanTSPN,
    params,
    seq_feats: jnp.ndarray,
    seq_mask: jnp.ndarray,
    time_width: float,
    top_k_spans: int = 8,
):
    """Inference: per pair, NMS'd span proposals + predicate probabilities.

    Returns dict: spans (P, K, 2) frames, relness (P, K), span_mask (P, K),
    rel_prob (P, K, R).
    """
    relness_logits, deltas, anchors = model.apply(
        {"params": params}, seq_feats, seq_mask
    )
    props = jax.vmap(
        lambda rl, dl: propose_durations(
            rl, dl, anchors, time_width, model.nms_threshold, top_k_spans
        )
    )(relness_logits, deltas)  # decode+clip+sigmoid+NMS, one source (dpn)
    spans, relness, mask = props.spans, props.scores, props.mask
    logits = model.apply(
        {"params": params}, seq_feats, seq_mask, spans,
        method=SpanTSPN.classify_spans,
    )
    return {
        "spans": spans,
        "relness": relness,
        "span_mask": mask,
        "rel_prob": jax.nn.sigmoid(logits),
    }
