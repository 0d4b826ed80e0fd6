"""TSPN top model: RelPN (PPN + DPN) + relation-of-interest classifier.

Rebuild of /root/reference/lib/modeling/model.py:7-88 and
relpn/relpn.py:9-59 as one flax module over fixed-shape SegmentBatch
pytrees. The classifier is the reference's Linear(FEATURE_DIM ->
PREDICATE_NUM) with normal(0.01) weight init and zero bias
(model.py:76-88); PPN/DPN are gated by cfg flags exactly like
make_relpn. Training losses are computed in train_step (see
tspn_tpu/parallel/train_step.py) from the logits returned here.
"""

from __future__ import annotations

from typing import Any, Dict

import flax.linen as nn
import jax.numpy as jnp

from tspn_tpu.models.ppn import PPNHead


class RelationPredictor(nn.Module):
    """Per-pair predicate scorer (model.py:76-88). Returns LOGITS.

    fused=True: input features are RAW in the aligned device layout
    (ops.pairwise); BoW L1-normalization happens on device fused into
    the matmul (XLA path here — differentiable; inference may swap in
    the Pallas kernel with the same parameters, see runtime/predict).
    """

    num_predicates: int
    fused: bool = False
    # inference-built models route through the Pallas forward kernel on
    # TPU (1.3-1.4x the XLA path); fused TRAINING routes through the
    # dW/db-only custom VJP (features are pipeline inputs — no gradient
    # consumer), 4.5 ms/step at bucket 32 x batch 8 vs 58 for the
    # general VJP and 2.6 for unfused XLA autodiff (DESIGN.md §6)
    inference: bool = False
    # object-vocabulary width: sets the fused device layout's classeme
    # slot (35 = VidVRD 11264-wide device layout, 80 = VidOR 11392)
    num_objects: int = 35
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, feats: jnp.ndarray) -> jnp.ndarray:
        if not self.fused:
            return nn.Dense(
                self.num_predicates,
                kernel_init=nn.initializers.normal(stddev=0.01),
                bias_init=nn.initializers.zeros,
                dtype=self.dtype,
                name="rel_predictor",
            )(feats)
        import jax

        from tspn_tpu.data.feature_store import FeatureLayout
        from tspn_tpu.ops.pairwise import (
            normalize_classify_device,
            normalize_classify_pallas,
        )

        layout = FeatureLayout.for_objects(self.num_objects)
        kernel = self.param(
            "kernel", nn.initializers.normal(stddev=0.01),
            (layout.device_dim, self.num_predicates),
        )
        bias = self.param("bias", nn.initializers.zeros, (self.num_predicates,))
        if jax.default_backend() == "tpu":
            from tspn_tpu.ops.pairwise import normalize_classify_fused_nofeatgrad

            flat = feats.reshape(-1, layout.device_dim).astype(self.dtype)
            if self.inference:
                out = normalize_classify_pallas(
                    flat, kernel.astype(self.dtype), bias, layout=layout
                )
            else:
                # training: Pallas forward + dW/db-only backward — the
                # pair features are pipeline inputs with no gradient
                # consumer, so the dx chain (the reason the general
                # custom VJP measured 58 vs 30 ms/step in round 2) is
                # skipped entirely. CONTRACT: the feature cotangent is a
                # structural ZERO — if a learned module is ever inserted
                # upstream of the classifier (feature adapter, learned
                # BoW), it would silently train with zero gradient; use
                # normalize_classify_fused (general VJP) instead then.
                out = normalize_classify_fused_nofeatgrad(
                    flat, kernel.astype(self.dtype), bias, layout=layout
                )
            return out.reshape(*feats.shape[:-1], self.num_predicates)
        return normalize_classify_device(
            feats.astype(self.dtype), kernel.astype(self.dtype), bias,
            layout=layout,
        )


class TSPNModel(nn.Module):
    """Segment-level forward over a SegmentBatch pytree.

    Inputs (leading batch dim B, tracklet bucket N, pairs P = N(N-1)):
      feats       (B, P, D)   pair relation features
      cls_logits  (B, N, C)   per-tracklet classeme logits
      pair_mask   (B, P)      1 for real pairs
      track_mask  (B, N)      1 for real tracklets

    Outputs dict:
      rel_logits  (B, P, num_predicates)
      pair_logits (B, N, N)   — present iff use_ppn
    DPN runs at video level via `DPN` directly (see predict_video);
    within a single 30-frame segment there is no span to propose.
    """

    num_predicates: int = 132
    num_objects: int = 35
    use_ppn: bool = True
    # use_dpn is the RelPN gating flag (RELPN.USE_DPN): the DPN itself
    # runs at VIDEO level through SpanTSPN (models/span_tspn.py), never
    # inside the segment model — a segment is one anchor stride wide, so
    # there is no span to propose. The flag routes the span phase in
    # runtime/span_train.py / predict.
    use_dpn: bool = True
    fused_classifier: bool = False
    inference: bool = False
    ppn_hidden: int = 64
    ppn_out: int = 35
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        self.classifier = RelationPredictor(
            num_predicates=self.num_predicates,
            fused=self.fused_classifier,
            inference=self.inference,
            num_objects=self.num_objects,
            dtype=self.dtype,
        )
        if self.use_ppn:
            self.ppn_head = PPNHead(
                hidden_channels=self.ppn_hidden,
                out_channels=self.ppn_out,
                dtype=self.dtype,
            )

    def __call__(self, batch: Dict[str, jnp.ndarray]) -> Dict[str, Any]:
        out = {"rel_logits": self.classifier(batch["feats"])}
        if self.use_ppn:
            out["pair_logits"] = self.ppn_head(batch["cls_logits"])
        return out


def build_model(cfg, inference: bool = False) -> TSPNModel:
    """Instantiate TSPNModel from a config tree (mirrors BaseModel(cfg)).

    inference=True routes the fused classifier through the Pallas kernel
    on TPU (parameter trees are identical either way)."""
    dtype = jnp.bfloat16 if cfg.MODEL.DTYPE == "bfloat16" else jnp.float32
    return TSPNModel(
        inference=inference,
        num_predicates=cfg.PREDICT.PREDICATE_NUM,
        num_objects=cfg.PREDICT.OBJECT_NUM,
        use_ppn=cfg.RELPN.USE_PPN,
        use_dpn=cfg.RELPN.USE_DPN,
        fused_classifier=bool(cfg.MODEL.get("FUSED_CLASSIFIER", False)),
        ppn_hidden=cfg.RELPN.PPN.HIDDEN_CHANNELS,
        ppn_out=cfg.RELPN.PPN.OUT_CHANNELS,
        dtype=dtype,
    )
