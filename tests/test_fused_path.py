"""FUSED_CLASSIFIER mode: device-side normalization end to end."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tspn_tpu.data.vrdataset import SegmentDataset, effective_feature_dim
from tspn_tpu.models.tspn import build_model
from tspn_tpu.ops.pairwise import DEVICE_DIM, normalize_classify_pallas


@pytest.fixture()
def fused_cfg(cfg):
    cfg = cfg.clone()
    cfg.merge_from_dict({"MODEL": {"FUSED_CLASSIFIER": True},
                         "RELPN": {"USE_PPN": False, "USE_DPN": False}})
    return cfg


def test_effective_feature_dim(cfg, fused_cfg):
    assert effective_feature_dim(cfg) == 11070
    assert effective_feature_dim(fused_cfg) == DEVICE_DIM


def test_fused_dataset_emits_device_layout(fused_cfg, synthetic_dataset):
    ds = SegmentDataset(fused_cfg, synthetic_dataset, phase="train")
    rec = ds.load_segment(0)
    assert rec.feats.shape[1] == DEVICE_DIM
    # padding columns are zero
    assert np.allclose(rec.feats[:, 3070:3072], 0.0)


def test_fused_model_matches_unfused(cfg, fused_cfg, synthetic_dataset):
    """Same underlying weights -> identical logits between the unfused
    (host-normalized) and fused (raw device-layout) models."""
    from tspn_tpu.ops.pairwise import weights_to_device_layout

    ds_plain = SegmentDataset(cfg, synthetic_dataset, phase="train")
    ds_fused = SegmentDataset(fused_cfg, synthetic_dataset, phase="train")
    rec_p = ds_plain.load_segment(0)
    rec_f = ds_fused.load_segment(0)

    plain_cfg = cfg.clone()
    plain_cfg.merge_from_dict({"RELPN": {"USE_PPN": False, "USE_DPN": False}})
    model_p = build_model(plain_cfg)
    model_f = build_model(fused_cfg)

    def batch_of(rec, d):
        p = rec.feats.shape[0]
        return {
            "feats": jnp.asarray(rec.feats[None]),
            "pairs": jnp.zeros((1, p, 2), jnp.int32),
            "labels": jnp.zeros((1, p, cfg.PREDICT.PREDICATE_NUM)),
            "pair_mask": jnp.ones((1, p)),
            "cls_logits": jnp.zeros((1, 4, 35)),
            "track_mask": jnp.ones((1, 4)),
        }

    bp = batch_of(rec_p, 11070)
    bf = batch_of(rec_f, DEVICE_DIM)
    params_p = model_p.init(jax.random.PRNGKey(0), bp)["params"]

    w = np.asarray(params_p["classifier"]["rel_predictor"]["kernel"])
    b = np.asarray(params_p["classifier"]["rel_predictor"]["bias"])
    params_f = model_f.init(jax.random.PRNGKey(0), bf)["params"]
    params_f = jax.tree_util.tree_map(lambda x: x, params_f)
    params_f["classifier"]["kernel"] = jnp.asarray(weights_to_device_layout(w))
    params_f["classifier"]["bias"] = jnp.asarray(b)

    out_p = model_p.apply({"params": params_p}, bp)["rel_logits"]
    out_f = model_f.apply({"params": params_f}, bf)["rel_logits"]
    assert np.allclose(np.asarray(out_p), np.asarray(out_f), atol=2e-4)

    # and the Pallas inference kernel agrees with the fused XLA model
    out_k = normalize_classify_pallas(
        jnp.asarray(rec_f.feats), params_f["classifier"]["kernel"],
        params_f["classifier"]["bias"],
    )
    assert np.allclose(np.asarray(out_k), np.asarray(out_f)[0], atol=2e-4)


def test_fused_training_learns(fused_cfg, synthetic_dataset):
    from tspn_tpu.parallel.train_step import TrainState, compute_losses, make_train_step
    from tspn_tpu.solver.optim import build_optimizer
    from tspn_tpu.data.loader import BucketedLoader

    cfg = fused_cfg.clone()
    cfg.PREDICT.PREDICATE_NUM = synthetic_dataset.get_predicate_num()
    ds = SegmentDataset(cfg, synthetic_dataset, phase="train")
    loader = BucketedLoader(
        ds, buckets=[8], batch_size=4,
        feature_dim=effective_feature_dim(cfg),
        num_predicates=cfg.PREDICT.PREDICATE_NUM,
        num_objects=cfg.PREDICT.OBJECT_NUM,
        max_iter=40, seed=0,
    )
    model = build_model(cfg)
    state = None
    losses = []
    for bucket, batch, _ in loader:
        if state is None:
            params = model.init(jax.random.PRNGKey(0), batch)["params"]
            optimizer, _ = build_optimizer(cfg, params)
            state = TrainState(
                step=jnp.zeros((), jnp.int32), params=params,
                opt_state=optimizer.init(params),
            )
            step = make_train_step(model, optimizer)
        state, metrics = step(state, batch)
        losses.append(float(metrics["loss"]))
    assert losses[-1] < losses[0] * 0.7


def test_fused_span_records_and_loss(fused_cfg, synthetic_dataset):
    """Span pipeline under FUSED_CLASSIFIER: device-layout sequences feed
    the span model end to end (review regression)."""
    import jax
    import jax.numpy as jnp

    from tspn_tpu.data.video_pairs import build_video_pair_record
    from tspn_tpu.models.span_tspn import SpanTSPN, span_tspn_loss
    from tspn_tpu.runtime.span_train import build_span_model, record_to_batch

    cfg = fused_cfg.clone()
    cfg.PREDICT.PREDICATE_NUM = synthetic_dataset.get_predicate_num()
    seg_ds = SegmentDataset(cfg, synthetic_dataset, phase="train")
    vid = sorted({ix[0] for ix in seg_ds.index})[0]
    rec = build_video_pair_record(
        synthetic_dataset, seg_ds, vid,
        feature_dim=effective_feature_dim(cfg),
        num_objects=cfg.PREDICT.OBJECT_NUM,
    )
    assert rec.seq_feats.shape[2] == DEVICE_DIM
    model = build_span_model(cfg)
    batch = {k: jnp.asarray(v) for k, v in record_to_batch(rec).items()}
    params = model.init(
        jax.random.PRNGKey(0), batch["seq_feats"], batch["seq_mask"],
        method=SpanTSPN.init_all,
    )["params"]
    losses = span_tspn_loss(model, params, batch)
    for k, v in losses.items():
        assert np.isfinite(float(v)), k


def test_infer_test_split(synthetic_dataset):
    assert synthetic_dataset.infer_test_split() == "test"
