"""Multi-device data-parallel training on the forced 8-device CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tspn_tpu.models.tspn import TSPNModel
from tspn_tpu.parallel.mesh import make_mesh, shard_batch
from tspn_tpu.parallel.train_step import (
    TrainState,
    compute_losses,
    make_train_step,
)
from tspn_tpu.solver.optim import build_optimizer


def _batch(rng, b=8, n=4, num_pred=10, d=32):
    p = n * (n - 1)
    pairs = np.zeros((b, p, 2), np.int32)
    k = 0
    for i in range(n):
        for j in range(n):
            if i != j:
                pairs[:, k] = (i, j)
                k += 1
    labels = (rng.rand(b, p, num_pred) < 0.1).astype(np.float32)
    return {
        "feats": rng.randn(b, p, d).astype(np.float32),
        "pairs": pairs,
        "labels": labels,
        "pair_mask": np.ones((b, p), np.float32),
        "cls_logits": rng.randn(b, n, 35).astype(np.float32),
        "track_mask": np.ones((b, n), np.float32),
    }


@pytest.fixture()
def setup(cfg, rng):
    model = TSPNModel(num_predicates=10, use_ppn=True, use_dpn=False)
    batch = _batch(rng)
    params = model.init(jax.random.PRNGKey(0), batch)["params"]
    cfg.SOLVER.BASE_LR = 1e-3
    optimizer, _ = build_optimizer(cfg, params)
    state = TrainState(
        step=jnp.zeros((), jnp.int32), params=params, opt_state=optimizer.init(params)
    )
    return model, optimizer, state, batch


def test_eight_device_mesh_available():
    assert len(jax.devices()) == 8


def test_sharded_step_runs_and_updates(setup, cfg):
    model, optimizer, state, batch = setup
    mesh = make_mesh()
    step = make_train_step(model, optimizer, mesh=mesh)
    sharded = shard_batch(batch, mesh)
    # snapshot before the step: the state buffers are donated
    before = jax.tree_util.tree_map(lambda x: np.asarray(x).copy(), state.params)
    new_state, metrics = step(state, sharded)
    assert np.isfinite(metrics["loss"])
    assert int(new_state.step) == 1
    # params actually changed
    delta = jax.tree_util.tree_reduce(
        lambda acc, x: acc + float(jnp.abs(x).sum()),
        jax.tree_util.tree_map(
            lambda a, b: np.asarray(a) - b, new_state.params, before
        ),
        0.0,
    )
    assert delta > 0


def test_sharded_matches_single_device(setup, cfg, rng):
    """DP over 8 devices must produce the same update as one device."""
    model, optimizer, state, batch = setup
    mesh = make_mesh()
    step8 = make_train_step(model, optimizer, mesh=mesh)
    step1 = make_train_step(model, optimizer, mesh=None)

    s8, m8 = step8(state, shard_batch(batch, mesh))
    # fresh state for the single-device run (donated buffers)
    params = model.init(jax.random.PRNGKey(0), batch)["params"]
    state1 = TrainState(
        step=jnp.zeros((), jnp.int32), params=params,
        opt_state=optimizer.init(params),
    )
    s1, m1 = step1(state1, batch)
    assert float(m8["loss"]) == pytest.approx(float(m1["loss"]), rel=1e-4)
    leaves8 = jax.tree_util.tree_leaves(s8.params)
    leaves1 = jax.tree_util.tree_leaves(s1.params)
    for a, b in zip(leaves8, leaves1):
        assert np.allclose(np.asarray(a), np.asarray(b), atol=1e-5)


def test_loss_masking_ignores_padding(setup, rng):
    """Padding rows must not change the loss."""
    model, optimizer, state, batch = setup
    loss_real = compute_losses(model, state.params, batch)

    padded = {k: np.array(v) for k, v in batch.items()}
    # poison masked-out rows
    padded["pair_mask"][:, -3:] = 0.0
    padded["feats"][:, -3:] = 99.0
    padded["labels"][:, -3:] = 1.0
    base = {k: np.array(v) for k, v in batch.items()}
    base["pair_mask"][:, -3:] = 0.0
    l_poisoned = compute_losses(model, state.params, padded)
    l_base = compute_losses(model, state.params, base)
    assert float(l_poisoned["loss_rel"]) == pytest.approx(
        float(l_base["loss_rel"]), rel=1e-5
    )


def test_sharded_inference_matches_single_device(cfg, synthetic_dataset):
    """SPMD inference (PREDICT.SHARD_INFERENCE): segment batches split
    across the 8-device mesh must yield the same predictions as the
    single-device path."""
    import jax

    from tspn_tpu.data.vrdataset import SegmentDataset, effective_feature_dim
    from tspn_tpu.models.tspn import build_model
    from tspn_tpu.runtime.predict import predict_segments

    cfg = cfg.clone()
    cfg.RELPN.USE_PPN = False
    cfg.RELPN.USE_DPN = False
    cfg.DATASET.TEST_BATCH_SIZE = 8  # divides the 8-device mesh

    dataset = SegmentDataset(cfg, synthetic_dataset, phase="test")
    model = build_model(cfg)
    bucket = min(cfg.BUCKETS.NUM_TRACKLETS)
    p = bucket * (bucket - 1)
    example = {
        "feats": np.zeros((1, p, effective_feature_dim(cfg)), np.float32),
        "pairs": np.zeros((1, p, 2), np.int32),
        "labels": np.zeros((1, p, cfg.PREDICT.PREDICATE_NUM), np.float32),
        "pair_mask": np.zeros((1, p), np.float32),
        "cls_logits": np.zeros((1, bucket, cfg.PREDICT.OBJECT_NUM), np.float32),
        "track_mask": np.zeros((1, bucket), np.float32),
    }
    params = model.init(jax.random.PRNGKey(5), example)["params"]

    out_single = predict_segments(cfg, model, params, dataset)
    cfg_sh = cfg.clone()
    cfg_sh.PREDICT.SHARD_INFERENCE = True
    out_sharded = predict_segments(cfg_sh, model, params, dataset)

    assert set(out_single) == set(out_sharded)
    for key in out_single:
        preds_1, iou_1, tid_1 = out_single[key]
        preds_8, iou_8, tid_8 = out_sharded[key]
        np.testing.assert_array_equal(iou_1, iou_8)
        assert len(preds_1) == len(preds_8)
        for (s1, t1, p1), (s8, t8, p8) in zip(preds_1[:20], preds_8[:20]):
            assert abs(float(s1) - float(s8)) < 1e-5
            np.testing.assert_array_equal(t1, t8)
            np.testing.assert_array_equal(p1, p8)


def test_sharded_span_training_matches_single_device(cfg, synthetic_dataset):
    """Span training with the video batch sharded over the 8-device mesh
    (use_mesh=True; repeat-padded videos carry zero loss weight) matches
    unsharded training parameter for parameter."""
    import jax

    from tspn_tpu.runtime.span_train import train_span_model

    cfg = cfg.clone()
    cfg.merge_from_dict({
        "RELPN": {"USE_PPN": False, "USE_DPN": True},
        "SOLVER": {"MAX_ITER": 4},
        "ETC": {"DISPLAY_FREQ": 10, "SAVE_FREQ": 100},
    })
    _, p_single = train_span_model(cfg, synthetic_dataset, max_iter=4, seed=3)
    _, p_sharded = train_span_model(
        cfg, synthetic_dataset, max_iter=4, seed=3, use_mesh=True
    )
    for a, b in zip(
        jax.tree_util.tree_leaves(p_single), jax.tree_util.tree_leaves(p_sharded)
    ):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-4, atol=1e-6
        )


def test_sharded_detector_step_matches_single_device(rng):
    """Detector train step over the 8-device mesh (the reference's
    detector stage has its own multi-GPU launch, detectron/train.py:166-173)
    must produce the same parameter update as one device."""
    import optax

    from tspn_tpu.detection.rcnn import DetectionConfig, FasterRCNN
    from tspn_tpu.detection.train import make_detector_train_step
    from tspn_tpu.parallel.mesh import make_mesh, shard_batch

    tiny = DetectionConfig(
        num_classes=3, depth=26, anchor_sizes=(32, 64),
        anchor_ratios=(1.0,), pre_nms_topk_train=64,
        post_nms_topk_train=16, pre_nms_topk_test=64,
        post_nms_topk_test=16, roi_batch_size=8, max_detections=8,
    )
    model = FasterRCNN(cfg=tiny)

    b, size, g = 8, 64, 4
    imgs = rng.rand(b, size, size, 3).astype(np.float32)
    gt_boxes = np.zeros((b, g, 4), np.float32)
    gt_boxes[:, 0] = [8, 8, 40, 40]
    gt_classes = np.zeros((b, g), np.int32)
    gt_mask = np.zeros((b, g), np.float32)
    gt_mask[:, 0] = 1.0
    batch = {
        "image": imgs, "gt_boxes": gt_boxes,
        "gt_classes": gt_classes, "gt_mask": gt_mask,
    }

    def fresh():
        params = model.init(
            jax.random.PRNGKey(0), jnp.asarray(imgs[0]),
            jnp.asarray(gt_boxes[0]), jnp.asarray(gt_classes[0]),
            jnp.asarray(gt_mask[0]),
        )["params"]
        opt = optax.sgd(1e-3)
        return params, opt, opt.init(params)

    mesh = make_mesh()
    params8, opt8, ost8 = fresh()
    step8 = make_detector_train_step(model, opt8, mesh=mesh)
    p8, _, losses8 = step8(params8, ost8, shard_batch(batch, mesh))

    params1, opt1, ost1 = fresh()
    step1 = make_detector_train_step(model, opt1, mesh=None)
    p1, _, losses1 = step1(params1, ost1, batch)

    assert np.isfinite(float(losses8["loss"]))
    assert float(losses8["loss"]) == pytest.approx(float(losses1["loss"]), rel=1e-4)
    for a, c in zip(jax.tree_util.tree_leaves(p8), jax.tree_util.tree_leaves(p1)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(c), atol=2e-5)
