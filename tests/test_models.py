import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tspn_tpu.models.anchors import grid_anchors
from tspn_tpu.models.dpn import (
    DPN,
    dpn_loss,
    match_anchors,
    propose_durations,
)
from tspn_tpu.models.ppn import PPNHead, gt_pair_matrix, ppn_loss, top_pair_proposals
from tspn_tpu.models.tspn import RelationPredictor, TSPNModel


def test_grid_anchors_layout():
    a = grid_anchors(60, (15, 30), 15)
    # shifts 0,15,30,45,60 x 2 sizes
    assert a.shape == (10, 2)
    assert np.allclose(a[0], [-7.5, 7.5])
    assert np.allclose(a[1], [-15, 15])
    assert np.allclose(a[2], [15 - 7.5, 15 + 7.5])
    widths = a[:, 1] - a[:, 0]
    assert set(np.round(widths).astype(int)) == {15, 30}


def test_ppn_head_shapes_and_range():
    head = PPNHead(hidden_channels=64, out_channels=35)
    x = jnp.ones((2, 8, 35))
    params = head.init(jax.random.PRNGKey(0), x)
    logits = head.apply(params, x)
    assert logits.shape == (2, 8, 8)


def test_gt_pair_matrix():
    pairs = jnp.array([[0, 1], [1, 0], [0, 2]])
    labels = jnp.zeros((3, 5)).at[0, 2].set(1.0)
    mask = jnp.ones(3)
    m = gt_pair_matrix(pairs, labels, mask, 4)
    assert m[0, 1] == 1.0
    assert m[1, 0] == 0.0
    assert float(m.sum()) == 1.0
    # masked pair doesn't count
    m2 = gt_pair_matrix(pairs, labels, jnp.array([0.0, 1.0, 1.0]), 4)
    assert float(m2.sum()) == 0.0


def test_ppn_loss_matches_manual_bce():
    logits = jnp.array([[0.5, -0.3], [0.2, 0.1]])
    gt = jnp.array([[1.0, 0.0], [0.0, 0.0]])
    mask = jnp.ones(2)
    loss = ppn_loss(logits, gt, mask)
    p = jax.nn.sigmoid(logits)
    manual = -(gt * jnp.log(p) + (1 - gt) * jnp.log(1 - p)).mean()
    assert float(loss) == pytest.approx(float(manual), rel=1e-5)


def test_top_pair_proposals_masks_padding():
    logits = jnp.array([[0.0, 5.0, 9.0], [1.0, 0.0, 9.0], [9.0, 9.0, 9.0]])
    mask = jnp.array([1.0, 1.0, 0.0])  # tracklet 2 is padding
    idx, scores = top_pair_proposals(logits, mask, 4)
    # the 9.0s involving tracklet 2 must be excluded; best real is (0,1)=5.0
    assert int(idx[0]) == 1


def test_match_anchors_fg_bg():
    anchors = jnp.array([[0.0, 30.0], [15.0, 45.0], [100.0, 130.0]])
    gt = jnp.array([[0.0, 30.0], [0.0, 0.0]])
    gt_mask = jnp.array([1.0, 0.0])
    t = match_anchors(anchors, gt, gt_mask)
    assert float(t.relness_target[0]) == 1.0  # exact match
    assert float(t.relness_target[2]) == 0.0  # far -> bg
    # no GT at all -> everything bg
    t2 = match_anchors(anchors, gt, jnp.zeros(2))
    assert np.all(np.asarray(t2.relness_target) == 0.0)


def test_dpn_learns_synthetic_span():
    """DPN trained on a fixed feature pattern recovers the GT span."""
    import optax

    rng = np.random.RandomState(0)
    t_steps, c = 20, 16
    frames_per_step = 15.0
    gt_span = jnp.array([[60.0, 150.0]])
    gt_mask = jnp.ones(1)

    feats = np.zeros((1, t_steps, c), np.float32)
    feats[0, 4:10, :] = 1.0  # steps 4..10 ~ frames 60..150 active
    feats = jnp.asarray(feats + rng.normal(0, 0.01, feats.shape))

    dpn = DPN(
        anchor_sizes=(60.0, 90.0, 120.0),
        anchor_stride=30.0,
        frames_per_step=frames_per_step,
        num_duration_proposals=8,
    )
    params = dpn.init(jax.random.PRNGKey(0), feats)
    opt = optax.adam(1e-2)
    opt_state = opt.init(params)

    @jax.jit
    def step(params, opt_state):
        def loss_fn(p):
            relness, deltas, anchors = dpn.apply(p, feats)
            targets = match_anchors(anchors, gt_span, gt_mask)
            l1, l2 = dpn_loss(relness[0], deltas[0], targets)
            return l1 + l2

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = opt.update(grads, opt_state)
        return optax.apply_updates(params, updates), opt_state, loss

    losses = []
    for _ in range(200):
        params, opt_state, loss = step(params, opt_state)
        losses.append(float(loss))
    assert losses[-1] < losses[0] * 0.2

    relness, deltas, anchors = dpn.apply(params, feats)
    props = propose_durations(
        relness[0], deltas[0], anchors,
        time_width=t_steps * frames_per_step,
        nms_threshold=0.5, top_k=8,
    )
    best = np.asarray(props.spans[0])
    # top proposal should overlap the GT span strongly
    inter = max(0.0, min(best[1], 150) - max(best[0], 60))
    union = (best[1] - best[0]) + 90 - inter
    assert inter / union > 0.5


def test_relation_predictor_init_and_shape():
    model = RelationPredictor(num_predicates=132)
    x = jnp.ones((4, 11070))
    params = model.init(jax.random.PRNGKey(0), x)
    out = model.apply(params, x)
    assert out.shape == (4, 132)
    k = params["params"]["rel_predictor"]["kernel"]
    assert float(jnp.abs(k).mean()) < 0.05  # std 0.01 init
    assert float(jnp.abs(params["params"]["rel_predictor"]["bias"]).max()) == 0.0


def test_tspn_model_forward_variants():
    batch = {
        "feats": jnp.ones((2, 12, 64)),
        "pairs": jnp.zeros((2, 12, 2), jnp.int32),
        "labels": jnp.zeros((2, 12, 10)),
        "pair_mask": jnp.ones((2, 12)),
        "cls_logits": jnp.ones((2, 4, 35)),
        "track_mask": jnp.ones((2, 4)),
    }
    model = TSPNModel(num_predicates=10, use_ppn=True, use_dpn=False)
    params = model.init(jax.random.PRNGKey(0), batch)["params"]
    out = model.apply({"params": params}, batch)
    assert out["rel_logits"].shape == (2, 12, 10)
    assert out["pair_logits"].shape == (2, 4, 4)

    baseline = TSPNModel(num_predicates=10, use_ppn=False, use_dpn=False)
    p2 = baseline.init(jax.random.PRNGKey(0), batch)["params"]
    out2 = baseline.apply({"params": p2}, batch)
    assert "pair_logits" not in out2
