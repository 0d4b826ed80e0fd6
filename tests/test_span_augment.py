"""augment_video_batch invariants (runtime/span_train.py).

The temporal-crop + feature-dropout augmentation is the
anti-memorization lever for the video-level DPN relness head
(DESIGN §8): these tests pin its semantics — identity at zero
strength, exact roll/shift consistency between the sequence leaves and
the GT spans, and unbiased dropout scaling.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tspn_tpu.runtime.span_train import augment_video_batch

STRIDE = 15.0


def _batch(bsz=2, p=3, s=8, d=4, g=2, seed=0):
    rng = np.random.RandomState(seed)
    return {
        "seq_feats": jnp.asarray(rng.randn(bsz, p, s, d).astype(np.float32)),
        "seq_mask": jnp.ones((bsz, p, s), jnp.float32),
        "pair_mask": jnp.ones((bsz, p), jnp.float32),
        "gt_spans": jnp.asarray(
            np.tile(np.array([[30.0, 90.0], [0.0, 45.0]], np.float32),
                    (bsz, p, 1, 1))
        ),
        "gt_preds": jnp.zeros((bsz, p, g), jnp.int32),
        "gt_mask": jnp.ones((bsz, p, g), jnp.float32),
        "seg_labels": jnp.asarray(
            rng.rand(bsz, p, s, 5).astype(np.float32)
        ),
    }


def test_identity_at_zero_strength():
    batch = _batch()
    out = augment_video_batch(
        batch, jax.random.PRNGKey(0), STRIDE,
        max_shift_frac=0.0, feat_dropout=0.0,
    )
    for k in batch:
        np.testing.assert_array_equal(np.asarray(out[k]),
                                      np.asarray(batch[k]))


def test_roll_and_span_shift_consistent():
    batch = _batch(s=8)
    s = 8
    out = augment_video_batch(
        batch, jax.random.PRNGKey(7), STRIDE,
        max_shift_frac=0.5, feat_dropout=0.0,
    )
    feats0 = np.asarray(batch["seq_feats"])
    for b in range(feats0.shape[0]):
        # the input mask is all-ones, so the zeroed tail length IS t0
        t0 = int(s - np.asarray(out["seq_mask"])[b, 0].sum())
        assert 0 <= t0 <= s // 2
        keep = s - t0
        np.testing.assert_allclose(
            np.asarray(out["seq_feats"])[b, :, :keep],
            feats0[b, :, t0:],
            rtol=0, atol=0,
        )
        assert np.all(np.asarray(out["seq_feats"])[b, :, keep:] == 0.0)
        np.testing.assert_allclose(
            np.asarray(out["seg_labels"])[b, :, :keep],
            np.asarray(batch["seg_labels"])[b, :, t0:],
        )
        want = np.maximum(
            np.asarray(batch["gt_spans"])[b] - t0 * STRIDE, 0.0
        )
        np.testing.assert_allclose(np.asarray(out["gt_spans"])[b], want)
        alive = (want[..., 1] - want[..., 0]) > STRIDE * 0.5
        np.testing.assert_array_equal(
            np.asarray(out["gt_mask"])[b], alive.astype(np.float32)
        )


def test_shift_varies_per_video_and_key():
    batch = _batch(bsz=8, s=16)
    out = augment_video_batch(
        batch, jax.random.PRNGKey(3), STRIDE,
        max_shift_frac=0.5, feat_dropout=0.0,
    )
    t0s = 16 - np.asarray(out["seq_mask"])[:, 0].sum(axis=-1)
    assert len(set(t0s.tolist())) > 1, "all videos got the same shift"
    out2 = augment_video_batch(
        batch, jax.random.PRNGKey(3), STRIDE,
        max_shift_frac=0.5, feat_dropout=0.0,
    )
    np.testing.assert_array_equal(np.asarray(out["seq_feats"]),
                                  np.asarray(out2["seq_feats"]))


def test_augmented_sharded_training_matches_single_device(
    cfg, synthetic_dataset
):
    """Augmented span training must compose with the mesh path: the
    jitted step takes a replicated PRNG key, so the sampled crops /
    dropout masks — and therefore the parameters — must be identical
    sharded vs unsharded (same seed)."""
    from tspn_tpu.runtime.span_train import train_span_model

    cfg = cfg.clone()
    cfg.merge_from_dict({
        "RELPN": {"USE_PPN": False, "USE_DPN": True},
        "SOLVER": {"MAX_ITER": 4},
        "ETC": {"DISPLAY_FREQ": 10, "SAVE_FREQ": 100},
    })
    _, p_single = train_span_model(
        cfg, synthetic_dataset, max_iter=4, seed=3, augment=True
    )
    _, p_sharded = train_span_model(
        cfg, synthetic_dataset, max_iter=4, seed=3, augment=True,
        use_mesh=True,
    )
    leaves_s = jax.tree_util.tree_leaves(p_single)
    leaves_m = jax.tree_util.tree_leaves(p_sharded)
    assert leaves_s and len(leaves_s) == len(leaves_m)
    for a, b in zip(leaves_s, leaves_m):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-4, atol=1e-6
        )


def test_dropout_unbiased_and_masking():
    batch = _batch(bsz=1, p=4, s=8, d=256)
    batch["seq_feats"] = jnp.ones_like(batch["seq_feats"])
    out = augment_video_batch(
        batch, jax.random.PRNGKey(11), STRIDE,
        max_shift_frac=0.0, feat_dropout=0.25,
    )
    vals = np.asarray(out["seq_feats"]).ravel()
    kept = vals[vals != 0.0]
    assert kept.size > 0 and np.allclose(kept, 1.0 / 0.75)
    # unbiased in expectation: mean stays ~1
    assert abs(vals.mean() - 1.0) < 0.05
    # zero rate ~ dropout rate
    assert abs((vals == 0.0).mean() - 0.25) < 0.05
