"""Full-tracker parity: the scan tracker must reproduce the reference
DeepSORT (NumPy/scipy oracle, tests/deepsort_oracle.py) row-for-row on
recorded synthetic sequences — ids, boxes, lifecycle, occlusion
recovery (SURVEY.md §7.2-3 called for whole-pipeline parity, not just
Kalman/LAPJV oracles)."""

import numpy as np
import pytest

from tests.deepsort_oracle import OracleDeepSort


def make_sequence(seed, t=40, num_obj=5, d_slots=10, feat_dim=32,
                  img=400.0, dropout=0.15, clutter_p=0.2):
    """Objects with constant-velocity boxes + distinctive appearance;
    per-frame dropouts and clutter. Returns (tlwh (T,D,4), feats
    (T,D,F), mask (T,D))."""
    rng = np.random.RandomState(seed)
    pos = rng.uniform(50, img - 100, (num_obj, 2))
    vel = rng.uniform(-3, 3, (num_obj, 2))
    size = rng.uniform(30, 60, (num_obj, 2))
    base = rng.randn(num_obj, feat_dim)
    base /= np.linalg.norm(base, axis=1, keepdims=True)

    tlwh = np.zeros((t, d_slots, 4), np.float32)
    feats = np.zeros((t, d_slots, feat_dim), np.float32)
    mask = np.zeros((t, d_slots), bool)
    for f in range(t):
        slot = 0
        for o in range(num_obj):
            if rng.rand() < dropout:
                continue
            p = pos[o] + vel[o] * f + rng.randn(2) * 1.0
            s = size[o] + rng.randn(2) * 0.5
            tlwh[f, slot] = [p[0], p[1], abs(s[0]) + 5, abs(s[1]) + 5]
            fv = base[o] + rng.randn(feat_dim) * 0.03
            feats[f, slot] = fv / np.linalg.norm(fv)
            mask[f, slot] = True
            slot += 1
        if rng.rand() < clutter_p and slot < d_slots:
            tlwh[f, slot] = [rng.uniform(0, img), rng.uniform(0, img),
                             rng.uniform(20, 50), rng.uniform(20, 50)]
            fv = rng.randn(feat_dim)
            feats[f, slot] = fv / np.linalg.norm(fv)
            mask[f, slot] = True
    return tlwh, feats, mask


def run_ours(cfg_kwargs, tlwh, feats, mask):
    import jax.numpy as jnp

    from tspn_tpu.tracking.tracker import TrackerConfig, track_video

    cfg = TrackerConfig(**cfg_kwargs)
    outs = track_video(
        cfg, jnp.asarray(tlwh), jnp.asarray(feats), jnp.asarray(mask)
    )
    rows = []
    vis = np.asarray(outs["visible"])
    ids = np.asarray(outs["track_id"])
    boxes = np.asarray(outs["tlwh"])
    for f in range(tlwh.shape[0]):
        frame_rows = sorted(
            (int(ids[f, k]), boxes[f, k]) for k in np.flatnonzero(vis[f])
        )
        rows.append(frame_rows)
    return rows


def run_oracle(kwargs, tlwh, feats, mask):
    oracle = OracleDeepSort(**kwargs)
    rows = []
    for f in range(tlwh.shape[0]):
        frame_rows = sorted(
            (int(tid), box) for tid, box in oracle.step(tlwh[f], feats[f], mask[f])
        )
        rows.append(frame_rows)
    return rows


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_scan_tracker_matches_reference_oracle(seed):
    tlwh, feats, mask = make_sequence(seed)
    ours = run_ours(
        dict(max_tracks=32, gallery_size=16, cascade_depth=30),
        tlwh, feats, mask,
    )
    ref = run_oracle(dict(budget=16), tlwh, feats, mask)
    assert len(ours) == len(ref)
    for f, (a, b) in enumerate(zip(ours, ref)):
        assert [t for t, _ in a] == [t for t, _ in b], (
            f"frame {f}: ids ours={[t for t, _ in a]} oracle={[t for t, _ in b]}"
        )
        for (_, box_a), (_, box_b) in zip(a, b):
            np.testing.assert_allclose(box_a, box_b, atol=0.1, rtol=1e-3)


def test_long_occlusion_recovery_matches_oracle():
    """An object that disappears for 10 frames must be re-identified at
    the same id by BOTH trackers (the cascade's reason to exist)."""
    tlwh, feats, mask = make_sequence(7, t=50, num_obj=3, dropout=0.0,
                                      clutter_p=0.0)
    mask[20:30, 1] = False  # hide object in slot 1 for 10 frames
    ours = run_ours(
        dict(max_tracks=32, gallery_size=16, cascade_depth=30),
        tlwh, feats, mask,
    )
    ref = run_oracle(dict(budget=16), tlwh, feats, mask)
    for f, (a, b) in enumerate(zip(ours, ref)):
        assert [t for t, _ in a] == [t for t, _ in b], f"frame {f}"
    ids_before = {t for t, _ in ref[19]}
    ids_after = {t for t, _ in ref[35]}
    assert ids_before == ids_after, "oracle itself should recover the id"
