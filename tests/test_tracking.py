import jax.numpy as jnp
import numpy as np
import pytest
import scipy.linalg

from tspn_tpu.tracking import kalman
from tspn_tpu.tracking.tracker import (
    CONFIRMED,
    EMPTY,
    TENTATIVE,
    TrackerConfig,
    init_state,
    track_video,
    tracker_step,
)


# ---------------------------------------------------------------- kalman
def _np_predict(mean, cov):
    """Oracle from the published constant-velocity formulation."""
    wp, wv = 1 / 20, 1 / 160
    F = np.eye(8) + np.eye(8, k=4)
    h = mean[3]
    q = np.square(
        [wp * h, wp * h, 1e-2, wp * h, wv * h, wv * h, 1e-5, wv * h]
    )
    return F @ mean, F @ cov @ F.T + np.diag(q)


def test_initiate_shapes_and_values():
    m = jnp.asarray([[10.0, 20.0, 0.5, 40.0]])
    mean, cov = kalman.initiate(m)
    assert mean.shape == (1, 8) and cov.shape == (1, 8, 8)
    assert np.allclose(mean[0, :4], [10, 20, 0.5, 40])
    assert np.allclose(mean[0, 4:], 0)
    assert cov[0, 0, 0] == pytest.approx((2 / 20 * 40) ** 2)


def test_predict_matches_oracle(rng):
    means = jnp.asarray(rng.rand(3, 8) * 50 + 10)
    covs = jnp.asarray(np.stack([np.diag(rng.rand(8) + 0.5) for _ in range(3)]))
    new_means, new_covs = kalman.predict(means, covs)
    for i in range(3):
        em, ec = _np_predict(np.asarray(means)[i], np.asarray(covs)[i])
        assert np.allclose(new_means[i], em, atol=1e-4)
        assert np.allclose(new_covs[i], ec, atol=1e-4)


def test_update_pulls_toward_measurement():
    m0 = jnp.asarray([[10.0, 10.0, 0.5, 40.0]])
    mean, cov = kalman.initiate(m0)
    mean, cov = kalman.predict(mean, cov)
    meas = jnp.asarray([[14.0, 12.0, 0.5, 40.0]])
    new_mean, new_cov = kalman.update(mean, cov, meas)
    # posterior between prior and measurement, variance shrinks
    assert 10.0 < float(new_mean[0, 0]) <= 14.0
    assert float(new_cov[0, 0, 0]) < float(cov[0, 0, 0])


def test_gating_distance_is_squared_mahalanobis(rng):
    mean, cov = kalman.initiate(jnp.asarray([[20.0, 30.0, 0.5, 50.0]]))
    mean, cov = kalman.predict(mean, cov)
    meas = jnp.asarray(rng.rand(5, 4) * 40 + 10)
    d = np.asarray(kalman.gating_distance(mean, cov, meas))
    # oracle: project then solve
    pm, pc = kalman.project(mean, cov)
    pm, pc = np.asarray(pm)[0], np.asarray(pc)[0]
    L = np.linalg.cholesky(pc)
    z = scipy.linalg.solve_triangular(L, (np.asarray(meas) - pm).T, lower=True)
    expected = np.sum(z * z, axis=0)
    assert np.allclose(d[0], expected, atol=1e-3)


def test_tlwh_xyah_roundtrip(rng):
    tlwh = jnp.asarray(rng.rand(6, 4) * 50 + 5)
    back = kalman.to_tlwh(kalman.to_xyah(tlwh))
    assert np.allclose(back, tlwh, atol=1e-4)


# ---------------------------------------------------------------- tracker
def _frames_linear(num_frames, starts, velocity=2.0, d_max=8, f_dim=16, seed=0):
    """Objects moving right; each object has a stable random feature."""
    rng = np.random.RandomState(seed)
    feats = rng.rand(len(starts), f_dim)
    det_tlwh = np.zeros((num_frames, d_max, 4), np.float32)
    det_feat = np.zeros((num_frames, d_max, f_dim), np.float32)
    det_mask = np.zeros((num_frames, d_max), bool)
    for t in range(num_frames):
        for i, (x, y) in enumerate(starts):
            det_tlwh[t, i] = [x + velocity * t, y, 30, 60]
            det_feat[t, i] = feats[i] + rng.normal(0, 0.01, f_dim)
            det_mask[t, i] = True
    return det_tlwh, det_feat, det_mask


def test_single_object_stable_id():
    cfg = TrackerConfig(max_tracks=8)
    tlwh, feat, mask = _frames_linear(12, [(10, 10)])
    outs = track_video(cfg, jnp.asarray(tlwh), jnp.asarray(feat), jnp.asarray(mask))
    visible = np.asarray(outs["visible"])
    ids = np.asarray(outs["track_id"])
    # confirmed from frame n_init-1 onward (hits >= 3)
    assert not visible[0].any() and not visible[1].any()
    assert visible[2:].sum(axis=1).tolist() == [1] * 10
    tid = ids[2][visible[2]][0]
    for t in range(2, 12):
        assert ids[t][visible[t]][0] == tid
    # track follows the motion
    boxes = np.asarray(outs["tlwh"])
    x_positions = [boxes[t][visible[t]][0][0] for t in range(2, 12)]
    assert x_positions[-1] > x_positions[0] + 10


def test_two_objects_distinct_ids():
    cfg = TrackerConfig(max_tracks=8)
    tlwh, feat, mask = _frames_linear(10, [(10, 10), (200, 150)])
    outs = track_video(cfg, jnp.asarray(tlwh), jnp.asarray(feat), jnp.asarray(mask))
    visible = np.asarray(outs["visible"])
    ids = np.asarray(outs["track_id"])
    assert visible[-1].sum() == 2
    final_ids = set(ids[-1][visible[-1]].tolist())
    assert len(final_ids) == 2
    # ids stable across frames
    for t in range(3, 10):
        assert set(ids[t][visible[t]].tolist()) == final_ids


def test_track_survives_short_occlusion():
    cfg = TrackerConfig(max_tracks=8, max_age=30)
    tlwh, feat, mask = _frames_linear(20, [(50, 50)])
    # hide detections for frames 8-10
    mask[8:11] = False
    outs = track_video(cfg, jnp.asarray(tlwh), jnp.asarray(feat), jnp.asarray(mask))
    visible = np.asarray(outs["visible"])
    ids = np.asarray(outs["track_id"])
    id_before = ids[7][visible[7]][0]
    assert visible[15].any()
    assert ids[15][visible[15]][0] == id_before  # same identity after gap


def test_tentative_track_deleted_on_miss():
    cfg = TrackerConfig(max_tracks=8)
    tlwh, feat, mask = _frames_linear(6, [(50, 50)])
    mask[1:] = False  # one detection then nothing
    outs = track_video(cfg, jnp.asarray(tlwh), jnp.asarray(feat), jnp.asarray(mask))
    states = np.asarray(outs["state"])
    # tentative track must be dropped after the first miss, never confirmed
    assert not np.asarray(outs["visible"]).any()
    assert (states[2:] == EMPTY).all()


def test_stale_confirmed_track_deleted():
    cfg = TrackerConfig(max_tracks=8, max_age=5)
    tlwh, feat, mask = _frames_linear(20, [(50, 50)])
    mask[6:] = False
    outs = track_video(cfg, jnp.asarray(tlwh), jnp.asarray(feat), jnp.asarray(mask))
    states = np.asarray(outs["state"])
    assert (states[5] == CONFIRMED).any()
    assert (states[-1] == EMPTY).all()  # deleted after max_age misses


def test_crossing_objects_keep_ids_via_appearance():
    """Two objects crossing paths: appearance should prevent ID swap."""
    cfg = TrackerConfig(max_tracks=8)
    num_frames, f_dim = 16, 16
    rng = np.random.RandomState(1)
    fa, fb = rng.rand(f_dim), rng.rand(f_dim)
    det_tlwh = np.zeros((num_frames, 8, 4), np.float32)
    det_feat = np.zeros((num_frames, 8, f_dim), np.float32)
    det_mask = np.zeros((num_frames, 8), bool)
    for t in range(num_frames):
        det_tlwh[t, 0] = [10 + 10 * t, 50, 30, 60]   # moving right
        det_tlwh[t, 1] = [160 - 10 * t, 50, 30, 60]  # moving left
        det_feat[t, 0] = fa
        det_feat[t, 1] = fb
        det_mask[t, :2] = True
    outs = track_video(cfg, jnp.asarray(det_tlwh), jnp.asarray(det_feat), jnp.asarray(det_mask))
    visible = np.asarray(outs["visible"])
    ids = np.asarray(outs["track_id"])
    boxes = np.asarray(outs["tlwh"])
    # find the id that owned the rightward-moving object early on
    t_early, t_late = 3, num_frames - 1
    def id_at(t, x_target):
        vis = np.flatnonzero(visible[t])
        k = vis[np.argmin(np.abs(boxes[t, vis, 0] - x_target))]
        return ids[t, k]
    right_id_early = id_at(t_early, 10 + 10 * t_early)
    right_id_late = id_at(t_late, 10 + 10 * t_late)
    assert right_id_early == right_id_late


def test_collapsed_cascade_keeps_behavior():
    """cascade_depth=0 (one assignment over all confirmed tracks) keeps
    identity stability and occlusion recovery."""
    cfg = TrackerConfig(max_tracks=8, cascade_depth=0)
    tlwh, feat, mask = _frames_linear(20, [(50, 50), (300, 200)])
    mask[8:11, 0] = False  # occlude object 0 for three frames
    outs = track_video(cfg, jnp.asarray(tlwh), jnp.asarray(feat), jnp.asarray(mask))
    visible = np.asarray(outs["visible"])
    ids = np.asarray(outs["track_id"])
    assert visible[-1].sum() == 2
    id_before = set(ids[7][visible[7]].tolist())
    id_after = set(ids[15][visible[15]].tolist())
    assert id_before == id_after  # same identities through the gap


def test_batched_videos_match_sequential():
    """vmap'd multi-video tracking gives identical results per video."""
    from tspn_tpu.tracking.tracker import track_videos_batch

    cfg = TrackerConfig(max_tracks=8, cascade_depth=4)
    vids = []
    for seed in (0, 1, 2):
        vids.append(_frames_linear(10, [(10, 10), (200, 150)], seed=seed))
    tlwh = jnp.asarray(np.stack([v[0] for v in vids]))
    feat = jnp.asarray(np.stack([v[1] for v in vids]))
    mask = jnp.asarray(np.stack([v[2] for v in vids]))
    batched = track_videos_batch(cfg, tlwh, feat, mask)
    for b in range(3):
        single = track_video(cfg, tlwh[b], feat[b], mask[b])
        for key in ("track_id", "visible", "state"):
            assert np.array_equal(
                np.asarray(batched[key])[b], np.asarray(single[key])
            ), key
        assert np.allclose(
            np.asarray(batched["tlwh"])[b], np.asarray(single["tlwh"]), atol=1e-4
        )


def test_crowded_frame_does_not_corrupt_tracks():
    """Regression: with more unmatched detections than free slots the
    initiation ranks must never collide with occupied-slot sentinels
    (previously every live track was wiped and re-initialized)."""
    cfg = TrackerConfig(max_tracks=4, cascade_depth=4)
    num_frames, d_max, f_dim = 8, 12, 8
    rng = np.random.RandomState(3)
    det_tlwh = np.zeros((num_frames, d_max, 4), np.float32)
    det_feat = rng.rand(num_frames, d_max, f_dim).astype(np.float32)
    det_mask = np.zeros((num_frames, d_max), bool)
    # four stable objects
    feats = rng.rand(4, f_dim)
    for t in range(num_frames):
        for i in range(4):
            det_tlwh[t, i] = [50 + 120 * i, 50, 30, 60]
            det_feat[t, i] = feats[i]
            det_mask[t, i] = True
    # frame 5: a burst of 8 extra far-away detections (> max_tracks + 1)
    for j in range(4, 12):
        det_tlwh[5, j] = [900 + 40 * j, 700, 30, 60]
        det_mask[5, j] = True
    outs = track_video(cfg, jnp.asarray(det_tlwh), jnp.asarray(det_feat),
                       jnp.asarray(det_mask))
    visible = np.asarray(outs["visible"])
    ids = np.asarray(outs["track_id"])
    before = set(ids[4][visible[4]].tolist())
    after = set(ids[7][visible[7]].tolist())
    assert len(before) == 4
    # the four original identities survive the crowded frame
    assert before <= after


def test_track_videos_sharded_equivalence():
    """track_videos_sharded over an 8-device mesh == track_videos_batch
    on one device, including a batch size that needs padding (VERDICT r4
    item 4: the tracker's multi-chip path)."""
    import jax
    import jax.numpy as jnp
    from jax.sharding import Mesh

    from tspn_tpu.tracking.tracker import (
        TrackerConfig,
        track_videos_batch,
        track_videos_sharded,
    )

    b, t, d, f = 5, 12, 6, 16  # 5 % 8 != 0: exercises the pad path
    rng = np.random.RandomState(3)
    base = rng.uniform(50, 300, (b, 1, d, 2))
    drift = np.cumsum(rng.randn(b, t, d, 2) * 2.0, axis=1)
    xy = (base + drift).astype(np.float32)
    wh = np.broadcast_to(
        rng.uniform(20, 60, (b, 1, d, 2)).astype(np.float32), xy.shape
    )
    tlwh = jnp.asarray(np.concatenate([xy, wh], axis=-1))
    feats = jnp.asarray(rng.randn(b, t, d, f).astype(np.float32))
    mask = jnp.asarray(rng.rand(b, t, d) < 0.9)

    cfg = TrackerConfig(max_tracks=16, gallery_size=8, cascade_depth=30)
    ref = jax.tree_util.tree_map(
        np.asarray, track_videos_batch(cfg, tlwh, feats, mask)
    )
    mesh = Mesh(np.asarray(jax.devices()[:8]), ("data",))
    out = jax.tree_util.tree_map(
        np.asarray, track_videos_sharded(cfg, tlwh, feats, mask, mesh)
    )
    assert set(ref) == set(out)
    for k in ref:
        np.testing.assert_allclose(ref[k], out[k], atol=1e-5, err_msg=k)
