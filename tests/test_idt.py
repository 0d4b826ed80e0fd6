"""features/idt: pixel-computed HoG/HoF/MBH bag-of-words descriptors.

Physics tests work at the histogram-map level (known gradients / known
motion -> known bins); plumbing tests cover integral-image pooling
(oracle: direct slice sums), codebook assignment invariants, and the
pipeline integration (FEATURES.APPEARANCE == "idt").
"""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from tspn_tpu.features import idt  # noqa: E402


def _gauss_blob(h, w, cy, cx, sigma=3.0):
    ys, xs = np.mgrid[0:h, 0:w].astype(np.float32)
    return np.exp(-((ys - cy) ** 2 + (xs - cx) ** 2) / (2 * sigma**2))


# ---------------------------------------------------------------- pooling


def test_integral_box_cell_sums_match_direct_slices():
    rng = np.random.RandomState(0)
    maps = rng.rand(12, 16, 5).astype(np.float32)
    ii = np.asarray(idt.integral_image(jnp.asarray(maps)))
    # direct integral oracle
    ref_ii = maps.cumsum(0).cumsum(1)
    assert np.allclose(ii[1:, 1:], ref_ii, atol=1e-4)

    boxes = jnp.asarray([[0.0, 0.0, 16.0, 12.0], [2.0, 1.0, 10.0, 9.0]])
    got = np.asarray(idt.box_cell_sums(jnp.asarray(ii), boxes))
    assert got.shape == (2, idt.GRID * idt.GRID * 5)
    # whole-image box, 2x2 cells: sum of cells == image sum per channel
    per_cell = got[0].reshape(idt.GRID * idt.GRID, 5)
    assert np.allclose(per_cell.sum(0), maps.sum((0, 1)), rtol=1e-4)
    # one exact cell of the second box: rows 1..5, cols 2..6
    assert np.allclose(
        per_cell[0] + per_cell[1] + per_cell[2] + per_cell[3],
        maps.sum((0, 1)),
        rtol=1e-4,
    )
    cell00 = got[1].reshape(idt.GRID * idt.GRID, 5)[0]
    assert np.allclose(cell00, maps[1:5, 2:6].sum((0, 1)), rtol=1e-4)


# ------------------------------------------------------------- histograms


def test_oriented_histogram_known_direction():
    # gradient pointing at a bin CENTER: angle for bin i is
    # -pi + (i + 0.5) / bins * 2pi; pick i = 5 of 8
    bins = 8
    ang = -np.pi + (5 + 0.5) / bins * 2 * np.pi
    gx = np.full((4, 4), 2.0 * np.cos(ang), np.float32)
    gy = np.full((4, 4), 2.0 * np.sin(ang), np.float32)
    h = np.asarray(
        idt.oriented_histogram_map(jnp.asarray(gx), jnp.asarray(gy), bins)
    )
    assert h.shape == (4, 4, bins)
    # all mass (= magnitude 2.0) in bin 5
    assert np.allclose(h[..., 5], 2.0, atol=1e-3)
    assert np.allclose(h.sum(-1), 2.0, atol=1e-3)


def test_oriented_histogram_circular_split():
    # angle exactly BETWEEN bins 0 and 1 splits mass across them
    bins = 8
    ang = -np.pi + 1.0 / bins * 2 * np.pi
    gx = np.float32(np.cos(ang))[None, None] * np.ones((2, 2), np.float32)
    gy = np.float32(np.sin(ang))[None, None] * np.ones((2, 2), np.float32)
    h = np.asarray(
        idt.oriented_histogram_map(jnp.asarray(gx), jnp.asarray(gy), bins)
    )
    assert np.allclose(h[..., 0], 0.5, atol=1e-3)
    assert np.allclose(h[..., 1], 0.5, atol=1e-3)


def test_horn_schunck_recovers_translation():
    base = _gauss_blob(32, 32, 16, 14) + 0.5 * _gauss_blob(32, 32, 10, 20)
    shifted = np.roll(base, 1, axis=1)  # move RIGHT by 1 px
    u, v = idt.horn_schunck_flow(jnp.asarray(base), jnp.asarray(shifted))
    u, v = np.asarray(u), np.asarray(v)
    # weight by where there is signal
    w = np.abs(base - base.mean())
    mu = (u * w).sum() / w.sum()
    mv = (v * w).sum() / w.sum()
    assert mu > 0.3, f"mean u {mu} should point right"
    assert abs(mv) < 0.5 * mu


def test_hof_static_scene_mass_in_stationary_bin():
    u = jnp.zeros((6, 6))
    h = np.asarray(idt.hof_map(u, u))
    assert np.allclose(h[..., -1], 1.0)
    assert np.allclose(h[..., :-1], 0.0)


def test_hof_moving_scene_leaves_stationary_bin():
    u = jnp.full((6, 6), 1.0)  # 1 px/frame to the right, > threshold
    v = jnp.zeros((6, 6))
    h = np.asarray(idt.hof_map(u, v))
    assert np.allclose(h[..., -1], 0.0)
    assert h[..., :-1].sum() > 0


def test_mbh_ignores_uniform_flow_sees_shear():
    const_u = jnp.full((8, 8), 3.0)
    zero = jnp.zeros((8, 8))
    h_const = np.asarray(idt.mbh_map(const_u, zero))
    # uniform (camera-like) motion: flow gradients ~ 0 except borders
    assert h_const[1:-1, 1:-1].sum() < 1e-3
    shear_u = jnp.asarray(np.tile(np.arange(8, dtype=np.float32), (8, 1)))
    h_shear = np.asarray(idt.mbh_map(shear_u, zero))
    assert h_shear[1:-1, 1:-1].sum() > 1.0


# ------------------------------------------------------------------- BoW


def test_bow_assignment_sums_to_one_and_is_deterministic():
    cb = idt.codebook("hog", idt.HOG_DIM)
    cb2 = idt.codebook("hog", idt.HOG_DIM)
    assert np.allclose(np.asarray(cb), np.asarray(cb2))
    assert np.allclose(
        np.asarray(jnp.linalg.norm(cb, axis=-1)), 1.0, atol=1e-5
    )
    desc = jnp.asarray(np.random.RandomState(1).rand(7, idt.HOG_DIM))
    a = np.asarray(idt.bow_assign(desc, cb))
    assert a.shape == (7, idt.WORDS)
    assert np.allclose(a.sum(-1), 1.0, atol=1e-4)
    assert (a >= 0).all()


def test_codebooks_differ_per_family():
    a = np.asarray(idt.codebook("hog", 32))
    b = np.asarray(idt.codebook("hof", 32))
    assert not np.allclose(a, b)


# ------------------------------------------------------------- slot level


def _moving_vs_static_frames(t=10, h=96, w=96, step=4):
    """Textured static patch (top), textured patch moving right (bottom).

    Patches are 24 px = 6 map px at the default /4 downscale; step 4 px
    = 1 map px/frame, comfortably above the HoF stationary threshold."""
    rng = np.random.RandomState(3)
    tex_a = rng.rand(24, 24).astype(np.float32)
    tex_b = rng.rand(24, 24).astype(np.float32)
    frames = np.zeros((t, h, w, 3), np.float32)
    static_box = np.array([8, 8, 24, 24], np.float32)  # tlwh
    moving = []
    for f in range(t):
        img = np.full((h, w), 0.2, np.float32)
        img[8:32, 8:32] = tex_a
        x = 8 + step * f
        img[56:80, x : x + 24] = tex_b
        frames[f] = img[..., None] * 255.0
        moving.append([x, 56, 24, 24])
    return frames, static_box, np.asarray(moving, np.float32)


def test_slot_assignments_shapes_masking_and_motion_discrimination():
    frames, static_box, moving_boxes = _moving_vs_static_frames()
    t = frames.shape[0]
    k = 3
    tlwh = np.zeros((t, k, 4), np.float32)
    visible = np.zeros((t, k), bool)
    tlwh[:, 0] = static_box
    tlwh[:, 1] = moving_boxes
    visible[:, :2] = True  # slot 2 stays invisible
    maps = idt.compute_idt_maps(frames)
    out = idt.slot_idt_assignments(maps, tlwh, visible)
    assert out.shape == (t, k, idt.IDT_DIM)
    assert np.allclose(out[:, 2], 0.0)  # masked slot
    # each family's assignment sums to ~1 at visible slots
    for lo, hi in [(0, 1000), (1000, 2000), (2000, 3000)]:
        assert np.allclose(out[:, :2, lo:hi].sum(-1), 1.0, atol=1e-3)
    # HoF separates moving from static: the two tracklets' mean HoF bags
    # should be farther apart than the static tracklet across time halves
    hof_static = out[:, 0, 1000:2000].mean(0)
    hof_moving = out[:, 1, 1000:2000].mean(0)
    hof_static_a = out[: t // 2, 0, 1000:2000].mean(0)
    hof_static_b = out[t // 2 :, 0, 1000:2000].mean(0)

    def cos(a, b):
        return float(
            np.dot(a, b) / (np.linalg.norm(a) * np.linalg.norm(b) + 1e-12)
        )

    assert cos(hof_static, hof_moving) < cos(hof_static_a, hof_static_b), (
        "moving vs static HoF bags should differ more than static-vs-itself"
    )


# ------------------------------------------------------------ integration


def test_tracklet_motion_bow_idt_layout():
    from tspn_tpu.features.extraction import tracklet_motion_bow

    rng = np.random.RandomState(0)
    boxes = jnp.asarray(rng.rand(3, 8, 4).astype(np.float32))
    boxes = boxes.at[..., 2:].add(1.0)  # valid xyxy
    bags = jnp.asarray(rng.rand(3, idt.IDT_DIM).astype(np.float32))
    out = np.asarray(tracklet_motion_bow(boxes, idt=bags))
    assert out.shape == (3, 4000)
    # blocks 2-4 are the L1-normalized families
    fam0 = np.asarray(bags[:, :1000])
    fam0 = fam0 / np.abs(fam0).sum(-1, keepdims=True)
    assert np.allclose(out[:, 1000:2000], fam0, atol=1e-5)
    # every block L1-normalized
    for lo in range(0, 4000, 1000):
        assert np.allclose(np.abs(out[:, lo : lo + 1000]).sum(-1), 1.0, atol=1e-4)


def test_visual_mode_gating():
    from tspn_tpu.config import get_default_config
    from tspn_tpu.pipeline import idt_from_config, visual_mode

    cfg = get_default_config()
    assert visual_mode(cfg) == "learned"
    assert idt_from_config(cfg, None, None) is None
    cfg.FEATURES.APPEARANCE = "idt"
    assert visual_mode(cfg) == "idt"
    cfg.FEATURES.APPEARANCE = "bogus"
    with pytest.raises(ValueError):
        visual_mode(cfg)


def test_idt_per_slot_from_tracks():
    frames, static_box, moving_boxes = _moving_vs_static_frames(t=6)
    t = frames.shape[0]
    track_out = {
        "tlwh": np.stack(
            [np.tile(static_box, (t, 1)), moving_boxes[:t]], axis=1
        ),
        "visible": np.ones((t, 2), bool),
    }
    out = idt.idt_per_slot(frames, track_out)
    assert out.shape == (t, 2, idt.IDT_DIM)
    assert np.isfinite(out).all()


def test_idt_per_slot_chunked_equals_unchunked():
    """Chunked map computation (the memory-bounded path for long
    videos) must reproduce the whole-video pass exactly — the one-frame
    tail overlap preserves every flow pair."""
    frames, static_box, moving_boxes = _moving_vs_static_frames(t=11)
    t = frames.shape[0]
    track_out = {
        "tlwh": np.stack(
            [np.tile(static_box, (t, 1)), moving_boxes[:t]], axis=1
        ),
        "visible": np.ones((t, 2), bool),
    }
    whole = idt.idt_per_slot(frames, track_out, chunk=t)
    chunked = idt.idt_per_slot(frames, track_out, chunk=4)
    np.testing.assert_allclose(chunked, whole, rtol=1e-5, atol=1e-6)


# ------------------------------------------------------- learned codebooks


@pytest.fixture()
def _clean_codebooks():
    """Ensure the registry never leaks across tests."""
    yield
    idt.set_codebooks(None)


def _fit_fixture_frames(n_videos=2, t=8):
    vids = []
    for v in range(n_videos):
        frames, _, _ = _moving_vs_static_frames(t=t)
        # vary content per video (different global offset)
        vids.append(frames + 10.0 * v)
    return vids


def test_fit_codebooks_shapes_unit_norm_determinism(_clean_codebooks):
    vids = _fit_fixture_frames()
    cbs1 = idt.fit_codebooks(vids, kmeans_iters=5)
    cbs2 = idt.fit_codebooks(vids, kmeans_iters=5)
    assert set(cbs1) == {"hog", "hof", "mbh"}
    for fam, dim in (("hog", idt.HOG_DIM), ("hof", idt.HOF_DIM),
                     ("mbh", idt.MBH_DIM)):
        cb = cbs1[fam]
        assert cb.shape == (idt.WORDS, dim)
        np.testing.assert_allclose(
            np.linalg.norm(cb, axis=1), 1.0, atol=1e-4
        )
        np.testing.assert_array_equal(cb, cbs2[fam])


def test_learned_codebooks_improve_quantization(_clean_codebooks):
    """The k-means objective on in-distribution descriptors: mean max
    cosine similarity to the codebook must IMPROVE over the seeded
    fallback (the learned codewords actually model the data), so the
    separation capacity of the BoW blocks holds or improves."""
    vids = _fit_fixture_frames()
    cbs = idt.fit_codebooks(vids, kmeans_iters=15, seed=0)

    # held-out descriptors from a THIRD clip (same texture statistics)
    frames, static_box, moving_boxes = _moving_vs_static_frames(t=8)
    frames = frames + 5.0
    maps = idt.compute_idt_maps(frames)
    rng = np.random.RandomState(9)
    n_b = 24
    hs, ws = maps.hog.shape[1] - 1, maps.hog.shape[2] - 1
    cx = rng.uniform(0, ws, n_b)
    cy = rng.uniform(0, hs, n_b)
    sz = rng.uniform(4, 10, n_b)
    boxes = jnp.asarray(
        np.stack([cx - sz / 2, cy - sz / 2, cx + sz / 2, cy + sz / 2], -1),
        jnp.float32,
    )
    for fam, ii in (("hog", maps.hog), ("hof", maps.hof), ("mbh", maps.mbh)):
        desc = np.asarray(
            jax.vmap(lambda m: idt.box_cell_sums(m, boxes))(ii)
        ).reshape(-1, {"hog": idt.HOG_DIM, "hof": idt.HOF_DIM,
                       "mbh": idt.MBH_DIM}[fam])
        desc = desc[np.linalg.norm(desc, axis=1) > 1e-9]
        x = desc / np.linalg.norm(desc, axis=1, keepdims=True)
        dim = x.shape[1]
        seeded = np.asarray(idt.seeded_codebook(fam, dim))
        sim_seeded = (x @ seeded.T).max(axis=1).mean()
        sim_learned = (x @ cbs[fam].T).max(axis=1).mean()
        assert sim_learned > sim_seeded, (
            f"{fam}: learned {sim_learned:.4f} <= seeded {sim_seeded:.4f}"
        )


def test_set_codebooks_takes_effect_and_roundtrips(tmp_path,
                                                   _clean_codebooks):
    frames, static_box, moving_boxes = _moving_vs_static_frames(t=6)
    t = frames.shape[0]
    track_out = {
        "tlwh": np.stack(
            [np.tile(static_box, (t, 1)), moving_boxes[:t]], axis=1
        ),
        "visible": np.ones((t, 2), bool),
    }
    base = idt.idt_per_slot(frames, track_out)

    cbs = idt.fit_codebooks([frames], kmeans_iters=5)
    path = str(tmp_path / "cb.npz")
    idt.save_codebooks(path, cbs)
    loaded = idt.load_codebooks(path)
    for fam in cbs:
        np.testing.assert_array_equal(loaded[fam], cbs[fam])

    idt.set_codebooks(loaded)
    learned = idt.idt_per_slot(frames, track_out)
    assert learned.shape == base.shape
    assert not np.allclose(learned, base), (
        "learned codebooks produced identical assignments to the fallback"
    )
    # assignments are still distributions per family block
    for lo, width in ((0, idt.WORDS), (idt.WORDS, idt.WORDS),
                      (2 * idt.WORDS, idt.WORDS)):
        s = learned[..., lo : lo + width].sum(-1)
        vis = track_out["visible"]
        np.testing.assert_allclose(s[vis], 1.0, atol=1e-3)

    idt.set_codebooks(None)
    restored = idt.idt_per_slot(frames, track_out)
    np.testing.assert_allclose(restored, base, rtol=1e-6, atol=1e-7)
