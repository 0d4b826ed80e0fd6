"""Detections -> tracks -> segment artifacts -> relation data path."""

import numpy as np
import pytest

from tspn_tpu.data.segments import set_output_dir
from tspn_tpu.data.vrdataset import SegmentDataset
from tspn_tpu.pipeline import (
    extract_video_artifacts,
    gt_segment_tracklets,
    tracks_from_detections,
)


@pytest.fixture()
def fake_detections(synthetic_dataset, rng):
    """Per-frame 'detections' = GT boxes + jitter + classeme scores."""
    vid = synthetic_dataset.get_index("train")[0]
    anno = synthetic_dataset.get_anno(vid)
    t = anno["frame_count"]
    d_max = 8
    num_classes = 35
    boxes = np.zeros((t, d_max, 4), np.float32)
    scores = np.zeros((t, d_max), np.float32)
    classes = np.zeros((t, d_max), np.int64)
    classeme = np.zeros((t, d_max, num_classes), np.float32)
    mask = np.zeros((t, d_max), bool)
    tid2cls = {
        o["tid"]: synthetic_dataset.get_object_id(o["category"])
        for o in anno["subject/objects"]
    }
    for f, frame in enumerate(anno["trajectories"]):
        for i, roi in enumerate(frame[:d_max]):
            b = roi["bbox"]
            boxes[f, i] = [b["xmin"], b["ymin"], b["xmax"], b["ymax"]]
            boxes[f, i] += rng.normal(0, 1.0, 4)
            cid = tid2cls[roi["tid"]]
            scores[f, i] = 0.9
            classes[f, i] = cid
            classeme[f, i, cid] = 5.0
            classeme[f, i] += rng.normal(0, 0.1, num_classes)
            mask[f, i] = True
    return vid, {
        "boxes": boxes, "scores": scores, "classes": classes,
        "classeme": classeme, "mask": mask,
    }


def test_tracks_from_learned_appearance(fake_detections):
    """classeme_as_appearance=False: the tracker consumes learned re-ID
    embeddings from detections['appearance'] (was a NameError)."""
    import pytest

    vid, dets = fake_detections
    dets = dict(dets)
    rng = np.random.RandomState(4)
    t, d = dets["boxes"].shape[:2]
    # distinct unit embeddings per underlying object (classes encode it)
    base = rng.normal(size=(50, 16)).astype(np.float32)
    base /= np.linalg.norm(base, axis=1, keepdims=True)
    dets["appearance"] = base[dets["classes"]] + rng.normal(
        0, 0.02, (t, d, 16)
    ).astype(np.float32)
    outs = tracks_from_detections(dets, classeme_as_appearance=False)
    assert outs["visible"][10:].sum(axis=1).min() >= 3
    missing = {k: v for k, v in dets.items() if k != "appearance"}
    with pytest.raises(AssertionError, match="appearance"):
        tracks_from_detections(missing, classeme_as_appearance=False)


def test_appearance_from_config_gated(fake_detections, cfg):
    """FEATURES.APPEARANCE gates the pipeline's appearance source:
    'geometric' -> None (proxy blocks), 'learned' -> (T, D, E) re-ID
    embeddings with zeros at masked-out slots."""
    from tspn_tpu.models.reid import EMBED_DIM
    from tspn_tpu.pipeline import appearance_from_config, use_learned_appearance

    vid, dets = fake_detections
    t_small = 3  # encoder runs per valid patch; keep the host work tiny
    dets = {k: v[:t_small] for k, v in dets.items()}
    dets["mask"] = dets["mask"].copy()
    dets["mask"][0, -1] = False
    h = int(dets["boxes"][..., 3].max()) + 8
    w_img = int(dets["boxes"][..., 2].max()) + 8
    frames = (
        np.random.RandomState(0).rand(t_small, h, w_img, 3).astype(np.float32)
    )

    cfg_geo = cfg.clone()
    cfg_geo.FEATURES.APPEARANCE = "geometric"
    assert not use_learned_appearance(cfg_geo)
    assert appearance_from_config(cfg_geo, frames, dets) is None

    cfg_l = cfg.clone()
    cfg_l.FEATURES.APPEARANCE = "learned"
    app = appearance_from_config(cfg_l, frames, dets)
    assert app.shape == dets["boxes"].shape[:2] + (EMBED_DIM,)
    valid = dets["mask"]
    # unit-norm embeddings at valid slots, zeros elsewhere
    norms = np.linalg.norm(app, axis=-1)
    np.testing.assert_allclose(norms[valid], 1.0, atol=1e-4)
    assert (norms[~valid] == 0).all()

    # "idt" is a valid third mode (pixel HoG/HoF/MBH bags): not learned,
    # and appearance_from_config yields nothing for it
    cfg_idt = cfg.clone()
    cfg_idt.FEATURES.APPEARANCE = "idt"
    assert not use_learned_appearance(cfg_idt)
    assert appearance_from_config(cfg_idt, frames, dets) is None

    cfg_bad = cfg.clone()
    cfg_bad.FEATURES.APPEARANCE = "hand-crafted"
    with pytest.raises(ValueError, match="APPEARANCE"):
        use_learned_appearance(cfg_bad)


def test_tracks_from_detections_stable(fake_detections):
    vid, dets = fake_detections
    outs = tracks_from_detections(dets)
    visible = outs["visible"]
    ids = outs["track_id"]
    # three objects, all confirmed and stable after warmup
    assert visible[10:].sum(axis=1).min() == 3
    final = set(ids[-1][visible[-1]].tolist())
    assert len(final) == 3
    for t in range(10, visible.shape[0]):
        assert set(ids[t][visible[t]].tolist()) == final


def test_extract_video_artifacts_feeds_relation_stage(
    fake_detections, synthetic_dataset, cfg, tmp_path
):
    vid, dets = fake_detections
    set_output_dir(str(tmp_path))
    outs = tracks_from_detections(dets)
    # per-slot classeme series: reuse detection classemes via nearest slot
    t, k = outs["track_id"].shape
    classemes = np.zeros((t, k, 35), np.float32)
    for f in range(t):
        for slot in range(k):
            if outs["visible"][f, slot]:
                # nearest detection to the track box
                tb = outs["tlwh"][f, slot]
                db = dets["boxes"][f]
                centers = (db[:, :2] + db[:, 2:]) / 2
                tc = tb[:2] + tb[2:] / 2
                j = np.argmin(((centers - tc) ** 2).sum(-1))
                classemes[f, slot] = dets["classeme"][f, j]
    n = extract_video_artifacts(
        synthetic_dataset, vid, outs, classemes, include_gt=True
    )
    assert n > 0

    # the standard relation data path must consume these artifacts
    ds = SegmentDataset(cfg, synthetic_dataset, phase="train")
    produced = [ix for ix in ds.index if ix[0] == vid]
    assert produced
    rec = ds.load_segment(ds.index.index(produced[0]))
    assert rec.num_proposals >= 2
    assert rec.feats.shape[1] == cfg.PREDICT.FEATURE_DIM
    # jittered GT proposals must match GT -> positive labels exist somewhere
    total_pos = 0
    for ix in produced:
        r = ds.load_segment(ds.index.index(ix))
        total_pos += (r.labels.sum(axis=1) > 0).sum()
    assert total_pos > 0


def test_gt_segment_tracklets(synthetic_dataset):
    vid = synthetic_dataset.get_index("train")[0]
    gts = gt_segment_tracklets(synthetic_dataset, vid, 0, 30, 35)
    assert len(gts) == 3
    for g in gts:
        assert g.rois.shape == (30, 4)
        assert g.gt_trackid >= 0
        assert np.argmax(g.classeme) == g.category


def test_object_prediction_export_and_eval(fake_detections, synthetic_dataset):
    """Tracker outputs -> object prediction JSON -> eval_video_object."""
    import numpy as np

    from tools.export_object_predictions import tracks_to_object_predictions
    from tspn_tpu.data.vocab import VIDVRD_OBJECTS
    from tspn_tpu.evaluation import eval_video_object

    vid, dets = fake_detections
    outs = tracks_from_detections(dets)
    t, k = outs["track_id"].shape
    classemes = np.zeros((t, k, 35), np.float32)
    for f in range(t):
        for slot in np.flatnonzero(outs["visible"][f]):
            tb = outs["tlwh"][f, slot]
            tc = tb[:2] + tb[2:] / 2
            db = dets["boxes"][f]
            centers = (db[:, :2] + db[:, 2:]) / 2
            classemes[f, slot] = dets["classeme"][f][
                np.argmin(((centers - tc) ** 2).sum(-1))
            ]
    # class-name table must match the classeme id space: the synthetic
    # dataset's sorted vocab (on real VidVRD this IS VIDVRD_OBJECTS)
    names = [
        synthetic_dataset.get_object_name(i)
        for i in range(synthetic_dataset.get_object_num())
    ] + VIDVRD_OBJECTS[synthetic_dataset.get_object_num():]
    preds = tracks_to_object_predictions(outs, classemes, names)
    assert len(preds) == 3  # the three tracked GT objects
    for p in preds:
        assert set(p) == {"category", "score", "trajectory"}
        assert len(p["trajectory"]) > 50

    gt = {vid: synthetic_dataset.get_object_insts(vid)}
    mean_ap, ap_class = eval_video_object(gt, {vid: preds}, verbose=False)
    # jittered GT detections tracked well -> high object mAP
    assert mean_ap > 0.6, (mean_ap, ap_class)


def test_load_video_frames_letterbox(tmp_path):
    from PIL import Image

    from tools.run_pipeline import load_video_frames

    vdir = tmp_path / "VIDL"
    vdir.mkdir()
    rng = np.random.RandomState(0)
    for f in range(1, 4):
        Image.fromarray((rng.rand(90, 120, 3) * 255).astype(np.uint8)).save(
            vdir / f"{f:05d}.jpg"
        )
    frames, scale = load_video_frames(str(tmp_path), "VIDL", 64)
    assert frames.shape == (3, 64, 64, 3)
    assert scale == pytest.approx(64 / 120)
    # letterbox pads bottom (90*scale = 48 rows of content)
    assert frames[0, :48].std() > 0
    assert np.allclose(frames[0, 49:], 0.0)


def test_slot_features_exclude_masked_detections():
    """Masked/padded detections (origin boxes) must not win the nearest-
    detection argmin; invisible slots stay zero; frames with no valid
    detections stay zero."""
    from tspn_tpu.pipeline import slot_features_from_detections

    t, d, k = 3, 2, 2
    boxes = np.zeros((t, d, 4), np.float32)
    boxes[:, 1] = [10.0, 10.0, 14.0, 14.0]  # real detection at (12, 12)
    mask = np.zeros((t, d), bool)
    mask[0, 1] = mask[1, 1] = True  # frame 2 has no valid detections
    feats = np.zeros((t, d, 3), np.float32)
    feats[:, 0] = 99.0  # masked slot's features must never appear
    feats[:, 1] = 7.0

    tlwh = np.zeros((t, k, 4), np.float32)
    tlwh[:, 0] = [0.0, 0.0, 2.0, 2.0]   # track at the origin (nearest to
    #                                     the masked slot by distance)
    visible = np.zeros((t, k), bool)
    visible[:, 0] = True

    out = slot_features_from_detections(
        {"tlwh": tlwh, "visible": visible},
        {"boxes": boxes, "mask": mask},
        {"f": feats},
    )["f"]
    np.testing.assert_array_equal(out[0, 0], [7.0, 7.0, 7.0])
    np.testing.assert_array_equal(out[1, 0], [7.0, 7.0, 7.0])
    np.testing.assert_array_equal(out[2, 0], 0.0)  # no valid detections
    np.testing.assert_array_equal(out[:, 1], 0.0)  # invisible slot
