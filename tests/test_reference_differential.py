"""Differential oracles: tspn_tpu vs the LIVE reference implementation.

Every other parity test in this suite checks against transcribed oracles
(NumPy rewrites, frozen golden values). These tests instead import and
execute the reference's own code from /root/reference — the metric stack
(lib/evaluation/{common,visual_relation_detection}.py), the DeepSORT
tracker (deep_sort/deep_sort/*.py), and the relation-feature h5 reader
(lib/dataset/vrdataset.py:190-217) — and assert our outputs equal theirs.
A shared transcription error between an implementation and its
hand-written oracle cannot survive this file.

Environment shims (test-side only, reference semantics untouched):
  * ``np.float`` alias — removed in NumPy>=1.24; deep_sort's Detection
    (detection.py:31) still uses it.
  * deep_sort/linear_assignment.py:59-68 indexes the assignment result as
    an (N,2) array (the old sklearn ``linear_assignment`` contract) but the
    file's own scipy shim returns a (rows, cols) tuple — broken as shipped.
    We wrap scipy's result back into the (N,2) contract the call sites
    expect; scipy's optimum is the same optimum sklearn returned.
  * a stub ``dlib`` module (drectangle/correlation_tracker names only) so
    lib.modeling.trajectory imports; none of its code paths run here.
"""

from __future__ import annotations

import os
import sys
import types

import numpy as np
import pytest

REF_ROOT = "/root/reference"


# ---------------------------------------------------------------------------
# reference loading (module-scoped; the whole file skips if unavailable)
# ---------------------------------------------------------------------------

def _install_shims():
    if not hasattr(np, "float"):
        np.float = float  # noqa: NPY001 — deep_sort/detection.py:31 compat
    if "dlib" not in sys.modules:
        stub = types.ModuleType("dlib")
        stub.drectangle = type("drectangle", (), {})
        stub.correlation_tracker = type("correlation_tracker", (), {})
        sys.modules["dlib"] = stub


@pytest.fixture(scope="module")
def ref():
    """Namespace of live reference modules (skips the module if absent)."""
    if not os.path.isdir(REF_ROOT):
        pytest.skip("/root/reference not present")
    _install_shims()
    if REF_ROOT not in sys.path:
        sys.path.append(REF_ROOT)
    import lib.evaluation.common as ref_common
    import lib.evaluation.visual_relation_detection as ref_vrd
    from deep_sort.deep_sort import linear_assignment as ref_lap
    from deep_sort.deep_sort import nn_matching as ref_nn
    from deep_sort.deep_sort.detection import Detection as RefDetection
    from deep_sort.deep_sort.tracker import Tracker as RefTracker

    # restore the sklearn-style (N, 2) contract linear_assignment.py's own
    # call sites (lines 59-68) were written against
    from scipy.optimize import linear_sum_assignment

    ref_lap.linear_assignment = lambda cost: np.column_stack(
        linear_sum_assignment(cost)
    )

    ns = types.SimpleNamespace(
        common=ref_common,
        vrd=ref_vrd,
        nn=ref_nn,
        Detection=RefDetection,
        Tracker=RefTracker,
    )
    return ns


# ---------------------------------------------------------------------------
# (c) vIoU / voc_ap / iou fuzz vs lib/evaluation/common.py
# ---------------------------------------------------------------------------

def _random_traj(rng, n):
    x0 = rng.uniform(0, 300, n)
    y0 = rng.uniform(0, 300, n)
    w = rng.uniform(5, 120, n)
    h = rng.uniform(5, 120, n)
    return np.stack([x0, y0, x0 + w, y0 + h], axis=1).tolist()


@pytest.mark.parametrize("seed", range(5))
def test_viou_matches_reference_fuzz(ref, seed):
    from tspn_tpu.native import viou as our_viou

    rng = np.random.RandomState(100 + seed)
    for _ in range(40):
        s1 = int(rng.randint(0, 40))
        s2 = int(rng.randint(0, 40))
        n1 = int(rng.randint(1, 45))
        n2 = int(rng.randint(1, 45))
        d1, d2 = (s1, s1 + n1), (s2, s2 + n2)
        t1, t2 = _random_traj(rng, n1), _random_traj(rng, n2)
        ours = our_viou(t1, d1, t2, d2)
        theirs = ref.common.viou(t1, d1, t2, d2)
        assert ours == pytest.approx(theirs, abs=1e-9), (d1, d2)


def test_voc_ap_matches_reference_fuzz(ref):
    from tspn_tpu.evaluation.common import voc_ap as our_ap

    rng = np.random.RandomState(7)
    for _ in range(50):
        n = int(rng.randint(1, 60))
        # a realistic PR curve: recall nondecreasing, precision arbitrary
        rec = np.sort(rng.uniform(0, 1, n))
        if rng.rand() < 0.5:  # exercise repeated-recall plateaus
            rec = np.round(rec, 1)
            rec = np.sort(rec)
        prec = rng.uniform(0, 1, n)
        for use07 in (False, True):
            assert our_ap(rec, prec, use07) == pytest.approx(
                ref.common.voc_ap(rec, prec, use07), abs=1e-12
            )


def test_iou_matches_reference_fuzz(ref):
    from tspn_tpu.evaluation.common import iou as our_iou

    rng = np.random.RandomState(11)
    for _ in range(100):
        a = _random_traj(rng, 1)[0]
        b = _random_traj(rng, 1)[0]
        assert our_iou(a, b) == pytest.approx(ref.common.iou(a, b), abs=1e-12)


# ---------------------------------------------------------------------------
# (a) relation detection/tagging metrics vs visual_relation_detection.py
# ---------------------------------------------------------------------------

_OBJECTS = ["dog", "cat", "person", "horse", "car", "bicycle"]
_PREDICATES = ["chase", "watch", "ride", "next_to", "faster"]


def _random_relation(rng, triplet=None, dur=None):
    if triplet is None:
        triplet = (
            _OBJECTS[rng.randint(len(_OBJECTS))],
            _PREDICATES[rng.randint(len(_PREDICATES))],
            _OBJECTS[rng.randint(len(_OBJECTS))],
        )
    if dur is None:
        s = int(rng.randint(0, 60))
        dur = (s, s + int(rng.randint(15, 60)))
    n = dur[1] - dur[0]
    return {
        "triplet": tuple(triplet),
        "duration": tuple(dur),
        "sub_traj": _random_traj(rng, n),
        "obj_traj": _random_traj(rng, n),
    }


def _perturb(rng, rel, jitter):
    """A prediction near `rel`: same triplet, jittered boxes/duration."""
    shift = int(rng.randint(-5, 6))
    dur = (max(0, rel["duration"][0] + shift), rel["duration"][1] + shift)
    n = dur[1] - dur[0]

    def jit(traj, src_dur):
        out = []
        for f in range(dur[0], dur[1]):
            src = min(max(f - src_dur[0], 0), len(traj) - 1)
            b = np.asarray(traj[src], dtype=np.float64)
            b = b + rng.uniform(-jitter, jitter, 4)
            out.append(b.tolist())
        return out

    return {
        "triplet": rel["triplet"],
        "duration": dur,
        "sub_traj": jit(rel["sub_traj"], rel["duration"]),
        "obj_traj": jit(rel["obj_traj"], rel["duration"]),
        # quantized scores so ties exercise the stable-sort behavior
        "score": float(np.round(rng.uniform(0, 1), 1)),
        "_n": n,
    }


def _make_eval_case(seed, num_videos=4):
    rng = np.random.RandomState(seed)
    gt, pred = {}, {}
    for v in range(num_videos):
        vid = f"fuzz_{seed}_{v}"
        gt_rels = [_random_relation(rng) for _ in range(rng.randint(1, 5))]
        preds = []
        for rel in gt_rels:  # near-hits at varying jitter
            for _ in range(rng.randint(0, 3)):
                preds.append(_perturb(rng, rel, jitter=rng.uniform(0, 25)))
        for _ in range(rng.randint(2, 8)):  # clutter
            clutter = _random_relation(rng)
            clutter["score"] = float(np.round(rng.uniform(0, 1), 1))
            preds.append(clutter)
        for p in preds:
            p.pop("_n", None)
        gt[vid] = gt_rels
        pred[vid] = preds
    return gt, pred


@pytest.mark.parametrize("seed", range(4))
def test_relation_eval_matches_reference_fuzz(ref, seed, capsys):
    from tspn_tpu.evaluation import eval_visual_relation

    gt, pred = _make_eval_case(seed)
    ours = eval_visual_relation(gt, pred, verbose=False)
    theirs = ref.vrd.evaluate(gt, pred)
    capsys.readouterr()  # swallow the reference's prints
    assert ours[0] == pytest.approx(theirs[0], abs=1e-9), "mean AP"
    for k in (50, 100, 1000):
        assert ours[1][k] == pytest.approx(theirs[1][k], abs=1e-9), f"R@{k}"
    for k in (1, 5, 10):
        assert ours[2][k] == pytest.approx(theirs[2][k], abs=1e-9), f"P@{k}"


def test_relation_eval_matches_reference_golden(ref, capsys):
    """The frozen golden fixture's values come from the reference itself."""
    from tests.test_golden_metrics import GT, PRED
    from tspn_tpu.evaluation import eval_visual_relation

    ours = eval_visual_relation(GT, PRED, verbose=False)
    theirs = ref.vrd.evaluate(GT, PRED)
    capsys.readouterr()
    assert ours[0] == pytest.approx(theirs[0], abs=1e-9)
    assert {k: ours[1][k] for k in (50, 100, 1000)} == pytest.approx(
        {k: float(theirs[1][k]) for k in (50, 100, 1000)}
    )
    assert {k: ours[2][k] for k in (1, 5, 10)} == pytest.approx(
        {k: float(theirs[2][k]) for k in (1, 5, 10)}
    )


# ---------------------------------------------------------------------------
# (b) scan tracker vs the live deep_sort Tracker
# ---------------------------------------------------------------------------

def _run_reference_tracker(ref, tlwh, feats, mask, budget=16,
                           matching_threshold=0.2):
    metric = ref.nn.NearestNeighborDistanceMetric(
        "cosine", matching_threshold, budget
    )
    tracker = ref.Tracker(metric)  # max_iou 0.7, max_age 30, n_init 3
    rows = []
    for f in range(tlwh.shape[0]):
        dets = [
            ref.Detection(tlwh[f, i], 1.0, feats[f, i])
            for i in np.flatnonzero(mask[f])
        ]
        tracker.predict()
        tracker.update(dets)
        frame = sorted(
            (int(t.track_id), t.to_tlwh())
            for t in tracker.tracks
            if t.is_confirmed() and t.time_since_update <= 1
        )
        rows.append(frame)
    return rows


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_scan_tracker_matches_live_reference(ref, seed):
    from tests.test_tracking_parity import make_sequence, run_ours

    tlwh, feats, mask = make_sequence(seed)
    ours = run_ours(
        dict(max_tracks=32, gallery_size=16, cascade_depth=30),
        tlwh, feats, mask,
    )
    theirs = _run_reference_tracker(ref, tlwh, feats, mask)
    assert len(ours) == len(theirs)
    for f, (a, b) in enumerate(zip(ours, theirs)):
        assert [t for t, _ in a] == [t for t, _ in b], (
            f"frame {f}: ids ours={[t for t, _ in a]} ref={[t for t, _ in b]}"
        )
        for (_, box_a), (_, box_b) in zip(a, b):
            np.testing.assert_allclose(box_a, box_b, atol=0.1, rtol=1e-3)


def test_occlusion_recovery_matches_live_reference(ref):
    from tests.test_tracking_parity import make_sequence, run_ours

    tlwh, feats, mask = make_sequence(7, t=50, num_obj=3, dropout=0.0,
                                      clutter_p=0.0)
    mask[20:30, 1] = False
    ours = run_ours(
        dict(max_tracks=32, gallery_size=16, cascade_depth=30),
        tlwh, feats, mask,
    )
    theirs = _run_reference_tracker(ref, tlwh, feats, mask)
    for f, (a, b) in enumerate(zip(ours, theirs)):
        assert [t for t, _ in a] == [t for t, _ in b], f"frame {f}"
    ids_before = {t for t, _ in theirs[19]}
    ids_after = {t for t, _ in theirs[35]}
    assert ids_before == ids_after, "reference itself recovers the id"


# ---------------------------------------------------------------------------
# (d) relation-feature h5 artifacts read back through the reference reader
# ---------------------------------------------------------------------------

def test_h5_artifact_reads_through_reference_reader(ref, tmp_path, monkeypatch):
    """A repo-written <vsig>-relation.h5 must round-trip byte-identically
    through VRDataset._get_rel_feature (vrdataset.py:190-217)."""
    from lib.dataset.vrdataset import VRDataset  # dlib stubbed in `ref`

    from tspn_tpu.data import segments
    from tspn_tpu.data.feature_store import (
        SegmentFeatures,
        enumerate_ordered_pairs,
        write_segment_features,
    )

    # both path stacks resolve ./vidvrd-baseline-output relative to cwd
    monkeypatch.chdir(tmp_path)
    monkeypatch.setattr(segments, "_output_dir", "./vidvrd-baseline-output")

    rng = np.random.RandomState(3)
    vid, fstart, fend = "ILSVRC2015_train_99990001", 15, 45
    n = 7
    pairs = enumerate_ordered_pairs(n)
    feats = rng.uniform(0, 4, (len(pairs), 11070)).astype(np.float32)
    trackid = np.array([-1, -1, -1, -1, 0, 1, 2], dtype=np.int64)
    iou = rng.uniform(0, 1, (n, n)).astype(np.float32)
    write_segment_features(
        vid, fstart, fend,
        SegmentFeatures(trackid=trackid, pairs=pairs, feats=feats, iou=iou),
    )

    # unbound call: _get_rel_feature touches no instance state
    r_pairs, r_feats, r_iou, r_trackid = VRDataset._get_rel_feature(
        None, vid, fstart, fend
    )
    np.testing.assert_array_equal(r_pairs, pairs)
    np.testing.assert_array_equal(r_trackid, trackid)
    np.testing.assert_array_equal(r_feats, feats)
    np.testing.assert_array_equal(r_iou, iou)

    missing = VRDataset._get_rel_feature(None, vid, 9000, 9030)
    assert missing is None


def test_feature_preprocess_matches_reference(ref):
    """l1_normalize_bow_blocks == VRDataset._feature_preprocess
    (vrdataset.py:219-242) on the same raw features."""
    from lib.dataset.vrdataset import VRDataset

    from tspn_tpu.data.feature_store import l1_normalize_bow_blocks

    rng = np.random.RandomState(5)
    feats = rng.uniform(0, 6, (13, 11070)).astype(np.float32)
    feats[3, 70:1070] = 0.0  # zero BoW block: both sides must not NaN
    ours = l1_normalize_bow_blocks(feats)
    theirs = VRDataset._feature_preprocess(None, feats.astype(np.float64).copy())
    np.testing.assert_allclose(ours, theirs, atol=1e-6)


# ---------------------------------------------------------------------------
# (e) object / action evaluation vs the reference's own modules
# ---------------------------------------------------------------------------

def _random_traj_dict(rng, fstart, n):
    """{frame_id(str): [x0,y0,x1,y1]} — the object-eval trajectory form."""
    boxes = _random_traj(rng, n)
    return {str(fstart + i): boxes[i] for i in range(n)}


def _make_object_case(seed, num_videos=4):
    cats = ["dog", "cat", "car", "person"]
    rng = np.random.RandomState(seed)
    gt, pred = {}, {}
    for v in range(num_videos):
        vid = f"objfuzz_{seed}_{v}"
        gt_tracks, pred_tracks = [], []
        for _ in range(rng.randint(1, 4)):
            c = cats[rng.randint(len(cats))]
            s = int(rng.randint(0, 20))
            n = int(rng.randint(10, 40))
            traj = _random_traj_dict(rng, s, n)
            gt_tracks.append({"category": c, "trajectory": traj})
            for _ in range(rng.randint(0, 3)):  # jittered near-hits
                jit = {
                    fid: (np.asarray(b) + rng.uniform(-15, 15, 4)).tolist()
                    for fid, b in traj.items()
                    if rng.rand() < 0.9  # frame dropouts
                }
                pred_tracks.append({
                    "category": c,
                    "score": float(np.round(rng.uniform(0, 1), 1)),
                    "trajectory": jit or traj,
                })
        for _ in range(rng.randint(1, 4)):  # clutter
            pred_tracks.append({
                "category": cats[rng.randint(len(cats))],
                "score": float(np.round(rng.uniform(0, 1), 1)),
                "trajectory": _random_traj_dict(
                    rng, int(rng.randint(0, 30)), int(rng.randint(5, 25))
                ),
            })
        gt[vid] = gt_tracks
        pred[vid] = pred_tracks
    return gt, pred


@pytest.mark.parametrize("seed", range(3))
def test_object_eval_matches_reference_fuzz(ref, seed, capsys):
    import lib.evaluation.video_object_detection as ref_vod

    from tspn_tpu.evaluation.object import evaluate as our_eval

    gt, pred = _make_object_case(seed)
    our_map, our_ap = our_eval(gt, pred, verbose=False)
    ref_map, ref_ap = ref_vod.evaluate(gt, pred)
    capsys.readouterr()
    assert our_map == pytest.approx(ref_map, abs=1e-12)
    assert dict(our_ap) == pytest.approx(dict(ref_ap), abs=1e-12)


def _make_action_case(seed, num_videos=4):
    acts = ["run", "jump", "sit", "walk"]
    rng = np.random.RandomState(seed)
    gt, pred = {}, {}
    for v in range(num_videos):
        vid = f"actfuzz_{seed}_{v}"
        gt_tracks, pred_tracks = [], []
        for _ in range(rng.randint(1, 4)):
            c = acts[rng.randint(len(acts))]
            s = int(rng.randint(0, 30))
            n = int(rng.randint(10, 40))
            dur = (s, s + n)
            traj = _random_traj(rng, n)
            gt_tracks.append(
                {"category": c, "duration": dur, "trajectory": traj}
            )
            for _ in range(rng.randint(0, 3)):
                shift = int(rng.randint(-4, 5))
                d2 = (max(0, s + shift), s + n + shift)
                pred_tracks.append({
                    "category": c,
                    "score": float(np.round(rng.uniform(0, 1), 1)),
                    "duration": d2,
                    "trajectory": [
                        (np.asarray(b) + rng.uniform(-12, 12, 4)).tolist()
                        for b in _random_traj(rng, d2[1] - d2[0])
                    ] if rng.rand() < 0.3 else [
                        (np.asarray(traj[min(max(f - shift, 0), n - 1)])
                         + rng.uniform(-12, 12, 4)).tolist()
                        for f in range(d2[1] - d2[0])
                    ],
                })
        for _ in range(rng.randint(1, 3)):
            s2 = int(rng.randint(0, 30))
            n2 = int(rng.randint(5, 25))
            pred_tracks.append({
                "category": acts[rng.randint(len(acts))],
                "score": float(np.round(rng.uniform(0, 1), 1)),
                "duration": (s2, s2 + n2),
                "trajectory": _random_traj(rng, n2),
            })
        gt[vid] = gt_tracks
        pred[vid] = pred_tracks
    return gt, pred


@pytest.mark.parametrize("seed", range(3))
def test_action_eval_matches_reference_fuzz(ref, seed, capsys):
    import lib.evaluation.action_detection as ref_act

    from tspn_tpu.evaluation.action import evaluate as our_eval

    gt, pred = _make_action_case(seed)
    our_map, our_ap = our_eval(gt, pred, verbose=False)
    ref_map, ref_ap = ref_act.evaluate(gt, pred)
    capsys.readouterr()
    assert our_map == pytest.approx(ref_map, abs=1e-12)
    assert dict(our_ap) == pytest.approx(dict(ref_ap), abs=1e-12)


# ---------------------------------------------------------------------------
# (f) Kalman filter + appearance metric vs deep_sort's own modules
# ---------------------------------------------------------------------------

def test_kalman_matches_reference_unit(ref):
    """initiate/predict/update/project/gating_distance of the batched
    jnp Kalman against deep_sort's KalmanFilter (kalman_filter.py:23-229)
    over random multi-step trajectories."""
    from deep_sort.deep_sort.kalman_filter import KalmanFilter

    from tspn_tpu.tracking import kalman

    rng = np.random.RandomState(42)
    ref_kf = KalmanFilter()
    k = 6
    meas0 = np.stack([
        [rng.uniform(50, 400), rng.uniform(50, 400),
         rng.uniform(0.3, 2.0), rng.uniform(30, 120)]
        for _ in range(k)
    ])
    # tolerances are f32-scale: the jnp Kalman runs in float32 while
    # deep_sort's runs float64 — the FORMULAS are what's differential
    means, covs = kalman.initiate(np.asarray(meas0))
    ref_states = [ref_kf.initiate(m) for m in meas0]
    np.testing.assert_allclose(
        np.asarray(means), np.stack([m for m, _ in ref_states]), atol=1e-4
    )
    np.testing.assert_allclose(
        np.asarray(covs), np.stack([c for _, c in ref_states]),
        rtol=1e-4, atol=1e-4,
    )

    for step in range(5):
        means, covs = kalman.predict(means, covs)
        ref_states = [ref_kf.predict(m, c) for m, c in ref_states]
        np.testing.assert_allclose(
            np.asarray(means), np.stack([m for m, _ in ref_states]),
            rtol=1e-5, atol=1e-3, err_msg=f"predict step {step}",
        )
        np.testing.assert_allclose(
            np.asarray(covs), np.stack([c for _, c in ref_states]),
            rtol=1e-3, atol=1e-3,
        )
        meas = meas0 + rng.randn(k, 4) * [3.0, 3.0, 0.02, 2.0]
        # gating BEFORE update (what the cascade computes)
        ours_gate = np.asarray(
            kalman.gating_distance(means, covs, np.asarray(meas))
        )
        for t, (m, c) in enumerate(ref_states):
            theirs = ref_kf.gating_distance(m, c, meas)
            np.testing.assert_allclose(ours_gate[t], theirs, rtol=1e-3)
        means, covs = kalman.update(means, covs, np.asarray(meas))
        ref_states = [
            ref_kf.update(m, c, z) for (m, c), z in zip(ref_states, meas)
        ]
        np.testing.assert_allclose(
            np.asarray(means), np.stack([m for m, _ in ref_states]),
            rtol=1e-4, atol=1e-3, err_msg=f"update step {step}",
        )
        np.testing.assert_allclose(
            np.asarray(covs), np.stack([c for _, c in ref_states]),
            rtol=1e-3, atol=1e-3,
        )


def test_cosine_metric_matches_reference(ref):
    """Gallery-vs-detection cosine cost against NearestNeighborDistanceMetric
    (nn_matching.py): min over the budget-windowed gallery of
    1 - cos — the number the cascade thresholds at 0.2."""
    rng = np.random.RandomState(9)
    budget = 4
    metric = ref.nn.NearestNeighborDistanceMetric("cosine", 0.2, budget)
    f = 32
    # three targets, partial_fit in two waves so the budget window drops
    # the oldest features of target 1
    feats1 = rng.randn(3, f)
    metric.partial_fit(feats1, np.asarray([1, 2, 3]), [1, 2, 3])
    feats2 = rng.randn(5, f)
    metric.partial_fit(feats2, np.asarray([1, 1, 1, 1, 2]), [1, 2, 3])
    dets = rng.randn(4, f)
    theirs = metric.distance(dets, np.asarray([1, 2, 3]))

    # ours: the scan tracker's gallery cost = 1 - max(gal_norm @ det_norm)
    galleries = {
        1: np.concatenate([feats1[0:1], feats2[0:4]])[-budget:],
        2: np.concatenate([feats1[1:2], feats2[4:5]])[-budget:],
        3: feats1[2:3][-budget:],
    }
    ours = np.zeros((3, 4))
    for row, tid in enumerate([1, 2, 3]):
        gal = galleries[tid]
        gal = gal / np.linalg.norm(gal, axis=1, keepdims=True)
        d = dets / np.linalg.norm(dets, axis=1, keepdims=True)
        ours[row] = 1.0 - (gal @ d.T).max(axis=0)
    np.testing.assert_allclose(ours, theirs, atol=1e-10)


# ---------------------------------------------------------------------------
# (g) temporal tiling + artifact signature helpers vs lib/modeling/__init__
# ---------------------------------------------------------------------------

def test_segment_tiling_matches_reference(ref):
    """segment_video's 30/15 tiling and get_segment_signature strings are
    THE artifact-compatibility contract (every h5/json file name flows
    through them) — check them against lib/modeling/__init__.py:5-41
    itself over a range of durations including non-multiples and
    too-short videos."""
    import lib.modeling as ref_modeling

    from tspn_tpu.data.segments import get_segment_signature, segment_video

    rng = np.random.RandomState(17)
    cases = [(0, 0), (0, 29), (0, 30), (0, 31), (0, 45), (5, 65),
             (15, 3000)]
    cases += [
        (int(rng.randint(0, 50)), int(rng.randint(0, 4000)))
        for _ in range(50)
    ]
    for fstart, fend in cases:
        assert segment_video(fstart, fend) == ref_modeling.segment_video(
            fstart, fend
        ), (fstart, fend)
    for vid, fs, fe in [("ILSVRC2015_train_00005003", 0, 30),
                        ("x", 15, 45), ("v", 990, 1020)]:
        assert get_segment_signature(vid, fs, fe) == (
            ref_modeling.get_segment_signature(vid, fs, fe)
        )
