import numpy as np
import pytest

from tspn_tpu.evaluation.common import iou, viou, voc_ap
from tspn_tpu.evaluation.relation import (
    eval_detection_scores,
    eval_tagging_scores,
    evaluate,
)


def test_voc_ap_perfect_curve():
    rec = np.array([0.5, 1.0])
    prec = np.array([1.0, 1.0])
    assert voc_ap(rec, prec) == pytest.approx(1.0)


def test_voc_ap_known_value():
    rec = np.array([0.25, 0.25, 0.5, 0.75])
    prec = np.array([1.0, 0.5, 2 / 3, 0.75])
    # envelope: prec steps 1.0 @0.25, 0.75 up to 0.75
    expected = 0.25 * 1.0 + 0.25 * 0.75 + 0.25 * 0.75
    assert voc_ap(rec, prec) == pytest.approx(expected)


def test_voc_ap_07_metric():
    rec = np.array([1.0])
    prec = np.array([1.0])
    assert voc_ap(rec, prec, use_07_metric=True) == pytest.approx(1.0)


def test_frame_iou_plus_one_convention():
    # identical boxes -> 1; shifted fully apart -> 0
    assert iou((0, 0, 9, 9), (0, 0, 9, 9)) == pytest.approx(1.0)
    assert iou((0, 0, 9, 9), (20, 20, 29, 29)) == pytest.approx(0.0)
    # half overlap with +1 convention: inter=5*10, union=2*100-50
    assert iou((0, 0, 9, 9), (5, 0, 14, 9)) == pytest.approx(50 / 150)


def test_viou_matches_bruteforce(viou_oracle, rng):
    for _ in range(25):
        d1 = (int(rng.randint(0, 20)), 0)
        d1 = (d1[0], d1[0] + int(rng.randint(5, 30)))
        d2 = (int(rng.randint(0, 20)), 0)
        d2 = (d2[0], d2[0] + int(rng.randint(5, 30)))
        t1 = rng.randint(0, 80, size=(d1[1] - d1[0], 2))
        t1 = np.concatenate([t1, t1 + rng.randint(5, 60, size=t1.shape)], axis=1)
        t2 = rng.randint(0, 80, size=(d2[1] - d2[0], 2))
        t2 = np.concatenate([t2, t2 + rng.randint(5, 60, size=t2.shape)], axis=1)
        assert viou(t1, d1, t2, d2) == pytest.approx(viou_oracle(t1, d1, t2, d2))


def test_viou_disjoint_durations():
    t = np.array([[0, 0, 10, 10]] * 5)
    assert viou(t, (0, 5), t, (5, 10)) == 0.0


def _rel(triplet, score, duration, traj):
    return {
        "triplet": triplet,
        "score": score,
        "duration": duration,
        "sub_traj": traj,
        "obj_traj": traj,
    }


def _gt(triplet, duration, traj):
    return {"triplet": triplet, "duration": duration,
            "sub_traj": traj, "obj_traj": traj}


def test_eval_detection_perfect_match():
    traj = [[0, 0, 20, 20]] * 30
    gt = [_gt(("dog", "chase", "cat"), (0, 30), traj)]
    pred = [_rel(("dog", "chase", "cat"), 0.9, (0, 30), traj)]
    prec, rec, scores = eval_detection_scores(gt, pred, 0.5)
    assert rec[-1] == pytest.approx(1.0)
    assert prec[0] == pytest.approx(1.0)
    assert np.isfinite(scores[0])


def test_eval_detection_wrong_triplet_misses():
    traj = [[0, 0, 20, 20]] * 30
    gt = [_gt(("dog", "chase", "cat"), (0, 30), traj)]
    pred = [_rel(("dog", "bite", "cat"), 0.9, (0, 30), traj)]
    _, rec, scores = eval_detection_scores(gt, pred, 0.5)
    assert rec[-1] == 0.0
    assert not np.isfinite(scores[0])


def test_eval_detection_each_gt_matched_once():
    traj = [[0, 0, 20, 20]] * 30
    gt = [_gt(("a", "p", "b"), (0, 30), traj)]
    pred = [
        _rel(("a", "p", "b"), 0.9, (0, 30), traj),
        _rel(("a", "p", "b"), 0.8, (0, 30), traj),
    ]
    _, rec, scores = eval_detection_scores(gt, pred, 0.5)
    assert np.isfinite(scores[0]) and not np.isfinite(scores[1])
    assert rec[-1] == pytest.approx(1.0)


def test_eval_tagging_dedups_triplets():
    traj = [[0, 0, 20, 20]] * 30
    gt = [_gt(("a", "p", "b"), (0, 30), traj)]
    pred = [
        _rel(("a", "p", "b"), 0.9, (0, 30), traj),
        _rel(("a", "p", "b"), 0.8, (0, 30), traj),
        _rel(("x", "y", "z"), 0.7, (0, 30), traj),
    ]
    prec, _, _ = eval_tagging_scores(gt, pred)
    assert prec[0] == pytest.approx(1.0)
    assert prec[1] == pytest.approx(0.5)


def test_evaluate_end_to_end_metrics():
    traj = [[0, 0, 20, 20]] * 30
    gt = {"v1": [_gt(("a", "p", "b"), (0, 30), traj)]}
    pred = {"v1": [_rel(("a", "p", "b"), 0.9, (0, 30), traj)]}
    mean_ap, rec_at_n, mprec_at_n = evaluate(gt, pred, verbose=False)
    assert mean_ap == pytest.approx(1.0)
    assert rec_at_n[50] == pytest.approx(1.0)
    assert mprec_at_n[1] == pytest.approx(1.0)
