import numpy as np
import pytest

from tspn_tpu.data.trajectory import (
    Trajectory,
    cubic_iou,
    merge_trajectories,
    overlap_traj_iou,
    traj_iou,
)


def _traj(pstart, pend, base, drift=0.0):
    t = np.arange(pend - pstart, dtype=np.float64)
    boxes = np.stack(
        [base[0] + drift * t, base[1] + drift * t,
         base[2] + drift * t, base[3] + drift * t], axis=1
    )
    return Trajectory(pstart=pstart, pend=pend, rois=boxes, score=0.9, category=1)


def test_cubic_iou_identity_and_disjoint(rng):
    boxes = rng.randint(0, 50, size=(3, 10, 2)).astype(np.float64)
    boxes = np.concatenate([boxes, boxes + 30], axis=2)
    m = cubic_iou(boxes, boxes)
    assert np.allclose(np.diag(m), 1.0)
    far = boxes + 1000
    assert np.allclose(cubic_iou(boxes, far), 0.0)


def test_cubic_iou_bruteforce(viou_oracle, rng):
    t = 8
    a = rng.randint(0, 60, size=(4, t, 2)).astype(np.float64)
    a = np.concatenate([a, a + rng.randint(5, 40, size=a.shape)], axis=2)
    b = rng.randint(0, 60, size=(5, t, 2)).astype(np.float64)
    b = np.concatenate([b, b + rng.randint(5, 40, size=b.shape)], axis=2)
    m = cubic_iou(a, b)
    for i in range(4):
        for j in range(5):
            assert m[i, j] == pytest.approx(viou_oracle(a[i], (0, t), b[j], (0, t)))


def test_merge_trajectories_averages_overlap():
    t1 = _traj(0, 30, (0, 0, 10, 10))
    t2 = _traj(15, 45, (2, 2, 12, 12))
    merged = merge_trajectories(t1, t2)
    assert merged.pstart == 0 and merged.pend == 45
    assert merged.rois.shape == (45, 4)
    # overlap boxes averaged
    assert np.allclose(merged.rois[15], [1, 1, 11, 11])
    # tail copied
    assert np.allclose(merged.rois[44], [2, 2, 12, 12])


def test_overlap_traj_iou():
    t1 = _traj(0, 30, (0, 0, 10, 10))
    t2 = _traj(15, 45, (0, 0, 10, 10))
    assert overlap_traj_iou(t1, t2) == pytest.approx(1.0)
    t3 = _traj(30, 60, (0, 0, 10, 10))
    assert overlap_traj_iou(t1, t3) == 0.0


def test_traj_iou_list_api():
    a = [_traj(0, 10, (0, 0, 10, 10)), _traj(0, 10, (100, 100, 120, 120))]
    m = traj_iou(a, a)
    assert m.shape == (2, 2)
    assert m[0, 0] == pytest.approx(1.0)
    assert m[0, 1] == pytest.approx(0.0)


def test_serialize_roundtrip(tmp_path):
    from tspn_tpu.data.segments import set_output_dir
    from tspn_tpu.data.trajectory import (
        load_trajectory_proposals,
        save_trajectory_proposals,
    )

    set_output_dir(str(tmp_path))
    t = _traj(0, 30, (0, 0, 10, 10))
    t.classeme = [0.1] * 35
    save_trajectory_proposals([t], "vidX", 0, 30)
    loaded = load_trajectory_proposals("vidX", 0, 30)
    assert len(loaded) == 1
    assert np.allclose(loaded[0].rois, t.rois)
    logits = load_trajectory_proposals("vidX", 0, 30, logit_only=True)
    assert len(logits[0]) == 35
    assert load_trajectory_proposals("missing", 0, 30) == []
