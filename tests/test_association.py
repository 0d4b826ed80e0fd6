import numpy as np
import pytest

from tspn_tpu.association import VideoRelation, greedy_relational_association
from tspn_tpu.data.segments import set_output_dir
from tspn_tpu.data.trajectory import Trajectory, save_trajectory_proposals


class FakeDataset:
    def get_object_name(self, cid):
        return f"obj{cid}"

    def get_predicate_name(self, pid):
        return f"pred{pid}"


def _make_traj(boxes):
    return Trajectory(pstart=0, pend=len(boxes), rois=boxes, score=0.9,
                      category=0, classeme=[0.0] * 35)


def _write_segment_trajs(vid, fstart, fend, offsets):
    trajs = []
    for off in offsets:
        boxes = np.tile(np.array([off, off, off + 20.0, off + 20.0]), (fend - fstart, 1))
        trajs.append(_make_traj(boxes))
    save_trajectory_proposals(trajs, vid, fstart, fend)


@pytest.fixture()
def assoc_env(tmp_path):
    set_output_dir(str(tmp_path))
    vid = "VIDX"
    _write_segment_trajs(vid, 0, 30, [0.0, 100.0])
    _write_segment_trajs(vid, 15, 45, [0.0, 100.0])
    return vid


def _st(index, preds):
    return (index, (preds, np.zeros((2, 2)), np.array([-1, -1])))


def test_consistent_predictions_merge(assoc_env):
    vid = assoc_env
    pred = (0.9, np.array([3, 7, 5]), np.array([0, 1]))
    pred2 = (0.8, np.array([3, 7, 5]), np.array([0, 1]))
    out = greedy_relational_association(
        FakeDataset(),
        [_st((vid, 0, 30), [pred]), _st((vid, 15, 45), [pred2])],
    )
    assert len(out) == 1
    rel = out[0]
    assert rel["triplet"] == ["obj3", "pred7", "obj5"]
    assert rel["duration"] == [0, 45]
    assert len(rel["sub_traj"]) == 45
    assert rel["score"] == pytest.approx((0.9 + 0.8) / 2)


def test_different_triplets_stay_separate(assoc_env):
    vid = assoc_env
    a = (0.9, np.array([3, 7, 5]), np.array([0, 1]))
    b = (0.8, np.array([3, 9, 5]), np.array([0, 1]))
    out = greedy_relational_association(
        FakeDataset(),
        [_st((vid, 0, 30), [a]), _st((vid, 15, 45), [b])],
    )
    assert len(out) == 2


def test_non_overlapping_trajs_stay_separate(assoc_env):
    vid = assoc_env
    a = (0.9, np.array([3, 7, 5]), np.array([0, 1]))
    b = (0.8, np.array([3, 7, 5]), np.array([1, 0]))  # swapped tracklets
    out = greedy_relational_association(
        FakeDataset(),
        [_st((vid, 0, 30), [a]), _st((vid, 15, 45), [b])],
    )
    assert len(out) == 2


def test_serialize_schema(assoc_env):
    vid = assoc_env
    pred = (0.9, np.array([1, 2, 3]), np.array([0, 1]))
    out = greedy_relational_association(FakeDataset(), [_st((vid, 0, 30), [pred])])
    rel = out[0]
    assert set(rel) == {"triplet", "score", "duration", "sub_traj", "obj_traj"}
    assert all(len(box) == 4 for box in rel["sub_traj"])
