"""Golden-value regression: fixed GT + prediction -> exact metric values.

SURVEY.md section 4 item 2: the reference's only end-to-end check was
evaluating a fixed prediction artifact to known numbers. This freezes a
deterministic fixture's metrics so any drift in vIoU conventions, greedy
matching order, AP integration, or recall pooling trips the test.
"""

import pytest

from tspn_tpu.evaluation import eval_visual_relation


def _traj(x0, n=30, drift=1.0):
    return [[x0 + drift * i, 10, x0 + 40 + drift * i, 60] for i in range(n)]


GT = {
    "v1": [
        {"triplet": ("dog", "chase", "cat"), "duration": (0, 30),
         "sub_traj": _traj(0), "obj_traj": _traj(50)},
        {"triplet": ("dog", "watch", "cat"), "duration": (15, 45),
         "sub_traj": _traj(15), "obj_traj": _traj(65)},
    ],
    "v2": [
        {"triplet": ("person", "ride", "horse"), "duration": (0, 30),
         "sub_traj": _traj(5), "obj_traj": _traj(30)},
    ],
}

PRED = {
    "v1": [
        {"triplet": ("dog", "chase", "cat"), "score": 0.9, "duration": (0, 30),
         "sub_traj": _traj(2), "obj_traj": _traj(52)},
        {"triplet": ("dog", "watch", "cat"), "score": 0.5, "duration": (10, 40),
         "sub_traj": _traj(10), "obj_traj": _traj(60)},
        {"triplet": ("cat", "chase", "dog"), "score": 0.8, "duration": (0, 30),
         "sub_traj": _traj(0), "obj_traj": _traj(50)},
    ],
    "v2": [
        {"triplet": ("person", "ride", "horse"), "score": 0.4, "duration": (0, 25),
         "sub_traj": _traj(5, 25), "obj_traj": _traj(30, 25)},
    ],
}


def test_golden_relation_metrics():
    mean_ap, rec_at_n, mprec_at_n = eval_visual_relation(GT, PRED, verbose=False)
    # frozen values: change here only with an explicit semantics decision
    assert mean_ap == pytest.approx(0.9166666716337204, abs=1e-9)
    assert rec_at_n == {50: pytest.approx(1.0), 100: pytest.approx(1.0),
                        1000: pytest.approx(1.0)}
    assert mprec_at_n[1] == pytest.approx(1.0)
    assert mprec_at_n[5] == pytest.approx(0.8333333432674408, abs=1e-9)
    assert mprec_at_n[10] == pytest.approx(0.8333333432674408, abs=1e-9)
