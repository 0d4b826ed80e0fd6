"""Metric/logger utilities (runtime/logging_utils.py), the counterparts
of reference lib/utils/metric_logger.py:8-68 and logger.py:6-32."""

import logging

import pytest

from tspn_tpu.runtime.logging_utils import (
    MetricLogger,
    SmoothedValue,
    eta_string,
    setup_logger,
)


def test_smoothed_value_median_and_averages():
    v = SmoothedValue(window_size=3)
    for x in (1.0, 5.0, 3.0):
        v.update(x)
    assert v.median == 3.0  # odd window: middle of sorted {1,3,5}
    assert v.avg == pytest.approx(3.0)
    assert v.global_avg == pytest.approx(3.0)

    v.update(9.0)  # evicts 1.0 -> window {5,3,9}, series {1,5,3,9}
    assert v.median == 5.0
    assert v.avg == pytest.approx((5 + 3 + 9) / 3)
    assert v.global_avg == pytest.approx((1 + 5 + 3 + 9) / 4)


def test_smoothed_value_even_window_median_is_middle_average():
    v = SmoothedValue(window_size=4)
    for x in (4.0, 1.0, 3.0, 2.0):
        v.update(x)
    assert v.median == pytest.approx(2.5)


def test_smoothed_value_empty():
    v = SmoothedValue()
    assert v.median == 0.0
    assert v.avg == 0.0
    assert v.global_avg == 0.0


def test_metric_logger_nan_guard_and_access():
    m = MetricLogger()
    m.update(loss=1.0, acc=0.5)
    m.update(loss=float("nan"), acc=0.7)  # NaN skipped per meter
    m.update(loss=3.0)
    assert m.loss.count == 2  # the NaN update never landed
    assert m.loss.global_avg == pytest.approx(2.0)
    assert m.acc.count == 2
    with pytest.raises(AttributeError):
        _ = m.never_updated
    s = str(m)
    assert "loss:" in s and "acc:" in s


def test_eta_string():
    assert eta_string(1.0, 1, 3662) == "1:01:00"  # 3660 s remain
    assert eta_string(2.5, 99, 100) == "0:00:00"  # last iteration
    assert eta_string(1.0, 100, 100) == "0:00:00"  # clamped, no negative


def test_setup_logger_rank_and_file(tmp_path):
    # rank > 0: muted — no handlers attached (reference logger.py:12-14)
    muted = setup_logger("tspn_test_rank1", save_dir=str(tmp_path),
                         distributed_rank=1)
    assert muted.handlers == []

    log = setup_logger("tspn_test_rank0", save_dir=str(tmp_path),
                       filename="run.txt")
    log.info("hello file")
    # repeated setup must not stack duplicate handlers
    again = setup_logger("tspn_test_rank0", save_dir=str(tmp_path),
                         filename="run.txt")
    assert again is log
    assert len(log.handlers) == 2  # stream + file, once
    for h in log.handlers:
        h.flush()
    text = (tmp_path / "run.txt").read_text()
    assert "hello file" in text
    # cleanup so other tests' logging is unaffected
    for h in list(log.handlers):
        log.removeHandler(h)
        h.close()
    logging.getLogger("tspn_test_rank0").handlers.clear()
