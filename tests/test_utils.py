"""Utility tests: TimeChecker aggregation + UnorderedBimap."""

import time

from nonlinear_optimizer_for_slam_tpu.utils.bimap import UnorderedBimap
from nonlinear_optimizer_for_slam_tpu.utils.time_checker import (
    TimeChecker,
    TimeCheckerManager,
    check_exec_time,
)


def test_time_checker_aggregates():
    mgr = TimeCheckerManager.instance()
    mgr.reset()
    for _ in range(3):
        with TimeChecker("unit/label"):
            time.sleep(0.002)
    assert len(mgr.samples["unit/label"]) == 3
    assert all(s >= 1.0 for s in mgr.samples["unit/label"])
    lines = mgr.report_lines()
    assert any("unit/label" in ln for ln in lines)
    mgr.reset()


def test_check_exec_time_auto_label():
    mgr = TimeCheckerManager.instance()
    mgr.reset()
    with check_exec_time():
        pass
    (label,) = mgr.samples.keys()
    assert "test_utils.py" in label and "test_check_exec_time_auto_label" in label
    mgr.reset()


def test_min_time_threshold_filters_report():
    mgr = TimeCheckerManager.instance()
    mgr.reset()
    mgr.register_time("fast", 0.01)
    mgr.register_time("slow", 100.0)
    mgr.set_min_time_threshold(1.0)
    lines = "\n".join(mgr.report_lines())
    assert "slow" in lines and "fast" not in lines
    mgr.set_min_time_threshold(0.0)
    mgr.reset()


def test_bimap_roundtrip_and_deletes():
    bm = UnorderedBimap()
    assert bm.insert(1, "a") and bm.insert(2, "b")
    assert not bm.insert(1, "z")  # duplicate key
    assert not bm.insert(3, "a")  # duplicate value
    assert bm.get_value(1) == "a" and bm.get_key("b") == 2
    # delete_by_value — the reference's buggy path (unordered_bimap.h:63)
    assert bm.delete_by_value("a")
    assert not bm.has_key(1) and not bm.has_value("a")
    assert bm.delete_by_key(2)
    assert len(bm) == 0
    assert not bm.delete_by_value("missing")
