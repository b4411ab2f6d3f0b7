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


def test_checkpoint_ndt_map_roundtrip(tmp_path, rng):
    import numpy as np

    from nonlinear_optimizer_for_slam_tpu.pipelines import ndt
    from nonlinear_optimizer_for_slam_tpu.utils import checkpoint

    pts = rng.uniform(-3, 3, size=(5000, 3))
    m = ndt.build_ndt_map(pts, 1.0)
    p = str(tmp_path / "map.npz")
    checkpoint.save_ndt_map(p, m)
    m2 = checkpoint.load_ndt_map(p)
    np.testing.assert_allclose(m2.means, m.means)
    np.testing.assert_allclose(m2.sqrt_informations, m.sqrt_informations)
    np.testing.assert_array_equal(m2.valid, m.valid)


def test_checkpoint_pose_roundtrip(tmp_path):
    import numpy as np

    import nonlinear_optimizer_for_slam_tpu as nls
    from nonlinear_optimizer_for_slam_tpu.utils import checkpoint

    pose = nls.Pose.from_axis_angle(0.3, [1.0, 2.0, 3.0], [0.1, 0.2, 0.3])
    p = str(tmp_path / "pose.npz")
    checkpoint.save_pose(p, pose, outer_iteration=np.asarray(4), costs=np.arange(3.0))
    pose2, extras = checkpoint.load_pose(p)
    np.testing.assert_allclose(pose2.matrix(), pose.matrix())
    assert int(extras["outer_iteration"]) == 4
    np.testing.assert_allclose(extras["costs"], [0.0, 1.0, 2.0])


def test_checkpoint_kind_mismatch(tmp_path, rng):
    import pytest as _pytest

    from nonlinear_optimizer_for_slam_tpu.pipelines import ndt
    from nonlinear_optimizer_for_slam_tpu.utils import checkpoint

    pts = rng.uniform(-1, 1, size=(500, 3))
    p = str(tmp_path / "map.npz")
    checkpoint.save_ndt_map(p, ndt.build_ndt_map(pts, 1.0))
    with _pytest.raises(ValueError):
        checkpoint.load_pose(p)


def test_time_checker_save_file(tmp_path):
    mgr = TimeCheckerManager.instance()
    mgr.reset()
    mgr.register_time("saved/label", 5.0)
    p = str(tmp_path / "report.txt")
    mgr.save_file(p)
    text = open(p).read()
    assert "saved/label" in text and "Time Analysis" in text
    mgr.reset()
