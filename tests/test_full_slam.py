"""End-to-end SLAM integration: NDT scan-odometry frontend + fixed-lag
backend (examples/full_slam.py driven as a library).

This is the system-level acceptance test for the glue: fused
registration producing relative-pose edges whitened END-TO-END by the
registration's own Gauss-Newton information (NdtRegistrar.information
for odometry, closure.sqrt_info for loops — no hand-calibrated scalar
weights), keyframe loop closures registered against bucket-padded
per-scan maps (one compiled program across different map sizes),
switchable rejection of a planted false loop, and tangent-space
marginalization keeping the online estimate near ground truth while
raw odometry drifts.
"""

import importlib.util
import os

import numpy as np

_EX = os.path.join(os.path.dirname(__file__), "..", "examples", "full_slam.py")
_spec = importlib.util.spec_from_file_location("full_slam_example", _EX)
full_slam = importlib.util.module_from_spec(_spec)
_spec.loader.exec_module(full_slam)


import pytest


@pytest.mark.parametrize("whitening", ["information", "calibrated"])
def test_full_slam_beats_odometry_and_rejects_outlier(capsys, whitening):
    e_sm, e_od = full_slam.main(
        n_frames=44, n_scan=700, keyframe_every=5, verbose=True,
        whitening=whitening,
    )
    out = capsys.readouterr().out
    # the planted false loop must have been switched off
    assert "planted FALSE loop" in out
    line = [l for l in out.splitlines() if "switch after update" in l][0]
    assert float(line.split()[-1]) < 0.15, line
    # online accuracy: loops must beat raw odometry clearly
    assert e_sm < 0.6 * e_od, (e_sm, e_od)
    assert e_sm < 0.2, e_sm
