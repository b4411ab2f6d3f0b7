"""Loop-closure detection: radius candidates + registration verification
+ Hessian-whitened edges (no counterpart in the reference — its pose-graph
fixture plants loop constraints by hand, tests/simple_optimization_test.cc:
93-122)."""

import jax.numpy as jnp
import numpy as np
import pytest

from nonlinear_optimizer_for_slam_tpu.core.pose import Pose, np_quat_to_rotmat
from nonlinear_optimizer_for_slam_tpu.pipelines import ndt
from nonlinear_optimizer_for_slam_tpu.pipelines.loop_closure import (
    LoopClosureDetector,
)
from nonlinear_optimizer_for_slam_tpu.utils import testing


def _yaw_pose(x, y, yaw, z=0.3):
    c, s = np.cos(yaw), np.sin(yaw)
    R = np.array([[c, -s, 0.0], [s, c, 0.0], [0.0, 0.0, 1.0]])
    return Pose(R, np.array([x, y, z]))


@pytest.fixture(scope="module")
def world():
    pts = testing.generate_room_points(point_step=0.05)
    scan = ndt.filter_points(pts, 0.15)
    return pts, scan


def _scan_at(scan, pose):
    """Simulate observing the world scan from ``pose`` (sensor frame)."""
    return pose.inverse().apply(scan)


def test_detects_revisit_and_recovers_relative_pose(world):
    _, scan = world
    kf0 = _yaw_pose(0.0, 0.0, 0.0)
    kf1 = _yaw_pose(1.5, 0.8, 0.7)

    # clean dense fixture scans: the unquirked map build gives the
    # sharpest verified pose (the detector docstring's advertised knob)
    det = LoopClosureDetector(
        min_id_gap=5, candidate_radius=1.0, identity_moment=False
    )
    det.add_keyframe(0, _scan_at(scan, kf0), kf0)
    det.add_keyframe(1, _scan_at(scan, kf1), kf1)

    # query revisits keyframe 0 with some pose error in the ESTIMATE
    true_q = _yaw_pose(0.25, -0.1, 0.12)
    drift = _yaw_pose(0.08, 0.05, 0.03, z=0.0)
    est_q = Pose(
        drift.rotation @ true_q.rotation,
        drift.rotation @ true_q.translation + drift.translation,
    )
    closure = det.detect(20, _scan_at(scan, true_q), est_q)

    assert closure is not None
    assert closure.reference_id == 0
    assert closure.query_id == 20

    # verified relative pose == kf0^-1 * true_q (both scans cut from the
    # same world, so registration recovers the exact revisit geometry)
    expected = kf0.inverse() * true_q
    t_err = np.linalg.norm(
        closure.relative_pose.translation - expected.translation
    )
    assert t_err < 0.02, t_err
    assert closure.matched_fraction > 0.8
    assert closure.correction > 0.01  # it really had to fix the drift

    # the edge whitener is the cholesky of a sane SPD information
    S = closure.sqrt_info
    H = S.T @ S
    eig = np.linalg.eigvalsh(H)
    assert eig[0] > 0 and np.all(np.isfinite(eig))
    # information grows with constraint quality: full-room scans pin all
    # six directions far above the jitter floor
    assert eig[0] > 1.0


def test_rejects_recent_frames_and_far_candidates(world):
    _, scan = world
    kf0 = _yaw_pose(0.0, 0.0, 0.0)
    det = LoopClosureDetector(min_id_gap=10, candidate_radius=0.5)
    det.add_keyframe(0, _scan_at(scan, kf0), kf0)

    # same place but id gap too small -> odometry neighbor, not a loop
    assert det.detect(5, _scan_at(scan, kf0), kf0) is None
    # far away -> no candidate inside the radius
    far = _yaw_pose(3.0, 2.0, 0.0)
    assert det.detect(50, _scan_at(scan, far), far) is None


def test_rejects_geometry_mismatch(world):
    """A scan that does not overlap the keyframe's geometry fails the
    matched-fraction test even if LM converges somewhere."""
    _, scan = world
    kf0 = _yaw_pose(0.0, 0.0, 0.0)
    det = LoopClosureDetector(min_id_gap=1, candidate_radius=2.0)
    det.add_keyframe(0, _scan_at(scan, kf0), kf0)

    rng = np.random.default_rng(5)
    bogus = rng.uniform(-20.0, 20.0, size=(2000, 3))  # not the room
    assert det.detect(30, bogus, kf0) is None


def test_sqrt_info_reflects_geometry(world):
    """A z=0 plane-only keyframe is much stiffer along its normal than
    in-plane (in-plane constraint comes only from NDT's voxel-mean
    discretization, weighted 1/lambda_max instead of 1/lambda_floor) —
    the edge whitener must carry that anisotropy rather than a scalar
    hand weight. The full-room keyframe, by contrast, is nearly
    isotropic."""
    rng = np.random.default_rng(7)
    plane = np.c_[rng.uniform(-3, 3, (8000, 2)), np.zeros(8000)]
    kf = Pose(np.eye(3), np.zeros(3))
    det = LoopClosureDetector(
        min_id_gap=1,
        candidate_radius=2.0,
        min_match_fraction=0.3,
        identity_moment=False,  # unbiased covariances carry the physics
    )
    det.add_keyframe(0, plane, kf)
    q = Pose(np.eye(3), np.array([0.1, -0.05, 0.04]))
    closure = det.detect(40, q.inverse().apply(plane), q)
    assert closure is not None
    H = closure.sqrt_info.T @ closure.sqrt_info
    eig = np.linalg.eigvalsh(H)
    assert eig[0] > 0 and np.all(np.isfinite(eig))
    # normal (z) translation stiffness dominates the softest in-plane
    # direction by an order of magnitude
    d = np.diag(H)
    assert d[2] > 10.0 * min(d[0], d[1])
    # and the overall spread is far wider than the full-room case (~11x)
    assert eig[-1] / eig[0] > 50.0


def test_remove_keyframe_bounds_candidates(world):
    _, scan = world
    kf0 = _yaw_pose(0.0, 0.0, 0.0)
    det = LoopClosureDetector(min_id_gap=1, candidate_radius=2.0)
    det.add_keyframe(0, _scan_at(scan, kf0), kf0)
    assert det.keyframe_ids() == [0]
    det.remove_keyframe(0)
    assert det.keyframe_ids() == []
    det.remove_keyframe(0)  # idempotent
    assert det.detect(30, _scan_at(scan, kf0), kf0) is None
