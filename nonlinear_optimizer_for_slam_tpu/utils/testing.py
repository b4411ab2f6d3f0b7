"""Deterministic synthetic fixtures mirroring the reference test worlds.

The reference verifies correctness by running every solver variant on the
same synthetic fixture and eyeballing pose/cost agreement (SURVEY section
4). These generators reproduce those fixtures, including the C++ loops'
accumulated floating-point stepping (``for (x = a; x <= b; x += step)``
accumulates rounding error, which determines how many grid samples are
generated — we simulate the identical IEEE-754 accumulation).
"""

from __future__ import annotations

from typing import List, Tuple

import numpy as np

from ..core.pose import Pose
from ..ops.reprojection import CameraIntrinsics


def _accum_range(start: float, stop: float, step: float) -> np.ndarray:
    """Replicates C++ ``for (x = start; x <= stop; x += step)`` float64
    accumulation exactly."""
    values = []
    x = float(start)
    while x <= stop:
        values.append(x)
        x += step
    return np.asarray(values)


def generate_room_points(
    width: float = 5.0,
    length: float = 7.0,
    height: float = 2.5,
    point_step: float = 0.01,
) -> np.ndarray:
    """Synthetic room: floor + 4 walls on a 1 cm grid, ~954,605 points
    (reference: mahalanobis tests/simple_optimization_test.cc:170-204)."""
    xs = _accum_range(-length / 2.0, length / 2.0, point_step)
    ys = _accum_range(-width / 2.0, width / 2.0, point_step)
    zs = _accum_range(0.0, height, point_step)

    # floor (z = 0); C++ order: for x { for y }
    fx, fy = np.meshgrid(xs, ys, indexing="ij")
    floor = np.stack([fx.ravel(), fy.ravel(), np.zeros(fx.size)], axis=1)

    # left/right walls (y = -w/2 then +w/2, interleaved per (x, z))
    wx, wz = np.meshgrid(xs, zs, indexing="ij")
    n = wx.size
    lr = np.empty((2 * n, 3))
    lr[0::2] = np.stack([wx.ravel(), np.full(n, -width / 2.0), wz.ravel()], axis=1)
    lr[1::2] = np.stack([wx.ravel(), np.full(n, width / 2.0), wz.ravel()], axis=1)

    # front/back walls (x = +l/2 then -l/2, interleaved per (y, z))
    wy, wz2 = np.meshgrid(ys, zs, indexing="ij")
    m = wy.size
    fb = np.empty((2 * m, 3))
    fb[0::2] = np.stack([np.full(m, length / 2.0), wy.ravel(), wz2.ravel()], axis=1)
    fb[1::2] = np.stack([np.full(m, -length / 2.0), wy.ravel(), wz2.ravel()], axis=1)

    return np.concatenate([floor, lr, fb], axis=0)


def maha_true_pose() -> Pose:
    """Reference: tests/simple_optimization_test.cc:86-90."""
    return Pose.from_axis_angle(0.1, [0.0, 0.0, 1.0], [-0.2, 0.123, 0.3])


def generate_reprojection_fixture() -> Tuple[np.ndarray, np.ndarray, CameraIntrinsics, Pose]:
    """Planar 3D grid at z=3 projected into a 640x480 pinhole camera
    (reference: reproj tests/simple_optimization_test.cc:43-72,115-158).

    Returns (reference_points (N,3), matched_pixels (N,2), intrinsics,
    true_pose). Correspondences pair each reference point with the pixel of
    its warp into the query frame (true_pose^{-1})."""
    xs = _accum_range(-1.5, 1.5, 0.1)
    ys = _accum_range(-1.0, 1.0, 0.1)
    gx, gy = np.meshgrid(xs, ys, indexing="ij")
    points = np.stack([gx.ravel(), gy.ravel(), np.full(gx.size, 3.0)], axis=1)

    intrinsics = CameraIntrinsics.create(525.0, 525.0, 320.0, 240.0, 640, 480)
    true_pose = Pose.from_axis_angle(0.1, [0.0, 0.0, 1.0], [-0.1, 0.123, -0.5])

    query = true_pose.inverse().apply(points)
    inv_z = 1.0 / query[:, 2]
    pixels = np.stack(
        [
            525.0 * query[:, 0] * inv_z + 320.0,
            525.0 * query[:, 1] * inv_z + 240.0,
        ],
        axis=1,
    )
    return points, pixels, intrinsics, true_pose


def generate_pose_graph_fixture() -> Tuple[List[Pose], List[Pose], list]:
    """80-pose rectangle trajectory with odometry + 4 loop closures, the
    last loop a deliberate identity-outlier
    (reference: pose-graph tests/simple_optimization_test.cc:19-122).

    Returns (true_poses, noisy_poses, constraints) where each constraint is
    a dict {reference_index, query_index, relative_pose, is_loop}."""
    poses = [Pose.identity() for _ in range(80)]
    step = 0.2
    x = y = z = 0.0
    for i in range(20):
        poses[i].translation = np.array([x, y, z])
        x += step
        z += step
    for i in range(20, 40):
        y += step
        z += step
        poses[i].translation = np.array([x, y, z])
    for i in range(40, 60):
        x -= step
        z -= step
        poses[i].translation = np.array([x, y, z])
    for i in range(60, 80):
        y -= step
        z -= step
        poses[i].translation = np.array([x, y, z])

    # Deterministic index-parity noise (reference :59-70).
    noise = 0.08
    noisy = [poses[0].copy()]
    for i in range(1, 80):
        p = poses[i].copy()
        k = i % 3
        p.translation = p.translation.copy()
        p.translation[k] += (1 if i % 2 else -1) * noise
        noisy.append(p)

    odometry_pairs = [(i, i + 1) for i in range(79)]
    loop_pairs = [(18, 21), (38, 42), (57, 61), (77, 2)]

    constraints = []
    for i0, i1 in odometry_pairs:
        rel = poses[i0].inverse() * poses[i1]
        constraints.append(
            dict(reference_index=i0, query_index=i1, relative_pose=rel, is_loop=False)
        )
    for i0, i1 in loop_pairs:
        rel = poses[i0].inverse() * poses[i1]
        constraints.append(
            dict(reference_index=i0, query_index=i1, relative_pose=rel, is_loop=True)
        )
    constraints[-1]["relative_pose"] = Pose.identity()  # the outlier (:121-122)

    return poses, noisy, constraints
