"""Marginal covariance extraction (batch pose graph + fixed-lag smoother).

New capability — the reference never queries uncertainty (Ceres'
Covariance class is unused). Acceptance anchor is an INDEPENDENT oracle:
the information matrix is rebuilt by finite-differencing a rotation-
matrix formulation of the edge residuals (Rodrigues exponential, right-
multiplicative perturbation — no shared code with the quaternion closed
forms under test), at zero-residual fixtures where both residual
conventions have identical Jacobians.
"""

import numpy as np
import pytest

from nonlinear_optimizer_for_slam_tpu.core.pose import Pose
from nonlinear_optimizer_for_slam_tpu.solvers.fixed_lag import FixedLagSmoother
from nonlinear_optimizer_for_slam_tpu.solvers.pose_graph import (
    ConstraintType,
    PoseGraphOptimizer,
)


def _rodrigues(w):
    th = np.linalg.norm(w)
    if th < 1e-12:
        return np.eye(3)
    k = w / th
    K = np.array([[0, -k[2], k[1]], [k[2], 0, -k[0]], [-k[1], k[0], 0]])
    return np.eye(3) + np.sin(th) * K + (1 - np.cos(th)) * K @ K


def _rot_log(R):
    c = np.clip((np.trace(R) - 1.0) / 2.0, -1.0, 1.0)
    th = np.arccos(c)
    if th < 1e-9:
        return 0.5 * np.array([R[2, 1] - R[1, 2], R[0, 2] - R[2, 0], R[1, 0] - R[0, 1]])
    return th / (2.0 * np.sin(th)) * np.array(
        [R[2, 1] - R[1, 2], R[0, 2] - R[2, 0], R[1, 0] - R[0, 1]]
    )


def _fd_covariance(poses, edges, fixed=(0,)):
    """Tangent-space covariance by finite-difference GN information.

    poses: list of Pose (the linearization point; fixtures must be
    zero-residual so the FD Jacobian matches the implementation's
    residual convention exactly). edges: (i, j, rel Pose). fixed: pose
    indices held constant. Perturbation chart matches the library's:
    p + dp (global), R exp([dtheta]x) (right-multiplicative local).
    """
    n = len(poses)
    free = [k for k in range(n) if k not in fixed]
    col = {k: 6 * i for i, k in enumerate(free)}

    def residuals(x):
        ps, Rs = [], []
        for k in range(n):
            if k in col:
                dp = x[col[k] : col[k] + 3]
                dth = x[col[k] + 3 : col[k] + 6]
            else:
                dp = np.zeros(3)
                dth = np.zeros(3)
            ps.append(poses[k].translation + dp)
            Rs.append(poses[k].rotation @ _rodrigues(dth))
        out = []
        for (i, j, rel) in edges:
            out.append(ps[j] - ps[i] - Rs[i] @ rel.translation)
            out.append(_rot_log(Rs[j].T @ Rs[i] @ rel.rotation))
        return np.concatenate(out)

    dim = 6 * len(free)
    h = 1e-6
    J = np.zeros((6 * len(edges), dim))
    for c in range(dim):
        e = np.zeros(dim)
        e[c] = h
        J[:, c] = (residuals(e) - residuals(-e)) / (2 * h)
    Sigma_red = np.linalg.inv(J.T @ J)
    out = {k: np.zeros((6, 6)) for k in fixed}
    for k in free:
        c = col[k]
        out[k] = Sigma_red[c : c + 6, c : c + 6]
    return out


def _chain(n):
    """Poses at k*x_hat, small distinct rotations; EXACT constraints."""
    rng = np.random.default_rng(5)
    poses = [
        Pose(_rodrigues(rng.normal(0, 0.1, 3)), np.array([float(k), 0.3 * k, 0.0]))
        for k in range(n)
    ]

    def rel(i, j):
        Ri, ti = poses[i].rotation, poses[i].translation
        return Pose(Ri.T @ poses[j].rotation, Ri.T @ (poses[j].translation - ti))

    return poses, rel


def test_batch_chain_fd_oracle():
    n = 7
    poses, rel = _chain(n)
    opt = PoseGraphOptimizer()
    for i, p in enumerate(poses):
        opt.set_pose(i, p)
    opt.set_pose_constant(0)
    edges = [(k - 1, k, rel(k - 1, k)) for k in range(1, n)]
    for (i, j, r) in edges:
        opt.set_constraint(i, j, r, ConstraintType.ODOMETRY)
    cov = opt.covariance()
    oracle = _fd_covariance(poses, edges)
    np.testing.assert_allclose(cov[0], np.zeros((6, 6)), atol=1e-12)
    for k in range(1, n):
        np.testing.assert_allclose(
            cov[k], oracle[k], rtol=1e-5, atol=1e-6,
            err_msg=f"pose {k} covariance != FD oracle",
        )


def test_batch_loop_reduces_uncertainty():
    n = 7
    poses, rel = _chain(n)
    opt = PoseGraphOptimizer()
    for i, p in enumerate(poses):
        opt.set_pose(i, p)
    opt.set_pose_constant(0)
    for k in range(1, n):
        opt.set_constraint(k - 1, k, rel(k - 1, k), ConstraintType.ODOMETRY)
    before = opt.covariance([n - 1])[n - 1]
    opt.set_constraint(0, n - 1, rel(0, n - 1), ConstraintType.LOOP)
    opt.solve()
    after = opt.covariance([n - 1])[n - 1]
    assert np.trace(after) < 0.6 * np.trace(before)
    w = np.linalg.eigvalsh(0.5 * (after + after.T))
    assert w.min() > -1e-10


def test_batch_covariance_requires_gauge():
    poses, rel = _chain(3)
    opt = PoseGraphOptimizer()
    for i, p in enumerate(poses):
        opt.set_pose(i, p)
    for k in range(1, 3):
        opt.set_constraint(k - 1, k, rel(k - 1, k), ConstraintType.ODOMETRY)
    with pytest.raises(ValueError):
        opt.covariance()


def test_smoother_matches_batch_no_marginalization():
    n = 6
    poses, rel = _chain(n)
    sm = FixedLagSmoother(lag=10)
    sm.add_pose(0, poses[0])
    for k in range(1, n):
        sm.add_pose(k, poses[k])
        sm.add_odometry(k - 1, k, rel(k - 1, k))
        sm.update()
    cov = sm.covariance()
    oracle = _fd_covariance(poses, [(k - 1, k, rel(k - 1, k)) for k in range(1, n)])
    for k in range(1, n):
        np.testing.assert_allclose(cov[k], oracle[k], rtol=1e-5, atol=1e-6)


def test_smoother_covariance_after_marginalization():
    """Sliding the window must not change the marginals of retained
    poses (marginalization is exact at a zero-residual optimum): the
    smoother's window blocks must match the full-problem FD oracle."""
    n = 12
    lag = 5
    poses, rel = _chain(n)
    sm = FixedLagSmoother(lag=lag)
    sm.add_pose(0, poses[0])
    for k in range(1, n):
        sm.add_pose(k, poses[k])
        sm.add_odometry(k - 1, k, rel(k - 1, k))
        sm.update()
    cov = sm.covariance()
    assert sorted(cov) == sm.window
    oracle = _fd_covariance(poses, [(k - 1, k, rel(k - 1, k)) for k in range(1, n)])
    for k in sm.window:
        np.testing.assert_allclose(
            cov[k], oracle[k], rtol=1e-4, atol=1e-5,
            err_msg=f"pose {k} covariance drifted after marginalization",
        )
    with pytest.raises(KeyError):
        sm.covariance([0])  # frozen pose


def test_smoother_gauge_pose_zero_block():
    poses, rel = _chain(3)
    sm = FixedLagSmoother(lag=8)
    sm.add_pose(0, poses[0])
    sm.add_pose(1, poses[1])
    sm.add_odometry(0, 1, rel(0, 1))
    sm.update()
    cov = sm.covariance()
    np.testing.assert_allclose(cov[0], np.zeros((6, 6)), atol=1e-12)
    oracle = _fd_covariance(poses[:2], [(0, 1, rel(0, 1))])
    np.testing.assert_allclose(cov[1], oracle[1], rtol=1e-5, atol=1e-6)
