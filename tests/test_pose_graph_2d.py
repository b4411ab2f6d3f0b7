"""SE(2) pose-graph optimizer tests (2D counterpart of the 80-pose
fixture; BASELINE config 4 asks for 2D and 3D graphs)."""

import numpy as np
import pytest

from nonlinear_optimizer_for_slam_tpu.core import Options
from nonlinear_optimizer_for_slam_tpu.solvers.pose_graph import (
    ConstraintType,
    PoseGraphOptimizer2D,
    se2_edge_residual,
)


def _wrap(a):
    return np.arctan2(np.sin(a), np.cos(a))


def _rel(a, b):
    """relative (dx, dy, dtheta) of b in a's frame."""
    c, s = np.cos(a[2]), np.sin(a[2])
    dp = b[:2] - a[:2]
    return np.array(
        [c * dp[0] + s * dp[1], -s * dp[0] + c * dp[1], _wrap(b[2] - a[2])]
    )


@pytest.fixture(scope="module")
def square_fixture():
    """40-pose square with heading, odometry + 2 loops (1 outlier)."""
    rng = np.random.default_rng(11)
    poses = []
    x = y = th = 0.0
    for side in range(4):
        for _ in range(10):
            poses.append(np.array([x, y, th]))
            x += 0.5 * np.cos(th)
            y += 0.5 * np.sin(th)
        th = _wrap(th + np.pi / 2)
    poses = np.stack(poses)

    noisy = poses.copy()
    noisy[1:, :2] += 0.05 * rng.normal(size=(39, 2))
    noisy[1:, 2] = _wrap(noisy[1:, 2] + 0.03 * rng.normal(size=39))

    constraints = [
        dict(a=i, b=i + 1, rel=_rel(poses[i], poses[i + 1]), loop=False)
        for i in range(39)
    ]
    constraints.append(dict(a=8, b=12, rel=_rel(poses[8], poses[12]), loop=True))
    constraints.append(dict(a=38, b=2, rel=np.zeros(3), loop=True))  # outlier
    return poses, noisy, constraints


def _build(fixture, **kwargs):
    poses, noisy, constraints = fixture
    opt = PoseGraphOptimizer2D(**kwargs)
    for i in range(len(noisy)):
        opt.set_pose(i, noisy[i])
    opt.set_pose_constant(0)
    for c in constraints:
        opt.set_constraint(
            c["a"], c["b"], c["rel"],
            ConstraintType.LOOP if c["loop"] else ConstraintType.ODOMETRY,
        )
    return opt


def test_se2_residual_zero_at_consistency():
    a = np.array([1.0, 2.0, 0.7])
    b = np.array([1.5, 2.6, 1.4])
    import jax.numpy as jnp

    r = np.asarray(se2_edge_residual(jnp.asarray(a), jnp.asarray(b), jnp.asarray(_rel(a, b))))
    np.testing.assert_allclose(r, 0.0, atol=1e-12)


def test_2d_solve_removes_noise(square_fixture):
    poses, noisy, _ = square_fixture
    opt = _build(square_fixture, switch_penalty=0.03)
    summary, switches = opt.solve()
    # gauge pose untouched
    np.testing.assert_allclose(opt.get_pose(0), noisy[0], atol=1e-12)
    err_before = max(np.linalg.norm(noisy[i][:2] - poses[i][:2]) for i in range(40))
    err_after = max(
        np.linalg.norm(opt.get_pose(i)[:2] - poses[i][:2]) for i in range(40)
    )
    assert err_after < 0.2 * err_before, (err_after, err_before)
    # inlier loop on, outlier off
    assert switches[0] > 0.5 and switches[1] < 0.1, switches


def test_2d_api_validation(square_fixture):
    opt = _build(square_fixture)
    with pytest.raises(ValueError):
        opt.set_constraint(1, 1, np.zeros(3))
    with pytest.raises(KeyError):
        opt.set_pose_constant(999)
