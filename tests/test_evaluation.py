"""Trajectory evaluation utilities (Umeyama / ATE / RPE) tests.

Anchors: exact recovery of a known similarity transform (the Umeyama
closed form is exact on noiseless correspondences), metric invariances
(ATE zero after aligning a transformed copy; RPE invariant to a global
rigid transform of the estimate), and an end-to-end check that a solved
pose graph scores dramatically better than its drifted init.
"""

import numpy as np
import pytest

from nonlinear_optimizer_for_slam_tpu.core.pose import Pose
from nonlinear_optimizer_for_slam_tpu.utils.evaluation import (
    absolute_trajectory_error,
    relative_pose_error,
    umeyama_alignment,
)


@pytest.fixture
def rng():
    return np.random.default_rng(3)


def _random_rotation(rng):
    q = rng.normal(size=4)
    q /= np.linalg.norm(q)
    w, x, y, z = q
    return np.array(
        [
            [1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y)],
            [2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x)],
            [2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y)],
        ]
    )


def test_umeyama_recovers_exact_similarity(rng):
    src = rng.normal(size=(40, 3))
    R_true = _random_rotation(rng)
    t_true = rng.normal(size=3)
    s_true = 2.37
    dst = s_true * src @ R_true.T + t_true
    R, t, s = umeyama_alignment(src, dst, with_scale=True)
    np.testing.assert_allclose(R, R_true, atol=1e-12)
    np.testing.assert_allclose(t, t_true, atol=1e-11)
    assert s == pytest.approx(s_true, rel=1e-12)
    # rigid mode: same rotation, unit scale
    dst_r = src @ R_true.T + t_true
    R2, t2, s2 = umeyama_alignment(src, dst_r, with_scale=False)
    np.testing.assert_allclose(R2, R_true, atol=1e-12)
    assert s2 == 1.0


def test_umeyama_reflection_guard(rng):
    """Near-planar point sets must still produce a proper rotation
    (det +1), not a reflection — the Umeyama sign correction."""
    src = rng.normal(size=(30, 3))
    src[:, 2] *= 1e-9  # squash to a plane
    R_true = _random_rotation(rng)
    dst = src @ R_true.T
    R, t, s = umeyama_alignment(src, dst)
    assert np.linalg.det(R) == pytest.approx(1.0, abs=1e-9)
    np.testing.assert_allclose(src @ R.T + t, dst, atol=1e-8)


def test_ate_zero_after_alignment_and_scale(rng):
    gt = np.cumsum(rng.normal(size=(50, 3)), axis=0)
    R = _random_rotation(rng)
    est = 0.5 * gt @ R.T + np.array([4.0, -2.0, 1.0])
    out = absolute_trajectory_error(est, gt, align=True, with_scale=True)
    assert out["rmse"] < 1e-10
    assert out["scale"] == pytest.approx(2.0, rel=1e-10)
    # without alignment the same estimate scores badly
    raw = absolute_trajectory_error(est, gt, align=False)
    assert raw["rmse"] > 1.0


def test_rpe_invariant_to_global_transform(rng):
    """RPE compares RELATIVE motions — a globally transformed estimate
    of the same trajectory has zero RPE; per-step noise shows up at its
    own magnitude."""
    n = 30
    poses = []
    p = np.zeros(3)
    for k in range(n):
        Rk = _random_rotation(rng)
        p = p + rng.normal(size=3)
        poses.append(Pose(Rk, p.copy()))
    g = Pose(_random_rotation(rng), np.array([5.0, 6.0, -7.0]))
    est = [g * pk for pk in poses]
    out = relative_pose_error(est, poses, delta=1)
    assert out["translation"]["rmse"] < 1e-10
    assert out["rotation"]["rmse"] < 1e-6  # arccos near 0 amplifies eps to sqrt(eps)

    # inject per-step noise: RPE sees it, at roughly the injected scale
    est_noisy = [
        Pose(pk.rotation, pk.translation + rng.normal(0, 0.05, 3)) for pk in est
    ]
    noisy = relative_pose_error(est_noisy, poses, delta=1)
    assert 0.02 < noisy["translation"]["rmse"] < 0.3


def test_input_formats_and_validation(rng):
    xyt = np.stack([np.array([k * 1.0, 0.1 * k, 0.05 * k]) for k in range(10)])
    out = relative_pose_error(xyt, xyt, delta=2)
    assert out["translation"]["rmse"] < 1e-12
    tq = np.zeros((10, 7))
    tq[:, 0] = np.arange(10)
    tq[:, 3] = 1.0  # identity quaternions
    out = relative_pose_error(tq, tq)
    assert out["rotation"]["max"] < 1e-12
    with pytest.raises(ValueError):
        relative_pose_error(tq, tq[:5])
    with pytest.raises(ValueError):
        relative_pose_error(tq, tq, delta=10)
    with pytest.raises(ValueError):
        umeyama_alignment(np.zeros((2, 3)), np.zeros((2, 3)))
    with pytest.raises(ValueError):
        absolute_trajectory_error(np.zeros((4, 3)), np.zeros((5, 3)))


def test_solved_graph_scores_better_than_drift():
    """End to end: the Manhattan fixture solved through the g2o path
    collapses its dead-reckoned ATE to the posterior floor."""
    import jax.numpy as jnp

    from nonlinear_optimizer_for_slam_tpu.core import Options
    from nonlinear_optimizer_for_slam_tpu.io import g2o as g2o_io
    from nonlinear_optimizer_for_slam_tpu.utils import testing
    import tempfile, os

    g, gt = testing.generate_manhattan_g2o(n_poses=300, seed=9)
    gt3 = np.concatenate([gt[:, :2], np.zeros((len(gt), 1))], axis=1)
    init3 = np.stack(
        [np.array([g.vertices[k][0], g.vertices[k][1], 0.0]) for k in range(len(gt))]
    )
    with tempfile.NamedTemporaryFile(suffix=".g2o", delete=False) as tf:
        path = tf.name
    g2o_io.write_g2o(path, g)
    opt = g2o_io.load_pose_graph(path, dtype=jnp.float64, solver="banded")
    opt.solve(Options().replace(max_iterations=60))
    os.unlink(path)
    est3 = np.stack(
        [
            np.concatenate([np.asarray(opt.get_pose(k))[:2], [0.0]])
            for k in range(len(gt))
        ]
    )
    ate_init = absolute_trajectory_error(init3, gt3)
    ate_solved = absolute_trajectory_error(est3, gt3)
    # 300 poses on the dense arena: modest drift (0.45 m rmse) collapses
    # to the posterior floor (~0.04 m)
    assert ate_solved["rmse"] < 0.2 * ate_init["rmse"], (ate_solved, ate_init)


def test_ate_planar_excludes_heading(rng):
    """planar=True zeroes the xyt heading column so 2D trajectories are
    scored on position only (ADVICE r3: heading otherwise inflates ATE
    as a fake z-coordinate)."""
    xy = np.cumsum(rng.normal(size=(40, 2)), axis=0)
    theta = rng.uniform(-np.pi, np.pi, size=(40, 1))
    est = np.concatenate([xy, theta], axis=1)  # exact positions, noisy heading
    gt = np.concatenate([xy, np.zeros((40, 1))], axis=1)
    out = absolute_trajectory_error(est, gt, align=False, planar=True)
    assert out["rmse"] < 1e-12
    # without planar the heading column is (documented) raw z
    raw = absolute_trajectory_error(est, gt, align=False)
    assert raw["rmse"] > 0.1
