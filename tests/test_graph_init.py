"""Pose-graph initialization (spanning-tree + chordal) — no counterpart
in the reference, whose fixture starts from hand-noised ground truth."""

import numpy as np
import pytest

from nonlinear_optimizer_for_slam_tpu.core import Options
from nonlinear_optimizer_for_slam_tpu.io import g2o as g2o_io
from nonlinear_optimizer_for_slam_tpu.solvers.pose_graph import (
    ConstraintType,
    PoseGraphOptimizer,
)
from nonlinear_optimizer_for_slam_tpu.utils import testing


def _sphere_optimizer():
    import tempfile

    g, gt = testing.generate_sphere_g2o(n_rings=8, per_ring=25, radius=20.0)
    with tempfile.NamedTemporaryFile(suffix=".g2o", delete=False) as f:
        path = f.name
    g2o_io.write_g2o(path, g)
    return g2o_io.load_pose_graph(path), gt


def _max_err(opt, gt):
    return max(
        np.linalg.norm(opt.get_pose(k).translation - gt[k])
        for k in range(len(gt))
    )


def _cost(opt):
    # one zero-iteration solve evaluates the current cost
    s, _ = opt.solve(Options().replace(max_iterations=1))
    return float(np.asarray(s.final_cost))


def test_chordal_beats_dead_reckoning():
    opt, gt = _sphere_optimizer()
    dead_err = _max_err(opt, gt)
    assert dead_err > 1.0  # the fixture's init really is drifted

    opt.initialize(method="chordal")
    chord_err = _max_err(opt, gt)
    # chordal lands near the optimum before ANY LM iteration
    assert chord_err < 0.35 * dead_err, (chord_err, dead_err)

    # anchors are untouched
    np.testing.assert_allclose(
        opt.get_pose(0).translation, gt[0], atol=1e-9
    )


def test_spanning_tree_beats_dead_reckon():
    """BFS composes along SHORTEST edge paths (loop closures act as
    shortcuts), so accumulated drift at the far end is strictly less
    than dead-reckoning the full odometry chain."""
    opt, gt = _sphere_optimizer()
    dead_err = _max_err(opt, gt)
    opt.initialize(method="spanning_tree")
    tree_err = _max_err(opt, gt)
    assert tree_err < dead_err, (tree_err, dead_err)
    np.testing.assert_allclose(
        opt.get_pose(0).translation, gt[0], atol=1e-9
    )


def test_chordal_init_accelerates_lm():
    """Same graph, same solver: LM from the chordal init reaches a
    better-or-equal optimum in fewer iterations than from dead-reckoning."""
    opts = Options().replace(max_iterations=100)

    opt_a, gt = _sphere_optimizer()
    s_dead, _ = opt_a.solve(opts)

    opt_b, _ = _sphere_optimizer()
    opt_b.initialize(method="chordal")
    s_chord, _ = opt_b.solve(opts)

    assert int(s_chord.iterations) < int(s_dead.iterations)
    assert float(s_chord.final_cost) <= 1.01 * float(s_dead.final_cost)
    err = _max_err(opt_b, gt)
    assert err < 0.5, err


def test_initialize_without_loops_ignores_outlier():
    """include_loops=False initializes from odometry only: a corrupted
    loop measurement cannot bend the init (chordal averaging has no
    switch variables)."""
    true_poses, noisy, constraints = testing.generate_pose_graph_fixture()
    opt = PoseGraphOptimizer(switch_penalty=0.03)
    for i, p in enumerate(noisy):
        opt.set_pose(i, p)
    opt.set_pose_constant(0)
    for c in constraints:
        opt.set_constraint(
            c["reference_index"], c["query_index"], c["relative_pose"],
            ConstraintType.LOOP if c["is_loop"] else ConstraintType.ODOMETRY,
        )
    # the fixture's last loop is a planted identity outlier
    opt.initialize(method="chordal", include_loops=True)
    err_loops = max(
        np.linalg.norm(opt.get_pose(i).translation - true_poses[i].translation)
        for i in range(80)
    )
    opt.initialize(method="chordal", include_loops=False)
    err_no_loops = max(
        np.linalg.norm(opt.get_pose(i).translation - true_poses[i].translation)
        for i in range(80)
    )
    # odometry-only init is clean (noise-level); the outlier-bent init
    # is measurably worse
    assert err_no_loops < 0.5 * err_loops, (err_no_loops, err_loops)

    # and from the clean init, the switchable solve still kills the
    # outlier (from the outlier-BENT init it can converge with the false
    # loop on — initialization and robustness interact)
    summary, switches = opt.solve(Options().replace(max_iterations=200))
    assert switches[-1] < 0.3


def test_unknown_method_raises():
    opt, _ = _sphere_optimizer()
    with pytest.raises(ValueError, match="unknown initialization"):
        opt.initialize(method="magic")


# ---------------------------------------------------------------------------
# SE(2)
# ---------------------------------------------------------------------------


def _wrap2(a):
    return np.arctan2(np.sin(a), np.cos(a))


def _rel2(a, b):
    c, s = np.cos(a[2]), np.sin(a[2])
    dp = b[:2] - a[:2]
    return np.array(
        [c * dp[0] + s * dp[1], -s * dp[0] + c * dp[1], _wrap2(b[2] - a[2])]
    )


def _circle_2d(P=120, radius=12.0, seed=4):
    """Noisy-odometry circle with ring loop closures and a dead-reckoned
    drifted init (M3500-style construction at test scale)."""
    from nonlinear_optimizer_for_slam_tpu.solvers.pose_graph import (
        PoseGraphOptimizer2D,
    )

    rng = np.random.default_rng(seed)
    gt = np.stack(
        [
            np.array(
                [radius * np.cos(2 * np.pi * k / P),
                 radius * np.sin(2 * np.pi * k / P),
                 _wrap2(2 * np.pi * k / P + np.pi / 2)]
            )
            for k in range(P)
        ]
    )
    odo = [
        _rel2(gt[k], gt[k + 1])
        + np.concatenate([rng.normal(0, 0.02, 2), rng.normal(0, 0.01, 1)])
        for k in range(P - 1)
    ]
    # dead-reckon the noisy odometry for the drifted init
    init = np.zeros((P, 3))
    init[0] = gt[0]
    for k in range(P - 1):
        c, s = np.cos(init[k, 2]), np.sin(init[k, 2])
        init[k + 1, :2] = init[k, :2] + np.array(
            [c * odo[k][0] - s * odo[k][1], s * odo[k][0] + c * odo[k][1]]
        )
        init[k + 1, 2] = _wrap2(init[k, 2] + odo[k][2])

    # a real switch penalty: with the reference's 1e-9 default the solver
    # can switch every (inlier) loop off for free and keep the drift
    opt = PoseGraphOptimizer2D(switch_penalty=1.0)
    for k in range(P):
        opt.set_pose(k, init[k])
    opt.set_pose_constant(0)
    for k in range(P - 1):
        opt.set_constraint(k, k + 1, odo[k])
    from nonlinear_optimizer_for_slam_tpu.solvers.pose_graph import (
        ConstraintType,
    )

    for k in range(0, P, P // 8):  # chords across the circle (wrapping,
        # so the tail of the trajectory is loop-constrained too)
        j = (k + P // 4) % P
        opt.set_constraint(
            k, j, _rel2(gt[k], gt[j]), ConstraintType.LOOP
        )
    return opt, gt


def _max_err_2d(opt, gt):
    return max(
        np.linalg.norm(opt.get_pose(k)[:2] - gt[k][:2])
        for k in range(len(gt))
    )


def test_chordal_2d_beats_dead_reckoning():
    opt, gt = _circle_2d()
    dead = _max_err_2d(opt, gt)
    assert dead > 0.5  # genuinely drifted

    opt.initialize(method="chordal")
    chord = _max_err_2d(opt, gt)
    assert chord < 0.5 * dead, (chord, dead)
    np.testing.assert_allclose(opt.get_pose(0), gt[0], atol=1e-12)

    # and the solve still converges to the noise floor from there
    summary, _ = opt.solve(Options().replace(max_iterations=100))
    assert _max_err_2d(opt, gt) < 0.2


def test_spanning_tree_2d_beats_dead_reckoning():
    opt, gt = _circle_2d()
    dead = _max_err_2d(opt, gt)
    opt.initialize(method="spanning_tree")
    tree = _max_err_2d(opt, gt)
    assert tree < dead, (tree, dead)
