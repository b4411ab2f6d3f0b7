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
