"""Banded direct pose-graph solver (solver="banded"): RCM ordering +
superblock cyclic reduction.

The reference's analytic pose-graph path is a stub whose comments name
"Sparse Cholesky" (pose_graph_optimizer_analytic.cc:12-51); the banded
path is the TPU-native realization for loop-RICH graphs where the tridiag
solver's Woodbury correction would outgrow the original system (sphere-
class ring closures) and CG needs hundreds of matvecs per LM step.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from nonlinear_optimizer_for_slam_tpu.core import Options
from nonlinear_optimizer_for_slam_tpu.core.pose import Pose
from nonlinear_optimizer_for_slam_tpu.solvers.pose_graph import (
    ConstraintType,
    PoseGraphOptimizer,
)
from nonlinear_optimizer_for_slam_tpu.utils import testing


@pytest.fixture(scope="module")
def fixture():
    return testing.generate_pose_graph_fixture()


def _build(fixture, **kwargs):
    true_poses, noisy_poses, constraints = fixture
    opt = PoseGraphOptimizer(**kwargs)
    for i, p in enumerate(noisy_poses):
        opt.set_pose(i, p)
    opt.set_pose_constant(0)
    for c in constraints:
        opt.set_constraint(
            c["reference_index"],
            c["query_index"],
            c["relative_pose"],
            ConstraintType.LOOP if c["is_loop"] else ConstraintType.ODOMETRY,
        )
    return opt


def test_banded_matches_dense_exactly(fixture):
    """Banded computes the SAME damped-GN step as the dense path (exact
    elimination, not Krylov truncation): full-trajectory agreement to
    float reassociation, including switch variables."""
    opt_d = _build(fixture, switch_penalty=0.03)
    opt_b = _build(fixture, switch_penalty=0.03, solver="banded")
    s_d, sw_d = opt_d.solve()
    s_b, sw_b = opt_b.solve()
    np.testing.assert_allclose(
        float(s_b.final_cost), float(s_d.final_cost), rtol=1e-10
    )
    np.testing.assert_allclose(np.asarray(sw_b), np.asarray(sw_d), atol=1e-9)
    for i in range(80):
        np.testing.assert_allclose(
            opt_b.get_pose(i).translation,
            opt_d.get_pose(i).translation,
            atol=1e-9,
        )
    assert np.abs(sw_b[3]) < 0.1 and np.all(np.abs(sw_b[:3]) > 0.5)


def test_banded_with_edge_loss_matches_dense(fixture):
    from nonlinear_optimizer_for_slam_tpu.core import HuberLoss

    opt_d = _build(fixture, switch_penalty=0.03, edge_loss=HuberLoss(1.0))
    opt_b = _build(
        fixture, switch_penalty=0.03, edge_loss=HuberLoss(1.0), solver="banded"
    )
    s_d, _ = opt_d.solve()
    s_b, _ = opt_b.solve()
    np.testing.assert_allclose(
        float(s_b.final_cost), float(s_d.final_cost), rtol=1e-8
    )
    for i in range(80):
        np.testing.assert_allclose(
            opt_b.get_pose(i).translation,
            opt_d.get_pose(i).translation,
            atol=1e-7,
        )


def _ring_graph(P=240, ring=24, seed=5):
    """Loop-rich sphere-style topology: a chain plus one loop closure per
    pose to the pose one ring below (P/ring loops per ring, ~P-ring loops
    total) — exactly the density that blows up a Woodbury correction."""
    rng = np.random.default_rng(seed)
    true_pos = np.cumsum(0.3 * rng.normal(size=(P, 3)), axis=0)
    noisy = true_pos + np.where(
        np.arange(P)[:, None] > 0, 0.04 * rng.normal(size=(P, 3)), 0.0
    )
    opt_kwargs_edges = []
    for i in range(P - 1):
        opt_kwargs_edges.append(
            (i, i + 1, true_pos[i + 1] - true_pos[i], ConstraintType.ODOMETRY)
        )
    for i in range(ring, P):
        opt_kwargs_edges.append(
            (i - ring, i, true_pos[i] - true_pos[i - ring], ConstraintType.LOOP)
        )
    return true_pos, noisy, opt_kwargs_edges


def _build_ring(noisy, edges, **kwargs):
    opt = PoseGraphOptimizer(switch_penalty=0.03, **kwargs)
    for i, p in enumerate(noisy):
        opt.set_pose(i, Pose(np.eye(3), p))
    opt.set_pose_constant(0)
    for a, b, t, kind in edges:
        opt.set_constraint(a, b, Pose(np.eye(3), t), kind)
    return opt


def test_banded_ring_graph_matches_dense():
    """216 loop closures on a 240-pose graph: banded stays exact where
    the tridiag Woodbury capacitance (8 * 216 = 1728 columns) would be
    larger than the graph itself."""
    true_pos, noisy, edges = _ring_graph()
    opts = Options().replace(max_iterations=50)
    opt_d = _build_ring(noisy, edges)
    opt_b = _build_ring(noisy, edges, solver="banded")
    s_d, _ = opt_d.solve(opts)
    s_b, _ = opt_b.solve(opts)
    # both fully converge (~1e-10); reassociation noise dominates at that
    # magnitude, so the cost check carries an absolute floor
    np.testing.assert_allclose(
        float(s_b.final_cost), float(s_d.final_cost), rtol=1e-4, atol=1e-12
    )
    for i in range(0, len(noisy), 7):
        np.testing.assert_allclose(
            opt_b.get_pose(i).translation,
            opt_d.get_pose(i).translation,
            atol=1e-8,
        )
    err = max(
        np.linalg.norm(opt_b.get_pose(i).translation - true_pos[i])
        for i in range(len(noisy))
    )
    assert err < 0.05, err


def test_banded_rcm_reorders_shuffled_ids():
    """Pose ids registered in shuffled order (so the natural index order
    is NOT banded) still solve correctly: RCM recovers the chain."""
    rng = np.random.default_rng(9)
    P = 60
    true_pos = np.cumsum(0.3 * rng.normal(size=(P, 3)), axis=0)
    ids = rng.permutation(P)  # registry id of chain position k is ids[k]
    opt = PoseGraphOptimizer(switch_penalty=0.03, solver="banded")
    for k in range(P):
        noisy = true_pos[k] + (0.03 * rng.normal(size=3) if k else 0.0)
        opt.set_pose(int(ids[k]), Pose(np.eye(3), noisy))
    opt.set_pose_constant(int(ids[0]))
    for k in range(P - 1):
        opt.set_constraint(
            int(ids[k]), int(ids[k + 1]),
            Pose(np.eye(3), true_pos[k + 1] - true_pos[k]),
        )
    summary, _ = opt.solve(Options().replace(max_iterations=50))
    err = max(
        np.linalg.norm(opt.get_pose(int(ids[k])).translation - true_pos[k])
        for k in range(P)
    )
    assert err < 1e-3, err
    # the chain reordered to bandwidth 1 regardless of id shuffling
    bd = opt._flatten_banded(opt._flatten())
    assert bd["bandwidth"] == 1


def test_banded_bandwidth_guard_raises():
    """An expander (every pose also tied to several uniformly random
    others) has Theta(P) bandwidth under ANY ordering; the symbolic
    phase must refuse with actionable advice, not OOM. (40 random loops
    on a 4k chain do NOT trigger this — RCM absorbs those; measured.)"""
    rng = np.random.default_rng(3)
    P = 4000
    pos = np.cumsum(0.1 * rng.normal(size=(P, 3)), axis=0)
    opt = PoseGraphOptimizer(switch_penalty=0.03, solver="banded")
    for i in range(P):
        opt.set_pose(i, Pose(np.eye(3), pos[i]))
    opt.set_pose_constant(0)
    for i in range(P - 1):
        opt.set_constraint(i, i + 1, Pose(np.eye(3), pos[i + 1] - pos[i]))
    for i in range(P):
        b = int(rng.integers(0, P))
        if abs(b - i) < 2:
            b = (i + P // 2) % P
        a, b = min(i, b), max(i, b)
        opt.set_constraint(
            a, b, Pose(np.eye(3), pos[b] - pos[a]), ConstraintType.LOOP
        )
    with pytest.raises(ValueError, match="band-friendly"):
        opt.solve(Options().replace(max_iterations=2))
