"""Generic Problem/PoseOptimizer framework tests (the reference's unbuilt
pose_optimizer module, SURVEY section 2.6)."""

import jax.numpy as jnp
import numpy as np
import pytest

import nonlinear_optimizer_for_slam_tpu as nls
from nonlinear_optimizer_for_slam_tpu.core import ExponentialLoss, HuberLoss
from nonlinear_optimizer_for_slam_tpu.solvers.problem import (
    CostFunction,
    GenericOptions,
    MahalanobisDistanceCostFunctor,
    PointToPlaneCostFunctor,
    PoseOptimizer,
    Problem,
    RotationDeltaCostFunctor,
    TranslationDeltaCostFunctor,
)


@pytest.fixture()
def true_pose():
    return nls.Pose.from_axis_angle(0.07, [0.2, -0.3, 1.0], [0.15, -0.1, 0.25])


def test_mahalanobis_block_recovers_pose(rng, true_pose):
    n = 400
    pts = rng.uniform(-2, 2, size=(n, 3))
    means = true_pose.apply(pts)
    sqrt_infos = np.tile(np.eye(3), (n, 1, 1))

    problem = Problem()
    problem.add_residual_block(
        MahalanobisDistanceCostFunctor(pts, means, sqrt_infos)
    )
    opt = PoseOptimizer()
    pose, summary = opt.solve(problem, GenericOptions(), nls.Pose.identity())
    np.testing.assert_allclose(pose.translation, true_pose.translation, atol=1e-6)
    np.testing.assert_allclose(pose.rotation, true_pose.rotation, atol=1e-6)
    assert bool(summary.converged)


def test_mixed_blocks_with_priors(rng, true_pose):
    n = 200
    pts = rng.uniform(-2, 2, size=(n, 3))
    means = true_pose.apply(pts)
    normals = rng.normal(size=(n, 3))
    normals /= np.linalg.norm(normals, axis=1, keepdims=True)

    problem = Problem()
    problem.add_residual_block(
        MahalanobisDistanceCostFunctor(pts, means, np.tile(np.eye(3), (n, 1, 1))),
        ExponentialLoss(),
    )
    problem.add_residual_block(
        PointToPlaneCostFunctor(pts, means, normals), HuberLoss(2.0)
    )
    # priors AT the true pose — consistent with the data
    problem.add_residual_block(
        TranslationDeltaCostFunctor(true_pose.translation, 10.0 * np.eye(3))
    )
    problem.add_residual_block(
        RotationDeltaCostFunctor(true_pose.rotation, 10.0 * np.eye(3))
    )
    opt = PoseOptimizer()
    pose, summary = opt.solve(problem, GenericOptions(), nls.Pose.identity())
    np.testing.assert_allclose(pose.translation, true_pose.translation, atol=1e-5)
    np.testing.assert_allclose(pose.rotation, true_pose.rotation, atol=1e-5)


def test_priors_pull_solution(rng):
    """With ONLY priors, the optimum is the prior pose."""
    target = nls.Pose.from_axis_angle(0.2, [0, 1.0, 0], [1.0, 2.0, -0.5])
    problem = Problem()
    problem.add_residual_block(TranslationDeltaCostFunctor(target.translation))
    problem.add_residual_block(RotationDeltaCostFunctor(target.rotation))
    opt = PoseOptimizer()
    pose, _ = opt.solve(problem, GenericOptions(), nls.Pose.identity())
    np.testing.assert_allclose(pose.translation, target.translation, atol=1e-6)
    np.testing.assert_allclose(pose.rotation, target.rotation, atol=1e-6)


def test_loss_actually_applied(rng, true_pose):
    """The reference's ResidualBlock has an inverted loss branch that
    silently SKIPS a configured loss (cost_function.h:96-104); verify ours
    applies it: corrupted correspondences shift the no-loss optimum but a
    robust loss holds it near the truth."""
    n = 300
    pts = rng.uniform(-2, 2, size=(n, 3))
    means = true_pose.apply(pts)
    means[: n // 10] += 5.0  # 10% gross outliers

    def solve(loss):
        problem = Problem()
        problem.add_residual_block(
            MahalanobisDistanceCostFunctor(
                pts, means, np.tile(np.eye(3), (n, 1, 1))
            ),
            loss,
        )
        pose, _ = PoseOptimizer().solve(
            problem, GenericOptions(), nls.Pose.identity()
        )
        return np.linalg.norm(pose.translation - true_pose.translation)

    err_plain = solve(None)
    err_robust = solve(HuberLoss(threshold=0.5))
    assert err_robust < 0.3 * err_plain, (err_robust, err_plain)


def test_function_tolerance_is_read(rng, true_pose):
    """The generic policy breaks on |cost - prev| < function_tolerance
    (unlike the per-module solvers, where the enum exists but is dead)."""
    n = 100
    pts = rng.uniform(-2, 2, size=(n, 3))
    means = true_pose.apply(pts) + 0.01 * rng.normal(size=(n, 3))
    problem = Problem()
    problem.add_residual_block(
        MahalanobisDistanceCostFunctor(pts, means, np.tile(np.eye(3), (n, 1, 1)))
    )
    loose = GenericOptions(
        function_tolerance=1e30, parameter_tolerance=0.0, gradient_tolerance=0.0
    )
    _, summary = PoseOptimizer().solve(problem, loose, nls.Pose.identity())
    # an absurd function tolerance fires immediately
    assert int(summary.iterations) <= 1


def test_empty_problem_raises():
    with pytest.raises(ValueError):
        PoseOptimizer().solve(Problem(), GenericOptions(), nls.Pose.identity())


def test_rank_deficient_problem_solves_constrained_part():
    """A problem constraining only the translation (zero rotation block in
    H) must still solve: conflicting priors at [1,0,0] and [3,0,0] average
    to [2,0,0] while rotation stays identity (regression: the singular
    damped system used to trip the non-finite guard and 'converge' at the
    start point)."""
    problem = Problem()
    problem.add_residual_block(TranslationDeltaCostFunctor(np.array([1.0, 0, 0])))
    problem.add_residual_block(TranslationDeltaCostFunctor(np.array([3.0, 0, 0])))
    pose, _ = PoseOptimizer().solve(problem, GenericOptions(), nls.Pose.identity())
    np.testing.assert_allclose(pose.translation, [2.0, 0, 0], atol=1e-8)
    np.testing.assert_allclose(pose.rotation, np.eye(3), atol=1e-10)


def test_hand_eye_calibration_with_custom_functor():
    """AX = XB extrinsic calibration through the generic framework: a
    USER-DEFINED CostFunction (chordal residual, autodiff Jacobians from
    the base class) recovers the hand-eye transform from a cold start —
    the extensibility the reference's unbuilt pose_optimizer promised."""
    import jax.numpy as jnp

    from nonlinear_optimizer_for_slam_tpu.core import HuberLoss
    from nonlinear_optimizer_for_slam_tpu.core.pose import Pose

    def exp_so3(w):
        th = np.linalg.norm(w)
        if th < 1e-12:
            return np.eye(3)
        k = w / th
        K = np.array([[0, -k[2], k[1]], [k[2], 0, -k[0]], [-k[1], k[0], 0]])
        return np.eye(3) + np.sin(th) * K + (1 - np.cos(th)) * K @ K

    class HandEye(CostFunction):
        def __init__(self, R_a, t_a, R_b, t_b):
            self.R_a, self.t_a = jnp.asarray(R_a), jnp.asarray(t_a)
            self.R_b, self.t_b = jnp.asarray(R_b), jnp.asarray(t_b)

        def residuals(self, R, t):
            rot = (self.R_a @ R - R @ self.R_b).reshape(len(self.t_a), 9)
            trans = (
                jnp.einsum("nij,j->ni", self.R_a, t) + self.t_a
                - jnp.einsum("ij,nj->ni", R, self.t_b) - t
            )
            return jnp.concatenate([rot, trans], axis=1)

    rng = np.random.default_rng(0)
    X = Pose(exp_so3([0.2, -0.4, 0.7]), np.array([0.12, -0.05, 0.30]))
    N = 30
    R_a = np.stack([exp_so3(rng.uniform(-1.2, 1.2, 3)) for _ in range(N)])
    t_a = rng.uniform(-0.5, 0.5, (N, 3))
    Xi = X.inverse()
    B = [Xi * Pose(R_a[k], t_a[k]) * X for k in range(N)]
    R_b = np.stack([b.rotation for b in B])
    t_b = np.stack([b.translation for b in B])

    problem = Problem()
    problem.add_residual_block(HandEye(R_a, t_a, R_b, t_b), HuberLoss(0.05))
    est, summary = PoseOptimizer().solve(
        problem, GenericOptions(max_iterations=100), Pose.identity()
    )
    np.testing.assert_allclose(est.translation, X.translation, atol=1e-8)
    np.testing.assert_allclose(est.rotation, X.rotation, atol=1e-8)
