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


def _fd_covariance_weighted(poses, edges, fixed=(0,)):
    """FD oracle with per-edge diagonal whitening: edges are
    (i, j, rel Pose, w6)."""
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
        for (i, j, rel, w6) in edges:
            out.append(w6[:3] * (ps[j] - ps[i] - Rs[i] @ rel.translation))
            out.append(w6[3:] * _rot_log(Rs[j].T @ Rs[i] @ rel.rotation))
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


def test_weighted_covariance_physical_units():
    """Whitened edges (1/sigma_t, 1/sigma_theta) -> covariance in
    physical units, matching the weighted FD oracle."""
    n = 6
    poses, rel = _chain(n)
    w6 = np.array([50.0, 50.0, 50.0, 250.0, 250.0, 250.0])  # 2 cm / 4 mrad
    opt = PoseGraphOptimizer()
    for i, p in enumerate(poses):
        opt.set_pose(i, p)
    opt.set_pose_constant(0)
    edges = []
    for k in range(1, n):
        opt.set_constraint(
            k - 1, k, rel(k - 1, k), ConstraintType.ODOMETRY,
            sqrt_info=(50.0, 250.0),
        )
        edges.append((k - 1, k, rel(k - 1, k), w6))
    cov = opt.covariance()
    oracle = _fd_covariance_weighted(poses, edges)
    for k in range(1, n):
        np.testing.assert_allclose(cov[k], oracle[k], rtol=1e-5, atol=1e-12)
    # single-step marginal: translation sigma ~= 2 cm exactly at k=1
    np.testing.assert_allclose(np.sqrt(cov[1][0, 0]), 0.02, rtol=1e-6)


def test_weighted_solve_weighted_mean_oracle():
    """Two conflicting constraints between the same pose pair with
    weights w1, w2 -> MAP translation is the weighted mean."""
    p0 = Pose(np.eye(3), np.zeros(3))
    p1 = Pose(np.eye(3), np.array([1.0, 0.0, 0.0]))
    opt = PoseGraphOptimizer()
    opt.set_pose(0, p0)
    opt.set_pose(1, p1)
    opt.set_pose_constant(0)
    ra = Pose(np.eye(3), np.array([1.0, 0.0, 0.0]))
    rb = Pose(np.eye(3), np.array([2.0, 0.0, 0.0]))
    w1, w2 = 3.0, 1.0
    opt.set_constraint(0, 1, ra, ConstraintType.ODOMETRY, sqrt_info=w1)
    opt.set_constraint(0, 1, rb, ConstraintType.ODOMETRY, sqrt_info=w2)
    opt.solve()
    expect = (w1**2 * 1.0 + w2**2 * 2.0) / (w1**2 + w2**2)
    np.testing.assert_allclose(
        opt.get_pose(1).translation, [expect, 0.0, 0.0], atol=1e-6
    )


def test_weighted_solvers_agree():
    """dense / cg / tridiag paths optimize the identical weighted
    objective."""
    n = 9
    poses, rel = _chain(n)
    rng = np.random.default_rng(2)

    def build(solver):
        opt = PoseGraphOptimizer(solver=solver, switch_penalty=0.03)
        rng_l = np.random.default_rng(3)
        for i, p in enumerate(poses):
            noisy = Pose(
                p.rotation @ _rodrigues(rng_l.normal(0, 0.02, 3)),
                p.translation + rng_l.normal(0, 0.05, 3),
            )
            opt.set_pose(i, noisy if i else p)
        opt.set_pose_constant(0)
        for k in range(1, n):
            opt.set_constraint(
                k - 1, k, rel(k - 1, k), ConstraintType.ODOMETRY,
                sqrt_info=(20.0, 100.0),
            )
        opt.set_constraint(0, n - 1, rel(0, n - 1), ConstraintType.LOOP,
                           sqrt_info=(40.0, 200.0))
        opt.solve()
        return np.stack([opt.get_pose(i).translation for i in range(n)])

    t_dense = build("dense")
    t_cg = build("cg")
    t_tri = build("tridiag")
    np.testing.assert_allclose(t_cg, t_dense, atol=5e-4)
    np.testing.assert_allclose(t_tri, t_dense, atol=5e-4)


def test_smoother_weighted_matches_batch():
    n = 8
    poses, rel = _chain(n)
    sm = FixedLagSmoother(lag=12)
    sm.add_pose(0, poses[0])
    for k in range(1, n):
        sm.add_pose(k, poses[k])
        sm.add_odometry(k - 1, k, rel(k - 1, k), sqrt_info=(50.0, 250.0))
        sm.update()
    cov = sm.covariance()
    w6 = np.array([50.0] * 3 + [250.0] * 3)
    oracle = _fd_covariance_weighted(
        poses, [(k - 1, k, rel(k - 1, k), w6) for k in range(1, n)]
    )
    for k in range(1, n):
        np.testing.assert_allclose(cov[k], oracle[k], rtol=1e-5, atol=1e-12)


def test_weighted_closed_form_matches_autodiff():
    """Whitened closed-form edge Jacobians == jacfwd oracle."""
    import jax.numpy as jnp

    from nonlinear_optimizer_for_slam_tpu.ops.relative_pose import (
        PoseGraphEdges,
        edge_residuals_and_jacobians,
        edge_residuals_and_jacobians_ad,
    )

    rng = np.random.default_rng(9)
    P, E = 5, 7
    pos = jnp.asarray(rng.normal(size=(P, 3)))
    quat = jnp.asarray(rng.normal(size=(P, 4)) + np.array([2.0, 0, 0, 0]))
    ref = jnp.asarray(rng.integers(0, P, E), jnp.int32)
    qry = jnp.asarray((rng.integers(1, P, E) + ref) % P, jnp.int32)
    edges = PoseGraphEdges(
        reference_indices=ref,
        query_indices=qry,
        relative_translations=jnp.asarray(rng.normal(size=(E, 3))),
        relative_quaternions=jnp.asarray(
            rng.normal(size=(E, 4)) + np.array([2.0, 0, 0, 0])
        ),
        is_loop=jnp.asarray((np.arange(E) % 2).astype(float)),
        mask=jnp.ones(E),
        sqrt_info=jnp.asarray(rng.uniform(0.5, 30.0, size=(E, 6))),
    )
    sw = jnp.asarray(rng.uniform(0.2, 1.0, E))
    out = edge_residuals_and_jacobians(pos, quat, sw, edges, 0.03)
    oracle = edge_residuals_and_jacobians_ad(pos, quat, sw, edges, 0.03)
    for a, b in zip(out, oracle):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-9)


def test_banded_selected_inverse_matches_dense():
    """The block-tridiagonal selected-inverse covariance path (round-4:
    marginals at 50k-pose scale) returns the SAME pose-diagonal blocks
    as the dense full-inverse path, including exact per-edge switch
    elimination, loop closures, and a gauge pose — agreement to f64
    roundoff on a loop-closed chain."""
    rng = np.random.default_rng(5)
    n = 40
    poses, rel = _chain(n)
    opt = PoseGraphOptimizer(switch_penalty=0.03)
    for i, p in enumerate(poses):
        opt.set_pose(i, p)
    opt.set_pose_constant(0)
    for k in range(1, n):
        opt.set_constraint(k - 1, k, rel(k - 1, k), ConstraintType.ODOMETRY)
    for (i, j) in [(0, n // 2), (5, n - 3), (n // 3, 2 * n // 3)]:
        opt.set_constraint(i, j, rel(i, j), ConstraintType.LOOP)
    opt.solve()  # linearize at the solution with learned switches
    dense = opt.covariance(method="dense")
    banded = opt.covariance(method="banded")
    for k in range(n):
        np.testing.assert_allclose(
            banded[k], dense[k], rtol=1e-9, atol=1e-8,
            err_msg=f"pose {k}",
        )


def test_banded_covariance_rejects_priors():
    n = 7
    poses, rel = _chain(n)
    opt = PoseGraphOptimizer(switch_penalty=0.03)
    for i, p in enumerate(poses):
        opt.set_pose(i, p)
    opt.set_prior(0, poses[0])
    for k in range(1, n):
        opt.set_constraint(k - 1, k, rel(k - 1, k), ConstraintType.ODOMETRY)
    with pytest.raises(ValueError, match="banded"):
        opt.covariance(method="banded")


def test_banded_selected_inverse_matches_dense_2d():
    """SE(2) analog: banded selected-inverse marginals equal the dense
    full-inverse blocks on a loop-closed 2D chain with switches."""
    from nonlinear_optimizer_for_slam_tpu.solvers.pose_graph import (
        PoseGraphOptimizer2D,
    )

    rng = np.random.default_rng(8)
    n = 50
    th = np.cumsum(rng.normal(0.05, 0.05, n))
    xy = np.cumsum(0.5 * np.stack([np.cos(th), np.sin(th)], 1), axis=0)
    gt = np.concatenate([xy, th[:, None]], 1)

    def wrap(a):
        return (a + np.pi) % (2 * np.pi) - np.pi

    def rel(i, j):
        c, s = np.cos(gt[i, 2]), np.sin(gt[i, 2])
        d = gt[j, :2] - gt[i, :2]
        return np.array(
            [c * d[0] + s * d[1], -s * d[0] + c * d[1], wrap(gt[j, 2] - gt[i, 2])]
        )

    opt = PoseGraphOptimizer2D(switch_penalty=0.03)
    for i in range(n):
        opt.set_pose(i, gt[i] + (0.02 * rng.normal(size=3) if i else 0))
    opt.set_pose_constant(0)
    for i in range(n - 1):
        opt.set_constraint(i, i + 1, rel(i, i + 1))
    for (i, j) in [(0, n // 2), (10, n - 5)]:
        opt.set_constraint(i, j, rel(i, j), ConstraintType.LOOP)
    opt.solve()
    dense = opt.covariance(method="dense")
    banded = opt.covariance(method="banded")
    sparse = opt.covariance(method="sparse")
    for k in range(n):
        np.testing.assert_allclose(
            banded[k], dense[k], rtol=1e-9, atol=1e-10, err_msg=f"pose {k}"
        )
        np.testing.assert_allclose(
            sparse[k], dense[k], rtol=1e-8, atol=1e-9,
            err_msg=f"pose {k} (sparse)",
        )
