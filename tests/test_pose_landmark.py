"""Pose-landmark SLAM solver tests.

New capability family (the reference has no landmark SLAM at all; its
pose graph is pose-only and its BA is projection-specific). Anchors:
closed-form observation Jacobians vs jacfwd, final cost vs a scipy
least_squares oracle on the identical residual stack (validates the
Schur elimination end to end), and physical recovery checks."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

import nonlinear_optimizer_for_slam_tpu as nls
from nonlinear_optimizer_for_slam_tpu.core import DCSLoss, Options
from nonlinear_optimizer_for_slam_tpu.core.pose import Pose
from nonlinear_optimizer_for_slam_tpu.solvers.pose_graph import ConstraintType
from nonlinear_optimizer_for_slam_tpu.solvers.pose_landmark import (
    LandmarkObservations,
    PoseLandmarkOptimizer,
    observation_residuals_and_jacobians,
)


def _rotz(th):
    c, s = np.cos(th), np.sin(th)
    return np.array([[c, -s, 0.0], [s, c, 0.0], [0.0, 0.0, 1.0]])


@pytest.fixture
def rng():
    return np.random.default_rng(17)


def _world(rng, P=8, M=25, radius=5.0):
    """Poses on a circle looking inward; landmarks in the interior."""
    gt_poses = [
        Pose(_rotz(th), np.array([radius * np.cos(th), radius * np.sin(th), 0.0]))
        for th in np.linspace(0, 2 * np.pi, P, endpoint=False)
    ]
    gt_lms = rng.uniform(-2.0, 2.0, size=(M, 3))
    obs = []  # (pose, lm, body-frame measurement)
    for i, pose in enumerate(gt_poses):
        for j in range(M):
            z = pose.rotation.T @ (gt_lms[j] - pose.translation)
            obs.append((i, j, z))
    return gt_poses, gt_lms, obs


def test_observation_jacobians_match_jacfwd(rng):
    P, M, O = 4, 6, 12
    pos = rng.normal(size=(P, 3))
    quat = rng.normal(size=(P, 4))
    lms = rng.normal(size=(M, 3))
    S = np.stack([np.triu(rng.normal(size=(3, 3))) + 3 * np.eye(3) for _ in range(O)])
    obs = LandmarkObservations(
        jnp.asarray(rng.integers(0, P, O), jnp.int32),
        jnp.asarray(rng.integers(0, M, O), jnp.int32),
        jnp.asarray(rng.normal(size=(O, 3))),
        jnp.asarray((rng.uniform(size=O) > 0.2).astype(float)),
        sqrt_info=jnp.asarray(S),
    )
    r, J_pose, J_lm = observation_residuals_and_jacobians(
        jnp.asarray(pos), jnp.asarray(quat), jnp.asarray(lms), obs
    )

    def res_flat(pose7, lm, z, S_, m):
        p, q = pose7[:3], pose7[3:]
        n = q / jnp.linalg.norm(q)
        from nonlinear_optimizer_for_slam_tpu.core import lie

        r_ = lie.quat_to_rotmat(lie.quat_conjugate(n)) @ (lm - p) - z
        return (S_ @ r_) * m

    for k in range(O):
        i = int(obs.pose_indices[k])
        j = int(obs.landmark_indices[k])
        pose7 = jnp.concatenate([jnp.asarray(pos[i]), jnp.asarray(quat[i])])
        args = (pose7, jnp.asarray(lms[j]), obs.measurements[k], jnp.asarray(S[k]),
                obs.mask[k])
        np.testing.assert_allclose(
            np.asarray(r[k]), np.asarray(res_flat(*args)), atol=1e-12
        )
        Jp, Jl = jax.jacfwd(res_flat, argnums=(0, 1))(*args)
        np.testing.assert_allclose(np.asarray(J_pose[k]), np.asarray(Jp), atol=1e-10)
        np.testing.assert_allclose(np.asarray(J_lm[k]), np.asarray(Jl), atol=1e-10)


def test_recovers_world_from_noisy_init(rng):
    gt_poses, gt_lms, obs = _world(rng)
    opt = PoseLandmarkOptimizer()
    for i, p in enumerate(gt_poses):
        noisy_t = p.translation + (rng.normal(0, 0.2, 3) if i else 0.0)
        opt.set_pose(i, Pose(p.rotation, noisy_t))
    opt.set_pose_constant(0)
    for j in range(len(gt_lms)):
        opt.set_landmark(j, gt_lms[j] + rng.normal(0, 0.3, 3))
    for i in range(len(gt_poses) - 1):
        opt.set_constraint(i, i + 1, gt_poses[i].inverse() * gt_poses[i + 1])
    for (i, j, z) in obs:
        opt.set_observation(i, j, z)
    summary, _ = opt.solve(Options().replace(max_iterations=100))
    assert float(summary.final_cost) < 1e-10
    for i, p in enumerate(gt_poses):
        np.testing.assert_allclose(
            opt.get_pose(i).translation, p.translation, atol=1e-5
        )
    for j in range(len(gt_lms)):
        np.testing.assert_allclose(opt.get_landmark(j), gt_lms[j], atol=1e-5)


def test_matches_scipy_oracle_with_noise(rng):
    """Noisy observations: the Schur-eliminated solve must land on the
    same optimum as scipy least_squares over the identical residual
    stack (poses ambient, landmarks free, pose 0 fixed)."""
    from scipy.optimize import least_squares

    gt_poses, gt_lms, obs = _world(rng, P=5, M=8)
    obs = obs[:: 2]  # thin it out
    noisy_obs = [(i, j, z + rng.normal(0, 0.02, 3)) for (i, j, z) in obs]

    opt = PoseLandmarkOptimizer()
    for i, p in enumerate(gt_poses):
        opt.set_pose(i, Pose(p.rotation, p.translation + (rng.normal(0, 0.1, 3) if i else 0.0)))
    opt.set_pose_constant(0)
    init_poses = [opt.get_pose(i) for i in range(5)]
    for j in range(len(gt_lms)):
        opt.set_landmark(j, gt_lms[j] + rng.normal(0, 0.1, 3))
    init_lms = [opt.get_landmark(j) for j in range(8)]
    for (i, j, z) in noisy_obs:
        opt.set_observation(i, j, z)
    summary, _ = opt.solve(Options().replace(max_iterations=200))

    # scipy on the same stack
    x0 = np.concatenate(
        [np.concatenate([p.translation, p.quaternion()]) for p in init_poses]
        + [l for l in init_lms]
    )
    free = np.ones(len(x0), bool)
    free[:7] = False

    def residual(xf):
        x = x0.copy()
        x[free] = xf
        rs = []
        for (i, j, z) in noisy_obs:
            p = x[7 * i : 7 * i + 3]
            q = x[7 * i + 3 : 7 * i + 7]
            q = q / np.linalg.norm(q)
            R = Pose.from_quat_trans(q, p).rotation
            l = x[35 + 3 * j : 38 + 3 * j]
            rs.append(R.T @ (l - p) - z)
        return np.concatenate(rs)

    res = least_squares(residual, x0[free], method="lm", xtol=1e-14, ftol=1e-14)
    scipy_cost = float(np.sum(res.fun**2))
    ours = float(summary.final_cost)
    assert ours <= scipy_cost * 1.01 + 1e-12, (ours, scipy_cost)


def test_robust_obs_loss_rejects_outlier(rng):
    gt_poses, gt_lms, obs = _world(rng, P=6, M=10)
    # DCS: zero weight past Phi — the outlier is fully excluded,
    # where Huber's linear tail would still pull ~1% pollution
    opt = PoseLandmarkOptimizer(obs_loss=DCSLoss(phi=1.0))
    for i, p in enumerate(gt_poses):
        opt.set_pose(i, Pose(p.rotation, p.translation + (rng.normal(0, 0.05, 3) if i else 0.0)))
    opt.set_pose_constant(0)
    for j in range(len(gt_lms)):
        opt.set_landmark(j, gt_lms[j] + rng.normal(0, 0.1, 3))
    for (i, j, z) in obs:
        opt.set_observation(i, j, z)
    opt.set_observation(3, 7, np.array([25.0, -31.0, 8.0]))  # gross outlier
    opt.solve(Options().replace(max_iterations=100))
    for j in range(len(gt_lms)):
        np.testing.assert_allclose(opt.get_landmark(j), gt_lms[j], atol=5e-3)


def test_constant_landmark_and_validation(rng):
    gt_poses, gt_lms, obs = _world(rng, P=4, M=5)
    opt = PoseLandmarkOptimizer()
    for i, p in enumerate(gt_poses):
        opt.set_pose(i, p)
    opt.set_pose_constant(0)
    anchor = gt_lms[0] + np.array([0.5, 0.0, 0.0])  # deliberately off
    for j in range(len(gt_lms)):
        opt.set_landmark(j, gt_lms[j] if j else anchor)
    opt.set_landmark_constant(0)
    for (i, j, z) in obs:
        opt.set_observation(i, j, z)
    opt.solve(Options().replace(max_iterations=50))
    np.testing.assert_allclose(opt.get_landmark(0), anchor, atol=1e-12)

    with pytest.raises(KeyError):
        opt.set_observation(99, 0, np.zeros(3))
    with pytest.raises(KeyError):
        opt.set_observation(0, 99, np.zeros(3))
    with pytest.raises(ValueError, match="no observations"):
        PoseLandmarkOptimizer().solve()


# ---------------------------------------------------------------------------
# SE(2) landmark SLAM
# ---------------------------------------------------------------------------


def _wrap(a):
    return np.arctan2(np.sin(a), np.cos(a))


def _world_2d(rng, P=10, M=15, radius=4.0):
    th = np.linspace(0, 2 * np.pi, P, endpoint=False)
    gt_poses = np.stack(
        [radius * np.cos(th), radius * np.sin(th), _wrap(th + np.pi / 2)], axis=1
    )
    gt_lms = rng.uniform(-2.0, 2.0, size=(M, 2))
    obs = []
    for i in range(P):
        c, s = np.cos(gt_poses[i, 2]), np.sin(gt_poses[i, 2])
        Rt = np.array([[c, s], [-s, c]])
        for j in range(M):
            obs.append((i, j, Rt @ (gt_lms[j] - gt_poses[i, :2])))
    return gt_poses, gt_lms, obs


def test_2d_observation_jacobians_match_jacfwd(rng):
    from nonlinear_optimizer_for_slam_tpu.solvers.pose_landmark import (
        LandmarkObservations2D,
        observation_residuals_and_jacobians_2d,
    )

    P, M, O = 4, 6, 10
    xyt = rng.normal(size=(P, 3))
    lms = rng.normal(size=(M, 2))
    S = np.stack([np.triu(rng.normal(size=(2, 2))) + 2 * np.eye(2) for _ in range(O)])
    obs = LandmarkObservations2D(
        jnp.asarray(rng.integers(0, P, O), jnp.int32),
        jnp.asarray(rng.integers(0, M, O), jnp.int32),
        jnp.asarray(rng.normal(size=(O, 2))),
        jnp.ones(O),
        sqrt_info=jnp.asarray(S),
    )
    r, J_pose, J_lm = observation_residuals_and_jacobians_2d(
        jnp.asarray(xyt), jnp.asarray(lms), obs
    )

    def res(pose3, lm, z, S_):
        c, s = jnp.cos(pose3[2]), jnp.sin(pose3[2])
        Rt = jnp.array([[c, s], [-s, c]])
        return S_ @ (Rt @ (lm - pose3[:2]) - z)

    for k in range(O):
        i, j = int(obs.pose_indices[k]), int(obs.landmark_indices[k])
        args = (jnp.asarray(xyt[i]), jnp.asarray(lms[j]), obs.measurements[k],
                jnp.asarray(S[k]))
        np.testing.assert_allclose(np.asarray(r[k]), np.asarray(res(*args)), atol=1e-12)
        Jp, Jl = jax.jacfwd(res, argnums=(0, 1))(*args)
        np.testing.assert_allclose(np.asarray(J_pose[k]), np.asarray(Jp), atol=1e-10)
        np.testing.assert_allclose(np.asarray(J_lm[k]), np.asarray(Jl), atol=1e-10)


def test_2d_recovers_world(rng):
    from nonlinear_optimizer_for_slam_tpu.solvers.pose_landmark import (
        PoseLandmark2DOptimizer,
    )

    gt_poses, gt_lms, obs = _world_2d(rng)
    opt = PoseLandmark2DOptimizer()
    for i in range(len(gt_poses)):
        noisy = gt_poses[i] + (
            np.concatenate([rng.normal(0, 0.1, 2), [rng.normal(0, 0.05)]])
            if i else 0.0
        )
        opt.set_pose(i, noisy)
    opt.set_pose_constant(0)
    for j in range(len(gt_lms)):
        opt.set_landmark(j, gt_lms[j] + rng.normal(0, 0.2, 2))
    for i in range(len(gt_poses) - 1):
        a, b = gt_poses[i], gt_poses[i + 1]
        c, s = np.cos(a[2]), np.sin(a[2])
        dp = b[:2] - a[:2]
        opt.set_constraint(
            i, i + 1,
            [c * dp[0] + s * dp[1], -s * dp[0] + c * dp[1], _wrap(b[2] - a[2])],
        )
    for (i, j, z) in obs:
        opt.set_observation(i, j, z, sqrt_info=5.0)
    summary, _ = opt.solve(Options().replace(max_iterations=100))
    assert float(summary.final_cost) < 1e-10
    for j in range(len(gt_lms)):
        np.testing.assert_allclose(opt.get_landmark(j), gt_lms[j], atol=1e-5)
    for i in range(len(gt_poses)):
        np.testing.assert_allclose(opt.get_pose(i)[:2], gt_poses[i, :2], atol=1e-5)


def test_2d_landmark_g2o_file(tmp_path, rng):
    """VERTEX_XY / EDGE_SE2_XY files load into PoseLandmark2DOptimizer
    and solve; writer round-trips the records."""
    from nonlinear_optimizer_for_slam_tpu.io import g2o as g2o_io
    from nonlinear_optimizer_for_slam_tpu.solvers.pose_landmark import (
        PoseLandmark2DOptimizer,
    )

    gt_poses, gt_lms, obs = _world_2d(rng, P=6, M=8)
    g = g2o_io.G2oGraph(dim=2)
    for i in range(6):
        g.vertices[i] = gt_poses[i] + (
            np.concatenate([rng.normal(0, 0.1, 2), [0.02]]) if i else 0.0
        )
    for j in range(8):
        g.landmarks[500 + j] = gt_lms[j] + rng.normal(0, 0.2, 2)
    info3 = np.diag([100.0, 100.0, 400.0])
    for i in range(5):
        a, b = gt_poses[i], gt_poses[i + 1]
        c, s = np.cos(a[2]), np.sin(a[2])
        dp = b[:2] - a[:2]
        g.edges.append(g2o_io.G2oEdge(
            i, i + 1,
            np.array([c * dp[0] + s * dp[1], -s * dp[0] + c * dp[1],
                      _wrap(b[2] - a[2])]),
            info3,
        ))
    info2 = np.array([[30.0, 5.0], [5.0, 40.0]])
    for (i, j, z) in obs:
        g.landmark_edges.append(g2o_io.G2oEdge(i, 500 + j, z, info2))

    path = str(tmp_path / "lm2d.g2o")
    g2o_io.write_g2o(path, g)
    g2 = g2o_io.read_g2o(path)
    assert len(g2.landmarks) == 8 and len(g2.landmark_edges) == len(obs)
    np.testing.assert_allclose(g2.landmark_edges[0].information, info2, rtol=1e-6)

    opt = g2o_io.load_pose_graph(path)
    assert isinstance(opt, PoseLandmark2DOptimizer)
    summary, _ = opt.solve(Options().replace(max_iterations=100))
    for j in range(8):
        np.testing.assert_allclose(opt.get_landmark(500 + j), gt_lms[j], atol=1e-4)

    out = str(tmp_path / "lm2d_solved.g2o")
    g2o_io.save_pose_graph(out, opt, graph=g2)
    g3 = g2o_io.read_g2o(out)
    np.testing.assert_allclose(g3.landmarks[500], opt.get_landmark(500), atol=1e-6)


def test_np_observation_twin_matches_jnp(rng):
    from nonlinear_optimizer_for_slam_tpu.solvers.pose_landmark import (
        LandmarkObservations,
        np_observation_jacobians,
        observation_residuals_and_jacobians,
    )

    P, M, O = 5, 7, 14
    pos = rng.normal(size=(P, 3))
    quat = rng.normal(size=(P, 4))
    quat /= np.linalg.norm(quat, axis=1, keepdims=True)  # twin expects unit
    lms = rng.normal(size=(M, 3))
    pi = rng.integers(0, P, O)
    li = rng.integers(0, M, O)
    meas = rng.normal(size=(O, 3))
    S = np.stack([np.triu(rng.normal(size=(3, 3))) + 3 * np.eye(3) for _ in range(O)])

    obs = LandmarkObservations(
        jnp.asarray(pi, jnp.int32), jnp.asarray(li, jnp.int32),
        jnp.asarray(meas), jnp.ones(O), sqrt_info=jnp.asarray(S),
    )
    r_j, Jp_j, Jl_j = observation_residuals_and_jacobians(
        jnp.asarray(pos), jnp.asarray(quat), jnp.asarray(lms), obs
    )
    r_n, Jp_n, Jl_n = np_observation_jacobians(pos, quat, lms, pi, li, meas, S)
    np.testing.assert_allclose(r_n, np.asarray(r_j), atol=1e-12)
    np.testing.assert_allclose(Jp_n, np.asarray(Jp_j), atol=1e-12)
    np.testing.assert_allclose(Jl_n, np.asarray(Jl_j), atol=1e-12)


def test_joint_covariance_analytic_oracle(rng):
    """Two-pose one-landmark chain with known information:
    - pose 1 hangs off the constant pose 0 by one whitened odometry edge
      -> its translation covariance is I/w^2;
    - the landmark is observed ONLY from pose 0 (constant) with weight u
      -> its covariance is exactly I/u^2 (rotated: R Sigma R^T = Sigma
      for isotropic);
    - a landmark observed only from the UNCERTAIN pose 1 inherits that
      pose's uncertainty on top of the measurement noise (and a
      single-pose landmark feeds no information back into the pose)."""
    from nonlinear_optimizer_for_slam_tpu.solvers.pose_landmark import (
        PoseLandmarkOptimizer,
    )

    w_t, w_r, u = 5.0, 20.0, 8.0
    opt = PoseLandmarkOptimizer()
    p0 = Pose.identity()
    p1 = Pose(np.eye(3), np.array([1.0, 0.0, 0.0]))
    opt.set_pose(0, p0)
    opt.set_pose(1, p1)
    opt.set_pose_constant(0)
    opt.set_constraint(0, 1, p0.inverse() * p1, sqrt_info=(w_t, w_r))
    opt.set_landmark(0, np.array([0.3, 0.4, 0.1]))
    opt.set_observation(0, 0, p0.rotation.T @ (opt.get_landmark(0) - p0.translation),
                        sqrt_info=u)
    # second landmark seen ONLY from the uncertain pose 1 (single-view
    # landmarks contribute no information back to their pose)
    opt.set_landmark(1, np.array([1.5, -0.2, 0.3]))
    opt.set_observation(
        1, 1, p1.rotation.T @ (opt.get_landmark(1) - p1.translation),
        sqrt_info=u,
    )
    opt.solve(Options().replace(max_iterations=30))

    cov_p = opt.covariance()
    np.testing.assert_allclose(cov_p[0], 0.0, atol=1e-12)  # constant pose
    np.testing.assert_allclose(
        cov_p[1][:3, :3], np.eye(3) / w_t**2, rtol=1e-6, atol=1e-10
    )
    cov_l = opt.landmark_covariance()
    np.testing.assert_allclose(cov_l[0], np.eye(3) / u**2, rtol=1e-6)
    # landmark 1 inherits pose 1's uncertainty on top of the measurement:
    # Sigma = I/u^2 + Sigma_p1_t + [v]x Sigma_p1_rot [v]x^T
    v = opt.get_landmark(1) - p1.translation
    sk = np.array([[0, -v[2], v[1]], [v[2], 0, -v[0]], [-v[1], v[0], 0]])
    expected = (
        np.eye(3) / u**2 + np.eye(3) / w_t**2 + sk @ (np.eye(3) / w_r**2) @ sk.T
    )
    np.testing.assert_allclose(cov_l[1], expected, rtol=1e-5, atol=1e-8)

    with pytest.raises(ValueError, match="gauge-free"):
        free = PoseLandmarkOptimizer()
        free.set_pose(0, p0)
        free.set_landmark(0, np.zeros(3))
        free.set_observation(0, 0, np.zeros(3))
        free.covariance()


def test_2d_joint_covariance_analytic_oracle(rng):
    """SE(2) mirror of the 3-D covariance oracle: I/w^2 pose block,
    I/u^2 anchored-view landmark, lever-arm inheritance for a
    single-view landmark off the uncertain pose."""
    from nonlinear_optimizer_for_slam_tpu.solvers.pose_landmark import (
        PoseLandmark2DOptimizer,
    )

    w_t, w_r, u = 4.0, 10.0, 6.0
    opt = PoseLandmark2DOptimizer()
    opt.set_pose(0, [0.0, 0.0, 0.0])
    opt.set_pose(1, [1.0, 0.0, 0.0])
    opt.set_pose_constant(0)
    opt.set_constraint(0, 1, [1.0, 0.0, 0.0], sqrt_info=(w_t, w_r))
    opt.set_landmark(0, [0.3, 0.4])
    opt.set_observation(0, 0, [0.3, 0.4], sqrt_info=u)
    opt.set_landmark(1, [1.5, -0.2])
    opt.set_observation(1, 1, [0.5, -0.2], sqrt_info=u)  # only from pose 1
    opt.solve(Options().replace(max_iterations=30))

    cov_p = opt.covariance()
    np.testing.assert_allclose(cov_p[0], 0.0, atol=1e-12)
    np.testing.assert_allclose(
        cov_p[1][:2, :2], np.eye(2) / w_t**2, rtol=1e-6, atol=1e-12
    )
    np.testing.assert_allclose(cov_p[1][2, 2], 1 / w_r**2, rtol=1e-6)
    cov_l = opt.landmark_covariance()
    np.testing.assert_allclose(
        cov_l[0], np.eye(2) / u**2, rtol=1e-6, atol=1e-12
    )
    # lever arm: dl = dp + J v dtheta with J = d(R(th) z)/dth = [-vy; vx]
    v = opt.get_landmark(1) - np.array([1.0, 0.0])
    lever = np.array([-v[1], v[0]])
    expected = (
        np.eye(2) / u**2 + np.eye(2) / w_t**2
        + np.outer(lever, lever) / w_r**2
    )
    np.testing.assert_allclose(cov_l[1], expected, rtol=1e-5, atol=1e-8)


def test_covariance_honors_rejected_loop_switch(rng):
    """A false loop closure that solve() switches off must contribute
    ~no information to covariance(): the marginals must match the same
    graph built WITHOUT the loop edge (round-2 review fix — previously
    loops were linearized at s = 1)."""
    gt_poses, gt_lms, obs = _world(rng, P=7, M=8)

    def build(with_false_loop):
        o = PoseLandmarkOptimizer(switch_penalty=0.03)
        for i, p in enumerate(gt_poses):
            o.set_pose(i, Pose(p.rotation, p.translation + (rng_l.normal(0, 0.03, 3) if i else 0.0)))
        o.set_pose_constant(0)
        for j in range(len(gt_lms)):
            o.set_landmark(j, gt_lms[j] + rng_l.normal(0, 0.05, 3))
        for i in range(len(gt_poses) - 1):
            o.set_constraint(i, i + 1, gt_poses[i].inverse() * gt_poses[i + 1],
                             sqrt_info=10.0)
        if with_false_loop:
            o.set_constraint(1, 5, Pose.identity(), ConstraintType.LOOP,
                             sqrt_info=10.0)
        for (i, j, z) in obs[:: 3]:
            o.set_observation(i, j, z, sqrt_info=3.0)
        return o

    rng_l = np.random.default_rng(3)
    with_loop = build(True)
    s, sw = with_loop.solve(Options().replace(max_iterations=100))
    assert sw[0] < 0.1, sw  # the false loop switched off
    rng_l = np.random.default_rng(3)
    without = build(False)
    without.solve(Options().replace(max_iterations=100))

    c_with = with_loop.covariance()
    c_without = without.covariance()
    for i in (3, 5, 6):
        np.testing.assert_allclose(c_with[i], c_without[i], rtol=0.05, atol=1e-8)
    # caching: second query must return the identical object
    assert with_loop.covariance()[3] is not None
    l1 = with_loop.landmark_covariance()
    l2 = with_loop.landmark_covariance()
    np.testing.assert_array_equal(l1[0], l2[0])


def test_sparse_pose_solver_matches_dense():
    """pose_solver='sparse' (landmarks eliminated at observation level,
    reduced pose system solved by the multifrontal factorization over
    pose-edge + co-visibility sparsity) is an EXACT drop-in for the
    dense path: same trajectory, same landmarks, same iteration count
    (round 4 — the dense (7P+L)(3M) coupling tensor never exists)."""
    rng = np.random.default_rng(0)
    P, M = 40, 90
    gt_pos = np.cumsum(0.3 * rng.normal(size=(P, 3)), axis=0)
    lms = gt_pos[rng.integers(0, P, M)] + rng.uniform(-2, 2, (M, 3))

    def build(**kw):
        opt = PoseLandmarkOptimizer(switch_penalty=0.03, **kw)
        for i in range(P):
            noisy = gt_pos[i] + (0.05 * rng.normal(size=3) if i else 0)
            opt.set_pose(i, Pose(np.eye(3), noisy))
        opt.set_pose_constant(0)
        for j in range(M):
            opt.set_landmark(j, lms[j] + 0.1 * rng.normal(size=3))
        for i in range(P - 1):
            opt.set_constraint(
                i, i + 1, Pose(np.eye(3), gt_pos[i + 1] - gt_pos[i])
            )
        opt.set_constraint(
            0, P - 1, Pose(np.eye(3), gt_pos[P - 1] - gt_pos[0]),
            ConstraintType.LOOP,
        )
        for j in range(M):
            for i in range(P):
                if (
                    np.linalg.norm(lms[j] - gt_pos[i]) < 3.0
                    and rng.uniform() < 0.5
                ):
                    opt.set_observation(
                        i, j, lms[j] - gt_pos[i] + 0.01 * rng.normal(size=3),
                        sqrt_info=10.0,
                    )
        return opt

    st = rng.bit_generator.state
    dense = build()
    rng.bit_generator.state = st
    sparse = build(pose_solver="sparse")
    opts = Options().replace(max_iterations=40)
    sum_d, sw_d = dense.solve(opts)
    sum_s, sw_s = sparse.solve(opts)
    assert int(sum_s.iterations) == int(sum_d.iterations)
    np.testing.assert_allclose(
        float(sum_s.final_cost), float(sum_d.final_cost), rtol=1e-12
    )
    for i in range(P):
        np.testing.assert_allclose(
            sparse.get_pose(i).translation, dense.get_pose(i).translation,
            atol=1e-10,
        )
    for j in range(0, M, 7):
        np.testing.assert_allclose(
            sparse.get_landmark(j), dense.get_landmark(j), atol=1e-10
        )
    np.testing.assert_allclose(np.asarray(sw_s), np.asarray(sw_d), atol=1e-10)


def test_sparse_pose_solver_rejects_unknown():
    with pytest.raises(ValueError, match="pose_solver"):
        PoseLandmarkOptimizer(pose_solver="banded")


def test_sparse_pose_solver_2d_matches_dense():
    """SE(2) sparse reduced pose solve == dense (exact drop-in, same
    trajectory/landmarks/iterations)."""
    from nonlinear_optimizer_for_slam_tpu.solvers.pose_landmark import (
        PoseLandmark2DOptimizer,
    )

    rng = np.random.default_rng(2)
    P, M = 50, 120
    th = np.cumsum(rng.normal(0.05, 0.05, P))
    xy = np.cumsum(0.5 * np.stack([np.cos(th), np.sin(th)], 1), axis=0)
    gt = np.concatenate([xy, th[:, None]], 1)
    lms = xy[rng.integers(0, P, M)] + rng.uniform(-2, 2, (M, 2))

    def wrap(a):
        return (a + np.pi) % (2 * np.pi) - np.pi

    def rel(i, j):
        c, s = np.cos(gt[i, 2]), np.sin(gt[i, 2])
        d = gt[j, :2] - gt[i, :2]
        return np.array(
            [c * d[0] + s * d[1], -s * d[0] + c * d[1], wrap(gt[j, 2] - gt[i, 2])]
        )

    def body_obs(i, j):
        c, s = np.cos(gt[i, 2]), np.sin(gt[i, 2])
        d = lms[j] - gt[i, :2]
        return np.array([c * d[0] + s * d[1], -s * d[0] + c * d[1]])

    def build(**kw):
        opt = PoseLandmark2DOptimizer(switch_penalty=0.03, **kw)
        for i in range(P):
            opt.set_pose(i, gt[i] + (0.03 * rng.normal(size=3) if i else 0))
        opt.set_pose_constant(0)
        for j in range(M):
            opt.set_landmark(j, lms[j] + 0.1 * rng.normal(size=2))
        for i in range(P - 1):
            opt.set_constraint(i, i + 1, rel(i, i + 1))
        opt.set_constraint(0, P - 1, rel(0, P - 1), ConstraintType.LOOP)
        for j in range(M):
            for i in range(P):
                if (
                    np.linalg.norm(lms[j] - gt[i, :2]) < 3.0
                    and rng.uniform() < 0.5
                ):
                    opt.set_observation(
                        i, j, body_obs(i, j) + 0.01 * rng.normal(size=2),
                        sqrt_info=10.0,
                    )
        return opt

    st = rng.bit_generator.state
    dense = build()
    rng.bit_generator.state = st
    sparse = build(pose_solver="sparse")
    opts = Options().replace(max_iterations=40)
    sum_d, _ = dense.solve(opts)
    sum_s, _ = sparse.solve(opts)
    assert int(sum_s.iterations) == int(sum_d.iterations)
    np.testing.assert_allclose(
        float(sum_s.final_cost), float(sum_d.final_cost), rtol=1e-12
    )
    for i in range(P):
        np.testing.assert_allclose(
            np.asarray(sparse.get_pose(i)), np.asarray(dense.get_pose(i)),
            atol=1e-10,
        )
    for j in range(0, M, 7):
        np.testing.assert_allclose(
            sparse.get_landmark(j), dense.get_landmark(j), atol=1e-10
        )


def test_sparse_marginals_match_dense_joint_inverse():
    """Round-5: covariance()/landmark_covariance(method='sparse') —
    landmark Schur elimination + multifrontal Takahashi selected
    inverse over pose-edge + co-visibility sparsity, with per-landmark
    back-propagation Sigma_l = D^-1 + D^-1 W^T Sigma_p W D^-1 — must
    reproduce the dense joint inverse to f64 roundoff, including a
    constant (gauge) landmark and a landmark observed from one pose."""
    rng = np.random.default_rng(4)
    P, M = 30, 70
    gt_pos = np.cumsum(0.3 * rng.normal(size=(P, 3)), axis=0)
    lms = gt_pos[rng.integers(0, P, M)] + rng.uniform(-2, 2, (M, 3))
    opt = PoseLandmarkOptimizer(switch_penalty=0.03)
    for i in range(P):
        opt.set_pose(
            i, Pose(_rotz(0.02 * i), gt_pos[i] + (0.05 * rng.normal(size=3) if i else 0))
        )
    opt.set_pose_constant(0)
    for j in range(M):
        opt.set_landmark(j, lms[j] + 0.1 * rng.normal(size=3))
    opt.set_landmark_constant(3)
    for i in range(P - 1):
        opt.set_constraint(i, i + 1, Pose(np.eye(3), gt_pos[i + 1] - gt_pos[i]))
    opt.set_constraint(
        0, P - 1, Pose(np.eye(3), gt_pos[P - 1] - gt_pos[0]), ConstraintType.LOOP
    )
    seen = np.zeros(M, bool)
    for j in range(M):
        for i in range(P):
            close = np.linalg.norm(lms[j] - gt_pos[i]) < 3.0
            if (close and rng.uniform() < 0.5) or (not seen[j] and i == P - 1):
                opt.set_observation(
                    i, j, lms[j] - gt_pos[i] + 0.01 * rng.normal(size=3),
                    sqrt_info=10.0,
                )
                seen[j] = True
    opt.solve(Options().replace(max_iterations=30))

    cov_d = opt.covariance(method="dense")
    cov_s = opt.covariance(method="sparse")
    for pi in cov_d:
        np.testing.assert_allclose(cov_s[pi], cov_d[pi], atol=1e-12)
    lm_d = opt.landmark_covariance(method="dense")
    lm_s = opt.landmark_covariance(method="sparse")
    for li in lm_d:
        np.testing.assert_allclose(lm_s[li], lm_d[li], atol=1e-12)
    # gauge landmark: zero block on both paths
    assert np.all(lm_d[3] == 0) and np.all(lm_s[3] == 0)
    # auto at this size picks dense; both spellings accepted
    assert opt._pick_cov_method("auto") == "dense"
    with pytest.raises(ValueError, match="covariance method"):
        opt.covariance(method="banded")


def test_2d_sparse_marginals_match_dense_joint_inverse():
    """Round-5: the generic selected-inverse marginals engine at SE(2)
    block dims (dp=3 poses, dl=2 landmarks) must reproduce the 2D
    dense joint inverse to f64 roundoff, constant landmark included."""
    from nonlinear_optimizer_for_slam_tpu.solvers.pose_landmark import (
        PoseLandmark2DOptimizer,
    )

    rng = np.random.default_rng(9)
    P, M = 40, 60
    gt = np.cumsum(0.3 * rng.normal(size=(P, 3)), axis=0)
    gt[:, 2] = 0.05 * np.arange(P)
    lms = gt[rng.integers(0, P, M), :2] + rng.uniform(-2, 2, (M, 2))

    def wrap(a):
        return np.arctan2(np.sin(a), np.cos(a))

    opt = PoseLandmark2DOptimizer(switch_penalty=0.03)
    for i in range(P):
        xyt = gt[i].copy()
        if i:
            xyt[:2] += 0.05 * rng.normal(size=2)
            xyt[2] = wrap(xyt[2] + 0.01 * rng.normal())
        opt.set_pose(i, xyt)
    opt.set_pose_constant(0)
    for j in range(M):
        opt.set_landmark(j, lms[j] + 0.1 * rng.normal(size=2))
    opt.set_landmark_constant(2)
    for i in range(P - 1):
        c, s = np.cos(gt[i, 2]), np.sin(gt[i, 2])
        d = gt[i + 1, :2] - gt[i, :2]
        opt.set_constraint(
            i, i + 1,
            np.array([c * d[0] + s * d[1], -s * d[0] + c * d[1],
                      wrap(gt[i + 1, 2] - gt[i, 2])]),
        )
    seen = np.zeros(M, bool)
    for j in range(M):
        for i in range(P):
            close = np.linalg.norm(lms[j] - gt[i, :2]) < 3.0
            if (close and rng.uniform() < 0.5) or (not seen[j] and i == P - 1):
                c, s = np.cos(gt[i, 2]), np.sin(gt[i, 2])
                d = lms[j] - gt[i, :2]
                z = np.array([c * d[0] + s * d[1], -s * d[0] + c * d[1]])
                opt.set_observation(i, j, z + 0.01 * rng.normal(size=2),
                                    sqrt_info=10.0)
                seen[j] = True
    opt.solve(Options().replace(max_iterations=30))

    cov_d = opt.covariance(method="dense")
    cov_s = opt.covariance(method="sparse")
    for pi in cov_d:
        np.testing.assert_allclose(cov_s[pi], cov_d[pi], atol=1e-12)
    lm_d = opt.landmark_covariance(method="dense")
    lm_s = opt.landmark_covariance(method="sparse")
    for li in lm_d:
        np.testing.assert_allclose(lm_s[li], lm_d[li], atol=1e-12)
    assert np.all(lm_s[2] == 0) and np.all(lm_d[2] == 0)
