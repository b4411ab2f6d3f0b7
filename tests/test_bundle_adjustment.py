"""Schur-complement bundle adjustment tests.

Synthetic rig: cameras on an arc looking at a landmark cloud; initial
poses and landmarks perturbed; BA must recover both (gauge pinned by two
fixed cameras). Oracle check: the Schur step equals the full dense normal
equation step on a tiny problem.
"""

import jax.numpy as jnp
import numpy as np
import pytest

import nonlinear_optimizer_for_slam_tpu as nls
from nonlinear_optimizer_for_slam_tpu.core import HuberLoss, Options
from nonlinear_optimizer_for_slam_tpu.ops.reprojection import CameraIntrinsics
from nonlinear_optimizer_for_slam_tpu.solvers.bundle_adjustment import (
    BAData,
    BundleAdjuster,
)


def _make_rig(rng, num_cameras=8, num_landmarks=300, noise=0.05):
    intr = CameraIntrinsics.create(525.0, 525.0, 320.0, 240.0, 640, 480)
    landmarks = np.stack(
        [
            rng.uniform(-2, 2, num_landmarks),
            rng.uniform(-1.5, 1.5, num_landmarks),
            rng.uniform(4.0, 8.0, num_landmarks),
        ],
        axis=1,
    )
    true_poses = []
    for i in range(num_cameras):
        angle = 0.05 * (i - num_cameras / 2)
        t = np.array([0.4 * i - 1.6, 0.05 * i, 0.0])
        true_poses.append(nls.Pose.from_axis_angle(angle, [0, 1.0, 0], t))

    cam_idx, lm_idx, pixels = [], [], []
    for ci, pose in enumerate(true_poses):
        pc = pose.inverse().apply(landmarks)  # camera frame
        uv = np.stack(
            [
                525.0 * pc[:, 0] / pc[:, 2] + 320.0,
                525.0 * pc[:, 1] / pc[:, 2] + 240.0,
            ],
            axis=1,
        )
        vis = (
            (pc[:, 2] > 0.5)
            & (uv[:, 0] >= 0)
            & (uv[:, 0] < 640)
            & (uv[:, 1] >= 0)
            & (uv[:, 1] < 480)
        )
        for li in np.nonzero(vis)[0]:
            cam_idx.append(ci)
            lm_idx.append(li)
            pixels.append(uv[li])

    data = BAData(
        camera_indices=jnp.asarray(np.array(cam_idx, np.int32)),
        landmark_indices=jnp.asarray(np.array(lm_idx, np.int32)),
        pixels=jnp.asarray(np.stack(pixels)),
        mask=jnp.ones(len(cam_idx)),
    )

    # note: solver estimates world-from-camera? No: observation model is
    # r = pi(R X + t) - norm(pixel), with (R, t) mapping WORLD -> CAMERA,
    # so the solved pose is the INVERSE of the usual camera-in-world pose.
    solver_true_poses = [p.inverse() for p in true_poses]

    noisy_poses = [solver_true_poses[0].copy(), solver_true_poses[1].copy()]
    for p in solver_true_poses[2:]:
        dp = nls.Pose.from_axis_angle(
            noise * rng.normal(), rng.normal(size=3), noise * rng.normal(size=3)
        )
        noisy_poses.append(p * dp)
    noisy_landmarks = landmarks + noise * rng.normal(size=landmarks.shape)

    return intr, data, solver_true_poses, noisy_poses, landmarks, noisy_landmarks


def test_ba_recovers_rig(rng):
    intr, data, true_poses, noisy_poses, true_lms, noisy_lms = _make_rig(rng)
    ba = BundleAdjuster()
    opts = Options().replace(max_iterations=60)
    poses, lms, summary = ba.solve(
        opts, data, intr, noisy_poses, noisy_lms, fixed_cameras=(0, 1)
    )
    assert float(summary.final_cost) < 1e-10, float(summary.final_cost)
    for est, true in zip(poses, true_poses):
        np.testing.assert_allclose(est.translation, true.translation, atol=1e-5)
        np.testing.assert_allclose(est.rotation, true.rotation, atol=1e-5)
    np.testing.assert_allclose(lms, true_lms, atol=1e-4)
    # fixed cameras untouched
    np.testing.assert_allclose(
        poses[0].translation, noisy_poses[0].translation, atol=1e-12
    )


def test_ba_robust_loss_downweights_outliers(rng):
    intr, data, true_poses, noisy_poses, true_lms, noisy_lms = _make_rig(rng)
    # corrupt 2% of observations with gross pixel errors
    pixels = np.asarray(data.pixels).copy()
    n_out = max(1, pixels.shape[0] // 50)
    out_ids = rng.choice(pixels.shape[0], n_out, replace=False)
    pixels[out_ids] += rng.uniform(80, 150, size=(n_out, 2))
    data = data._replace(pixels=jnp.asarray(pixels))

    opts = Options().replace(max_iterations=60)

    def run(loss):
        ba = BundleAdjuster().set_loss_function(loss)
        poses, _, _ = ba.solve(
            opts, data, intr, noisy_poses, noisy_lms, fixed_cameras=(0, 1)
        )
        return max(
            np.linalg.norm(est.translation - true.translation)
            for est, true in zip(poses, true_poses)
        )

    err_trivial = run(None)
    err_huber = run(HuberLoss(threshold=0.01))
    # Huber's influence function only GROWS like sqrt(s), so outliers are
    # downweighted, not rejected — assert a strong improvement, not zero
    assert err_huber < 0.5 * err_trivial, (err_huber, err_trivial)
    assert err_huber < 0.05, err_huber


def test_schur_step_equals_dense_step(rng):
    """On a tiny problem the damped Schur step must equal the step from
    the full dense (6C + 3M) normal equations."""
    import jax

    from nonlinear_optimizer_for_slam_tpu.solvers.bundle_adjustment import (
        BAParams,
        _observation_residuals_jacobians,
    )

    intr, data, true_poses, noisy_poses, true_lms, noisy_lms = _make_rig(
        rng, num_cameras=3, num_landmarks=25
    )
    C, M = 3, 25
    params = BAParams(
        translations=jnp.asarray(np.stack([p.translation for p in noisy_poses])),
        quaternions=jnp.asarray(np.stack([p.quaternion() for p in noisy_poses])),
        landmarks=jnp.asarray(noisy_lms),
    )
    intr_j = CameraIntrinsics(*(jnp.asarray(v) for v in intr[:6]), intr.width, intr.height)
    r, J_c, J_l, valid = _observation_residuals_jacobians(params, data, intr_j)
    r, J_c, J_l = np.asarray(r), np.asarray(J_c), np.asarray(J_l)
    O = r.shape[0]
    lam = 1e-3

    # dense assembly
    dim = 6 * C + 3 * M
    J = np.zeros((O, 2, dim))
    for o in range(O):
        ci = int(data.camera_indices[o])
        li = int(data.landmark_indices[o])
        J[o, :, 6 * ci : 6 * ci + 6] = J_c[o]
        J[o, :, 6 * C + 3 * li : 6 * C + 3 * li + 3] = J_l[o]
    Jm = J.reshape(2 * O, dim)
    rv = r.reshape(2 * O)
    H = Jm.T @ Jm
    g = Jm.T @ rv
    Hd = H + lam * H * np.eye(dim) + 1e-8 * np.diag(
        np.r_[np.zeros(6 * C), np.ones(3 * M)]
    )
    delta_dense = np.linalg.solve(Hd, -g)

    # schur assembly (replicate solver internals at the same lambda)
    w = np.ones(O)
    U = np.zeros((C, 6, 6))
    V = np.zeros((M, 3, 3))
    g_c = np.zeros((C, 6))
    g_l = np.zeros((M, 3))
    Wblocks = np.zeros((M, C, 6, 3))
    for o in range(O):
        ci = int(data.camera_indices[o]); li = int(data.landmark_indices[o])
        U[ci] += J_c[o].T @ J_c[o]
        V[li] += J_l[o].T @ J_l[o]
        Wblocks[li, ci] += J_c[o].T @ J_l[o]
        g_c[ci] += J_c[o].T @ r[o]
        g_l[li] += J_l[o].T @ r[o]
    U = U + lam * U * np.eye(6)
    V = V + lam * V * np.eye(3) + 1e-8 * np.eye(3)
    V_inv = np.linalg.inv(V)
    S = np.zeros((C, 6, C, 6))
    for ci in range(C):
        S[ci, :, ci, :] += U[ci]
    for li in range(M):
        GV = Wblocks[li] @ V_inv[li]  # (C, 6, 3)
        for a in range(C):
            for b in range(C):
                S[a, :, b, :] -= GV[a] @ Wblocks[li, b].T
    rhs = g_c - np.einsum(
        "mcik,mk->ci", np.einsum("mcij,mjk->mcik", Wblocks, V_inv), g_l
    )
    dc = np.linalg.solve(S.reshape(6 * C, 6 * C), -rhs.reshape(6 * C)).reshape(C, 6)
    Wt_dc = np.einsum("mcik,ci->mk", Wblocks, dc)
    dl = -np.einsum("mkl,ml->mk", V_inv, g_l + Wt_dc)

    np.testing.assert_allclose(dc.ravel(), delta_dense[: 6 * C], rtol=1e-6, atol=1e-10)
    np.testing.assert_allclose(dl.ravel(), delta_dense[6 * C :], rtol=1e-6, atol=1e-10)


def test_sharded_ba_matches_single_device(rng):
    """Landmark-sharded BA over the 8-device CPU mesh == single-device BA
    (the multi-host path of BASELINE config 5)."""
    import jax

    from nonlinear_optimizer_for_slam_tpu.parallel import make_factor_mesh

    assert len(jax.devices()) == 8
    intr, data, true_poses, noisy_poses, true_lms, noisy_lms = _make_rig(
        rng, num_cameras=5, num_landmarks=100
    )
    opts = Options().replace(max_iterations=25)

    ba1 = BundleAdjuster()
    p1, l1, s1 = ba1.solve(
        opts, data, intr, noisy_poses, noisy_lms, fixed_cameras=(0, 1)
    )

    ba2 = BundleAdjuster(mesh=make_factor_mesh())
    p2, l2, s2 = ba2.solve(
        opts, data, intr, noisy_poses, noisy_lms, fixed_cameras=(0, 1)
    )

    for a, b in zip(p1, p2):
        np.testing.assert_allclose(b.translation, a.translation, atol=1e-8)
        np.testing.assert_allclose(b.rotation, a.rotation, atol=1e-8)
    np.testing.assert_allclose(l2, l1, atol=1e-7)
    assert int(s2.iterations) == int(s1.iterations)
    np.testing.assert_allclose(
        float(s2.final_cost), float(s1.final_cost), rtol=1e-10
    )


def test_chunked_schur_matches_one_shot(rng):
    """The landmark-chunked Schur cross-term accumulation (the large-rig
    memory path) must produce the same solve as the one-shot (M, C, 6, 3)
    scatter — chunk boundaries at awkward offsets included."""
    intr, data, true_poses, noisy_poses, landmarks, noisy_lms = _make_rig(rng)
    opts = Options().replace(max_iterations=15)

    one_shot = BundleAdjuster(landmark_chunk=None, layout="flat")
    p1, l1, s1 = one_shot.solve(
        opts, data, intr, noisy_poses, noisy_lms, fixed_cameras=(0, 1)
    )
    # 300 landmarks / chunk 97 -> 4 chunks, last one ragged
    chunked = BundleAdjuster(landmark_chunk=97, layout="flat")
    p2, l2, s2 = chunked.solve(
        opts, data, intr, noisy_poses, noisy_lms, fixed_cameras=(0, 1)
    )
    assert int(s1.iterations) == int(s2.iterations)
    np.testing.assert_allclose(l2, l1, atol=1e-8)
    for a, b in zip(p1, p2):
        np.testing.assert_allclose(b.translation, a.translation, atol=1e-8)
        np.testing.assert_allclose(b.rotation, a.rotation, atol=1e-8)


def test_grouped_layout_matches_flat(rng):
    """The scatter-free track-major (grouped) layout must reproduce the
    flat scatter-add layout's solve — same LM trajectory (iteration
    count), same cost, same poses/landmarks — since both evaluate the
    identical objective with the same damping policy, differing only in
    float reassociation of the segment sums."""
    intr, data, true_poses, noisy_poses, landmarks, noisy_lms = _make_rig(rng)
    opts = Options().replace(max_iterations=20)

    flat = BundleAdjuster(layout="flat")
    p1, l1, s1 = flat.solve(
        opts, data, intr, noisy_poses, noisy_lms, fixed_cameras=(0, 1)
    )
    grouped = BundleAdjuster(layout="grouped")
    p2, l2, s2 = grouped.solve(
        opts, data, intr, noisy_poses, noisy_lms, fixed_cameras=(0, 1)
    )
    assert int(s1.iterations) == int(s2.iterations)
    np.testing.assert_allclose(
        float(s2.final_cost), float(s1.final_cost), rtol=1e-8, atol=1e-12
    )
    np.testing.assert_allclose(l2, l1, atol=1e-7)
    for a, b in zip(p1, p2):
        np.testing.assert_allclose(b.translation, a.translation, atol=1e-7)
        np.testing.assert_allclose(b.rotation, a.rotation, atol=1e-7)

    # robust loss flows through the grouped path identically
    fl = BundleAdjuster(layout="flat").set_loss_function(HuberLoss(0.01))
    gl = BundleAdjuster(layout="grouped").set_loss_function(HuberLoss(0.01))
    _, _, sf = fl.solve(opts, data, intr, noisy_poses, noisy_lms, fixed_cameras=(0, 1))
    _, _, sg = gl.solve(opts, data, intr, noisy_poses, noisy_lms, fixed_cameras=(0, 1))
    np.testing.assert_allclose(
        float(sg.final_cost), float(sf.final_cost), rtol=1e-8, atol=1e-12
    )


def _orbit_rig(rng, num_cameras, num_landmarks):
    """Cameras on a ring orbiting a landmark cloud at the origin, every
    camera looking at the center — all cameras well-constrained at any
    camera count (unlike the small arc rig, whose outer cameras lose
    sight of the cloud)."""
    intr = CameraIntrinsics.create(525.0, 525.0, 320.0, 240.0, 640, 480)
    landmarks = np.stack(
        [
            rng.uniform(-2, 2, num_landmarks),
            rng.uniform(-2, 2, num_landmarks),
            rng.uniform(-1.5, 1.5, num_landmarks),
        ],
        axis=1,
    )
    radius = 8.0
    cam_idx, lm_idx, pixels = [], [], []
    world_from_cam = []
    for ci in range(num_cameras):
        ang = 2.0 * np.pi * ci / num_cameras
        center = np.array(
            [radius * np.cos(ang), radius * np.sin(ang), 0.3 * np.sin(3 * ang)]
        )
        # camera z-axis points at the origin
        z = -center / np.linalg.norm(center)
        up = np.array([0.0, 0.0, 1.0])
        x = np.cross(up, z)
        x /= np.linalg.norm(x)
        y = np.cross(z, x)
        R_wc = np.stack([x, y, z], axis=1)  # columns = camera axes in world
        world_from_cam.append(nls.Pose(R_wc, center))

    for ci, pose in enumerate(world_from_cam):
        pc = pose.inverse().apply(landmarks)
        uv = np.stack(
            [
                525.0 * pc[:, 0] / pc[:, 2] + 320.0,
                525.0 * pc[:, 1] / pc[:, 2] + 240.0,
            ],
            axis=1,
        )
        vis = (
            (pc[:, 2] > 0.5)
            & (uv[:, 0] >= 0)
            & (uv[:, 0] < 640)
            & (uv[:, 1] >= 0)
            & (uv[:, 1] < 480)
        )
        # subsample ~50% so the problem is not trivially over-determined
        vis &= rng.uniform(size=num_landmarks) < 0.5
        for li in np.nonzero(vis)[0]:
            cam_idx.append(ci)
            lm_idx.append(li)
            pixels.append(uv[li])

    data = BAData(
        camera_indices=jnp.asarray(np.array(cam_idx, np.int32)),
        landmark_indices=jnp.asarray(np.array(lm_idx, np.int32)),
        pixels=jnp.asarray(np.stack(pixels)),
        mask=jnp.ones(len(cam_idx)),
    )
    solver_true = [p.inverse() for p in world_from_cam]
    noisy = [solver_true[0].copy(), solver_true[1].copy()]
    for p in solver_true[2:]:
        dp = nls.Pose.from_axis_angle(
            0.01 * rng.normal(), rng.normal(size=3), 0.03 * rng.normal(size=3)
        )
        noisy.append(p * dp)
    noisy_lms = landmarks + 0.03 * rng.normal(size=landmarks.shape)
    return intr, data, solver_true, noisy, landmarks, noisy_lms


def test_ba_medium_rig_chunked(rng):
    """40 cams x 2,000 landmarks (~25k observations) through the chunked
    path: converges and recovers the rig on the CPU mesh. (The full
    100-cam / 10k-landmark / 100k-obs rig runs on the real chip in
    benchmarks/run_all.py.)"""
    intr, data, true_poses, noisy_poses, landmarks, noisy_lms = _orbit_rig(
        rng, num_cameras=40, num_landmarks=2000
    )
    counts = np.bincount(np.asarray(data.camera_indices), minlength=40)
    assert counts.min() > 100  # every camera well-constrained
    ba = BundleAdjuster(landmark_chunk=256)
    opts = Options().replace(max_iterations=40)
    poses, lms, summary = ba.solve(
        opts, data, intr, noisy_poses, noisy_lms, fixed_cameras=(0, 1)
    )
    err = max(
        np.linalg.norm(p.translation - tp.translation)
        for p, tp in zip(poses, true_poses)
    )
    assert err < 1e-4, err
    assert float(summary.final_cost) < 1e-6


def test_ba_plateau_summary_fields(rng):
    """Round-5 monotone safeguard plumbing on the BA loop: plateau
    solves report plateau_stop/best_cost with final_cost == best_cost
    on a plateau exit; default options keep the fields None."""
    import dataclasses

    from nonlinear_optimizer_for_slam_tpu.core.options import (
        ConvergenceHandle,
    )

    intr, data, true_poses, noisy_poses, true_lms, noisy_lms = _make_rig(rng)
    ba = BundleAdjuster()
    _, _, s_plain = ba.solve(
        Options().replace(max_iterations=5), data, intr, noisy_poses,
        noisy_lms, fixed_cameras=(0, 1),
    )
    assert s_plain.plateau_stop is None and s_plain.best_cost is None

    opts = dataclasses.replace(
        Options().replace(max_iterations=80),
        convergence_handle=ConvergenceHandle(
            gradient_tolerance=0.0, parameter_tolerance=0.0,
            relative_function_tolerance=1e-9,
        ),
    )
    _, _, s = ba.solve(
        opts, data, intr, noisy_poses, noisy_lms, fixed_cameras=(0, 1)
    )
    assert bool(s.converged)
    assert s.plateau_stop is not None
    if bool(s.plateau_stop):
        np.testing.assert_allclose(
            float(s.final_cost), float(s.best_cost), rtol=0
        )
