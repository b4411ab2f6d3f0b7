"""Batched serving-mode solvers: B problems in one program must match B
individual solves per instance — including ragged masks (different valid
factor counts per instance) and per-instance convergence (different
iteration counts). This is the serving analog of the reference's
variant-parity methodology: the batched program is a *variant* of the
serial one and must optimize the identical objective.
"""

import jax.numpy as jnp
import numpy as np
import pytest

import nonlinear_optimizer_for_slam_tpu as nls
from nonlinear_optimizer_for_slam_tpu.core import ExponentialLoss, Options
from nonlinear_optimizer_for_slam_tpu.ops import (
    mahalanobis,
    point_to_plane,
    reprojection,
)
from nonlinear_optimizer_for_slam_tpu.ops.reprojection import CameraIntrinsics
from nonlinear_optimizer_for_slam_tpu.solvers import (
    solve_mahalanobis_batch,
    solve_point_to_plane_batch,
    solve_reprojection_batch,
)


def _random_pose(rng, angle=0.08, tscale=0.15):
    return nls.Pose.from_axis_angle(
        angle * rng.normal(), rng.normal(size=3), tscale * rng.normal(size=3)
    )


def test_batched_reprojection_ragged_masks(rng):
    """Ragged PnP batch: instance b has n_b valid correspondences (mask
    tail zeroed); batched results bit-match per-instance serial solves,
    including ITERATION COUNTS (per-instance convergence state)."""
    B, n_pad = 6, 160
    valid_counts = [160, 120, 90, 150, 60, 140]
    intr = CameraIntrinsics.create(525.0, 525.0, 320.0, 240.0, 640, 480)
    opts = Options()
    loss = ExponentialLoss()

    pts_b, pix_b, mask_b, true_poses = [], [], [], []
    for b in range(B):
        n = valid_counts[b]
        pts = np.zeros((n_pad, 3))
        pts[:n] = np.stack(
            [
                rng.uniform(-1.5, 1.5, n),
                rng.uniform(-1.0, 1.0, n),
                rng.uniform(2.5, 4.0, n),
            ],
            axis=1,
        )
        # widely varying problem difficulty so iteration counts differ
        tp = _random_pose(rng, angle=0.02 + 0.06 * b, tscale=0.04 + 0.12 * b)
        q = tp.apply(pts[:n])
        pix = np.zeros((n_pad, 2))
        pix[:n] = np.stack(
            [525 * q[:, 0] / q[:, 2] + 320, 525 * q[:, 1] / q[:, 2] + 240],
            axis=1,
        )
        mask = np.zeros(n_pad)
        mask[:n] = 1.0
        pts_b.append(pts)
        pix_b.append(pix)
        mask_b.append(mask)
        true_poses.append(tp)

    data = reprojection.ReprojectionData(
        jnp.asarray(np.stack(pts_b)),
        jnp.asarray(np.stack(pix_b)),
        jnp.asarray(np.stack(mask_b)),
    )
    poses, iters, costs = solve_reprojection_batch(
        opts, data, intr, [nls.Pose.identity()] * B, loss=loss, dtype=jnp.float64
    )

    single = nls.ReprojectionErrorMinimizer(dtype=jnp.float64).set_loss_function(
        loss
    )
    iter_counts = set()
    for b in range(B):
        np.testing.assert_allclose(
            poses[b].translation, true_poses[b].translation, atol=1e-6
        )
        d = reprojection.ReprojectionData(
            jnp.asarray(pts_b[b]), jnp.asarray(pix_b[b]), jnp.asarray(mask_b[b])
        )
        p1, s1 = single.solve(opts, d, intr, nls.Pose.identity())
        np.testing.assert_allclose(poses[b].translation, p1.translation, atol=1e-8)
        np.testing.assert_allclose(poses[b].rotation, p1.rotation, atol=1e-8)
        assert int(iters[b]) == int(s1.iterations)
        np.testing.assert_allclose(costs[b], float(s1.final_cost), rtol=1e-6)
        iter_counts.add(int(iters[b]))
    # the fixture must actually exercise per-instance convergence state
    assert len(iter_counts) > 1, iter_counts


def test_batched_mahalanobis_matches_serial(rng):
    """B NDT-alignment problems in one dispatch == B serial solves."""
    B, n_pad = 5, 300
    valid_counts = [300, 200, 260, 140, 300]
    opts = Options()
    loss = ExponentialLoss()

    pts_b, mus_b, infos_b, mask_b, true_poses = [], [], [], [], []
    for b in range(B):
        n = valid_counts[b]
        pts = np.zeros((n_pad, 3))
        pts[:n] = rng.uniform(-2, 2, size=(n, 3))
        tp = _random_pose(rng)
        mus = np.zeros((n_pad, 3))
        mus[:n] = tp.apply(pts[:n])
        # SPD sqrt-informations: random rotation * diag scaling
        infos = np.tile(np.eye(3), (n_pad, 1, 1))
        for i in range(n):
            a = rng.normal(size=3)
            infos[i] += 0.2 * np.outer(a, a)
        mask = np.zeros(n_pad)
        mask[:n] = 1.0
        pts_b.append(pts)
        mus_b.append(mus)
        infos_b.append(infos)
        mask_b.append(mask)
        true_poses.append(tp)

    data = mahalanobis.MahalanobisData(
        jnp.asarray(np.stack(pts_b)),
        jnp.asarray(np.stack(mus_b)),
        jnp.asarray(np.stack(infos_b)),
        jnp.asarray(np.stack(mask_b)),
    )
    poses, iters, costs = solve_mahalanobis_batch(
        opts, data, [nls.Pose.identity()] * B, loss=loss, dtype=jnp.float64
    )

    single = nls.MahalanobisDistanceMinimizer(dtype=jnp.float64).set_loss_function(
        loss
    )
    for b in range(B):
        np.testing.assert_allclose(
            poses[b].translation, true_poses[b].translation, atol=1e-5
        )
        d = mahalanobis.MahalanobisData(
            jnp.asarray(pts_b[b]),
            jnp.asarray(mus_b[b]),
            jnp.asarray(infos_b[b]),
            jnp.asarray(mask_b[b]),
        )
        p1, s1 = single.solve(opts, d, nls.Pose.identity())
        np.testing.assert_allclose(poses[b].translation, p1.translation, atol=1e-8)
        assert int(iters[b]) == int(s1.iterations)


def test_batched_point_to_plane_matches_serial(rng):
    B, n = 4, 200
    opts = Options()
    pts_b, mus_b, nrm_b, true_poses = [], [], [], []
    for b in range(B):
        pts = rng.uniform(-2, 2, size=(n, 3))
        normals = rng.normal(size=(n, 3))
        normals /= np.linalg.norm(normals, axis=1, keepdims=True)
        tp = _random_pose(rng, angle=0.05, tscale=0.1)
        anchors = tp.apply(pts)
        pts_b.append(pts)
        mus_b.append(anchors)
        nrm_b.append(normals)
        true_poses.append(tp)

    data = point_to_plane.PointToPlaneData(
        jnp.asarray(np.stack(pts_b)),
        jnp.asarray(np.stack(mus_b)),
        jnp.asarray(np.stack(nrm_b)),
        jnp.ones((B, n)),
    )
    poses, iters, costs = solve_point_to_plane_batch(
        opts, data, [nls.Pose.identity()] * B, dtype=jnp.float64
    )
    single = nls.PointToPlaneMinimizer(dtype=jnp.float64)
    for b in range(B):
        np.testing.assert_allclose(
            poses[b].translation, true_poses[b].translation, atol=1e-6
        )
        d = point_to_plane.PointToPlaneData(
            jnp.asarray(pts_b[b]),
            jnp.asarray(mus_b[b]),
            jnp.asarray(nrm_b[b]),
            jnp.ones(n),
        )
        p1, s1 = single.solve(opts, d, nls.Pose.identity())
        np.testing.assert_allclose(poses[b].translation, p1.translation, atol=1e-8)
        assert int(iters[b]) == int(s1.iterations)


@pytest.fixture(scope="module")
def small_world():
    from nonlinear_optimizer_for_slam_tpu.pipelines import ndt
    from nonlinear_optimizer_for_slam_tpu.utils import testing

    pts = testing.generate_room_points(point_step=0.05)
    ndt_map = ndt.build_ndt_map(pts, 1.0)
    true_pose = testing.maha_true_pose()
    local = true_pose.inverse().apply(ndt.filter_points(pts, 0.3))
    return ndt_map, local, true_pose


@pytest.mark.parametrize("mode", ["lockstep", "vmap"])
def test_batched_registration_matches_single(small_world, rng, mode):
    """B full scan-to-map registrations (ragged scan sizes, distinct
    initial poses) in ONE program match per-scan single registrations —
    for BOTH batch machines: the lockstep-outer production path and the
    vmapped whole-ICP oracle. Ragged sizes force the lanes out of sync
    (different inner/outer schedules), which is exactly the case where
    the lockstep freeze/sync logic must not perturb per-lane
    trajectories."""
    from nonlinear_optimizer_for_slam_tpu.pipelines import fused_registration

    ndt_map, local, _ = small_world
    opts = Options().replace(max_iterations=6)
    loss = ExponentialLoss()
    registrar = fused_registration.NdtRegistrar(
        ndt_map, opts, loss, max_outer_iterations=2
    )

    # ragged: full scan, a 75% prefix, and a 50% prefix with a nudged init
    scans = [local, local[: int(0.75 * len(local))], local[: len(local) // 2]]
    inits = [
        nls.Pose.identity(),
        nls.Pose.identity(),
        _random_pose(rng, angle=0.02, tscale=0.05),
    ]
    batch = registrar.register_batch(scans, inits, mode=mode)
    assert len(batch) == 3
    for scan, init, res in zip(scans, inits, batch):
        ref = registrar.register(scan, init)
        np.testing.assert_allclose(
            res.pose.translation, ref.pose.translation, atol=1e-5
        )
        np.testing.assert_allclose(res.pose.rotation, ref.pose.rotation, atol=1e-5)
        assert res.outer_iterations == ref.outer_iterations
        np.testing.assert_array_equal(res.inner_iterations, ref.inner_iterations)


def test_batched_mahalanobis_pallas_backend(rng):
    """The vmap-compatible pallas kernel backend matches the jnp backend
    per instance (f32 kernel tolerance)."""
    B, n = 4, 256
    opts = Options()
    loss = ExponentialLoss()
    pts_b, mus_b, infos_b, true_poses = [], [], [], []
    for b in range(B):
        pts = rng.uniform(-2, 2, size=(n, 3))
        tp = _random_pose(rng)
        infos = np.tile(np.eye(3), (n, 1, 1))
        for i in range(n):
            a = rng.normal(size=3)
            infos[i] += 0.2 * np.outer(a, a)
        pts_b.append(pts)
        mus_b.append(tp.apply(pts))
        infos_b.append(infos)
        true_poses.append(tp)
    data = mahalanobis.MahalanobisData(
        jnp.asarray(np.stack(pts_b)),
        jnp.asarray(np.stack(mus_b)),
        jnp.asarray(np.stack(infos_b)),
        jnp.ones((B, n)),
    )
    poses_j, iters_j, costs_j = solve_mahalanobis_batch(
        opts, data, [nls.Pose.identity()] * B, loss=loss
    )
    poses_p, iters_p, costs_p = solve_mahalanobis_batch(
        opts, data, [nls.Pose.identity()] * B, loss=loss, backend="pallas"
    )
    for b in range(B):
        np.testing.assert_allclose(
            poses_p[b].translation, poses_j[b].translation, atol=1e-4
        )
        np.testing.assert_allclose(
            poses_p[b].translation, true_poses[b].translation, atol=1e-3
        )


def test_register_batch_async_matches_sync(registrar_fixture=None):
    """register_batch_async + finalize_batch == register_batch (the
    streaming form defers only the fetch)."""
    import numpy as np

    from nonlinear_optimizer_for_slam_tpu.core import ExponentialLoss, Options
    from nonlinear_optimizer_for_slam_tpu.pipelines import (
        fused_registration,
        ndt,
    )
    from nonlinear_optimizer_for_slam_tpu.utils import testing
    import nonlinear_optimizer_for_slam_tpu as nls

    pts = testing.generate_room_points(point_step=0.05)
    ndt_map = ndt.build_ndt_map(pts, 1.0)
    scan = ndt.filter_points(pts, 0.3)
    true_pose = testing.maha_true_pose()
    local = true_pose.inverse().apply(scan)
    reg = fused_registration.NdtRegistrar(
        ndt_map, Options(), ExponentialLoss(c1=1.0, c2=1.0)
    )
    poses = []
    for i in range(3):
        p = nls.Pose.identity()
        p.translation = p.translation + 1e-4 * (i + 1)
        poses.append(p)
    sync = reg.register_batch([local] * 3, poses)
    out = reg.register_batch_async([local] * 3, poses)
    asyn = fused_registration.NdtRegistrar.finalize_batch(out)
    for a, s in zip(asyn, sync):
        np.testing.assert_allclose(a.pose.translation, s.pose.translation,
                                   atol=1e-12)
        assert a.outer_iterations == s.outer_iterations
        np.testing.assert_allclose(a.final_cost, s.final_cost, rtol=1e-12)


def test_solve_batch_async_matches_blocking(rng):
    """Round-5 async one-shot batch serving: solve_*_batch_async +
    finalize_solve_batch is the same jitted program as the blocking
    wrapper (which now delegates to it), so results must match
    bit-for-bit."""
    from nonlinear_optimizer_for_slam_tpu.solvers import (
        finalize_solve_batch,
        solve_reprojection_batch,
        solve_reprojection_batch_async,
    )
    from nonlinear_optimizer_for_slam_tpu.utils import testing as t_

    points, pixels, intrinsics, true_pose = t_.generate_reprojection_fixture()
    B, n = 4, points.shape[0]
    bdata = reprojection.ReprojectionData(
        jnp.asarray(np.broadcast_to(points, (B, n, 3)), jnp.float32),
        jnp.asarray(np.broadcast_to(pixels, (B, n, 2)), jnp.float32),
        jnp.ones((B, n), jnp.float32),
    )
    inits = [nls.Pose(np.eye(3), 0.05 * rng.normal(size=3)) for _ in range(B)]
    opts = Options()
    loss = ExponentialLoss()
    poses_b, iters_b, costs_b = solve_reprojection_batch(
        opts, bdata, intrinsics, inits, loss=loss
    )
    out = solve_reprojection_batch_async(
        opts, bdata, intrinsics, inits, loss=loss
    )
    poses_a, iters_a, costs_a = finalize_solve_batch(out)
    np.testing.assert_array_equal(iters_a, iters_b)
    np.testing.assert_array_equal(costs_a, costs_b)
    for pa, pb in zip(poses_a, poses_b):
        np.testing.assert_array_equal(pa.translation, pb.translation)
