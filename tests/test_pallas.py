"""Pallas kernel parity tests (interpreter mode on the CPU test mesh).

The same kernel code that compiles on TPU runs interpreted here; parity
with the jnp/XLA evaluation path is the correctness criterion — exactly
the reference's SIMD-vs-scalar variant-parity methodology
(simd_implementation_comparison_test.cc, results/maha_amd64.txt)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import nonlinear_optimizer_for_slam_tpu as nls
from nonlinear_optimizer_for_slam_tpu.core import (
    CauchyLoss,
    DCSLoss,
    ExponentialLoss,
    GemanMcClureLoss,
    HuberLoss,
    Options,
    TrivialLoss,
    TukeyLoss,
    lie,
)
from nonlinear_optimizer_for_slam_tpu.ops import (
    mahalanobis,
    pallas_kernels as pk,
    reprojection,
)

F32 = jnp.float32


@pytest.fixture(scope="module")
def maha_data(rng):
    n = 700  # deliberately not a LANE_BLOCK multiple: exercises padding
    return mahalanobis.MahalanobisData(
        points=jnp.asarray(rng.normal(size=(n, 3)), F32),
        means=jnp.asarray(rng.normal(size=(n, 3)), F32),
        sqrt_infos=jnp.asarray(rng.normal(size=(n, 3, 3)), F32),
        mask=jnp.asarray((rng.uniform(size=n) > 0.1), F32),
    )


@pytest.fixture(scope="module")
def pose_f32(rng):
    q = np.asarray(lie.quat_normalize(jnp.asarray(rng.normal(size=4))))
    R = jnp.asarray(np.asarray(lie.quat_to_rotmat(jnp.asarray(q))), F32)
    t = jnp.asarray(rng.normal(size=3), F32)
    return R, t


LOSSES = [
    None,
    TrivialLoss(),
    ExponentialLoss(c1=1.3, c2=0.4),
    HuberLoss(2.0),
    CauchyLoss(1.5),
    TukeyLoss(1.8),
    GemanMcClureLoss(1.2),
    DCSLoss(2.5),
]


@pytest.mark.parametrize("loss", LOSSES, ids=lambda l: type(l).__name__)
def test_maha6_kernel_matches_jnp(maha_data, pose_f32, loss):
    R, t = pose_f32
    H1, g1, c1 = mahalanobis.eval_quadratic(R, t, maha_data, loss)
    H2, g2, c2 = pk.maha6_eval_quadratic(R, t, maha_data, loss)
    np.testing.assert_allclose(np.asarray(H2), np.asarray(H1), rtol=2e-5, atol=1e-4)
    np.testing.assert_allclose(np.asarray(g2), np.asarray(g1), rtol=2e-5, atol=1e-4)
    np.testing.assert_allclose(float(c2), float(c1), rtol=2e-5)


def test_maha3_kernel_matches_jnp(maha_data, rng):
    R2 = jnp.asarray(np.asarray(lie.rot2(jnp.asarray(0.6))), F32)
    t2 = jnp.asarray(rng.normal(size=2), F32)
    loss = ExponentialLoss()
    H1, g1, c1 = mahalanobis.eval_quadratic_3dof(R2, t2, maha_data, loss)
    H2, g2, c2 = pk.maha3_eval_quadratic(R2, t2, maha_data, loss)
    np.testing.assert_allclose(np.asarray(H2), np.asarray(H1), rtol=2e-5, atol=1e-4)
    np.testing.assert_allclose(np.asarray(g2), np.asarray(g1), rtol=2e-5, atol=1e-4)
    np.testing.assert_allclose(float(c2), float(c1), rtol=2e-5)


def test_reproj_kernel_matches_jnp(rng, pose_f32):
    n = 630
    data = reprojection.ReprojectionData(
        local_points=jnp.asarray(
            rng.normal(size=(n, 3)) + np.array([0, 0, 4.0]), F32
        ),
        matched_pixels=jnp.asarray(rng.uniform(0, 640, size=(n, 2)), F32),
        mask=jnp.ones((n,), F32),
    )
    intr = reprojection.CameraIntrinsics.create(
        jnp.asarray(525.0, F32),
        jnp.asarray(525.0, F32),
        jnp.asarray(320.0, F32),
        jnp.asarray(240.0, F32),
    )
    R, t = pose_f32
    loss = ExponentialLoss()
    H1, g1, c1 = reprojection.eval_quadratic(R, t, data, intr, loss)
    H2, g2, c2 = pk.reproj_eval_quadratic(R, t, data, intr, loss)
    np.testing.assert_allclose(np.asarray(H2), np.asarray(H1), rtol=2e-4, atol=1e-3)
    np.testing.assert_allclose(np.asarray(g2), np.asarray(g1), rtol=2e-4, atol=1e-3)
    np.testing.assert_allclose(float(c2), float(c1), rtol=2e-5)


def test_pallas_backend_solve_matches_jnp_backend(maha_data):
    """Full LM solve through the public API, backend parity."""
    opts = Options()
    loss = ExponentialLoss()
    # make the problem consistent so both backends take identical paths
    true_pose = nls.Pose.from_axis_angle(0.06, [0, 0, 1.0], [0.1, -0.08, 0.15])
    data = mahalanobis.MahalanobisData(
        points=maha_data.points,
        means=jnp.asarray(true_pose.apply(np.asarray(maha_data.points)), F32),
        sqrt_infos=jnp.asarray(
            np.tile(np.eye(3, dtype=np.float32), (maha_data.num_factors, 1, 1))
        ),
        mask=maha_data.mask,
    )
    m1 = nls.MahalanobisDistanceMinimizer(backend="jnp").set_loss_function(loss)
    m2 = nls.MahalanobisDistanceMinimizer(backend="pallas").set_loss_function(loss)
    p1, s1 = m1.solve(opts, data, nls.Pose.identity())
    p2, s2 = m2.solve(opts, data, nls.Pose.identity())
    np.testing.assert_allclose(p2.translation, p1.translation, atol=1e-5)
    np.testing.assert_allclose(p2.rotation, p1.rotation, atol=1e-5)
    np.testing.assert_allclose(p2.translation, true_pose.translation, atol=1e-3)

    # planar backend parity through the public API (the pallas path packs
    # the compact 10-row Gram layout)
    planar_true = nls.Pose.from_axis_angle(0.06, [0, 0, 1.0], [0.1, -0.08, 0.0])
    data3 = mahalanobis.MahalanobisData(
        points=data.points,
        means=jnp.asarray(planar_true.apply(np.asarray(data.points)), F32),
        sqrt_infos=data.sqrt_infos,
        mask=data.mask,
    )
    m3j = nls.MahalanobisDistanceMinimizer3DOF(backend="jnp").set_loss_function(loss)
    m3p = nls.MahalanobisDistanceMinimizer3DOF(backend="pallas").set_loss_function(loss)
    p3j, _ = m3j.solve(opts, data3, nls.Pose.identity())
    p3p, _ = m3p.solve(opts, data3, nls.Pose.identity())
    np.testing.assert_allclose(p3p.translation, p3j.translation, atol=1e-5)
    np.testing.assert_allclose(p3p.rotation, p3j.rotation, atol=1e-5)
    np.testing.assert_allclose(
        p3p.translation[:2], planar_true.translation[:2], atol=1e-3
    )


def test_fused_registration_matches_host_loop():
    """Device-resident ICP == host-driven ICP on the same world."""
    from nonlinear_optimizer_for_slam_tpu.pipelines import (
        fused_registration,
        ndt,
        registration,
    )
    from nonlinear_optimizer_for_slam_tpu.utils import testing

    pts = testing.generate_room_points(point_step=0.02)
    ndt_map = ndt.build_ndt_map(pts, 1.0)
    true_pose = testing.maha_true_pose()
    local = true_pose.inverse().apply(ndt.filter_points(pts, 0.1))

    loss = ExponentialLoss()
    opts = Options()

    host = registration.register_ndt(
        ndt_map,
        local,
        nls.Pose.identity(),
        nls.MahalanobisDistanceMinimizer().set_loss_function(loss),
        opts,
    )
    fused = fused_registration.register_ndt_fused(
        ndt_map, local, nls.Pose.identity(), opts, loss
    )
    np.testing.assert_allclose(
        fused.pose.translation, host.pose.translation, atol=1e-4
    )
    np.testing.assert_allclose(fused.pose.rotation, host.pose.rotation, atol=1e-4)
    t_err = np.linalg.norm(fused.pose.translation - true_pose.translation)
    assert t_err < 0.03, t_err


def test_p2p_kernel_matches_jnp(rng, pose_f32):
    from nonlinear_optimizer_for_slam_tpu.ops import point_to_plane

    n = 500
    normals = rng.normal(size=(n, 3))
    normals /= np.linalg.norm(normals, axis=1, keepdims=True)
    data = point_to_plane.PointToPlaneData(
        points=jnp.asarray(rng.normal(size=(n, 3)), F32),
        means=jnp.asarray(rng.normal(size=(n, 3)), F32),
        normals=jnp.asarray(normals, F32),
        mask=jnp.asarray((rng.uniform(size=n) > 0.1), F32),
    )
    R, t = pose_f32
    loss = HuberLoss(1.0)
    H1, g1, c1 = point_to_plane.eval_quadratic(R, t, data, loss)
    H2, g2, c2 = pk.p2p_eval_quadratic(R, t, data, loss)
    np.testing.assert_allclose(np.asarray(H2), np.asarray(H1), rtol=2e-5, atol=1e-4)
    np.testing.assert_allclose(np.asarray(g2), np.asarray(g1), rtol=2e-5, atol=1e-4)
    np.testing.assert_allclose(float(c2), float(c1), rtol=2e-5)


def test_p2p_v_kernel_matches_packed_and_vmaps(rng, pose_f32):
    """The vmap-compatible p2p kernel variant: identical outputs to the
    SMEM-params kernel, and auto-batchable under jax.vmap (the fused
    batched-serving requirement)."""
    from nonlinear_optimizer_for_slam_tpu.ops import point_to_plane

    n = 384
    normals = rng.normal(size=(n, 3))
    normals /= np.linalg.norm(normals, axis=1, keepdims=True)
    data = point_to_plane.PointToPlaneData(
        points=jnp.asarray(rng.normal(size=(n, 3)), F32),
        means=jnp.asarray(rng.normal(size=(n, 3)), F32),
        normals=jnp.asarray(normals, F32),
        mask=jnp.asarray((rng.uniform(size=n) > 0.1), F32),
    )
    R, t = pose_f32
    loss = HuberLoss(1.0)
    packed = pk.pack_p2p(data)
    H1, g1, c1 = pk.p2p_eval_quadratic_packed(R, t, packed, loss)
    H2, g2, c2 = pk.p2p_eval_quadratic_packed_v(R, t, packed, loss)
    np.testing.assert_allclose(np.asarray(H2), np.asarray(H1), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(g2), np.asarray(g1), rtol=1e-6)
    np.testing.assert_allclose(float(c2), float(c1), rtol=1e-6)

    B = 3
    Rb = jnp.stack([R] * B)
    tb = jnp.stack([t, t + 0.01, t - 0.02])
    pb = jnp.stack([packed] * B)
    Hb, gb, cb = jax.vmap(
        lambda R_, t_, p_: pk.p2p_eval_quadratic_packed_v(R_, t_, p_, loss)
    )(Rb, tb, pb)
    assert Hb.shape == (B, 6, 6) and gb.shape == (B, 6)
    H0, g0, c0 = pk.p2p_eval_quadratic_packed(Rb[1], tb[1], packed, loss)
    np.testing.assert_allclose(np.asarray(Hb[1]), np.asarray(H0), rtol=1e-6)
    np.testing.assert_allclose(float(cb[1]), float(c0), rtol=1e-6)


def test_p2p_pallas_backend_solve(rng):
    from nonlinear_optimizer_for_slam_tpu.ops import point_to_plane

    n = 400
    pts = rng.uniform(-2, 2, size=(n, 3))
    normals = rng.normal(size=(n, 3))
    normals /= np.linalg.norm(normals, axis=1, keepdims=True)
    true_pose = nls.Pose.from_axis_angle(0.04, [0.1, -0.2, 1.0], [0.1, -0.05, 0.2])
    data = point_to_plane.PointToPlaneData(
        points=jnp.asarray(pts, F32),
        means=jnp.asarray(true_pose.apply(pts), F32),
        normals=jnp.asarray(normals, F32),
        mask=jnp.ones(n, F32),
    )
    m = nls.PointToPlaneMinimizer(backend="pallas")
    pose, summary = m.solve(Options(), data, nls.Pose.identity())
    np.testing.assert_allclose(pose.translation, true_pose.translation, atol=1e-4)


def test_packed_layout_roundtrip(rng):
    """pack_maha6 layout: unpacking the plane buffer recovers the
    original SoA fields exactly (the analog of the reference's SIMD
    load/store roundtrip test, utility_tests/simd_helper_test.cc).
    Lane order in the (16, lanes // 128, 128) plane form is row-major,
    i.e. flattening the last two axes recovers the (16, lanes) rows."""
    n = 300
    data = mahalanobis.MahalanobisData(
        points=jnp.asarray(rng.normal(size=(n, 3)), F32),
        means=jnp.asarray(rng.normal(size=(n, 3)), F32),
        sqrt_infos=jnp.asarray(rng.normal(size=(n, 3, 3)), F32),
        mask=jnp.ones((n,), F32),
    )
    packed = np.asarray(pk.pack_maha6(data))
    assert packed.shape == (16, pk.LANE_BLOCK // 128, 128)
    packed = packed.reshape(16, -1)
    np.testing.assert_array_equal(packed[0:3, :n], np.asarray(data.points).T)
    np.testing.assert_array_equal(packed[3:6, :n], np.asarray(data.means).T)
    np.testing.assert_array_equal(
        packed[6:15, :n], np.asarray(data.sqrt_infos).reshape(n, 9).T
    )
    np.testing.assert_array_equal(packed[15, :n], np.asarray(data.mask))
    # padding lanes fully zero (masked)
    assert np.all(packed[:, n:] == 0)


@pytest.mark.parametrize("loss", LOSSES, ids=lambda l: type(l).__name__)
def test_maha3_compact_kernel_parity(maha_data, loss):
    """Compact 10-row 3-DoF kernel (per-factor Gram precomputation) ==
    the 16-row kernel == the f64 jnp oracle, for every loss."""
    theta = 0.17
    R2 = jnp.asarray(
        [[np.cos(theta), -np.sin(theta)], [np.sin(theta), np.cos(theta)]], F32
    )
    t2 = jnp.asarray([0.05, -0.08], F32)

    H16, g16, c16 = pk.maha3_eval_quadratic_packed(
        R2, t2, pk.pack_maha6(maha_data), loss
    )
    Hc, gc, cc = pk.maha3_eval_quadratic_compact(
        R2, t2, pk.pack_maha3_compact(maha_data), loss
    )
    np.testing.assert_allclose(
        np.asarray(Hc), np.asarray(H16), rtol=1e-4, atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(gc), np.asarray(g16), rtol=1e-4, atol=1e-4
    )
    np.testing.assert_allclose(float(cc), float(c16), rtol=1e-4)

    # f64 oracle on the same data
    data64 = maha_data.astype(jnp.float64)
    H64, g64, c64 = mahalanobis.eval_quadratic_3dof(
        jnp.asarray(R2, jnp.float64), jnp.asarray(t2, jnp.float64), data64, loss
    )
    np.testing.assert_allclose(
        np.asarray(Hc), np.asarray(H64), rtol=1e-4, atol=1e-5
    )
    np.testing.assert_allclose(float(cc), float(c64), rtol=1e-4)


def test_adaptive_lane_block_padding_invariant():
    """Any buffer padded to a multiple of _resolve_lane_block(raw) must
    still be a multiple of _resolve_lane_block(padded): the packed evals
    compute grid = padded // block and would silently FLOOR-DROP tail
    lanes otherwise (review-found in the fused registrar, which used to
    pad with the small block unconditionally)."""
    T = pk._LARGE_LANE_THRESHOLD
    for raw in (1, 100, pk.LANE_BLOCK, T - 1, T, T + 1, T + pk.LANE_BLOCK,
                4 * T + 7):
        block = pk._resolve_lane_block(raw, None)
        padded = ((raw + block - 1) // block) * block
        eval_block = pk._resolve_lane_block(padded, None)
        assert padded % eval_block == 0, (raw, block, padded, eval_block)
