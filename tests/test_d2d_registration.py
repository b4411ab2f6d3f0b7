"""Distribution-to-distribution (D2D / GICP-style) NDT registration.

Beyond the reference, which matches raw scan points to map voxels
(mahalanobis .../types.h Correspondence); here the scan is itself
summarized as voxel Gaussians and whitening uses the GICP combined
covariance (Sigma_m + R Sigma_s R^T)^{-1}."""

import jax.numpy as jnp
import numpy as np
import pytest

from nonlinear_optimizer_for_slam_tpu.core import Options
from nonlinear_optimizer_for_slam_tpu.core.pose import Pose
from nonlinear_optimizer_for_slam_tpu.pipelines import ndt, registration
from nonlinear_optimizer_for_slam_tpu.solvers.minimizers import (
    MahalanobisDistanceMinimizer,
)
from nonlinear_optimizer_for_slam_tpu.utils import testing


def test_voxel_covariances_roundtrip():
    """Reconstructed covariance matches the eigenvalue-floored original."""
    rng = np.random.default_rng(11)
    pts = rng.normal(0.45, 0.12, (500, 3))  # one blob inside voxel [0,1)^3
    m = ndt.build_ndt_map(pts, 1.0, identity_moment=False)
    assert m.num_voxels >= 1
    covs = ndt.voxel_covariances(m)

    # Direct covariance of the points in the dominant voxel.
    inside = np.all((pts >= 0) & (pts < 1), axis=1)
    P = pts[inside]
    C = P.T @ P / len(P) - np.outer(P.mean(0), P.mean(0))
    # find that voxel's row by mean proximity
    i = int(np.argmin(np.sum((m.means - P.mean(0)) ** 2, axis=1)))
    w = np.linalg.eigvalsh(C)
    floored = w.copy()
    floored[:2] = np.maximum(floored[:2], 0.01 * w[2])
    wr = np.linalg.eigvalsh(covs[i])
    np.testing.assert_allclose(wr, floored, rtol=1e-9, atol=1e-12)
    # same eigenbasis => same matrix after flooring
    _, V = np.linalg.eigh(C)
    np.testing.assert_allclose(
        covs[i], V @ np.diag(floored) @ V.T, atol=1e-9
    )


@pytest.fixture(scope="module")
def world():
    pts = testing.generate_room_points(point_step=0.05)
    ndt_map = ndt.build_ndt_map(pts, 1.0)  # reference-parity map build
    scan = ndt.filter_points(pts, 0.2)
    return ndt_map, scan


def test_register_d2d_recovers_pose(world):
    ndt_map, scan = world
    true_pose = testing.maha_true_pose()
    local = true_pose.inverse().apply(scan)

    minimizer = MahalanobisDistanceMinimizer(dtype=jnp.float32)
    result = registration.register_d2d_ndt(
        ndt_map, local, Pose.identity(), minimizer, Options()
    )
    t_err = np.linalg.norm(result.pose.translation - true_pose.translation)
    q_est, q_true = result.pose.quaternion(), true_pose.quaternion()
    q_err = min(np.linalg.norm(q_est - q_true), np.linalg.norm(q_est + q_true))
    # D2D is the coarse mode: a few hundred voxel pairs instead of
    # thousands of points; centimeter-level on this fixture.
    assert t_err < 0.02, t_err
    assert q_err < 5e-3, q_err
    assert result.outer_iterations < 10


def test_register_d2d_sharpens_with_unquirked_map(world):
    """An identity_moment=False map (unbiased covariances) should do at
    least as well as the quirked parity build."""
    _, scan = world
    pts = testing.generate_room_points(point_step=0.05)
    clean_map = ndt.build_ndt_map(pts, 1.0, identity_moment=False)
    true_pose = testing.maha_true_pose()
    local = true_pose.inverse().apply(scan)

    minimizer = MahalanobisDistanceMinimizer(dtype=jnp.float32)
    result = registration.register_d2d_ndt(
        clean_map, local, Pose.identity(), minimizer, Options()
    )
    t_err = np.linalg.norm(result.pose.translation - true_pose.translation)
    assert t_err < 0.01, t_err


def test_register_d2d_rejects_too_fine_scan_voxels(world):
    """Scan voxels below the builder's absolute lambda_max >= 0.01 test
    can never validate; the pipeline raises instead of silently solving
    an empty problem."""
    ndt_map, scan = world
    minimizer = MahalanobisDistanceMinimizer(dtype=jnp.float32)
    with pytest.raises(ValueError, match="no valid scan voxel"):
        registration.register_d2d_ndt(
            ndt_map,
            scan,
            Pose.identity(),
            minimizer,
            Options(),
            scan_voxel_resolution=0.1,
        )


# ---------------------------------------------------------------------------
# Fused single-dispatch D2D (pipelines/fused_d2d.py)
# ---------------------------------------------------------------------------


def test_inv_lower3_closed_form(rng):
    from nonlinear_optimizer_for_slam_tpu.pipelines.fused_d2d import _inv_lower3

    A = rng.normal(size=(32, 3, 3))
    C = A @ np.transpose(A, (0, 2, 1)) + 3.0 * np.eye(3)
    L = np.linalg.cholesky(C)
    Linv = np.asarray(_inv_lower3(jnp.asarray(L)))
    np.testing.assert_allclose(Linv @ L, np.broadcast_to(np.eye(3), L.shape),
                               atol=1e-10)
    # S = L^{-1} satisfies S^T S = C^{-1}: the only property the objective
    # reads (r = S e, |r|^2, J^T J)
    np.testing.assert_allclose(
        np.transpose(Linv, (0, 2, 1)) @ Linv, np.linalg.inv(C), atol=1e-9
    )


def test_fused_d2d_matches_host_loop(world):
    """The single-dispatch D2D program lands where the host-loop GICP
    lands (same matching rule, same whitening objective — Cholesky-inverse
    vs symmetric-eigh sqrt factors satisfy the same S^T S = W)."""
    from nonlinear_optimizer_for_slam_tpu.pipelines.fused_d2d import D2dRegistrar

    _, scan = world
    pts = testing.generate_room_points(point_step=0.05)
    clean_map = ndt.build_ndt_map(pts, 1.0, identity_moment=False)
    true_pose = testing.maha_true_pose()
    local = true_pose.inverse().apply(scan)

    host = registration.register_d2d_ndt(
        clean_map, local, Pose.identity(),
        MahalanobisDistanceMinimizer(dtype=jnp.float32), Options(),
    )
    reg = D2dRegistrar(clean_map, Options(), dtype=jnp.float32)
    fused = reg.register(local, Pose.identity())

    t_err = np.linalg.norm(fused.pose.translation - true_pose.translation)
    assert t_err < 0.01, t_err
    # host-vs-fused parity (both converged fixed points of the same
    # objective; mm-level, not bitwise — policies evaluate identically but
    # the factored whitening differs in rounding)
    np.testing.assert_allclose(
        fused.pose.translation, host.pose.translation, atol=2e-3
    )
    q_f, q_h = fused.pose.quaternion(), host.pose.quaternion()
    assert min(np.linalg.norm(q_f - q_h), np.linalg.norm(q_f + q_h)) < 2e-3
    assert fused.outer_iterations <= 10


def test_fused_d2d_scan_padding_invariance(world):
    """Bucket padding (identity-covariance voxels, masked) must not change
    the result: pad multiples give the same pose."""
    from nonlinear_optimizer_for_slam_tpu.pipelines.fused_d2d import D2dRegistrar

    _, scan = world
    pts = testing.generate_room_points(point_step=0.05)
    clean_map = ndt.build_ndt_map(pts, 1.0, identity_moment=False)
    true_pose = testing.maha_true_pose()
    local = true_pose.inverse().apply(scan)

    a = D2dRegistrar(clean_map, Options(), dtype=jnp.float32,
                     scan_pad_multiple=1).register(local, Pose.identity())
    b = D2dRegistrar(clean_map, Options(), dtype=jnp.float32,
                     scan_pad_multiple=256).register(local, Pose.identity())
    np.testing.assert_allclose(a.pose.translation, b.pose.translation,
                               atol=1e-5)


def test_fused_d2d_rejects_too_fine_scan_voxels(world):
    from nonlinear_optimizer_for_slam_tpu.pipelines.fused_d2d import D2dRegistrar

    ndt_map, scan = world
    reg = D2dRegistrar(ndt_map, Options(), scan_voxel_resolution=0.1)
    with pytest.raises(ValueError, match="no valid scan voxel"):
        reg.register(scan, Pose.identity())
