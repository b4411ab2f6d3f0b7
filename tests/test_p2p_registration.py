"""Point-to-plane ICP registration (the reference's TBD module as a full
pipeline: README lists point-to-plane as TBD; the factor only exists in its
unbuilt generic module, pose_optimizer/cost_functors.h:106-157)."""

import jax.numpy as jnp
import numpy as np
import pytest

from nonlinear_optimizer_for_slam_tpu.core import ExponentialLoss, Options
from nonlinear_optimizer_for_slam_tpu.core.pose import Pose
from nonlinear_optimizer_for_slam_tpu.pipelines import matching, ndt, registration
from nonlinear_optimizer_for_slam_tpu.solvers.minimizers import PointToPlaneMinimizer
from nonlinear_optimizer_for_slam_tpu.utils import testing


@pytest.fixture(scope="module")
def world():
    pts = testing.generate_room_points(point_step=0.05)
    # Unquirked build: point-to-plane needs unbiased covariances so plane
    # thickness discriminates single-plane voxels from corner mixtures
    # (see ndt.build_ndt_map / ndt.voxel_normals docstrings).
    ndt_map = ndt.build_ndt_map(pts, 1.0, identity_moment=False)
    scan = ndt.filter_points(pts, 0.2)
    return ndt_map, scan


def test_voxel_normals_room_geometry(world):
    """Thin voxels of the room are single planes with axis-aligned normals."""
    ndt_map, _ = world
    valid = ndt_map.valid_only()
    normals, flatness, thickness = ndt.voxel_normals(valid)

    np.testing.assert_allclose(np.linalg.norm(normals, axis=1), 1.0, atol=1e-12)

    # The room is floor + 4 axis-aligned walls: every voxel that passes
    # the flatness+thickness plane test holds a SINGLE plane, so its
    # normal is one of +-x, +-y, +-z exactly. Corner/boundary voxels mix
    # two planes and carry decimeter thickness — the gate must drop them.
    planar = (flatness <= 0.2) & (thickness <= 0.05)
    assert planar.sum() >= 50  # plenty of single-plane voxels survive
    axis_dev = np.min(1.0 - np.abs(normals[planar]), axis=-1)
    assert np.max(axis_dev) < 1e-6

    # All three axis directions are represented (full 6-DoF constraint).
    axes = np.argmax(np.abs(normals[planar]), axis=1)
    assert set(axes.tolist()) == {0, 1, 2}

    # Flatness is bounded below by the builder's eigenvalue flooring.
    assert np.min(flatness) >= ndt.MIN_EIGENVALUE_RATIO - 1e-12


def test_voxel_normals_eigvec_convention():
    """The normal is V's COLUMN 0 recovered from the row-scaled quirk
    S = D^{-1/2} V (reference simple_optimization_test.cc:275-276), not a
    row of S — on an exactly planar voxel with degenerate top eigenvalues
    the row reading gives arbitrary tilted directions."""
    rng = np.random.default_rng(3)
    pts = np.c_[rng.uniform(0, 1, (200, 2)), np.zeros(200)]  # z = 0 plane
    m = ndt.build_ndt_map(pts, 1.0, identity_moment=False)
    normals, flatness, thickness = ndt.voxel_normals(m)
    np.testing.assert_allclose(np.abs(normals[0]), [0.0, 0.0, 1.0], atol=1e-9)
    assert thickness[0] < 0.06  # floored, tiny
    # and the quirked build pads thickness by ~sqrt(1/count)
    mq = ndt.build_ndt_map(pts, 1.0, identity_moment=True)
    _, _, tq = ndt.voxel_normals(mq)
    assert tq[0] > thickness[0]


def test_match_point_to_plane_shapes_and_gating(world):
    ndt_map, scan = world
    valid = ndt_map.valid_only()
    normals, flatness, thickness = ndt.voxel_normals(valid)
    weights = ((flatness <= 0.2) & (thickness <= 0.05)).astype(np.float64)

    pts = jnp.asarray(scan[:500])
    data = matching.match_point_to_plane(
        jnp.asarray(valid.means),
        jnp.asarray(normals),
        jnp.asarray(weights),
        pts,
        jnp.ones(500),
        jnp.eye(3),
        jnp.zeros(3),
        search_radius=1.0,
    )
    # one plane per point, not N * k rows
    assert data.points.shape == (500, 3)
    assert data.normals.shape == (500, 3)
    matched = float(jnp.sum(data.mask))
    assert 300 < matched <= 500

    # identity pose on a scan drawn from the map: every surviving match is
    # already ON its plane (this is what min-plane-distance selection plus
    # trimming guarantees; nearest-mean matching violates it near corners)
    r = jnp.sum(data.normals * (data.points - data.means), axis=-1)
    assert float(jnp.max(jnp.abs(r * data.mask))) < 0.05

    # all-zero weights must kill every match
    data0 = matching.match_point_to_plane(
        jnp.asarray(valid.means),
        jnp.asarray(normals),
        jnp.zeros_like(jnp.asarray(weights)),
        pts,
        jnp.ones(500),
        jnp.eye(3),
        jnp.zeros(3),
    )
    assert float(jnp.sum(data0.mask)) == 0.0


def test_register_point_to_plane_recovers_pose(world):
    """Perturbed scan registers back to truth via point-to-plane ICP."""
    ndt_map, scan = world
    true_pose = testing.maha_true_pose()
    local = true_pose.inverse().apply(scan)

    minimizer = PointToPlaneMinimizer(dtype=jnp.float32).set_loss_function(
        ExponentialLoss()
    )
    result = registration.register_point_to_plane(
        ndt_map, local, Pose.identity(), minimizer, Options(), max_thickness=0.05
    )

    t_err = np.linalg.norm(result.pose.translation - true_pose.translation)
    q_est = result.pose.quaternion()
    q_true = true_pose.quaternion()
    q_err = min(np.linalg.norm(q_est - q_true), np.linalg.norm(q_est + q_true))
    assert t_err < 5e-3, t_err
    assert q_err < 2e-3, q_err
    assert result.outer_iterations < 10


def test_register_point_to_plane_quirked_map_still_converges(world):
    """On the reference-parity (quirked) map build, thickness gating is
    unavailable and corner voxels keep tilted normals; the pipeline still
    lands within a couple of centimeters — documented degradation, which
    is why register_point_to_plane recommends identity_moment=False."""
    pts = testing.generate_room_points(point_step=0.05)
    quirked = ndt.build_ndt_map(pts, 1.0)  # default: reference parity
    scan = ndt.filter_points(pts, 0.2)
    true_pose = testing.maha_true_pose()
    local = true_pose.inverse().apply(scan)

    minimizer = PointToPlaneMinimizer(dtype=jnp.float32).set_loss_function(
        ExponentialLoss()
    )
    result = registration.register_point_to_plane(
        quirked, local, Pose.identity(), minimizer, Options()
    )
    t_err = np.linalg.norm(result.pose.translation - true_pose.translation)
    assert t_err < 0.03, t_err


def test_fused_p2p_matches_host_loop(world):
    """Single-dispatch fused p2p ICP lands on the same pose as the
    host-loop pipeline (same objective, same gates)."""
    from nonlinear_optimizer_for_slam_tpu.pipelines import fused_registration

    ndt_map, scan = world
    true_pose = testing.maha_true_pose()
    local = true_pose.inverse().apply(scan)

    reg = fused_registration.NdtRegistrar(
        ndt_map,
        Options(),
        ExponentialLoss(),
        objective="p2p",
        max_thickness=0.05,
    )
    fused = reg.register(local, Pose.identity())

    minimizer = PointToPlaneMinimizer(dtype=jnp.float32).set_loss_function(
        ExponentialLoss()
    )
    host = registration.register_point_to_plane(
        ndt_map, local, Pose.identity(), minimizer, Options(),
        max_thickness=0.05,
    )
    np.testing.assert_allclose(
        fused.pose.translation, host.pose.translation, atol=2e-3
    )
    t_err = np.linalg.norm(fused.pose.translation - true_pose.translation)
    assert t_err < 5e-3, t_err

    # batched serving path (vmapped machine, jnp eval) matches serial
    batch = reg.register_batch(
        [local, local], [Pose.identity(), Pose.identity()]
    )
    for b in batch:
        np.testing.assert_allclose(
            b.pose.translation, fused.pose.translation, atol=2e-3
        )


def test_fused_p2p_sharded_matches_unsharded(world):
    from nonlinear_optimizer_for_slam_tpu.parallel.mesh import make_factor_mesh
    from nonlinear_optimizer_for_slam_tpu.pipelines import fused_registration

    ndt_map, scan = world
    true_pose = testing.maha_true_pose()
    local = true_pose.inverse().apply(scan)

    kw = dict(objective="p2p", max_thickness=0.05)
    serial = fused_registration.NdtRegistrar(
        ndt_map, Options(), ExponentialLoss(), **kw
    ).register(local, Pose.identity())
    sharded = fused_registration.NdtRegistrar(
        ndt_map, Options(), ExponentialLoss(), mesh=make_factor_mesh(), **kw
    ).register(local, Pose.identity())
    np.testing.assert_allclose(
        sharded.pose.translation, serial.pose.translation, atol=1e-4
    )
    t_err = np.linalg.norm(sharded.pose.translation - true_pose.translation)
    assert t_err < 5e-3, t_err


def test_fused_p2p_rejects_planar_mode(world):
    from nonlinear_optimizer_for_slam_tpu.pipelines import fused_registration

    ndt_map, _ = world
    with pytest.raises(NotImplementedError, match="mahalanobis-only"):
        fused_registration.NdtRegistrar(
            ndt_map, Options(), ExponentialLoss(), objective="p2p", planar=True
        )
