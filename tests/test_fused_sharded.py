"""Fused registration: planar mode and multi-chip (shard_map) parity.

Sharded parity mirrors the reference's 2-thread executor check
(tests/simple_optimization_test.cc:109-113): the same fused ICP program,
fanned over the 8-device CPU mesh with psum'd quadratics, must agree with
the single-device run. Convergence-to-truth is NOT required here (small
worlds + truncated iterations keep interpret-mode pallas fast); output
parity is the criterion.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import nonlinear_optimizer_for_slam_tpu as nls
from nonlinear_optimizer_for_slam_tpu.core import ExponentialLoss, Options
from nonlinear_optimizer_for_slam_tpu.parallel import make_factor_mesh
from nonlinear_optimizer_for_slam_tpu.pipelines import fused_registration, ndt
from nonlinear_optimizer_for_slam_tpu.utils import testing


@pytest.fixture(scope="module")
def small_world():
    pts = testing.generate_room_points(point_step=0.05)
    ndt_map = ndt.build_ndt_map(pts, 1.0)
    true_pose = testing.maha_true_pose()
    local = true_pose.inverse().apply(ndt.filter_points(pts, 0.3))
    return ndt_map, local, true_pose


def _short_options():
    return Options().replace(max_iterations=8)


def test_planar_fused_runs(small_world):
    ndt_map, local, true_pose = small_world
    registrar = fused_registration.NdtRegistrar(
        ndt_map, _short_options(), ExponentialLoss(), planar=True,
        max_outer_iterations=3,
    )
    res = registrar.register(local, nls.Pose.identity())
    # planar solver must keep z / roll / pitch frozen
    assert res.pose.translation[2] == 0.0
    R = res.pose.rotation
    np.testing.assert_allclose(R[2, 2], 1.0, atol=1e-7)
    np.testing.assert_allclose(R[:2, 2], 0.0, atol=1e-7)
    assert np.isfinite(res.final_cost)


def test_sharded_fused_matches_single_device(small_world):
    assert len(jax.devices()) == 8
    ndt_map, local, _ = small_world
    opts = _short_options()
    loss = ExponentialLoss()

    single = fused_registration.NdtRegistrar(
        ndt_map, opts, loss, max_outer_iterations=2
    ).register(local, nls.Pose.identity())

    mesh = make_factor_mesh()
    sharded = fused_registration.NdtRegistrar(
        ndt_map, opts, loss, max_outer_iterations=2, mesh=mesh
    ).register(local, nls.Pose.identity())

    np.testing.assert_allclose(
        sharded.pose.translation, single.pose.translation, atol=1e-4
    )
    np.testing.assert_allclose(
        sharded.pose.rotation, single.pose.rotation, atol=1e-4
    )
    assert sharded.outer_iterations == single.outer_iterations


def test_registrar_information_matches_minimizer():
    """NdtRegistrar.information == the minimizer-level information on the
    same matched data, identical with a bucket-padded map (padding voxels
    must not leak into the matching)."""
    import jax.numpy as jnp
    import numpy as np

    from nonlinear_optimizer_for_slam_tpu.core import ExponentialLoss, Options
    from nonlinear_optimizer_for_slam_tpu.core.pose import Pose
    from nonlinear_optimizer_for_slam_tpu.pipelines import (
        fused_registration,
        matching,
        ndt,
    )
    from nonlinear_optimizer_for_slam_tpu.solvers.minimizers import (
        MahalanobisDistanceMinimizer,
    )
    from nonlinear_optimizer_for_slam_tpu.utils import testing

    pts = testing.generate_room_points(point_step=0.05)
    m = ndt.build_ndt_map(pts, 1.0)
    scan = ndt.filter_points(pts, 0.2)
    true_pose = testing.maha_true_pose()
    local = true_pose.inverse().apply(scan)

    reg = fused_registration.NdtRegistrar(m, Options(), ExponentialLoss())
    res = reg.register(local, Pose.identity())
    H = reg.information(local, res.pose)
    assert H.shape == (6, 6)
    np.linalg.cholesky(H)  # SPD

    # oracle: explicit matching + minimizer.information
    valid = m.valid_only()
    data = matching.match_point_cloud(
        jnp.asarray(valid.means, jnp.float32),
        jnp.asarray(valid.sqrt_informations, jnp.float32),
        jnp.asarray(local, jnp.float32),
        jnp.ones(local.shape[0], jnp.float32),
        jnp.asarray(res.pose.rotation, jnp.float32),
        jnp.asarray(res.pose.translation, jnp.float32),
    )
    mini = MahalanobisDistanceMinimizer().set_loss_function(ExponentialLoss())
    H2 = mini.information(data, res.pose)
    np.testing.assert_allclose(H, H2, rtol=1e-6)

    # bucket-padded map: identical information (padding can't match)
    reg_p = fused_registration.NdtRegistrar(
        m, Options(), ExponentialLoss(), map_pad_multiple=64
    )
    H3 = reg_p.information(local, res.pose)
    np.testing.assert_allclose(H3, H, rtol=1e-6)
