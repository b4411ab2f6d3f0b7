"""Sharded-vs-unsharded parity on the virtual 8-device CPU mesh.

The TPU translation of the reference's 2-thread executor test
(mahalanobis tests/simple_optimization_test.cc:109-113): the same solve,
fanned out over a device mesh with psum reduction, must agree with the
single-device evaluation to float tolerance (SURVEY section 4,
"multi-node testing").
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import nonlinear_optimizer_for_slam_tpu as nls
from nonlinear_optimizer_for_slam_tpu.core import ExponentialLoss, Options
from nonlinear_optimizer_for_slam_tpu.ops import mahalanobis
from nonlinear_optimizer_for_slam_tpu.parallel import make_factor_mesh
from nonlinear_optimizer_for_slam_tpu.parallel.sharded import sharded_quadratic


@pytest.fixture(scope="module")
def mesh():
    assert len(jax.devices()) == 8, "conftest must provide 8 virtual devices"
    return make_factor_mesh()


def _synthetic_data(rng, n, dtype=jnp.float32):
    S = rng.normal(size=(n, 3, 3))
    return mahalanobis.MahalanobisData(
        points=jnp.asarray(rng.uniform(-3, 3, size=(n, 3)), dtype),
        means=jnp.asarray(rng.uniform(-3, 3, size=(n, 3)), dtype),
        sqrt_infos=jnp.asarray(S, dtype),
        mask=jnp.ones((n,), dtype),
    )


def test_sharded_quadratic_matches_local(rng, mesh):
    n = 8 * 64
    data = _synthetic_data(rng, n, jnp.float64)
    loss = ExponentialLoss()
    R = jnp.eye(3, dtype=jnp.float64)
    t = jnp.asarray([0.1, -0.2, 0.05], jnp.float64)

    H1, g1, c1 = mahalanobis.eval_quadratic(R, t, data, loss)

    fn = sharded_quadratic(
        lambda d, R_, t_: mahalanobis.eval_quadratic(R_, t_, d, loss), mesh
    )
    H2, g2, c2 = fn(data, R, t)

    np.testing.assert_allclose(np.asarray(H1), np.asarray(H2), rtol=1e-12)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2), rtol=1e-12)
    np.testing.assert_allclose(float(c1), float(c2), rtol=1e-12)


def test_sharded_full_solve_matches_unsharded(rng, mesh):
    """The whole LM while_loop runs INSIDE shard_map; final pose and cost
    must match the unsharded solve bit-for-bit at f64."""
    n = 8 * 128
    data_np = {
        "points": rng.uniform(-3, 3, size=(n, 3)),
        "means": rng.uniform(-3, 3, size=(n, 3)),
        "sqrt_infos": rng.normal(size=(n, 3, 3)),
    }
    # make the problem consistent: means near warped points so LM converges
    true_pose = nls.Pose.from_axis_angle(0.08, [0, 0, 1.0], [-0.15, 0.1, 0.2])
    data_np["means"] = true_pose.apply(data_np["points"])

    def build(dtype):
        return mahalanobis.MahalanobisData(
            points=jnp.asarray(data_np["points"], dtype),
            means=jnp.asarray(data_np["means"], dtype),
            sqrt_infos=jnp.asarray(data_np["sqrt_infos"], dtype),
            mask=jnp.ones((n,), dtype),
        )

    opts = Options()
    loss = ExponentialLoss()

    m_local = nls.MahalanobisDistanceMinimizer(dtype=jnp.float64, pad_multiple=8)
    m_local.set_loss_function(loss)
    pose_l, sum_l = m_local.solve(opts, build(jnp.float64), nls.Pose.identity())

    m_shard = nls.MahalanobisDistanceMinimizer(
        dtype=jnp.float64, pad_multiple=8, mesh=mesh
    )
    m_shard.set_loss_function(loss)
    pose_s, sum_s = m_shard.solve(opts, build(jnp.float64), nls.Pose.identity())

    np.testing.assert_allclose(pose_l.translation, pose_s.translation, atol=1e-10)
    np.testing.assert_allclose(pose_l.rotation, pose_s.rotation, atol=1e-10)
    np.testing.assert_allclose(
        float(sum_l.final_cost), float(sum_s.final_cost), rtol=1e-10
    )
    assert int(sum_l.iterations) == int(sum_s.iterations)
    # estimated pose is near truth
    np.testing.assert_allclose(pose_s.translation, true_pose.translation, atol=1e-4)


def test_mesh_padding_multiple(mesh):
    m = nls.MahalanobisDistanceMinimizer(pad_multiple=4, mesh=mesh)
    assert m._pad(5) == 32  # 4 * 8 devices


def test_sharded_pose_graph_cg_matches_unsharded(mesh):
    """PoseGraphOptimizer(mesh=...): edges sharded over the factor axis
    with every reduction psum'd must reproduce the single-device CG
    solve (iteration-for-iteration — the LM/CG state is replicated) on
    the 80-pose reference fixture, planted outlier included."""
    from nonlinear_optimizer_for_slam_tpu.solvers.pose_graph import (
        ConstraintType,
        PoseGraphOptimizer,
    )
    from nonlinear_optimizer_for_slam_tpu.utils import testing

    _, noisy, constraints = testing.generate_pose_graph_fixture()

    def build(**kw):
        o = PoseGraphOptimizer(switch_penalty=0.03, solver="cg", **kw)
        for i, p in enumerate(noisy):
            o.set_pose(i, p)
        o.set_pose_constant(0)
        for c in constraints:
            o.set_constraint(
                c["reference_index"], c["query_index"], c["relative_pose"],
                ConstraintType.LOOP if c["is_loop"] else ConstraintType.ODOMETRY,
            )
        return o

    local = build()
    shard = build(mesh=mesh)
    s_l, sw_l = local.solve()
    s_s, sw_s = shard.solve()
    assert int(s_l.iterations) == int(s_s.iterations)
    np.testing.assert_allclose(
        float(s_s.final_cost), float(s_l.final_cost), rtol=1e-9
    )
    for i in range(80):
        np.testing.assert_allclose(
            shard.get_pose(i).translation, local.get_pose(i).translation,
            atol=1e-7,
        )
    np.testing.assert_allclose(sw_s, sw_l, atol=1e-8)
    # the planted outlier switches off in both
    assert sw_s[-1] < 0.1

    # mesh + non-cg solver is rejected
    with pytest.raises(ValueError, match="mesh"):
        PoseGraphOptimizer(solver="dense", mesh=mesh)
