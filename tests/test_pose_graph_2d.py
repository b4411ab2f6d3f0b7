"""SE(2) pose-graph optimizer tests (2D counterpart of the 80-pose
fixture; BASELINE config 4 asks for 2D and 3D graphs)."""

import jax.numpy as jnp
import numpy as np
import pytest

from nonlinear_optimizer_for_slam_tpu.core import Options
from nonlinear_optimizer_for_slam_tpu.solvers.pose_graph import (
    ConstraintType,
    PoseGraphOptimizer2D,
    se2_edge_residual,
)


def _wrap(a):
    return np.arctan2(np.sin(a), np.cos(a))


def _rel(a, b):
    """relative (dx, dy, dtheta) of b in a's frame."""
    c, s = np.cos(a[2]), np.sin(a[2])
    dp = b[:2] - a[:2]
    return np.array(
        [c * dp[0] + s * dp[1], -s * dp[0] + c * dp[1], _wrap(b[2] - a[2])]
    )


@pytest.fixture(scope="module")
def square_fixture():
    """40-pose square with heading, odometry + 2 loops (1 outlier)."""
    rng = np.random.default_rng(11)
    poses = []
    x = y = th = 0.0
    for side in range(4):
        for _ in range(10):
            poses.append(np.array([x, y, th]))
            x += 0.5 * np.cos(th)
            y += 0.5 * np.sin(th)
        th = _wrap(th + np.pi / 2)
    poses = np.stack(poses)

    noisy = poses.copy()
    noisy[1:, :2] += 0.05 * rng.normal(size=(39, 2))
    noisy[1:, 2] = _wrap(noisy[1:, 2] + 0.03 * rng.normal(size=39))

    constraints = [
        dict(a=i, b=i + 1, rel=_rel(poses[i], poses[i + 1]), loop=False)
        for i in range(39)
    ]
    constraints.append(dict(a=8, b=12, rel=_rel(poses[8], poses[12]), loop=True))
    constraints.append(dict(a=38, b=2, rel=np.zeros(3), loop=True))  # outlier
    return poses, noisy, constraints


def _build(fixture, **kwargs):
    poses, noisy, constraints = fixture
    opt = PoseGraphOptimizer2D(**kwargs)
    for i in range(len(noisy)):
        opt.set_pose(i, noisy[i])
    opt.set_pose_constant(0)
    for c in constraints:
        opt.set_constraint(
            c["a"], c["b"], c["rel"],
            ConstraintType.LOOP if c["loop"] else ConstraintType.ODOMETRY,
        )
    return opt


def test_se2_residual_zero_at_consistency():
    a = np.array([1.0, 2.0, 0.7])
    b = np.array([1.5, 2.6, 1.4])
    import jax.numpy as jnp

    r = np.asarray(se2_edge_residual(jnp.asarray(a), jnp.asarray(b), jnp.asarray(_rel(a, b))))
    np.testing.assert_allclose(r, 0.0, atol=1e-12)


def test_2d_solve_removes_noise(square_fixture):
    poses, noisy, _ = square_fixture
    opt = _build(square_fixture, switch_penalty=0.03)
    summary, switches = opt.solve()
    # gauge pose untouched
    np.testing.assert_allclose(opt.get_pose(0), noisy[0], atol=1e-12)
    err_before = max(np.linalg.norm(noisy[i][:2] - poses[i][:2]) for i in range(40))
    err_after = max(
        np.linalg.norm(opt.get_pose(i)[:2] - poses[i][:2]) for i in range(40)
    )
    assert err_after < 0.2 * err_before, (err_after, err_before)
    # inlier loop on, outlier off
    assert switches[0] > 0.5 and switches[1] < 0.1, switches


def test_2d_api_validation(square_fixture):
    opt = _build(square_fixture)
    with pytest.raises(ValueError):
        opt.set_constraint(1, 1, np.zeros(3))
    with pytest.raises(KeyError):
        opt.set_pose_constant(999)


def test_se2_analytic_jacobians_match_autodiff(rng):
    """Closed-form SE(2) edge Jacobians == per-edge jacfwd oracle."""
    import jax

    from nonlinear_optimizer_for_slam_tpu.solvers.pose_graph import (
        PoseGraph2DEdges,
        se2_edge_residual,
        se2_edge_residuals_and_jacobians,
    )

    P, E = 6, 10
    xyt = jnp.asarray(rng.normal(size=(P, 3)))
    ref = rng.integers(0, P, E)
    qry = (ref + 1 + rng.integers(0, P - 1, E)) % P
    edges = PoseGraph2DEdges(
        reference_indices=jnp.asarray(ref, jnp.int32),
        query_indices=jnp.asarray(qry, jnp.int32),
        relative_xyt=jnp.asarray(rng.normal(size=(E, 3))),
        is_loop=jnp.asarray((rng.uniform(size=E) < 0.5).astype(float)),
        mask=jnp.asarray((rng.uniform(size=E) < 0.9).astype(float)),
    )
    switches = jnp.asarray(rng.uniform(0.2, 1.0, E))
    penalty = 0.05

    r, J_ref, J_query, J_s = se2_edge_residuals_and_jacobians(
        xyt, switches, edges, penalty
    )

    def one(ref_xyt, query_xyt, rel, s_, loop, m):
        def res(a, b, sv):
            r3 = se2_edge_residual(a, b, rel)
            scaled = jnp.where(loop > 0, r3 * sv, r3)
            pen = jnp.where(loop > 0, (1.0 - sv) * penalty, 0.0)
            return jnp.concatenate([scaled, pen[None]]) * m

        rr = res(ref_xyt, query_xyt, s_)
        ja, jb, js = jax.jacfwd(res, argnums=(0, 1, 2))(ref_xyt, query_xyt, s_)
        return rr, ja, jb, js

    r_o, Ja_o, Jb_o, Js_o = jax.vmap(one)(
        xyt[edges.reference_indices],
        xyt[edges.query_indices],
        edges.relative_xyt,
        switches,
        edges.is_loop,
        edges.mask,
    )
    np.testing.assert_allclose(np.asarray(r), np.asarray(r_o), atol=1e-12)
    np.testing.assert_allclose(np.asarray(J_ref), np.asarray(Ja_o), atol=1e-12)
    np.testing.assert_allclose(np.asarray(J_query), np.asarray(Jb_o), atol=1e-12)
    np.testing.assert_allclose(np.asarray(J_s), np.asarray(Js_o), atol=1e-12)


def test_2d_robust_edge_loss(square_fixture):
    """Cauchy edge loss rejects a wild ODOMETRY-type outlier edge that a
    quadratic solve absorbs into the trajectory (SE(2) analog of the 3D
    robust-edge test)."""
    from nonlinear_optimizer_for_slam_tpu.core import CauchyLoss

    poses, _, _ = square_fixture

    def build(**kw):
        opt = _build(square_fixture, switch_penalty=0.03, **kw)
        opt.set_constraint(5, 25, np.array([40.0, -30.0, 1.5]))  # wild edge
        return opt

    def max_err(opt):
        return max(
            np.linalg.norm(opt.get_pose(i)[:2] - poses[i][:2])
            for i in range(len(poses))
        )

    quad = build()
    quad.solve()
    # scale 0.3: inlier residuals (~0.05 noise) stay in the quadratic
    # region while the outlier saturates; with a scale as large as the
    # inter-pose spacing the redescending landscape has cheaper partial-
    # compromise minima (everything saturates) — the classic robust-scale
    # tuning trade-off, demonstrated by the sweep in this test's history.
    robust = build(edge_loss=CauchyLoss(0.3))
    robust.solve()
    assert max_err(robust) < 0.2, max_err(robust)
    assert max_err(robust) < 0.01 * max_err(quad), (max_err(robust), max_err(quad))


def test_weighted_edges_and_covariance_fd_oracle():
    """SE(2) whitened edges + covariance() vs a finite-difference GN
    oracle built from an independent residual formulation."""
    rng = np.random.default_rng(4)
    n = 6
    xyt = np.stack(
        [np.array([k * 1.0, 0.2 * k, 0.1 * k]) for k in range(n)]
    )

    def rel(i, j):
        c, s = np.cos(xyt[i, 2]), np.sin(xyt[i, 2])
        d = xyt[j, :2] - xyt[i, :2]
        return np.array(
            [c * d[0] + s * d[1], -s * d[0] + c * d[1], xyt[j, 2] - xyt[i, 2]]
        )

    w3 = np.array([20.0, 20.0, 100.0])
    opt = PoseGraphOptimizer2D()
    for i in range(n):
        opt.set_pose(i, xyt[i])
    opt.set_pose_constant(0)
    for k in range(1, n):
        opt.set_constraint(k - 1, k, rel(k - 1, k), ConstraintType.ODOMETRY,
                           sqrt_info=(20.0, 100.0))
    cov = opt.covariance()

    # FD oracle
    def residuals(x):
        p = xyt.copy()
        p[1:] += x.reshape(n - 1, 3)
        out = []
        for k in range(1, n):
            c, s = np.cos(p[k - 1, 2]), np.sin(p[k - 1, 2])
            d = p[k, :2] - p[k - 1, :2]
            m = rel(k - 1, k)
            r = np.array(
                [
                    c * d[0] + s * d[1] - m[0],
                    -s * d[0] + c * d[1] - m[1],
                    p[k, 2] - p[k - 1, 2] - m[2],
                ]
            )
            out.append(w3 * r)
        return np.concatenate(out)

    dim = 3 * (n - 1)
    h = 1e-6
    J = np.zeros((3 * (n - 1), dim))
    for c_ in range(dim):
        e = np.zeros(dim)
        e[c_] = h
        J[:, c_] = (residuals(e) - residuals(-e)) / (2 * h)
    Sigma = np.linalg.inv(J.T @ J)
    for k in range(1, n):
        blk = Sigma[3 * (k - 1) : 3 * k, 3 * (k - 1) : 3 * k]
        np.testing.assert_allclose(cov[k], blk, rtol=1e-5, atol=1e-10,
                                   err_msg=f"pose {k}")
    np.testing.assert_allclose(cov[0], np.zeros((3, 3)), atol=1e-12)
    # single step: sigma_x = 1/20
    np.testing.assert_allclose(np.sqrt(cov[1][0, 0]), 1 / 20.0, rtol=1e-6)


def test_weighted_solve_weighted_mean_2d():
    opt = PoseGraphOptimizer2D()
    opt.set_pose(0, np.zeros(3))
    opt.set_pose(1, np.array([1.0, 0.0, 0.0]))
    opt.set_pose_constant(0)
    w1, w2 = 3.0, 1.0
    opt.set_constraint(0, 1, np.array([1.0, 0, 0]), ConstraintType.ODOMETRY, sqrt_info=w1)
    opt.set_constraint(0, 1, np.array([2.0, 0, 0]), ConstraintType.ODOMETRY, sqrt_info=w2)
    opt.solve()
    expect = (w1**2 + 2.0 * w2**2) / (w1**2 + w2**2)
    np.testing.assert_allclose(opt.get_pose(1), [expect, 0, 0], atol=1e-6)


def test_2d_cg_matches_dense(square_fixture):
    """SE(2) matrix-free CG path == dense path on the 40-pose fixture
    (planted outlier included), chain and jacobi preconditioners both."""
    dense = _build(square_fixture, switch_penalty=0.03)
    s_d, sw_d = dense.solve()
    for precond in ("chain", "jacobi"):
        cg = _build(
            square_fixture, switch_penalty=0.03, solver="cg",
            cg_iterations=200, cg_precond=precond,
        )
        s_c, sw_c = cg.solve()
        for i in range(40):
            np.testing.assert_allclose(
                cg.get_pose(i), dense.get_pose(i), atol=5e-4
            )
        np.testing.assert_allclose(sw_c, sw_d, atol=5e-3)
        assert sw_c[-1] < 0.1  # outlier off in the CG path too


def test_2d_cg_scales_to_city_graph():
    """10,000-pose 2D random-walk city graph: dense would need a
    30,003^2 normal matrix (~7 GB f64); the CG path solves in O(E)
    memory. Chain preconditioner on a chain-dominated graph: few CG
    iterations suffice for an accurate reconstruction."""
    rng = np.random.default_rng(7)
    P = 10000
    th = np.cumsum(rng.normal(0, 0.05, P))
    step = np.stack([np.cos(th), np.sin(th)], axis=1) * 0.5
    true = np.zeros((P, 3))
    true[:, 2] = th
    true[1:, :2] = np.cumsum(step[:-1], axis=0)
    noisy = true.copy()
    noisy[1:, :2] += 0.05 * rng.normal(size=(P - 1, 2))
    noisy[1:, 2] = _wrap(noisy[1:, 2] + 0.01 * rng.normal(size=P - 1))
    opt = PoseGraphOptimizer2D(
        solver="cg", cg_iterations=30, switch_penalty=0.03
    )
    for i in range(P):
        opt.set_pose(i, noisy[i])
    opt.set_pose_constant(0)
    for i in range(P - 1):
        opt.set_constraint(i, i + 1, _rel(true[i], true[i + 1]))
    for a, b in [(0, P // 2), (P // 4, 3 * P // 4), (17, P - 17)]:
        opt.set_constraint(a, b, _rel(true[a], true[b]), ConstraintType.LOOP)
    summary, _ = opt.solve(Options().replace(max_iterations=30))
    err = max(
        np.linalg.norm(opt.get_pose(i)[:2] - true[i, :2])
        for i in range(0, P, 13)
    )
    assert err < 0.05, err


def test_manhattan_world_g2o_roundtrip_and_solve(tmp_path):
    """Manhattan-world fixture (the M3500 construction at 400-pose test
    scale, utils/testing.generate_manhattan_g2o): bounded-arena grid
    walk, dense loop closures, dead-reckoned drifted init. Through the
    g2o file path + chordal init + CG, the drift must collapse by an
    order of magnitude. benchmarks/run_all.py runs the same construction
    at full 3,500-pose scale."""
    import jax.numpy as jnp

    from nonlinear_optimizer_for_slam_tpu.io import g2o as g2o_io
    from nonlinear_optimizer_for_slam_tpu.utils import testing

    g, gt = testing.generate_manhattan_g2o(n_poses=400, seed=3)
    n_loops = sum(1 for e in g.edges if e.j - e.i >= 20)
    assert n_loops > 50  # the bounded arena is what makes closures dense

    path = str(tmp_path / "manhattan.g2o")
    g2o_io.write_g2o(path, g)
    opt = g2o_io.load_pose_graph(
        path, dtype=jnp.float64, solver="cg", cg_iterations=100,
        cg_precond="chain",
    )
    init_err = max(
        np.linalg.norm(g.vertices[k][:2] - gt[k, :2]) for k in g.vertices
    )
    opt.initialize(method="chordal")
    summary, _ = opt.solve(Options().replace(max_iterations=80))
    err = max(
        np.linalg.norm(np.asarray(opt.get_pose(k))[:2] - gt[k, :2])
        for k in range(len(gt))
    )
    mean_err = np.mean(
        [
            np.linalg.norm(np.asarray(opt.get_pose(k))[:2] - gt[k, :2])
            for k in range(len(gt))
        ]
    )
    assert init_err > 1.0, init_err  # the fixture genuinely drifts
    # the Olson-density 10x10 arena makes the posterior tight (revisit
    # density is what bounds absolute error vs ground truth — see the
    # generator docstring for the measured wide-arena counterexample)
    assert err < 0.15 * init_err, (err, init_err)
    assert mean_err < 0.1, mean_err
    assert np.isfinite(float(summary.final_cost))


def test_banded_2d_matches_dense():
    """SE(2) banded direct solver (RCM + superblock cyclic reduction):
    identical LM trajectory to the dense path on the Manhattan fixture —
    exact steps, same final poses/switches/cost, loops landing inside
    the band. Parametrized over plain and robust (Huber) edges."""
    import jax.numpy as jnp

    from nonlinear_optimizer_for_slam_tpu.core.losses import HuberLoss
    from nonlinear_optimizer_for_slam_tpu.utils import testing

    g, gt = testing.generate_manhattan_g2o(n_poses=150, seed=5)

    def build(**kw):
        opt = PoseGraphOptimizer2D(
            dtype=jnp.float64, switch_penalty=0.03, **kw
        )
        for k in sorted(g.vertices):
            opt.set_pose(k, g.vertices[k])
        opt.set_pose_constant(0)
        for e in g.edges:
            opt.set_constraint(
                e.i, e.j, e.measurement,
                ConstraintType.LOOP if e.j - e.i >= 20 else ConstraintType.ODOMETRY,
                sqrt_info=np.sqrt(np.diag(e.information)),
            )
        return opt

    opts = Options().replace(max_iterations=60)
    for loss in (None, HuberLoss(1.0)):
        dense = build(edge_loss=loss)
        s_d, sw_d = dense.solve(opts)
        banded = build(solver="banded", edge_loss=loss)
        s_b, sw_b = banded.solve(opts)
        assert float(s_b.final_cost) == pytest.approx(
            float(s_d.final_cost), rel=1e-8
        )
        np.testing.assert_allclose(sw_b, sw_d, atol=1e-6)
        for k in range(len(gt)):
            np.testing.assert_allclose(
                np.asarray(banded.get_pose(k)),
                np.asarray(dense.get_pose(k)),
                atol=1e-6,
            )
