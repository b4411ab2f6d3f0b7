"""Pose-graph optimizer tests on the reference's 80-pose fixture.

Fixture: rectangle trajectory, 79 odometry edges + 4 loop closures, the
last loop a deliberate identity-pose outlier
(reference: pose_graph_optimizer/tests/simple_optimization_test.cc:19-122).

Oracle: scipy.optimize.least_squares on the identical residual stack (the
independent "Ceres" here), plus the physical checks the reference eyeballs:
noise removed, outlier loop switched off, gauge pose untouched.
"""

import jax.numpy as jnp
import numpy as np
import pytest

import nonlinear_optimizer_for_slam_tpu as nls
from nonlinear_optimizer_for_slam_tpu.core import Options
from nonlinear_optimizer_for_slam_tpu.solvers.pose_graph import (
    ConstraintType,
    PoseGraphOptimizer,
)
from nonlinear_optimizer_for_slam_tpu.utils import testing


@pytest.fixture(scope="module")
def fixture():
    return testing.generate_pose_graph_fixture()


def _build(fixture, **kwargs):
    true_poses, noisy_poses, constraints = fixture
    opt = PoseGraphOptimizer(**kwargs)
    for i, p in enumerate(noisy_poses):
        opt.set_pose(i, p)
    opt.set_pose_constant(0)  # gauge (reference test :91)
    for c in constraints:
        opt.set_constraint(
            c["reference_index"],
            c["query_index"],
            c["relative_pose"],
            ConstraintType.LOOP if c["is_loop"] else ConstraintType.ODOMETRY,
        )
    return opt


def test_api_validation(fixture):
    opt = _build(fixture)
    assert opt.num_poses == 80
    assert opt.num_constraints == 83
    with pytest.raises(ValueError):
        opt.set_constraint(3, 3, nls.Pose.identity())
    with pytest.raises(KeyError):
        opt.set_constraint(0, 999, nls.Pose.identity())
    with pytest.raises(KeyError):
        opt.set_pose_constant(999)


def test_solve_removes_noise(fixture):
    true_poses, noisy_poses, _ = fixture
    opt = _build(fixture)
    summary, switches = opt.solve()

    # gauge pose untouched
    np.testing.assert_allclose(
        opt.get_pose(0).translation, noisy_poses[0].translation, atol=1e-12
    )

    err_before = max(
        np.linalg.norm(noisy_poses[i].translation - true_poses[i].translation)
        for i in range(80)
    )
    err_after = max(
        np.linalg.norm(opt.get_pose(i).translation - true_poses[i].translation)
        for i in range(80)
    )
    assert err_before > 0.05  # the fixture injects 0.08 noise
    assert err_after < 0.01, f"max error after solve: {err_after}"

    # quaternions renormalized on write-back
    for i in range(80):
        q = opt.get_pose(i).quaternion()
        np.testing.assert_allclose(np.linalg.norm(q), 1.0, atol=1e-9)


def test_outlier_loop_switched_off(fixture):
    """With a discriminating switch prior, the deliberate identity-pose
    outlier loop (77 -> 2) switches off while genuine loops stay on.

    The penalty weight is the classic switchable-constraints trade-off
    (Suenderhauf's Xi): too weak (the reference's 1e-9 default,
    ceres_cost_functor.h:97 — its own comment admits the problem) and even
    inlier switches collapse; too strong (>= 0.1 here) and the optimizer
    prefers dragging the trajectory to satisfy the outlier over paying the
    switch-off penalty. 0.03 sits below the outlier's residual scale and
    above the inlier noise floor for this fixture."""
    opt = _build(fixture, switch_penalty=0.03)
    _, switches = opt.solve()
    assert switches.shape == (4,)
    # order of loop slots follows constraint insertion: (18,21), (38,42),
    # (57,61), (77,2)-outlier
    assert np.all(np.abs(switches[:3]) > 0.5), switches
    assert np.abs(switches[3]) < 0.1, switches


def test_matches_scipy_oracle(fixture):
    """Final cost parity with scipy.optimize.least_squares (lm) on the
    identical ambient-coordinate residual stack."""
    from scipy.optimize import least_squares

    from nonlinear_optimizer_for_slam_tpu.ops.relative_pose import (
        PoseGraphEdges,
        edge_residuals,
    )

    true_poses, noisy_poses, constraints = fixture
    opt = _build(fixture)
    summary, switches = opt.solve()

    indices = list(range(80))
    ref_idx = np.array([c["reference_index"] for c in constraints], np.int32)
    query_idx = np.array([c["query_index"] for c in constraints], np.int32)
    rel_t = np.stack([c["relative_pose"].translation for c in constraints])
    rel_q = np.stack([c["relative_pose"].quaternion() for c in constraints])
    is_loop = np.array([1.0 if c["is_loop"] else 0.0 for c in constraints])
    edges = PoseGraphEdges(
        jnp.asarray(ref_idx),
        jnp.asarray(query_idx),
        jnp.asarray(rel_t),
        jnp.asarray(rel_q),
        jnp.asarray(is_loop),
        jnp.ones(83),
    )
    loop_slot = np.cumsum(is_loop.astype(int)) - 1

    x0 = np.concatenate(
        [
            np.stack([p.translation for p in noisy_poses]).ravel(),
            np.stack([p.quaternion() for p in noisy_poses]).ravel(),
            np.ones(4),
        ]
    )
    free = np.ones_like(x0, dtype=bool)
    free[:3] = False  # pose 0 position
    free[240:244] = False  # pose 0 quaternion

    def residual(x_free):
        x = x0.copy()
        x[free] = x_free
        pos = x[:240].reshape(80, 3)
        quat = x[240:560].reshape(80, 4)
        sw = x[560:]
        sw_full = sw[loop_slot]
        r = edge_residuals(
            jnp.asarray(pos), jnp.asarray(quat), jnp.asarray(sw_full), edges
        )
        return np.asarray(r).ravel()

    res = least_squares(residual, x0[free], method="lm", xtol=1e-12, ftol=1e-12)
    scipy_cost = float(np.sum(res.fun**2))
    ours = float(summary.final_cost)
    # both land at the zero floor; scipy grinds to ~1e-18 while our LM
    # stops at its 1e-6 gradient tolerance (~1e-9 cost) — compare with an
    # absolute slack at the floor
    assert ours <= max(scipy_cost * 1.05, 1e-8), (ours, scipy_cost)


def test_cg_solver_matches_dense(fixture):
    """Matrix-free CG path lands on the same solution as the dense path
    on the 80-pose fixture (CG truncation tolerance)."""
    opt_d = _build(fixture, switch_penalty=0.03)
    opt_c = _build(fixture, switch_penalty=0.03, solver="cg")
    s_d, sw_d = opt_d.solve()
    s_c, sw_c = opt_c.solve()
    for i in range(80):
        np.testing.assert_allclose(
            opt_c.get_pose(i).translation, opt_d.get_pose(i).translation, atol=5e-4
        )
    np.testing.assert_allclose(sw_c, sw_d, atol=5e-3)


def test_cg_solver_scales_to_large_graph():
    """2,000-pose chain + loops: the dense path would need a 14,008^2
    normal matrix (~1.5 GB at f64); CG solves in O(E) memory."""
    rng = np.random.default_rng(2)
    P = 2000
    true_pos = np.cumsum(0.2 * rng.normal(size=(P, 3)), axis=0)
    noisy_pos = true_pos + np.where(
        np.arange(P)[:, None] > 0, 0.05 * rng.normal(size=(P, 3)), 0.0
    )
    opt = PoseGraphOptimizer(solver="cg", cg_iterations=150, switch_penalty=0.03)
    for i in range(P):
        opt.set_pose(i, nls.Pose(np.eye(3), noisy_pos[i]))
    opt.set_pose_constant(0)
    for i in range(P - 1):
        rel = nls.Pose(np.eye(3), true_pos[i + 1] - true_pos[i])
        opt.set_constraint(i, i + 1, rel)
    # a few long-range loops pin the drift down
    for a, b in [(0, P // 2), (P // 4, 3 * P // 4), (10, P - 10)]:
        rel = nls.Pose(np.eye(3), true_pos[b] - true_pos[a])
        opt.set_constraint(a, b, rel, ConstraintType.LOOP)
    opts = Options().replace(max_iterations=30)
    summary, _ = opt.solve(opts)
    err_before = max(
        np.linalg.norm(noisy_pos[i] - true_pos[i]) for i in range(P)
    )
    err = max(
        np.linalg.norm(opt.get_pose(i).translation - true_pos[i]) for i in range(P)
    )
    # truncated-Krylov LM converges linearly on a 2000-chain's
    # low-frequency modes; a >10x error reduction in 30 inexact Newton
    # steps is the expected behavior, not exact convergence
    assert err < 0.1 * err_before, (err, err_before)
    assert float(summary.final_cost) < 1e-6


def test_analytic_edge_jacobians_match_autodiff(rng):
    """Closed-form edge Jacobian blocks == per-edge jacfwd oracle."""
    from nonlinear_optimizer_for_slam_tpu.ops import relative_pose as rp

    P, E = 7, 12
    positions = jnp.asarray(rng.normal(size=(P, 3)))
    # deliberately non-unit quaternions: the ambient parameterization lets
    # them drift, and the normalization Jacobian must handle that
    quats = jnp.asarray(rng.normal(size=(P, 4)) + np.array([2.0, 0, 0, 0]))
    ref = rng.integers(0, P, E)
    qry = (ref + 1 + rng.integers(0, P - 1, E)) % P
    rel_q = rng.normal(size=(E, 4))
    rel_q /= np.linalg.norm(rel_q, axis=1, keepdims=True)
    edges = rp.PoseGraphEdges(
        reference_indices=jnp.asarray(ref, jnp.int32),
        query_indices=jnp.asarray(qry, jnp.int32),
        relative_translations=jnp.asarray(rng.normal(size=(E, 3))),
        relative_quaternions=jnp.asarray(rel_q),
        is_loop=jnp.asarray((rng.uniform(size=E) < 0.5).astype(float)),
        mask=jnp.asarray((rng.uniform(size=E) < 0.9).astype(float)),
    )
    switches = jnp.asarray(rng.uniform(0.2, 1.0, E))

    for scale in (rp.SWITCH_PENALTY_SCALE, 0.03):
        out = rp.edge_residuals_and_jacobians(
            positions, quats, switches, edges, scale
        )
        oracle = rp.edge_residuals_and_jacobians_ad(
            positions, quats, switches, edges, scale
        )
        for got, exp, name in zip(out, oracle, ("r", "J_ref", "J_query", "J_s")):
            np.testing.assert_allclose(
                np.asarray(got), np.asarray(exp), atol=1e-12, err_msg=name
            )


def test_robust_edge_loss_bounds_outlier_influence(fixture):
    """An ODOMETRY outlier (not switchable — switch variables only guard
    loops) wrecks the quadratic solve. Robust edge losses bound its
    influence: Huber (bounded influence) improves the solution but still
    compromises toward a gross outlier; Cauchy (redescending) rejects it
    outright, leaving only the outlier's saturated log-cost. Dense and CG
    paths agree under the same loss."""
    from nonlinear_optimizer_for_slam_tpu.core import CauchyLoss, HuberLoss

    true_poses, _, _ = fixture

    def build(**kw):
        opt = _build(fixture, switch_penalty=0.03, **kw)
        # corrupt with one wild ODOMETRY-type edge (switch variables only
        # guard loops, so nothing else can absorb it)
        bad = nls.Pose(np.eye(3), np.array([25.0, -31.0, 18.0]))
        opt.set_constraint(30, 34, bad)
        return opt

    def max_err(opt):
        return max(
            np.linalg.norm(opt.get_pose(i).translation - tp.translation)
            for i, tp in enumerate(true_poses)
        )

    quad = build()
    quad.solve()
    huber = build(edge_loss=HuberLoss(1.0))
    huber.solve()
    cauchy = build(edge_loss=CauchyLoss(1.0))
    s_c, _ = cauchy.solve()

    assert max_err(huber) < 0.8 * max_err(quad)
    # Cauchy rejects the outlier: trajectory within the noise envelope and
    # the final cost is just the outlier's saturated log term
    # (log(1 + |r_bad|^2) ~= 7.6) plus the inlier floor.
    assert max_err(cauchy) < 0.3, max_err(cauchy)
    assert float(s_c.final_cost) < 8.0

    cauchy_cg = build(edge_loss=CauchyLoss(1.0), solver="cg", cg_iterations=200)
    cauchy_cg.solve()
    for i in range(len(true_poses)):
        np.testing.assert_allclose(
            cauchy_cg.get_pose(i).translation,
            cauchy.get_pose(i).translation,
            atol=5e-3,
        )


def test_cg_records_populated(fixture):
    """The CG path now rides the canonical lm.solve loop: per-iteration
    records must be real numbers, not the round-1 NaN placeholders."""
    opt = _build(fixture, solver="cg", switch_penalty=0.03)
    summary, _ = opt.solve(Options().replace(max_iterations=40))
    n = int(summary.iterations)
    assert n > 1
    rec = summary.records
    assert np.all(np.isfinite(np.asarray(rec.cost[:n])))
    assert np.all(np.isfinite(np.asarray(rec.lam[:n])))
    costs = np.asarray(rec.cost[:n])
    assert costs[-1] < costs[0]


def test_registry_caching_across_solves(fixture):
    """The flattening/upload caches (added for the ~3 s/solve fixed host
    cost at 50k constraints) must be invisible: re-solving, mutating the
    topology after a solve, and updating an initial guess between solves
    all behave as if every solve rebuilt from the registry."""
    true_poses, noisy_poses, _ = fixture
    opt = _build(fixture, switch_penalty=0.03)
    s1, _ = opt.solve()

    # re-solve from the solved state: stays at the optimum
    s2, _ = opt.solve()
    assert float(s2.final_cost) <= float(s1.final_cost) * (1 + 1e-6)
    solved_40 = opt.get_pose(40).translation.copy()

    # topology change AFTER a solve: the lazily-written-back poses must
    # survive the cache rebuild (a pose 81st pose + identity edge)
    opt.set_pose(80, true_poses[79].copy())
    opt.set_constraint(79, 80, nls.Pose.identity())
    np.testing.assert_allclose(
        opt.get_pose(40).translation, solved_40, atol=1e-12
    )
    s3, _ = opt.solve()
    err = max(
        np.linalg.norm(opt.get_pose(i).translation - true_poses[i].translation)
        for i in range(80)
    )
    assert err < 0.015, err

    # initial-guess update between solves (set_pose on existing index)
    opt.set_pose(40, noisy_poses[40])
    np.testing.assert_allclose(
        opt.get_pose(40).translation, noisy_poses[40].translation, atol=1e-12
    )
    s4, _ = opt.solve()
    err = max(
        np.linalg.norm(opt.get_pose(i).translation - true_poses[i].translation)
        for i in range(80)
    )
    assert err < 0.015, err


def test_chain_preconditioner_exact_on_chains():
    """The "chain" CG preconditioner IS the damped system on a pure
    odometry chain, so CG needs only a couple of iterations to return
    the direct step: 3 CG iterations must reproduce the dense solution,
    where block-Jacobi at the same budget cannot (it ignores all
    inter-pose coupling). Also covers cg_precond plumbing/validation."""
    rng = np.random.default_rng(0)
    P = 40
    true_pos = np.cumsum(rng.normal(0, 0.3, (P, 3)), axis=0)

    def build(**kw):
        r = np.random.default_rng(1)
        o = PoseGraphOptimizer(switch_penalty=0.03, **kw)
        for i in range(P):
            o.set_pose(
                i,
                nls.Pose(
                    np.eye(3),
                    true_pos[i] + (r.normal(0, 0.05, 3) if i else 0.0),
                ),
            )
        o.set_pose_constant(0)
        for i in range(P - 1):
            o.set_constraint(
                i, i + 1, nls.Pose(np.eye(3), true_pos[i + 1] - true_pos[i])
            )
        return o

    opts = Options().replace(max_iterations=50)
    dense = build(solver="dense")
    chain = build(solver="cg", cg_iterations=3, cg_precond="chain")
    jacobi = build(solver="cg", cg_iterations=3, cg_precond="jacobi")
    s_d, _ = dense.solve(opts)
    s_c, _ = chain.solve(opts)
    s_j, _ = jacobi.solve(opts)
    # chain@3 == dense; jacobi@3 is orders of magnitude worse
    assert float(s_c.final_cost) < 1e-8
    for i in range(P):
        np.testing.assert_allclose(
            chain.get_pose(i).translation, dense.get_pose(i).translation,
            atol=1e-5,
        )
    assert float(s_j.final_cost) > 100.0 * float(s_c.final_cost)

    with pytest.raises(ValueError, match="cg_precond"):
        PoseGraphOptimizer(cg_precond="nope")


def test_prior_anchored_graph_no_constant_pose():
    """GPS-style anchoring: unary priors fix the gauge, no
    set_pose_constant needed. A strong prior at each end of a noisy
    chain pulls the solution onto the prior positions; a hard-constant
    solve with the same anchors is the strong-weight limit oracle."""
    rng = np.random.default_rng(4)
    P = 30
    true_pos = np.cumsum(rng.normal(0, 0.4, (P, 3)), axis=0)

    def build():
        o = PoseGraphOptimizer()
        for i in range(P):
            o.set_pose(
                i, nls.Pose(np.eye(3), true_pos[i] + rng_init.normal(0, 0.1, 3))
            )
        for i in range(P - 1):
            o.set_constraint(
                i, i + 1,
                nls.Pose(np.eye(3), true_pos[i + 1] - true_pos[i]),
            )
        return o

    rng_init = np.random.default_rng(9)
    soft = build()
    soft.set_prior(0, nls.Pose(np.eye(3), true_pos[0]), sqrt_info=1e4)
    soft.set_prior(P - 1, nls.Pose(np.eye(3), true_pos[P - 1]), sqrt_info=1e4)
    s, _ = soft.solve(Options().replace(max_iterations=100))
    assert bool(s.converged)
    # strong priors pin the anchored poses
    np.testing.assert_allclose(soft.get_pose(0).translation, true_pos[0], atol=1e-4)
    np.testing.assert_allclose(
        soft.get_pose(P - 1).translation, true_pos[P - 1], atol=1e-4
    )
    # and with exact odometry + both ends pinned the chain must land on
    # the truth everywhere
    for i in range(P):
        np.testing.assert_allclose(
            soft.get_pose(i).translation, true_pos[i], atol=1e-3
        )


def test_prior_vs_constant_pose_limit():
    """A very strong prior approaches set_pose_constant: same fixture,
    both anchorings, matching solutions."""
    _, noisy, constraints = testing.generate_pose_graph_fixture()

    def build(anchor):
        o = PoseGraphOptimizer(switch_penalty=0.03)
        for i, p in enumerate(noisy):
            o.set_pose(i, p)
        if anchor == "constant":
            o.set_pose_constant(0)
        else:
            o.set_prior(0, noisy[0], sqrt_info=1e6)
        for c in constraints:
            o.set_constraint(
                c["reference_index"], c["query_index"], c["relative_pose"],
                ConstraintType.LOOP if c["is_loop"] else ConstraintType.ODOMETRY,
            )
        return o

    hard = build("constant")
    soft = build("prior")
    s_h, sw_h = hard.solve()
    s_s, sw_s = soft.solve()
    for i in range(80):
        np.testing.assert_allclose(
            soft.get_pose(i).translation, hard.get_pose(i).translation,
            atol=5e-4,
        )
    np.testing.assert_allclose(sw_s, sw_h, atol=1e-3)


def test_prior_covariance_and_validation():
    """Prior-anchored covariance: bounded, grows with distance from the
    anchor, and the anchored pose's translation variance is ~1/w^2."""
    rng = np.random.default_rng(5)
    P = 12
    true_pos = np.cumsum(rng.normal(0, 0.4, (P, 3)), axis=0)
    w = 10.0  # sqrt-info of the anchor prior
    o = PoseGraphOptimizer()
    for i in range(P):
        o.set_pose(i, nls.Pose(np.eye(3), true_pos[i]))
    for i in range(P - 1):
        o.set_constraint(
            i, i + 1, nls.Pose(np.eye(3), true_pos[i + 1] - true_pos[i]),
            sqrt_info=5.0,
        )
    o.set_prior(0, nls.Pose(np.eye(3), true_pos[0]), sqrt_info=w)
    o.solve(Options().replace(max_iterations=50))
    cov = o.covariance()
    v0 = np.trace(cov[0][:3, :3]) / 3
    vN = np.trace(cov[P - 1][:3, :3]) / 3
    # anchored pose: var ~ 1/w^2 (the only factor limiting it)
    np.testing.assert_allclose(v0, 1.0 / w**2, rtol=0.2)
    # accumulating odometry uncertainty away from the anchor
    assert vN > 5 * v0

    with pytest.raises(KeyError):
        o.set_prior(99, nls.Pose.identity())
    cg = PoseGraphOptimizer(solver="cg")
    cg.set_pose(0, nls.Pose.identity())
    cg.set_pose(1, nls.Pose.identity())
    cg.set_prior(0, nls.Pose.identity())
    cg.set_constraint(0, 1, nls.Pose.identity())
    with pytest.raises(ValueError, match="dense"):
        cg.solve()


def test_dcs_edge_loss_rejects_outlier_without_switches(fixture):
    """DCS as the per-edge robust kernel: the planted outlier loop is
    excluded by the loss (zero weight past Phi) with ALL constraints
    ODOMETRY-typed — no switch variables in the state at all — and the
    solution matches the switchable-constraints answer."""
    from nonlinear_optimizer_for_slam_tpu.core import DCSLoss

    true_poses, noisy, constraints = fixture

    # switchable baseline
    base = _build(fixture, switch_penalty=0.03)
    base.solve()

    dcs = PoseGraphOptimizer(edge_loss=DCSLoss(phi=0.1))
    for i, p in enumerate(noisy):
        dcs.set_pose(i, p)
    dcs.set_pose_constant(0)
    for c in constraints:
        dcs.set_constraint(
            c["reference_index"], c["query_index"], c["relative_pose"]
        )  # everything odometry: no switches
    summary, sw = dcs.solve()
    assert sw.shape == (0,)
    err = max(
        np.linalg.norm(dcs.get_pose(i).translation - true_poses[i].translation)
        for i in range(80)
    )
    assert err < 0.01, f"DCS failed to reject the outlier: err={err}"
    # two different robustifiers, same basin: agreement to ~noise scale
    for i in range(80):
        np.testing.assert_allclose(
            dcs.get_pose(i).translation, base.get_pose(i).translation, atol=2e-2
        )


def test_edge_information_world_frame_consistency():
    """edge_information_to_world: a measurement-frame anisotropic
    information whitens the WORLD-frame pose-graph residual so that the
    whitened quadratic equals the measurement-frame quadratic d^T Omega d
    for any reference world rotation — the raw (unconjugated) Omega would
    swap stiff/soft axes whenever R_ref != I (advisor round-2 finding)."""
    from nonlinear_optimizer_for_slam_tpu.core.pose import (
        Pose,
        np_rotmat_to_quat,
    )
    from nonlinear_optimizer_for_slam_tpu.ops.relative_pose import (
        relative_pose_residual,
    )
    from nonlinear_optimizer_for_slam_tpu.solvers.pose_graph import (
        edge_information_to_world,
        sqrt_info_from_information,
    )

    # stiff along measurement-frame x (100), soft along y (1): the
    # corridor-degenerate shape a registration information produces
    omega = np.diag([100.0, 1.0, 1.0, 4.0, 4.0, 4.0])

    th = np.deg2rad(90.0)  # keyframe rotated so world-x = ref-y
    c, s = np.cos(th), np.sin(th)
    R_ref = np.array([[c, -s, 0.0], [s, c, 0.0], [0.0, 0.0, 1.0]])
    p_ref = np.array([0.3, -0.2, 0.1])
    t_rel = np.array([0.5, 0.1, 0.0])  # measured T_ref<-query translation

    S_world = sqrt_info_from_information(
        edge_information_to_world(omega, R_ref)
    )
    q_ref = np_rotmat_to_quat(R_ref)
    q_rel = np.array([1.0, 0.0, 0.0, 0.0])

    eps = 1e-2
    for delta_ref, expected in [
        (np.array([eps, 0.0, 0.0]), 100.0 * eps**2),  # stiff ref-x
        (np.array([0.0, eps, 0.0]), 1.0 * eps**2),  # soft ref-y
    ]:
        # query sits off the measurement by delta (REF frame)
        p_query = p_ref + R_ref @ (t_rel + delta_ref)
        r = np.asarray(
            relative_pose_residual(
                jnp.asarray(p_ref),
                jnp.asarray(q_ref),
                jnp.asarray(p_query),
                jnp.asarray(q_ref),  # same orientation: zero rotation error
                jnp.asarray(t_rel),
                jnp.asarray(q_rel),
            )
        )
        chi2 = float(r @ (S_world.T @ S_world) @ r)
        np.testing.assert_allclose(chi2, expected, rtol=1e-6)
        # the raw measurement-frame Omega misrotates: 90 deg swaps axes
        chi2_raw = float(r @ omega @ r)
        wrong = 1.0 * eps**2 if expected > 50 * eps**2 else 100.0 * eps**2
        np.testing.assert_allclose(chi2_raw, wrong, rtol=1e-6)
