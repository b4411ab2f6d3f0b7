"""Sim(3) pose-graph tests: residual conventions, rigid-subgroup
consistency with the SE(3) graph, and the headline capability — a
monocular loop closure absorbing accumulated SCALE drift (Strasdat
RSS'10 / ORB-SLAM essential graph)."""

import numpy as np
import jax.numpy as jnp
import pytest

import nonlinear_optimizer_for_slam_tpu as nls
from nonlinear_optimizer_for_slam_tpu.core import Options
from nonlinear_optimizer_for_slam_tpu.core.pose import Pose
from nonlinear_optimizer_for_slam_tpu.solvers.sim3_graph import (
    Sim3GraphOptimizer,
    sim3_edge_residual,
)


def _rotz(th):
    c, s = np.cos(th), np.sin(th)
    return np.array([[c, -s, 0.0], [s, c, 0.0], [0.0, 0.0, 1.0]])


def _sim3_compose(a, b):
    """T_a * T_b for (8,) [p, q, log_s] states (x -> s R x + p)."""
    from nonlinear_optimizer_for_slam_tpu.ops.relative_pose import (
        np_quat_multiply,
    )

    Ra = np_rot(a)
    sa = np.exp(a[7])
    p = sa * Ra @ b[:3] + a[:3]
    q = np_quat_multiply(a[3:7], b[3:7])
    return np.concatenate([p, q, [a[7] + b[7]]])


def np_rot(x):
    from nonlinear_optimizer_for_slam_tpu.core.pose import np_quat_to_rotmat

    return np_quat_to_rotmat(x[3:7] / np.linalg.norm(x[3:7]))


def _between(a, b):
    """Measurement (8,) = T_a^-1 T_b as [t_rel, q_rel, log_s_rel]."""
    from nonlinear_optimizer_for_slam_tpu.ops.relative_pose import (
        np_quat_conjugate,
        np_quat_multiply,
    )

    Ra = np_rot(a)
    sa = np.exp(a[7])
    t = (1.0 / sa) * Ra.T @ (b[:3] - a[:3])
    q = np_quat_multiply(np_quat_conjugate(a[3:7]), b[3:7])
    return np.concatenate([t, q, [b[7] - a[7]]])


def test_residual_zero_at_consistency():
    rng = np.random.default_rng(0)
    for _ in range(5):
        a = np.concatenate(
            [rng.normal(size=3), rng.normal(size=4), [rng.normal(0, 0.3)]]
        )
        a[3:7] /= np.linalg.norm(a[3:7])
        b = np.concatenate(
            [rng.normal(size=3), rng.normal(size=4), [rng.normal(0, 0.3)]]
        )
        b[3:7] /= np.linalg.norm(b[3:7])
        meas = _between(a, b)
        r = np.asarray(
            sim3_edge_residual(jnp.asarray(a), jnp.asarray(b), jnp.asarray(meas))
        )
        np.testing.assert_allclose(r, 0.0, atol=1e-12)


def test_rigid_subgroup_matches_se3_graph():
    """All scales 1 and rigid measurements: the Sim(3) solve must land
    where the SE(3) pose graph does (scale stays 1)."""
    rng = np.random.default_rng(1)
    P = 12
    true = [
        Pose.from_axis_angle(2 * np.pi * k / P, [0, 0, 1],
                             [np.cos(2 * np.pi * k / P), np.sin(2 * np.pi * k / P), 0.0])
        for k in range(P)
    ]

    def noisy_t(k, r):
        return true[k].translation + (r.normal(0, 0.05, 3) if k else 0.0)

    r1 = np.random.default_rng(2)
    se3 = nls.PoseGraphOptimizer()
    for k, p in enumerate(true):
        se3.set_pose(k, Pose(p.rotation, noisy_t(k, r1)))
    se3.set_pose_constant(0)
    for k in range(P):
        se3.set_constraint(k, (k + 1) % P, true[k].inverse() * true[(k + 1) % P])
    se3.solve()

    r1 = np.random.default_rng(2)
    sim3 = Sim3GraphOptimizer()
    for k, p in enumerate(true):
        sim3.set_pose(k, Pose(p.rotation, noisy_t(k, r1)))
    sim3.set_pose_constant(0)
    for k in range(P):
        sim3.set_constraint(k, (k + 1) % P, true[k].inverse() * true[(k + 1) % P])
    s = sim3.solve()
    assert bool(s.converged)
    for k in range(P):
        np.testing.assert_allclose(
            sim3.get_pose(k).translation, se3.get_pose(k).translation, atol=1e-5
        )
        np.testing.assert_allclose(sim3.get_scale(k), 1.0, atol=1e-8)


def test_monocular_scale_drift_corrected_by_loop():
    """THE Sim(3) use case (Strasdat RSS'10): monocular odometry whose
    translation magnitudes drift by a constant factor per edge. The
    consistent explanation is per-keyframe scales s_k = d^-k; a naive
    rigid (SE(3)-style) dead reckoning of the same measurements spirals
    outward. The Sim(3) graph with one loop closure must recover BOTH
    the true positions and the drift profile exactly."""
    P = 20
    drift = 1.04  # 4% scale growth per edge -> 2.1x over the loop
    # target (consistent) Sim(3) states: true circle poses, ls_k = -k ln d
    target = []
    for k in range(P):
        q = np.array([np.cos(np.pi * k / P), 0, 0, np.sin(np.pi * k / P)])
        target.append(np.concatenate(
            [[3 * np.cos(2 * np.pi * k / P), 3 * np.sin(2 * np.pi * k / P), 0.0],
             q, [-k * np.log(drift)]]
        ))

    # every measurement is the exact similarity between targets — the
    # odometry translations come out inflated by d^k (monocular drift)
    meas = [_between(target[k], target[k + 1]) for k in range(P - 1)]
    loop_meas = _between(target[P - 1], target[0])

    # naive rigid dead reckoning of those measurements spirals out
    init = [target[0].copy()]
    for k in range(P - 1):
        m = meas[k]
        prev = init[-1]
        p_next = prev[:3] + np_rot(prev) @ m[:3]  # ignores scale
        from nonlinear_optimizer_for_slam_tpu.ops.relative_pose import (
            np_quat_multiply,
        )
        q_next = np_quat_multiply(prev[3:7], m[3:7])
        init.append(np.concatenate([p_next, q_next, [0.0]]))
    spiral_err = max(
        np.linalg.norm(init[k][:3] - target[k][:3]) for k in range(P)
    )
    assert spiral_err > 1.0, spiral_err  # the drift really is large

    opt = Sim3GraphOptimizer()
    for k in range(P):
        opt.set_pose(k, Pose(np_rot(init[k]), init[k][:3]), scale=1.0)
    opt.set_pose_constant(0)
    for k in range(P - 1):
        m = meas[k]
        opt.set_constraint(
            k, k + 1, Pose(np_rot(m), m[:3]),
            relative_scale=float(np.exp(m[7])), sqrt_info=(10.0, 20.0, 1.0),
        )
    m = loop_meas
    opt.set_constraint(
        P - 1, 0, Pose(np_rot(m), m[:3]),
        relative_scale=float(np.exp(m[7])), sqrt_info=(50.0, 100.0, 50.0),
    )
    s = opt.solve(Options().replace(max_iterations=300))
    assert float(s.final_cost) < 1e-10  # measurements are consistent

    for k in range(P):
        np.testing.assert_allclose(
            opt.get_pose(k).translation, target[k][:3], atol=1e-4
        )
        np.testing.assert_allclose(
            np.log(opt.get_scale(k)), target[k][7], atol=1e-6
        )


def test_api_validation():
    o = Sim3GraphOptimizer()
    o.set_pose(0, Pose.identity())
    o.set_pose(1, Pose.identity(), scale=2.0)
    assert o.get_scale(1) == pytest.approx(2.0)
    with pytest.raises(ValueError, match="positive"):
        o.set_pose(2, Pose.identity(), scale=-1.0)
    with pytest.raises(ValueError, match="positive"):
        o.set_constraint(0, 1, Pose.identity(), relative_scale=0.0)
    with pytest.raises(KeyError):
        o.set_constraint(0, 9, Pose.identity())
    with pytest.raises(ValueError, match="no constraints"):
        o.solve()


def test_chordal_init_extends_convergence_basin():
    """200-keyframe chain with 2%/edge monocular scale drift (52x
    accumulated): from the naive scale=1 dead-reckon LM DIVERGES
    (verified while building the initializer — cost explodes); with
    `initialize()` the log-scale Laplacian + chordal stages land exactly
    on the consistent solution (linear stages are exact for consistent
    measurements) and LM confirms at machine precision."""
    P = 100
    drift = 1.04
    target = []
    for k in range(P):
        q = np.array([np.cos(np.pi * k / P), 0, 0, np.sin(np.pi * k / P)])
        target.append(np.concatenate(
            [[6 * np.cos(2 * np.pi * k / P), 6 * np.sin(2 * np.pi * k / P),
              0.0], q, [-k * np.log(drift)]]
        ))
    meas = [_between(target[k], target[k + 1]) for k in range(P - 1)]
    loop_meas = _between(target[P - 1], target[0])

    def build():
        opt = Sim3GraphOptimizer()
        chain = [target[0].copy()]
        for k in range(P - 1):
            m = meas[k]
            prev = chain[-1]
            from nonlinear_optimizer_for_slam_tpu.ops.relative_pose import (
                np_quat_multiply,
            )
            chain.append(np.concatenate(
                [prev[:3] + np_rot(prev) @ m[:3],
                 np_quat_multiply(prev[3:7], m[3:7]), [0.0]]
            ))
        for k in range(P):
            opt.set_pose(k, Pose(np_rot(chain[k]), chain[k][:3]), scale=1.0)
        opt.set_pose_constant(0)
        for k in range(P - 1):
            m = meas[k]
            opt.set_constraint(
                k, k + 1, Pose(np_rot(m), m[:3]),
                relative_scale=float(np.exp(m[7])),
                sqrt_info=(10.0, 20.0, 1.0),
            )
        m = loop_meas
        opt.set_constraint(
            P - 1, 0, Pose(np_rot(m), m[:3]),
            relative_scale=float(np.exp(m[7])), sqrt_info=(50.0, 100.0, 50.0),
        )
        return opt

    opt = build()
    opt.initialize()
    s = opt.solve(Options().replace(max_iterations=50))
    assert float(s.final_cost) < 1e-10, float(s.final_cost)
    for k in range(0, P, 7):
        np.testing.assert_allclose(
            opt.get_pose(k).translation, target[k][:3], atol=1e-4
        )
        np.testing.assert_allclose(
            np.log(opt.get_scale(k)), target[k][7], atol=1e-6
        )

    # initialize() respects fixed scales: anchor keyframe 0's scale to a
    # non-unit value and check the profile shifts coherently
    opt2 = build()
    opt2.set_pose(0, Pose(np_rot(target[0]), target[0][:3]), scale=2.0)
    opt2.set_scale_constant(0)
    opt2.initialize()
    assert opt2.get_scale(0) == pytest.approx(2.0)


def test_noisy_graph_converges_fast_with_default_schedule():
    """Round-5 regression: on a NOISY drifting graph the reference
    lambda clamp's 1e-6 floor makes LM creep geometrically (127
    iterations on the 200-kf benchmark analog; the floor's
    min_lambda*diag(H) damping swamps the soft loop-error-distribution
    mode whose diagonal carries exp(2*drift)). The beyond-reference
    default schedule (floor 1e-10, decrease 0.25, plateau stop) must
    reach the optimum in a small number of iterations."""
    rng = np.random.default_rng(5)
    P = 60
    drift = 1.03
    target = []
    for k in range(P):
        q = np.array([np.cos(np.pi * k / P), 0, 0, np.sin(np.pi * k / P)])
        target.append(np.concatenate(
            [[4 * np.cos(2 * np.pi * k / P), 4 * np.sin(2 * np.pi * k / P),
              0.0], q, [-k * np.log(drift)]]
        ))
    from nonlinear_optimizer_for_slam_tpu.ops.relative_pose import (
        np_quat_multiply,
    )

    def noisy(m):
        dq = np.concatenate([[1.0], rng.normal(0, 2e-3, 3)])
        q = np_quat_multiply(m[3:7], dq / np.linalg.norm(dq))
        return np.concatenate(
            [m[:3] + rng.normal(0, 5e-3, 3), q, [m[7] + rng.normal(0, 2e-3)]]
        )

    meas = [noisy(_between(target[k], target[k + 1])) for k in range(P - 1)]
    loop_m = noisy(_between(target[P - 1], target[0]))
    opt = Sim3GraphOptimizer()
    init = [target[0].copy()]
    for k in range(P - 1):
        m = meas[k]
        prev = init[-1]
        init.append(np.concatenate(
            [prev[:3] + np_rot(prev) @ m[:3],
             np_quat_multiply(prev[3:7], m[3:7]), [0.0]]
        ))
    for k in range(P):
        opt.set_pose(k, Pose(np_rot(init[k]), init[k][:3]), scale=1.0)
    opt.set_pose_constant(0)
    for k in range(P - 1):
        m = meas[k]
        opt.set_constraint(k, k + 1, Pose(np_rot(m), m[:3]),
                           relative_scale=float(np.exp(m[7])),
                           sqrt_info=(10.0, 20.0, 1.0))
    m = loop_m
    opt.set_constraint(P - 1, 0, Pose(np_rot(m), m[:3]),
                       relative_scale=float(np.exp(m[7])),
                       sqrt_info=(50.0, 100.0, 50.0))
    opt.initialize()
    s = opt.solve()  # beyond-reference default schedule
    assert bool(s.converged)
    assert int(s.iterations) <= 40, int(s.iterations)
    fast_cost = float(s.final_cost)

    # reference-clamp schedule from the same init: never reaches a
    # better cost, and the default must be at least as good
    opt2 = Sim3GraphOptimizer()
    for k in range(P):
        opt2.set_pose(k, Pose(np_rot(init[k]), init[k][:3]), scale=1.0)
    opt2.set_pose_constant(0)
    for k in range(P - 1):
        m = meas[k]
        opt2.set_constraint(k, k + 1, Pose(np_rot(m), m[:3]),
                            relative_scale=float(np.exp(m[7])),
                            sqrt_info=(10.0, 20.0, 1.0))
    m = loop_m
    opt2.set_constraint(P - 1, 0, Pose(np_rot(m), m[:3]),
                        relative_scale=float(np.exp(m[7])),
                        sqrt_info=(50.0, 100.0, 50.0))
    opt2.initialize()
    s2 = opt2.solve(Options().replace(max_iterations=60))
    assert fast_cost <= float(s2.final_cost) * (1 + 1e-9)

    # polish="always" exercises the host-f64 stage even when the bulk
    # stage already ran f64 (CPU x64 tests): must not degrade the cost
    opt3 = Sim3GraphOptimizer()
    for k in range(P):
        opt3.set_pose(k, Pose(np_rot(init[k]), init[k][:3]), scale=1.0)
    opt3.set_pose_constant(0)
    for k in range(P - 1):
        m = meas[k]
        opt3.set_constraint(k, k + 1, Pose(np_rot(m), m[:3]),
                            relative_scale=float(np.exp(m[7])),
                            sqrt_info=(10.0, 20.0, 1.0))
    m = loop_m
    opt3.set_constraint(P - 1, 0, Pose(np_rot(m), m[:3]),
                        relative_scale=float(np.exp(m[7])),
                        sqrt_info=(50.0, 100.0, 50.0))
    opt3.initialize()
    s3 = opt3.solve(polish="always")
    assert float(s3.final_cost) <= fast_cost * (1 + 1e-6)


def _build_noisy_graph(P=60, drift=1.03, seed=5, extra_loops=3, **kw):
    rng = np.random.default_rng(seed)
    target = []
    for k in range(P):
        q = np.array([np.cos(np.pi * k / P), 0, 0, np.sin(np.pi * k / P)])
        target.append(np.concatenate(
            [[4 * np.cos(2 * np.pi * k / P), 4 * np.sin(2 * np.pi * k / P),
              0.0], q, [-k * np.log(drift)]]
        ))
    from nonlinear_optimizer_for_slam_tpu.ops.relative_pose import (
        np_quat_multiply,
    )

    def noisy(m):
        dq = np.concatenate([[1.0], rng.normal(0, 2e-3, 3)])
        q = np_quat_multiply(m[3:7], dq / np.linalg.norm(dq))
        return np.concatenate(
            [m[:3] + rng.normal(0, 5e-3, 3), q, [m[7] + rng.normal(0, 2e-3)]]
        )

    opt = Sim3GraphOptimizer(**kw)
    init = [target[0].copy()]
    meas = [noisy(_between(target[k], target[k + 1])) for k in range(P - 1)]
    for k in range(P - 1):
        m = meas[k]
        prev = init[-1]
        init.append(np.concatenate(
            [prev[:3] + np_rot(prev) @ m[:3],
             np_quat_multiply(prev[3:7], m[3:7]), [0.0]]
        ))
    for k in range(P):
        opt.set_pose(k, Pose(np_rot(init[k]), init[k][:3]), scale=1.0)
    opt.set_pose_constant(0)
    for k in range(P - 1):
        m = meas[k]
        opt.set_constraint(k, k + 1, Pose(np_rot(m), m[:3]),
                           relative_scale=float(np.exp(m[7])),
                           sqrt_info=(10.0, 20.0, 1.0))
    loop_ids = [(P - 1, 0)] + [
        (int(a), int(a + P // 3)) for a in np.linspace(3, P - P // 3 - 3,
                                                       extra_loops).astype(int)
    ]
    for (a, b) in loop_ids:
        m = noisy(_between(target[a], target[b]))
        opt.set_constraint(a, b, Pose(np_rot(m), m[:3]),
                           relative_scale=float(np.exp(m[7])),
                           sqrt_info=(50.0, 100.0, 50.0))
    opt.initialize()
    return opt, target


def test_sparse_solver_matches_dense():
    """Round-5 multifrontal Sim(3) path (solver='sparse', d=8 blocks):
    same optimum as the dense (8P)^2 path on a noisy multi-loop
    essential graph — the scale class where dense becomes infeasible
    (10k keyframes would be a 25 GB normal matrix)."""
    import dataclasses

    from nonlinear_optimizer_for_slam_tpu.core.options import (
        ConvergenceHandle, OptimizationHandle,
    )

    tight = dataclasses.replace(
        Options().replace(max_iterations=200),
        convergence_handle=ConvergenceHandle(
            relative_function_tolerance=1e-10
        ),
        optimization_handle=OptimizationHandle(
            min_lambda=1e-12, initial_lambda=1e-6,
            lambda_decrease_factor=0.25,
        ),
    )
    dense, target = _build_noisy_graph(solver="dense")
    sparse, _ = _build_noisy_graph(solver="sparse")
    s_d = dense.solve(tight)
    s_s = sparse.solve(tight)
    assert dense.last_solver_choice == "dense"
    assert sparse.last_solver_choice == "sparse"
    # SHARP check: one damped-GN step from the same init must agree to
    # linear-solve accuracy (the damped diagonals are algebraically
    # identical; only multifrontal-vs-Cholesky roundoff differs)
    one = Options().replace(max_iterations=1)
    d1, _ = _build_noisy_graph(solver="dense")
    s1, _ = _build_noisy_graph(solver="sparse")
    d1.solve(one, polish="never")
    s1.solve(one, polish="never")
    for k in range(0, 60, 7):
        np.testing.assert_allclose(
            s1.get_pose(k).translation, d1.get_pose(k).translation,
            atol=1e-7,
        )
    # BASIN check: full solves land at equivalent optima (the problem
    # is nonconvex with a soft valley — mm-scale trajectory roundoff
    # compounds into nearby, equally-good minima)
    np.testing.assert_allclose(
        float(s_s.final_cost), float(s_d.final_cost), rtol=1e-2
    )
    for k in range(0, 60, 7):
        np.testing.assert_allclose(
            sparse.get_pose(k).translation, dense.get_pose(k).translation,
            atol=5e-2,
        )
        assert sparse.get_scale(k) == pytest.approx(dense.get_scale(k),
                                                    rel=1e-2)
    # auto picks sparse above the threshold
    big = Sim3GraphOptimizer()
    assert big.solver == "auto"
    with pytest.raises(ValueError, match="solver"):
        Sim3GraphOptimizer(solver="banded")


def test_auto_solver_threshold():
    """The auto branch actually selects sparse above sparse_threshold
    (round-5 review: the forced-solver fixtures bypassed it)."""
    opt, _ = _build_noisy_graph(solver="auto")
    opt.sparse_threshold = 10  # far below the 60-kf fixture
    opt.solve(Options().replace(max_iterations=2))
    assert opt.last_solver_choice == "sparse"
    opt2, _ = _build_noisy_graph(solver="auto")
    assert opt2.sparse_threshold == 600
    opt2.solve(Options().replace(max_iterations=2))
    assert opt2.last_solver_choice == "dense"
