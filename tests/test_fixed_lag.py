"""Fixed-lag smoother tests.

The smoother is a NEW capability (the reference's pose-graph module is
batch-only, pose_graph_optimizer.h:21-108); the acceptance anchors are
internal-consistency oracles:

- the numpy host-side linearization twin must match the jnp closed form
  bit-for-bit (same convention the closed form is itself verified against
  autodiff in test_pose_graph.py);
- with ``lag >= N`` no marginalization happens, so the smoother's last
  update solves EXACTLY the batch problem -> must match PoseGraphOptimizer
  tightly;
- with a finite lag, marginalization only introduces linearization error,
  so window estimates must track the batch MAP closely on a
  moderate-noise fixture;
- marginalized poses are frozen and never move again.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from nonlinear_optimizer_for_slam_tpu.core.pose import Pose
from nonlinear_optimizer_for_slam_tpu.ops.relative_pose import (
    PoseGraphEdges,
    edge_residuals_and_jacobians,
    np_edge_residuals_and_jacobians,
)
from nonlinear_optimizer_for_slam_tpu.solvers.fixed_lag import FixedLagSmoother
from nonlinear_optimizer_for_slam_tpu.solvers.pose_graph import (
    ConstraintType,
    PoseGraphOptimizer,
)


def _rotz(th):
    c, s = np.cos(th), np.sin(th)
    return np.array([[c, -s, 0.0], [s, c, 0.0], [0.0, 0.0, 1.0]])


def _exp_so3(w):
    th = np.linalg.norm(w)
    if th < 1e-12:
        return np.eye(3)
    k = w / th
    K = np.array([[0, -k[2], k[1]], [k[2], 0, -k[0]], [-k[1], k[0], 0]])
    return np.eye(3) + np.sin(th) * K + (1 - np.cos(th)) * K @ K


def _circle_fixture(n=30, radius=8.0, s_t=0.03, s_r=0.005, seed=3):
    """Ground-truth circle + noisy odometry + loop closures every 10 frames."""
    rng = np.random.default_rng(seed)
    theta = np.linspace(0, 2 * np.pi, n, endpoint=False)
    gt = [
        Pose(_rotz(th), np.array([radius * np.cos(th), radius * np.sin(th), 0.0]))
        for th in theta
    ]

    def rel(i, j):
        Ri, ti = gt[i].rotation, gt[i].translation
        return Pose(Ri.T @ gt[j].rotation, Ri.T @ (gt[j].translation - ti))

    def noisy(p, st, sr):
        return Pose(
            p.rotation @ _exp_so3(rng.normal(0, sr, 3)),
            p.translation + rng.normal(0, st, 3),
        )

    odo = [noisy(rel(i, i + 1), s_t, s_r) for i in range(n - 1)]
    loops = {k: noisy(rel(k - 8, k), s_t / 3, s_r / 3) for k in range(10, n, 10)}
    return gt, odo, loops


def _dead_reckon(gt0, odo):
    poses = [gt0]
    for d in odo:
        p = poses[-1]
        poses.append(
            Pose(p.rotation @ d.rotation, p.translation + p.rotation @ d.translation)
        )
    return poses


def _run_smoother(lag, gt, odo, loops, feed_forward=True, **kw):
    n = len(gt)
    sm = FixedLagSmoother(lag=lag, switch_penalty=0.03, **kw)
    est = gt[0]
    sm.add_pose(0, est)
    for k in range(1, n):
        est = Pose(
            est.rotation @ odo[k - 1].rotation,
            est.translation + est.rotation @ odo[k - 1].translation,
        )
        sm.add_pose(k, est)
        sm.add_odometry(k - 1, k, odo[k - 1])
        if k in loops:
            sm.add_loop(k - 8, k, loops[k])
        sm.update()
        if feed_forward:
            est = sm.get_pose(k)
    return sm


def _run_batch(gt, odo, loops):
    n = len(gt)
    dr = _dead_reckon(gt[0], odo)
    opt = PoseGraphOptimizer(switch_penalty=0.03)
    for i in range(n):
        opt.set_pose(i, dr[i])
    opt.set_pose_constant(0)
    for k in range(1, n):
        opt.set_constraint(k - 1, k, odo[k - 1], ConstraintType.ODOMETRY)
    for k, lp in loops.items():
        opt.set_constraint(k - 8, k, lp, ConstraintType.LOOP)
    opt.solve()
    return opt


def test_numpy_twin_matches_jnp_linearization():
    """Host-side marginalization uses the SAME linearization as the device
    solve: the numpy twin must reproduce the jnp closed form exactly."""
    rng = np.random.default_rng(11)
    P, E = 6, 9
    pos = rng.normal(0, 2.0, (P, 3))
    quat = rng.normal(0, 1.0, (P, 4)) + np.array([2.0, 0, 0, 0])
    sw = rng.uniform(0.1, 1.0, E)
    ref = rng.integers(0, P, E).astype(np.int32)
    qry = (ref + 1 + rng.integers(0, P - 1, E)).astype(np.int32) % P
    rel_t = rng.normal(0, 1.0, (E, 3))
    rel_q = rng.normal(0, 1.0, (E, 4)) + np.array([2.0, 0, 0, 0])
    rel_q /= np.linalg.norm(rel_q, axis=1, keepdims=True)
    is_loop = (rng.uniform(size=E) > 0.5).astype(np.float64)

    edges = PoseGraphEdges(
        reference_indices=jnp.asarray(ref),
        query_indices=jnp.asarray(qry),
        relative_translations=jnp.asarray(rel_t),
        relative_quaternions=jnp.asarray(rel_q),
        is_loop=jnp.asarray(is_loop),
        mask=jnp.ones((E,), jnp.float64),
    )
    r_j, Jr_j, Jq_j, Js_j = edge_residuals_and_jacobians(
        jnp.asarray(pos), jnp.asarray(quat), jnp.asarray(sw), edges, 0.03
    )
    r_n, Jr_n, Jq_n, Js_n = np_edge_residuals_and_jacobians(
        pos, quat, sw, ref, qry, rel_t, rel_q, is_loop, 0.03
    )
    np.testing.assert_allclose(r_n, np.array(r_j), rtol=0, atol=1e-13)
    np.testing.assert_allclose(Jr_n, np.array(Jr_j), rtol=0, atol=1e-13)
    np.testing.assert_allclose(Jq_n, np.array(Jq_j), rtol=0, atol=1e-13)
    np.testing.assert_allclose(Js_n, np.array(Js_j), rtol=0, atol=1e-13)


def test_no_marginalization_matches_batch():
    """lag >= N means the final update IS the batch problem (same gauge,
    same edges): optima must agree to solver tolerance."""
    gt, odo, loops = _circle_fixture(n=18)
    sm = _run_smoother(lag=50, gt=gt, odo=odo, loops=loops)
    assert sm.window == list(range(18))  # nothing marginalized
    opt = _run_batch(gt, odo, loops)
    for i in range(18):
        np.testing.assert_allclose(
            sm.get_pose(i).translation, opt.get_pose(i).translation, atol=5e-6
        )
        np.testing.assert_allclose(
            sm.get_pose(i).rotation, opt.get_pose(i).rotation, atol=5e-6
        )


def test_marginalization_exact_at_optimum():
    """THE marginalization-correctness oracle: at a converged joint
    optimum the marginal's gradient is zero, so marginalizing any subset
    (here 12 poses incl. a loop edge + its switch, with NONZERO residuals
    feeding the Schur-complemented g and the prior mean) and re-solving
    must leave every window pose where it was. Exercises the full
    H/g/Schur/sqrt-factor/mean pipeline — an error in any sign or term
    moves the window."""
    gt, odo, loops = _circle_fixture(n=20)
    sm = FixedLagSmoother(lag=100, switch_penalty=0.03, max_iterations=200)
    est = gt[0]
    sm.add_pose(0, est)
    for k in range(1, 20):
        est = Pose(
            est.rotation @ odo[k - 1].rotation,
            est.translation + est.rotation @ odo[k - 1].translation,
        )
        sm.add_pose(k, est)
        sm.add_odometry(k - 1, k, odo[k - 1])
        if k in loops:
            sm.add_loop(k - 8, k, loops[k])
    sm.update()  # converged full-window optimum
    before = {i: sm.get_pose(i).translation.copy() for i in sm.window}
    sm.lag = 8
    sm.update()  # marginalizes poses 0..11 (incl. loop (2, 10) + switch)
    assert sm.window == list(range(12, 20))
    moved = max(
        np.linalg.norm(sm.get_pose(i).translation - before[i]) for i in sm.window
    )
    assert moved < 1e-5, moved


def test_marginalized_smoother_tracks_batch():
    """Finite lag on a LOW-noise fixture: marginalization linearization
    error is second-order in the noise, so window estimates must stay
    close to the full-history MAP. (On high-noise fixtures fixed-lag is
    legitimately suboptimal — frozen history cannot be retro-corrected
    by later loop closures; that gap is inherent, not a bug.)"""
    gt, odo, loops = _circle_fixture(n=30, s_t=0.006, s_r=0.001)
    sm = _run_smoother(lag=12, gt=gt, odo=odo, loops=loops)
    assert sm.window == list(range(18, 30))
    opt = _run_batch(gt, odo, loops)
    for i in sm.window:
        d = np.linalg.norm(sm.get_pose(i).translation - opt.get_pose(i).translation)
        assert d < 0.05, (i, d)

    # and it must beat plain dead reckoning on ground-truth error
    dr = _dead_reckon(gt[0], odo)
    err_sm = np.mean(
        [np.linalg.norm(sm.get_pose(i).translation - gt[i].translation) for i in sm.window]
    )
    err_dr = np.mean(
        [np.linalg.norm(dr[i].translation - gt[i].translation) for i in sm.window]
    )
    assert err_sm < err_dr


def test_marginalized_poses_are_frozen():
    gt, odo, loops = _circle_fixture(n=24)
    sm = FixedLagSmoother(lag=8, switch_penalty=0.03)
    sm.add_pose(0, gt[0])
    est = gt[0]
    snapshot = {}
    for k in range(1, 24):
        est = Pose(
            est.rotation @ odo[k - 1].rotation,
            est.translation + est.rotation @ odo[k - 1].translation,
        )
        sm.add_pose(k, est)
        sm.add_odometry(k - 1, k, odo[k - 1])
        sm.update()
        est = sm.get_pose(k)
        for i in range(k + 1):
            if i not in sm.window and i not in snapshot:
                snapshot[i] = sm.get_pose(i).translation.copy()
    assert snapshot  # something was marginalized
    for i, t in snapshot.items():
        np.testing.assert_array_equal(sm.get_pose(i).translation, t)


def test_outlier_loop_switched_off_in_window():
    """A wildly-wrong loop closure inside the window must be rejected by
    its switch variable while a good loop stays on."""
    gt, odo, _ = _circle_fixture(n=14, s_t=0.01, s_r=0.002)
    sm = FixedLagSmoother(lag=14, switch_penalty=0.03)
    est = gt[0]
    sm.add_pose(0, est)
    for k in range(1, 14):
        est = Pose(
            est.rotation @ odo[k - 1].rotation,
            est.translation + est.rotation @ odo[k - 1].translation,
        )
        sm.add_pose(k, est)
        sm.add_odometry(k - 1, k, odo[k - 1])
        sm.update()
        est = sm.get_pose(k)
    # good loop: true relative pose 3 -> 13
    Ri, ti = gt[3].rotation, gt[3].translation
    sm.add_loop(3, 13, Pose(Ri.T @ gt[13].rotation, Ri.T @ (gt[13].translation - ti)))
    # outlier: identity relative pose between far-apart poses (the
    # reference fixture's planted outlier, simple_optimization_test.cc:100)
    sm.add_loop(2, 9, Pose(np.eye(3), np.zeros(3)))
    sm.update()
    s_good, s_bad = sm.loop_switches()
    assert s_good > 0.8, s_good
    assert s_bad < 0.2, s_bad


def test_marginalization_absorbs_switch_variables():
    """Loops whose endpoints leave the window are marginalized out with
    their switch variables; remaining active loops keep theirs."""
    gt, odo, loops = _circle_fixture(n=30)
    sm = _run_smoother(lag=10, gt=gt, odo=odo, loops=loops)
    # loops at k=10 (edge 2-10) and k=20 (edge 12-20) are long gone;
    # only none or the newest can remain active
    assert len(sm.loop_switches()) <= 1


def test_api_validation():
    sm = FixedLagSmoother(lag=5)
    with pytest.raises(ValueError):
        FixedLagSmoother(lag=1)
    sm.add_pose(0, Pose(np.eye(3), np.zeros(3)))
    with pytest.raises(ValueError):
        sm.add_pose(2, Pose(np.eye(3), np.zeros(3)))  # gap
    sm.add_pose(1, Pose(np.eye(3), np.ones(3)))
    with pytest.raises(KeyError):
        sm.add_odometry(1, 7, Pose(np.eye(3), np.zeros(3)))
    with pytest.raises(ValueError):
        sm.add_odometry(1, 1, Pose(np.eye(3), np.zeros(3)))


def test_update_without_edges_is_trivially_converged():
    sm = FixedLagSmoother(lag=4)
    sm.add_pose(0, Pose(np.eye(3), np.zeros(3)))
    summary = sm.update()
    assert bool(summary.converged)
    np.testing.assert_array_equal(sm.get_pose(0).translation, np.zeros(3))


def test_constant_shape_compile_reuse():
    """A long streaming run must reuse a handful of compiled window
    programs (padded pose count, bucketed edge/loop/prior-support
    shapes) — one compile per distinct bucket combination, NOT one per
    update. On the production runtime a recompile costs 26-500 s, so
    shape churn would make online use impossible."""
    from nonlinear_optimizer_for_slam_tpu.solvers.pose_graph import (
        _pose_graph_solve,
    )

    gt, odo, loops = _circle_fixture(n=40)
    before = _pose_graph_solve._cache_size()
    _run_smoother(lag=12, gt=gt, odo=odo, loops=loops)
    added = _pose_graph_solve._cache_size() - before
    # warmup (growing window, no prior) + steady state (prior present,
    # loop-count buckets 0/2) — generous bound, far below 39 updates
    assert added <= 6, f"expected few compiles, got {added}"


def test_realistic_noise_matches_batch_and_converges():
    """Regression for the tangent-space prior: on REALISTIC odometry
    noise (0.02 m / 0.004 rad per step — the earlier raw-ambient prior
    diverged here and did worse than dead reckoning), every update must
    converge and the window estimates must reach batch-MAP quality.

    Also plants an identity-pose outlier loop mid-run: rejection must
    leave the trajectory untouched (same final error as without it)."""
    gt, odo, loops = _circle_fixture(n=40, s_t=0.02, s_r=0.004, seed=11)
    opt = _run_batch(gt, odo, loops)

    errs = {}
    for outlier in (False, True):
        sm = FixedLagSmoother(lag=14, switch_penalty=0.03)
        est = gt[0]
        sm.add_pose(0, est)
        for k in range(1, 40):
            est = Pose(
                est.rotation @ odo[k - 1].rotation,
                est.translation + est.rotation @ odo[k - 1].translation,
            )
            sm.add_pose(k, est)
            sm.add_odometry(k - 1, k, odo[k - 1])
            if k in loops:
                sm.add_loop(k - 8, k, loops[k])
            if outlier and k == 25:
                sm.add_loop(15, 25, Pose(np.eye(3), np.zeros(3)))
            s = sm.update()
            assert bool(s.converged), f"update k={k} did not converge"
            est = sm.get_pose(k)
        if outlier:
            # the planted outlier has left the window by k=39; it must
            # have been switched off, not folded into the prior estimate
            pass
        errs[outlier] = np.array(
            [
                np.linalg.norm(sm.get_pose(i).translation - gt[i].translation)
                for i in range(40)
            ]
        )

    batch_err = np.array(
        [
            np.linalg.norm(opt.get_pose(i).translation - gt[i].translation)
            for i in range(40)
        ]
    )
    # online estimates can't beat batch, but must be close to it
    assert errs[False].mean() < 1.5 * batch_err.mean() + 0.05
    # outlier rejection must not perturb the trajectory materially
    np.testing.assert_allclose(errs[True], errs[False], atol=0.05)


def test_matrix_sqrt_info_through_marginalization():
    """Full-matrix edge sqrt-information flows through the smoother's
    device window solves AND the host-side marginalization: a diagonal
    passed as (6,) vectors and the same diagonal passed as (6, 6)
    matrices must produce identical trajectories (finite lag, so the
    marginal prior is built from whitened linearizations)."""
    gt, odo, loops = _circle_fixture(n=22)
    w_odo = np.array([20.0, 20.0, 20.0, 60.0, 60.0, 60.0])
    w_loop = np.array([50.0, 50.0, 50.0, 150.0, 150.0, 150.0])

    def run(as_matrix):
        sw = (lambda v: np.diag(v)) if as_matrix else (lambda v: v)
        n = len(gt)
        sm = FixedLagSmoother(lag=8, switch_penalty=3.0)
        est = gt[0]
        sm.add_pose(0, est)
        for k in range(1, n):
            est = Pose(
                est.rotation @ odo[k - 1].rotation,
                est.translation + est.rotation @ odo[k - 1].translation,
            )
            sm.add_pose(k, est)
            sm.add_odometry(k - 1, k, odo[k - 1], sqrt_info=sw(w_odo))
            if k in loops:
                sm.add_loop(k - 8, k, loops[k], sqrt_info=sw(w_loop))
            s = sm.update()
            assert bool(s.converged)
            est = sm.get_pose(k)
        return sm

    sm_vec = run(False)
    sm_mat = run(True)
    for i in range(22):
        np.testing.assert_allclose(
            sm_mat.get_pose(i).translation, sm_vec.get_pose(i).translation,
            atol=1e-8,
        )
        np.testing.assert_allclose(
            sm_mat.get_pose(i).rotation, sm_vec.get_pose(i).rotation, atol=1e-8
        )


def test_update_async_bit_identical_to_blocking():
    """Round-5 streaming mode: update_async defers the fetch/write-back/
    marginalization to the next frame (or any read) — the SAME jitted
    program runs on the same inputs, so every estimate, switch value,
    and frozen history entry must be BIT-identical to the blocking
    update() stream. get_pose/loop_switches/window transparently flush."""
    gt, odo, loops = _circle_fixture(n=26)

    def run(async_mode):
        n = len(gt)
        sm = FixedLagSmoother(lag=8, switch_penalty=0.03)
        est = gt[0]
        sm.add_pose(0, est)
        for k in range(1, n):
            est = Pose(
                est.rotation @ odo[k - 1].rotation,
                est.translation + est.rotation @ odo[k - 1].translation,
            )
            sm.add_pose(k, est)
            sm.add_odometry(k - 1, k, odo[k - 1])
            if k in loops:
                sm.add_loop(k - 8, k, loops[k])
            if async_mode:
                sm.update_async()
            else:
                sm.update()
            # no feed-forward: keep the input streams identical without
            # forcing a flush in the async stream
        sm.flush()
        return sm

    blocking = run(False)
    streaming = run(True)
    assert streaming.window == blocking.window
    for k in range(len(gt)):
        ps, pb = streaming.get_pose(k), blocking.get_pose(k)
        np.testing.assert_array_equal(ps.translation, pb.translation)
        np.testing.assert_array_equal(ps.rotation, pb.rotation)
    np.testing.assert_array_equal(
        streaming.loop_switches(), blocking.loop_switches()
    )
    s_b, s_s = blocking.last_summary, streaming.last_summary
    assert int(s_b.iterations) == int(s_s.iterations)
    assert float(s_b.final_cost) == float(s_s.final_cost)


def test_update_async_flushes_on_reads_and_edges():
    """A pending async update is applied before any dependent operation:
    get_pose reflects the solve, and an edge to a pose that the pending
    marginalization removes raises exactly like the blocking path."""
    gt, odo, loops = _circle_fixture(n=14)
    sm = FixedLagSmoother(lag=4, switch_penalty=0.03)
    est = gt[0]
    sm.add_pose(0, est)
    for k in range(1, 9):
        est = Pose(
            est.rotation @ odo[k - 1].rotation,
            est.translation + est.rotation @ odo[k - 1].translation,
        )
        sm.add_pose(k, est)
        sm.add_odometry(k - 1, k, odo[k - 1])
        sm.update_async()
    # pose 3 left the window during the pending marginalizations
    assert 3 not in sm.window  # property flushed
    with pytest.raises(KeyError):
        sm.add_odometry(3, 8, odo[3])


def test_amortized_streaming_tracks_blocking():
    """marginalize_every=N streaming (round 5): async window solves
    every frame, fetch+marginalization every N. Semantics differ from
    the blocking path only in marginalization timing/linearization, so
    the published estimates must TRACK the blocking stream tightly
    (both are window MAPs of the same factors) and frozen history must
    exist for every marginalized pose."""
    gt, odo, loops = _circle_fixture(n=30)

    def run(me):
        n = len(gt)
        sm = FixedLagSmoother(lag=8, switch_penalty=0.03,
                              marginalize_every=me)
        est = gt[0]
        sm.add_pose(0, est)
        for k in range(1, n):
            est = Pose(
                est.rotation @ odo[k - 1].rotation,
                est.translation + est.rotation @ odo[k - 1].translation,
            )
            sm.add_pose(k, est)
            sm.add_odometry(k - 1, k, odo[k - 1])
            if k in loops and loops and (k - 8) in sm._est:
                sm.add_loop(k - 8, k, loops[k])
            sm.update_async()
        sm.flush()
        return sm

    blocking = run(1)
    amortized = run(4)
    assert amortized.window == blocking.window
    for k in range(len(gt)):
        pb, pa = blocking.get_pose(k), amortized.get_pose(k)
        np.testing.assert_allclose(pa.translation, pb.translation, atol=0.05)
    # every non-window pose is frozen history
    for k in range(len(gt)):
        if k not in amortized.window:
            assert k in amortized._history
