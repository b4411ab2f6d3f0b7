"""Batched (serving-mode) pose-graph solving.

``PoseGraphOptimizer.solve_batch`` vmaps the dense direct device program
over B instances sharing one topology. Anchors here:

- per-instance parity: every batched instance reproduces the individual
  ``solve()`` on its own measurements/initial state (the reference's
  one-problem-per-Solve semantics, pose_graph_optimizer.h:67, preserved
  under batching);
- Monte-Carlo covariance validation: the ensemble scatter of B solutions
  under resampled measurement noise matches ``covariance()``'s
  Gauss-Newton marginals — an independent statistical oracle for BOTH
  features (the FD oracle in test_covariance checks the linearization;
  this checks the actual estimator distribution).
"""

import numpy as np
import pytest

from nonlinear_optimizer_for_slam_tpu.core import Options
from nonlinear_optimizer_for_slam_tpu.core.pose import (
    Pose,
    np_axis_angle_to_quat,
    np_quat_to_rotmat,
)
from nonlinear_optimizer_for_slam_tpu.solvers.pose_graph import (
    ConstraintType,
    PoseGraphOptimizer,
)


def _quat_mul(a, q):
    """Hamilton product, wxyz (numpy, batched on leading dims)."""
    w1, x1, y1, z1 = np.moveaxis(a, -1, 0)
    w2, x2, y2, z2 = np.moveaxis(q, -1, 0)
    return np.stack(
        [
            w1 * w2 - x1 * x2 - y1 * y2 - z1 * z2,
            w1 * x2 + x1 * w2 + y1 * z2 - z1 * y2,
            w1 * y2 - x1 * z2 + y1 * w2 + z1 * x2,
            w1 * z2 + x1 * y2 - y1 * x2 + z1 * w2,
        ],
        axis=-1,
    )


def _rz(a):
    c, s = np.cos(a), np.sin(a)
    return np.array([[c, -s, 0.0], [s, c, 0.0], [0.0, 0.0, 1.0]])


def _ring_world(P=10, loops=((0, 5), (2, 7))):
    """Small ring trajectory + chord closures, exact measurements."""
    pos = np.stack(
        [
            np.array(
                [np.cos(2 * np.pi * i / P), np.sin(2 * np.pi * i / P), 0.05 * i]
            )
            for i in range(P)
        ]
    )
    rots = [_rz(2 * np.pi * i / P) for i in range(P)]
    pairs = [(i, i + 1) for i in range(P - 1)] + [tuple(l) for l in loops]
    rels = []
    for i, j in pairs:
        rels.append(
            Pose(rots[i].T @ rots[j], rots[i].T @ (pos[j] - pos[i]))
        )
    return pos, rots, pairs, rels


def _build(pos, rots, pairs, rels, sqrt_info, init_noise=0.0, seed=0):
    rng = np.random.default_rng(seed)
    opt = PoseGraphOptimizer()
    for i in range(len(pos)):
        dp = init_noise * rng.standard_normal(3) if i else np.zeros(3)
        opt.set_pose(i, Pose(rots[i], pos[i] + dp))
    opt.set_pose_constant(0)
    for (i, j), rel in zip(pairs, rels):
        opt.set_constraint(i, j, rel, ConstraintType.ODOMETRY, sqrt_info=sqrt_info)
    return opt


def _perturb_measurements(rels, sigma_t, sigma_r, rng):
    """Measurement-noise model matched to diagonal sqrt_info
    [1/sigma_t x3, 1/sigma_r x3]: t_rel += N(0, sigma_t^2 I) and
    q_rel (x)= exp(N(0, sigma_r^2 I)) make the whitened 6-D residual at
    the true poses ~ N(0, I) to first order (r_t = -R_ref eps_t is an
    isotropic-covariance rotation; r_q = 2 vec(dq) ~ eps_r)."""
    t = np.stack([r.translation for r in rels])
    q = np.stack([r.quaternion() for r in rels])
    t = t + sigma_t * rng.standard_normal(t.shape)
    dq = np.stack(
        [np_axis_angle_to_quat(w) for w in sigma_r * rng.standard_normal(t.shape)]
    )
    return t, _quat_mul(q, dq)


SIGMA_T, SIGMA_R = 0.03, 0.02
SQRT_INFO = np.array([1.0 / SIGMA_T, 1.0 / SIGMA_R])


def test_batch_instances_match_individual_solves():
    pos, rots, pairs, rels = _ring_world()
    opts = Options().replace(max_iterations=50)
    rng = np.random.default_rng(7)
    B = 3

    batch_t, batch_q = [], []
    individual = []
    for b in range(B):
        t, q = _perturb_measurements(rels, SIGMA_T, SIGMA_R, rng)
        batch_t.append(t)
        batch_q.append(q)
        noisy_rels = [
            Pose(np_quat_to_rotmat(qk / np.linalg.norm(qk)), tk)
            for tk, qk in zip(t, q)
        ]
        one = _build(
            pos, rots, pairs, noisy_rels, SQRT_INFO, init_noise=0.05, seed=b
        )
        summary, sw = one.solve(opts)
        individual.append(
            (
                np.stack([one.get_pose(i).translation for i in range(len(pos))]),
                np.stack([one.get_pose(i).quaternion() for i in range(len(pos))]),
                int(summary.iterations),
            )
        )

    shared = _build(pos, rots, pairs, rels, SQRT_INFO)

    # reproduce each instance's initial state exactly as _build(seed=b) did
    init_list = []
    for b in range(B):
        r = np.random.default_rng(b)
        init_list.append(
            np.stack(
                [
                    pos[i] + (0.05 * r.standard_normal(3) if i else np.zeros(3))
                    for i in range(len(pos))
                ]
            )
        )
    init_p = np.stack(init_list)
    init_q = np.broadcast_to(
        np.stack([Pose(rots[i], pos[i]).quaternion() for i in range(len(pos))]),
        (B, len(pos), 4),
    )

    bpos, bquat, bsw, bsum = shared.solve_batch(
        initial_positions=init_p,
        initial_quaternions=init_q,
        relative_translations=np.stack(batch_t),
        relative_quaternions=np.stack(batch_q),
        options=opts,
    )

    for b in range(B):
        ref_p, ref_q, ref_it = individual[b]
        np.testing.assert_allclose(bpos[b], ref_p, atol=1e-9)
        # quaternion sign is a gauge: compare up to sign
        s = np.sign(np.sum(bquat[b] * ref_q, axis=1, keepdims=True))
        np.testing.assert_allclose(bquat[b] * s, ref_q, atol=1e-9)
        assert int(np.asarray(bsum.iterations)[b]) == ref_it
    # distinct noise draws must converge to distinct optima
    assert np.abs(bpos[0] - bpos[1]).max() > 1e-4


def test_batch_default_broadcast_matches_solve():
    pos, rots, pairs, rels = _ring_world()
    opts = Options().replace(max_iterations=50)
    opt = _build(pos, rots, pairs, rels, SQRT_INFO, init_noise=0.08, seed=3)
    ref = _build(pos, rots, pairs, rels, SQRT_INFO, init_noise=0.08, seed=3)
    ref.solve(opts)
    bpos, bquat, _, _ = opt.solve_batch(batch_size=2, options=opts)
    for b in range(2):
        np.testing.assert_allclose(
            bpos[b],
            np.stack([ref.get_pose(i).translation for i in range(len(pos))]),
            atol=1e-9,
        )


def test_batch_validation():
    pos, rots, pairs, rels = _ring_world()
    opt = _build(pos, rots, pairs, rels, SQRT_INFO)
    with pytest.raises(ValueError, match="batch size"):
        opt.solve_batch()
    with pytest.raises(ValueError, match="inconsistent"):
        opt.solve_batch(
            batch_size=2, initial_positions=np.zeros((3, len(pos), 3))
        )
    with pytest.raises(ValueError, match="initial_positions"):
        opt.solve_batch(initial_positions=np.zeros((2, 3, 3)))
    cg = PoseGraphOptimizer(solver="cg")
    cg.set_pose(0, Pose.identity())
    cg.set_pose(1, Pose.identity())
    cg.set_constraint(0, 1, Pose.identity())
    with pytest.raises(ValueError, match="dense"):
        cg.solve_batch(batch_size=2)
    empty = PoseGraphOptimizer()
    empty.set_pose(0, Pose.identity())
    with pytest.raises(ValueError, match="no constraints"):
        empty.solve_batch(batch_size=2)


def test_monte_carlo_ensemble_matches_covariance():
    """Statistical oracle: B resampled-measurement solves from the true
    state scatter with exactly the Gauss-Newton covariance (to O(1/sqrt(B))
    sampling error and linearization error at these noise levels)."""
    pos, rots, pairs, rels = _ring_world(P=8, loops=((0, 4),))
    P = len(pos)
    opts = Options().replace(max_iterations=30)

    opt = _build(pos, rots, pairs, rels, SQRT_INFO)
    opt.solve(opts)  # exact measurements: stays at truth
    cov = opt.covariance()

    B = 768
    rng = np.random.default_rng(42)
    ts = np.empty((B, len(rels), 3))
    qs = np.empty((B, len(rels), 4))
    for b in range(B):
        ts[b], qs[b] = _perturb_measurements(rels, SIGMA_T, SIGMA_R, rng)
    bpos, bquat, _, bsum = opt.solve_batch(
        relative_translations=ts, relative_quaternions=qs, options=opts
    )
    assert np.all(np.asarray(bsum.converged))

    true_q = np.stack([Pose(rots[i], pos[i]).quaternion() for i in range(P)])
    for i in (3, P - 1):  # mid-chain and chain-end marginals
        dp = bpos[:, i, :] - pos[i]
        # tangent rotation deviation: 2 vec(q_true^* (x) q_hat), sign-fixed
        qi = bquat[:, i, :] * np.sign(bquat[:, i, :1])
        conj = true_q[i] * np.array([1.0, -1.0, -1.0, -1.0])
        dq = _quat_mul(np.broadcast_to(conj, qi.shape), qi)
        dth = 2.0 * dq[:, 1:]
        x = np.concatenate([dp, dth], axis=1)  # (B, 6)
        x = x - x.mean(axis=0)
        sample = (x.T @ x) / (B - 1)
        # elementwise via Frobenius: sampling error ~ sqrt(2/B) ~ 5%
        err = np.linalg.norm(sample - cov[i]) / np.linalg.norm(cov[i])
        assert err < 0.25, f"pose {i}: ensemble-vs-GN covariance off by {err:.3f}"
        diag_ratio = np.diag(sample) / np.diag(cov[i])
        assert np.all(diag_ratio > 0.75) and np.all(diag_ratio < 1.3), diag_ratio


def test_2d_solve_batch_matches_individual_solves():
    """SE(2) serving mode: B measurement realizations of one topology in
    one vmapped program match per-instance individual solves."""
    import numpy as np

    from nonlinear_optimizer_for_slam_tpu.core import Options
    from nonlinear_optimizer_for_slam_tpu.solvers.pose_graph import (
        ConstraintType,
        PoseGraphOptimizer2D,
    )

    rng = np.random.default_rng(9)
    P = 24
    gt = np.stack(
        [
            [np.cos(2 * np.pi * k / P) * 5,
             np.sin(2 * np.pi * k / P) * 5,
             np.arctan2(np.cos(2 * np.pi * k / P), -np.sin(2 * np.pi * k / P))]
            for k in range(P)
        ]
    )

    def rel(a, b):
        c, s = np.cos(a[2]), np.sin(a[2])
        dp = b[:2] - a[:2]
        return np.array(
            [c * dp[0] + s * dp[1], -s * dp[0] + c * dp[1],
             np.arctan2(np.sin(b[2] - a[2]), np.cos(b[2] - a[2]))]
        )

    def build():
        opt = PoseGraphOptimizer2D(switch_penalty=1.0)
        noisy = gt + np.concatenate(
            [0.1 * rng.standard_normal((P, 2)), 0.05 * rng.standard_normal((P, 1))],
            axis=1,
        )
        noisy[0] = gt[0]
        for k in range(P):
            opt.set_pose(k, noisy[k])
        opt.set_pose_constant(0)
        for k in range(P - 1):
            opt.set_constraint(k, k + 1, rel(gt[k], gt[k + 1]))
        opt.set_constraint(0, P // 2, rel(gt[0], gt[P // 2]), ConstraintType.LOOP)
        return opt

    opt = build()
    B = 4
    cons = opt.constraints()
    rel0 = np.stack([c["relative_xyt"] for c in cons])
    rels = rel0[None] + 1e-3 * rng.standard_normal((B,) + rel0.shape)
    init = np.stack([opt.get_pose(k) for k in opt.pose_indices()])
    init_b = np.broadcast_to(init, (B, P, 3))

    opts = Options().replace(max_iterations=100)
    xyt_b, sw_b, summary = opt.solve_batch(
        initial_xyt=init_b, relative_xyt=rels, options=opts
    )
    assert xyt_b.shape == (B, P, 3) and sw_b.shape == (B, 1)

    for b in range(B):
        single = build()
        for k in range(P):
            single.set_pose(k, init[k])
        # overwrite measurements with instance b's realization
        single._constraints = []
        for e, c in enumerate(cons):
            single.set_constraint(
                c["reference_index"], c["query_index"], rels[b, e], c["type"]
            )
        s, sw = single.solve(opts)
        ref = np.stack([single.get_pose(k) for k in single.pose_indices()])
        np.testing.assert_allclose(xyt_b[b], ref, atol=1e-8)
        np.testing.assert_allclose(sw_b[b], sw, atol=1e-8)
