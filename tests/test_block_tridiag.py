"""Block-tridiagonal cyclic-reduction solver + the "tridiag" pose-graph path.

The solver realizes what the reference's pose-graph TODO stub names as the
intended design (Eigen SimplicialLLT on the sparse normal system,
pose_graph_optimizer_analytic.cc:12-51) — but as a TPU-shaped direct
method: log-depth batched cyclic reduction instead of sequential pivots,
plus a Woodbury correction for loop closures. Because it is EXACT (unlike
truncated CG), the pose-graph parity tolerance here is float-reassociation
tight, not Krylov-truncation loose.
"""

import jax.numpy as jnp
import numpy as np
import pytest

import nonlinear_optimizer_for_slam_tpu as nls
from nonlinear_optimizer_for_slam_tpu.core import Options
from nonlinear_optimizer_for_slam_tpu.solvers import block_tridiag
from nonlinear_optimizer_for_slam_tpu.solvers.pose_graph import (
    ConstraintType,
    PoseGraphOptimizer,
)
from nonlinear_optimizer_for_slam_tpu.utils import testing


def _random_spd_tridiag(rng, P, k):
    """Random SPD block-tridiagonal system as (D, O) + its dense form."""
    O = rng.normal(size=(P - 1, k, k)) if P > 1 else np.zeros((0, k, k))
    D = np.zeros((P, k, k))
    dense = np.zeros((P, k, P, k))
    for i in range(P):
        # diagonal dominance over both neighbors makes T SPD
        A = rng.normal(size=(k, k))
        D[i] = A @ A.T + (2.0 * k + 4.0) * np.eye(k)
        dense[i, :, i, :] = D[i]
    for i in range(P - 1):
        dense[i, :, i + 1, :] = O[i]
        dense[i + 1, :, i, :] = O[i].T
    return D, O, dense.reshape(P * k, P * k)


@pytest.mark.parametrize("P", [1, 2, 3, 7, 16, 33, 100])
def test_solve_matches_dense(rng, P):
    """Cyclic reduction == dense numpy solve, odd and even sizes, with the
    reduction levels actually exercised (dense_cutoff below P)."""
    k = 5
    D, O, T = _random_spd_tridiag(rng, P, k)
    b = rng.normal(size=(P, k))
    x = block_tridiag.solve(
        jnp.asarray(D), jnp.asarray(O), jnp.asarray(b), dense_cutoff=2
    )
    expected = np.linalg.solve(T, b.ravel()).reshape(P, k)
    np.testing.assert_allclose(np.asarray(x), expected, rtol=1e-9, atol=1e-9)


def test_solve_multiple_rhs_and_cutoffs(rng):
    """(P, k, m) right-hand sides solved together; every dense_cutoff
    (pure dense tail .. full reduction) lands on the same answer."""
    P, k, m = 37, 7, 9
    D, O, T = _random_spd_tridiag(rng, P, k)
    B = rng.normal(size=(P, k, m))
    expected = np.linalg.solve(T, B.reshape(P * k, m)).reshape(P, k, m)
    for cutoff in (1, 2, 5, 64, 1024):
        x = block_tridiag.solve(
            jnp.asarray(D), jnp.asarray(O), jnp.asarray(B), dense_cutoff=cutoff
        )
        np.testing.assert_allclose(
            np.asarray(x), expected, rtol=1e-9, atol=1e-9, err_msg=f"{cutoff=}"
        )


def test_solve_accepts_full_length_offdiag(rng):
    """A (P, k, k) off-diagonal array (trailing block ignored) gives the
    same answer as the (P-1, k, k) form — the pose-graph caller passes
    whichever its chain bookkeeping produces."""
    P, k = 12, 4
    D, O, T = _random_spd_tridiag(rng, P, k)
    b = rng.normal(size=(P, k))
    O_full = np.concatenate([O, rng.normal(size=(1, k, k))], axis=0)
    x1 = block_tridiag.solve(jnp.asarray(D), jnp.asarray(O), jnp.asarray(b))
    x2 = block_tridiag.solve(jnp.asarray(D), jnp.asarray(O_full), jnp.asarray(b))
    np.testing.assert_allclose(np.asarray(x1), np.asarray(x2), atol=1e-12)


# ---------------------------------------------------------------------------
# pose-graph "tridiag" solver path
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def fixture():
    return testing.generate_pose_graph_fixture()


def _build(fixture, **kwargs):
    true_poses, noisy_poses, constraints = fixture
    opt = PoseGraphOptimizer(**kwargs)
    for i, p in enumerate(noisy_poses):
        opt.set_pose(i, p)
    opt.set_pose_constant(0)
    for c in constraints:
        opt.set_constraint(
            c["reference_index"],
            c["query_index"],
            c["relative_pose"],
            ConstraintType.LOOP if c["is_loop"] else ConstraintType.ODOMETRY,
        )
    return opt


def test_tridiag_matches_dense_exactly(fixture):
    """The direct solver computes the SAME damped-GN step as the dense
    path (Woodbury identity, not Krylov truncation), so the full LM
    trajectory agrees to float reassociation — orders tighter than the
    CG path's 5e-4 tolerance."""
    opt_d = _build(fixture, switch_penalty=0.03)
    opt_t = _build(fixture, switch_penalty=0.03, solver="tridiag")
    s_d, sw_d = opt_d.solve()
    s_t, sw_t = opt_t.solve()
    np.testing.assert_allclose(
        float(s_t.final_cost), float(s_d.final_cost), rtol=1e-10
    )
    np.testing.assert_allclose(np.asarray(sw_t), np.asarray(sw_d), atol=1e-9)
    for i in range(80):
        np.testing.assert_allclose(
            opt_t.get_pose(i).translation,
            opt_d.get_pose(i).translation,
            atol=1e-9,
        )
    # outlier loop still discriminated
    assert np.abs(sw_t[3]) < 0.1 and np.all(np.abs(sw_t[:3]) > 0.5)


def test_tridiag_with_edge_loss_matches_dense(fixture):
    """Robust edge weighting flows through the tridiag assembly the same
    way it flows through the dense one."""
    from nonlinear_optimizer_for_slam_tpu.core import HuberLoss

    opt_d = _build(fixture, switch_penalty=0.03, edge_loss=HuberLoss(1.0))
    opt_t = _build(
        fixture, switch_penalty=0.03, edge_loss=HuberLoss(1.0), solver="tridiag"
    )
    s_d, _ = opt_d.solve()
    s_t, _ = opt_t.solve()
    np.testing.assert_allclose(
        float(s_t.final_cost), float(s_d.final_cost), rtol=1e-8
    )
    for i in range(80):
        np.testing.assert_allclose(
            opt_t.get_pose(i).translation,
            opt_d.get_pose(i).translation,
            atol=1e-7,
        )


def test_tridiag_broken_chain_falls_back_to_scatter(fixture):
    """A graph whose odometry backbone has a gap (pose j<->j+1 edge
    missing, bridged by a j<->j+2 edge) disables the shift-add fast path
    (chain_seq=False); the scatter fallback must still match dense."""
    true_poses, noisy_poses, constraints = fixture

    def build(**kwargs):
        opt = PoseGraphOptimizer(**kwargs)
        for i, p in enumerate(noisy_poses):
            opt.set_pose(i, p)
        opt.set_pose_constant(0)
        for c in constraints:
            if (c["reference_index"], c["query_index"]) == (40, 41):
                continue  # the gap
            opt.set_constraint(
                c["reference_index"],
                c["query_index"],
                c["relative_pose"],
                ConstraintType.LOOP if c["is_loop"] else ConstraintType.ODOMETRY,
            )
        # bridge: 40 <-> 42 odometry edge (non-adjacent => correction set)
        rel = nls.Pose.from_matrix(
            np.linalg.solve(true_poses[40].matrix(), true_poses[42].matrix())
        )
        opt.set_constraint(40, 42, rel)
        return opt

    opt_d = build(switch_penalty=0.03)
    opt_t = build(switch_penalty=0.03, solver="tridiag")
    s_d, _ = opt_d.solve()
    s_t, _ = opt_t.solve()
    np.testing.assert_allclose(
        float(s_t.final_cost), float(s_d.final_cost), rtol=1e-8
    )
    for i in range(80):
        np.testing.assert_allclose(
            opt_t.get_pose(i).translation,
            opt_d.get_pose(i).translation,
            atol=1e-7,
        )


def test_tridiag_scales_to_large_chain():
    """2,000-pose chain + loops, mirroring the CG scaling test — but the
    direct solver takes EXACT damped-GN steps, so it converges to the
    cost floor in the same LM budget where truncated CG only guarantees
    a linear-rate error reduction."""
    rng = np.random.default_rng(2)
    P = 2000
    true_pos = np.cumsum(0.2 * rng.normal(size=(P, 3)), axis=0)
    noisy_pos = true_pos + np.where(
        np.arange(P)[:, None] > 0, 0.05 * rng.normal(size=(P, 3)), 0.0
    )
    opt = PoseGraphOptimizer(solver="tridiag", switch_penalty=0.03)
    for i in range(P):
        opt.set_pose(i, nls.Pose(np.eye(3), noisy_pos[i]))
    opt.set_pose_constant(0)
    for i in range(P - 1):
        rel = nls.Pose(np.eye(3), true_pos[i + 1] - true_pos[i])
        opt.set_constraint(i, i + 1, rel)
    for a, b in [(0, P // 2), (P // 4, 3 * P // 4), (10, P - 10)]:
        rel = nls.Pose(np.eye(3), true_pos[b] - true_pos[a])
        opt.set_constraint(a, b, rel, ConstraintType.LOOP)
    opts = Options().replace(max_iterations=30)
    summary, _ = opt.solve(opts)
    err_before = max(
        np.linalg.norm(noisy_pos[i] - true_pos[i]) for i in range(P)
    )
    err = max(
        np.linalg.norm(opt.get_pose(i).translation - true_pos[i])
        for i in range(P)
    )
    # exact steps: full convergence, not just the CG test's 10x reduction
    assert err < 0.02 * err_before, (err, err_before)
    assert float(summary.final_cost) < 1e-8


def test_chunked_woodbury_many_loops_matches_dense():
    """>32 correction edges triggers the chunked-columns Woodbury path
    (lax.scan over edge chunks, sparse U^T application, one extra
    single-rhs tridiag solve); it must reproduce the dense solver's
    trajectory exactly. The dense-columns form OOMs around ~100 loops at
    50k poses ((P, Uc, 7, 7) tensors), which is what this path fixes."""
    import jax.numpy as jnp

    from nonlinear_optimizer_for_slam_tpu.core.options import Options
    from nonlinear_optimizer_for_slam_tpu.core.pose import Pose
    from nonlinear_optimizer_for_slam_tpu.solvers.pose_graph import (
        ConstraintType,
        PoseGraphOptimizer,
    )

    P = 260

    def run(solver):
        rng = np.random.default_rng(0)
        tp = np.cumsum(0.2 * rng.normal(size=(P, 3)), axis=0)
        nz = tp + np.where(
            np.arange(P)[:, None] > 0, 0.05 * rng.normal(size=(P, 3)), 0.0
        )
        opt = PoseGraphOptimizer(
            dtype=jnp.float64, switch_penalty=0.03, solver=solver
        )
        for i in range(P):
            opt.set_pose(i, Pose(np.eye(3), nz[i]))
        opt.set_pose_constant(0)
        for i in range(P - 1):
            opt.set_constraint(i, i + 1, Pose(np.eye(3), tp[i + 1] - tp[i]))
        for _ in range(50):  # > _CORR_DENSE_MAX -> chunked path
            a = int(rng.integers(0, P - 20))
            b = a + int(rng.integers(10, P - a - 1))
            opt.set_constraint(
                a, b, Pose(np.eye(3), tp[b] - tp[a]), ConstraintType.LOOP
            )
        summary, _ = opt.solve(Options().replace(max_iterations=30))
        t = np.stack([opt.get_pose(i).translation for i in range(P)])
        return t, float(summary.final_cost)

    t_dense, c_dense = run("dense")
    t_tri, c_tri = run("tridiag")
    np.testing.assert_allclose(t_tri, t_dense, atol=1e-8)
    assert abs(c_tri - c_dense) < 1e-6 * max(1.0, abs(c_dense))
