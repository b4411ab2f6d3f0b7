"""Nested-dissection multifrontal pose-graph solver (solver="sparse").

The reference's analytic pose-graph path is a stub whose comments name
"Sparse Cholesky" (pose_graph_optimizer_analytic.cc:12-51); the sparse
path is the TPU-native realization for loop-rich FAT-BANDWIDTH graphs
(Olson M3500-class arenas) where even the best band ordering couples
across the arena and the banded superblock solver degrades toward dense.
solvers/multifrontal.py holds the design narrative; these tests pin
exactness vs the dense path, robustness to shuffled ids / expander
topology (which the banded solver explicitly refuses), and the raw
module against an explicit dense factorization.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from nonlinear_optimizer_for_slam_tpu.core import Options
from nonlinear_optimizer_for_slam_tpu.core.pose import Pose
from nonlinear_optimizer_for_slam_tpu.solvers import multifrontal as mf
from nonlinear_optimizer_for_slam_tpu.solvers.pose_graph import (
    ConstraintType,
    PoseGraphOptimizer,
    PoseGraphOptimizer2D,
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
    opt.set_pose_constant(0)
    for c in constraints:
        opt.set_constraint(
            c["reference_index"],
            c["query_index"],
            c["relative_pose"],
            ConstraintType.LOOP if c["is_loop"] else ConstraintType.ODOMETRY,
        )
    return opt


# ---------------------------------------------------------------------------
# raw module: multifrontal vs explicit dense assembly
# ---------------------------------------------------------------------------


def _random_block_system(P, extra_edges, d, seed, grid=None):
    rng = np.random.default_rng(seed)
    ea, eb = [], []
    if grid is not None:
        n = grid
        for i in range(n):
            for j in range(n):
                if i + 1 < n:
                    ea.append(i * n + j)
                    eb.append((i + 1) * n + j)
                if j + 1 < n:
                    ea.append(i * n + j)
                    eb.append(i * n + j + 1)
    else:
        for i in range(P - 1):
            ea.append(i)
            eb.append(i + 1)
    for _ in range(extra_edges):
        a, b = rng.integers(0, P, 2)
        if a != b:
            ea.append(int(a))
            eb.append(int(b))
    ea, eb = np.array(ea), np.array(eb)
    E = len(ea)
    J = rng.normal(size=(E, d + 1, 2 * d))
    B_aa = np.einsum("eri,erj->eij", J[:, :, :d], J[:, :, :d])
    B_bb = np.einsum("eri,erj->eij", J[:, :, d:], J[:, :, d:])
    B_ab = np.einsum("eri,erj->eij", J[:, :, :d], J[:, :, d:])
    diag = rng.uniform(0.5, 2.0, size=(P, d))
    b = rng.normal(size=(P, d))
    H = np.zeros((P * d, P * d))
    for e in range(E):
        a_, b_ = ea[e], eb[e]
        H[a_ * d:(a_ + 1) * d, a_ * d:(a_ + 1) * d] += B_aa[e]
        H[b_ * d:(b_ + 1) * d, b_ * d:(b_ + 1) * d] += B_bb[e]
        H[a_ * d:(a_ + 1) * d, b_ * d:(b_ + 1) * d] += B_ab[e]
        H[b_ * d:(b_ + 1) * d, a_ * d:(a_ + 1) * d] += B_ab[e].T
    H += np.diag(diag.ravel())
    return ea, eb, B_aa, B_bb, B_ab, diag, b, H


@pytest.mark.parametrize("use_coords", [True, False])
def test_multifrontal_matches_dense_solve(use_coords):
    """Grid + random chords, d=3 blocks: the level-batched multifrontal
    factorization reproduces the dense np.linalg.solve answer to f64
    roundoff under both the geometric and the RCM cut oracles."""
    n = 16
    P = n * n
    ea, eb, B_aa, B_bb, B_ab, diag, b, H = _random_block_system(
        P, 40, 3, seed=0, grid=n
    )
    coords = (
        np.stack(
            np.meshgrid(np.arange(n), np.arange(n), indexing="ij"), -1
        ).reshape(P, 2).astype(float)
        if use_coords
        else None
    )
    plan = mf.symbolic(P, ea, eb, 3, coords=coords, leaf_size=16)
    x = mf.solve(
        plan, jnp.asarray(ea), jnp.asarray(eb), jnp.asarray(B_aa),
        jnp.asarray(B_bb), jnp.asarray(B_ab), jnp.asarray(diag),
        jnp.asarray(b),
    )
    x_ref = np.linalg.solve(H, b.ravel()).reshape(P, 3)
    np.testing.assert_allclose(np.asarray(x), x_ref, rtol=1e-9, atol=1e-11)


def test_multifrontal_factor_solve_reuse():
    """One factor serves many right-hand sides (the covariance /
    refinement access pattern)."""
    ea, eb, B_aa, B_bb, B_ab, diag, b, H = _random_block_system(
        60, 25, 2, seed=4
    )
    P = 60
    plan = mf.symbolic(P, ea, eb, 2, leaf_size=8)
    f32 = jnp.float32
    fact = mf.factor(
        plan, jnp.asarray(B_aa, f32), jnp.asarray(B_bb, f32),
        jnp.asarray(B_ab, f32), jnp.asarray(diag, f32),
    )
    rng = np.random.default_rng(1)
    for _ in range(3):
        rhs = rng.normal(size=(P, 2))
        x = mf.solve_factored(plan, fact, jnp.asarray(rhs, f32))
        x_ref = np.linalg.solve(H, rhs.ravel()).reshape(P, 2)
        rel = np.abs(np.asarray(x) - x_ref).max() / np.abs(x_ref).max()
        assert rel < 1e-4, rel  # single f32 solve, no refinement


def test_multifrontal_edge_matvec():
    ea, eb, B_aa, B_bb, B_ab, diag, _, H = _random_block_system(
        40, 15, 3, seed=7
    )
    rng = np.random.default_rng(2)
    x = rng.normal(size=(40, 3))
    y = mf.edge_matvec(
        jnp.asarray(ea), jnp.asarray(eb), jnp.asarray(B_aa),
        jnp.asarray(B_bb), jnp.asarray(B_ab), jnp.asarray(diag),
        jnp.asarray(x),
    )
    np.testing.assert_allclose(
        np.asarray(y), (H @ x.ravel()).reshape(40, 3), rtol=1e-12
    )


# ---------------------------------------------------------------------------
# 3D optimizer path
# ---------------------------------------------------------------------------


def test_sparse_matches_dense_exactly(fixture):
    """Sparse computes the SAME damped-GN step as the dense path (exact
    elimination): full-trajectory agreement including switch variables."""
    opt_d = _build(fixture, switch_penalty=0.03)
    opt_s = _build(fixture, switch_penalty=0.03, solver="sparse")
    s_d, sw_d = opt_d.solve()
    s_s, sw_s = opt_s.solve()
    np.testing.assert_allclose(
        float(s_s.final_cost), float(s_d.final_cost), rtol=1e-10
    )
    np.testing.assert_allclose(np.asarray(sw_s), np.asarray(sw_d), atol=1e-9)
    for i in range(80):
        np.testing.assert_allclose(
            opt_s.get_pose(i).translation,
            opt_d.get_pose(i).translation,
            atol=1e-9,
        )
    assert np.abs(sw_s[3]) < 0.1 and np.all(np.abs(sw_s[:3]) > 0.5)


def test_sparse_with_edge_loss_matches_dense(fixture):
    from nonlinear_optimizer_for_slam_tpu.core import HuberLoss

    opt_d = _build(fixture, switch_penalty=0.03, edge_loss=HuberLoss(1.0))
    opt_s = _build(
        fixture, switch_penalty=0.03, edge_loss=HuberLoss(1.0), solver="sparse"
    )
    s_d, _ = opt_d.solve()
    s_s, _ = opt_s.solve()
    np.testing.assert_allclose(
        float(s_s.final_cost), float(s_d.final_cost), rtol=1e-8
    )
    for i in range(80):
        np.testing.assert_allclose(
            opt_s.get_pose(i).translation,
            opt_d.get_pose(i).translation,
            atol=1e-7,
        )


def test_sparse_expander_graph_solves():
    """Uniformly random long loops give Theta(P) bandwidth under ANY
    ordering — the banded solver REFUSES this topology (its guard test,
    test_pose_graph_banded.py::test_banded_bandwidth_guard_raises); the
    multifrontal solver is exactly the missing solver class and must
    simply solve it."""
    rng = np.random.default_rng(3)
    P = 600
    pos = np.cumsum(0.1 * rng.normal(size=(P, 3)), axis=0)
    opt = PoseGraphOptimizer(switch_penalty=0.03, solver="sparse")
    for i in range(P):
        opt.set_pose(i, Pose(np.eye(3), pos[i]))
    opt.set_pose_constant(0)
    for i in range(P - 1):
        opt.set_constraint(i, i + 1, Pose(np.eye(3), pos[i + 1] - pos[i]))
    n_loops = 0
    for i in range(0, P, 4):
        b = int(rng.integers(0, P))
        if abs(b - i) < 2:
            b = (i + P // 2) % P
        a, b = min(i, b), max(i, b)
        opt.set_constraint(
            a, b, Pose(np.eye(3), pos[b] - pos[a]), ConstraintType.LOOP
        )
        n_loops += 1
    summary, sw = opt.solve(Options().replace(max_iterations=30))
    err = max(
        np.linalg.norm(opt.get_pose(i).translation - pos[i]) for i in range(P)
    )
    assert err < 1e-4, err
    assert np.all(np.asarray(sw) > 0.5)  # all loops are inliers here


def test_sparse_shuffled_ids():
    """Pose ids registered in shuffled order still solve correctly: the
    dissection is on the coupling graph, not the id order."""
    rng = np.random.default_rng(9)
    P = 60
    true_pos = np.cumsum(0.3 * rng.normal(size=(P, 3)), axis=0)
    ids = rng.permutation(P)
    opt = PoseGraphOptimizer(switch_penalty=0.03, solver="sparse")
    for k in range(P):
        noisy = true_pos[k] + (0.03 * rng.normal(size=3) if k else 0.0)
        opt.set_pose(int(ids[k]), Pose(np.eye(3), noisy))
    opt.set_pose_constant(int(ids[0]))
    for k in range(P - 1):
        opt.set_constraint(
            int(ids[k]), int(ids[k + 1]),
            Pose(np.eye(3), true_pos[k + 1] - true_pos[k]),
        )
    summary, _ = opt.solve(Options().replace(max_iterations=50))
    err = max(
        np.linalg.norm(opt.get_pose(int(ids[k])).translation - true_pos[k])
        for k in range(P)
    )
    assert err < 1e-3, err


# ---------------------------------------------------------------------------
# SE(2) optimizer path
# ---------------------------------------------------------------------------


def test_sparse_2d_matches_dense():
    """SE(2) sparse path vs dense on a small Manhattan-style arena with
    loop closures and an outlier edge under Huber loss."""
    from nonlinear_optimizer_for_slam_tpu.core import HuberLoss

    rng = np.random.default_rng(11)
    n = 7
    P = n * n
    # snake path over a grid
    true = np.zeros((P, 3))
    k = 0
    for i in range(n):
        cols = range(n) if i % 2 == 0 else range(n - 1, -1, -1)
        for j in cols:
            true[k] = (float(j), float(i), 0.0)
            k += 1

    def build(**kw):
        opt = PoseGraphOptimizer2D(switch_penalty=0.03, **kw)
        for i in range(P):
            noisy = true[i] + (
                0.05 * rng.normal(size=3) if i else np.zeros(3)
            )
            opt.set_pose(i, noisy)
        opt.set_pose_constant(0)
        for i in range(P - 1):
            rel = true[i + 1] - true[i]
            opt.set_constraint(i, i + 1, rel)
        # loop closures between spatially adjacent, temporally distant
        # poses (vertical grid neighbours of the snake path)
        for i in range(P):
            for j in range(i + 2, P):
                if np.linalg.norm(true[j, :2] - true[i, :2]) < 1.01:
                    opt.set_constraint(
                        i, j, true[j] - true[i], ConstraintType.LOOP
                    )
        return opt

    rng_state = rng.bit_generator.state
    opts = Options().replace(max_iterations=60)
    d = build()
    rng.bit_generator.state = rng_state
    s = build(solver="sparse")
    sum_d, sw_d = d.solve(opts)
    sum_s, sw_s = s.solve(opts)
    # both fully converge (~1e-10); reassociation noise dominates at
    # that magnitude, so the cost check carries an absolute floor
    np.testing.assert_allclose(
        float(sum_s.final_cost), float(sum_d.final_cost), rtol=1e-4, atol=1e-9
    )
    for k in range(P):
        np.testing.assert_allclose(
            np.asarray(s.get_pose(k)), np.asarray(d.get_pose(k)), atol=1e-7
        )
    np.testing.assert_allclose(np.asarray(sw_s), np.asarray(sw_d), atol=1e-7)


def test_multifrontal_selected_inverse_matches_dense():
    """selected_inverse_diag (Takahashi on the separator tree) returns
    the exact per-vertex diagonal blocks of A^{-1}."""
    n = 12
    P = n * n
    ea, eb, B_aa, B_bb, B_ab, diag, _, H = _random_block_system(
        P, 25, 3, seed=2, grid=n
    )
    plan = mf.symbolic(P, ea, eb, 3, leaf_size=12)
    fact = mf.factor(
        plan, jnp.asarray(B_aa), jnp.asarray(B_bb), jnp.asarray(B_ab),
        jnp.asarray(diag),
    )
    got = np.asarray(mf.selected_inverse_diag(plan, fact))
    Sigma = np.linalg.inv(H)
    want = np.stack([Sigma[i * 3:(i + 1) * 3, i * 3:(i + 1) * 3] for i in range(P)])
    np.testing.assert_allclose(got, want, rtol=1e-9, atol=1e-12)


def test_sparse_covariance_matches_dense(fixture):
    """covariance(method='sparse') — the multifrontal selected inverse
    through the public API — equals the dense full-inverse marginals on
    the 80-pose fixture (loops + switches + gauge pose)."""
    opt = _build(fixture, switch_penalty=0.03)
    opt.solve()
    dense = opt.covariance(method="dense")
    sparse = opt.covariance(method="sparse")
    for k in range(80):
        np.testing.assert_allclose(
            sparse[k], dense[k], rtol=1e-8, atol=1e-8, err_msg=f"pose {k}"
        )


def test_multifrontal_single_leaf_tree():
    """P <= leaf_size degenerates to ONE dense front (no boundary, no
    extend-add) — the recursion's base case must still factor/solve."""
    ea, eb, B_aa, B_bb, B_ab, diag, b, H = _random_block_system(
        6, 3, 2, seed=3
    )
    plan = mf.symbolic(6, ea, eb, 2, leaf_size=16)
    assert plan.num_levels == 1
    x = mf.solve(
        plan, jnp.asarray(ea), jnp.asarray(eb), jnp.asarray(B_aa),
        jnp.asarray(B_bb), jnp.asarray(B_ab), jnp.asarray(diag),
        jnp.asarray(b),
    )
    np.testing.assert_allclose(
        np.asarray(x), np.linalg.solve(H, b.ravel()).reshape(6, 2),
        rtol=1e-9,
    )
    fact = mf.factor(
        plan, jnp.asarray(B_aa), jnp.asarray(B_bb), jnp.asarray(B_ab),
        jnp.asarray(diag),
    )
    got = np.asarray(mf.selected_inverse_diag(plan, fact))
    Sigma = np.linalg.inv(H)
    want = np.stack([Sigma[i * 2:(i + 1) * 2, i * 2:(i + 1) * 2] for i in range(6)])
    np.testing.assert_allclose(got, want, rtol=1e-9, atol=1e-12)


def test_multifrontal_duplicate_edges():
    """Two constraints between the same pose pair accumulate (a real
    SLAM case: odometry + a loop closure on adjacent keyframes)."""
    ea = np.array([0, 1, 0, 0])
    eb = np.array([1, 2, 1, 2])
    rng = np.random.default_rng(4)
    d = 2
    J = rng.normal(size=(4, 3, 2 * d))
    B_aa = np.einsum("eri,erj->eij", J[:, :, :d], J[:, :, :d])
    B_bb = np.einsum("eri,erj->eij", J[:, :, d:], J[:, :, d:])
    B_ab = np.einsum("eri,erj->eij", J[:, :, :d], J[:, :, d:])
    diag = np.full((3, d), 1.5)
    b = rng.normal(size=(3, d))
    H = np.zeros((6, 6))
    for e in range(4):
        a_, b_ = ea[e], eb[e]
        H[a_*d:(a_+1)*d, a_*d:(a_+1)*d] += B_aa[e]
        H[b_*d:(b_+1)*d, b_*d:(b_+1)*d] += B_bb[e]
        H[a_*d:(a_+1)*d, b_*d:(b_+1)*d] += B_ab[e]
        H[b_*d:(b_+1)*d, a_*d:(a_+1)*d] += B_ab[e].T
    H += np.diag(diag.ravel())
    plan = mf.symbolic(3, ea, eb, d, leaf_size=2)
    x = mf.solve(
        plan, jnp.asarray(ea), jnp.asarray(eb), jnp.asarray(B_aa),
        jnp.asarray(B_bb), jnp.asarray(B_ab), jnp.asarray(diag),
        jnp.asarray(b),
    )
    np.testing.assert_allclose(
        np.asarray(x), np.linalg.solve(H, b.ravel()).reshape(3, d),
        rtol=1e-9,
    )


def test_sparse_solver_with_mesh_matches_unsharded():
    """solver='sparse' with a 'factors' mesh (fronts partitioned by XLA
    SPMD; scaling-book recipe — annotate shardings, let the partitioner
    insert collectives) computes the identical solve on the 8-device
    CPU mesh."""
    import jax
    from jax.sharding import Mesh

    rng = np.random.default_rng(3)
    P = 400
    pos = np.cumsum(0.1 * rng.normal(size=(P, 3)), axis=0)

    def build(**kw):
        opt = PoseGraphOptimizer(switch_penalty=0.03, solver="sparse", **kw)
        for i in range(P):
            noisy = pos[i] + (0.03 * rng.normal(size=3) if i else 0.0)
            opt.set_pose(i, Pose(np.eye(3), noisy))
        opt.set_pose_constant(0)
        for i in range(P - 1):
            opt.set_constraint(i, i + 1, Pose(np.eye(3), pos[i + 1] - pos[i]))
        for i in range(0, P - 40, 12):
            opt.set_constraint(
                i, i + 40, Pose(np.eye(3), pos[i + 40] - pos[i]),
                ConstraintType.LOOP,
            )
        return opt

    rng_state = rng.bit_generator.state
    plain = build()
    rng.bit_generator.state = rng_state
    mesh = Mesh(np.array(jax.devices()[:8]).reshape(8), ("factors",))
    sharded = build(mesh=mesh)
    opts = Options().replace(max_iterations=25)
    s_p, sw_p = plain.solve(opts)
    s_s, sw_s = sharded.solve(opts)
    np.testing.assert_allclose(
        float(s_s.final_cost), float(s_p.final_cost), rtol=1e-9, atol=1e-12
    )
    for k in range(0, P, 17):
        np.testing.assert_allclose(
            sharded.get_pose(k).translation, plain.get_pose(k).translation,
            atol=1e-8,
        )


def test_gather_assembly_mode_matches_scatter():
    """Round-5: the scatter-free GATHER assembly (strip plane-gather +
    boundary-diag broadcast, multifrontal._ASSEMBLY_MODE='gather') is an
    exact drop-in for the default scatter assembly. Kept as a measured
    ablation (scatter won end-to-end on hardware — see the module-level
    note) so the alternate lowering must stay correct."""
    n = 12
    P = n * n
    ea, eb, B_aa, B_bb, B_ab, diag, b, H = _random_block_system(
        P, 30, 3, seed=3, grid=n
    )
    args = (jnp.asarray(ea), jnp.asarray(eb), jnp.asarray(B_aa),
            jnp.asarray(B_bb), jnp.asarray(B_ab), jnp.asarray(diag),
            jnp.asarray(b))
    old = mf._ASSEMBLY_MODE
    try:
        # maps are only built when the mode is active at symbolic time
        mf._ASSEMBLY_MODE = "gather"
        plan_g = mf.symbolic(P, ea, eb, 3, leaf_size=16)
        x_g = np.asarray(mf.solve(plan_g, *args))
    finally:
        mf._ASSEMBLY_MODE = old
    plan = mf.symbolic(P, ea, eb, 3, leaf_size=16)
    x_s = np.asarray(mf.solve(plan, *args))
    # a scatter-built plan refuses to run in gather mode (no silent
    # fallback that would fake the ablation)
    try:
        mf._ASSEMBLY_MODE = "gather"
        import pytest as _pytest
        with _pytest.raises(ValueError, match="gather maps"):
            mf.factor(plan, *args[2:6])
    finally:
        mf._ASSEMBLY_MODE = old
    x_ref = np.linalg.solve(H, b.ravel()).reshape(P, 3)
    np.testing.assert_allclose(x_g, x_ref, rtol=1e-9, atol=1e-11)
    np.testing.assert_allclose(x_s, x_ref, rtol=1e-9, atol=1e-11)


def test_selected_inverse_pairs_matches_dense():
    """Round-5 pairwise Takahashi: diagonal AND requested off-diagonal
    Sigma[a, b] blocks (for pairs that are edges of the symbolic graph)
    match the dense inverse; non-pattern pairs are rejected."""
    rng = np.random.default_rng(1)
    P, d = 40, 3
    ea = list(range(P - 1))
    eb = list(range(1, P))
    for _ in range(30):
        a, b = rng.integers(0, P, 2)
        if a != b:
            ea.append(int(min(a, b)))
            eb.append(int(max(a, b)))
    ea, eb = np.asarray(ea), np.asarray(eb)
    E = len(ea)
    J = rng.normal(size=(E, d + 1, 2 * d))
    B_aa = np.einsum("eri,erj->eij", J[:, :, :d], J[:, :, :d]) + 3 * np.eye(d)
    B_bb = np.einsum("eri,erj->eij", J[:, :, d:], J[:, :, d:]) + 3 * np.eye(d)
    B_ab = np.einsum("eri,erj->eij", J[:, :, :d], J[:, :, d:])
    diag = rng.uniform(0.5, 2.0, size=(P, d))
    H = np.zeros((P * d, P * d))
    for e in range(E):
        a_, b_ = ea[e], eb[e]
        H[a_ * d:(a_ + 1) * d, a_ * d:(a_ + 1) * d] += B_aa[e]
        H[b_ * d:(b_ + 1) * d, b_ * d:(b_ + 1) * d] += B_bb[e]
        H[a_ * d:(a_ + 1) * d, b_ * d:(b_ + 1) * d] += B_ab[e]
        H[b_ * d:(b_ + 1) * d, a_ * d:(a_ + 1) * d] += B_ab[e].T
    H += np.diag(diag.ravel())
    Sig = np.linalg.inv(H)

    plan = mf.symbolic(P, ea, eb, d, leaf_size=4)
    fact = mf.factor(plan, jnp.asarray(B_aa), jnp.asarray(B_bb),
                     jnp.asarray(B_ab), jnp.asarray(diag))
    diag_blk, pair_blk = mf.selected_inverse_pairs(plan, fact, ea, eb)
    diag_blk, pair_blk = np.asarray(diag_blk), np.asarray(pair_blk)
    for p in range(P):
        np.testing.assert_allclose(
            diag_blk[p], Sig[p * d:(p + 1) * d, p * d:(p + 1) * d],
            atol=1e-9,
        )
    for e in range(E):
        np.testing.assert_allclose(
            pair_blk[e],
            Sig[ea[e] * d:(ea[e] + 1) * d, eb[e] * d:(eb[e] + 1) * d],
            atol=1e-9,
        )
    # a vertex pair with no edge (and no fill) must be rejected
    import pytest as _pytest

    iso_a, iso_b = 0, P - 1
    if not ((ea == iso_a) & (eb == iso_b)).any():
        with _pytest.raises(ValueError, match="filled pattern"):
            mf.selected_inverse_pairs(
                plan, fact, np.array([iso_a]), np.array([iso_b])
            )
