"""Automatic pose-graph solver selection (solver="auto").

Round-3 verdict item: users should not need to know their graph's
topology to avoid a 10x loss either way (sphere2500: banded wins 10x;
manhattan3500: banded loses). The heuristic (pose_graph.select_solver)
picks from size, chain-correction count, RCM bandwidth, and — only when
the band is fat — a nested-dissection flops comparison. These tests pin
the choice on the two canonical fixtures plus the small/chain/expander
corners.
"""

import numpy as np
import pytest

from nonlinear_optimizer_for_slam_tpu.core import Options
from nonlinear_optimizer_for_slam_tpu.core.pose import Pose
from nonlinear_optimizer_for_slam_tpu.solvers import multifrontal as mf
from nonlinear_optimizer_for_slam_tpu.solvers.pose_graph import (
    ConstraintType,
    PoseGraphOptimizer,
    select_solver,
)
from nonlinear_optimizer_for_slam_tpu.utils import testing


def _edges_of(graph):
    ref = np.array([e.i for e in graph.edges], np.int64)
    qry = np.array([e.j for e in graph.edges], np.int64)
    # the g2o fixtures do not tag loops; approximate with adjacency
    is_loop = (np.abs(ref - qry) != 1).astype(np.float64)
    return ref, qry, is_loop


def test_selects_banded_on_sphere2500():
    """Ring-topology loop closures reorder to a tight band: banded is
    the 10x winner (661 ms vs 6.5 s PCG, round 3) and must be chosen
    WITHOUT building a dissection plan."""
    sphere, _ = testing.generate_sphere_g2o()
    ref, qry, is_loop = _edges_of(sphere)
    calls = []

    def plan_fn():
        calls.append(1)
        raise AssertionError("sphere must not need the dissection plan")

    name, info = select_solver(
        len(sphere.vertices), ref, qry, is_loop, 7, plan_fn=plan_fn
    )
    assert name == "banded", info
    assert not calls
    assert info["bandwidth"] < 120


def test_selects_sparse_on_manhattan3500():
    """Olson arena: RCM bandwidth grows with the arena diameter (341),
    the banded cost model explodes, and the nested-dissection separators
    win by ~20x in factor flops."""
    manhattan, _ = testing.generate_manhattan_g2o()
    ref, qry, is_loop = _edges_of(manhattan)
    P = len(manhattan.vertices)
    coords = np.stack([manhattan.vertices[k][:2] for k in range(P)])
    plan_fn = lambda: mf.symbolic(P, ref, qry, 3, coords=coords, leaf_size=32)
    name, info = select_solver(
        P, ref, qry, is_loop, 3, plan_fn=plan_fn, allow_tridiag=False
    )
    assert name == "sparse", info
    assert info["banded_flops"] > 4 * info["sparse_flops"]


def test_selects_dense_small_and_tridiag_chain():
    # 80-pose reference fixture: small -> dense
    _, noisy, constraints = testing.generate_pose_graph_fixture()
    ref = np.array([c["reference_index"] for c in constraints], np.int64)
    qry = np.array([c["query_index"] for c in constraints], np.int64)
    is_loop = np.array([1.0 if c["is_loop"] else 0.0 for c in constraints])
    name, info = select_solver(80, ref, qry, is_loop, 7)
    assert name == "dense", info

    # 5k chain + 3 long loops -> tridiag (Woodbury stays tiny)
    P = 5000
    ref = np.arange(P - 1, dtype=np.int64)
    qry = ref + 1
    lref = np.array([0, P // 4, 10], np.int64)
    lqry = np.array([P // 2, 3 * P // 4, P - 10], np.int64)
    ref = np.concatenate([ref, lref])
    qry = np.concatenate([qry, lqry])
    is_loop = np.concatenate([np.zeros(P - 1), np.ones(3)])
    name, info = select_solver(P, ref, qry, is_loop, 7)
    assert name == "tridiag", info

    # same chain but ~1000 ring closures: too many corrections for the
    # Woodbury form, band stays tight -> banded
    ref2 = np.arange(P - 1, dtype=np.int64)
    qry2 = ref2 + 1
    lr = np.arange(0, P - 5, 5, dtype=np.int64)
    ref2 = np.concatenate([ref2, lr])
    qry2 = np.concatenate([qry2, lr + 5])
    is_loop2 = np.concatenate([np.zeros(P - 1), np.ones(len(lr))])
    name, info = select_solver(P, ref2, qry2, is_loop2, 7)
    assert name == "banded", info


def test_selects_cg_on_expander():
    """Uniformly random long edges: Theta(P) bandwidth under any
    ordering AND dissection separators near P/2 — both direct guards
    trip, CG is the only viable family."""
    rng = np.random.default_rng(0)
    P = 20000
    ref = np.arange(P - 1, dtype=np.int64)
    qry = ref + 1
    a = rng.integers(0, P, 4 * P)
    b = rng.integers(0, P, 4 * P)
    keep = a != b
    ref = np.concatenate([ref, np.minimum(a, b)[keep]])
    qry = np.concatenate([qry, np.maximum(a, b)[keep]])
    is_loop = np.concatenate(
        [np.zeros(P - 1), np.ones(int(keep.sum()))]
    )

    def plan_fn():
        return mf.symbolic(P, ref, qry, 7, leaf_size=16)

    name, info = select_solver(P, ref, qry, is_loop, 7, plan_fn=plan_fn)
    assert name == "cg", info


def test_auto_end_to_end_small_fixture():
    """solver='auto' through the public API: picks dense on the 80-pose
    fixture and matches the explicit dense solve exactly."""
    true_poses, noisy_poses, constraints = testing.generate_pose_graph_fixture()

    def build(**kw):
        opt = PoseGraphOptimizer(switch_penalty=0.03, **kw)
        for i, p in enumerate(noisy_poses):
            opt.set_pose(i, p)
        opt.set_pose_constant(0)
        for c in constraints:
            opt.set_constraint(
                c["reference_index"], c["query_index"], c["relative_pose"],
                ConstraintType.LOOP if c["is_loop"] else ConstraintType.ODOMETRY,
            )
        return opt

    auto = build(solver="auto")
    dense = build()
    s_a, sw_a = auto.solve()
    s_d, sw_d = dense.solve()
    assert auto.last_solver_choice == "dense"
    np.testing.assert_allclose(
        float(s_a.final_cost), float(s_d.final_cost), rtol=1e-12
    )
    np.testing.assert_allclose(np.asarray(sw_a), np.asarray(sw_d), atol=1e-12)


def test_selects_sparse_on_manhattan10000_with_predicted_times():
    """Round-5 calibrated model: the selection compares PREDICTED
    per-iteration times (fixed costs + flops/rate, constants fitted on
    same-day hardware rows — see select_solver docstring), logs them in
    info, and picks sparse on the 10k-pose city where the same-day
    measurement was sparse 83 vs banded 275 ms/iter."""
    man10, _ = testing.generate_manhattan_g2o(n_poses=10000, arena=17, seed=11)
    ref, qry, is_loop = _edges_of(man10)
    P = len(man10.vertices)
    coords = np.stack([man10.vertices[k][:2] for k in range(P)])
    plan_fn = lambda: mf.symbolic(P, ref, qry, 3, coords=coords, leaf_size=16)
    name, info = select_solver(
        P, ref, qry, is_loop, 3, plan_fn=plan_fn, allow_tridiag=False
    )
    assert name == "sparse", info
    # model numbers logged and ordered like the measurement
    assert info["predicted_sparse_ms"] < info["predicted_banded_ms"]
    # same-day measured ratio was ~3.3x; the model must stay in that
    # ballpark (regression guard on the fixed-cost terms)
    ratio = info["predicted_banded_ms"] / info["predicted_sparse_ms"]
    assert 1.5 < ratio < 10.0, info
