"""Per-iteration trace parity against the reference implementation.

The reference's acceptance anchor is its recorded inner-cost sequences
(results/maha_amd64_simple.txt, results/maha_3_vs_6_amd64.txt): each outer
ICP iteration prints ``COST: <previous_cost>, iter: <n>`` from the analytic
LM solver (mahalanobis_distance_minimizer_analytic.cc:150). This module
checks our full pipeline — numpy NDT builder (Eigen-convention eigh3 +
moment-init quirk) -> exact matcher -> f64 jnp LM solver — reproduces those
traces on the full published fixture (954,605-point room, 1 cm step).

Two anchors, two tolerances:

1. ORACLE (tight, atol=0.1 = the 6-sig-fig print quantum): the reference
   sources compiled UNMODIFIED in this environment (g++ -O2, Eigen 3.4 from
   the tensorflow bundle) with brute-force exact matching in place of FLANN
   (no distance ties exist on this fixture, verified) and
   ExponentialLossFunction(1,1) per the test drivers. Constants below are
   its stderr output. This checks semantic parity of our entire pipeline
   against the reference CODE at f64 precision: every iteration count, the
   outer-loop count, and every cost digit the reference prints.

2. PUBLISHED capture (loose, rtol=2e-3): the author's recorded runs. The
   residual vs the oracle (~0.07%) is the author's build environment —
   different Eigen version/compiler flags pick a different eigenbasis for
   degenerate (flat wall/floor) voxels, and the reference's row-scaled
   sqrt-information makes the OBJECTIVE depend on that basis. With this
   environment's Eigen the oracle and our pipeline agree digit-for-digit,
   which bounds the remaining gap to the author's toolchain, not our code.

Known deliberate deviations visible in the traces:
- When an outer solve converges at inner iteration 0, the reference prints
  its never-updated ``previous_cost`` (dtype max, the ``1.79769e+308``
  lines in the captures); our Summary reports the actual evaluated cost.
  Cost comparison is skipped for those entries (iteration counts still
  must match).
- The reference's scalar 3-DoF solver silently DROPS the tail
  ``n % 4`` correspondences (stride loop,
  mahalanobis_distance_minimizer_analytic_3dof.cc:36: ``i < stride *
  num_stride``); we evaluate all of them (masked padding). Each dropped
  correspondence contributes <= 1.0 to the exponential-loss cost, so the
  3-DoF cost tolerance is atol=4.0 while iteration counts and poses still
  match exactly.
"""

import re

import jax.numpy as jnp
import numpy as np
import pytest

import nonlinear_optimizer_for_slam_tpu as nls
from nonlinear_optimizer_for_slam_tpu.core import ExponentialLoss, Options
from nonlinear_optimizer_for_slam_tpu.pipelines import ndt, registration
from nonlinear_optimizer_for_slam_tpu.utils import testing

REF_RESULTS = "/root/reference/results"

# ---------------------------------------------------------------------------
# Oracle traces: reference sources compiled unmodified in this environment
# (see module docstring). (cost, inner_iterations) per outer iteration;
# cost=None where the reference prints its uninitialized previous_cost.
# ---------------------------------------------------------------------------
ORACLE_SIMPLE_6DOF = {
    "trace": [(17450.5, 40), (17393.3, 40), (17492.4, 21), (17491.4, 2)],
    "outer": 3,
    "translation": [-0.196409882, 0.121409495, 0.304700223],
    "quat_xyzw": [-0.000103898, -0.001248329, 0.049971831, 0.998749842],
}
ORACLE_3DOF6DOF_6DOF = {
    "trace": [
        (17853.9, 40),
        (17536.2, 40),
        (17497.5, 32),
        (17491.4, 11),
        (None, 0),
    ],
    "outer": 4,
    "translation": [-0.145656518, 0.048385010, 0.004836333],
    "quat_xyzw": [-0.000165989, -0.001242575, 0.099826030, 0.995004117],
}
ORACLE_3DOF6DOF_3DOF = {
    "trace": [
        (17870.2, 40),
        (17630.2, 40),
        (17607.4, 21),
        (17599.3, 6),
        (None, 0),
    ],
    "outer": 4,
    "translation": [-0.150055931, -0.043362789, 0.0],
    "quat_xyzw": [0.0, 0.0, 0.099344065, 0.995053143],
}


def parse_capture(path: str, section: str):
    """Parse one solver section of a reference results capture into
    ([(cost, iter), ...], outer_iter)."""
    trace, outer = [], None
    in_section = False
    with open(path) as f:
        for line in f:
            if line.startswith("Start "):
                in_section = line.strip() == f"Start {section}"
                continue
            if not in_section:
                continue
            m = re.match(r"COST: ([\d.e+-]+), iter: (\d+)", line)
            if m:
                trace.append((float(m.group(1)), int(m.group(2))))
                continue
            m = re.match(r"outer_iter: (\d+)", line)
            if m:
                outer = int(m.group(1))
                in_section = False
    return trace, outer


@pytest.fixture(scope="module")
def full_world():
    """The published fixture at FULL scale: 954,605-point room, 1 m NDT
    voxels, 0.1 m scan filter (simple_optimization_test.cc:72-95)."""
    pts = testing.generate_room_points()  # defaults = published params
    assert pts.shape[0] == 954605
    ndt_map = ndt.build_ndt_map(pts, 1.0)
    assert ndt_map.counts.shape[0] == 96 and int(ndt_map.valid.sum()) == 96
    scan = ndt.filter_points(pts, 0.1)
    assert scan.shape[0] == 9356
    return ndt_map, scan


def _register(ndt_map, local, minimizer):
    return registration.register_ndt(
        ndt_map, local, nls.Pose.identity(), minimizer, Options()
    )


def _check(res, oracle, *, cost_atol, pose_atol=1e-6):
    got = [(float(s.final_cost), int(s.iterations)) for s in res.summaries]
    exp = oracle["trace"]
    assert len(got) == len(exp), (got, exp)
    for (gc, gi), (ec, ei) in zip(got, exp):
        assert gi == ei, (got, exp)
        if ec is not None:
            np.testing.assert_allclose(gc, ec, atol=cost_atol, rtol=0)
    assert res.outer_iterations == oracle["outer"]
    np.testing.assert_allclose(
        res.pose.translation, oracle["translation"], atol=pose_atol
    )
    q = res.pose.quaternion()  # (w, x, y, z)
    q_ref = np.asarray(oracle["quat_xyzw"])
    np.testing.assert_allclose(q[1:], q_ref[:3], atol=pose_atol)
    np.testing.assert_allclose(q[0], q_ref[3], atol=pose_atol)


def _minimizer_6dof():
    return nls.MahalanobisDistanceMinimizer(
        backend="jnp", dtype=jnp.float64
    ).set_loss_function(ExponentialLoss(1.0, 1.0))


def test_oracle_parity_simple_6dof(full_world):
    """maha_simple fixture: every printed cost digit, iteration count,
    outer count, and the final pose match the reference code."""
    ndt_map, scan = full_world
    local = testing.maha_true_pose().inverse().apply(scan)
    res = _register(ndt_map, local, _minimizer_6dof())
    # atol=0.1 = the quantum of the reference's 6-significant-figure print.
    _check(res, ORACLE_SIMPLE_6DOF, cost_atol=0.1)


def test_oracle_parity_3dof6dof_6dof(full_world):
    """3dof_6dof fixture, 6-DoF solver — includes the converged-at-iter-0
    fifth outer solve (the capture's 1.79769e+308 line)."""
    ndt_map, scan = full_world
    tp = nls.Pose.from_axis_angle(0.2, [0.0, 0.0, 1.0], [-0.15, 0.05, 0.0])
    local = tp.inverse().apply(scan)
    res = _register(ndt_map, local, _minimizer_6dof())
    _check(res, ORACLE_3DOF6DOF_6DOF, cost_atol=0.1)


def test_oracle_parity_3dof6dof_3dof(full_world):
    """3dof_6dof fixture, planar 3-DoF solver. cost_atol=4.0 covers the
    reference's dropped n%4 stride-tail correspondences (<=1.0 cost each,
    <=3 dropped + print quantum); iteration counts and pose are exact."""
    ndt_map, scan = full_world
    tp = nls.Pose.from_axis_angle(0.2, [0.0, 0.0, 1.0], [-0.15, 0.05, 0.0])
    local = tp.inverse().apply(scan)
    minimizer = nls.MahalanobisDistanceMinimizer3DOF(
        backend="jnp", dtype=jnp.float64
    ).set_loss_function(ExponentialLoss(1.0, 1.0))
    res = _register(ndt_map, local, minimizer)
    _check(res, ORACLE_3DOF6DOF_3DOF, cost_atol=4.0)


def test_published_capture_simple_6dof(full_world):
    """The author's recorded maha_amd64_simple.txt run: rtol=2e-3 absorbs
    the author-toolchain eigenbasis residual (module docstring #2)."""
    trace, outer = parse_capture(
        f"{REF_RESULTS}/maha_amd64_simple.txt", "OptimizePoseAnalytic"
    )
    assert trace and outer is not None
    ndt_map, scan = full_world
    local = testing.maha_true_pose().inverse().apply(scan)
    res = _register(ndt_map, local, _minimizer_6dof())
    got = [(float(s.final_cost), int(s.iterations)) for s in res.summaries]
    assert len(got) == len(trace)
    assert res.outer_iterations == outer
    for (gc, gi), (ec, ei) in zip(got, trace):
        if ec > 1e300:  # uninitialized previous_cost print
            continue
        np.testing.assert_allclose(gc, ec, rtol=2e-3)
        assert abs(gi - ei) <= 2, (got, trace)


def test_published_capture_3dof6dof(full_world):
    """The author's maha_3_vs_6_amd64.txt run, both solvers."""
    ndt_map, scan = full_world
    tp = nls.Pose.from_axis_angle(0.2, [0.0, 0.0, 1.0], [-0.15, 0.05, 0.0])
    local = tp.inverse().apply(scan)
    path = f"{REF_RESULTS}/maha_3_vs_6_amd64.txt"

    # The 3-DoF comparison stops after the first outer iteration: the
    # author-toolchain eigenbasis difference forks the (basis-dependent)
    # objective's trajectory during the non-converged 40-iteration solves
    # — the published run then converges to a slightly different planar
    # minimum (its outer 2 runs 10 inner iterations, this environment's
    # 21), making entry-wise comparison meaningless past the fork. The
    # first entry shares the identity starting pose and is comparable;
    # the ORACLE test above carries the exact full-trace anchor.
    for section, minimizer, compare_prefix in (
        ("OptimizePoseAnalytic", _minimizer_6dof(), None),
        (
            "OptimizePoseAnalytic3DoF",
            nls.MahalanobisDistanceMinimizer3DOF(
                backend="jnp", dtype=jnp.float64
            ).set_loss_function(ExponentialLoss(1.0, 1.0)),
            1,
        ),
    ):
        trace, outer = parse_capture(path, section)
        assert trace and outer is not None, section
        res = _register(ndt_map, local, minimizer)
        got = [(float(s.final_cost), int(s.iterations)) for s in res.summaries]
        assert abs(len(got) - len(trace)) <= 1, (section, got, trace)
        assert abs(res.outer_iterations - outer) <= 1, section
        pairs = list(zip(got, trace))
        if compare_prefix is not None:
            pairs = pairs[:compare_prefix]
        for (gc, gi), (ec, ei) in pairs:
            if ec > 1e300:
                continue
            np.testing.assert_allclose(gc, ec, rtol=5e-3, err_msg=section)
            assert abs(gi - ei) <= 3, (section, got, trace)


# ---------------------------------------------------------------------------
# Reprojection module (PnP-style pose solve, 630-point planar grid).
#
# Oracle: the reference's ReprojectionErrorMinimizerAnalytic
# (reprojection_error_minimizer_analytic.cc:12-105) compiled unmodified in
# this environment with a per-iteration fprintf of (iteration, cost, lambda)
# inserted before the Hessian reflection, driven on the exact fixture of its
# test (reprojection_error_minimizer/tests/simple_optimization_test.cc:42-72:
# FP-accumulated grid, true pose t=(-0.1, 0.123, -0.5) yaw 0.1,
# ExponentialLossFunction(1,1), identity start, default Options). This
# fixture is fully deterministic arithmetic — no eigendecompositions, no
# matching — so unlike the NDT anchors there is no toolchain eigenbasis
# freedom: the author's published capture (results/reproj_amd64.txt: COST
# 2.33228e-11, iter 6) agrees with the oracle to every printed digit.
#
# (cost, lambda) per inner LM iteration, 12 significant digits:
# ---------------------------------------------------------------------------
ORACLE_REPROJ = {
    "trace": [
        (3.55444881972, 1e-3),
        (0.0515859202783, 6e-4),
        (2.35978629949e-05, 3.6e-4),
        (3.42025160971e-07, 2.16e-4),
        (4.4035399771e-09, 1.296e-4),
        (2.33227881452e-11, 7.776e-5),
        (3.96349619791e-14, 4.6656e-5),
    ],
    # the reference's "COST:" print is previous_cost (lags one iteration)
    "reported_cost": 2.33227881452e-11,
    "iterations": 6,
    "translation": [0.0872209073462274, -0.132368839193207, 0.500000000181493],
    "quat_wxyz": [
        0.99875026039451,
        2.38636198343075e-09,
        -5.42420928460359e-11,
        -0.0499791692798031,
    ],
}


def test_oracle_parity_reprojection():
    """Reprojection: every per-iteration (cost, lambda) pair, the reported
    cost, the iteration count, and the solved pose match the reference
    code digit-for-digit at f64 (rtol 1e-9 ~ the 12-digit print quantum)."""
    from nonlinear_optimizer_for_slam_tpu.ops import reprojection

    pts, pix, intr, _ = testing.generate_reprojection_fixture()
    assert pts.shape[0] == 630  # the capture's "# points: 630"
    data = reprojection.ReprojectionData(
        jnp.asarray(pts), jnp.asarray(pix), jnp.ones(pts.shape[0])
    )
    minimizer = nls.ReprojectionErrorMinimizer(
        dtype=jnp.float64
    ).set_loss_function(ExponentialLoss(1.0, 1.0))
    pose, summary = minimizer.solve(Options(), data, intr, nls.Pose.identity())

    n = int(summary.iterations)
    assert n == ORACLE_REPROJ["iterations"]
    rec = summary.records
    for i, (ec, elam) in enumerate(ORACLE_REPROJ["trace"]):
        np.testing.assert_allclose(float(rec.cost[i]), ec, rtol=1e-9)
        np.testing.assert_allclose(float(rec.lam[i]), elam, rtol=1e-9)
    np.testing.assert_allclose(
        float(summary.reported_cost), ORACLE_REPROJ["reported_cost"], rtol=1e-9
    )
    np.testing.assert_allclose(
        np.asarray(pose.translation), ORACLE_REPROJ["translation"], atol=1e-9
    )
    np.testing.assert_allclose(
        np.asarray(pose.quaternion()), ORACLE_REPROJ["quat_wxyz"], atol=1e-9
    )


def test_published_capture_reprojection():
    """The author's recorded reproj_amd64.txt: reported cost, iteration
    count, and the printed pose (the capture prints pose.inverse())."""
    path = f"{REF_RESULTS}/reproj_amd64.txt"
    trace, _ = parse_capture(path, "OptimizedPoseAnalytic")
    assert trace, "capture parse failed"
    (cost, iters), = trace

    from nonlinear_optimizer_for_slam_tpu.ops import reprojection

    pts, pix, intr, true_pose = testing.generate_reprojection_fixture()
    data = reprojection.ReprojectionData(
        jnp.asarray(pts), jnp.asarray(pix), jnp.ones(pts.shape[0])
    )
    minimizer = nls.ReprojectionErrorMinimizer(
        dtype=jnp.float64
    ).set_loss_function(ExponentialLoss(1.0, 1.0))
    pose, summary = minimizer.solve(Options(), data, intr, nls.Pose.identity())

    assert int(summary.iterations) == iters
    np.testing.assert_allclose(float(summary.reported_cost), cost, rtol=1e-5)
    # capture: "Pose (analytic ): -0.1 0.123 -0.5 ..." = solved.inverse()
    inv = pose.inverse()
    np.testing.assert_allclose(
        np.asarray(inv.translation), np.asarray(true_pose.translation),
        atol=1e-6,
    )
