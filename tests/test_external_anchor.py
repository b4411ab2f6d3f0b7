"""External-anchor cross-checks (VERDICT r2 item 4).

The reference anchors each solver to Ceres — an INDEPENDENT optimizer
consuming the same cost definition (pose_graph_optimizer_ceres.cc:15-69).
No Ceres/g2o/gtsam binaries or published datasets are reachable in this
offline environment, so the anchors here follow the same pattern with
the independent stacks that ARE available:

- **scipy.optimize.least_squares** (trust-region reflective, LSMR inner
  solver, finite-difference Jacobians): a completely separate optimizer,
  linear-algebra path, and derivative mechanism. The residual spec is
  shared — exactly as the reference shares its cost functor with Ceres.
- **torch.autograd**: an independent AD engine for Jacobian-level
  cross-checks of the analytic/jacfwd derivatives.

The numpy residual/chi^2 twins and scipy solves live in
`utils/anchor_np.py` (jax-free by construction — that module IS the
anchor's shared-functor layer). Both the BAL bundle-adjustment path and
the pose-graph path are anchored at test scale here;
benchmarks/external_anchor.py runs the same cross-checks at headline
scale (problem-49-7776-shape BAL, sphere2500) and writes
results/external_anchor.md.
"""

import numpy as np
import pytest

from nonlinear_optimizer_for_slam_tpu.core.options import Options
from nonlinear_optimizer_for_slam_tpu.io import bal as bal_io
from nonlinear_optimizer_for_slam_tpu.solvers import bal as bal_solver
from nonlinear_optimizer_for_slam_tpu.utils import anchor_np


# ---------------------------------------------------------------------------
# BAL / bundle adjustment
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def bal_problem():
    noisy, truth = bal_io.synthetic_bal_problem(
        num_cameras=8, num_points=150, observations_per_point=4, seed=7
    )
    return noisy, truth


def test_bal_final_cost_matches_scipy(bal_problem):
    """Our TPU Schur/LM solver and scipy's trust-region reflective solver
    start from the same perturbed estimate and must reach the same
    minimum of the same (Snavely) objective. `scipy.least_squares`
    reports cost = 0.5 sum r^2 — the identical convention bal_cost uses,
    so the two numbers compare directly (the Ceres-anchor pattern)."""
    noisy, _ = bal_problem
    solved, summary = bal_solver.solve_bal(
        noisy, Options().replace(max_iterations=60)
    )
    ours = bal_solver.bal_cost(solved)

    sp = anchor_np.scipy_solve_bal(noisy)
    theirs = float(sp.cost)

    assert ours == pytest.approx(theirs, rel=1e-4), (ours, theirs)
    # and both genuinely moved: the perturbed init is much worse
    assert ours < 0.05 * bal_solver.bal_cost(noisy)


def test_bal_jacobian_matches_torch(bal_problem):
    """jax jacfwd (production) vs torch.autograd (independent AD) on the
    per-observation Snavely residual."""
    import torch

    noisy, _ = bal_problem
    rng = np.random.default_rng(5)
    sel = rng.choice(noisy.num_observations, size=16, replace=False)

    def torch_residual(cam, pt, uv):
        rod, t = cam[0:3], cam[3:6]
        theta = torch.linalg.norm(rod)
        if float(theta) < 1e-12:
            Rx = pt
        else:
            axis = rod / theta
            Rx = (
                pt * torch.cos(theta)
                + torch.linalg.cross(axis, pt) * torch.sin(theta)
                + axis * (axis @ pt) * (1.0 - torch.cos(theta))
            )
        P = Rx + t
        p = -P[:2] / P[2]
        r2 = p @ p
        d = 1.0 + cam[7] * r2 + cam[8] * r2 * r2
        return cam[6] * d * p - uv

    import jax
    import jax.numpy as jnp

    jax_jac = jax.jacfwd(bal_solver.snavely_residual, argnums=(0, 1))
    for o in sel:
        cam = noisy.camera_params[noisy.camera_indices[o]]
        pt = noisy.points[noisy.point_indices[o]]
        uv = noisy.observations[o]
        tc = torch.tensor(cam, dtype=torch.float64, requires_grad=True)
        tp = torch.tensor(pt, dtype=torch.float64, requires_grad=True)
        tu = torch.tensor(uv, dtype=torch.float64)
        Jc_t, Jl_t = torch.autograd.functional.jacobian(
            lambda c, x: torch_residual(c, x, tu), (tc, tp)
        )
        Jc_j, Jl_j = jax_jac(jnp.asarray(cam), jnp.asarray(pt), jnp.asarray(uv))
        np.testing.assert_allclose(np.asarray(Jc_j), Jc_t.numpy(), rtol=1e-8, atol=1e-10)
        np.testing.assert_allclose(np.asarray(Jl_j), Jl_t.numpy(), rtol=1e-8, atol=1e-10)


# ---------------------------------------------------------------------------
# pose graph (sphere world)
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def sphere_fixture():
    from nonlinear_optimizer_for_slam_tpu.utils import testing as tu

    g, gt = tu.generate_sphere_g2o(n_rings=4, per_ring=30, radius=10.0)
    N = len(g.vertices)
    edges_ij = np.array([[e.i, e.j] for e in g.edges])
    t_rel = np.stack([e.measurement[:3] for e in g.edges])
    q_rel = np.stack([e.measurement[3:] for e in g.edges])
    from nonlinear_optimizer_for_slam_tpu.solvers.pose_graph import (
        sqrt_info_from_information,
    )

    sqrt_infos = np.stack(
        [sqrt_info_from_information(e.information) for e in g.edges]
    )
    init_pos = np.stack([g.vertices[k][:3] for k in range(N)])
    init_q = np.stack([g.vertices[k][3:] for k in range(N)])
    return g, gt, edges_ij, t_rel, q_rel, sqrt_infos, init_pos, init_q


def test_sphere_chi2_matches_scipy(sphere_fixture, tmp_path):
    """Sphere-world pose graph (the sphere2500 construction at 120-pose
    test scale): our PoseGraphOptimizer and scipy TRF must reach the same
    chi^2 of the same objective, evaluated by the INDEPENDENT numpy
    chi^2 implementation."""
    from nonlinear_optimizer_for_slam_tpu.io import g2o as g2o_io

    g, gt, edges_ij, t_rel, q_rel, sqrt_infos, pos0, q0 = sphere_fixture
    N = pos0.shape[0]

    chi2_init = anchor_np.sphere_chi2(
        pos0, q0, edges_ij, t_rel, q_rel, sqrt_infos
    )

    path = str(tmp_path / "sphere.g2o")
    g2o_io.write_g2o(path, g)
    opt = g2o_io.load_pose_graph(path)
    summary, _ = opt.solve(Options().replace(max_iterations=150))
    ours_pos = np.stack([opt.get_pose(k).translation for k in range(N)])
    ours_q = np.stack([opt.get_pose(k).quaternion() for k in range(N)])
    chi2_ours = anchor_np.sphere_chi2(
        ours_pos, ours_q, edges_ij, t_rel, q_rel, sqrt_infos
    )

    sp_pos, sp_q = anchor_np.scipy_solve_sphere(
        edges_ij, t_rel, q_rel, sqrt_infos, pos0, q0
    )
    chi2_scipy = anchor_np.sphere_chi2(
        sp_pos, sp_q, edges_ij, t_rel, q_rel, sqrt_infos
    )

    # both solvers collapse the dead-reckoned drift by orders of magnitude
    assert chi2_ours < 1e-2 * chi2_init
    assert chi2_scipy < 1e-2 * chi2_init
    # ... and agree on the reachable minimum
    assert chi2_ours == pytest.approx(chi2_scipy, rel=2e-2), (
        chi2_ours,
        chi2_scipy,
        chi2_init,
    )


# ---------------------------------------------------------------------------
# inertial (GPS-INS smoothing)
# ---------------------------------------------------------------------------


def test_inertial_chi2_matches_scipy():
    """GPS-INS smoothing anchor: our InertialGraphOptimizer and scipy TRF
    minimize the IDENTICAL whitened residual stack
    (`InertialGraphOptimizer.residual_vector` — the reference's
    shared-cost-functor pattern: Ceres consumes the same functor the
    analytic path does, pose_graph_optimizer_ceres.cc:15-69) from the
    same dead-reckoned init and must reach the same chi^2. The optimizer,
    trust-region policy, linear algebra (LSMR vs our damped normal
    equations), and derivatives (finite differences vs our closed-form
    factor Jacobians) are all independent."""
    from scipy.optimize import least_squares

    from nonlinear_optimizer_for_slam_tpu.core import Options
    from nonlinear_optimizer_for_slam_tpu.core.pose import Pose
    from nonlinear_optimizer_for_slam_tpu.ops.imu import GRAVITY
    from nonlinear_optimizer_for_slam_tpu.solvers.inertial import (
        InertialGraphOptimizer,
    )
    from test_imu import _gps_ins_problem

    traj, kf_dt, n_kf, pres, gps = _gps_ins_problem()

    opt = InertialGraphOptimizer()
    R, p, v = traj.rot(0.0), traj.pos(0.0), traj.vel(0.0)
    opt.add_state(0, Pose(R, p), velocity=v)
    for k, pre in enumerate(pres):
        dR, dv, dp = pre.corrected(np.zeros(3), np.zeros(3))
        p = p + v * pre.dt + 0.5 * GRAVITY * pre.dt**2 + R @ dp
        v = v + GRAVITY * pre.dt + R @ dv
        R = R @ dR
        opt.add_state(k + 1, Pose(R, p), velocity=v)
        opt.add_imu_factor(k, k + 1, pre)
        opt.add_bias_walk(k, k + 1, (1e4, 1e3))
    opt.set_state_constant(0)  # pose gauge
    for k in range(n_kf):
        opt.add_position_prior(k, gps[k], 20.0)
    opt.add_bias_prior(0, np.zeros(6), 10.0)

    # the dead-reckoned init, captured before solve() overwrites it
    x0 = np.stack([
        np.concatenate([
            opt.get_pose(k).translation, opt.get_pose(k).quaternion(),
            opt.get_state(k)[1], opt.get_state(k)[2],
        ])
        for k in range(n_kf)
    ])
    chi2_init = opt.chi2(x0)

    # ours
    opt.solve(Options().replace(max_iterations=200))
    chi2_ours = opt.chi2()

    # scipy over the free components (state 0 pose fixed), quaternion
    # norms pinned (exact gauge direction of the normalized residual)
    N = n_kf
    free = np.ones((N, 16), bool)
    free[0, 0:7] = False
    idx_free = np.flatnonzero(free.reshape(-1))

    def unpack(z):
        x = x0.reshape(-1).copy()
        x[idx_free] = z
        return x.reshape(N, 16)

    def residuals(z):
        x = unpack(z)
        r = opt.residual_vector(x)
        pin = np.sum(x[1:, 3:7] ** 2, axis=-1) - 1.0
        return np.concatenate([r, pin])

    z0 = x0.reshape(-1)[idx_free]
    res = least_squares(
        residuals, z0, method="trf", tr_solver="lsmr", x_scale="jac",
        ftol=1e-12, xtol=1e-12, gtol=1e-12, max_nfev=120,
    )
    x_sp = unpack(res.x)
    x_sp[:, 3:7] /= np.linalg.norm(x_sp[:, 3:7], axis=1, keepdims=True)
    chi2_scipy = opt.chi2(x_sp)

    # both collapse the dead-reckoned drift and agree on the minimum
    assert chi2_ours < 0.2 * chi2_init, (chi2_ours, chi2_init)
    assert chi2_scipy < 0.2 * chi2_init
    assert chi2_ours == pytest.approx(chi2_scipy, rel=2e-2), (
        chi2_ours, chi2_scipy, chi2_init,
    )
