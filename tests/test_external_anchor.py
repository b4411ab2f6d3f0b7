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

Both the BAL bundle-adjustment path and the pose-graph path are anchored
this way at test scale; benchmarks/external_anchor.py runs the same
cross-checks at headline scale (problem-49-7776-shape BAL, sphere2500)
and writes results/external_anchor.md.
"""

import numpy as np
import pytest

from nonlinear_optimizer_for_slam_tpu.core.options import Options
from nonlinear_optimizer_for_slam_tpu.io import bal as bal_io
from nonlinear_optimizer_for_slam_tpu.solvers import bal as bal_solver


# ---------------------------------------------------------------------------
# BAL / bundle adjustment
# ---------------------------------------------------------------------------


def _scipy_solve_bal(problem, max_nfev=400):
    """Independent BAL solve: scipy TRF + finite-difference sparse
    Jacobians over a NUMPY residual (io.bal.snavely_project — written
    separately from the jax solver path)."""
    from scipy.optimize import least_squares
    from scipy.sparse import lil_matrix

    C, P, O = problem.num_cameras, problem.num_points, problem.num_observations
    ci, pi = problem.camera_indices, problem.point_indices
    obs = problem.observations

    def residuals(x):
        cams = x[: 9 * C].reshape(C, 9)
        pts = x[9 * C :].reshape(P, 3)
        pred = bal_io.snavely_project(cams[ci], pts[pi])
        return (pred - obs).ravel()

    x0 = np.concatenate(
        [problem.camera_params.ravel(), problem.points.ravel()]
    )
    spars = lil_matrix((2 * O, x0.size), dtype=int)
    for o in range(O):
        spars[2 * o : 2 * o + 2, 9 * ci[o] : 9 * ci[o] + 9] = 1
        spars[2 * o : 2 * o + 2, 9 * C + 3 * pi[o] : 9 * C + 3 * pi[o] + 3] = 1
    res = least_squares(
        residuals,
        x0,
        jac_sparsity=spars,
        method="trf",
        tr_solver="lsmr",
        x_scale="jac",
        ftol=1e-12,
        xtol=1e-12,
        gtol=1e-12,
        max_nfev=max_nfev,
    )
    return res


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

    sp = _scipy_solve_bal(noisy)
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


def _np_quat_normalize(q):
    return q / np.linalg.norm(q, axis=-1, keepdims=True)


def _np_quat_multiply(a, b):
    w1, x1, y1, z1 = a[..., 0], a[..., 1], a[..., 2], a[..., 3]
    w2, x2, y2, z2 = b[..., 0], b[..., 1], b[..., 2], b[..., 3]
    return np.stack(
        [
            w1 * w2 - x1 * x2 - y1 * y2 - z1 * z2,
            w1 * x2 + x1 * w2 + y1 * z2 - z1 * y2,
            w1 * y2 - x1 * z2 + y1 * w2 + z1 * x2,
            w1 * z2 + x1 * y2 - y1 * x2 + z1 * w2,
        ],
        axis=-1,
    )


def _np_quat_conj(q):
    return q * np.array([1.0, -1.0, -1.0, -1.0])


def _np_quat_rotate(q, v):
    w, xyz = q[..., 0:1], q[..., 1:]
    t = 2.0 * np.cross(xyz, v)
    return v + w * t + np.cross(xyz, t)


def _edge_residuals_np(positions, quats, edges_ij, t_rel, q_rel):
    """Independent numpy implementation of the g2o-convention edge error
    the loader wires up: r = [ (p_q - p_ref) - R(q_ref) t_rel,
    vec(q_q^-1 q_ref q_rel) ], quaternions normalized. (The repo residual
    carries 2*vec on the rotation rows — ops/relative_pose.py — and
    io/g2o.py's loader folds the compensating diag(1,1,1,.5,.5,.5) into
    the edge sqrt-information, so what the solver MINIMIZES for a g2o
    file is exactly this chi^2. The world-frame translation spelling is
    norm-equivalent to g2o's measurement-frame one for the block-scalar
    information this fixture carries.) Written from the spec, not
    imported — the anchor's shared-functor layer."""
    i, j = edges_ij[:, 0], edges_ij[:, 1]
    q = _np_quat_normalize(quats)
    r_t = (positions[j] - positions[i]) - _np_quat_rotate(q[i], t_rel)
    err_q = _np_quat_multiply(_np_quat_multiply(_np_quat_conj(q[j]), q[i]), q_rel)
    r_q = err_q[..., 1:]
    return np.concatenate([r_t, r_q], axis=-1)  # (E, 6)


def _sphere_chi2(positions, quats, edges_ij, t_rel, q_rel, sqrt_infos):
    r = _edge_residuals_np(positions, quats, edges_ij, t_rel, q_rel)
    wr = np.einsum("eab,eb->ea", sqrt_infos, r)
    return float(np.sum(wr * wr))


@pytest.fixture(scope="module")
def sphere_fixture():
    from nonlinear_optimizer_for_slam_tpu.io.g2o import write_g2o
    from nonlinear_optimizer_for_slam_tpu.utils import testing as tu

    g, gt = tu.generate_sphere_g2o(n_rings=4, per_ring=30, radius=10.0)
    N = len(g.vertices)
    E = len(g.edges)
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


def _scipy_solve_sphere(edges_ij, t_rel, q_rel, sqrt_infos, pos0, q0,
                        max_nfev=300):
    """Independent pose-graph solve: scipy TRF over the numpy residual,
    pose 0 held fixed (gauge), quaternion norms pinned by extra residual
    rows (quaternion scale is an exact gauge direction of the normalized
    residual)."""
    from scipy.optimize import least_squares
    from scipy.sparse import lil_matrix

    N = pos0.shape[0]
    E = edges_ij.shape[0]

    def unpack(x):
        pos = np.concatenate([pos0[:1], x[: 3 * (N - 1)].reshape(N - 1, 3)])
        q = np.concatenate([q0[:1], x[3 * (N - 1) :].reshape(N - 1, 4)])
        return pos, q

    def residuals(x):
        pos, q = unpack(x)
        r = _edge_residuals_np(pos, q, edges_ij, t_rel, q_rel)
        wr = np.einsum("eab,eb->ea", sqrt_infos, r).ravel()
        pin = np.sum(q[1:] * q[1:], axis=-1) - 1.0
        return np.concatenate([wr, pin])

    x0 = np.concatenate([pos0[1:].ravel(), q0[1:].ravel()])
    spars = lil_matrix((6 * E + (N - 1), x0.size), dtype=int)
    for e in range(E):
        for v in edges_ij[e]:
            if v == 0:
                continue
            spars[6 * e : 6 * e + 6, 3 * (v - 1) : 3 * v] = 1
            spars[6 * e : 6 * e + 6, 3 * (N - 1) + 4 * (v - 1) : 3 * (N - 1) + 4 * v] = 1
    for v in range(1, N):
        spars[6 * E + v - 1, 3 * (N - 1) + 4 * (v - 1) : 3 * (N - 1) + 4 * v] = 1
    res = least_squares(
        residuals,
        x0,
        jac_sparsity=spars,
        method="trf",
        tr_solver="lsmr",
        x_scale="jac",
        ftol=1e-12,
        xtol=1e-12,
        gtol=1e-12,
        max_nfev=max_nfev,
    )
    pos, q = unpack(res.x)
    return pos, _np_quat_normalize(q)


def test_sphere_chi2_matches_scipy(sphere_fixture, tmp_path):
    """Sphere-world pose graph (the sphere2500 construction at 120-pose
    test scale): our PoseGraphOptimizer and scipy TRF must reach the same
    chi^2 of the same objective, evaluated by the INDEPENDENT numpy
    chi^2 implementation."""
    from nonlinear_optimizer_for_slam_tpu.io import g2o as g2o_io

    g, gt, edges_ij, t_rel, q_rel, sqrt_infos, pos0, q0 = sphere_fixture
    N = pos0.shape[0]

    chi2_init = _sphere_chi2(pos0, q0, edges_ij, t_rel, q_rel, sqrt_infos)

    path = str(tmp_path / "sphere.g2o")
    g2o_io.write_g2o(path, g)
    opt = g2o_io.load_pose_graph(path)
    summary, _ = opt.solve(Options().replace(max_iterations=150))
    ours_pos = np.stack([opt.get_pose(k).translation for k in range(N)])
    ours_q = np.stack([opt.get_pose(k).quaternion() for k in range(N)])
    chi2_ours = _sphere_chi2(ours_pos, ours_q, edges_ij, t_rel, q_rel, sqrt_infos)

    sp_pos, sp_q = _scipy_solve_sphere(
        edges_ij, t_rel, q_rel, sqrt_infos, pos0, q0
    )
    chi2_scipy = _sphere_chi2(sp_pos, sp_q, edges_ij, t_rel, q_rel, sqrt_infos)

    # both solvers collapse the dead-reckoned drift by orders of magnitude
    assert chi2_ours < 1e-2 * chi2_init
    assert chi2_scipy < 1e-2 * chi2_init
    # ... and agree on the reachable minimum
    assert chi2_ours == pytest.approx(chi2_scipy, rel=2e-2), (
        chi2_ours,
        chi2_scipy,
        chi2_init,
    )
