"""BAL format IO + Snavely-model solver tests.

External-anchor cross-checks against scipy/torch live in
tests/test_external_anchor.py; these cover the reader/writer and the
solver in isolation.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from nonlinear_optimizer_for_slam_tpu.core.options import Options
from nonlinear_optimizer_for_slam_tpu.io import bal as bal_io
from nonlinear_optimizer_for_slam_tpu.solvers import bal as bal_solver


@pytest.fixture(scope="module")
def problem_pair():
    return bal_io.synthetic_bal_problem(
        num_cameras=8, num_points=150, observations_per_point=4, seed=3
    )


def test_bal_roundtrip(tmp_path, problem_pair):
    noisy, _ = problem_pair
    path = str(tmp_path / "prob.txt")
    bal_io.write_bal(path, noisy)
    back = bal_io.read_bal(path)
    assert back.num_cameras == noisy.num_cameras
    assert back.num_points == noisy.num_points
    assert back.num_observations == noisy.num_observations
    np.testing.assert_array_equal(back.camera_indices, noisy.camera_indices)
    np.testing.assert_array_equal(back.point_indices, noisy.point_indices)
    np.testing.assert_allclose(back.camera_params, noisy.camera_params, rtol=1e-15)
    np.testing.assert_allclose(back.points, noisy.points, rtol=1e-15)
    np.testing.assert_allclose(back.observations, noisy.observations, rtol=1e-15)


def test_bal_reader_rejects_malformed(tmp_path):
    path = str(tmp_path / "bad.txt")
    with open(path, "w") as f:
        f.write("1 1 1\n0 0 1.0 2.0\n1.0 2.0\n")  # far too few params
    with pytest.raises(ValueError):
        bal_io.read_bal(path)


def test_snavely_jax_matches_numpy(problem_pair):
    """The jax residual (solver) and the numpy projector (generator) are
    independent implementations of the same model — they must agree."""
    noisy, _ = problem_pair
    cams = noisy.camera_params[noisy.camera_indices]  # (O, 9)
    pts = noisy.points[noisy.point_indices]  # (O, 3)
    want = bal_io.snavely_project(cams, pts)
    import jax

    got = jax.vmap(bal_solver.snavely_residual)(
        jnp.asarray(cams), jnp.asarray(pts), jnp.zeros((cams.shape[0], 2))
    )
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-12, atol=1e-12)


def test_snavely_rodrigues_small_angle():
    """AD-safe small-angle branch: rotation by ~0 is identity and the
    jacobian is finite there."""
    import jax

    x = jnp.asarray([0.3, -0.2, 1.4])
    r0 = bal_solver._rodrigues_rotate(jnp.zeros(3), x)
    np.testing.assert_allclose(np.asarray(r0), np.asarray(x), rtol=1e-15)
    J = jax.jacfwd(bal_solver._rodrigues_rotate)(jnp.zeros(3), x)
    assert np.all(np.isfinite(np.asarray(J)))
    # d(R(w) x)/dw at w = 0 is -skew(x)
    skew = np.array([[0, -1.4, -0.2], [1.4, 0, -0.3], [0.2, 0.3, 0]])
    np.testing.assert_allclose(np.asarray(J), -skew, atol=1e-6)


def test_solve_bal_converges(problem_pair):
    """Cost drops from the perturbed init to (near) the pixel-noise
    floor; the ground-truth cost bounds the achievable minimum from
    above (the solver can only do better than the generating params)."""
    noisy, truth = problem_pair
    c_init = bal_solver.bal_cost(noisy)
    c_truth = bal_solver.bal_cost(truth)
    solved, summary = bal_solver.solve_bal(
        noisy, Options().replace(max_iterations=50)
    )
    c_final = bal_solver.bal_cost(solved)
    assert c_final < 0.05 * c_init
    assert c_final <= c_truth * (1.0 + 1e-6)
    assert int(summary.iterations) <= 50
    # per-iteration records exist and the recorded trace reaches c_final
    rec = np.asarray(summary.records.cost)
    rec = rec[np.isfinite(rec)]
    assert rec.size >= 2
    assert rec.min() <= c_init


def test_solve_bal_chunked_matches_dense(problem_pair):
    """The landmark-chunked Schur cross-term accumulation (the memory-
    bounded path for large BAL instances) is the identical math: same
    trajectory, same final parameters as the dense (C, P, 9, 3) scatter."""
    noisy, _ = problem_pair
    opts = Options().replace(max_iterations=25)
    dense, dsum = bal_solver.solve_bal(noisy, opts)
    chunked, csum = bal_solver.solve_bal(noisy, opts, landmark_chunk=37)
    assert int(dsum.iterations) == int(csum.iterations)
    np.testing.assert_allclose(
        chunked.camera_params, dense.camera_params, rtol=1e-9, atol=1e-11
    )
    np.testing.assert_allclose(
        chunked.points, dense.points, rtol=1e-9, atol=1e-11
    )
    # per-iteration cost traces identical to f64 roundoff
    np.testing.assert_allclose(
        np.asarray(csum.records.cost), np.asarray(dsum.records.cost),
        rtol=1e-10, equal_nan=True,
    )


def test_solve_bal_auto_chunk_threshold():
    """Auto chunk selection kicks in above the dense-cross budget and
    still solves correctly (small problem, artificially tiny budget).
    P must exceed the 128-landmark chunk floor or the auto-selected
    chunk >= P silently falls back to the dense branch."""
    noisy, _ = bal_io.synthetic_bal_problem(
        num_cameras=6, num_points=200, observations_per_point=3, seed=9
    )
    budget = bal_solver._DENSE_CROSS_BUDGET_BYTES
    bal_solver._DENSE_CROSS_BUDGET_BYTES = 64 * 1024  # force chunking
    try:
        # the auto-selection formula must pick a chunk that genuinely
        # exercises the chunked branch (chunk < P) on this problem
        itemsize = 8
        chunk = max(128, bal_solver._DENSE_CROSS_BUDGET_BYTES // (2 * 6 * 27 * itemsize))
        assert chunk < noisy.num_points, "fixture no longer forces chunking"
        solved, _ = bal_solver.solve_bal(
            noisy, Options().replace(max_iterations=30)
        )
    finally:
        bal_solver._DENSE_CROSS_BUDGET_BYTES = budget
    assert bal_solver.bal_cost(solved) < 0.05 * bal_solver.bal_cost(noisy)


def test_read_bal_rejects_negative_indices(tmp_path):
    """Negative observation indices must raise, not wrap via fancy
    indexing into the wrong parameter blocks (ADVICE r3)."""
    prob, _ = bal_io.synthetic_bal_problem(
        num_cameras=3, num_points=10, observations_per_point=2, seed=1
    )
    path = tmp_path / "neg.txt"
    bal_io.write_bal(path, prob)
    text = path.read_text().split("\n")
    # first observation line: "cam pt u v" -> corrupt cam index to -1
    parts = text[1].split()
    parts[0] = "-1"
    text[1] = " ".join(parts)
    path.write_text("\n".join(text))
    with pytest.raises(ValueError, match="out of range"):
        bal_io.read_bal(path)


def test_solve_bal_iterative_schur_matches_dense(problem_pair):
    """ITERATIVE_SCHUR (matrix-free PCG on the reduced camera system,
    Schur-Jacobi preconditioner) reaches the dense-Schur final cost —
    steps are truncated-Krylov inexact, so trajectories may differ, but
    the optimum agrees to rel 1e-6 (the round-3 verdict's acceptance
    bar for this path)."""
    noisy, _ = problem_pair
    opts = Options().replace(max_iterations=40)
    dense, dsum = bal_solver.solve_bal(noisy, opts)
    it, isum = bal_solver.solve_bal(
        noisy, opts, schur="iterative", schur_iterations=80
    )
    c_dense = bal_solver.bal_cost(dense)
    c_iter = bal_solver.bal_cost(it)
    np.testing.assert_allclose(c_iter, c_dense, rtol=1e-6)


def test_solve_bal_iterative_schur_rejects_unknown_mode(problem_pair):
    noisy, _ = problem_pair
    with pytest.raises(ValueError, match="schur"):
        bal_solver.solve_bal(noisy, schur="sparse")


def test_bal_plateau_summary_and_best_state(problem_pair):
    """Round-5 monotone safeguard plumbing on the BAL loop: with the
    plateau stop enabled, Summary reports plateau_stop/best_cost, the
    returned state's cost equals final_cost, and final_cost is never
    above the monotone best of the recorded trace. Default options keep
    the fields None (parity-path API unchanged)."""
    import dataclasses

    from nonlinear_optimizer_for_slam_tpu.core.options import (
        ConvergenceHandle,
    )

    noisy, _ = problem_pair
    _, s_plain = bal_solver.solve_bal(
        noisy, Options().replace(max_iterations=5)
    )
    assert s_plain.plateau_stop is None and s_plain.best_cost is None

    opts = dataclasses.replace(
        Options().replace(max_iterations=60),
        convergence_handle=ConvergenceHandle(
            gradient_tolerance=0.0, parameter_tolerance=0.0,
            relative_function_tolerance=1e-7,
        ),
    )
    solved, s = bal_solver.solve_bal(noisy, opts)
    assert bool(s.converged)
    assert s.plateau_stop is not None and bool(s.plateau_stop)
    rec = np.asarray(s.records.cost)
    rec = rec[np.isfinite(rec)]
    assert float(s.best_cost) <= rec.min() * (1 + 1e-12)
    # plateau exits return the best-seen state: the returned params'
    # actual cost matches the reported final_cost (= best_cost)
    np.testing.assert_allclose(
        bal_solver.bal_cost(solved), float(s.final_cost), rtol=1e-9
    )
    np.testing.assert_allclose(
        float(s.final_cost), float(s.best_cost), rtol=0
    )
