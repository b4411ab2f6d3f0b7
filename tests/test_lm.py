"""LM driver policy tests: convergence, damping adaptation, summaries.

The policy under test is the reference loop
(mahalanobis_distance_minimizer_analytic.cc:84-152).
"""

import jax
import jax.numpy as jnp
import numpy as np

from nonlinear_optimizer_for_slam_tpu.core.options import (
    LinearSolverType,
    MinimizerType,
    Options,
)
from nonlinear_optimizer_for_slam_tpu.solvers import lm

F64 = jnp.float64


def _quadratic_problem(A, b):
    """min 0.5 ||A x - b||^2 as an (H, g, cost) oracle with identity
    retraction."""

    def quad(x):
        r = A @ x - b
        return A.T @ A, A.T @ r, jnp.sum(r * r)

    def retract(x, delta):
        return x + delta

    return quad, retract


def test_converges_on_linear_least_squares(rng):
    A = jnp.asarray(rng.normal(size=(12, 4)), F64)
    x_true = jnp.asarray(rng.normal(size=4), F64)
    b = A @ x_true
    quad, retract = _quadratic_problem(A, b)
    x, summary = lm.solve(quad, retract, jnp.zeros(4, F64), Options())
    np.testing.assert_allclose(np.asarray(x), np.asarray(x_true), atol=1e-5)
    assert bool(summary.converged)
    assert int(summary.iterations) < 40


def test_lambda_adaptation_policy(rng):
    """lambda halves (x0.6) while cost decreases, clamped to [1e-6, 1e-2]
    (reference .._analytic.cc:146-147)."""
    A = jnp.asarray(rng.normal(size=(20, 6)), F64)
    b = jnp.asarray(rng.normal(size=20), F64)
    quad, retract = _quadratic_problem(A, b)
    opts = Options().replace(
        convergence_handle=Options().convergence_handle.__class__(
            parameter_tolerance=0.0, gradient_tolerance=0.0
        ),
        max_iterations=10,
    )
    _, summary = lm.solve(quad, retract, jnp.zeros(6, F64), opts)
    lams = np.asarray(summary.records.lam)
    costs = np.asarray(summary.records.cost)
    np.testing.assert_allclose(lams[0], 1e-3)
    # each step applies x2.0 on cost increase / x0.6 on decrease, clamped
    prev_cost = np.finfo(np.float64).max
    for i in range(1, 10):
        factor = 2.0 if costs[i - 1] > prev_cost else 0.6
        expected = np.clip(lams[i - 1] * factor, 1e-6, 1e-2)
        np.testing.assert_allclose(lams[i], expected, rtol=1e-6)
        prev_cost = costs[i - 1]


def test_records_and_costs(rng):
    A = jnp.asarray(rng.normal(size=(12, 3)), F64)
    b = A @ jnp.asarray([1.0, -2.0, 0.5], F64)
    quad, retract = _quadratic_problem(A, b)
    x, summary = lm.solve(quad, retract, jnp.zeros(3, F64), Options())
    costs = np.asarray(summary.records.cost)
    n = int(summary.iterations)
    assert np.all(np.isfinite(costs[: n + 1]))
    assert np.all(np.isnan(costs[n + 1 :]))
    # final_cost is the cost evaluated in the last executed iteration
    np.testing.assert_allclose(float(summary.final_cost), costs[n], rtol=1e-12)
    # reported_cost mirrors the reference COST print (lags by one)
    if n >= 1:
        np.testing.assert_allclose(float(summary.reported_cost), costs[n - 1], rtol=1e-12)


def test_gradient_descent_mode(rng):
    A = jnp.asarray(rng.normal(size=(8, 2)), F64)
    x_true = jnp.asarray([0.3, -0.7], F64)
    b = A @ x_true
    quad, retract = _quadratic_problem(A, b)
    opts = Options().replace(
        minimizer_type=MinimizerType.GRADIENT_DESCENT, max_iterations=8000
    )
    x, _ = lm.solve(quad, retract, jnp.zeros(2, F64), opts)
    np.testing.assert_allclose(np.asarray(x), np.asarray(x_true), atol=1e-3)


def test_linear_solver_types_agree(rng):
    A = jnp.asarray(rng.normal(size=(30, 6)), F64)
    x_true = jnp.asarray(rng.normal(size=6), F64)
    b = A @ x_true
    quad, retract = _quadratic_problem(A, b)
    sols = []
    for st in (
        LinearSolverType.DENSE_CHOLESKY,
        LinearSolverType.DENSE_QR,
        LinearSolverType.SPARSE_CHOLESKY,
        LinearSolverType.CONJUGATE_GRADIENT,
    ):
        x, _ = lm.solve(
            quad, retract, jnp.zeros(6, F64), Options().replace(linear_solver_type=st)
        )
        sols.append(np.asarray(x))
    for s in sols[1:]:
        np.testing.assert_allclose(s, sols[0], atol=1e-5)


def test_jit_compatible(rng):
    A = jnp.asarray(rng.normal(size=(12, 4)), F64)
    b = jnp.asarray(rng.normal(size=12), F64)
    quad, retract = _quadratic_problem(A, b)
    opts = Options()

    @jax.jit
    def run(x0):
        return lm.solve(quad, retract, x0, opts)

    x, summary = run(jnp.zeros(4, F64))
    assert np.all(np.isfinite(np.asarray(x)))


def test_relative_function_tolerance_plateau(rng):
    """Opt-in relative cost-plateau stop (round-4): a LARGE-RESIDUAL
    least-squares problem (noisy b) creeps linearly under GN — the
    absolute step/gradient tolerances never fire at default scale, but
    the relative plateau check does; default-off keeps the reference
    policy byte-identical."""
    import dataclasses

    from nonlinear_optimizer_for_slam_tpu.core.options import (
        ConvergenceHandle,
    )

    A = jnp.asarray(rng.normal(size=(60, 8)), F64)
    x_true = jnp.asarray(rng.normal(size=8), F64)
    b = A @ x_true + jnp.asarray(rng.normal(size=60), F64)  # large residual
    quad, retract = _quadratic_problem(A, b)
    # tight absolute tolerances so only the relative check can fire
    ch = ConvergenceHandle(
        gradient_tolerance=1e-300,
        parameter_tolerance=1e-300,
        relative_function_tolerance=1e-8,
    )
    opts = dataclasses.replace(
        Options().replace(max_iterations=200), convergence_handle=ch
    )
    x, summary = lm.solve(quad, retract, jnp.zeros(8, F64), opts)
    assert bool(summary.converged)
    assert int(summary.iterations) < 200
    # same solution as the cap-limited default policy
    ch_off = ConvergenceHandle(
        gradient_tolerance=1e-300, parameter_tolerance=1e-300
    )
    x_ref, s_ref = lm.solve(
        quad, retract, jnp.zeros(8, F64),
        dataclasses.replace(
            Options().replace(max_iterations=200), convergence_handle=ch_off
        ),
    )
    assert int(s_ref.iterations) == 200  # default policy runs to cap
    np.testing.assert_allclose(np.asarray(x), np.asarray(x_ref), rtol=1e-6)


def test_relative_tolerance_fires_at_f32(rng):
    """Regression (round-4 review): the (1 - rtol) multiplier form
    rounds to exactly 1.0f for rtol < ~6e-8, silently degrading the
    plateau check at f32; the rearranged (best - cost) > rtol*best form
    must still fire."""
    import dataclasses

    from nonlinear_optimizer_for_slam_tpu.core.options import (
        ConvergenceHandle,
    )

    F32 = jnp.float32
    A = jnp.asarray(rng.normal(size=(60, 8)), F32)
    x_true = jnp.asarray(rng.normal(size=8), F32)
    b = A @ x_true + jnp.asarray(rng.normal(size=60), F32)
    quad, retract = _quadratic_problem(A, b)
    ch = ConvergenceHandle(
        gradient_tolerance=0.0,
        parameter_tolerance=0.0,
        relative_function_tolerance=1e-8,  # below the f32 (1-rtol) floor
    )
    opts = dataclasses.replace(
        Options().replace(max_iterations=300), convergence_handle=ch
    )
    x, summary = lm.solve(quad, retract, jnp.zeros(8, F32), opts)
    assert bool(summary.converged)
    assert int(summary.iterations) < 300
