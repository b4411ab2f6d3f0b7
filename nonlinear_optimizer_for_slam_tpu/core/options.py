"""Solver configuration.

TPU-native re-design of the reference solver options
(reference: nonlinear_optimizer/options.h:6-28). Field names and defaults
mirror the reference exactly so that identical configurations reproduce
identical optimization traces:

- ``max_iterations = 40``
- function/gradient/parameter tolerances = 1e-6
- LM damping bounds lambda in [1e-6, 1e-2], initial 1e-3, adaptation
  x2.0 on cost increase / x0.6 on decrease
  (reference: mahalanobis_distance_minimizer_analytic.cc:84-147).

Unlike the reference — where the ``MinimizerType`` / ``LinearSolverType``
enums exist but are never read (every solver hard-codes the damped-GN loop
and its own linear solve) — this framework dispatches on them for real.
``GAUSS_NEWTON`` and ``LEVENBERG_MARQUARDT`` both select the reference's
damped loop (that is what the reference's "Gauss-Newton" actually is);
``GRADIENT_DESCENT`` takes plain first-order steps. ``QUASI_NEWTON``
aliases the damped loop as well: with exact J^T J available every
iteration at batch cost, a secant approximation would be strictly worse —
the enum value exists for reference API parity (options.h:6-11, where it
is equally unimplemented).
"""

from __future__ import annotations

import dataclasses
import enum


class MinimizerType(enum.Enum):
    """Mirror of reference MinimizerType (options.h:6-11)."""

    GAUSS_NEWTON = 0
    GRADIENT_DESCENT = 1
    QUASI_NEWTON = 2
    LEVENBERG_MARQUARDT = 3


class LinearSolverType(enum.Enum):
    """Mirror of reference LinearSolverType (options.h:13)."""

    DENSE_QR = 0
    DENSE_CHOLESKY = 1
    SPARSE_CHOLESKY = 2  # mapped to dense/block-Cholesky on TPU
    CONJUGATE_GRADIENT = 3  # TPU-native extra: matrix-free PCG


@dataclasses.dataclass(frozen=True)
class ConvergenceHandle:
    """Stopping tolerances (reference: options.h:19-23)."""

    function_tolerance: float = 1e-6
    gradient_tolerance: float = 1e-6
    parameter_tolerance: float = 1e-6
    # Opt-in RELATIVE cost-plateau stop (0.0 = off, the default — the
    # reference has no such check and the parity-traced paths never set
    # it). The reference's absolute step/gradient tolerances cannot fire
    # on large problems (||delta|| is an absolute L2 norm over ALL
    # parameters: at 50k poses even a fully-stalled LM step sits orders
    # of magnitude above 1e-6), so fixed-budget runs silently pay
    # post-plateau iterations; setting e.g. 1e-8 stops when a DECREASING
    # step improves the cost by less than that relative amount.
    relative_function_tolerance: float = 0.0


@dataclasses.dataclass(frozen=True)
class OptimizationHandle:
    """LM damping policy.

    Bounds come from reference options.h:24-27; the initial value and the
    up/down factors are hard-coded constants in every reference solver
    (mahalanobis_distance_minimizer_analytic.cc:88,146-147) and are exposed
    here as real options.
    """

    min_lambda: float = 1e-6
    max_lambda: float = 1e-2
    initial_lambda: float = 1e-3
    lambda_increase_factor: float = 2.0
    lambda_decrease_factor: float = 0.6
    # Step size used when minimizer_type == GRADIENT_DESCENT.
    gradient_descent_step: float = 1e-3


@dataclasses.dataclass(frozen=True)
class Options:
    """Solver options (reference: options.h:15-28)."""

    max_iterations: int = 40
    minimizer_type: MinimizerType = MinimizerType.GAUSS_NEWTON
    linear_solver_type: LinearSolverType = LinearSolverType.DENSE_CHOLESKY
    convergence_handle: ConvergenceHandle = dataclasses.field(
        default_factory=ConvergenceHandle
    )
    optimization_handle: OptimizationHandle = dataclasses.field(
        default_factory=OptimizationHandle
    )

    def replace(self, **kwargs) -> "Options":
        return dataclasses.replace(self, **kwargs)
