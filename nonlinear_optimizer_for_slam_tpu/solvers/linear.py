"""Dense linear solvers for the damped normal equations.

The reference hard-codes its linear solve per module (``hessian.inverse()``
in the analytic paths, ``ldlt`` in the SIMD path) and never reads its
``LinearSolverType`` enum. Here the enum dispatches for real. All solvers
are static-shape jnp and safe inside ``lax.while_loop``.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import jax.scipy.linalg as jsl

from ..core.options import LinearSolverType

Array = jax.Array


def solve_normal_equations(
    hessian: Array, rhs: Array, solver_type: LinearSolverType
) -> Array:
    """Solve H x = rhs for symmetric (damped) H.

    DENSE_CHOLESKY: Cholesky (the ldlt analog,
        mahalanobis_distance_minimizer_analytic_simd.cc:85).
    DENSE_QR: QR-based solve (the Ceres DENSE_QR analog).
    SPARSE_CHOLESKY: dense Cholesky fallback — block-sparse problems
        assemble a dense H at the sizes the reference exercises (80 poses).
    CONJUGATE_GRADIENT: matrix-free CG (TPU-native extra for large systems).
    """
    if solver_type == LinearSolverType.DENSE_QR:
        q, r = jnp.linalg.qr(hessian)
        return jsl.solve_triangular(r, q.T @ rhs, lower=False)
    if solver_type == LinearSolverType.CONJUGATE_GRADIENT:
        x, _ = jax.scipy.sparse.linalg.cg(hessian, rhs, maxiter=10 * rhs.shape[-1])
        return x
    # DENSE_CHOLESKY / SPARSE_CHOLESKY
    factor = jsl.cho_factor(hessian, lower=True)
    return jsl.cho_solve(factor, rhs)


def damp_hessian(hessian: Array, lam: Array) -> Array:
    """Multiplicative diagonal damping H[k,k] *= (1 + lambda)
    (reference: mahalanobis_distance_minimizer_analytic.cc:126)."""
    dim = hessian.shape[-1]
    eye = jnp.eye(dim, dtype=hessian.dtype)
    return hessian + lam * hessian * eye
