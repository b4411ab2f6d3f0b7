"""Autodiff oracle solver — the in-repo "Ceres".

The reference validates every analytic solver against a Ceres autodiff
baseline optimizing the identical objective (SURVEY section 4, "oracle
pattern"). Here the oracle is pure JAX: Jacobians come from ``jacfwd`` of
the residual function through the SAME manifold retraction the analytic
path uses, and the LM loop is the same driver — so any disagreement
isolates an analytic-Jacobian bug, not a policy difference.

Cites: mahalanobis_distance_minimizer_ceres.cc:15-58,
reprojection_error_minimizer_ceres.cc, and the oracle-parity results in
reference results/maha_amd64.txt.
"""

from __future__ import annotations

from typing import Callable, Optional, Tuple

import jax
import jax.numpy as jnp

from ..core.losses import LossFunction
from ..core.options import Options
from ..ops.quadratic import quadratic_from_jacobians
from . import lm

Array = jax.Array


def quadratic_via_autodiff(
    residual_fn: Callable,  # params -> (N, D) residuals
    retract: Callable,  # (params, delta) -> params
    params,
    tangent_dim: int,
    loss: Optional[LossFunction],
    mask: Optional[Array],
) -> Tuple[Array, Array, Array]:
    """(H, g, cost) with J = d residual / d local-delta at delta = 0."""
    leaves = jax.tree_util.tree_leaves(params)
    dtype = leaves[0].dtype
    delta0 = jnp.zeros((tangent_dim,), dtype)

    r = residual_fn(params)
    J = jax.jacfwd(lambda d: residual_fn(retract(params, d)))(delta0)  # (N, D, P)
    return quadratic_from_jacobians(r, J, mask, loss)


def solve(
    residual_fn: Callable,
    retract: Callable,
    params0,
    tangent_dim: int,
    options: Options,
    loss: Optional[LossFunction] = None,
    mask: Optional[Array] = None,
):
    """LM with autodiff Jacobians; same driver/policy as the analytic path."""

    def quad(params):
        return quadratic_via_autodiff(
            residual_fn, retract, params, tangent_dim, loss, mask
        )

    return lm.solve(quad, retract, params0, options)


def solve_scalar_rho(
    residual_fn: Callable,
    retract: Callable,
    params0,
    tangent_dim: int,
    options: Options,
    loss: LossFunction,
    mask: Optional[Array] = None,
):
    """The reference's "redundant for-each" Ceres formulation
    (MahalanobisDistanceMinimizerCeres::SolveByRedundantForEach,
    mahalanobis_distance_minimizer_ceres.cc, functor at
    ceres_cost_functor.h:135-180): each factor contributes ONE scalar
    residual sqrt(rho(||r_i||^2)) with the robust loss folded INTO the
    residual instead of into the reweighting — so the plain sum of
    squares equals the robustified cost. Slower (the reference measured
    it ~3-7x slower than its batch formulation) but optimizes the same
    objective; kept as a formulation-ablation oracle."""

    def scalar_residual_fn(params):
        r = residual_fn(params)  # (N, D)
        sq = jnp.sum(r * r, axis=-1)
        rho, _, _ = loss.evaluate(sq)
        # guard the sqrt gradient at rho = 0
        return jnp.sqrt(jnp.maximum(rho, 1e-30))[:, None]  # (N, 1)

    def quad(params):
        return quadratic_via_autodiff(
            scalar_residual_fn, retract, params, tangent_dim, None, mask
        )

    return lm.solve(quad, retract, params0, options)
