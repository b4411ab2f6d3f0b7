"""Robust loss functions.

A loss maps the *squared* residual norm ``s = ||r||^2`` to
``(rho(s), rho'(s), rho''(s))``. The Gauss-Newton reweighting uses
``w = rho'(s)``: the weight multiplies both the gradient J^T r and the
(upper-triangle) Hessian J^T J, while the accumulated cost uses ``rho(s)``
(reference: mahalanobis_distance_minimizer_analytic.cc:36-48).

Implemented losses mirror the reference set
(reference: nonlinear_optimizer/loss_function.h:11-77) plus the Cauchy loss
required by the benchmark configuration. All are branch-free jnp functions
(``jnp.where`` instead of ``if``) so they vectorize on the VPU and can be
fused into the factor kernels.

Each loss is a frozen dataclass registered as a JAX pytree, so it can be
passed through ``jit`` / ``shard_map`` boundaries and its parameters can be
traced values.
"""

from __future__ import annotations

import dataclasses
from typing import Tuple

import jax
import jax.numpy as jnp

Array = jax.Array


def _register(cls):
    fields = [f.name for f in dataclasses.fields(cls)]
    jax.tree_util.register_pytree_node(
        cls,
        lambda obj: (tuple(getattr(obj, n) for n in fields), None),
        lambda aux, children: cls(*children),
    )
    return cls


class LossFunction:
    """Base class. Subclasses implement ``evaluate``."""

    def evaluate(self, squared_residual: Array) -> Tuple[Array, Array, Array]:
        """Return (rho, rho', rho'') elementwise over ``squared_residual``."""
        raise NotImplementedError

    def __call__(self, squared_residual: Array) -> Tuple[Array, Array, Array]:
        return self.evaluate(squared_residual)


@_register
@dataclasses.dataclass(frozen=True)
class TrivialLoss(LossFunction):
    """rho(s) = s. The no-loss path of the reference solvers
    (mahalanobis_distance_minimizer_analytic.cc:44-47)."""

    def evaluate(self, s: Array):
        one = jnp.ones_like(s)
        return s, one, jnp.zeros_like(s)


@_register
@dataclasses.dataclass(frozen=True)
class ExponentialLoss(LossFunction):
    """NDT score function: rho(s) = c1 * (1 - exp(-c2 * s)).

    rho'  = 2*c1*c2 * exp(-c2*s)   [reference stores 2*c1*c2 as two_c1c2_]
    rho'' = -2*c2 * rho'

    Reference: loss_function.h:20-47. Note the reference's rho' carries the
    factor 2 (it differentiates w.r.t. the residual norm convention used by
    its weight application); we reproduce it exactly for cost/step parity.
    """

    c1: float = 1.0
    c2: float = 1.0

    def evaluate(self, s: Array):
        c1 = jnp.asarray(self.c1, dtype=s.dtype)
        c2 = jnp.asarray(self.c2, dtype=s.dtype)
        exp_term = jnp.exp(-c2 * s)
        rho = c1 - c1 * exp_term
        d_rho = 2.0 * c1 * c2 * exp_term
        dd_rho = -2.0 * c2 * d_rho
        return rho, d_rho, dd_rho


@_register
@dataclasses.dataclass(frozen=True)
class HuberLoss(LossFunction):
    """Huber loss on the squared residual.

    For s <= delta^2: (s, 1, 0)
    For s >  delta^2: (2*delta*sqrt(s) - delta^2, delta/sqrt(s), ...)

    Reference: loss_function.h:49-77 (its SIMD overload is an empty stub;
    here the vectorized path is first-class). Branches become jnp.where
    masks; sqrt is guarded so the gradient is NaN-free at s = 0.
    """

    threshold: float = 1.0

    def evaluate(self, s: Array):
        delta = jnp.asarray(self.threshold, dtype=s.dtype)
        sq_delta = delta * delta
        outlier = s > sq_delta
        safe_s = jnp.where(outlier, s, sq_delta)
        root = jnp.sqrt(safe_s)
        rho = jnp.where(outlier, 2.0 * delta * root - sq_delta, s)
        d_rho = jnp.where(outlier, delta / root, jnp.ones_like(s))
        dd_rho = jnp.where(outlier, -0.5 * delta / (safe_s * root), jnp.zeros_like(s))
        return rho, d_rho, dd_rho


@_register
@dataclasses.dataclass(frozen=True)
class CauchyLoss(LossFunction):
    """Cauchy (Lorentzian) loss: rho(s) = c^2 * log(1 + s/c^2)."""

    scale: float = 1.0

    def evaluate(self, s: Array):
        c2 = jnp.asarray(self.scale, dtype=s.dtype) ** 2
        inv = 1.0 / (1.0 + s / c2)
        rho = c2 * jnp.log1p(s / c2)
        d_rho = inv
        dd_rho = -(inv * inv) / c2
        return rho, d_rho, dd_rho


@_register
@dataclasses.dataclass(frozen=True)
class TukeyLoss(LossFunction):
    """Tukey biweight: hard redescending kernel (Ceres TukeyLoss).

    For s <= b^2: rho = (b^2/3) (1 - (1 - s/b^2)^3), rho' = (1 - s/b^2)^2,
    rho'' = -(2/b^2)(1 - s/b^2); beyond b^2 the kernel saturates
    (rho = b^2/3, zero weight) — gross outliers contribute NOTHING, unlike
    Huber/Cauchy whose influence only decays. The reference has no
    redescending kernel; standard SLAM toolkits (Ceres/g2o/GTSAM) do."""

    threshold: float = 1.0

    def evaluate(self, s: Array):
        b2 = jnp.asarray(self.threshold, dtype=s.dtype) ** 2
        u = jnp.maximum(1.0 - s / b2, 0.0)
        rho = (b2 / 3.0) * (1.0 - u * u * u)
        d_rho = u * u
        dd_rho = -(2.0 / b2) * u
        return rho, d_rho, dd_rho


@_register
@dataclasses.dataclass(frozen=True)
class GemanMcClureLoss(LossFunction):
    """Geman-McClure: rho(s) = c^2 s / (c^2 + s) — smooth redescending
    kernel saturating at c^2. Identical to the ANALYTIC (unclamped)
    Dynamic Covariance Scaling objective: minimizing the DCS inner
    problem s* = argmin s^2 chi^2 + Phi (s - 1)^2 and substituting gives
    exactly Phi chi^2 / (Phi + chi^2), i.e. Geman-McClure with
    c^2 = Phi (Agarwal et al., ICRA 2013, eq. 15)."""

    scale: float = 1.0

    def evaluate(self, s: Array):
        c2 = jnp.asarray(self.scale, dtype=s.dtype) ** 2
        inv = c2 / (c2 + s)
        rho = s * inv
        d_rho = inv * inv
        dd_rho = -2.0 * (inv * inv) / (c2 + s)
        return rho, d_rho, dd_rho


@_register
@dataclasses.dataclass(frozen=True)
class DCSLoss(LossFunction):
    """Dynamic Covariance Scaling with the published CLAMPED scaling
    s = min(1, 2 Phi / (Phi + chi^2)) (Agarwal et al., ICRA 2013):
    quadratic for chi^2 <= Phi, and beyond it the combined objective
    s^2 chi^2 + Phi (s - 1)^2 is identically Phi — a truncated
    quadratic. rho is continuous at the knee; rho' JUMPS from 1 to 0
    there (this framework's IRLS weight is rho', so edges past Phi are
    fully excluded each iteration — a hard in/out decision that can
    oscillate for residuals hovering at the knee). g2o's DCS kernel
    instead reweights with s^2 = (2 Phi/(Phi+chi^2))^2, which stays
    positive past the knee; that smooth-influence behavior is exactly
    :class:`GemanMcClureLoss` (the unclamped analytic DCS objective) —
    prefer it when porting DCS-tuned Phi values or when knee
    oscillation matters. This class is the alternative to switchable
    constraints with no switch variables in the state."""

    phi: float = 1.0

    def evaluate(self, s: Array):
        phi = jnp.asarray(self.phi, dtype=s.dtype)
        inlier = s <= phi
        rho = jnp.where(inlier, s, phi)
        d_rho = jnp.where(inlier, jnp.ones_like(s), jnp.zeros_like(s))
        return rho, d_rho, jnp.zeros_like(s)
