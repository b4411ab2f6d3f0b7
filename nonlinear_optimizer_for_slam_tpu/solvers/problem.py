"""Generic pose-problem framework: the reference's WIP mini-Ceres, built.

The reference ships an unbuilt, templated Problem / CostFunction /
ResidualBlock / PoseOptimizer quartet (pose_optimizer/pose_optimizer.h:
43-145, cost_function.h, cost_functors.h; excluded from its CMake build
and #including a nonexistent header). This module provides the working
TPU-native equivalent:

- ``CostFunction``: a BATCH of residuals of one type. Subclasses provide
  ``residuals(rotation, translation) -> (N, D)``; analytic Jacobians are
  optional — the default differentiates through the SE(3)/SE(2) retraction
  with ``jax.jacfwd`` (the reference's generic path is hand-written per
  functor).
- ``Problem``: a set of residual blocks, each with an optional robust
  loss. (The reference's ResidualBlock::Evaluate has an inverted
  ``if (loss_function_)`` branch that silently SKIPS the loss when one is
  set, cost_function.h:96-104 — implemented correctly here.)
- ``PoseOptimizer``: LM loop with the reference pose_optimizer's OWN
  policy, which differs from the per-module analytic solvers:
  max_iterations=100, parameter/gradient/function tolerances
  1e-8/1e-10/1e-6, the function_tolerance IS read
  (|cost - prev| < tol breaks), and convergence is checked BEFORE the
  step is applied (pose_optimizer.h:115-127) — not after, as in
  mahalanobis_distance_minimizer_analytic.cc:130-148.

Update rule: t += dt; R <- R * exp(dR) with the shared ComputeQuaternion
small-angle map. (The reference's Eigen ``translate()`` would apply
t += R * dt; that module was never built or validated, so we keep the
convention every working reference solver uses.)

Built-in functors mirror cost_functors.h: Mahalanobis (3,), point-to-
plane (1,), translation prior, rotation prior (the reference's
RotationDeltaCostFunctor is an empty stub — implemented for real here).
"""

from __future__ import annotations

import dataclasses
from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..core import lie
from ..core.losses import LossFunction
from ..core.pose import Pose
from ..ops.quadratic import quadratic_from_jacobians
from .lm import IterationRecord, Summary

Array = jax.Array


@dataclasses.dataclass(frozen=True)
class GenericOptions:
    """Reference pose_optimizer Options (pose_optimizer.h:43-61)."""

    max_iterations: int = 100
    parameter_tolerance: float = 1e-8
    gradient_tolerance: float = 1e-10
    function_tolerance: float = 1e-6
    min_lambda: float = 1e-6
    max_lambda: float = 1e-2
    initial_lambda: float = 1e-3
    lambda_increasing_factor: float = 2.0
    lambda_decreasing_factor: float = 0.6


class CostFunction:
    """A batch of same-type residuals on SE(3). Subclasses implement
    ``residuals``; override ``residuals_and_jacobians`` for analytic J."""

    def residuals(self, rotation: Array, translation: Array) -> Array:
        raise NotImplementedError

    def residuals_and_jacobians(
        self, rotation: Array, translation: Array
    ) -> Tuple[Array, Array]:
        """(r (N, D), J (N, D, 6)); default = jacfwd through the SE(3)
        retraction at delta = 0."""
        r = self.residuals(rotation, translation)

        def at_delta(delta):
            dq = lie.so3_exp_quaternion(delta[3:6])
            dR = lie.quat_to_rotmat(dq)
            return self.residuals(rotation @ dR, translation + delta[:3])

        J = jax.jacfwd(at_delta)(jnp.zeros(6, rotation.dtype))
        return r, J

    def mask(self) -> Optional[Array]:
        return None


class MahalanobisDistanceCostFunctor(CostFunction):
    """r = S (R p + t - mu) (reference: cost_functors.h:55-104)."""

    def __init__(self, points, means, sqrt_infos, mask=None):
        self.points = jnp.asarray(points)
        self.means = jnp.asarray(means)
        self.sqrt_infos = jnp.asarray(sqrt_infos)
        self._mask = None if mask is None else jnp.asarray(mask)

    def residuals(self, R, t):
        from ..ops import mahalanobis

        data = mahalanobis.MahalanobisData(
            self.points,
            self.means,
            self.sqrt_infos,
            jnp.ones(self.points.shape[0], self.points.dtype),
        )
        return mahalanobis.residuals(R, t, data)

    def residuals_and_jacobians(self, R, t):
        from ..ops import mahalanobis

        data = mahalanobis.MahalanobisData(
            self.points,
            self.means,
            self.sqrt_infos,
            jnp.ones(self.points.shape[0], self.points.dtype),
        )
        return mahalanobis.residuals_and_jacobians(R, t, data)

    def mask(self):
        return self._mask


class PointToPlaneCostFunctor(CostFunction):
    """r = n . (R p + t - mu) (reference: cost_functors.h:106-157)."""

    def __init__(self, points, means, normals, mask=None):
        self.points = jnp.asarray(points)
        self.means = jnp.asarray(means)
        self.normals = jnp.asarray(normals)
        self._mask = None if mask is None else jnp.asarray(mask)

    def _data(self):
        from ..ops import point_to_plane

        return point_to_plane.PointToPlaneData(
            self.points,
            self.means,
            self.normals,
            jnp.ones(self.points.shape[0], self.points.dtype),
        )

    def residuals(self, R, t):
        from ..ops import point_to_plane

        return point_to_plane.residuals(R, t, self._data())

    def residuals_and_jacobians(self, R, t):
        from ..ops import point_to_plane

        return point_to_plane.residuals_and_jacobians(R, t, self._data())

    def mask(self):
        return self._mask


class TranslationDeltaCostFunctor(CostFunction):
    """Translation prior r = S (t - t_prior)
    (reference: cost_functors.h:159-198)."""

    def __init__(self, target_translation, sqrt_info=None):
        self.target = jnp.asarray(target_translation)
        self.sqrt_info = (
            jnp.eye(3, dtype=self.target.dtype)
            if sqrt_info is None
            else jnp.asarray(sqrt_info)
        )

    def residuals(self, R, t):
        return (self.sqrt_info @ (t - self.target))[None, :]


class RotationDeltaCostFunctor(CostFunction):
    """Rotation prior r = S * 2 vec(q_prior^* (x) q(R)) — the reference
    declares this functor but leaves Evaluate an empty stub
    (cost_functors.h:200-223); implemented for real."""

    def __init__(self, target_rotation, sqrt_info=None):
        self.target_quat_conj = None  # built lazily in residuals for dtype
        self.target = jnp.asarray(target_rotation)
        self.sqrt_info = (
            jnp.eye(3, dtype=self.target.dtype)
            if sqrt_info is None
            else jnp.asarray(sqrt_info)
        )

    def residuals(self, R, t):
        q = lie.rotmat_to_quat(R)
        q_t = lie.rotmat_to_quat(self.target)
        err = lie.quat_multiply(lie.quat_conjugate(q_t), q)
        return (self.sqrt_info @ (2.0 * err[1:]))[None, :]


@dataclasses.dataclass
class _Block:
    cost_function: CostFunction
    loss: Optional[LossFunction]


class Problem:
    """Residual-block container (reference: pose_optimizer.h:20-41)."""

    def __init__(self):
        self._blocks: List[_Block] = []

    def add_residual_block(
        self, cost_function: CostFunction, loss: Optional[LossFunction] = None
    ):
        self._blocks.append(_Block(cost_function, loss))

    @property
    def residual_blocks(self) -> List[_Block]:
        return list(self._blocks)


class PoseOptimizer:
    """Generic SE(3) LM solver over a Problem
    (reference: pose_optimizer.h:66-145, with its distinct policy)."""

    def __init__(self, dtype=jnp.float64):
        self.dtype = dtype

    def solve(
        self,
        problem: Problem,
        options: GenericOptions,
        pose: Pose,
    ) -> Tuple[Pose, Summary]:
        dtype = self.dtype
        blocks = problem.residual_blocks
        if not blocks:
            raise ValueError("problem has no residual blocks")

        R0 = jnp.asarray(pose.rotation, dtype)
        t0 = jnp.asarray(pose.translation, dtype)
        q0 = jnp.asarray(pose.quaternion(), dtype)

        def eval_quadratic(R, t):
            H = jnp.zeros((6, 6), dtype)
            g = jnp.zeros((6,), dtype)
            cost = jnp.zeros((), dtype)
            for blk in blocks:
                r, J = blk.cost_function.residuals_and_jacobians(R, t)
                Hb, gb, cb = quadratic_from_jacobians(
                    r.astype(dtype), J.astype(dtype), blk.cost_function.mask(), blk.loss
                )
                H, g, cost = H + Hb, g + gb, cost + cb
            return H, g, cost

        max_it = options.max_iterations

        def body(state):
            t, q, lam, prev_cost, last_cost, it, done, rec = state
            R = lie.quat_to_rotmat(q)
            H, g, cost = eval_quadratic(R, t)
            damped = H * (1.0 + lam * jnp.eye(6, dtype=dtype))
            # rank-deficiency floor: a problem constraining only part of
            # the pose (e.g. priors on translation alone) has an exactly
            # zero block in H; the floor keeps the solve finite and the
            # unconstrained directions step by exactly 0 (their g is 0).
            # (The reference's ldlt on the same singular system is UB.)
            floor = 1e-10 * (jnp.max(jnp.abs(jnp.diag(H))) + 1.0)
            damped = damped + floor * jnp.eye(6, dtype=dtype)
            delta = jnp.linalg.solve(damped, -g)
            delta = jnp.where(
                jnp.all(jnp.isfinite(delta)), delta, jnp.zeros_like(delta)
            )

            step_norm = jnp.linalg.norm(delta)
            grad_norm = jnp.linalg.norm(g)
            # reference pose_optimizer: convergence checked BEFORE applying
            # the step; function_tolerance IS read (pose_optimizer.h:115-127)
            converged = (
                (step_norm < options.parameter_tolerance)
                | (grad_norm < options.gradient_tolerance)
                | (jnp.abs(cost - prev_cost) < options.function_tolerance)
            )

            dq = lie.so3_exp_quaternion(delta[3:6])
            q_new = jnp.where(
                converged, q, lie.quat_normalize(lie.quat_multiply(q, dq))
            )
            t_new = jnp.where(converged, t, t + delta[:3])

            adapted = jnp.where(
                cost > prev_cost,
                lam * options.lambda_increasing_factor,
                lam * options.lambda_decreasing_factor,
            )
            adapted = jnp.clip(adapted, options.min_lambda, options.max_lambda)
            lam_new = jnp.where(converged, lam, adapted)
            prev_new = jnp.where(converged, prev_cost, cost)
            rec = IterationRecord(
                rec.cost.at[it].set(cost),
                rec.lam.at[it].set(lam),
                rec.gradient_norm.at[it].set(grad_norm),
                rec.step_norm.at[it].set(step_norm),
            )
            return (t_new, q_new, lam_new, prev_new, cost, it + 1, converged, rec)

        def cond(state):
            return (state[5] < max_it) & (~state[6])

        nan = jnp.full((max_it,), jnp.nan, dtype)
        init = (
            t0,
            q0,
            jnp.asarray(options.initial_lambda, dtype),
            jnp.asarray(jnp.finfo(dtype).max, dtype),
            jnp.asarray(jnp.finfo(dtype).max, dtype),
            jnp.asarray(0, jnp.int32),
            jnp.asarray(False),
            IterationRecord(nan, nan, nan, nan),
        )
        t, q, lam, prev_cost, last_cost, it, done, rec = jax.lax.while_loop(
            cond, body, init
        )

        from ..core.pose import np_quat_to_rotmat

        t, q = jax.device_get((t, q))  # one batched fetch
        qn = np.array(q, np.float64)
        qn /= np.linalg.norm(qn)
        out = Pose(np_quat_to_rotmat(qn), np.asarray(t, np.float64))
        iterations = jnp.where(done, it - 1, it)
        summary = Summary(
            final_cost=last_cost,
            reported_cost=prev_cost,
            iterations=iterations,
            final_lambda=lam,
            converged=done,
            records=rec,
        )
        return out, summary
