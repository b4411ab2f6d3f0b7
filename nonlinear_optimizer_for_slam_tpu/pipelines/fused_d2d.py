"""Device-resident D2D-NDT / GICP registration: the ENTIRE outer loop
(voxel matching + GICP whitening + inner LM solves + outer convergence) as
ONE XLA program.

The host-loop `registration.register_d2d_ndt` recomputes the GICP combined
covariance W = (Sigma_map + R Sigma_scan R^T)^{-1} on the host and pays one
blocking LM dispatch (~30 ms runtime quantum, CLAUDE.md) per outer
iteration — 187 ms for a mode whose whole purpose is COARSE/CHEAP
alignment. Here the whitening is in-program batched 3x3 work (ideal VPU
shape): Cholesky of the combined covariance C = L L^T and a closed-form
lower-triangular inverse give S = L^{-1} with S^T S = C^{-1} = W, which is
all the objective ever reads (residual r = S e, loss on |r|^2, H = J^T J) —
so the eigh-based symmetric inverse square root the host loop uses is
replaced without changing the optimization problem.

The outer/inner state machine is the same FLATTENED single-while_loop
design as `fused_registration._fused_register_impl` (a nested while_loop
or extra cond around a pallas kernel trips this runtime into a permanent
~30 ms dispatch mode; this program is pure jnp — the problem is hundreds
of voxel pairs, far too small for a Pallas kernel to matter — but one
dispatch per registration is still the difference between ~35 ms and
~190 ms end to end).

Beyond the reference, which is strictly point-to-distribution
(mahalanobis_distance_minimizer/types.h Correspondence); D2D follows
Stoyanov et al. IJRR'12 and Segal et al. RSS'09 (GICP).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..core import lie
from ..core.losses import LossFunction
from ..core.options import Options
from ..core.pose import Pose
from ..ops import mahalanobis as maha_ops
from ..solvers.linear import damp_hessian, solve_normal_equations
from ..solvers.manifolds import SE3Params, se3_retract
from .fused_registration import FusedRegistrationResult, _round_up
from .ndt import NdtMap
from .registration import OUTER_MAX_ITERATIONS, OUTER_TOLERANCE


def _inv_lower3(L):
    """Closed-form inverse of batched 3x3 lower-triangular matrices.

    (..., 3, 3) -> (..., 3, 3). Plain forward substitution unrolled; no
    lax.linalg triangular_solve dispatch needed for a 3x3."""
    l00 = L[..., 0, 0]
    l10, l11 = L[..., 1, 0], L[..., 1, 1]
    l20, l21, l22 = L[..., 2, 0], L[..., 2, 1], L[..., 2, 2]
    a = 1.0 / l00
    b = 1.0 / l11
    c = 1.0 / l22
    m10 = -l10 * a * b
    m20 = (l10 * l21 * b - l20) * a * c
    m21 = -l21 * b * c
    z = jnp.zeros_like(a)
    return jnp.stack(
        [
            jnp.stack([a, z, z], axis=-1),
            jnp.stack([m10, b, z], axis=-1),
            jnp.stack([m20, m21, c], axis=-1),
        ],
        axis=-2,
    )


@functools.partial(jax.jit, static_argnames=("max_outer", "options"))
def _fused_d2d_register(
    map_means,  # (M, 3)
    map_covs,  # (M, 3, 3) eigenvalue-floored voxel covariances
    scan_means,  # (S, 3) scan voxel means, local frame (bucket-padded)
    scan_covs,  # (S, 3, 3) scan voxel covariances (identity on padding)
    scan_mask,  # (S,) 1.0 = real scan voxel
    t0,  # (3,)
    q0,  # (4,)
    loss,  # LossFunction pytree
    search_radius,
    outer_tol,
    max_outer: int,
    options: Options,
):
    dtype = scan_means.dtype
    oh = options.optimization_handle
    ch = options.convergence_handle
    max_inner = options.max_iterations

    # centroid centering for the expanded-form distance (f32 cancellation
    # guard, same reasoning as fused_registration / pipelines.matching)
    centroid = jnp.mean(map_means, axis=0)
    means_c = map_means - centroid
    means_sq = jnp.sum(means_c * means_c, axis=1)  # (M,)

    def match(t, q):
        """Nearest map voxel per scan voxel + GICP whitening at the
        current rotation -> MahalanobisData pytree (held fixed through
        the inner LM solve, the standard GICP approximation)."""
        R = lie.quat_to_rotmat(q)
        warped = scan_means @ R.T + t - centroid  # (S, 3)
        d2 = (
            jnp.sum(warped * warped, axis=1, keepdims=True)
            - 2.0 * warped @ means_c.T
            + means_sq[None, :]
        )  # (S, M)
        idx = jnp.argmin(d2, axis=1)
        best = jnp.take_along_axis(d2, idx[:, None], axis=1)[:, 0]
        mask = (best <= search_radius * search_radius).astype(dtype) * scan_mask

        combined = map_covs[idx] + jnp.einsum(
            "ij,sjk,lk->sil", R, scan_covs, R
        )  # (S, 3, 3), SPD (both sides eigenvalue-floored)
        L = jnp.linalg.cholesky(combined)
        sqrt_infos = _inv_lower3(L)  # S^T S = combined^{-1}
        return maha_ops.MahalanobisData(
            points=scan_means,
            means=map_means[idx],
            sqrt_infos=sqrt_infos,
            mask=mask,
        )

    def lm_step(t, q, data, lam):
        R = lie.quat_to_rotmat(q)
        H, g, cost = maha_ops.eval_quadratic(R, t, data, loss)
        damped = damp_hessian(H, lam)
        delta = solve_normal_equations(damped, -g, options.linear_solver_type)
        delta = jnp.where(
            jnp.all(jnp.isfinite(delta)), delta, jnp.zeros_like(delta)
        )
        params = se3_retract(SE3Params(t, q), delta)
        return (
            params.translation,
            params.quaternion,
            cost,
            jnp.linalg.norm(delta),
            jnp.linalg.norm(g),
        )

    fmax = jnp.asarray(jnp.finfo(dtype).max, dtype)

    def body(carry):
        (
            t, q, lam, prev_cost, inner_it,
            data, t_anchor, q_anchor,
            outer_it, done, inner_its, costs, final_cost,
        ) = carry

        t_new, q_new, cost, step_norm, grad_norm = lm_step(t, q, data, lam)

        lm_converged = (step_norm < ch.parameter_tolerance) | (
            grad_norm < ch.gradient_tolerance
        )
        inner_done = lm_converged | (inner_it + 1 >= max_inner)

        adapted = jnp.where(
            cost > prev_cost,
            lam * oh.lambda_increase_factor,
            lam * oh.lambda_decrease_factor,
        )
        adapted = jnp.clip(adapted, oh.min_lambda, oh.max_lambda)

        dq = lie.quat_multiply(lie.quat_conjugate(q_new), q_anchor)
        dt = lie.quat_to_rotmat(q_new).T @ (t_anchor - t_new)
        outer_conv = (jnp.linalg.norm(dt) < outer_tol) & (
            jnp.linalg.norm(dq[1:]) < outer_tol
        )
        outer_done = outer_conv | (outer_it + 1 >= max_outer)
        new_done = inner_done & outer_done

        rematch = inner_done & (~outer_done)
        data_new = jax.lax.cond(
            rematch, lambda: match(t_new, q_new), lambda: data
        )

        rec_iters = jnp.where(lm_converged, inner_it, inner_it + 1)
        inner_its = jnp.where(
            inner_done, inner_its.at[outer_it].set(rec_iters), inner_its
        )
        costs = jnp.where(inner_done, costs.at[outer_it].set(cost), costs)

        return (
            t_new,
            q_new,
            jnp.where(inner_done, jnp.asarray(oh.initial_lambda, dtype), adapted),
            jnp.where(inner_done, fmax, cost),
            jnp.where(inner_done, 0, inner_it + 1),
            data_new,
            jnp.where(inner_done, t_new, t_anchor),
            jnp.where(inner_done, q_new, q_anchor),
            outer_it + inner_done.astype(jnp.int32),
            new_done,
            inner_its,
            costs,
            jnp.where(inner_done, cost, final_cost),
        )

    def cond(carry):
        return ~carry[9]

    init = (
        t0,
        q0,
        jnp.asarray(oh.initial_lambda, dtype),
        fmax,
        jnp.asarray(0, jnp.int32),
        match(t0, q0),
        t0,
        q0,
        jnp.asarray(0, jnp.int32),
        jnp.asarray(False),
        jnp.zeros((max_outer,), jnp.int32),
        jnp.full((max_outer,), jnp.nan, dtype),
        jnp.asarray(jnp.nan, dtype),
    )
    out = jax.lax.while_loop(cond, body, init)
    return out[0], out[1], out[8], out[10], out[11], out[12]


class D2dRegistrar:
    """Distribution-to-distribution registrar with device-resident map
    state and single-dispatch registration.

    The map side (means + floored covariances) is uploaded once at
    construction; each `register` call builds the scan's NDT summary on
    the host (native builder; the scan-map build is the D2D analog of
    voxel-filtering a scan), pads it to a `scan_pad_multiple` bucket so
    every scan shares one compiled program, and runs one fused device
    program for the whole outer ICP loop.
    """

    def __init__(
        self,
        ndt_map: NdtMap,
        options: Options,
        loss: Optional[LossFunction] = None,
        scan_voxel_resolution: float = 0.5,
        search_radius: float = 1.0,
        max_outer_iterations: int = OUTER_MAX_ITERATIONS,
        outer_tolerance: float = OUTER_TOLERANCE,
        dtype=jnp.float32,
        scan_pad_multiple: int = 64,
    ):
        from . import ndt as ndt_mod

        valid = ndt_map.valid_only()
        self.dtype = dtype
        self.options = options
        self.loss = loss
        self.scan_voxel_resolution = scan_voxel_resolution
        self.scan_pad_multiple = scan_pad_multiple
        self.max_outer_iterations = max_outer_iterations
        self.search_radius = jnp.asarray(search_radius, dtype)
        self.outer_tolerance = jnp.asarray(outer_tolerance, dtype)
        self.map_means = jnp.asarray(valid.means, dtype)
        self.map_covs = jnp.asarray(ndt_mod.voxel_covariances(valid), dtype)

    def _scan_summary(self, local_points):
        """Host-side scan NDT build -> bucket-padded (means, covs, mask)."""
        from . import ndt as ndt_mod

        pts = np.asarray(local_points)
        try:
            from .. import native

            scan_map = native.build_ndt_map(
                pts, self.scan_voxel_resolution, identity_moment=False
            ).valid_only()
        except Exception:  # pragma: no cover - native unavailable
            scan_map = ndt_mod.build_ndt_map(
                pts, self.scan_voxel_resolution, identity_moment=False
            ).valid_only()
        if scan_map.num_voxels == 0:
            raise ValueError(
                "D2dRegistrar: no valid scan voxel passed the count/"
                "eigenvalue tests — scan_voxel_resolution "
                f"({self.scan_voxel_resolution}) is too fine for the scan "
                "density (each voxel needs >= 5 points and lambda_max >= 0.01)"
            )
        means = np.asarray(scan_map.means)
        covs = ndt_mod.voxel_covariances(scan_map)
        S = means.shape[0]
        Sp = _round_up(S, self.scan_pad_multiple)
        if Sp != S:
            means = np.concatenate([means, np.zeros((Sp - S, 3))])
            covs = np.concatenate(
                [covs, np.broadcast_to(np.eye(3), (Sp - S, 3, 3))]
            )
        mask = (np.arange(Sp) < S).astype(np.float64)
        return (
            jnp.asarray(means, self.dtype),
            jnp.asarray(covs, self.dtype),
            jnp.asarray(mask, self.dtype),
        )

    def register_async(self, local_points, initial_pose: Pose):
        """Launch without a host sync (pipelining); finalize() the result."""
        scan_means, scan_covs, scan_mask = self._scan_summary(local_points)
        return _fused_d2d_register(
            self.map_means, self.map_covs, scan_means, scan_covs, scan_mask,
            jnp.asarray(initial_pose.translation, self.dtype),
            jnp.asarray(initial_pose.quaternion(), self.dtype),
            self.loss, self.search_radius, self.outer_tolerance,
            self.max_outer_iterations, self.options,
        )

    # the fused-registration finalizer: same (t, q, outer, inner_its,
    # costs, final_cost) output tuple layout
    from .fused_registration import NdtRegistrar as _NdtRegistrar

    finalize = staticmethod(_NdtRegistrar.finalize)
    del _NdtRegistrar

    def register(self, local_points, initial_pose: Pose) -> FusedRegistrationResult:
        return self.finalize(self.register_async(local_points, initial_pose))
