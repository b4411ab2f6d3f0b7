"""Device-resident NDT registration: the ENTIRE outer ICP loop (matching +
inner LM solves + outer convergence) as ONE XLA program.

The reference re-matches on the host with FLANN between inner solves
(mahalanobis tests/simple_optimization_test.cc:543-575). On TPU the map is
tiny and matching is a dense top-k, so there is no reason to surface to the
host at all: the outer loop becomes a `lax.while_loop` whose body does
{dense match -> build packed SoA -> inner LM while_loop (pallas fused
eval) -> pose-delta convergence}, and one registration costs ONE dispatch.

This matters doubly on this TPU runtime: after any long-running program
the runtime's completion wait quantizes to ~30 ms per blocking dispatch
(measured), so the host-driven loop pays ~10 round trips x 30 ms while this
fused program pays one.

Semantics match the host-driven `registration.register_ndt` exactly:
outer tolerance 1e-5 on translation delta norm AND quaternion vector norm
(reference :565-568), <= 10 outer iterations, correspondences = up to k
nearest valid voxels within the search radius.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..core import lie
from ..core.losses import LossFunction
from ..core.options import Options
from ..core.pose import Pose, np_quat_to_rotmat
from ..ops import pallas_kernels as pk
from ..solvers.manifolds import SE2Params, SE3Params, se2_retract, se3_retract
from .ndt import NdtMap
from .registration import OUTER_MAX_ITERATIONS, OUTER_TOLERANCE


@dataclasses.dataclass
class FusedRegistrationResult:
    pose: Pose
    outer_iterations: int
    final_cost: float
    inner_iterations: np.ndarray  # (max_outer,) per-outer inner LM counts
    costs: np.ndarray  # (max_outer,) final cost per outer iteration


def _round_up(n: int, m: int) -> int:
    return ((n + m - 1) // m) * m


def _fused_register_impl(
    means_T,  # (3, M) valid voxel means, transposed
    infos_T,  # (9, M) sqrt-informations row-major, transposed
    points,  # (N, 3) local scan points (per-shard when sharded)
    points_T,  # (3, N) same, transposed
    points_mask,  # (N,)
    t0,  # (3,)
    q0,  # (4,)
    loss,  # LossFunction pytree
    search_radius,
    outer_tol,
    num_neighbors: int,
    max_outer: int,
    options: Options,
    planar: bool = False,
    psum_axis=None,
    eval_backend: str = "pallas",
    map_mask=None,  # optional (M,) 1.0 = real voxel, 0.0 = bucket padding
    objective: str = "maha",
    normals_T=None,  # (3, M) unit plane normals (objective="p2p")
    voxel_weights=None,  # (M,) 1.0 = usable plane (objective="p2p")
    trim_distance=0.3,  # p2p trimmed-ICP rejection (meters)
):
    if objective == "p2p" and planar:
        raise NotImplementedError("planar mode is mahalanobis-only")
    n = points.shape[0]
    k = num_neighbors
    # p2p keeps ONE plane per point (min-perpendicular-distance selection
    # among the k Euclidean candidates, matching.match_point_to_plane),
    # so its packed buffer has n lanes, not n*k
    out_lanes = n if objective == "p2p" else n * k
    # pad with the SAME adaptive lane block the packed evals resolve:
    # above the large-lane threshold they run a 16384 grid block, and a
    # 4096-multiple buffer that is not a 16384 multiple would floor-drop
    # its tail correspondences from H/g/cost (review-found)
    lanes = _round_up(out_lanes, pk._resolve_lane_block(out_lanes, None))
    dtype = points.dtype

    # Center on the map centroid before the expanded-form distance: avoids
    # f32 cancellation for maps far from the origin (see
    # pipelines/matching.py) without leaving the matmul formulation.
    if map_mask is None:
        centroid = jnp.mean(means_T, axis=1, keepdims=True)  # (3, 1)
    else:
        # bucket-padded maps: centroid over REAL voxels only (padding sits
        # at the origin and would otherwise skew the centering)
        centroid = (
            jnp.sum(means_T * map_mask[None, :], axis=1, keepdims=True)
            / jnp.sum(map_mask)
        )
    means_c_T = means_T - centroid
    means_sq = jnp.sum(means_c_T * means_c_T, axis=0)  # (M,)
    if map_mask is not None:
        # padded voxels can never win the top-k or pass the radius test
        means_sq = means_sq + (1.0 - map_mask) * jnp.asarray(1e10, dtype)
    # point rows of the maha packed buffer never change: repeat each
    # point k times along the lane axis (p2p uses points_T directly —
    # one lane per point)
    if objective != "p2p":
        p_rows = jnp.repeat(points_T, k, axis=1)
        p_rows = jnp.pad(p_rows, ((0, 0), (0, lanes - out_lanes)))

    def match_p2p(t, q):
        """Dense top-k candidates -> min-perpendicular-distance plane per
        point -> packed (16, lanes // 128, 128) p2p kernel buffer (see
        matching.match_point_to_plane for why nearest-MEAN association
        biases plane factors)."""
        R = lie.quat_to_rotmat(q)
        warped = points @ R.T + t - centroid[:, 0]  # (N, 3), centered
        d2 = (
            jnp.sum(warped * warped, axis=1, keepdims=True)
            - 2.0 * warped @ means_c_T
            + means_sq[None, :]
        )  # (N, M)
        neg_d2, idx = jax.lax.top_k(-d2, k)  # (N, k)
        within = (-neg_d2) <= search_radius * search_radius
        cand_ok = within & (voxel_weights[idx] > 0.0)

        cand_mu = means_c_T.T[idx]  # (N, k, 3) centered
        cand_n = normals_T.T[idx]  # (N, k, 3)
        plane_d = jnp.abs(
            jnp.sum(cand_n * (warped[:, None, :] - cand_mu), axis=-1)
        )
        plane_d = jnp.where(cand_ok, plane_d, jnp.asarray(jnp.inf, dtype))
        best = jnp.argmin(plane_d, axis=1)
        rows_i = jnp.arange(n)
        best_d = plane_d[rows_i, best]
        mask = (best_d <= trim_distance).astype(dtype) * points_mask

        mu_rows = (cand_mu[rows_i, best] + centroid[:, 0]).T  # (3, N)
        n_rows = cand_n[rows_i, best].T  # (3, N)
        packed = jnp.concatenate(
            [
                points_T,
                mu_rows,
                n_rows,
                mask[None, :],
                jnp.zeros((6, n), dtype),
            ],
            axis=0,
        ).astype(jnp.float32)
        packed = jnp.pad(packed, ((0, 0), (0, lanes - n)))
        return packed.reshape(16, lanes // 128, 128)

    def match_maha(t, q):
        """Dense top-k matching -> packed (16, lanes // 128, 128) plane
        kernel buffer (one relayout per rematch, amortized over the
        inner LM iterations that re-read it)."""
        R = lie.quat_to_rotmat(q)
        warped = points @ R.T + t - centroid[:, 0]  # (N, 3), centered
        d2 = (
            jnp.sum(warped * warped, axis=1, keepdims=True)
            - 2.0 * warped @ means_c_T
            + means_sq[None, :]
        )  # (N, M)
        neg_d2, idx = jax.lax.top_k(-d2, k)  # (N, k)
        within = (-neg_d2) <= search_radius * search_radius
        mask = within.astype(dtype) * points_mask[:, None]  # (N, k)

        flat_idx = idx.reshape(n * k)
        mu_rows = jnp.take(means_T, flat_idx, axis=1)  # (3, N*k)
        s_rows = jnp.take(infos_T, flat_idx, axis=1)  # (9, N*k)
        mask_row = mask.reshape(1, n * k)
        packed = jnp.concatenate(
            [
                p_rows[:, : n * k],
                mu_rows,
                s_rows,
                mask_row,
            ],
            axis=0,
        ).astype(jnp.float32)
        packed = jnp.pad(packed, ((0, 0), (0, lanes - n * k)))
        return packed.reshape(16, lanes // 128, 128)

    match = match_p2p if objective == "p2p" else match_maha

    # ------------------------------------------------------------------
    # FLATTENED state machine: ONE while_loop, one LM iteration per step,
    # re-matching under lax.cond when the inner solve converges.
    #
    # Why flat: a Pallas kernel inside a NESTED lax.while_loop trips this
    # TPU runtime into a permanent ~30 ms completion-poll mode for every
    # subsequent dispatch (measured: nested trivial loops fine; nested
    # loop + pallas -> 29 ms forever; single loop + pallas -> 0.2 ms).
    # Flat structure keeps the whole registration at its real device time.
    # ------------------------------------------------------------------
    oh = options.optimization_handle
    ch = options.convergence_handle
    max_inner = options.max_iterations

    def maybe_psum(hgc):
        if psum_axis is not None:
            return jax.lax.psum(hgc, psum_axis)
        return hgc

    from ..ops import mahalanobis as maha_ops
    from ..solvers.linear import damp_hessian, solve_normal_equations

    # Three evaluation paths over the SAME packed buffer:
    #   "pallas"   — SMEM-params kernel (single-problem fast path)
    #   "pallas_v" — VMEM-params kernel, vmap-compatible: jax.vmap's
    #                pallas batching rule prepends the scan axis, so the
    #                batched serving mode keeps the fused kernel instead
    #                of falling back to the ~4x-slower jnp eval
    #   "jnp"      — XLA-fused einsums (oracle / fallback)
    # Identical objective; kernel-parity tested.
    if objective == "p2p":
        from ..ops import point_to_plane as p2p_ops

        eval3 = None
        if eval_backend == "jnp":
            eval6 = lambda R, t_, packed_: p2p_ops.eval_quadratic(
                R, t_, p2p_ops.unpack_p2p(packed_), loss
            )
        elif eval_backend == "pallas_v":
            eval6 = lambda R, t_, packed_: pk.p2p_eval_quadratic_packed_v(
                R, t_, packed_, loss
            )
        else:
            eval6 = lambda R, t_, packed_: pk.p2p_eval_quadratic_packed(
                R, t_, packed_, loss
            )
    elif eval_backend == "jnp":
        eval6 = lambda R, t_, packed_: maha_ops.eval_quadratic(
            R, t_, maha_ops.unpack_maha6(packed_), loss
        )
        eval3 = lambda R2, t2, packed_: maha_ops.eval_quadratic_3dof(
            R2, t2, maha_ops.unpack_maha6(packed_), loss
        )
    elif eval_backend == "pallas_v":
        eval6 = lambda R, t_, packed_: pk.maha6_eval_quadratic_packed_v(
            R, t_, packed_, loss
        )
        eval3 = lambda R2, t2, packed_: pk.maha3_eval_quadratic_packed_v(
            R2, t2, packed_, loss
        )
    else:
        eval6 = lambda R, t_, packed_: pk.maha6_eval_quadratic_packed(
            R, t_, packed_, loss
        )
        eval3 = lambda R2, t2, packed_: pk.maha3_eval_quadratic_packed(
            R2, t2, packed_, loss
        )

    def lm_step(t, q, packed, lam):
        """One damped-GN step (reference policy,
        mahalanobis_distance_minimizer_analytic.cc:84-152). Returns
        (t', q', cost, step_norm, grad_norm)."""
        if not planar:
            R = lie.quat_to_rotmat(q)
            H, g, cost = maybe_psum(eval6(R, t, packed))
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
        # planar: (x, y, yaw) with z/roll/pitch frozen
        # (.._analytic_3dof.cc:22-25,104-105)
        theta = 2.0 * jnp.arctan2(q[3], q[0])
        R2 = lie.rot2(theta)
        H, g, cost = maybe_psum(eval3(R2, t[:2], packed))
        damped = damp_hessian(H, lam)
        delta = solve_normal_equations(damped, -g, options.linear_solver_type)
        delta = jnp.where(jnp.all(jnp.isfinite(delta)), delta, jnp.zeros_like(delta))
        p2 = se2_retract(SE2Params(t[:2], theta), delta)
        t_new = jnp.concatenate([p2.translation, t[2:]])
        half = 0.5 * p2.theta
        q_new = jnp.stack(
            [jnp.cos(half), jnp.zeros_like(half), jnp.zeros_like(half), jnp.sin(half)]
        )
        return t_new, q_new, cost, jnp.linalg.norm(delta), jnp.linalg.norm(g)

    fmax = jnp.asarray(jnp.finfo(dtype).max, dtype)

    def body(carry):
        (
            t, q, lam, prev_cost, inner_it,
            packed, t_anchor, q_anchor,
            outer_it, done, inner_its, costs, final_cost,
        ) = carry

        t_new, q_new, cost, step_norm, grad_norm = lm_step(t, q, packed, lam)

        lm_converged = (step_norm < ch.parameter_tolerance) | (
            grad_norm < ch.gradient_tolerance
        )
        inner_done = lm_converged | (inner_it + 1 >= max_inner)

        # lambda adaptation for the continuing case
        adapted = jnp.where(
            cost > prev_cost,
            lam * oh.lambda_increase_factor,
            lam * oh.lambda_decrease_factor,
        )
        adapted = jnp.clip(adapted, oh.min_lambda, oh.max_lambda)

        # outer convergence: diff = new^{-1} * anchor (reference :563-568)
        dq = lie.quat_multiply(lie.quat_conjugate(q_new), q_anchor)
        dt = lie.quat_to_rotmat(q_new).T @ (t_anchor - t_new)
        outer_conv = (jnp.linalg.norm(dt) < outer_tol) & (
            jnp.linalg.norm(dq[1:]) < outer_tol
        )
        outer_done = outer_conv | (outer_it + 1 >= max_outer)
        new_done = inner_done & outer_done

        # re-match only when starting a new inner solve
        rematch = inner_done & (~outer_done)
        packed_new = jax.lax.cond(
            rematch, lambda: match(t_new, q_new), lambda: packed
        )

        # diagnostics per completed inner solve
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
            packed_new,
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
    t, q = out[0], out[1]
    outer_it = out[8]
    inner_its, costs, final_cost = out[10], out[11], out[12]
    return t, q, outer_it, inner_its, costs, final_cost


@functools.partial(
    jax.jit,
    static_argnames=("num_neighbors", "max_outer", "options", "planar",
                     "objective"),
)
def _fused_register(
    means_T, infos_T, points, points_T, points_mask, t0, q0, loss,
    search_radius, outer_tol, num_neighbors, max_outer, options, planar=False,
    map_mask=None, objective="maha", normals_T=None, voxel_weights=None,
    trim_distance=0.3,
):
    return _fused_register_impl(
        means_T, infos_T, points, points_T, points_mask, t0, q0, loss,
        search_radius, outer_tol, num_neighbors, max_outer, options, planar,
        psum_axis=None, map_mask=map_mask, objective=objective,
        normals_T=normals_T, voxel_weights=voxel_weights,
        trim_distance=trim_distance,
    )


@functools.partial(
    jax.jit,
    static_argnames=("num_neighbors", "max_outer", "options", "planar",
                     "objective"),
)
def _fused_register_batched(
    means_T, infos_T, points, points_T, points_mask, t0s, q0s, loss,
    search_radius, outer_tol, num_neighbors, max_outer, options, planar=False,
    objective="maha", normals_T=None, voxel_weights=None, trim_distance=0.3,
):
    """B independent scan-to-map registrations against ONE shared map in a
    single XLA program (serving mode): the whole flattened ICP+LM state
    machine is vmapped over the scan axis, so each scan keeps its own
    outer/inner/lambda state and the per-scan trajectories match the
    single-scan program exactly (vmap of while_loop masks finished lanes).
    One dispatch for B scans amortizes the runtime's fixed per-dispatch
    completion-poll quantum to quantum/B.

    Evaluation uses the vmap-compatible fused Pallas kernel
    (ops.pallas_kernels.maha6_eval_quadratic_packed_v: VMEM params +
    2-D output, which jax.vmap's pallas batching rule can auto-batch);
    a round-2 measurement showed the earlier jnp fallback cost ~4x per
    scan and erased the batching win entirely."""

    def one(pts, pts_T, mask, t0, q0):
        return _fused_register_impl(
            means_T, infos_T, pts, pts_T, mask, t0, q0, loss,
            search_radius, outer_tol, num_neighbors, max_outer, options,
            planar, psum_axis=None, eval_backend="pallas_v",
            objective=objective, normals_T=normals_T,
            voxel_weights=voxel_weights, trim_distance=trim_distance,
        )

    return jax.vmap(one)(points, points_T, points_mask, t0s, q0s)


def _fused_register_lockstep_impl(
    means_T,  # (3, M)
    infos_T,  # (9, M)
    points,  # (B, N, 3)
    points_T,  # (B, 3, N)
    points_mask,  # (B, N)
    t0s,  # (B, 3)
    q0s,  # (B, 4)
    loss,
    search_radius,
    outer_tol,
    num_neighbors: int,
    max_outer: int,
    options: Options,
    planar: bool = False,
    objective: str = "maha",
    normals_T=None,
    voxel_weights=None,
    trim_distance=0.3,
):
    """Lockstep-outer batched registration: B scans share ONE flat state
    machine over explicitly-batched (B, ...) state.

    Why not vmap of the single-scan machine (`_fused_register_batched`):
    under vmap the per-lane ``lax.cond(rematch, match, keep)`` lowers to a
    select that executes BOTH branches, so the (N, M) dense matching +
    top-k — meant to run once per OUTER iteration (~4x/solve) — runs on
    every LM iteration (~30x/solve) for every lane. Measured round 2: the
    vmapped program costs ~4x device time per scan and batching never
    amortizes (44.66 ms/ea at B=64 vs 40.24 serial).

    Here the rematch stays a REAL batch-level ``lax.cond``: it fires only
    on iterations where every live lane has finished its inner LM solve,
    and then rematches all lanes in one batched (B, N, M) matmul + top-k.
    Lanes that converge early freeze (their parameter/lambda state stops
    updating) until the sync point; a frozen lane's eventual rematch
    depends only on its own frozen pose, so every lane's trajectory —
    poses, per-outer inner iteration counts, costs — is IDENTICAL to what
    the serial `_fused_register_impl` machine produces (test-asserted in
    tests/test_batched.py). Device work per scan therefore matches the
    serial program (the inner-iteration count per outer segment is the
    max over live lanes), and one dispatch for B scans amortizes the
    runtime's fixed per-dispatch quantum to quantum/B.

    Per-lane LM/ICP semantics mirror `_fused_register_impl` line for line
    (reference policy: mahalanobis_distance_minimizer_analytic.cc:84-152,
    outer check :563-568). Evaluation uses the vmap-compatible fused
    Pallas kernels (VMEM params + 2-D out).
    """
    if objective == "p2p" and planar:
        raise NotImplementedError("planar mode is mahalanobis-only")
    B, n = points.shape[0], points.shape[1]
    k = num_neighbors
    out_lanes = n if objective == "p2p" else n * k
    lanes = _round_up(out_lanes, pk._resolve_lane_block(out_lanes, None))
    dtype = points.dtype

    centroid = jnp.mean(means_T, axis=1, keepdims=True)  # (3, 1)
    means_c_T = means_T - centroid
    means_sq = jnp.sum(means_c_T * means_c_T, axis=0)  # (M,)

    def match_maha_one(pts, pts_T, pmask, t, q):
        R = lie.quat_to_rotmat(q)
        warped = pts @ R.T + t - centroid[:, 0]  # (N, 3), centered
        d2 = (
            jnp.sum(warped * warped, axis=1, keepdims=True)
            - 2.0 * warped @ means_c_T
            + means_sq[None, :]
        )  # (N, M)
        neg_d2, idx = jax.lax.top_k(-d2, k)  # (N, k)
        within = (-neg_d2) <= search_radius * search_radius
        mask = within.astype(dtype) * pmask[:, None]  # (N, k)
        flat_idx = idx.reshape(n * k)
        mu_rows = jnp.take(means_T, flat_idx, axis=1)  # (3, N*k)
        s_rows = jnp.take(infos_T, flat_idx, axis=1)  # (9, N*k)
        p_rows = jnp.repeat(pts_T, k, axis=1)  # (3, N*k)
        packed = jnp.concatenate(
            [p_rows, mu_rows, s_rows, mask.reshape(1, n * k)], axis=0
        ).astype(jnp.float32)
        packed = jnp.pad(packed, ((0, 0), (0, lanes - out_lanes)))
        return packed.reshape(16, lanes // 128, 128)

    def match_p2p_one(pts, pts_T, pmask, t, q):
        R = lie.quat_to_rotmat(q)
        warped = pts @ R.T + t - centroid[:, 0]
        d2 = (
            jnp.sum(warped * warped, axis=1, keepdims=True)
            - 2.0 * warped @ means_c_T
            + means_sq[None, :]
        )
        neg_d2, idx = jax.lax.top_k(-d2, k)
        within = (-neg_d2) <= search_radius * search_radius
        cand_ok = within & (voxel_weights[idx] > 0.0)
        cand_mu = means_c_T.T[idx]  # (N, k, 3) centered
        cand_n = normals_T.T[idx]  # (N, k, 3)
        plane_d = jnp.abs(
            jnp.sum(cand_n * (warped[:, None, :] - cand_mu), axis=-1)
        )
        plane_d = jnp.where(cand_ok, plane_d, jnp.asarray(jnp.inf, dtype))
        best = jnp.argmin(plane_d, axis=1)
        rows_i = jnp.arange(n)
        best_d = plane_d[rows_i, best]
        mask = (best_d <= trim_distance).astype(dtype) * pmask
        mu_rows = (cand_mu[rows_i, best] + centroid[:, 0]).T  # (3, N)
        n_rows = cand_n[rows_i, best].T  # (3, N)
        packed = jnp.concatenate(
            [pts_T, mu_rows, n_rows, mask[None, :], jnp.zeros((6, n), dtype)],
            axis=0,
        ).astype(jnp.float32)
        packed = jnp.pad(packed, ((0, 0), (0, lanes - n)))
        return packed.reshape(16, lanes // 128, 128)

    match_one = match_p2p_one if objective == "p2p" else match_maha_one
    match_b = jax.vmap(match_one)

    oh = options.optimization_handle
    ch = options.convergence_handle
    max_inner = options.max_iterations

    from ..solvers.linear import damp_hessian, solve_normal_equations

    if objective == "p2p":
        eval3 = None
        eval6 = lambda R, t_, p_: pk.p2p_eval_quadratic_packed_v(R, t_, p_, loss)
    else:
        eval6 = lambda R, t_, p_: pk.maha6_eval_quadratic_packed_v(
            R, t_, p_, loss
        )
        eval3 = lambda R2, t2, p_: pk.maha3_eval_quadratic_packed_v(
            R2, t2, p_, loss
        )

    def lm_step_one(t, q, packed, lam):
        # identical per-lane arithmetic to _fused_register_impl.lm_step
        if not planar:
            R = lie.quat_to_rotmat(q)
            H, g, cost = eval6(R, t, packed)
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
        theta = 2.0 * jnp.arctan2(q[3], q[0])
        R2 = lie.rot2(theta)
        H, g, cost = eval3(R2, t[:2], packed)
        damped = damp_hessian(H, lam)
        delta = solve_normal_equations(damped, -g, options.linear_solver_type)
        delta = jnp.where(jnp.all(jnp.isfinite(delta)), delta, jnp.zeros_like(delta))
        p2 = se2_retract(SE2Params(t[:2], theta), delta)
        t_new = jnp.concatenate([p2.translation, t[2:]])
        half = 0.5 * p2.theta
        q_new = jnp.stack(
            [jnp.cos(half), jnp.zeros_like(half), jnp.zeros_like(half), jnp.sin(half)]
        )
        return t_new, q_new, cost, jnp.linalg.norm(delta), jnp.linalg.norm(g)

    lm_step_b = jax.vmap(lm_step_one)

    fmax = jnp.asarray(jnp.finfo(dtype).max, dtype)
    slots = jnp.arange(max_outer, dtype=jnp.int32)[None, :]  # (1, max_outer)

    def body(carry):
        (
            t, q, lam, prev_cost, inner_it,
            packed, t_anchor, q_anchor,
            outer_it, waiting, done, inner_its, costs, final_cost,
        ) = carry

        t_new, q_new, cost, step_norm, grad_norm = lm_step_b(t, q, packed, lam)

        act = ~(waiting | done)  # (B,) lanes running an inner solve
        lm_conv = (step_norm < ch.parameter_tolerance) | (
            grad_norm < ch.gradient_tolerance
        )
        inner_fin = act & (lm_conv | (inner_it + 1 >= max_inner))

        # step applied on active lanes (reference: update, THEN converge-check)
        t_upd = jnp.where(act[:, None], t_new, t)
        q_upd = jnp.where(act[:, None], q_new, q)

        adapted = jnp.where(
            cost > prev_cost,
            lam * oh.lambda_increase_factor,
            lam * oh.lambda_decrease_factor,
        )
        adapted = jnp.clip(adapted, oh.min_lambda, oh.max_lambda)

        # outer convergence per lane: diff = new^{-1} * anchor
        dq = jax.vmap(
            lambda qa, qb: lie.quat_multiply(lie.quat_conjugate(qa), qb)
        )(q_upd, q_anchor)
        dt = jax.vmap(lambda qn, ta, tn: lie.quat_to_rotmat(qn).T @ (ta - tn))(
            q_upd, t_anchor, t_upd
        )
        outer_conv = (jnp.linalg.norm(dt, axis=1) < outer_tol) & (
            jnp.linalg.norm(dq[:, 1:], axis=1) < outer_tol
        )
        outer_fin = outer_conv | (outer_it + 1 >= max_outer)
        newly_done = inner_fin & outer_fin

        # diagnostics at each lane's inner-solve completion
        rec_iters = jnp.where(lm_conv, inner_it, inner_it + 1)
        slot = outer_it[:, None] == slots  # (B, max_outer) one-hot
        write = inner_fin[:, None] & slot
        inner_its = jnp.where(write, rec_iters[:, None], inner_its)
        costs = jnp.where(write, cost[:, None], costs)
        final_cost = jnp.where(inner_fin, cost, final_cost)

        lam = jnp.where(
            inner_fin,
            jnp.asarray(oh.initial_lambda, dtype),
            jnp.where(act, adapted, lam),
        )
        prev_cost = jnp.where(inner_fin, fmax, jnp.where(act, cost, prev_cost))
        inner_it = jnp.where(inner_fin, 0, jnp.where(act, inner_it + 1, inner_it))
        t_anchor = jnp.where(inner_fin[:, None], t_upd, t_anchor)
        q_anchor = jnp.where(inner_fin[:, None], q_upd, q_anchor)
        outer_it = outer_it + inner_fin.astype(jnp.int32)
        done = done | newly_done
        waiting = (waiting | inner_fin) & ~done

        # lockstep sync: ONE batched rematch once every live lane is waiting
        sync = jnp.all(done | waiting) & ~jnp.all(done)

        def do_sync(args):
            t_, q_, _ = args
            return (
                match_b(points, points_T, points_mask, t_, q_),
                jnp.zeros_like(waiting),
            )

        def no_sync(args):
            return args[2], waiting

        packed, waiting = jax.lax.cond(
            sync, do_sync, no_sync, (t_upd, q_upd, packed)
        )

        return (
            t_upd, q_upd, lam, prev_cost, inner_it,
            packed, t_anchor, q_anchor,
            outer_it, waiting, done, inner_its, costs, final_cost,
        )

    def cond(carry):
        return ~jnp.all(carry[10])

    init = (
        t0s,
        q0s,
        jnp.full((B,), oh.initial_lambda, dtype),
        jnp.full((B,), fmax, dtype),
        jnp.zeros((B,), jnp.int32),
        match_b(points, points_T, points_mask, t0s, q0s),
        t0s,
        q0s,
        jnp.zeros((B,), jnp.int32),
        jnp.zeros((B,), bool),
        jnp.zeros((B,), bool),
        jnp.zeros((B, max_outer), jnp.int32),
        jnp.full((B, max_outer), jnp.nan, dtype),
        jnp.full((B,), jnp.nan, dtype),
    )
    out = jax.lax.while_loop(cond, body, init)
    return out[0], out[1], out[8], out[11], out[12], out[13]


@functools.partial(
    jax.jit,
    static_argnames=("num_neighbors", "max_outer", "options", "planar",
                     "objective"),
)
def _fused_register_lockstep(
    means_T, infos_T, points, points_T, points_mask, t0s, q0s, loss,
    search_radius, outer_tol, num_neighbors, max_outer, options, planar=False,
    objective="maha", normals_T=None, voxel_weights=None, trim_distance=0.3,
):
    return _fused_register_lockstep_impl(
        means_T, infos_T, points, points_T, points_mask, t0s, q0s, loss,
        search_radius, outer_tol, num_neighbors, max_outer, options, planar,
        objective=objective, normals_T=normals_T,
        voxel_weights=voxel_weights, trim_distance=trim_distance,
    )


@functools.partial(
    jax.jit,
    static_argnames=("num_neighbors", "max_outer", "options", "planar", "mesh",
                     "objective"),
)
def _fused_register_sharded(
    means_T, infos_T, points, points_T, points_mask, t0, q0, loss,
    search_radius, outer_tol, num_neighbors, max_outer, options, planar, mesh,
    objective="maha", normals_T=None, voxel_weights=None, trim_distance=0.3,
):
    """Multi-chip fused registration: scan points shard over the mesh's
    factor axis (each device matches and evaluates its own block against
    the replicated map), the (H, g, cost) partials psum over ICI inside
    the inner LM loop, and the outer ICP control flow stays replicated —
    one XLA program across the whole slice (SURVEY section 2.8)."""
    from ..parallel.mesh import FACTOR_AXIS

    P = jax.sharding.PartitionSpec
    try:
        shard_map = jax.shard_map
    except AttributeError:  # pragma: no cover
        from jax.experimental.shard_map import shard_map

    def local_fn(
        means_T_, infos_T_, points_s, points_T_s, pmask_s, t0_, q0_, loss_,
        radius_, tol_, normals_T_, weights_, trim_,
    ):
        return _fused_register_impl(
            means_T_, infos_T_, points_s, points_T_s, pmask_s, t0_, q0_, loss_,
            radius_, tol_, num_neighbors, max_outer, options, planar,
            psum_axis=FACTOR_AXIS, objective=objective, normals_T=normals_T_,
            voxel_weights=weights_, trim_distance=trim_,
        )

    loss_specs = jax.tree_util.tree_map(lambda _: P(), loss)
    kwargs = dict(
        mesh=mesh,
        in_specs=(
            P(),                 # means_T replicated (map is tiny)
            P(),                 # infos_T replicated
            P(FACTOR_AXIS),      # points (N, 3) -> rows sharded
            P(None, FACTOR_AXIS),  # points_T (3, N) -> lanes sharded
            P(FACTOR_AXIS),      # mask
            P(), P(), loss_specs, P(), P(),
            P(), P(), P(),       # normals_T / voxel_weights / trim (replicated)
        ),
        out_specs=P(),
    )
    try:
        fn = shard_map(local_fn, check_vma=False, **kwargs)
    except TypeError:  # pragma: no cover - older check_rep spelling
        fn = shard_map(local_fn, check_rep=False, **kwargs)
    # shard_map rejects literal None leaves; replicate tiny placeholders
    # for the mahalanobis objective
    if normals_T is None:
        normals_T = jnp.zeros((3, means_T.shape[1]), means_T.dtype)
    if voxel_weights is None:
        voxel_weights = jnp.zeros((means_T.shape[1],), means_T.dtype)
    trim = jnp.asarray(trim_distance, means_T.dtype)
    return fn(
        means_T, infos_T, points, points_T, points_mask, t0, q0, loss,
        search_radius, outer_tol, normals_T, voxel_weights, trim,
    )


class NdtRegistrar:
    """Scan-to-map registrar with device-resident map state.

    The NDT map is uploaded once at construction (the analog of the
    reference's kd-tree build — which the reference actually redoes every
    outer iteration, MatchPointCloud :313-315); each `register` call
    transfers only the scan + pose and runs the single fused program.
    """

    def __init__(
        self,
        ndt_map: NdtMap,
        options: Options,
        loss: Optional[LossFunction] = None,
        search_radius: float = 1.0,
        num_neighbors: Optional[int] = None,
        max_outer_iterations: int = OUTER_MAX_ITERATIONS,
        outer_tolerance: float = OUTER_TOLERANCE,
        dtype=jnp.float32,
        planar: bool = False,
        mesh=None,
        map_pad_multiple: Optional[int] = None,
        objective: str = "maha",
        max_flatness: float = 0.2,
        max_thickness: Optional[float] = None,
        trim_distance: float = 0.3,
    ):
        """``objective``: "maha" (the flagship point-to-NDT score) or
        "p2p" (point-to-plane ICP against the voxel planes, fully fused —
        plane extraction via ndt.voxel_normals with the
        ``max_flatness``/``max_thickness`` gates, min-perpendicular-
        distance association among the k nearest voxels, trimmed at
        ``trim_distance``; build the map with ``identity_moment=False``
        for accurate planes). ``planar`` is mahalanobis-only.

        ``map_pad_multiple``: pad the (valid) voxel count to a bucket
        so registrars over DIFFERENT maps of similar size share one
        compiled program — the scan-to-scan odometry case, where every
        frame builds a fresh small NDT map and an exact-sized program
        would recompile per frame (26-500 s on this runtime). Padding
        voxels are masked out of the centroid, the top-k match, and the
        radius test."""
        valid = ndt_map.valid_only()
        self.dtype = dtype
        self.planar = planar
        self.mesh = mesh
        self.map_mask = None
        self.objective = objective
        self.trim_distance = trim_distance
        if objective not in ("maha", "p2p"):
            raise ValueError(f"unknown objective {objective!r} (maha | p2p)")
        if objective == "p2p" and planar:
            raise NotImplementedError("planar mode is mahalanobis-only")
        means = valid.means
        sqinfos = valid.sqrt_informations
        self._num_real_voxels = means.shape[0]
        normals = weights = None
        if objective == "p2p":
            from . import ndt as ndt_mod

            normals, flatness, thickness = ndt_mod.voxel_normals(valid)
            ok = flatness <= max_flatness
            if max_thickness is not None:
                ok &= thickness <= max_thickness
            weights = ok.astype(np.float64)
        if map_pad_multiple is not None:
            if mesh is not None:
                raise NotImplementedError(
                    "map_pad_multiple with mesh sharding is not supported"
                )
            M = means.shape[0]
            Mp = max(
                map_pad_multiple, _round_up(M, map_pad_multiple)
            )
            if Mp != M:
                means = np.concatenate([means, np.zeros((Mp - M, 3))])
                eye = np.broadcast_to(np.eye(3), (Mp - M, 3, 3))
                sqinfos = np.concatenate([sqinfos, eye])
                if normals is not None:
                    pad_n = np.zeros((Mp - M, 3))
                    pad_n[:, 2] = 1.0
                    normals = np.concatenate([normals, pad_n])
                    weights = np.concatenate([weights, np.zeros(Mp - M)])
            self.map_mask = jnp.asarray(
                (np.arange(means.shape[0]) < M).astype(np.float64), dtype
            )
        # host-side copies of the (bucket-PADDED, when padding is on) map for
        # information(): deriving them from the device-transposed buffers
        # would pay several eager-dispatch quanta per call (CLAUDE.md), and
        # feeding UNPADDED arrays into the jitted matcher would recompile per
        # distinct per-scan voxel count — padded + masked keeps one program.
        self._means_np = np.asarray(means)
        self._sqinfos_np = np.asarray(sqinfos)
        self._normals_np = None if normals is None else np.asarray(normals)
        self._weights_np = None if weights is None else np.asarray(weights)
        self._map_mask_np = (
            None
            if self.map_mask is None
            else np.asarray(self.map_mask, np.float64)
        )
        self.means_T = jnp.asarray(means.T, dtype)
        self.infos_T = jnp.asarray(sqinfos.reshape(-1, 9).T, dtype)
        self.normals_T = (
            None if normals is None else jnp.asarray(normals.T, dtype)
        )
        self.voxel_weights = (
            None if weights is None else jnp.asarray(weights, dtype)
        )
        self.options = options
        self.loss = loss
        self.search_radius = jnp.asarray(search_radius, dtype)
        self.outer_tolerance = jnp.asarray(outer_tolerance, dtype)
        # defaults follow the host-loop pipelines: maha = 2 (reference
        # FLANN parity), p2p = 4 (candidate pool for the
        # min-perpendicular-distance plane selection)
        if num_neighbors is None:
            num_neighbors = 4 if objective == "p2p" else 2
        self.num_neighbors = num_neighbors
        self.max_outer_iterations = max_outer_iterations

    def information(self, local_points, pose: Pose) -> np.ndarray:
        """Gauss-Newton information J^T W J (6, 6) of this registrar's
        objective at ``pose`` (typically the result of :meth:`register`),
        in the right-retraction tangent [dt, dtheta] — the edge whitening
        a pose-graph backend wants for odometry/loop edges produced by
        this registrar (``sqrt_info = cholesky(information)``; see
        MahalanobisDistanceMinimizer.information and
        pipelines/loop_closure.py). One extra matching + evaluation
        dispatch; the registration itself never surfaces it."""
        from ..solvers import minimizers as mins
        from . import matching

        dtype = self.dtype
        pts = jnp.asarray(np.asarray(local_points), dtype)
        pmask = jnp.ones(pts.shape[0], dtype)
        R = jnp.asarray(pose.rotation, dtype)
        t = jnp.asarray(pose.translation, dtype)
        # host-cached map arrays (bucket-padded when padding is on, with
        # padding voxels masked out of the match): one upload into the
        # jitted matcher, no eager transposes of device buffers, and a
        # CONSTANT matcher shape across per-scan voxel counts so odometry
        # frontends stay on one compiled program (26-500 s per recompile
        # on this runtime otherwise).
        mmask = (
            None
            if self._map_mask_np is None
            else jnp.asarray(self._map_mask_np, dtype)
        )
        if self.objective == "p2p":
            data = matching.match_point_to_plane(
                jnp.asarray(self._means_np, dtype),
                jnp.asarray(self._normals_np, dtype),
                jnp.asarray(self._weights_np, dtype),
                pts,
                pmask,
                R,
                t,
                search_radius=float(self.search_radius),
                num_neighbors=self.num_neighbors,
                trim_distance=self.trim_distance,
                map_mask=mmask,
            )
            minimizer = mins.PointToPlaneMinimizer(dtype=dtype)
        else:
            data = matching.match_point_cloud(
                jnp.asarray(self._means_np, dtype),
                jnp.asarray(self._sqinfos_np, dtype),
                pts,
                pmask,
                R,
                t,
                search_radius=float(self.search_radius),
                num_neighbors=self.num_neighbors,
                map_mask=mmask,
            )
            minimizer = mins.MahalanobisDistanceMinimizer(dtype=dtype)
        minimizer.set_loss_function(self.loss)
        return minimizer.information(data, pose)

    def register_async(self, local_points, initial_pose: Pose):
        """Launch the fused program WITHOUT a host sync; returns device
        values. Use for pipelining many scans (throughput mode); pass the
        result to :meth:`finalize`. Latency mode = :meth:`register`."""
        return self._launch(local_points, initial_pose)

    @staticmethod
    def finalize(device_out) -> FusedRegistrationResult:
        t, q, it, inner_its, costs, final_cost = jax.device_get(device_out)
        qn = np.asarray(q, np.float64)
        qn /= np.linalg.norm(qn)
        return FusedRegistrationResult(
            pose=Pose(np_quat_to_rotmat(qn), np.asarray(t, np.float64)),
            outer_iterations=int(it),
            final_cost=float(final_cost),
            inner_iterations=np.asarray(inner_its),
            costs=np.asarray(costs),
        )

    def register(
        self, local_points, initial_pose: Pose
    ) -> FusedRegistrationResult:
        return self.finalize(self._launch(local_points, initial_pose))

    def register_batch(
        self, local_points_batch, initial_poses, mode: str = "lockstep"
    ) -> list:
        """Register B scans against the map in ONE device program
        (serving mode). ``local_points_batch``: (B, N, 3) array or a list
        of (N_b, 3) arrays with ragged N_b (padded to a common N with
        masked zero rows). Returns list[FusedRegistrationResult], one per
        scan, each matching what :meth:`register` would have produced.

        ``mode``: "lockstep" (default) runs the explicitly-batched
        lockstep-outer machine (`_fused_register_lockstep_impl`) whose
        rematch is a real batch-level lax.cond — per-scan device time
        matches the serial program and the dispatch quantum amortizes to
        quantum/B. "vmap" keeps the round-2 vmapped whole-ICP program
        (measured NOT to amortize: vmap turns the per-lane rematch cond
        into a select that re-matches every LM iteration; retained as a
        second independently-derived oracle for the batch semantics).

        Not supported together with ``mesh`` (scan-axis batch and
        factor-axis sharding would need a 2-level mesh; serve batches on
        one chip per replica instead)."""
        return self.finalize_batch(
            self._register_batch_launch(local_points_batch, initial_poses, mode)
        )

    def register_batch_async(
        self, local_points_batch, initial_poses, mode: str = "lockstep"
    ):
        """:meth:`register_batch` WITHOUT the host sync: returns device
        values for :meth:`finalize_batch`. The streaming form for
        batch-of-B pipelines — on this runtime the FIRST blocking fetch
        flips the process into its degraded dispatch state permanently
        (CLAUDE.md, bisected round 4), so a production stream should
        keep batch windows in flight and finalize behind the pipeline
        head; measured 5.7 -> ~1 ms/scan at B=16x2 in flight."""
        return self._register_batch_launch(
            local_points_batch, initial_poses, mode
        )

    def _register_batch_launch(self, local_points_batch, initial_poses, mode):
        if mode not in ("lockstep", "vmap"):
            raise ValueError(f"unknown mode {mode!r} (lockstep | vmap)")
        if self.mesh is not None:
            raise NotImplementedError(
                "register_batch shards over the batch axis implicitly; "
                "use one NdtRegistrar per replica instead of mesh="
            )
        if self.map_mask is not None:
            raise NotImplementedError(
                "register_batch with map_pad_multiple is not wired; "
                "construct the registrar without map padding for serving"
            )
        dtype = self.dtype
        scans = [np.ascontiguousarray(np.asarray(p)) for p in local_points_batch]
        B = len(scans)
        if len(initial_poses) != B:
            raise ValueError(f"{len(initial_poses)} poses for batch of {B}")
        n_max = max(s.shape[0] for s in scans)
        pts = np.zeros((B, n_max, 3))
        mask = np.zeros((B, n_max))
        for b, s in enumerate(scans):
            pts[b, : s.shape[0]] = s
            mask[b, : s.shape[0]] = 1.0
        points = jnp.asarray(pts, dtype)
        points_T = jnp.asarray(pts.transpose(0, 2, 1), dtype)
        pmask = jnp.asarray(mask, dtype)
        t0s = jnp.asarray(
            np.stack([p.translation for p in initial_poses]), dtype
        )
        q0s = jnp.asarray(
            np.stack([p.quaternion() for p in initial_poses]), dtype
        )
        batched_fn = (
            _fused_register_lockstep if mode == "lockstep"
            else _fused_register_batched
        )
        out = batched_fn(
            self.means_T, self.infos_T, points, points_T, pmask, t0s, q0s,
            self.loss, self.search_radius, self.outer_tolerance,
            self.num_neighbors, self.max_outer_iterations, self.options,
            self.planar, objective=self.objective, normals_T=self.normals_T,
            voxel_weights=self.voxel_weights,
            trim_distance=self.trim_distance,
        )
        return out

    @staticmethod
    def finalize_batch(device_out) -> list:
        """Fetch + unpack a :meth:`register_batch_async` result into
        list[FusedRegistrationResult] (one blocking fetch for the whole
        batch)."""
        ts, qs, its, inner_its, costs, final_costs = jax.device_get(device_out)
        results = []
        for b in range(np.asarray(ts).shape[0]):
            qn = np.asarray(qs[b], np.float64)
            qn /= np.linalg.norm(qn)
            results.append(
                FusedRegistrationResult(
                    pose=Pose(np_quat_to_rotmat(qn), np.asarray(ts[b], np.float64)),
                    outer_iterations=int(its[b]),
                    final_cost=float(final_costs[b]),
                    inner_iterations=np.asarray(inner_its[b]),
                    costs=np.asarray(costs[b]),
                )
            )
        return results

    def _launch(self, local_points, initial_pose: Pose):
        dtype = self.dtype
        pts_np = np.ascontiguousarray(np.asarray(local_points))
        mask_np = np.ones(pts_np.shape[0])
        if self.mesh is not None:
            # equal shard sizes: pad the point set to a device-count
            # multiple with masked zeros
            d = self.mesh.devices.size
            n_pad = _round_up(pts_np.shape[0], d)
            extra = n_pad - pts_np.shape[0]
            if extra:
                pts_np = np.concatenate([pts_np, np.zeros((extra, 3))])
                mask_np = np.concatenate([mask_np, np.zeros(extra)])
        points = jnp.asarray(pts_np, dtype)
        points_T = jnp.asarray(pts_np.T, dtype)
        pmask = jnp.asarray(mask_np, dtype)

        args = (
            self.means_T,
            self.infos_T,
            points,
            points_T,
            pmask,
            jnp.asarray(initial_pose.translation, dtype),
            jnp.asarray(initial_pose.quaternion(), dtype),
            self.loss,
            self.search_radius,
            self.outer_tolerance,
            self.num_neighbors,
            self.max_outer_iterations,
            self.options,
            self.planar,
        )
        extra = dict(
            objective=self.objective,
            normals_T=self.normals_T,
            voxel_weights=self.voxel_weights,
            trim_distance=self.trim_distance,
        )
        if self.mesh is None:
            t, q, it, inner_its, costs, final_cost = _fused_register(
                *args, map_mask=self.map_mask, **extra
            )
        else:
            t, q, it, inner_its, costs, final_cost = _fused_register_sharded(
                *args, self.mesh, **extra
            )
        return (t, q, it, inner_its, costs, final_cost)


def register_ndt_fused(
    ndt_map: NdtMap,
    local_points: np.ndarray,
    initial_pose: Pose,
    options: Options,
    loss: Optional[LossFunction] = None,
    search_radius: float = 1.0,
    num_neighbors: int = 2,
    max_outer_iterations: int = OUTER_MAX_ITERATIONS,
    outer_tolerance: float = OUTER_TOLERANCE,
    dtype=jnp.float32,
) -> FusedRegistrationResult:
    """Single-dispatch scan-to-map registration (flagship fast path)."""
    registrar = NdtRegistrar(
        ndt_map,
        options,
        loss,
        search_radius,
        num_neighbors,
        max_outer_iterations,
        outer_tolerance,
        dtype,
    )
    return registrar.register(local_points, initial_pose)


# ----------------------------------------------------------------------------
# Hybrid registrar: NATIVE host matching + one clean device LM program.
#
# Empirically on this TPU runtime, any XLA program mixing the Pallas eval
# with gather/top_k/cond/second-loop structures flips the process into a
# permanent ~30 ms per-dispatch completion-poll mode (see CLAUDE.md). The
# single-while+pallas LM program alone stays at real device speed
# (~0.2 ms for 40 iterations). This registrar therefore does what the
# reference does (host-side correspondence search, FLANN analog) with the
# native C++ matcher writing the packed kernel buffer directly, and keeps
# the device program pristine.
# ----------------------------------------------------------------------------


@functools.partial(jax.jit, static_argnames=("options", "planar"))
def _packed_lm_solve(t0, q0, packed, loss, options, planar=False):
    """Single-while LM over a prepacked correspondence buffer. Returns
    (t, q, iterations, final_cost) only — no record arrays to transfer."""
    from ..solvers import lm as lm_mod

    if not planar:
        def quad(params: SE3Params):
            R = lie.quat_to_rotmat(params.quaternion)
            return pk.maha6_eval_quadratic_packed(R, params.translation, packed, loss)

        params, summary = lm_mod.solve(quad, se3_retract, SE3Params(t0, q0), options)
        return (
            params.translation,
            params.quaternion,
            summary.iterations,
            summary.final_cost,
        )

    theta0 = 2.0 * jnp.arctan2(q0[3], q0[0])

    def quad2(params: SE2Params):
        R2 = lie.rot2(params.theta)
        return pk.maha3_eval_quadratic_packed(R2, params.translation, packed, loss)

    params2, summary = lm_mod.solve(
        quad2, se2_retract, SE2Params(t0[:2], theta0), options
    )
    t_new = jnp.concatenate([params2.translation, t0[2:]])
    half = 0.5 * params2.theta
    q_new = jnp.stack(
        [jnp.cos(half), jnp.zeros_like(half), jnp.zeros_like(half), jnp.sin(half)]
    )
    return t_new, q_new, summary.iterations, summary.final_cost


class HybridRegistrar:
    """Scan-to-map registration: native C++ matching on the host, Pallas
    LM solving on the device — the reference's exact host/device split
    (MatchPointCloud / Solve seam, SURVEY section 3.1). Same semantics
    and API as NdtRegistrar.

    When to use which: on directly-attached TPU hardware this path's
    per-iteration cost is host matching (~0.2 ms threaded) + one small
    upload + a ~0.2 ms device solve, making it the lowest-latency serial
    option. Through a relayed/tunneled runtime the per-outer-iteration
    1.3 MB buffer upload dominates (measured ~45 ms/iteration at ~30 MB/s
    effective), and the single-dispatch NdtRegistrar — which uploads the
    scan once — wins."""

    def __init__(
        self,
        ndt_map: NdtMap,
        options: Options,
        loss: Optional[LossFunction] = None,
        search_radius: float = 1.0,
        num_neighbors: int = 2,
        max_outer_iterations: int = OUTER_MAX_ITERATIONS,
        outer_tolerance: float = OUTER_TOLERANCE,
        planar: bool = False,
        num_threads: int = 0,
    ):
        from .. import native

        native.load()  # raise early if the native library is unavailable
        valid = ndt_map.valid_only()
        self.means = np.ascontiguousarray(valid.means)
        self.sqrt_infos = np.ascontiguousarray(valid.sqrt_informations)
        self.options = options
        self.loss = loss
        self.search_radius = search_radius
        self.num_neighbors = num_neighbors
        self.max_outer_iterations = max_outer_iterations
        self.outer_tolerance = outer_tolerance
        self.planar = planar
        self.num_threads = num_threads
        self._buf = None  # reused packed buffer

    def register(self, local_points, initial_pose: Pose) -> FusedRegistrationResult:
        from .. import native
        from ..core.pose import np_rotmat_to_quat

        pts = np.ascontiguousarray(np.asarray(local_points, np.float64))
        n = pts.shape[0]
        k = self.num_neighbors
        lanes = _round_up(n * k, pk.LANE_BLOCK)
        if self._buf is None or self._buf.shape[1] != lanes:
            self._buf = np.empty((16, lanes), np.float32)

        pose = initial_pose.copy()
        last = pose.copy()
        max_outer = self.max_outer_iterations
        inner_its = np.zeros(max_outer, np.int32)
        costs = np.full(max_outer, np.nan)
        outer_it = 0
        final_cost = np.nan
        for outer_it in range(max_outer):
            packed = native.match_and_pack(
                pts,
                pose.rotation,
                pose.translation,
                self.means,
                self.sqrt_infos,
                self.search_radius,
                k,
                lanes,
                out=self._buf,
                num_threads=self.num_threads,
            )
            t, q, iters, cost = _packed_lm_solve(
                jnp.asarray(pose.translation, jnp.float32),
                jnp.asarray(pose.quaternion(), jnp.float32),
                # host-side reshape to the kernel plane layout is free
                # (same bytes); uploading 3-D avoids a device relayout
                jnp.asarray(packed.reshape(16, -1, 128)),
                self.loss,
                self.options,
                self.planar,
            )
            t, q, iters, cost = jax.device_get((t, q, iters, cost))
            qn = np.asarray(q, np.float64)
            qn /= np.linalg.norm(qn)
            pose = Pose(np_quat_to_rotmat(qn), np.asarray(t, np.float64))
            inner_its[outer_it] = int(iters)
            costs[outer_it] = float(cost)
            final_cost = float(cost)

            diff = pose.inverse() * last
            dq = np_rotmat_to_quat(diff.rotation)
            if (
                np.linalg.norm(diff.translation) < self.outer_tolerance
                and np.linalg.norm(dq[1:]) < self.outer_tolerance
            ):
                break
            last = pose.copy()

        return FusedRegistrationResult(
            pose=pose,
            outer_iterations=outer_it + 1,
            final_cost=final_cost,
            inner_iterations=inner_its,
            costs=costs,
        )
