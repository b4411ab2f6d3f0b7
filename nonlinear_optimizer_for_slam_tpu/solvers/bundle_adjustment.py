"""Schur-complement bundle adjustment: joint camera + landmark solve.

New capability beyond the reference repo (its README lists BA as absent;
BASELINE.json config 5 requires it). The design is the TPU-native
camera-landmark bipartite solve:

- every observation evaluates in one batch: residual r (O, 2) on the
  normalized image plane and analytic Jacobians J_c (O, 2, 6) w.r.t. its
  camera and J_l (O, 2, 3) w.r.t. its landmark (same projection math and
  depth gating as the reprojection factor,
  reference: reprojection_error_minimizer_analytic.cc:105-163);
- per-landmark 3x3 blocks V_j and per-camera 6x6 blocks U_i accumulate by
  segment-sum over the observation axis; V_j inverts batched (vmapped
  Cholesky) — the classic Schur trick with all landmark work elementwise
  over the landmark axis;
- the reduced camera system S = U - G V^{-1} G^T (G = scatter of the 6x3
  cross blocks) assembles with MXU einsums and solves dense (6C x 6C);
- landmark back-substitution is again batched over landmarks.

The LM policy loop is the reference's exactly (damping H_diag *= 1 + lam
applied to BOTH U and V diagonals, lambda in [1e-6, 1e-2] x2.0/x0.6,
mahalanobis_distance_minimizer_analytic.cc:84-152), so BA converges with
the same trace semantics as every other module.

Multi-chip scaling path (SURVEY section 5): shard the observation and
landmark axes; U, S, g_c partials psum over ICI; the reduced camera solve
replicates. The Schur reduction happens BEFORE communication, so the
collective payload is only the (6C)^2 reduced system.
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import jax.scipy.linalg as jsl
import numpy as np

from ..core import lie
from ..core.losses import LossFunction
from ..core.options import Options
from ..ops.reprojection import MIN_DEPTH, CameraIntrinsics
from .lm import IterationRecord, Summary

Array = jax.Array


class BAData(NamedTuple):
    """SoA observation batch for bundle adjustment."""

    camera_indices: Array  # (O,) int32
    landmark_indices: Array  # (O,) int32
    pixels: Array  # (O, 2) observed pixels
    mask: Array  # (O,) 1.0 = real observation

    @property
    def num_observations(self) -> int:
        return self.camera_indices.shape[0]


class GroupedBAData(NamedTuple):
    """Track-major (landmark-grouped) observation layout: row m holds the
    up-to-T observations of landmark m, zero-mask padded. This layout is
    what makes BA scatter-free on TPU: every landmark-side segment sum
    becomes a reduction over the track axis, and camera-side segment sums
    become one-hot MXU matmuls (see _ba_solve_grouped_impl)."""

    camera_indices: Array  # (M, T) int32, 0 on padded slots
    pixels: Array  # (M, T, 2)
    mask: Array  # (M, T) 1.0 = real observation


class BAParams(NamedTuple):
    translations: Array  # (C, 3)
    quaternions: Array  # (C, 4) (w, x, y, z)
    landmarks: Array  # (M, 3)


def _inv3x3(V: Array) -> Array:
    """Closed-form adjugate inverse of batched 3x3 matrices.

    ``jnp.linalg.inv`` lowers to an LU custom-call (LuDecompositionBlock)
    that costs ~8 ms/iteration for 10k landmarks on a v5e; the adjugate is
    a handful of fused VPU ops. V is LM-damped (+1e-8 floor), so det > 0."""
    a, b, c = V[..., 0, 0], V[..., 0, 1], V[..., 0, 2]
    d, e, f = V[..., 1, 0], V[..., 1, 1], V[..., 1, 2]
    g, h, i = V[..., 2, 0], V[..., 2, 1], V[..., 2, 2]
    c00 = e * i - f * h
    c01 = f * g - d * i
    c02 = d * h - e * g
    c10 = c * h - b * i
    c11 = a * i - c * g
    c12 = b * g - a * h
    c20 = b * f - c * e
    c21 = c * d - a * f
    c22 = a * e - b * d
    det = a * c00 + b * c01 + c * c02
    inv_det = 1.0 / det
    row0 = jnp.stack([c00, c10, c20], axis=-1)
    row1 = jnp.stack([c01, c11, c21], axis=-1)
    row2 = jnp.stack([c02, c12, c22], axis=-1)
    return jnp.stack([row0, row1, row2], axis=-2) * inv_det[..., None, None]


def _outer2(Ja: Array, Jb: Array) -> Array:
    """sum_d Ja[..., d, :]^T Jb[..., d, :] for d in {0, 1} — the 2-row
    J^T J / J^T W blocks, written as explicit VPU FMAs. The einsum
    spelling ("..di,..dj->..ij") lowers to per-element dot_generals padded
    to MXU tiles (contraction length 2!), which profiled at ~13 ms/iter
    on the 350k-observation rig; this form is bandwidth-bound instead."""
    return (
        Ja[..., 0, :, None] * Jb[..., 0, None, :]
        + Ja[..., 1, :, None] * Jb[..., 1, None, :]
    )


def _dot2(Ja: Array, r: Array) -> Array:
    """sum_d Ja[..., d, :] * r[..., d, None] — the 2-row J^T r products."""
    return Ja[..., 0, :] * r[..., 0, None] + Ja[..., 1, :] * r[..., 1, None]


def _observation_residuals_jacobians(
    params: BAParams, data: BAData, intr: CameraIntrinsics
):
    """Batched (r (O,2), J_c (O,2,6), J_l (O,2,3)) with depth gating."""
    R_all = lie.quat_to_rotmat(params.quaternions)  # (C, 3, 3)
    R = R_all[data.camera_indices]  # (O, 3, 3)
    t = params.translations[data.camera_indices]  # (O, 3)
    X = params.landmarks[data.landmark_indices]  # (O, 3)
    p = data.pixels

    Xw = jnp.sum(R * X[..., None, :], axis=-1) + t  # R X + t, VPU form
    zw = Xw[..., 2]
    valid = ((zw >= MIN_DEPTH) & (data.mask > 0)).astype(Xw.dtype)
    safe_z = jnp.where(zw >= MIN_DEPTH, zw, jnp.ones_like(zw))
    inv_z = 1.0 / safe_z
    inv_z2 = inv_z * inv_z

    proj = Xw[..., :2] * inv_z[..., None]
    matched = jnp.stack(
        [
            intr.inv_fx * (p[..., 0] - intr.cx),
            intr.inv_fy * (p[..., 1] - intr.cy),
        ],
        axis=-1,
    )
    r = (proj - matched) * valid[..., None]

    zero = jnp.zeros_like(inv_z)
    dK = jnp.stack(
        [
            jnp.stack([inv_z, zero, -Xw[..., 0] * inv_z2], axis=-1),
            jnp.stack([zero, inv_z, -Xw[..., 1] * inv_z2], axis=-1),
        ],
        axis=-2,
    )  # (O, 2, 3)

    # camera Jacobian [dK | -dK R skew(X)] (translation, then rotation)
    x, y, z = X[..., 0:1], X[..., 1:2], X[..., 2:3]
    col0 = R[..., 1] * z - R[..., 2] * y  # (O, 3) columns of R skew(X)
    col1 = R[..., 2] * x - R[..., 0] * z
    col2 = R[..., 0] * y - R[..., 1] * x
    Rskew = jnp.stack([col0, col1, col2], axis=-1)  # (O, 3, 3)
    # (O, 2, 3) @ (O, 3, 3) per-observation products as broadcast-mul-sum
    # (contraction length 3 — einsum lowers these to tile-padded MXU
    # dot_generals that dominate the profile; see _outer2)
    J_rot = -jnp.sum(dK[..., :, :, None] * Rskew[..., None, :, :], axis=-2)
    J_c = jnp.concatenate([dK, J_rot], axis=-1) * valid[..., None, None]

    # landmark Jacobian dK @ R
    J_l = jnp.sum(dK[..., :, :, None] * R[..., None, :, :], axis=-2)
    J_l = J_l * valid[..., None, None]
    return r, J_c, J_l, valid


def _ba_solve_impl(
    params0: BAParams,
    data: BAData,
    intr: CameraIntrinsics,
    loss,  # Optional[LossFunction] pytree
    cam_free_mask,  # (C,) 1.0 = free camera, 0.0 = gauge-fixed
    num_cameras: int,
    num_landmarks: int,  # LOCAL landmark count when sharded
    options: Options,
    psum_axis=None,
    landmark_chunk=None,  # static: chunk the Schur cross accumulation
    chunk_grouped_obs=None,  # static: obs-per-chunk when host-grouped
):
    """Core Schur LM loop. With ``psum_axis`` set, landmarks and
    observations are SHARDED over that mesh axis: V/G/g_l/back-
    substitution stay local per shard, while the reduced camera system
    (U, S cross terms, g_c, rhs) and the convergence scalars psum over
    ICI — the Schur reduction happens BEFORE communication, so the
    collective payload is only the (6C)^2 system (SURVEY section 5)."""
    C, M = num_cameras, num_landmarks
    oh = options.optimization_handle
    ch = options.convergence_handle
    dtype = params0.translations.dtype
    cam_idx = data.camera_indices
    lm_idx = data.landmark_indices
    obs_free = cam_free_mask[cam_idx]  # (O,)

    def schur_step(params: BAParams, lam):
        r, J_c, J_l, valid = _observation_residuals_jacobians(params, data, intr)
        # gauge fixing: fixed cameras contribute no camera derivatives
        J_c = J_c * obs_free[:, None, None]
        sq = jnp.sum(r * r, axis=-1)
        if loss is None:
            rho, w = sq, jnp.ones_like(sq)
        else:
            rho, w, _ = loss.evaluate(sq)
        w = w * valid
        rho = rho * valid
        cost = jnp.sum(rho)

        with jax.default_matmul_precision("highest"):
            # per-observation blocks
            JcW = J_c * w[:, None, None]
            JlW = J_l * w[:, None, None]
            U_o = _outer2(JcW, J_c)  # (O, 6, 6)
            V_o = _outer2(JlW, J_l)  # (O, 3, 3)
            W_o = _outer2(JcW, J_l)  # (O, 6, 3)
            gc_o = _dot2(JcW, r)  # (O, 6)
            gl_o = _dot2(JlW, r)  # (O, 3)

            # segment-sum into per-camera / per-landmark blocks
            U = jnp.zeros((C, 6, 6), dtype).at[cam_idx].add(U_o)
            V = jnp.zeros((M, 3, 3), dtype).at[lm_idx].add(V_o)
            g_c = jnp.zeros((C, 6), dtype).at[cam_idx].add(gc_o)
            g_l = jnp.zeros((M, 3), dtype).at[lm_idx].add(gl_o)

            # LM damping: diag *= (1 + lam) on both blocks (reference
            # policy); small floor keeps unobserved landmarks invertible
            eye3 = jnp.eye(3, dtype=dtype)
            eye6 = jnp.eye(6, dtype=dtype)
            U = U + lam * U * eye6
            # identity blocks on gauge-fixed cameras keep S invertible
            # (their g is zero, so their step stays exactly zero)
            U = U + (1.0 - cam_free_mask)[:, None, None] * eye6
            V = V + lam * V * eye3 + 1e-8 * eye3

            V_inv = _inv3x3(V)  # batched (M, 3, 3), adjugate (no LU)

            # Schur RHS cross term at OBSERVATION level — no (M, C, 6, 3)
            # tensor needed: rhs_c = -sum_o W_o V^{-1}_{m(o)} g_l[m(o)]
            V_inv_o = V_inv[lm_idx]  # (O, 3, 3)
            A_o = jnp.sum(
                W_o[..., :, :, None] * V_inv_o[..., None, :, :], axis=-2
            )  # (O, 6, 3) = W V^-1
            rhs_cross = -(
                jnp.zeros((C, 6), dtype)
                .at[cam_idx]
                .add(jnp.sum(A_o * g_l[lm_idx][:, None, :], axis=-1))
            )

            # S cross term: sum_m G_m V_m^{-1} G_m^T needs per-landmark
            # PAIRS of observing cameras. Small rigs materialize the
            # (M, C, 6, 3) scatter in one shot; large rigs accumulate it
            # over landmark CHUNKS in a lax.scan — peak memory becomes
            # O(chunk * C * 18) instead of O(M * C * 18), the memory wall
            # that capped round-1 BA at toy scale.
            if landmark_chunk is None or landmark_chunk >= M:
                G = jnp.zeros((M, C, 6, 3), dtype).at[lm_idx, cam_idx].add(W_o)
                GV = jnp.einsum("mcik,mkl->mcil", G, V_inv)  # (M, C, 6, 3)
                S_cross = -jnp.einsum("mcik,mdjk->cidj", GV, G)
            else:
                n_chunks = -(-M // landmark_chunk)
                pad_m = n_chunks * landmark_chunk - M
                V_inv_p = jnp.concatenate(
                    [
                        V_inv,
                        jnp.broadcast_to(
                            jnp.eye(3, dtype=dtype), (pad_m, 3, 3)
                        ),
                    ],
                    axis=0,
                ) if pad_m else V_inv

                if chunk_grouped_obs is not None:
                    # CHUNK-GROUPED observations (host-sorted so chunk k's
                    # observations occupy the contiguous slice
                    # [k*Oc, (k+1)*Oc), zero-mask padded): each scan step
                    # scatters only its own Oc observations — total
                    # scatter work O(O), vs O(O * n_chunks) for the
                    # masked fallback below.
                    Oc = chunk_grouped_obs

                    def chunk_body(acc, k):
                        base = k * landmark_chunk
                        o0 = k * Oc
                        Wk = jax.lax.dynamic_slice_in_dim(W_o, o0, Oc)
                        lmk = jax.lax.dynamic_slice_in_dim(lm_idx, o0, Oc)
                        camk = jax.lax.dynamic_slice_in_dim(cam_idx, o0, Oc)
                        relc = jnp.clip(lmk - base, 0, landmark_chunk - 1)
                        Gc = (
                            jnp.zeros((landmark_chunk, C, 6, 3), dtype)
                            .at[relc, camk]
                            .add(Wk)
                        )
                        Vc = jax.lax.dynamic_slice_in_dim(
                            V_inv_p, base, landmark_chunk
                        )
                        GVc = jnp.einsum("mcik,mkl->mcil", Gc, Vc)
                        return acc + jnp.einsum("mcik,mdjk->cidj", GVc, Gc), None
                else:

                    def chunk_body(acc, k):
                        base = k * landmark_chunk
                        rel = lm_idx - base
                        in_chunk = (
                            (rel >= 0) & (rel < landmark_chunk)
                        ).astype(dtype)
                        relc = jnp.clip(rel, 0, landmark_chunk - 1)
                        Gc = (
                            jnp.zeros((landmark_chunk, C, 6, 3), dtype)
                            .at[relc, cam_idx]
                            .add(W_o * in_chunk[:, None, None])
                        )
                        Vc = jax.lax.dynamic_slice_in_dim(
                            V_inv_p, base, landmark_chunk
                        )
                        GVc = jnp.einsum("mcik,mkl->mcil", Gc, Vc)
                        return acc + jnp.einsum("mcik,mdjk->cidj", GVc, Gc), None

                S_sum, _ = jax.lax.scan(
                    chunk_body,
                    jnp.zeros((C, 6, C, 6), dtype),
                    jnp.arange(n_chunks),
                )
                S_cross = -S_sum

            if psum_axis is not None:
                # one fused collective for the whole reduced system
                U, S_cross, g_c, rhs_cross, cost = jax.lax.psum(
                    (U, S_cross, g_c, rhs_cross, cost), psum_axis
                )
                # re-apply the single global identity for fixed cameras
                # (each shard added it before the psum)
                n_shards = jax.lax.psum(1, psum_axis)
                U = U - (n_shards - 1) * (
                    (1.0 - cam_free_mask)[:, None, None] * eye6
                )

            S = S_cross
            S = S.at[jnp.arange(C), :, jnp.arange(C), :].add(U)
            rhs = g_c + rhs_cross

            Smat = S.reshape(C * 6, C * 6)
            factor = jsl.cho_factor(Smat, lower=True)
            dc = jsl.cho_solve(factor, -rhs.reshape(C * 6)).reshape(C, 6)

            # landmark back-substitution at observation level:
            # dl = -V^{-1} (g_l + sum_{o in m} W_o^T dc[cam(o)])
            Wt_dc = (
                jnp.zeros((M, 3), dtype)
                .at[lm_idx]
                .add(jnp.sum(W_o * dc[cam_idx][..., :, None], axis=-2))
            )
            rhs_l = g_l + Wt_dc
            dl = -jnp.sum(V_inv * rhs_l[:, None, :], axis=-1)

        return dc, dl, cost, g_c, g_l

    return _ba_lm_loop(schur_step, params0, options, dtype, psum_axis)


def _ba_retract(params: BAParams, dc, dl):
    t = params.translations + dc[:, :3]
    dq = lie.so3_exp_quaternion(dc[:, 3:6])
    q = lie.quat_normalize(lie.quat_multiply(params.quaternions, dq))
    return BAParams(t, q, params.landmarks + dl)


def _ba_lm_loop(schur_step, params0: BAParams, options: Options, dtype,
                psum_axis=None):
    """The canonical LM policy loop shared by every BA evaluation layout:
    ``schur_step(params, lam) -> (dc, dl, cost, g_c, g_l)``."""
    oh = options.optimization_handle
    ch = options.convergence_handle
    retract = _ba_retract
    max_it = options.max_iterations

    def records_init():
        nan = jnp.full((max_it,), jnp.nan, dtype)
        return IterationRecord(nan, nan, nan, nan)

    track_best = ch.relative_function_tolerance > 0.0

    def body(state):
        (params, lam, prev_cost, last_cost, it, done, best, stall, rec,
         best_params, plateau) = state
        dc, dl, cost, g_c, g_l = schur_step(params, lam)
        finite = jnp.all(jnp.isfinite(dc)) & jnp.all(jnp.isfinite(dl))
        dc = jnp.where(finite, dc, jnp.zeros_like(dc))
        dl = jnp.where(finite, dl, jnp.zeros_like(dl))
        new_params = retract(params, dc, dl)

        dl_sq = jnp.sum(dl * dl)
        gl_sq = jnp.sum(g_l * g_l)
        if psum_axis is not None:
            dl_sq, gl_sq = jax.lax.psum((dl_sq, gl_sq), psum_axis)
        # g_c is already the global gradient after the in-step psum
        step_norm = jnp.sqrt(jnp.sum(dc * dc) + dl_sq)
        grad_norm = jnp.sqrt(jnp.sum(g_c * g_c) + gl_sq)
        ref_converged = (step_norm < ch.parameter_tolerance) | (
            grad_norm < ch.gradient_tolerance
        )
        converged = ref_converged
        if ch.relative_function_tolerance > 0.0:
            # opt-in relative best-cost plateau stop — same semantics
            # as solvers/lm.py (which see)
            # (best - cost) > rtol*best: the (1 - rtol) multiplier form
            # rounds to 1.0 at f32 for small rtol (see solvers/lm.py)
            improved = (best - cost) > ch.relative_function_tolerance * best
            new_stall = jnp.where(improved, 0, stall + 1)
            converged = converged | (new_stall >= 3)
        else:
            new_stall = stall
        new_best = jnp.minimum(best, cost)
        if track_best:
            # monotone safeguard (solvers/lm.py, which see): cost was
            # evaluated at the PRE-step params; plateau exits return the
            # best-seen state
            better = cost < best
            new_best_params = jax.tree_util.tree_map(
                lambda b, p: jnp.where(better, p, b), best_params, params
            )
            new_plateau = converged & (~ref_converged)
        else:
            new_best_params, new_plateau = best_params, plateau
        increase = cost > prev_cost
        adapted = jnp.where(
            increase, lam * oh.lambda_increase_factor, lam * oh.lambda_decrease_factor
        )
        adapted = jnp.clip(adapted, oh.min_lambda, oh.max_lambda)
        new_lam = jnp.where(converged, lam, adapted)
        new_prev = jnp.where(converged, prev_cost, cost)
        rec = IterationRecord(
            rec.cost.at[it].set(cost),
            rec.lam.at[it].set(lam),
            rec.gradient_norm.at[it].set(grad_norm),
            rec.step_norm.at[it].set(step_norm),
        )
        return (new_params, new_lam, new_prev, cost, it + 1, converged,
                new_best, new_stall, rec, new_best_params, new_plateau)

    def cond(state):
        return (state[4] < max_it) & (~state[5])

    init = (
        params0,
        jnp.asarray(oh.initial_lambda, dtype),
        jnp.asarray(jnp.finfo(dtype).max, dtype),
        jnp.asarray(jnp.finfo(dtype).max, dtype),
        jnp.asarray(0, jnp.int32),
        jnp.asarray(False),
        jnp.asarray(jnp.finfo(dtype).max, dtype),
        jnp.asarray(0, jnp.int32),
        records_init(),
        params0 if track_best else None,
        jnp.asarray(False),
    )
    (params, lam, prev_cost, last_cost, it, done, bcost, _, rec,
     best_params, plateau) = jax.lax.while_loop(cond, body, init)
    iterations = jnp.where(done, it - 1, it)
    final_cost = last_cost
    if track_best:
        # monotone safeguard: plateau exits return the best-seen state
        params = jax.tree_util.tree_map(
            lambda b, p: jnp.where(plateau, b, p), best_params, params
        )
        final_cost = jnp.where(plateau, bcost, last_cost)
    summary = Summary(
        final_cost=final_cost,
        reported_cost=prev_cost,
        iterations=iterations,
        final_lambda=lam,
        converged=done,
        records=rec,
        plateau_stop=plateau if track_best else None,
        best_cost=bcost if track_best else None,
    )
    return params, summary


def _ba_solve_grouped_impl(
    params0: BAParams,
    gdata: GroupedBAData,
    intr: CameraIntrinsics,
    loss,
    cam_free_mask,  # (C,)
    num_cameras: int,
    options: Options,
    lm_chunk: int,  # landmarks per scan chunk (divides M)
):
    """Scatter-free Schur LM loop on the track-major layout.

    Profiling the flat layout on a v5e showed ~60% of each iteration in
    scatter-adds (the U/V/G segment sums serialize on TPU) and another
    ~6% in the LU custom-call of ``jnp.linalg.inv``. This path removes
    every scatter:

    - landmark-side sums (V, g_l, back-substitution) reduce over the
      track axis T of the (M, T, ...) layout — pure VPU reductions;
    - camera-side sums (U, g_c, Schur rhs/cross) contract a one-hot
      camera-assignment tensor E (chunk, T, C) against per-observation
      blocks — MXU matmuls, built chunk-by-chunk inside a lax.scan so
      peak memory stays O(chunk * T * C);
    - the Schur cross term reuses E: B = E^T(W V^-1), D = E^T W per
      landmark, then S_cross = -sum_m B_m D_m^T, one big MXU contraction;
    - V^-1 is the closed-form adjugate (_inv3x3), no LU.

    Numerics are identical to _ba_solve_impl up to float reassociation:
    same residuals/Jacobians (shared code on the flattened layout), same
    damping, same LM policy loop (_ba_lm_loop)."""
    C = num_cameras
    M, T = gdata.camera_indices.shape
    dtype = params0.translations.dtype
    cam_idx = gdata.camera_indices  # (M, T)
    n_chunks = M // lm_chunk
    obs_free = cam_free_mask[cam_idx]  # (M, T)

    # flattened view reuses the exact flat residual/Jacobian math
    flat_data = BAData(
        camera_indices=cam_idx.reshape(-1),
        landmark_indices=jnp.repeat(
            jnp.arange(M, dtype=jnp.int32), T, total_repeat_length=M * T
        ),
        pixels=gdata.pixels.reshape(-1, 2),
        mask=gdata.mask.reshape(-1),
    )

    def schur_step(params: BAParams, lam):
        r_f, Jc_f, Jl_f, valid_f = _observation_residuals_jacobians(
            params, flat_data, intr
        )
        r = r_f.reshape(M, T, 2)
        J_c = Jc_f.reshape(M, T, 2, 6) * obs_free[..., None, None]
        J_l = Jl_f.reshape(M, T, 2, 3)
        valid = valid_f.reshape(M, T)

        sq = jnp.sum(r * r, axis=-1)
        if loss is None:
            rho, w = sq, jnp.ones_like(sq)
        else:
            rho, w, _ = loss.evaluate(sq)
        w = w * valid
        rho = rho * valid
        cost = jnp.sum(rho)

        with jax.default_matmul_precision("highest"):
            JcW = J_c * w[..., None, None]
            JlW = J_l * w[..., None, None]
            # landmark-side: reductions over the track axis (no scatter);
            # all block products in VPU broadcast-mul-sum form (_outer2)
            V = jnp.sum(_outer2(JlW, J_l), axis=1)  # (M, 3, 3)
            g_l = jnp.sum(_dot2(JlW, r), axis=1)  # (M, 3)

            eye3 = jnp.eye(3, dtype=dtype)
            eye6 = jnp.eye(6, dtype=dtype)
            V = V + lam * V * eye3 + 1e-8 * eye3
            V_inv = _inv3x3(V)

            # per-observation camera-side blocks
            U_mt = _outer2(JcW, J_c)  # (M, T, 6, 6)
            W_mt = _outer2(JcW, J_l)  # (M, T, 6, 3)
            gc_mt = _dot2(JcW, r)  # (M, T, 6)
            A_mt = jnp.sum(
                W_mt[..., :, :, None] * V_inv[:, None, None, :, :], axis=-2
            )  # (M, T, 6, 3) = W V^-1
            rc_mt = -jnp.sum(A_mt * g_l[:, None, None, :], axis=-1)  # (M, T, 6)

            def chunk_body(acc, xs):
                U_a, gc_a, rc_a, S_a = acc
                cam_k, U_k, gc_k, rc_k, A_k, W_k = xs
                E = (
                    cam_k[..., None] == jnp.arange(C, dtype=jnp.int32)
                ).astype(dtype)  # (chunk, T, C) one-hot
                U_a = U_a + jnp.einsum("mtc,mtij->cij", E, U_k)
                gc_a = gc_a + jnp.einsum("mtc,mti->ci", E, gc_k)
                rc_a = rc_a + jnp.einsum("mtc,mti->ci", E, rc_k)
                B = jnp.einsum("mtc,mtik->mcik", E, A_k)  # G V^-1 blocks
                D = jnp.einsum("mtc,mtik->mcik", E, W_k)  # G blocks
                S_a = S_a - jnp.einsum("mcik,mdjk->cidj", B, D)
                return (U_a, gc_a, rc_a, S_a), None

            def chunked(x):
                return x.reshape((n_chunks, lm_chunk) + x.shape[1:])

            init = (
                jnp.zeros((C, 6, 6), dtype),
                jnp.zeros((C, 6), dtype),
                jnp.zeros((C, 6), dtype),
                jnp.zeros((C, 6, C, 6), dtype),
            )
            (U, g_c, rhs_cross, S_cross), _ = jax.lax.scan(
                chunk_body,
                init,
                tuple(chunked(x) for x in (cam_idx, U_mt, gc_mt, rc_mt, A_mt, W_mt)),
            )

            # damping + gauge identity on the reduced camera blocks
            U = U + lam * U * eye6
            U = U + (1.0 - cam_free_mask)[:, None, None] * eye6

            S = S_cross.at[jnp.arange(C), :, jnp.arange(C), :].add(U)
            rhs = g_c + rhs_cross
            Smat = S.reshape(C * 6, C * 6)
            factor = jsl.cho_factor(Smat, lower=True)
            dc = jsl.cho_solve(factor, -rhs.reshape(C * 6)).reshape(C, 6)

            # back-substitution: gather dc per observation, reduce over T
            dc_mt = dc[cam_idx]  # (M, T, 6)
            Wt_dc = jnp.sum(W_mt * dc_mt[..., :, None], axis=(1, 2))  # (M, 3)
            rhs_l = g_l + Wt_dc
            dl = -jnp.sum(V_inv * rhs_l[:, None, :], axis=-1)

        return dc, dl, cost, g_c, g_l

    return _ba_lm_loop(schur_step, params0, options, dtype, psum_axis=None)


@functools.partial(jax.jit, static_argnums=(5, 6, 7))
def _ba_solve_grouped(
    params0, gdata, intr, loss, cam_free_mask, num_cameras, options, lm_chunk
):
    return _ba_solve_grouped_impl(
        params0, gdata, intr, loss, cam_free_mask, num_cameras, options,
        lm_chunk,
    )


@functools.partial(jax.jit, static_argnums=(5, 6, 7, 8, 9))
def _ba_solve(
    params0, data, intr, loss, cam_free_mask, num_cameras, num_landmarks,
    options, landmark_chunk=None, chunk_grouped_obs=None,
):
    return _ba_solve_impl(
        params0, data, intr, loss, cam_free_mask, num_cameras, num_landmarks,
        options, psum_axis=None, landmark_chunk=landmark_chunk,
        chunk_grouped_obs=chunk_grouped_obs,
    )


@functools.partial(jax.jit, static_argnums=(5, 6, 7, 8, 9))
def _ba_solve_sharded(
    params0, data, intr, loss, cam_free_mask, num_cameras, local_landmarks,
    options, mesh, landmark_chunk=None,
):
    """Landmark-sharded BA: BAParams.landmarks, the observation batch, and
    all landmark-side blocks shard over the mesh's factor axis; camera
    state replicates. Host-side prep (BundleAdjuster.solve) sorts
    observations into per-shard blocks with LOCAL landmark indices."""
    from ..parallel.mesh import FACTOR_AXIS

    P = jax.sharding.PartitionSpec
    try:
        shard_map = jax.shard_map
    except AttributeError:  # pragma: no cover
        from jax.experimental.shard_map import shard_map

    def local_fn(params, data_s, intr_, loss_, free_):
        return _ba_solve_impl(
            params, data_s, intr_, loss_, free_, num_cameras, local_landmarks,
            options, psum_axis=FACTOR_AXIS, landmark_chunk=landmark_chunk,
        )

    params_specs = BAParams(P(), P(), P(FACTOR_AXIS))
    data_specs = BAData(
        P(FACTOR_AXIS), P(FACTOR_AXIS), P(FACTOR_AXIS), P(FACTOR_AXIS)
    )
    intr_specs = jax.tree_util.tree_map(lambda _: P(), intr)
    loss_specs = jax.tree_util.tree_map(lambda _: P(), loss)
    out_params_specs = BAParams(P(), P(), P(FACTOR_AXIS))
    tb = options.convergence_handle.relative_function_tolerance > 0.0
    summary_specs = Summary(
        P(), P(), P(), P(), P(), IterationRecord(P(), P(), P(), P()),
        plateau_stop=P() if tb else None, best_cost=P() if tb else None,
    )
    kwargs = dict(
        mesh=mesh,
        in_specs=(params_specs, data_specs, intr_specs, loss_specs, P()),
        out_specs=(out_params_specs, summary_specs),
    )
    try:
        fn = shard_map(local_fn, check_vma=False, **kwargs)
    except TypeError:  # pragma: no cover
        fn = shard_map(local_fn, check_rep=False, **kwargs)
    return fn(params0, data, intr, loss, cam_free_mask)


class BundleAdjuster:
    """Joint camera-landmark refinement via Schur complement."""

    def __init__(
        self, dtype=jnp.float64, mesh=None, landmark_chunk="auto",
        layout="grouped",
    ):
        """``mesh``: optional factor mesh — landmarks + observations shard
        across it, camera state replicates, the reduced camera system
        psums over ICI (the multi-host BA of BASELINE config 5).

        ``landmark_chunk``: chunk size for the Schur cross-term
        accumulation. "auto" (default) picks one that caps the per-chunk
        (chunk, C, 6, 3) tensor near 64 MB once the one-shot (M, C, 6, 3)
        tensor would exceed ~256 MB; None forces one-shot; an int forces
        that chunk size. Chunking trades one big scatter for a
        lax.scan of masked scatters — O(n_chunks * O) index work, flat
        memory — and is what lets a 100-camera / 10k-landmark / 100k-obs
        rig fit on one chip (round-1 capped at 8 cams x 300 landmarks).

        ``layout``: "grouped" (default) uses the scatter-free track-major
        path (_ba_solve_grouped_impl) on a single device — ~20x faster
        per LM iteration on TPU than the flat scatter-add layout; "flat"
        keeps the flat layout (landmark_chunk applies to it). The sharded
        (mesh) path always uses the flat layout."""
        self.dtype = dtype
        self.mesh = mesh
        self.landmark_chunk = landmark_chunk
        self.layout = layout
        self.loss_function: Optional[LossFunction] = None

    def _resolve_chunk(self, C: int, M: int):
        if self.landmark_chunk != "auto":
            return self.landmark_chunk
        itemsize = jnp.dtype(self.dtype).itemsize
        one_shot_bytes = M * C * 18 * itemsize
        if one_shot_bytes <= 256 * 1024 * 1024:
            return None
        target = 64 * 1024 * 1024
        return max(64, target // (C * 18 * itemsize))

    def set_loss_function(self, loss: Optional[LossFunction]):
        self.loss_function = loss
        return self

    @staticmethod
    def _group_by_landmark(data: BAData, M: int, C: int, itemsize: int):
        """Host-side prep for the scatter-free grouped path: bucket
        observations track-major — row m holds landmark m's observations,
        zero-mask padded to the max track length T (rounded up to a
        multiple of 4). M pads up to a multiple of the scan chunk, chosen
        so the per-chunk one-hot tensor (chunk, T, C) stays near 32 MB.
        Returns (GroupedBAData, M_pad, lm_chunk)."""
        cam = np.asarray(data.camera_indices)
        lm = np.asarray(data.landmark_indices)
        px = np.asarray(data.pixels)
        mask = np.asarray(data.mask)
        counts = np.bincount(lm, minlength=M)
        T = -(-int(max(counts.max(), 1)) // 4) * 4

        target = 32 * 1024 * 1024
        lm_chunk = max(64, target // max(T * C * itemsize, 1))
        if lm_chunk >= M:
            lm_chunk = M
        M_pad = -(-M // lm_chunk) * lm_chunk

        order = np.argsort(lm, kind="stable")
        slot = np.concatenate([np.arange(c) for c in counts]) if len(order) else np.zeros(0, np.int64)
        rows = lm[order]
        cam_out = np.zeros((M_pad, T), np.int32)
        px_out = np.zeros((M_pad, T, 2), px.dtype)
        mask_out = np.zeros((M_pad, T), mask.dtype)
        cam_out[rows, slot] = cam[order]
        px_out[rows, slot] = px[order]
        mask_out[rows, slot] = mask[order]
        gdata = GroupedBAData(
            camera_indices=jnp.asarray(cam_out),
            pixels=jnp.asarray(px_out),
            mask=jnp.asarray(mask_out),
        )
        return gdata, M_pad, lm_chunk

    @staticmethod
    def _chunk_group(data: BAData, M: int, chunk: int):
        """Host-side grouping for the chunked Schur path: sort observations
        by landmark chunk and pad every chunk to the same occupancy, so the
        device scan slices contiguous blocks instead of masking the whole
        observation array once per chunk. Reordering + zero-mask padding
        preserves every segment sum. Returns (grouped BAData, O_chunk)."""
        n_chunks = -(-M // chunk)
        cam = np.asarray(data.camera_indices)
        lm = np.asarray(data.landmark_indices)
        px = np.asarray(data.pixels)
        mask = np.asarray(data.mask)
        chunk_of = lm // chunk
        counts = np.bincount(chunk_of, minlength=n_chunks)
        O_chunk = int(max(counts.max(), 1))
        cam_out = np.zeros((n_chunks, O_chunk), np.int32)
        lm_out = np.zeros((n_chunks, O_chunk), np.int32)
        px_out = np.zeros((n_chunks, O_chunk, 2), px.dtype)
        mask_out = np.zeros((n_chunks, O_chunk), mask.dtype)
        for k in range(n_chunks):
            ix = np.nonzero(chunk_of == k)[0]
            cam_out[k, : len(ix)] = cam[ix]
            # padded rows keep a lm index INSIDE chunk k so the relative
            # index stays in range (their mask is 0 — no contribution)
            lm_out[k] = min(k * chunk, M - 1)
            lm_out[k, : len(ix)] = lm[ix]
            px_out[k, : len(ix)] = px[ix]
            mask_out[k, : len(ix)] = mask[ix]
        grouped = BAData(
            camera_indices=jnp.asarray(cam_out.reshape(-1)),
            landmark_indices=jnp.asarray(lm_out.reshape(-1)),
            pixels=jnp.asarray(px_out.reshape(-1, 2)),
            mask=jnp.asarray(mask_out.reshape(-1)),
        )
        return grouped, O_chunk

    @staticmethod
    def _shard_prep(data: BAData, M: int, num_shards: int):
        """Sort observations into per-landmark-range shard blocks with
        LOCAL landmark indices; equal block sizes via masked padding.
        Returns (data_flat, M_pad, local_M)."""
        local_M = -(-M // num_shards)
        M_pad = local_M * num_shards
        cam = np.asarray(data.camera_indices)
        lm = np.asarray(data.landmark_indices)
        px = np.asarray(data.pixels)
        mask = np.asarray(data.mask)
        shard_of = lm // local_M

        per_shard = [np.nonzero(shard_of == d)[0] for d in range(num_shards)]
        O_shard = max((len(ix) for ix in per_shard), default=1) or 1
        cam_out = np.zeros((num_shards, O_shard), np.int32)
        lm_out = np.zeros((num_shards, O_shard), np.int32)
        px_out = np.zeros((num_shards, O_shard, 2), px.dtype)
        mask_out = np.zeros((num_shards, O_shard), mask.dtype)
        for d, ix in enumerate(per_shard):
            k = len(ix)
            cam_out[d, :k] = cam[ix]
            lm_out[d, :k] = lm[ix] - d * local_M  # LOCAL index
            px_out[d, :k] = px[ix]
            mask_out[d, :k] = mask[ix]
        flat = BAData(
            camera_indices=jnp.asarray(cam_out.reshape(-1)),
            landmark_indices=jnp.asarray(lm_out.reshape(-1)),
            pixels=jnp.asarray(px_out.reshape(-1, 2)),
            mask=jnp.asarray(mask_out.reshape(-1)),
        )
        return flat, M_pad, local_M

    def solve(
        self,
        options: Options,
        data: BAData,
        intrinsics: CameraIntrinsics,
        camera_poses,  # list[Pose] length C
        landmarks: np.ndarray,  # (M, 3)
        fixed_cameras=(0,),
    ):
        """Returns (optimized_poses, optimized_landmarks, summary).

        ``fixed_cameras`` pins gauge freedom (default: camera 0; pass two
        cameras to also pin scale in monocular problems)."""
        from ..core.pose import Pose, np_quat_to_rotmat

        dtype = self.dtype
        C = len(camera_poses)
        M = landmarks.shape[0]
        free = np.ones(C)
        for ci in fixed_cameras:
            free[ci] = 0.0
        intr = CameraIntrinsics(
            *(jnp.asarray(v, dtype) for v in intrinsics[:6]),
            intrinsics.width,
            intrinsics.height,
        )
        t_arr = jnp.asarray(np.stack([p.translation for p in camera_poses]), dtype)
        q_arr = jnp.asarray(np.stack([p.quaternion() for p in camera_poses]), dtype)

        if self.mesh is None and self.layout == "grouped":
            gdata, M_pad, lm_chunk = self._group_by_landmark(
                data, M, C, jnp.dtype(dtype).itemsize
            )
            gdata = GroupedBAData(
                gdata.camera_indices,
                gdata.pixels.astype(dtype),
                gdata.mask.astype(dtype),
            )
            lms_pad = np.zeros((M_pad, 3))
            lms_pad[:M] = np.asarray(landmarks)
            params0 = BAParams(t_arr, q_arr, jnp.asarray(lms_pad, dtype))
            params, summary = _ba_solve_grouped(
                params0,
                gdata,
                intr,
                self.loss_function,
                jnp.asarray(free, dtype),
                C,
                options,
                lm_chunk,
            )
            params = BAParams(
                params.translations, params.quaternions, params.landmarks[:M]
            )
        elif self.mesh is None:
            chunk = self._resolve_chunk(C, M)
            grouped_O = None
            if chunk is not None and chunk < M:
                data, grouped_O = self._chunk_group(data, M, chunk)
            data = BAData(
                data.camera_indices,
                data.landmark_indices,
                data.pixels.astype(dtype),
                data.mask.astype(dtype),
            )
            params0 = BAParams(t_arr, q_arr, jnp.asarray(landmarks, dtype))
            params, summary = _ba_solve(
                params0,
                data,
                intr,
                self.loss_function,
                jnp.asarray(free, dtype),
                C,
                M,
                options,
                chunk,
                grouped_O,
            )
        else:
            D = self.mesh.devices.size
            data_flat, M_pad, local_M = self._shard_prep(data, M, D)
            lms_pad = np.zeros((M_pad, 3))
            lms_pad[:M] = np.asarray(landmarks)
            params0 = BAParams(t_arr, q_arr, jnp.asarray(lms_pad, dtype))
            data_flat = BAData(
                data_flat.camera_indices,
                data_flat.landmark_indices,
                data_flat.pixels.astype(dtype),
                data_flat.mask.astype(dtype),
            )
            params, summary = _ba_solve_sharded(
                params0,
                data_flat,
                intr,
                self.loss_function,
                jnp.asarray(free, dtype),
                C,
                local_M,
                options,
                self.mesh,
                self._resolve_chunk(C, local_M),
            )
            params = BAParams(
                params.translations, params.quaternions, params.landmarks[:M]
            )
        ts, qs, lms = jax.device_get(
            (params.translations, params.quaternions, params.landmarks)
        )  # one batched fetch (each separate fetch costs a ~30 ms quantum)
        ts = np.asarray(ts, np.float64)
        qs = np.asarray(qs, np.float64)
        poses = []
        for i in range(C):
            q = qs[i] / np.linalg.norm(qs[i])
            poses.append(Pose(np_quat_to_rotmat(q), ts[i]))
        return poses, np.asarray(lms, np.float64), summary
