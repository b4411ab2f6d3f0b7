"""Bundle Adjustment in the Large (BAL) solver: the Snavely 9-parameter
camera model over the Schur-complement camera/landmark solve.

This is the repo's EXTERNAL-ANCHOR path. The reference anchors every
solver to Ceres (pose_graph_optimizer_ceres.cc:15-69 pattern); Ceres'
own published anchor for bundle adjustment is the BAL dataset family
(simple_bundle_adjuster.cc over problem-*-pre.txt). `solve_bal` accepts
exactly those files via `io.bal.read_bal`, and the offline anchor tests
(tests/test_external_anchor.py) solve BAL-format problems with BOTH this
solver and scipy.optimize.least_squares (an independent trust-region
implementation with finite-difference Jacobians — separate optimizer,
separate derivative machinery) and assert the final costs agree; torch
autograd cross-checks the Jacobians themselves.

Model (BAL convention, see io/bal.py):
  P = R(rod) X + t,   p = -P_xy / P_z,   r^2 = |p|^2
  predicted = f (1 + k1 r^2 + k2 r^4) p,   residual = predicted - observed
  cost = 0.5 sum |residual|^2   (Ceres / scipy.least_squares convention —
  NOTE: the rest of this repo reports sum |r|^2 without the 1/2, the
  reference's convention; the 0.5 here is deliberate so numbers compare
  directly to Ceres logs and scipy `result.cost`.)

Parameterization matches Ceres' simple_bundle_adjuster exactly: plain
additive updates on all 9 camera parameters (the Rodrigues vector is an
ambient parameterization, no local manifold) and on the 3D points. The
LM policy is the repo-wide reference policy (damping diag *= (1+lambda),
lambda in [1e-6, 1e-2] x2.0/x0.6, convergence checked after the update —
mahalanobis_distance_minimizer_analytic.cc:84-152), via the same loop
shape as `_ba_lm_loop`.

TPU mapping: residuals + Jacobians batch over the observation axis
(vmap(jacfwd) of the 12-input/2-output observation function — exact,
fused by XLA); U (9x9) / V (3x3) blocks accumulate by segment-sum; V
inverts with the closed-form adjugate; the Schur rhs and the landmark
back-substitution are pure observation-level segment-sums (no dense
cross tensor); the reduced camera system (9C x 9C) cross term assembles
either as one einsum over the dense (C, P, 9, 3) scatter (default —
49 cams x 7776 pts = 40 MB f64, fine) or, for larger instances, in
landmark CHUNKS (``landmark_chunk=``, the bundle_adjustment.py recipe:
peak memory O(chunk * C * 27) independent of P) and solves with
Cholesky. All contractions run at Precision.HIGHEST — the TPU default
f32 dot lowers to single-pass bf16 and stalls LM (ops/quadratic.py).
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..core.options import Options
from ..io.bal import BALProblem
from ..ops.quadratic import highest_precision
from .bundle_adjustment import _inv3x3
from .lm import IterationRecord, Summary

Array = jax.Array


def _rodrigues_rotate(rod: Array, x: Array) -> Array:
    """R(rod) @ x, AD-safe at rod = 0 (Taylor-guarded sin/cos factors)."""
    theta2 = rod @ rod
    small = theta2 < 1e-14
    safe = jnp.where(small, 1.0, theta2)
    theta = jnp.sqrt(safe)
    a = jnp.where(small, 1.0 - theta2 / 6.0, jnp.sin(theta) / theta)
    b = jnp.where(small, 0.5 - theta2 / 24.0, (1.0 - jnp.cos(theta)) / safe)
    c1 = jnp.cross(rod, x)
    c2 = jnp.cross(rod, c1)
    return x + a * c1 + b * c2


def snavely_residual(cam: Array, point: Array, observed: Array) -> Array:
    """(2,) reprojection residual for one observation (jax twin of
    io.bal.snavely_project; parity asserted in tests)."""
    P = _rodrigues_rotate(cam[0:3], point) + cam[3:6]
    p = -P[:2] / P[2]
    r2 = p @ p
    distortion = 1.0 + cam[7] * r2 + cam[8] * r2 * r2
    return cam[6] * distortion * p - observed


_res_and_jac = jax.vmap(
    lambda c, x, o: (
        snavely_residual(c, x, o),
        *jax.jacfwd(snavely_residual, argnums=(0, 1))(c, x, o),
    )
)


@functools.partial(jax.jit, static_argnames=("num_cameras", "num_points"))
def _bal_cost(cams, points, cam_idx, pt_idx, obs, num_cameras, num_points):
    r = jax.vmap(snavely_residual)(cams[cam_idx], points[pt_idx], obs)
    return 0.5 * jnp.sum(r * r)


def bal_cost(problem: BALProblem, dtype=jnp.float64) -> float:
    """0.5 * sum of squared reprojection residuals (Ceres convention)."""
    return float(
        _bal_cost(
            jnp.asarray(problem.camera_params, dtype),
            jnp.asarray(problem.points, dtype),
            jnp.asarray(problem.camera_indices),
            jnp.asarray(problem.point_indices),
            jnp.asarray(problem.observations, dtype),
            problem.num_cameras,
            problem.num_points,
        )
    )


def _bal_solve_impl(cams0, points0, cam_idx, pt_idx, obs, options, dtype,
                    landmark_chunk=None, schur="dense",
                    schur_iterations=100):
    C = cams0.shape[0]
    P = points0.shape[0]
    oh = options.optimization_handle
    ch = options.convergence_handle
    max_it = options.max_iterations
    eye9 = jnp.eye(9, dtype=dtype)
    eye3 = jnp.eye(3, dtype=dtype)

    @highest_precision
    def schur_step(cams, points, lam):
        r, Jc, Jl = _res_and_jac(cams[cam_idx], points[pt_idx], obs)
        cost = 0.5 * jnp.sum(r * r)

        # block accumulation by segment-sum over the observation axis
        JcT_Jc = jnp.einsum("odi,odj->oij", Jc, Jc)  # (O, 9, 9)
        JlT_Jl = jnp.einsum("odi,odj->oij", Jl, Jl)  # (O, 3, 3)
        W = jnp.einsum("odi,odj->oij", Jc, Jl)  # (O, 9, 3)
        JcT_r = jnp.einsum("odi,od->oi", Jc, r)  # (O, 9)
        JlT_r = jnp.einsum("odi,od->oi", Jl, r)  # (O, 3)

        U = jax.ops.segment_sum(JcT_Jc, cam_idx, C)  # (C, 9, 9)
        V = jax.ops.segment_sum(JlT_Jl, pt_idx, P)  # (P, 3, 3)
        g_c = -jax.ops.segment_sum(JcT_r, cam_idx, C)  # (C, 9)
        g_l = -jax.ops.segment_sum(JlT_r, pt_idx, P)  # (P, 3)

        # reference damping: diag *= (1 + lambda), plus a tiny absolute
        # floor so never-observed blocks stay invertible (documented
        # deviation: the reference's ldlt on singular H is UB)
        dampU = U + lam * U * jnp.broadcast_to(eye9, U.shape) + 1e-10 * eye9
        dampV = V + lam * V * jnp.broadcast_to(eye3, V.shape) + 1e-10 * eye3
        Vinv = _inv3x3(dampV)

        # Schur rhs needs no cross tensor: sum_p G_cp Vinv_p g_l[p]
        # = sum_o W_o Vinv[pt(o)] g_l[pt(o)] scattered to cam(o)
        WVg = jnp.einsum(
            "oab,ob->oa", jnp.einsum("oab,obd->oad", W, Vinv[pt_idx]),
            g_l[pt_idx],
        )  # (O, 9)
        rhs = g_c - jax.ops.segment_sum(WVg, cam_idx, C)  # (C, 9)

        if schur == "iterative":
            # ITERATIVE_SCHUR (Ceres' name for the same idea): PCG on
            # the reduced camera system with the Schur-Jacobi
            # preconditioner. S is never materialized — its matvec is
            # three observation-level segment-sums:
            #   S x = dampU x - G Vinv G^T x
            #       = dampU x - scatter_cam(W Vinv[pt] gather_pt(W^T x))
            # O(O) memory per product, so 9C x 9C never exists and
            # 1000+-camera instances fit where the dense assembly
            # cannot (13k cams -> S alone would be 110 GB f64).
            def S_matvec(x):  # (C, 9) -> (C, 9)
                y = jnp.einsum("cab,cb->ca", dampU, x)
                t = jnp.einsum("oab,oa->ob", W, x[cam_idx])  # (O, 3)
                s = jax.ops.segment_sum(t, pt_idx, P)  # (P, 3)
                z = jnp.einsum("pab,pb->pa", Vinv, s)
                return y - jax.ops.segment_sum(
                    jnp.einsum("oab,ob->oa", W, z[pt_idx]), cam_idx, C
                )

            # Schur-Jacobi: the block diagonal of S, exactly
            WVW = jnp.einsum(
                "oad,obd->oab",
                jnp.einsum("oab,obd->oad", W, Vinv[pt_idx]),
                W,
            )  # (O, 9, 9) = W Vinv W^T per observation
            Dblocks = dampU - jax.ops.segment_sum(WVW, cam_idx, C)
            Dchol = jnp.linalg.cholesky(Dblocks + 1e-12 * eye9)

            def precond(r):
                return jax.scipy.linalg.cho_solve(
                    (Dchol, True), r[..., None]
                )[..., 0]

            def cg_body(_, st):
                x, r_, z, p, rz = st
                Ap = S_matvec(p)
                denom = jnp.sum(p * Ap)
                alpha = rz / jnp.where(denom == 0, 1.0, denom)
                x = x + alpha * p
                r_ = r_ - alpha * Ap
                z = precond(r_)
                rz_new = jnp.sum(r_ * z)
                beta = rz_new / jnp.where(rz == 0, 1.0, rz)
                p = z + beta * p
                return (x, r_, z, p, rz_new)

            x0 = jnp.zeros_like(rhs)
            z0 = precond(rhs)
            dc = jax.lax.fori_loop(
                0, schur_iterations, cg_body,
                (x0, rhs, z0, z0, jnp.sum(rhs * z0)),
            )[0]

            back = jax.ops.segment_sum(
                jnp.einsum("oab,oa->ob", W, dc[cam_idx]), pt_idx, P
            )
            dl = jnp.einsum("pab,pb->pa", Vinv, g_l - back)
            return dc, dl, cost, g_c, g_l

        # cross term S -= G Vinv G^T: the only piece that pairs
        # observations sharing a landmark
        if landmark_chunk is None or landmark_chunk >= P:
            # dense (C, P, 9, 3) scatter — see module docstring
            G = jnp.zeros((C, P, 9, 3), dtype).at[cam_idx, pt_idx].add(W)
            GV = jnp.einsum("cpab,pbd->cpad", G, Vinv)  # (C, P, 9, 3)
            S = -jnp.einsum("cpad,epfd->caef", GV, G)  # -(G Vinv G^T)
        else:
            # landmark-chunked accumulation (bundle_adjustment.py:309-330
            # recipe): peak memory O(chunk * C * 27), independent of P
            n_chunks = -(-P // landmark_chunk)
            pad_p = n_chunks * landmark_chunk - P
            Vinv_p = jnp.pad(Vinv, ((0, pad_p), (0, 0), (0, 0)))

            def chunk_body(S_acc, k):
                base = k * landmark_chunk
                rel = pt_idx - base
                in_chunk = ((rel >= 0) & (rel < landmark_chunk)).astype(dtype)
                relc = jnp.clip(rel, 0, landmark_chunk - 1)
                G_k = (
                    jnp.zeros((landmark_chunk, C, 9, 3), dtype)
                    .at[relc, cam_idx]
                    .add(W * in_chunk[:, None, None])
                )  # (chunk, C, 9, 3)
                Vinv_k = jax.lax.dynamic_slice_in_dim(
                    Vinv_p, base, landmark_chunk
                )
                GV_k = jnp.einsum("pcab,pbd->pcad", G_k, Vinv_k)
                S_acc = S_acc - jnp.einsum("pcad,pefd->caef", GV_k, G_k)
                return S_acc, None

            S, _ = jax.lax.scan(
                chunk_body,
                jnp.zeros((C, 9, C, 9), dtype),
                jnp.arange(n_chunks),
            )
        S = S.at[jnp.arange(C), :, jnp.arange(C), :].add(dampU)

        Sm = S.reshape(9 * C, 9 * C)
        # damped S is symmetric positive definite (gauge freedom is
        # lifted by the multiplicative damping); Cholesky solve
        L = jnp.linalg.cholesky(Sm)
        dc = jax.scipy.linalg.cho_solve((L, True), rhs.reshape(-1))
        dc = dc.reshape(C, 9)

        # back-substitution is observation-level too:
        # (G^T dc)_p = sum_{o: pt(o)=p} W_o^T dc[cam(o)]
        back = jax.ops.segment_sum(
            jnp.einsum("oab,oa->ob", W, dc[cam_idx]), pt_idx, P
        )  # (P, 3)
        dl = jnp.einsum("pab,pb->pa", Vinv, g_l - back)  # (P, 3)
        return dc, dl, cost, g_c, g_l

    def records_init():
        nan = jnp.full((max_it,), jnp.nan, dtype)
        return IterationRecord(nan, nan, nan, nan)

    track_best = ch.relative_function_tolerance > 0.0

    def body(state):
        (cams, points, lam, prev_cost, last_cost, it, done, best, stall,
         rec, best_cams, best_points, plateau) = state
        dc, dl, cost, g_c, g_l = schur_step(cams, points, lam)
        finite = jnp.all(jnp.isfinite(dc)) & jnp.all(jnp.isfinite(dl))
        dc = jnp.where(finite, dc, jnp.zeros_like(dc))
        dl = jnp.where(finite, dl, jnp.zeros_like(dl))
        new_cams = cams + dc  # ambient additive (Ceres simple_bundle_adjuster)
        new_points = points + dl

        step_norm = jnp.sqrt(jnp.sum(dc * dc) + jnp.sum(dl * dl))
        grad_norm = jnp.sqrt(jnp.sum(g_c * g_c) + jnp.sum(g_l * g_l))
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
            # evaluated at the PRE-step (cams, points); a plateau exit
            # returns the best-seen state instead of the last step
            better = cost < best
            new_bc = jnp.where(better, cams, best_cams)
            new_bp = jnp.where(better, points, best_points)
            new_plateau = converged & (~ref_converged)
        else:
            new_bc, new_bp, new_plateau = best_cams, best_points, plateau
        increase = cost > prev_cost
        adapted = jnp.where(
            increase,
            lam * oh.lambda_increase_factor,
            lam * oh.lambda_decrease_factor,
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
        return (new_cams, new_points, new_lam, new_prev, cost, it + 1,
                converged, new_best, new_stall, rec, new_bc, new_bp,
                new_plateau)

    def cond(state):
        return (state[5] < max_it) & (~state[6])

    init = (
        cams0,
        points0,
        jnp.asarray(oh.initial_lambda, dtype),
        jnp.asarray(jnp.finfo(dtype).max, dtype),
        jnp.asarray(jnp.finfo(dtype).max, dtype),
        jnp.asarray(0, jnp.int32),
        jnp.asarray(False),
        jnp.asarray(jnp.finfo(dtype).max, dtype),
        jnp.asarray(0, jnp.int32),
        records_init(),
        cams0 if track_best else jnp.zeros((0,), dtype),
        points0 if track_best else jnp.zeros((0,), dtype),
        jnp.asarray(False),
    )
    (cams, points, lam, prev_cost, last_cost, it, done, bcost, _, rec,
     bcams, bpoints, plateau) = jax.lax.while_loop(cond, body, init)
    iterations = jnp.where(done, it - 1, it)
    final_cost = last_cost
    if track_best:
        # monotone safeguard: plateau exits return the best-seen state
        cams = jnp.where(plateau, bcams, cams)
        points = jnp.where(plateau, bpoints, points)
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
    return cams, points, summary


_bal_solve_jit = jax.jit(
    _bal_solve_impl,
    static_argnames=("options", "dtype", "landmark_chunk", "schur",
                     "schur_iterations"),
)

# the dense (C, P, 9, 3) cross tensor auto-switches to chunked
# accumulation above this byte budget (f64 worst case)
_DENSE_CROSS_BUDGET_BYTES = 512 * 1024 * 1024


def solve_bal(
    problem: BALProblem,
    options: Optional[Options] = None,
    dtype=jnp.float64,
    landmark_chunk: Optional[int] = None,
    schur: str = "dense",
    schur_iterations: int = 100,
) -> Tuple[BALProblem, Summary]:
    """Solve a BAL problem; returns (solved problem, Summary).

    ``dtype`` defaults to float64 (requires x64 — the anchor comparisons
    run against float64 scipy); pass jnp.float32 on TPU hardware.

    ``landmark_chunk``: accumulate the Schur cross term in landmark
    chunks of this size (memory O(chunk * C * 27) instead of the dense
    O(P * C * 27) tensor). Default: dense when the cross tensor fits
    ~512 MB, else an auto-selected chunk — identical math either way
    (asserted in tests/test_bal.py).

    ``schur="iterative"`` is Ceres' ITERATIVE_SCHUR: PCG on the reduced
    camera system (``schur_iterations`` per LM step, Schur-Jacobi
    preconditioner) with matrix-free observation-level products — the
    path for 1000+-camera rigs where the dense 9C x 9C assembly cannot
    exist (BAL final/13682: S alone would be 121 GB f64). Steps are
    inexact (truncated Krylov), so LM may take a few more iterations
    than the exact-Schur path; anchored against it in tests.
    """
    if schur not in ("dense", "iterative"):
        raise ValueError(f"unknown schur mode {schur!r}")
    if options is None:
        options = Options().replace(max_iterations=50)
    C, P = problem.num_cameras, problem.num_points
    if schur == "iterative":
        landmark_chunk = None  # no cross tensor exists on this path
    elif landmark_chunk is None:
        itemsize = jnp.dtype(dtype).itemsize
        dense_bytes = C * P * 27 * itemsize * 2  # G and GV both live
        if dense_bytes > _DENSE_CROSS_BUDGET_BYTES:
            landmark_chunk = max(
                128, _DENSE_CROSS_BUDGET_BYTES // (2 * C * 27 * itemsize)
            )
    cams, points, summary = _bal_solve_jit(
        jnp.asarray(problem.camera_params, dtype),
        jnp.asarray(problem.points, dtype),
        jnp.asarray(problem.camera_indices),
        jnp.asarray(problem.point_indices),
        jnp.asarray(problem.observations, dtype),
        options,
        dtype,
        landmark_chunk,
        schur,
        schur_iterations,
    )
    solved = BALProblem(
        np.asarray(cams, np.float64),
        np.asarray(points, np.float64),
        problem.camera_indices,
        problem.point_indices,
        problem.observations,
    )
    return solved, jax.device_get(summary)
