"""Sim(3) pose graph: scale-drift-aware loop-closure optimization for
monocular SLAM (Strasdat et al., "Scale Drift-Aware Large Scale
Monocular SLAM", RSS 2010 — the essential-graph optimization ORB-SLAM
runs at every loop closure).

Monocular odometry drifts in SCALE as well as pose; closing a loop with
an SE(3) graph forces the scale error into the translations. The Sim(3)
state adds one log-scale per keyframe and the edge residual measures
relative similarity transforms, so the optimizer can absorb drift where
it actually happened. State per pose: [p (3), q (4, ambient), log_s].

Edge residual for measurement (t_rel, q_rel, s_rel) on edge (i, j),
with the similarity T = (s R, p) acting as x -> s R x + p:

    S_ij = T_i^-1 T_j:  s_ij = s_j / s_i,
                        R_ij = R_i^T R_j,
                        t_ij = (1 / s_i) R_i^T (p_j - p_i)
    r = [ t_ij - t_rel ; 2 vec(q_rel^-1 q_i^-1 q_j) ;
          log(s_ij) - log(s_rel) ]                      (7,)

whitened by optional sqrt-information (scalar / (3,) = (t, rot, scale)
/ (7,) diagonal). Jacobians come from ONE vmapped per-edge jacfwd (17
ambient inputs, 7 residual rows — cheap), scatter-assembled into the
dense (8P)^2 normal matrix exactly like the SE(3) dense path; the
canonical lm.solve loop drives the solve. An SE(3) measurement is the
s_rel = 1 special case, so ordinary odometry edges and loop closures
mix freely.

The reference has nothing Sim(3); its pose graph (like its Ceres
functors) is SE(3)-only.
"""

from __future__ import annotations

import functools
from typing import Dict, List, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..core import lie
from ..core.options import Options
from ..core.pose import Pose, np_quat_to_rotmat
from . import lm

Array = jax.Array


class Sim3Edges(NamedTuple):
    reference_indices: Array  # (E,) int32
    query_indices: Array  # (E,) int32
    rel_t: Array  # (E, 3)
    rel_q: Array  # (E, 4) wxyz
    rel_log_s: Array  # (E,)
    mask: Array  # (E,)
    sqrt_info: Optional[Array] = None  # (E, 7) diagonal


def sim3_edge_residual(x_ref: Array, x_query: Array, meas: Array) -> Array:
    """7-D residual of one edge; states (8,) = [p, q, log_s], measurement
    (8,) = [t_rel, q_rel, log_s_rel]."""
    p_r, q_r, ls_r = x_ref[:3], x_ref[3:7], x_ref[7]
    p_q, q_q, ls_q = x_query[:3], x_query[3:7], x_query[7]
    t_rel, q_rel, ls_rel = meas[:3], meas[3:7], meas[7]
    n_r = lie.quat_normalize(q_r)
    n_q = lie.quat_normalize(q_q)
    t_ij = jnp.exp(-ls_r) * lie.quat_rotate(lie.quat_conjugate(n_r), p_q - p_r)
    err_q = lie.quat_multiply(
        lie.quat_conjugate(q_rel),
        lie.quat_multiply(lie.quat_conjugate(n_r), n_q),
    )
    err_q = jnp.where(err_q[0] < 0, -err_q, err_q)
    return jnp.concatenate(
        [t_ij - t_rel, 2.0 * err_q[1:], ((ls_q - ls_r) - ls_rel)[None]]
    )


_res_and_jac = jax.vmap(
    lambda xr, xq, m: (
        sim3_edge_residual(xr, xq, m),
        jax.jacfwd(sim3_edge_residual, argnums=0)(xr, xq, m),
        jax.jacfwd(sim3_edge_residual, argnums=1)(xr, xq, m),
    )
)


@functools.partial(jax.jit, static_argnums=(4, 5, 6))
def _sim3_solve(
    x0,  # (P, 8)
    edges: Sim3Edges,
    free_mask,  # (P,)
    scale_free,  # (P,) 1.0 = log-scale free (gauge may pin one scale)
    edge_loss,
    num_poses: int,
    options: Options,
):
    P = num_poses
    dtype = x0.dtype
    E = edges.mask.shape[0]
    ref_i = edges.reference_indices
    qry_i = edges.query_indices
    meas = jnp.concatenate(
        [edges.rel_t, edges.rel_q, edges.rel_log_s[:, None]], axis=1
    )
    # per-component column mask: pose block gated by free_mask, scale by
    # scale_free (a fully-fixed pose fixes both)
    col = jnp.concatenate(
        [
            jnp.repeat(free_mask, 7).reshape(P, 7),
            (free_mask * scale_free)[:, None],
        ],
        axis=1,
    ).reshape(-1)

    eights = jnp.arange(8, dtype=jnp.int32)
    rows_ref = 8 * ref_i[:, None] + eights[None, :]
    rows_qry = 8 * qry_i[:, None] + eights[None, :]

    def quad(x):
        xs = x.reshape(P, 8)
        r, J_ref, J_qry = _res_and_jac(xs[ref_i], xs[qry_i], meas)
        if edges.sqrt_info is not None:
            w = edges.sqrt_info
            r = r * w
            J_ref = J_ref * w[:, :, None]
            J_qry = J_qry * w[:, :, None]
        m = edges.mask
        r = r * m[:, None]
        # COLUMN masking by the per-component free mask (round-5 review
        # fix): a pose with only its scale frozen (set_scale_constant)
        # must contribute no gradient and no H coupling through that
        # column — masking whole poses by free_mask alone left frozen
        # scale columns in H (their delta was computed then discarded by
        # retract) and a never-zero gradient component that could block
        # the gradient_tolerance exit. Matches the sparse path exactly.
        colm = col.reshape(P, 8)
        J_ref = J_ref * m[:, None, None] * colm[ref_i][:, None, :]
        J_qry = J_qry * m[:, None, None] * colm[qry_i][:, None, :]

        if edge_loss is not None:
            sq = jnp.sum(r * r, axis=1)
            rho, wts, _ = edge_loss.evaluate(sq)
            cost = jnp.sum(rho)
            sw = jnp.sqrt(wts)
            r = r * sw[:, None]
            J_ref = J_ref * sw[:, None, None]
            J_qry = J_qry * sw[:, None, None]
        else:
            cost = jnp.sum(r * r)

        dim = 8 * P
        H = jnp.zeros((dim, dim), dtype)
        g = jnp.zeros((dim,), dtype)
        with jax.default_matmul_precision("highest"):
            B_rr = jnp.sum(J_ref[:, :, :, None] * J_ref[:, :, None, :], axis=1)
            B_rq = jnp.sum(J_ref[:, :, :, None] * J_qry[:, :, None, :], axis=1)
            B_qq = jnp.sum(J_qry[:, :, :, None] * J_qry[:, :, None, :], axis=1)
            g_r = jnp.sum(J_ref * r[:, :, None], axis=1)
            g_q = jnp.sum(J_qry * r[:, :, None], axis=1)
        H = H.at[rows_ref[:, :, None], rows_ref[:, None, :]].add(B_rr)
        H = H.at[rows_ref[:, :, None], rows_qry[:, None, :]].add(B_rq)
        H = H.at[rows_qry[:, :, None], rows_ref[:, None, :]].add(
            jnp.swapaxes(B_rq, 1, 2)
        )
        H = H.at[rows_qry[:, :, None], rows_qry[:, None, :]].add(B_qq)
        g = g.at[rows_ref].add(g_r).at[rows_qry].add(g_q)
        H = H + jnp.diag(1.0 - col) + 1e-8 * jnp.eye(dim, dtype=dtype)
        return H, g, cost

    def retract(x, delta):
        return x + delta * col

    def solve_linear(H, g, lamb):
        """Reference damping + JACOBI-SCALED Cholesky (round 5).

        The Sim(3) normal matrix mixes translation, quaternion, and
        log-scale columns whose diagonals differ by exp(2*accumulated
        drift) — e^8 on the 52x-drift benchmark graph — and the device
        solve is effectively f32: the unscaled damped Cholesky loses
        the small columns to roundoff and LM creeps (measured 127
        iterations to plateau on the 200-kf essential graph).
        Symmetric diagonal equilibration D^-1/2 H D^-1/2 is exact in
        real arithmetic (identical steps, same LM policy) and restores
        f32 solvability: same final cost in 21 iterations, 6x fewer.
        """
        dim_ = H.shape[0]
        idx = jnp.arange(dim_)
        Hd = H.at[idx, idx].multiply(1.0 + lamb)
        s = jax.lax.rsqrt(jnp.maximum(Hd[idx, idx], jnp.asarray(1e-30, dtype)))
        Hs = Hd * (s[:, None] * s[None, :])
        L = jnp.linalg.cholesky(Hs)
        y = jax.scipy.linalg.cho_solve((L, True), -(g * s))
        return y * s

    x, summary = lm.solve(
        quad, retract, x0.reshape(-1), options, solve_linear=solve_linear
    )
    return x.reshape(P, 8), summary


@functools.partial(jax.jit, static_argnums=(4, 5, 6, 7))
def _sim3_solve_sparse(
    x0,  # (P, 8)
    edges: Sim3Edges,
    free_mask,  # (P,)
    scale_free,  # (P,)
    edge_loss,
    num_poses: int,
    plan,  # multifrontal.Plan (d=8)
    options: Options,
    acc_rounds,  # (kmax, P) multifrontal.accumulate_rounds maps
):
    """Sim(3) LM with the NESTED-DISSECTION MULTIFRONTAL linear solver
    (round 5): the dense path materializes the (8P)^2 normal matrix —
    fine to a few hundred keyframes, infeasible at ORB-SLAM-scale
    essential graphs (10k keyframes would be 80k^2 = 25 GB) — while an
    essential graph's covisibility edges are exactly the loop-rich
    sparse topology solvers/multifrontal.py was built for. Per-edge
    8x8 blocks feed the level-batched frontal Cholesky directly; the
    same canonical lm.solve policy drives both paths."""
    from . import multifrontal

    P = num_poses
    dtype = x0.dtype
    ref_i = edges.reference_indices
    qry_i = edges.query_indices
    meas = jnp.concatenate(
        [edges.rel_t, edges.rel_q, edges.rel_log_s[:, None]], axis=1
    )
    colm = jnp.concatenate(
        [
            jnp.repeat(free_mask, 7).reshape(P, 7),
            (free_mask * scale_free)[:, None],
        ],
        axis=1,
    )  # (P, 8)

    def accumulate(contrib_ref, contrib_qry):
        src = jnp.concatenate(
            [contrib_ref, contrib_qry,
             jnp.zeros((1,) + contrib_ref.shape[1:], dtype)]
        )
        out = src[acc_rounds[0]]
        for t in range(1, acc_rounds.shape[0]):
            out = out + src[acc_rounds[t]]
        return out

    def quad(xs):
        r, J_ref, J_qry = _res_and_jac(xs[ref_i], xs[qry_i], meas)
        if edges.sqrt_info is not None:
            w = edges.sqrt_info
            r = r * w
            J_ref = J_ref * w[:, :, None]
            J_qry = J_qry * w[:, :, None]
        m = edges.mask
        r = r * m[:, None]
        J_ref = J_ref * m[:, None, None] * colm[ref_i][:, None, :]
        J_qry = J_qry * m[:, None, None] * colm[qry_i][:, None, :]
        if edge_loss is not None:
            sq = jnp.sum(r * r, axis=1)
            rho, wts, _ = edge_loss.evaluate(sq)
            cost = jnp.sum(rho)
            sw = jnp.sqrt(wts)
            r = r * sw[:, None]
            J_ref = J_ref * sw[:, None, None]
            J_qry = J_qry * sw[:, None, None]
        else:
            cost = jnp.sum(r * r)
        with jax.default_matmul_precision("highest"):
            g = accumulate(
                jnp.einsum("eri,er->ei", J_ref, r),
                jnp.einsum("eri,er->ei", J_qry, r),
            )  # (P, 8)
            d_p = accumulate(
                jnp.sum(J_ref * J_ref, axis=1),
                jnp.sum(J_qry * J_qry, axis=1),
            )  # (P, 8)
        return (J_ref, J_qry, d_p), g, cost

    def solve_linear(H_rep, g, lam):
        J_ref, J_qry, d_p = H_rep
        # JACOBI EQUILIBRATION in edge-block form (same rationale as the
        # dense path's scaled Cholesky, which see): the Sim(3) diagonal
        # spans exp(2*drift) across translation/rotation/scale columns
        # and an unscaled f32 front Cholesky loses the small columns to
        # roundoff. s = D^-1/2 of the TOTAL damped diagonal; scale the
        # edge blocks by s_a (x) s_b, solve the ~unit-diagonal system,
        # unscale the step. Exact in real arithmetic.
        dtot = (1.0 + lam) * (d_p + (1.0 - colm) + 1e-8)
        s = jax.lax.rsqrt(dtot)  # (P, 8)
        sa = s[ref_i]
        sb = s[qry_i]
        with jax.default_matmul_precision("highest"):
            B_aa = jnp.einsum("eri,erj->eij", J_ref, J_ref) * (
                sa[:, :, None] * sa[:, None, :]
            )
            B_bb = jnp.einsum("eri,erj->eij", J_qry, J_qry) * (
                sb[:, :, None] * sb[:, None, :]
            )
            B_ab = jnp.einsum("eri,erj->eij", J_ref, J_qry) * (
                sa[:, :, None] * sb[:, None, :]
            )
        # total diagonal matches the dense path's damped diagonal
        # (d_p + (1-col) + 1e-8)(1+lam), Jacobi-scaled to exactly 1:
        # the scaled B blocks already carry s^2 d_p on the diagonal, so
        # the separate term is s^2 (dtot - d_p) = 1 - s^2 d_p
        dvec = 1.0 - s * s * d_p
        dp_scaled = multifrontal.solve(
            plan, ref_i, qry_i, B_aa, B_bb, B_ab, dvec, -(g * s)
        )
        return dp_scaled * s

    def retract(xs, delta):
        return xs + delta * colm

    x, summary = lm.solve(quad, retract, x0, options,
                          solve_linear=solve_linear)
    return x, summary


class Sim3GraphOptimizer:
    """Registry + solve() for the Sim(3) essential graph (same API shape
    as PoseGraphOptimizer, with a scale per pose)."""

    def __init__(self, dtype=jnp.float64, edge_loss=None,
                 solver: str = "auto"):
        """``solver``: "dense" materializes the (8P)^2 normal matrix
        (best below a few hundred keyframes); "sparse" (round 5) is the
        nested-dissection multifrontal path over the essential graph's
        edge sparsity — the scale class where dense is infeasible
        (10k keyframes = a 25 GB dense H); "auto" (default) picks
        sparse above 600 keyframes."""
        if solver not in ("auto", "dense", "sparse"):
            raise ValueError(f"unknown solver {solver!r}")
        self.solver = solver
        self.sparse_threshold = 600  # auto picks sparse above this P
        self.dtype = dtype
        self.edge_loss = edge_loss
        self._poses: Dict[int, np.ndarray] = {}  # (8,) [p, q, log_s]
        self._constant: set = set()
        self._fix_scale: set = set()
        self._constraints: List[dict] = []
        self._sparse_plan = None  # (key, (plan, acc_rounds)) topology cache

    # -- registry ------------------------------------------------------
    def set_pose(self, index: int, pose: Pose, scale: float = 1.0) -> None:
        if scale <= 0.0:
            raise ValueError(f"scale must be positive, got {scale}")
        self._poses[index] = np.concatenate(
            [pose.translation, pose.quaternion(), [np.log(scale)]]
        )

    def set_pose_constant(self, index: int) -> None:
        """Freeze pose AND scale (the Sim(3) gauge has 7 dof: 6 pose + 1
        global scale; one fully-fixed keyframe pins all of it)."""
        if index not in self._poses:
            raise KeyError(f"pose {index} not registered")
        self._constant.add(index)

    def set_scale_constant(self, index: int) -> None:
        """Freeze only the scale of a pose (e.g. anchor the metric scale
        at a keyframe whose depth is known)."""
        if index not in self._poses:
            raise KeyError(f"pose {index} not registered")
        self._fix_scale.add(index)

    def set_constraint(
        self,
        reference_index: int,
        query_index: int,
        relative_pose: Pose,
        relative_scale: float = 1.0,
        sqrt_info=None,
    ) -> None:
        """Sim(3) edge: SE(3) measurement + relative scale s_j/s_i
        (1.0 = an ordinary rigid odometry edge). ``sqrt_info``: scalar,
        (3,) = (trans, rot, scale), or (7,) diagonal."""
        if reference_index not in self._poses or query_index not in self._poses:
            raise KeyError("constraint endpoints must be registered poses")
        if reference_index == query_index:
            raise ValueError("self-constraint is not allowed")
        if relative_scale <= 0.0:
            raise ValueError(f"relative_scale must be positive, got {relative_scale}")
        w = None
        if sqrt_info is not None:
            a = np.asarray(sqrt_info, np.float64).reshape(-1)
            if a.size == 1:
                w = np.full(7, a[0])
            elif a.size == 3:
                w = np.concatenate([np.full(3, a[0]), np.full(3, a[1]), [a[2]]])
            elif a.size == 7:
                w = a.copy()
            else:
                raise ValueError(
                    f"sqrt_info must be scalar/(3,)/(7,), got {a.size}"
                )
        self._constraints.append(
            dict(
                reference_index=reference_index,
                query_index=query_index,
                rel_t=relative_pose.translation.copy(),
                rel_q=relative_pose.quaternion(),
                rel_log_s=float(np.log(relative_scale)),
                sqrt_info=w,
            )
        )

    def get_pose(self, index: int) -> Pose:
        x = self._poses[index]
        q = x[3:7] / np.linalg.norm(x[3:7])
        return Pose(np_quat_to_rotmat(q), x[:3].copy())

    def get_scale(self, index: int) -> float:
        return float(np.exp(self._poses[index][7]))

    @property
    def num_poses(self) -> int:
        return len(self._poses)

    # -- initialization -------------------------------------------------
    def initialize(self, method: str = "chordal", cg_iterations: int = 300) -> None:
        """Sim(3) chordal initialization (the scale-aware analog of
        PoseGraphOptimizer.initialize — LM only converges to the basin
        it starts in, and a dead-reckoned monocular spiral leaves it
        well below sphere scale: measured, a 200-keyframe chain with
        2%/edge drift diverges from the scale=1 init but converges from
        this one). Three exactly-solvable stages:

        1. **log-scales** — the edge model is ls_q - ls_ref = log s_rel,
           LINEAR in ls: solved exactly by the anchored graph Laplacian
           (scale drift is a potential flow on the graph; Strasdat
           RSS'10's observation);
        2. **rotations** — the SE(3) chordal relaxation unchanged
           (scales do not enter the rotation equations);
        3. **translations** — the translation Laplacian with
           scale-corrected edge vectors p_q - p_ref = s_ref R_ref t_rel
           (graph_init.chordal_init with rel_t pre-multiplied by the
           stage-1 s_ref).
        """
        if method != "chordal":
            raise ValueError(f"unknown init method {method!r} (chordal)")
        if not self._constraints:
            raise ValueError("initialize: no constraints registered")
        from scipy.sparse import lil_matrix
        from scipy.sparse.linalg import spsolve

        from .graph_init import chordal_init

        ids = sorted(self._poses)
        of = {pi: i for i, pi in enumerate(ids)}
        P, E = len(ids), len(self._constraints)
        ref = np.array([of[c["reference_index"]] for c in self._constraints])
        qry = np.array([of[c["query_index"]] for c in self._constraints])
        rel_q = np.stack([c["rel_q"] for c in self._constraints])
        rel_t = np.stack([c["rel_t"] for c in self._constraints])
        rel_ls = np.array([c["rel_log_s"] for c in self._constraints])

        anchor_ids = sorted(self._constant) or [ids[0]]
        # stage 1: log-scales (anchored at fully-fixed and scale-fixed poses)
        ls_fixed = {
            of[pi]: self._poses[pi][7]
            for pi in set(anchor_ids) | self._fix_scale
        }
        free = np.array([i not in ls_fixed for i in range(P)])
        nf = int(free.sum())
        if nf:
            col = -np.ones(P, np.int64)
            col[free] = np.arange(nf)
            L = lil_matrix((nf, nf))
            b = np.zeros(nf)
            ls_anchor = np.zeros(P)
            for i, v in ls_fixed.items():
                ls_anchor[i] = v
            for e in range(E):
                i, j, m = int(ref[e]), int(qry[e]), rel_ls[e]
                # residual ls_j - ls_i - m; normal equations
                for (a, sa) in ((j, 1.0), (i, -1.0)):
                    if not free[a]:
                        continue
                    ca = col[a]
                    L[ca, ca] += 1.0
                    b[ca] += sa * m
                    for (bb, sb) in ((j, 1.0), (i, -1.0)):
                        if bb == a:
                            continue
                        if free[bb]:
                            L[ca, col[bb]] += sa * sb
                        else:
                            b[ca] -= sa * sb * ls_anchor[bb]
            ls = ls_anchor.copy()
            ls[free] = spsolve(L.tocsr(), b)
        else:
            ls = np.array([ls_fixed[i] for i in range(P)])

        # stages 2+3: chordal rotations, then the translation Laplacian
        # with scale-corrected edge vectors
        anchors = {
            of[pi]: (
                np_quat_to_rotmat(
                    self._poses[pi][3:7]
                    / np.linalg.norm(self._poses[pi][3:7])
                ),
                self._poses[pi][:3].copy(),
            )
            for pi in anchor_ids
        }
        rel_t_scaled = rel_t * np.exp(ls[ref])[:, None]
        pos, quat = chordal_init(
            ref, qry, rel_q, rel_t_scaled, P, anchors,
            cg_iterations=cg_iterations,
        )
        for i, pi in enumerate(ids):
            self._poses[pi] = np.concatenate([pos[i], quat[i], [ls[i]]])

    # -- solve ---------------------------------------------------------
    def solve(self, options: Optional[Options] = None, polish: str = "auto"):
        """Solve the graph: device bulk solve + host f64 polish.

        Round-5 convergence diagnosis on the 200-kf / 52x-drift
        essential graph (scipy TRF oracle: cost 1.5800e-2 in 35 evals):

        - the reference lambda clamp [1e-6, 1e-2] (an SE(3)-parity
          quirk, options.h:24-27) STALLS Sim(3) LM: multiplicative
          damping adds min_lambda*diag(H), the Sim(3) normal matrix's
          translation diagonals carry exp(2*drift) ~ e^8, and the 1e-6
          floor swamps the soft loop-error-distribution mode — 127
          iterations of geometric creep to 1.5838e-2. At f64 a 1e-10
          floor with a 0.25 decrease factor reaches 1.58005e-2 in ~18.
        - an f32 DEVICE solve cannot take those low-damping steps (the
          f32 Cholesky noise exceeds the soft-mode curvature; Jacobi
          equilibration in solve_linear helps conditioning but measured
          f32 still stalls ~1.66e-2), while an f64 solve of the
          f32-assembled system does descend to ~1.581e-2 — the limit is
          the solve precision, not the evaluation.

        Hence ``polish``: after the device solve, a handful of f64 LM
        iterations run ON THE HOST CPU (the problem is small dense —
        (8P)^2 — exactly the shape a host polishes faster than an
        emulated-f64 TPU pass) under a scoped x64 context. "auto" (the
        default) polishes when the device stage ran below f64;
        "always"/"never" force it. Benchmark effect: 407 ms / 127
        iters / 1.5838e-2 -> ~16+10 iters to 1.58005e-2.

        Explicit ``options`` apply to the device stage unchanged
        (reference clamps included); the polish stage always uses the
        low-floor schedule, which is what makes it a polish."""
        if polish not in ("auto", "always", "never"):
            raise ValueError(f"unknown polish mode {polish!r}")
        if options is None:
            from ..core.options import ConvergenceHandle, OptimizationHandle

            # beyond-reference defaults: low-floor fast-decrease damping
            # (see diagnosis above) + a relative plateau stop — the
            # reference's absolute tolerances cannot fire at f32 noise
            # scale and a fixed 200-iteration burn helps nobody
            options = Options().replace(
                max_iterations=200,
                optimization_handle=OptimizationHandle(
                    min_lambda=1e-10,
                    initial_lambda=1e-3,
                    lambda_decrease_factor=0.25,
                ),
                convergence_handle=ConvergenceHandle(
                    relative_function_tolerance=1e-7
                ),
            )
        if not self._constraints:
            raise ValueError("Sim3GraphOptimizer.solve: no constraints registered")
        ids = sorted(self._poses)
        of = {pi: i for i, pi in enumerate(ids)}
        P = len(ids)
        E = len(self._constraints)
        dtype = self.dtype
        x0 = np.stack([self._poses[pi] for pi in ids])

        w_rows = [c["sqrt_info"] for c in self._constraints]
        edges = Sim3Edges(
            jnp.asarray(np.array([of[c["reference_index"]] for c in self._constraints], np.int32)),
            jnp.asarray(np.array([of[c["query_index"]] for c in self._constraints], np.int32)),
            jnp.asarray(np.stack([c["rel_t"] for c in self._constraints]), dtype),
            jnp.asarray(np.stack([c["rel_q"] for c in self._constraints]), dtype),
            jnp.asarray(np.array([c["rel_log_s"] for c in self._constraints]), dtype),
            jnp.ones((E,), dtype),
            sqrt_info=(
                jnp.asarray(
                    np.stack([w if w is not None else np.ones(7) for w in w_rows]),
                    dtype,
                )
                if any(w is not None for w in w_rows)
                else None
            ),
        )
        free = np.ones(P)
        for pi in self._constant:
            free[of[pi]] = 0.0
        scale_free = np.ones(P)
        for pi in self._fix_scale:
            scale_free[of[pi]] = 0.0

        solver = self.solver
        if solver == "auto":
            solver = "sparse" if P > self.sparse_threshold else "dense"
        self.last_solver_choice = solver
        if solver == "sparse":
            plan, acc = self._sparse_symbolic(x0)
            x, summary = _sim3_solve_sparse(
                jnp.asarray(x0, dtype), edges, jnp.asarray(free, dtype),
                jnp.asarray(scale_free, dtype), self.edge_loss, P, plan,
                options, jnp.asarray(acc),
            )
        else:
            x, summary = _sim3_solve(
                jnp.asarray(x0, dtype), edges, jnp.asarray(free, dtype),
                jnp.asarray(scale_free, dtype), self.edge_loss, P, options,
            )
        x, summary = jax.device_get((x, summary))
        # the fetched result carries the EXECUTED dtype (f64 silently
        # truncates to f32 when x64 is off) — no extra device probe
        ran_f64 = np.asarray(x).dtype == np.float64
        x = np.array(x, np.float64)

        if polish == "always" or (polish == "auto" and not ran_f64):
            x, summary = self._polish_f64(x, summary, of, P, solver)

        x[:, 3:7] /= np.linalg.norm(x[:, 3:7], axis=1, keepdims=True)
        for i, pi in enumerate(ids):
            self._poses[pi] = x[i]
        return summary

    def _sparse_symbolic(self, x0):
        """Cached (plan, accumulate_rounds) for the d=8 dissection over
        the essential graph's edges, keyed on topology."""
        from . import multifrontal

        ids = sorted(self._poses)
        of = {pi: i for i, pi in enumerate(ids)}
        P = len(ids)
        ref = np.array([of[c["reference_index"]] for c in self._constraints],
                       np.int64)
        qry = np.array([of[c["query_index"]] for c in self._constraints],
                       np.int64)
        key = (P, len(ref), ref.tobytes(), qry.tobytes())
        if self._sparse_plan is not None and self._sparse_plan[0] == key:
            return self._sparse_plan[1]
        plan = multifrontal.symbolic(
            P, ref, qry, d=8, coords=np.asarray(x0[:, :3], np.float64),
            leaf_size=16,
        )
        acc = multifrontal.accumulate_rounds(P, ref, qry)
        self._sparse_plan = (key, (plan, acc))
        return plan, acc

    def _polish_f64(self, x_np, summary, of, P, solver="dense"):
        """Host-CPU f64 polish stage (see solve): the canonical LM loop
        on the same residual stack, f64 under a scoped x64 context, on
        the cpu backend, from the device stage's state, with the
        low-floor schedule the f32 device stage cannot exploit. Uses
        the same linear-solver family as the device stage (sparse
        graphs keep their multifrontal solve — a dense (8P)^2 polish
        would defeat the point at scale)."""
        import dataclasses as _dc

        from ..core.options import ConvergenceHandle, OptimizationHandle

        E = len(self._constraints)
        w_rows = [c["sqrt_info"] for c in self._constraints]
        cpu = jax.devices("cpu")[0]
        popts = Options().replace(
            max_iterations=20,
            optimization_handle=OptimizationHandle(
                min_lambda=1e-12,
                initial_lambda=1e-7,
                lambda_decrease_factor=0.1,
            ),
            convergence_handle=ConvergenceHandle(
                relative_function_tolerance=1e-8
            ),
        )
        try:
            _enable_x64 = jax.enable_x64  # JAX >= 0.9
        except AttributeError:  # pragma: no cover
            _enable_x64 = jax.experimental.enable_x64
        with _enable_x64(True), jax.default_device(cpu):
            f64 = jnp.float64
            edges = Sim3Edges(
                jnp.asarray(np.array([of[c["reference_index"]] for c in self._constraints], np.int32)),
                jnp.asarray(np.array([of[c["query_index"]] for c in self._constraints], np.int32)),
                jnp.asarray(np.stack([c["rel_t"] for c in self._constraints]), f64),
                jnp.asarray(np.stack([c["rel_q"] for c in self._constraints]), f64),
                jnp.asarray(np.array([c["rel_log_s"] for c in self._constraints]), f64),
                jnp.ones((E,), f64),
                sqrt_info=(
                    jnp.asarray(
                        np.stack([w if w is not None else np.ones(7) for w in w_rows]), f64
                    )
                    if any(w is not None for w in w_rows)
                    else None
                ),
            )
            free = np.ones(P)
            for pi in self._constant:
                free[of[pi]] = 0.0
            scale_free = np.ones(P)
            for pi in self._fix_scale:
                scale_free[of[pi]] = 0.0
            if solver == "sparse":
                plan, acc = self._sparse_symbolic(x_np)
                xp, psummary = _sim3_solve_sparse(
                    jnp.asarray(x_np, f64), edges, jnp.asarray(free, f64),
                    jnp.asarray(scale_free, f64), self.edge_loss, P, plan,
                    popts, jnp.asarray(acc),
                )
            else:
                xp, psummary = _sim3_solve(
                    jnp.asarray(x_np, f64), edges, jnp.asarray(free, f64),
                    jnp.asarray(scale_free, f64), self.edge_loss, P, popts,
                )
            xp = np.array(jax.device_get(xp), np.float64)
            # combined reporting: polish cost/state, total iteration
            # count across both stages (records stay the polish stage's)
            psummary = psummary._replace(
                iterations=psummary.iterations + int(summary.iterations)
            )
        return xp, psummary
