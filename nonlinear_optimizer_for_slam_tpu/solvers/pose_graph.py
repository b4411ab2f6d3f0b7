"""SE(3) pose-graph optimizer: batched relative-pose GN/LM on TPU.

Implements what the reference's analytic pose-graph path left as a TODO
stub ("Make sparse Hessian... Solve normal equation... Update poses",
pose_graph_optimizer_analytic.cc:12-51), with the reference's CERES
semantics reproduced deliberately (pose_graph_optimizer_ceres.cc:15-69):

- poses parameterized in AMBIENT coordinates: position (3,) + quaternion
  (4,) with NO manifold/local-parameterization — the quaternion drifts off
  the unit sphere during the solve and is renormalized only on write-back
  (pose_graph_optimizer.h:89-101);
- loop-closure edges get a switchable constraint: the 6-D residual scaled
  by a free switch variable s plus a penalty row (1 - s) * 1e-9, residual
  dim 7 (ceres_cost_functor.h:83-97);
- gauge freedom fixed by marking poses constant
  (SetPoseConstant / SetParameterBlockConstant).

TPU design: all E edges evaluate in one `vmap` (residuals + 7x7 Jacobian
blocks via forward-mode autodiff of the quaternion algebra), the global
Jacobian is assembled by one-hot scatter into (E * 7, 7P + L) and the
normal equations form as ONE MXU matmul — the "batched 6x6-block sparse
GN over edges" SURVEY section 2.5 calls for, realized dense because the
reference's own fixture is 80 poses (564 parameters; dense Cholesky is
faster than sparse bookkeeping at this size and up to a few thousand
poses). The LM driver is the same solvers.lm policy loop as every other
module, so the whole solve is a single XLA program.

API mirrors the reference base class (pose_graph_optimizer.h:21-108).
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
from ..ops.relative_pose import (
    PoseGraphEdges,
    _normalize_jacobian,
    _quat_left_matrix,
    apply_sqrt_info,
    edge_residuals_and_jacobians,
    np_quat_conjugate as _np_conj_quat,
    np_quat_left_matrix as _np_left_quat,
    stack_sqrt_info,
)
from . import lm

Array = jax.Array


class ConstraintType:
    """Reference: pose_graph_optimizer/types.h:11-13."""

    ODOMETRY = 0
    LOOP = 1


def _expand_sqrt_info_2d(sqrt_info) -> "Optional[np.ndarray]":
    """(3,) = [x y theta] or full (3, 3) from None | scalar | (2,)
    (trans, rot) | (3,) | (3, 3) matrix."""
    if sqrt_info is None:
        return None
    a = np.asarray(sqrt_info, np.float64)
    if a.ndim == 2:
        if a.shape != (3, 3):
            raise ValueError(f"matrix sqrt_info must be (3, 3); got {a.shape}")
        return a.copy()
    w = a.reshape(-1)
    if w.size == 1:
        return np.full(3, w[0])
    if w.size == 2:
        return np.array([w[0], w[0], w[1]])
    if w.size == 3:
        return w.copy()
    raise ValueError(
        f"sqrt_info must be a scalar, (2,) (translation, rotation), "
        f"(3,) diagonal, or (3, 3) matrix; got shape {np.asarray(sqrt_info).shape}"
    )


def _expand_sqrt_info(sqrt_info) -> Optional[np.ndarray]:
    """Normalize a user sqrt-info spec to a (6,) f64 vector, a (6, 6)
    matrix, or None.

    Accepted: None, scalar, (2,) = (weight_t, weight_rot), (6,) full
    diagonal [x y z rx ry rz], or a full (6, 6) sqrt-information matrix
    S with S^T S = Omega (use :func:`sqrt_info_from_information` to get
    S from a dataset information matrix)."""
    if sqrt_info is None:
        return None
    a = np.asarray(sqrt_info, np.float64)
    if a.ndim == 2:
        if a.shape != (6, 6):
            raise ValueError(f"matrix sqrt_info must be (6, 6); got {a.shape}")
        return a.copy()
    w = a.reshape(-1)
    if w.size == 1:
        return np.full(6, w[0])
    if w.size == 2:
        return np.concatenate([np.full(3, w[0]), np.full(3, w[1])])
    if w.size == 6:
        return w.copy()
    raise ValueError(
        f"sqrt_info must be a scalar, (2,) (translation, rotation), "
        f"(6,) diagonal, or (6, 6) matrix; got shape {np.asarray(sqrt_info).shape}"
    )


def sqrt_info_from_information(information) -> np.ndarray:
    """Sqrt-information S (upper triangular, S^T S = Omega) from a
    symmetric positive-(semi)definite information matrix.

    Datasets (g2o et al.) publish edge INFORMATION matrices; the solver
    whitens residuals with a square root. Cholesky when PD; for
    semidefinite inputs (rank-deficient priors are legal) falls back to
    an eigendecomposition square root with negative eigenvalues clamped
    to zero."""
    omega = np.asarray(information, np.float64)
    omega = 0.5 * (omega + omega.T)
    try:
        return np.linalg.cholesky(omega).T
    except np.linalg.LinAlgError:
        lam, V = np.linalg.eigh(omega)
        lam = np.clip(lam, 0.0, None)
        return (V * np.sqrt(lam)) @ V.T


def edge_information_to_world(information, reference_rotation) -> np.ndarray:
    """Conjugate a measurement-frame edge information matrix into this
    framework's world-frame translation-residual convention.

    A registration against a reference keyframe measures T_{ref<-query};
    its Gauss-Newton information (``MahalanobisDistanceMinimizer
    .information`` / ``NdtRegistrar.information``) lives in that
    measurement's right tangent: translation perturbations are vectors in
    the REFERENCE-keyframe frame. The pose-graph edge residual here (and
    in the reference functor, pose_graph ceres_cost_functor.h:44-52) is
    ``r_t = (p_q - p_r) - R_ref t_rel`` — the same error expressed in the
    WORLD frame. Whitening that residual with the raw measurement-frame
    Omega misrotates anisotropic axes by the keyframe's world rotation
    (a corridor-degenerate soft axis would soften the wrong world
    direction); the frame-consistent edge information is

        Omega_world = blkdiag(R_ref, I) Omega blkdiag(R_ref, I)^T.

    Only the translation and cross blocks rotate: the rotation-residual
    rows ``2 vec(q_q* q_r q_rel)`` respond to right-tangent perturbations
    of q_rel exactly like the registration's own rotation tangent, so
    that block is already frame-consistent. ``reference_rotation`` is the
    reference pose's current world-rotation ESTIMATE at edge-build time;
    the residual relinearizes while this whitener stays constant — the
    standard constant-information approximation, second-order in the
    estimate's rotation error.
    """
    R = np.asarray(reference_rotation, np.float64)
    if R.shape != (3, 3):
        raise ValueError(f"reference_rotation must be (3, 3); got {R.shape}")
    B = np.eye(6)
    B[:3, :3] = R
    omega = np.asarray(information, np.float64)
    return B @ omega @ B.T


@functools.partial(jax.jit, static_argnums=(7, 8, 9))
def _pose_graph_solve(
    positions0,  # (P, 3)
    quaternions0,  # (P, 4)
    switches0,  # (L,) or (0,)
    edges: PoseGraphEdges,
    free_mask,  # (P,) 1.0 = free pose, 0.0 = constant (gauge-fixed)
    switch_penalty,  # scalar penalty weight on (1 - s)
    edge_loss,  # Optional[LossFunction] robustifying each 7-row edge block
    num_poses: int,
    num_loops: int,
    options: Options,
    prior_sqrt=None,  # (6B, 6B) sqrt-information over TANGENT coords
    prior_mean=None,  # (B, 7) prior linearization point [p_lin, q_lin(unit)]
    prior_sel=None,  # (B,) int32 pose indices the prior couples
    prior_offset=None,  # (6B,) residual offset c: r_p = S dphi(x) + c
):
    """Dense direct path: segment-sum BLOCK assembly of the (7P+L)^2
    normal matrix. Each edge contributes four 7x7 pose blocks and (for
    loops) a switch row/column, scatter-added at its block coordinates —
    O(E * 49) work and O(dim^2) memory, with none of the O(E*P) one-hot
    selector tensors the round-1 implementation materialized.

    Parameter layout: [pose_0 (3 pos + 4 quat), ..., pose_{P-1} | switches]
    (pose-interleaved, so an edge's columns are two contiguous 7-spans).

    ``edge_loss`` (e.g. core.losses.HuberLoss) applies Ceres-style
    per-residual-block robustification over the edge's squared norm —
    the reference has none (Ceres supports it; the functors never set
    one), this framework makes it first-class."""
    P = num_poses
    L = num_loops
    dim = 7 * P + L
    dtype = positions0.dtype
    E = edges.num_edges
    ref_i = edges.reference_indices
    qry_i = edges.query_indices

    if L > 0:
        loop_slot = jnp.cumsum(edges.is_loop.astype(jnp.int32)) - 1  # (E,)
        loop_slot = jnp.clip(loop_slot, 0, L - 1)
    else:
        loop_slot = jnp.zeros((E,), jnp.int32)

    free_ref = free_mask[ref_i]
    free_qry = free_mask[qry_i]

    # parameter layout: pose-interleaved, then switches
    col_mask = jnp.concatenate(
        [jnp.repeat(free_mask, 7), jnp.ones((L,), dtype)]
    )  # (dim,)
    sevens = jnp.arange(7, dtype=jnp.int32)
    rows_ref = 7 * ref_i[:, None] + sevens[None, :]  # (E, 7)
    rows_qry = 7 * qry_i[:, None] + sevens[None, :]
    col_sw = 7 * P + loop_slot  # (E,)

    def unflatten(x):
        pose = x[: 7 * P].reshape(P, 7)
        return pose[:, :3], pose[:, 3:], x[7 * P :]

    def quad(x):
        pos, quat, sw = unflatten(x)
        sw_full = sw[loop_slot] if L > 0 else jnp.zeros((E,), dtype)
        r, J_ref, J_query, J_s = edge_residuals_and_jacobians(
            pos, quat, sw_full, edges, switch_penalty
        )  # (E,7), (E,7,7), (E,7,7), (E,7)
        # gauge fixing: fixed poses contribute no derivative columns
        J_ref = J_ref * free_ref[:, None, None]
        J_query = J_query * free_qry[:, None, None]

        if edge_loss is not None:
            sq = jnp.sum(r * r, axis=1)  # (E,)
            rho, w, _ = edge_loss.evaluate(sq)
            cost = jnp.sum(rho)
            sqrt_w = jnp.sqrt(w)
            r = r * sqrt_w[:, None]
            J_ref = J_ref * sqrt_w[:, None, None]
            J_query = J_query * sqrt_w[:, None, None]
            J_s = J_s * sqrt_w[:, None]
        else:
            cost = jnp.sum(r * r)

        with jax.default_matmul_precision("highest"):
            B_rr = jnp.einsum("edi,edj->eij", J_ref, J_ref)
            B_rq = jnp.einsum("edi,edj->eij", J_ref, J_query)
            B_qq = jnp.einsum("edi,edj->eij", J_query, J_query)
            g_r = jnp.einsum("edi,ed->ei", J_ref, r)
            g_q = jnp.einsum("edi,ed->ei", J_query, r)

        H = jnp.zeros((dim, dim), dtype)
        H = H.at[rows_ref[:, :, None], rows_ref[:, None, :]].add(B_rr)
        H = H.at[rows_ref[:, :, None], rows_qry[:, None, :]].add(B_rq)
        H = H.at[rows_qry[:, :, None], rows_ref[:, None, :]].add(
            jnp.swapaxes(B_rq, 1, 2)
        )
        H = H.at[rows_qry[:, :, None], rows_qry[:, None, :]].add(B_qq)
        g = jnp.zeros((dim,), dtype)
        g = g.at[rows_ref].add(g_r).at[rows_qry].add(g_q)

        if L > 0:
            b_rs = jnp.einsum("edi,ed->ei", J_ref, J_s)  # (E, 7)
            b_qs = jnp.einsum("edi,ed->ei", J_query, J_s)
            H = H.at[rows_ref, col_sw[:, None]].add(b_rs)
            H = H.at[col_sw[:, None], rows_ref].add(b_rs)
            H = H.at[rows_qry, col_sw[:, None]].add(b_qs)
            H = H.at[col_sw[:, None], rows_qry].add(b_qs)
            H = H.at[col_sw, col_sw].add(jnp.sum(J_s * J_s, axis=1))
            g = g.at[col_sw].add(jnp.sum(J_s * r, axis=1))

        if prior_sqrt is not None:
            # Gaussian prior in TANGENT (6-DoF local) coordinates:
            #   r_p(x) = S dphi(x) + c,
            #   dphi_i = [p_i - p_lin_i ; 2 vec(q_lin_i^-1 (x) n(q_i))]
            # (the fixed-lag smoother's marginalization product,
            # solvers/fixed_lag.py). Two deliberate choices:
            # - tangent, not raw-ambient: a raw 7-dim quadratic in q has
            #   exact quaternion-scale nulls plus curvature from the
            #   normalization nonlinearity; with an accumulated marginal
            #   S that combination made LM wander along a steep curved
            #   valley (finite steps, no cost change) and the window
            #   random-walked away on realistic-noise fixtures;
            # - affine offset c, not a mean shift -Lambda^+ g: c =
            #   V w^{-1/2} V^T g is bounded by the absorbed residual
            #   norm (Cauchy-Schwarz), while a 1/w mean form catapults
            #   the prior minimum along near-null eigendirections.
            rows = (
                7 * prior_sel[:, None] + jnp.arange(7, dtype=jnp.int32)[None, :]
            ).reshape(-1)
            B = prior_sel.shape[0]
            pb = pos[prior_sel]  # (B, 3)
            qb = quat[prior_sel]  # (B, 4)
            p_lin = prior_mean[:, :3]
            q_lin = prior_mean[:, 3:]
            nq = lie.quat_normalize(qb)
            A = lie.quat_multiply(lie.quat_conjugate(q_lin), nq)  # (B, 4)
            dphi = jnp.concatenate([pb - p_lin, 2.0 * A[:, 1:]], axis=1)
            r_p = prior_sqrt @ dphi.reshape(-1) + prior_offset
            # d dphi / d(ambient x): translation rows are identity;
            # rotation rows are 2 [L(q_lin^-1) Dn(q)]_{vec} (3x4 / pose)
            dq = 2.0 * (
                _quat_left_matrix(lie.quat_conjugate(q_lin))
                @ _normalize_jacobian(qb)
            )[:, 1:, :]  # (B, 3, 4)
            T = jnp.zeros((6 * B, 7 * B), dtype)
            for i in range(B):  # B is static and small (prior support)
                T = T.at[6 * i : 6 * i + 3, 7 * i : 7 * i + 3].set(
                    jnp.eye(3, dtype=dtype)
                )
                T = T.at[6 * i + 3 : 6 * i + 6, 7 * i + 3 : 7 * i + 7].set(
                    dq[i]
                )
            J_p = prior_sqrt @ T  # (6B, 7B)
            cost = cost + jnp.sum(r_p * r_p)
            g = g.at[rows].add(J_p.T @ r_p)
            H = H.at[rows[:, None], rows[None, :]].add(J_p.T @ J_p)

        # keep H nonsingular on fixed-pose rows (delta stays 0 there since
        # g is 0 and the row/col is identity)
        H = H + jnp.diag(1.0 - col_mask)
        # Tikhonov floor: at an all-identity-quaternion state the residual
        # derivative w.r.t. every quaternion w-component is exactly zero
        # (whole H rows vanish), so the multiplicatively-damped system is
        # singular. Ceres survives the same structure by clamping its
        # damping diagonal to min_diagonal = 1e-6
        # (ceres TrustRegionMinimizer); this floor is the equivalent.
        H = H + 1e-8 * jnp.eye(dim, dtype=dtype)
        return H, g, cost

    def retract(x, delta):
        # ambient update (the Ceres-without-manifold behavior)
        return x + delta * col_mask

    pose0 = jnp.concatenate([positions0, quaternions0], axis=1).reshape(-1)
    x0 = jnp.concatenate([pose0, switches0])
    x, summary = lm.solve(quad, retract, x0, options)
    pos, quat, sw = unflatten(x)
    return pos, quat, sw, summary


@functools.partial(jax.jit, static_argnums=(7, 8, 9))
def _pose_graph_solve_batch(
    positions0,  # (B, P, 3)
    quaternions0,  # (B, P, 4)
    switches0,  # (B, L)
    edges: PoseGraphEdges,  # measurements (B, E, 3)/(B, E, 4); rest shared
    free_mask,
    switch_penalty,
    edge_loss,
    num_poses: int,
    num_loops: int,
    options: Options,
    prior_sqrt=None,
    prior_mean=None,
    prior_sel=None,
    prior_offset=None,
):
    """B independent instances of one graph TOPOLOGY in ONE device
    program: vmap of the dense direct path (the pose-graph analog of the
    serving-mode batched solvers, solvers/batched.py). Topology (edge
    indices, loop flags, sqrt-information, gauge fixing, priors) is
    shared; initial states, switch states, and edge MEASUREMENTS are
    per-instance. Each instance keeps its own lambda / convergence state
    inside the vmapped while_loop, so per-instance trajectories match
    individual solves.

    The reference has no batched counterpart (one Ceres problem per
    Solve); on this runtime B solves in one dispatch amortize the fixed
    per-dispatch quantum, and on any TPU they fill the chip that one
    80-pose system cannot."""

    def one(pos0, quat0, sw0, rel_t, rel_q):
        e = edges._replace(
            relative_translations=rel_t, relative_quaternions=rel_q
        )
        return _pose_graph_solve(
            pos0,
            quat0,
            sw0,
            e,
            free_mask,
            switch_penalty,
            edge_loss,
            num_poses,
            num_loops,
            options,
            prior_sqrt,
            prior_mean,
            prior_sel,
            prior_offset,
        )

    return jax.vmap(one)(
        positions0,
        quaternions0,
        switches0,
        edges.relative_translations,
        edges.relative_quaternions,
    )


def _block_tridiag_selected_inverse(
    K: int, m: int, D: "np.ndarray", O: "np.ndarray"
) -> "List[np.ndarray]":
    """Diagonal superblocks of the inverse of a block-tridiagonal SPD
    matrix (D (K, m, m) diagonal panels, O (K-1, m, m) upper couplings)
    by the exact selected-inverse recurrence:

        Lam_1 = D_1,  Lam_k = D_k - O_{k-1}^T Lam_{k-1}^{-1} O_{k-1}
        Sig_K = Lam_K^{-1},  Sig_k = Lam_k^{-1} + G_k Sig_{k+1} G_k^T
        with G_k = Lam_k^{-1} O_k.

    O(K m^3) host f64 — the covariance engine shared by the 3D and
    SE(2) banded marginal paths."""
    Lam_inv = [None] * K
    Lam = D[0]
    Lam_inv[0] = np.linalg.inv(Lam)
    for k in range(1, K):
        Lam = D[k] - O[k - 1].T @ Lam_inv[k - 1] @ O[k - 1]
        Lam_inv[k] = np.linalg.inv(Lam)
    sig = [None] * K
    sig[K - 1] = Lam_inv[K - 1]
    for k in range(K - 2, -1, -1):
        G = Lam_inv[k] @ O[k]
        sig[k] = Lam_inv[k] + G @ sig[k + 1] @ G.T
    return sig


def _scatter_banded_blocks(
    P: int, d: int, s: int, lo, hi, B_ll, B_hh, B_hl, diag_fix
):
    """Assemble permuted-order edge blocks into superblock tridiagonal
    (D, O) panels (host numpy; the covariance-side twin of the device
    solvers' panel scatter). ``diag_fix`` is a (P,) per-pose scalar
    added to the diagonal (gauge identity); padding slots get 1.0."""
    K = max(1, -(-P // s))
    m = s * d
    D = np.zeros((K, m, m))
    O = np.zeros((max(K - 1, 1), m, m))
    k_lo, r_lo = lo // s, lo % s
    k_hi, r_hi = hi // s, hi % s
    same = k_lo == k_hi
    rng = np.arange(d)
    rows_lo = (r_lo[:, None] * d + rng).astype(np.int64)
    rows_hi = (r_hi[:, None] * d + rng).astype(np.int64)
    kl = k_lo[:, None, None]
    kh = k_hi[:, None, None]
    np.add.at(D, (kl, rows_lo[:, :, None], rows_lo[:, None, :]), B_ll)
    np.add.at(D, (kh, rows_hi[:, :, None], rows_hi[:, None, :]), B_hh)
    B_hl_m = np.where(same[:, None, None], B_hl, 0.0)
    np.add.at(D, (kl, rows_hi[:, :, None], rows_lo[:, None, :]), B_hl_m)
    np.add.at(
        D, (kl, rows_lo[:, :, None], rows_hi[:, None, :]),
        np.swapaxes(B_hl_m, 1, 2),
    )
    if K > 1:
        cross = np.where(same[:, None, None], 0.0, np.swapaxes(B_hl, 1, 2))
        k_off = np.minimum(k_lo, K - 2)[:, None, None]
        np.add.at(O, (k_off, rows_lo[:, :, None], rows_hi[:, None, :]), cross)
    dvec = np.ones(K * s)
    dvec[:P] = diag_fix
    dvec = np.repeat(dvec, d)
    for k in range(K):
        np.fill_diagonal(D[k], D[k].diagonal() + dvec[k * m:(k + 1) * m])
    return K, m, D, O


def _np_edge_information_blocks(J_ref, J_qry, J_s):
    """Per-edge pose information blocks with EXACT per-edge switch
    elimination (the rank-1 Schur downdate — shared by every host
    covariance path; the device solvers carry the same algebra in their
    jitted solve_linear bodies).

    Returns (B_aa, B_bb, B_ab) in (ref, query) row/col convention."""
    B_aa = np.einsum("edi,edj->eij", J_ref, J_ref)
    B_bb = np.einsum("edi,edj->eij", J_qry, J_qry)
    B_ab = np.einsum("edi,edj->eij", J_ref, J_qry)
    gamma = np.sum(J_s * J_s, axis=1)
    inv_gamma = np.where(gamma > 0, 1.0 / np.where(gamma > 0, gamma, 1.0), 0.0)
    Jac = np.einsum("edi,ed->ei", J_ref, J_s)
    Jbc = np.einsum("edi,ed->ei", J_qry, J_s)
    B_aa = B_aa - inv_gamma[:, None, None] * (Jac[:, :, None] * Jac[:, None, :])
    B_bb = B_bb - inv_gamma[:, None, None] * (Jbc[:, :, None] * Jbc[:, None, :])
    B_ab = B_ab - inv_gamma[:, None, None] * (Jac[:, :, None] * Jbc[:, None, :])
    return B_aa, B_bb, B_ab


def _rcm_perm_bandwidth(P: int, ref_idx, query_idx):
    """Reverse Cuthill-McKee ordering of the pose graph and the block
    bandwidth it achieves (host, ~ms at 50k poses). The one shared
    implementation behind solver selection, the banded solvers' symbolic
    phases, and the banded covariance paths.

    Returns (perm, inv, bandwidth)."""
    from scipy.sparse import coo_matrix
    from scipy.sparse.csgraph import reverse_cuthill_mckee

    if len(ref_idx) == 0:
        return np.arange(P), np.arange(P), 1
    A = coo_matrix(
        (
            np.ones(len(ref_idx)),
            (np.asarray(ref_idx, np.int64), np.asarray(query_idx, np.int64)),
        ),
        shape=(P, P),
    )
    A = (A + A.T).tocsr()
    perm = np.asarray(reverse_cuthill_mckee(A, symmetric_mode=True))
    inv = np.empty(P, np.int64)
    inv[perm] = np.arange(P)
    bw = max(1, int(np.abs(inv[ref_idx] - inv[query_idx]).max()))
    return perm, inv, bw


def _rcm_bandwidth(P: int, ref_idx, query_idx) -> int:
    return _rcm_perm_bandwidth(P, ref_idx, query_idx)[2]


def select_solver(
    P: int,
    ref_idx,
    query_idx,
    is_loop,
    d: int,
    plan_fn=None,
    allow_tridiag: bool = True,
    bandwidth: Optional[int] = None,
) -> Tuple[str, dict]:
    """Pick a linear-solver family from the graph's topology (the
    'auto' policy; round-3 verdict: users should not need to know their
    graph's structure to avoid a 10x loss either way).

    Decision tree:
      1. small graphs -> 'dense' (the (dP+L)^2 materialization wins
         below ~6k scalar vars);
      2. chains with <= 100 non-chain edges -> 'tridiag' (its Woodbury
         correction grows with them);
      3. 'banded' when its superblock flops are small outright
         (<= 5e9: the sparse path's lower fixed cost can then never
         recoup its levels/assembly overhead, so the plan is never
         built — selection stays host-cheap on easy graphs);
      4. else build the nested-dissection plan and compare CALIBRATED
         per-iteration time models (round 5 — the round-4 flops-only
         4x comparison had no fixed-cost terms and could pick a
         measured loser at mid-scale crossovers):

             t_banded ~ 14 + 1.6e-3 E + banded_flops / 1e9    [ms]
             t_sparse ~ 10 + 1.6e-3 E + sparse_flops / 1.5e8

         Constants fitted on same-day single-chip measurements
         (2026-08-20, f32, warm programs; per-LM-iteration solve time
         incl. the shared quad evaluation — the E term):
         sphere2500 (E=4899, banded 4.55e9 / sparse 1.41e9 flops):
         measured 26.2 / 29.7 ms/iter vs model 26.4 / 27.2;
         manhattan3500 (E=10109, 2.36e10 / 3.35e8): measured
         60.5 / 27.9 vs model 53.8 / 28.4; manhattan10000 (E=28920,
         2.15e11 / 4.31e9): measured 275.2 / 83.3 vs model 275 / 85.
         The banded flop rate (~1e12/s) reflects its few big
         sequential panels; the sparse rate (~1.5e11/s) its many small
         batched fronts. Day-to-day relay variance moves absolute
         times ~2x but moves both families together — the COMPARISON
         is stable; predicted times are logged in ``info``
         (predicted_banded_ms / predicted_sparse_ms).
      'cg' when both direct forms are infeasible (expander-density
      graphs — both symbolic guards trip).

    ``plan_fn()`` lazily builds (and caches) the multifrontal plan;
    it may raise ValueError (the memory guard) to veto 'sparse'.
    Returns (name, info) where info carries the model numbers for
    logging/inspection.
    """
    E = len(ref_idx)
    info: dict = dict(P=P, E=E, d=d)
    if d * P + E <= 6000:
        info["reason"] = "small dense system"
        return "dense", info
    adj = np.abs(
        np.asarray(ref_idx, np.int64) - np.asarray(query_idx, np.int64)
    ) == 1
    n_corr = int(E - np.sum(adj & (np.asarray(is_loop) == 0)))
    info["n_corr"] = n_corr
    if allow_tridiag and n_corr <= 100:
        info["reason"] = "chain + few corrections"
        return "tridiag", info
    b = _rcm_bandwidth(P, ref_idx, query_idx) if bandwidth is None else bandwidth
    s = max(b, 8)
    K = -(-P // s)
    panel_bytes = 2 * K * (s * d) ** 2 * 4
    banded_flops = 2.0 * K * float(s * d) ** 3
    banded_ok = panel_bytes <= 2 << 30
    # calibrated per-iteration time model (see docstring; ms)
    t_edges = 1.6e-3 * E
    t_banded = 14.0 + t_edges + banded_flops / 1e9
    info.update(bandwidth=b, banded_flops=banded_flops,
                banded_panel_bytes=panel_bytes,
                predicted_banded_ms=t_banded)
    if banded_ok and banded_flops <= 5e9:
        info["reason"] = "small superblock flops"
        return "banded", info
    plan = None
    if plan_fn is not None:
        try:
            plan = plan_fn()
        except ValueError as e:  # multifrontal memory guard
            info["sparse_veto"] = str(e)
    if plan is not None:
        st = plan.stats()
        sparse_flops = st["factor_flops"]
        t_sparse = 10.0 + t_edges + sparse_flops / 1.5e8
        info["sparse_flops"] = sparse_flops
        info["predicted_sparse_ms"] = t_sparse
        if banded_ok and t_banded <= t_sparse:
            info["reason"] = "band predicted faster"
            return "banded", info
        info["reason"] = "separators predicted faster"
        return "sparse", info
    if banded_ok:
        info["reason"] = "sparse infeasible, band feasible"
        return "banded", info
    info["reason"] = "both direct forms infeasible"
    return "cg", info


class PoseGraphOptimizer:
    """Mirror of the reference API (pose_graph_optimizer.h:21-108) with a
    real analytic solve."""

    def __init__(
        self,
        dtype=jnp.float64,
        switch_penalty: float = None,
        solver: str = "dense",
        cg_iterations: int = 250,
        cg_precond: str = "chain",
        edge_loss=None,
        mesh=None,
    ):
        """``switch_penalty`` weights the (1 - s) prior row of loop-closure
        switch variables. Default = the reference's 1e-9
        (SWITCH_PENALTY_SCALE) for exact API parity — but that value is
        far too weak to keep INLIER loop switches at 1 (the reference's
        own functor comment admits the scaling problem). RECOMMENDED:
        ``switch_penalty=0.03`` — on the 80-pose reference fixture it is
        the measured discrimination point where inlier loops hold s >= 0.9
        while a planted outlier loop switches off (s < 0.1); see
        tests/test_pose_graph.py::test_outlier_loop_switched_off.

        CALIBRATION RULE (matters when edges are whitened via
        ``set_constraint(..., sqrt_info=...)``): the penalty must exceed
        the expected INLIER loop innovation in the residual's own units —
        chi ~ (pose drift between revisits) / sigma_measurement for
        whitened edges (e.g. drift 0.3 m over 5 mm loops -> chi ~ 60,
        use ~100), or just the metric drift (~0.03) for unwhitened ones.
        Too small switches every loop off; gross outliers sit orders of
        magnitude above either choice.

        ``solver``: "auto" (RECOMMENDED) picks the family from the
        graph's topology at solve() time — size, chain-correction count,
        RCM bandwidth, and (when the band is fat) a nested-dissection
        flops comparison; see :func:`select_solver`. The choice is
        exposed as ``self.last_solver_choice`` / ``self.last_selection``.
        Explicit names override:
        "dense" materializes the (7P+L)^2 normal matrix (best
        up to a few thousand poses); "cg" is the matrix-free Krylov path
        with O(E) memory for large graphs (``cg_iterations`` per LM step;
        ``cg_precond`` "chain" = block-tridiagonal odometry-chain
        preconditioner factored by cyclic reduction, the default —
        "jacobi" = per-pose block diagonal only);
        "tridiag" is the direct cyclic-reduction solver for
        chain-dominated graphs (odometry chain + sparse loop closures) —
        EXACT damped-GN steps at O(E) memory and O(log P) depth, the
        fastest large-graph path when the number of non-chain edges is
        small (its Woodbury correction grows with them);
        "banded" is the direct solver for loop-RICH graphs (the
        reference analytic stub's "Sparse Cholesky" intent,
        pose_graph_optimizer_analytic.cc:12-51, done TPU-first): a host
        reverse-Cuthill-McKee ordering bounds the block bandwidth, the
        banded system packs into bandwidth-sized superblocks that form a
        block-TRIDIAGONAL system at superblock granularity, and the same
        cyclic-reduction factorization solves it in log2(P/b) batched
        dense-panel levels — exact steps at ANY loop density as long as
        the reordered bandwidth stays moderate (sphere-class ring
        closures: yes; uniformly random long loops: use "cg", the
        constructor-time bandwidth check raises with the measured
        memory need);
        "sparse" is the nested-dissection MULTIFRONTAL direct solver
        (solvers/multifrontal.py) for loop-rich FAT-BANDWIDTH graphs
        where even the best band ordering couples across the arena
        (Olson M3500-class city graphs): geometric separator tree on
        the host once per topology, then per LM iteration a handful of
        level-BATCHED dense frontal Cholesky panels — O(P^{3/2}) exact
        steps where banded superblocks degrade toward dense.

        ``edge_loss``: optional robust loss (e.g. core.losses.HuberLoss)
        applied per edge block over its squared residual norm, Ceres-style.
        The reference never sets one; combined with (or instead of)
        switchable constraints it bounds any single bad edge's influence.

        ``mesh``: optional jax.sharding.Mesh (parallel.make_factor_mesh)
        for the "cg" path — edges are sharded over the factor axis, the
        replicated LM+CG loop psums every edge reduction over ICI, so
        million-edge graphs scale across chips (same whole-loop design
        as the sharded registration path, SURVEY section 2.8).
        """
        from ..ops.relative_pose import SWITCH_PENALTY_SCALE

        if solver not in ("auto", "dense", "cg", "tridiag", "banded", "sparse"):
            raise ValueError(f"unknown solver {solver!r}")
        if cg_precond not in ("chain", "jacobi"):
            raise ValueError(f"unknown cg_precond {cg_precond!r}")
        if mesh is not None and solver not in ("cg", "sparse"):
            raise ValueError(
                "mesh sharding is implemented for the matrix-free CG path "
                "(edges sharded, whole-loop replication) and the sparse "
                "multifrontal path (fronts partitioned by XLA SPMD over a "
                "Mesh with a 'factors' axis); pass solver='cg' or "
                "solver='sparse' with mesh=..."
            )
        self.dtype = dtype
        self.solver = solver
        self.cg_iterations = cg_iterations
        self.cg_precond = cg_precond
        self.edge_loss = edge_loss
        self.mesh = mesh
        self.switch_penalty = (
            SWITCH_PENALTY_SCALE if switch_penalty is None else switch_penalty
        )
        self._poses: Dict[int, Pose] = {}
        self._constant: set = set()
        self._priors: Dict[int, tuple] = {}  # index -> (mean (7,), S (6,6))
        self._constraints: List[dict] = []
        # Flattening / upload caches. Rebuilding the SoA arrays from the
        # Python dict registry costs SECONDS at 50k constraints (one
        # np_rotmat_to_quat per relative pose, per solve) and the device
        # arrays re-upload through a ~30 MB/s relay — neither changes
        # between solves unless the registry does, so cache and
        # invalidate on registry mutation. Initial pose values DO change
        # (set_pose / write-back), so the packed (P, 3)+(P, 4) state is
        # maintained incrementally via a dirty set instead.
        self._topo_version = 0  # bumped on new pose index / new constraint
        self._flat_cache: Optional[dict] = None  # constraint SoA + uploads
        self._packed_poses: Optional[Tuple[np.ndarray, np.ndarray]] = None
        self._dirty_poses: set = set()
        # after a solve, the packed arrays are the authoritative state and
        # self._poses entries are stale until materialized by get_pose()
        self._poses_stale = False

    # -- registry (reference :40-60) --------------------------------------
    def set_pose(self, index: int, pose: Pose) -> None:
        """Copies the pose in (reference SetPose copies into PoseParameter)."""
        if index not in self._poses:
            self._topo_version += 1  # pose ordering / index_of changes
        self._poses[index] = pose.copy()
        self._dirty_poses.add(index)

    def set_pose_constant(self, index: int) -> None:
        if index not in self._poses:
            raise KeyError(f"pose {index} not registered")
        self._constant.add(index)

    def set_prior(self, index: int, pose: Pose, sqrt_info=1.0) -> None:
        """Unary Gaussian prior (GPS / anchor / initialization factor) on
        one pose: residual S [p - p0 ; 2 vec(q0^-1 (x) n(q))] over 6-DoF
        TANGENT coordinates at ``pose`` (the same affine-prior form the
        fixed-lag smoother's marginalization produces). ``sqrt_info``
        accepts scalar / (2,) (trans, rot) / (6,) diagonal / full (6, 6)
        over [x y z rx ry rz].

        Priors anchor the gauge, so a fully prior-anchored graph needs no
        ``set_pose_constant``. One prior per pose (a second call
        replaces the first). The reference DECLARES prior fields on its
        flagship minimizer and never uses them
        (mahalanobis_distance_minimizer.h:38-39); here they are
        first-class on the graph. Dense path only (``solver="dense"``).
        """
        if index not in self._poses:
            raise KeyError(f"pose {index} not registered")
        w = _expand_sqrt_info(sqrt_info)
        S = np.diag(w) if w.ndim == 1 else w
        mean = np.concatenate([pose.translation, pose.quaternion()])
        self._priors[index] = (mean, S)

    def set_constraint(
        self,
        reference_index: int,
        query_index: int,
        relative_pose: Pose,
        constraint_type: int = ConstraintType.ODOMETRY,
        sqrt_info=None,
    ) -> None:
        """Reference SetConstraint validation (:62-87).

        ``sqrt_info`` optionally whitens the 6-D residual: scalar
        (isotropic), (2,) = (1/sigma_t, 1/sigma_theta), a (6,) diagonal
        [x y z rx ry rz], or a full (6, 6) sqrt-information matrix S
        with S^T S = Omega (from a dataset information matrix use
        :func:`sqrt_info_from_information`; g2o files are handled
        end-to-end by io.g2o.load_pose_graph). The reference never
        weights its edges (ceres_cost_functor.h); whitening makes
        mixed-quality edges and ``covariance()`` physically meaningful.
        """
        if reference_index not in self._poses or query_index not in self._poses:
            raise KeyError("constraint endpoints must be registered poses")
        if reference_index == query_index:
            raise ValueError("self-constraint is not allowed")
        self._topo_version += 1
        self._constraints.append(
            dict(
                reference_index=reference_index,
                query_index=query_index,
                relative_pose=relative_pose.copy(),
                type=constraint_type,
                sqrt_info=_expand_sqrt_info(sqrt_info),
            )
        )

    def get_pose(self, index: int) -> Pose:
        if self._poses_stale and index not in self._dirty_poses:
            # materialize from the solved packed state on demand
            i = self._flat_cache["index_of"][index]
            pos, quat = self._packed_poses
            return Pose(np_quat_to_rotmat(quat[i]), pos[i])
        return self._poses[index].copy()

    @property
    def num_poses(self) -> int:
        return len(self._poses)

    @property
    def num_constraints(self) -> int:
        return len(self._constraints)

    def pose_indices(self) -> List[int]:
        """Registered pose ids, sorted (the solver's packing order)."""
        return sorted(self._poses)

    def constraints(self) -> List[dict]:
        """Shallow copies of the registered constraint records
        (reference_index, query_index, relative_pose, type, sqrt_info)."""
        return [dict(c) for c in self._constraints]

    # -- flattening caches -------------------------------------------------
    def _flatten(self) -> dict:
        """Constraint SoA arrays + device uploads, cached per topology
        version. At 50k constraints the raw rebuild (np_rotmat_to_quat
        per relative pose, list comprehensions over dicts, ~5 MB of
        uploads through the ~30 MB/s relay) costs ~3 s per solve — all of
        it invariant between solves unless the registry mutates."""
        if (
            self._flat_cache is not None
            and self._flat_cache["version"] == self._topo_version
        ):
            return self._flat_cache
        # the packed arrays are about to be re-ordered/invalidated; flush
        # any solved-but-unmaterialized state into the Pose registry first
        self._materialize()
        indices = sorted(self._poses)
        index_of = {pi: i for i, pi in enumerate(indices)}
        P = len(indices)
        E = len(self._constraints)
        ref_idx = np.array(
            [index_of[c["reference_index"]] for c in self._constraints], np.int32
        )
        query_idx = np.array(
            [index_of[c["query_index"]] for c in self._constraints], np.int32
        )
        rel_t = np.stack(
            [c["relative_pose"].translation for c in self._constraints]
        )
        rel_q = np.stack(
            [c["relative_pose"].quaternion() for c in self._constraints]
        )
        is_loop = np.array(
            [
                1.0 if c["type"] == ConstraintType.LOOP else 0.0
                for c in self._constraints
            ]
        )
        sqrt_info = stack_sqrt_info(
            [c["sqrt_info"] for c in self._constraints], 6
        )
        dtype = self.dtype
        edges_dev = PoseGraphEdges(
            reference_indices=jnp.asarray(ref_idx),
            query_indices=jnp.asarray(query_idx),
            relative_translations=jnp.asarray(rel_t, dtype),
            relative_quaternions=jnp.asarray(rel_q, dtype),
            is_loop=jnp.asarray(is_loop, dtype),
            mask=jnp.ones((E,), dtype),
            sqrt_info=None if sqrt_info is None else jnp.asarray(sqrt_info, dtype),
        )
        self._flat_cache = dict(
            version=self._topo_version,
            indices=indices,
            index_of=index_of,
            P=P,
            E=E,
            L=int(is_loop.sum()),
            ref_idx=ref_idx,
            query_idx=query_idx,
            rel_t=rel_t,
            rel_q=rel_q,
            is_loop=is_loop,
            sqrt_info=sqrt_info,
            edges_dev=edges_dev,
            tridiag=None,  # built on demand by _flatten_tridiag
        )
        self._packed_poses = None  # pose ordering may have changed
        return self._flat_cache

    def _flatten_tridiag(self, flat: dict) -> dict:
        """Chain/correction partition + reordered device edges for the
        tridiag solver, attached to the topology cache."""
        if flat["tridiag"] is not None:
            return flat["tridiag"]
        P = flat["P"]
        ref_idx, query_idx = flat["ref_idx"], flat["query_idx"]
        is_loop = flat["is_loop"]
        # partition: chain = adjacent non-loop edges (the odometry
        # backbone of T); everything else (loops + non-adjacent) enters
        # the Woodbury correction. Edges are REORDERED chain first
        # (sorted by lo) then corr — loop edges keep their relative
        # order, so switch slots are unchanged.
        adj = np.abs(ref_idx.astype(np.int64) - query_idx.astype(np.int64)) == 1
        chain_sel = adj & (is_loop == 0)
        chain_ids = np.nonzero(chain_sel)[0].astype(np.int32)
        corr_ids = np.nonzero(~chain_sel)[0].astype(np.int32)
        lo_all = np.minimum(ref_idx, query_idx)
        chain_ids = chain_ids[np.argsort(lo_all[chain_ids], kind="stable")]
        order = np.concatenate([chain_ids, corr_ids])
        chain_lo = lo_all[chain_ids].astype(np.int32)
        chain_forward = (ref_idx < query_idx)[chain_ids]
        # every consecutive pair covered exactly once -> all chain
        # segment sums become shift-adds (no TPU scatters)
        chain_seq = bool(
            len(chain_ids) == P - 1
            and np.array_equal(chain_lo, np.arange(P - 1, dtype=np.int32))
        )
        dtype = self.dtype
        E = flat["E"]
        edges_r = PoseGraphEdges(
            reference_indices=jnp.asarray(ref_idx[order]),
            query_indices=jnp.asarray(query_idx[order]),
            relative_translations=jnp.asarray(flat["rel_t"][order], dtype),
            relative_quaternions=jnp.asarray(flat["rel_q"][order], dtype),
            is_loop=jnp.asarray(is_loop[order], dtype),
            mask=jnp.ones((E,), dtype),
            sqrt_info=(
                None
                if flat["sqrt_info"] is None
                else jnp.asarray(flat["sqrt_info"][order], dtype)
            ),
        )
        flat["tridiag"] = dict(
            edges_r=edges_r,
            chain_lo=jnp.asarray(chain_lo),
            chain_forward=jnp.asarray(chain_forward, dtype),
            num_chain=int(len(chain_ids)),
            chain_seq=chain_seq,
        )
        return flat["tridiag"]

    def _flatten_banded(self, flat: dict) -> dict:
        """HOST symbolic phase for the banded direct solver, cached per
        topology: reverse-Cuthill-McKee pose ordering (scipy.sparse),
        block bandwidth, superblock size, and the permuted device edges.
        Numeric work stays on device (_pose_graph_solve_banded)."""
        if flat.get("banded") is not None:
            return flat["banded"]
        P = flat["P"]
        ref_idx, query_idx = flat["ref_idx"], flat["query_idx"]
        perm, inv, bandwidth = self._rcm_cached(flat)
        ref_p = inv[ref_idx]
        qry_p = inv[query_idx]
        s = max(bandwidth, 8)
        K = -(-P // s)
        itemsize = jnp.zeros((), self.dtype).dtype.itemsize
        # superblock panel memory (the factorization roughly doubles it)
        panel_bytes = K * (s * 7) ** 2 * itemsize
        if panel_bytes > 2 << 30:
            raise ValueError(
                f"banded solver: RCM bandwidth {bandwidth} over {P} poses "
                f"needs ~{2 * panel_bytes / 1e9:.1f} GB of superblock "
                "panels — the graph's loop structure is not band-friendly; "
                "use solver='cg' (matrix-free) instead"
            )
        dtype = self.dtype
        E = flat["E"]
        edges_p = PoseGraphEdges(
            reference_indices=jnp.asarray(ref_p.astype(np.int32)),
            query_indices=jnp.asarray(qry_p.astype(np.int32)),
            relative_translations=jnp.asarray(flat["rel_t"], dtype),
            relative_quaternions=jnp.asarray(flat["rel_q"], dtype),
            is_loop=jnp.asarray(flat["is_loop"], dtype),
            mask=jnp.ones((E,), dtype),
            sqrt_info=(
                None
                if flat["sqrt_info"] is None
                else jnp.asarray(flat["sqrt_info"], dtype)
            ),
        )
        flat["banded"] = dict(
            perm=perm, inv=inv, edges_p=edges_p,
            super_size=s, bandwidth=bandwidth,
        )
        return flat["banded"]

    def _rcm_cached(self, flat: dict):
        """(perm, inv, bandwidth) of the RCM ordering, cached on the
        topology cache (shared by solver selection, the banded symbolic
        phase, and the banded covariance path)."""
        if flat.get("rcm") is None:
            flat["rcm"] = _rcm_perm_bandwidth(
                flat["P"], flat["ref_idx"], flat["query_idx"]
            )
        return flat["rcm"]

    def _flatten_sparse(self, flat: dict, positions: np.ndarray) -> dict:
        """HOST symbolic phase for the nested-dissection multifrontal
        solver, cached per topology: separator tree + scatter maps
        (solvers/multifrontal.py). Pose positions seed the geometric
        median cuts — the natural dissection oracle for SLAM graphs."""
        if flat.get("sparse") is not None:
            return flat["sparse"]
        from . import multifrontal

        plan = multifrontal.symbolic(
            flat["P"],
            flat["ref_idx"].astype(np.int64),
            flat["query_idx"].astype(np.int64),
            d=7,
            coords=np.asarray(positions, np.float64),
            leaf_size=16,
        )
        acc = multifrontal.accumulate_rounds(
            flat["P"], flat["ref_idx"], flat["query_idx"]
        )
        flat["sparse"] = dict(plan=plan, acc=acc)
        return flat["sparse"]

    def _materialize(self) -> None:
        """Flush lazily-written-back solve results into the Pose registry
        (needed before the packed arrays are rebuilt or re-ordered)."""
        if not self._poses_stale:
            return
        index_of = self._flat_cache["index_of"]
        pos, quat = self._packed_poses
        for pi in self._poses:
            if pi not in self._dirty_poses:
                i = index_of[pi]
                self._poses[pi] = Pose(np_quat_to_rotmat(quat[i]), pos[i])
        self._poses_stale = False

    def _packed(self, indices, index_of) -> Tuple[np.ndarray, np.ndarray]:
        """Current (P, 3) positions + (P, 4) quaternions, maintained
        incrementally: only poses touched by set_pose since the last
        solve are re-extracted (write-back updates the arrays in bulk)."""
        if self._packed_poses is None or self._packed_poses[0].shape[0] != len(
            indices
        ):
            positions = np.stack(
                [self._poses[pi].translation for pi in indices]
            ).astype(np.float64)
            quaternions = np.stack(
                [self._poses[pi].quaternion() for pi in indices]
            ).astype(np.float64)
            self._packed_poses = (positions, quaternions)
        elif self._dirty_poses:
            positions, quaternions = self._packed_poses
            for pi in self._dirty_poses:
                i = index_of[pi]
                positions[i] = self._poses[pi].translation
                quaternions[i] = self._poses[pi].quaternion()
        self._dirty_poses.clear()
        return self._packed_poses

    # -- initialization ----------------------------------------------------
    def initialize(
        self,
        method: str = "chordal",
        include_loops: bool = True,
        cg_iterations: int = 300,
        init_dtype=jnp.float32,
    ) -> None:
        """Replace the non-constant pose estimates with an initialization
        computed from the relative-pose measurements (the registry's
        current values are ignored except at anchors).

        ``method="spanning_tree"`` composes measurements along a BFS tree
        from the anchors (odometry edges preferred); ``"chordal"`` solves
        the rotation-averaging chordal relaxation + a translation
        Laplacian by preconditioned CG (see solvers/graph_init.py). LM
        converges from far worse starts after either — the classic cure
        for sphere-scale graphs whose dead-reckoned init is a fold.

        ``include_loops=False`` initializes from odometry edges only —
        robust when loop measurements may contain outliers (chordal
        averaging has no switch variables; a wrong loop bends the whole
        init). Anchors: the ``set_pose_constant`` poses, else the lowest
        pose index at its current registry value.

        ``init_dtype``: precision of the chordal CG solves. f32 (default)
        because this is an INITIALIZER — its residual floor (decimeters
        at sphere scale) is deep inside LM's basin, while emulated-f64 CG
        on TPU costs more than the direct LM solve it feeds (measured
        3.3 s vs 0.5 s on sphere2500). Pass jnp.float64 to reproduce the
        old behavior.
        """
        from . import graph_init

        flat = self._flatten()
        indices, index_of = flat["indices"], flat["index_of"]
        P = flat["P"]
        ref_idx, query_idx = flat["ref_idx"], flat["query_idx"]
        rel_t, rel_q = flat["rel_t"], flat["rel_q"]
        is_loop = flat["is_loop"]

        if not include_loops:
            keep = is_loop == 0.0
            ref_idx, query_idx = ref_idx[keep], query_idx[keep]
            rel_t, rel_q = rel_t[keep], rel_q[keep]
            is_loop = is_loop[keep]

        anchor_ids = sorted(self._constant) or [indices[0]]
        anchors = {}
        for pi in anchor_ids:
            p = self.get_pose(pi)
            anchors[index_of[pi]] = (p.rotation, p.translation)

        if method == "spanning_tree":
            t, q = graph_init.spanning_tree_init(
                ref_idx, query_idx, rel_q, rel_t, P, anchors,
                edge_priority=is_loop,
            )
        elif method == "chordal":
            t, q = graph_init.chordal_init(
                ref_idx, query_idx, rel_q, rel_t, P, anchors,
                cg_iterations=cg_iterations, dtype=init_dtype,
            )
        else:
            raise ValueError(
                f"unknown initialization method {method!r} "
                "(spanning_tree | chordal)"
            )

        for pi in indices:
            if pi in self._constant:
                continue
            i = index_of[pi]
            self.set_pose(pi, Pose(np_quat_to_rotmat(q[i]), t[i]))

    # -- solve -------------------------------------------------------------
    def solve(self, options: Optional[Options] = None) -> Tuple[lm.Summary, np.ndarray]:
        """Optimize all registered poses; write results back into the
        registry with quaternion renormalization (reference
        UpdateOptimizedPose, pose_graph_optimizer.h:89-101).

        Returns (summary, switch_values)."""
        if options is None:
            # the reference's pose-graph test runs Ceres with 500 iters and
            # 1e-18 tolerances (pose_graph_optimizer_ceres.cc:49-59)
            options = Options().replace(max_iterations=500)
        if not self._constraints:
            raise ValueError(
                "PoseGraphOptimizer.solve: no constraints registered; add "
                "edges with set_constraint() before solving (a graph of "
                "only poses has nothing to optimize)"
            )
        if self._priors and self.solver not in ("dense", "auto"):
            raise ValueError(
                "set_prior is implemented on the dense path; construct "
                "with solver='dense' (or anchor via set_pose_constant)"
            )
        flat = self._flatten()
        indices = flat["indices"]
        index_of = flat["index_of"]
        P, L = flat["P"], flat["L"]
        # loop slots follow edge order (odometry first is NOT required)
        edges = flat["edges_dev"]

        positions, quaternions = self._packed(indices, index_of)

        dtype = self.dtype
        free = np.ones(P)
        for pi in self._constant:
            free[index_of[pi]] = 0.0

        # switch variables initialized to 1.0 (inlier)
        switches0 = jnp.ones((L,), dtype)

        solver = self.solver
        if solver == "auto":
            if self._priors:
                solver = "dense"  # priors are a dense-path feature
                self.last_selection = dict(reason="priors registered")
            else:
                solver, self.last_selection = select_solver(
                    P, flat["ref_idx"], flat["query_idx"], flat["is_loop"],
                    7,
                    plan_fn=lambda: self._flatten_sparse(flat, positions)[
                        "plan"
                    ],
                    bandwidth=self._rcm_cached(flat)[2],
                )
        self.last_solver_choice = solver

        if solver == "sparse":
            sp = self._flatten_sparse(flat, positions)
            pos, quat, sw, summary = _pose_graph_solve_sparse(
                jnp.asarray(positions, dtype),
                jnp.asarray(quaternions, dtype),
                switches0,
                edges,
                jnp.asarray(free, dtype),
                jnp.asarray(self.switch_penalty, dtype),
                self.edge_loss,
                P,
                L,
                sp["plan"],
                options,
                self.mesh,
                jnp.asarray(sp["acc"]),
            )
        elif solver == "banded":
            bd = self._flatten_banded(flat)
            perm = bd["perm"]
            pos_p, quat_p, sw, summary = _pose_graph_solve_banded(
                jnp.asarray(positions[perm], dtype),
                jnp.asarray(quaternions[perm], dtype),
                switches0,
                bd["edges_p"],
                jnp.asarray(free[perm], dtype),
                jnp.asarray(self.switch_penalty, dtype),
                self.edge_loss,
                P,
                L,
                bd["super_size"],
                options,
            )
            # un-permute back to registry order (device-side: two tiny
            # gathers beat two extra host round-trips)
            inv = jnp.asarray(bd["inv"])
            pos, quat = pos_p[inv], quat_p[inv]
        elif solver == "tridiag":
            td = self._flatten_tridiag(flat)
            pos, quat, sw, summary = _pose_graph_solve_tridiag(
                jnp.asarray(positions, dtype),
                jnp.asarray(quaternions, dtype),
                switches0,
                td["edges_r"],
                jnp.asarray(free, dtype),
                jnp.asarray(self.switch_penalty, dtype),
                self.edge_loss,
                td["chain_lo"],
                td["chain_forward"],
                td["num_chain"],
                P,
                L,
                options,
                td["chain_seq"],
            )
        elif solver == "cg":
            if self.mesh is not None:
                pos, quat, sw, summary = _pose_graph_solve_cg_sharded(
                    self.mesh,
                    jnp.asarray(positions, dtype),
                    jnp.asarray(quaternions, dtype),
                    switches0,
                    edges,
                    jnp.asarray(free, dtype),
                    jnp.asarray(self.switch_penalty, dtype),
                    self.edge_loss,
                    P,
                    L,
                    options,
                    self.cg_iterations,
                    self.cg_precond,
                )
            else:
                pos, quat, sw, summary = _pose_graph_solve_cg(
                    jnp.asarray(positions, dtype),
                    jnp.asarray(quaternions, dtype),
                    switches0,
                    edges,
                    jnp.asarray(free, dtype),
                    jnp.asarray(self.switch_penalty, dtype),
                    self.edge_loss,
                    P,
                    L,
                    options,
                    self.cg_iterations,
                    self.cg_precond,
                )
        else:
            prior_sqrt, prior_mean, prior_sel, prior_offset = self._prior_args(
                index_of, dtype
            )
            pos, quat, sw, summary = _pose_graph_solve(
                jnp.asarray(positions, dtype),
                jnp.asarray(quaternions, dtype),
                switches0,
                edges,
                jnp.asarray(free, dtype),
                jnp.asarray(self.switch_penalty, dtype),
                self.edge_loss,
                P,
                L,
                options,
                prior_sqrt,
                prior_mean,
                prior_sel,
                prior_offset,
            )
        # one batched device->host fetch (separate fetches each pay the
        # runtime's ~30 ms completion-poll quantum; the summary scalars
        # ride along so later int(summary.iterations) reads are free)
        pos, quat, sw, summary = jax.device_get((pos, quat, sw, summary))
        # np.array copies: device_get buffers are read-only and the packed
        # cache is updated in place by later set_pose calls
        pos = np.array(pos, np.float64)
        quat = np.array(quat, np.float64)
        # renormalize on write-back (reference UpdateOptimizedPose,
        # pose_graph_optimizer.h:89-101) — but write back LAZILY: the
        # packed arrays become the authoritative pose state and Pose
        # objects materialize per get_pose() call. An eager write-back
        # is 50k np_quat_to_rotmat calls + Pose constructions per solve
        # (~1 s of the fixed overhead at city scale).
        quat = quat / np.linalg.norm(quat, axis=1, keepdims=True)
        self._packed_poses = (pos, quat)
        self._poses_stale = True
        self._dirty_poses.clear()
        sw = np.asarray(sw, np.float64)
        self._last_switches = sw.copy()  # for covariance() linearization
        return summary, sw

    def _prior_args(self, index_of: dict, dtype):
        """Device arrays for the tangent-space unary priors consumed by
        ``_pose_graph_solve`` (None placeholders when no priors are set)."""
        if not self._priors:
            return None, None, None, None
        sel = sorted(self._priors)
        B = len(sel)
        S = np.zeros((6 * B, 6 * B))
        for k, pi in enumerate(sel):
            S[6 * k : 6 * k + 6, 6 * k : 6 * k + 6] = self._priors[pi][1]
        prior_sqrt = jnp.asarray(S, dtype)
        prior_mean = jnp.asarray(
            np.stack([self._priors[pi][0] for pi in sel]), dtype
        )
        prior_sel = jnp.asarray(np.array([index_of[pi] for pi in sel], np.int32))
        prior_offset = jnp.zeros((6 * B,), dtype)
        return prior_sqrt, prior_mean, prior_sel, prior_offset

    def solve_batch(
        self,
        batch_size: Optional[int] = None,
        initial_positions=None,  # (B, P, 3), pose_indices() order
        initial_quaternions=None,  # (B, P, 4) wxyz
        relative_translations=None,  # (B, E, 3), constraints() order
        relative_quaternions=None,  # (B, E, 4) wxyz
        options: Optional[Options] = None,
    ) -> Tuple[np.ndarray, np.ndarray, np.ndarray, lm.Summary]:
        """Solve B independent instances sharing THIS graph's topology in
        one vmapped device program (serving mode; see solvers/batched.py
        for the registration-side analog and the dispatch-floor math).

        All instances share the edge structure: endpoint indices, loop
        flags, per-edge sqrt-information, gauge fixing, switch penalty,
        edge loss, and any unary priors. Per-instance inputs (each
        optional; this graph's own state/measurements are broadcast for
        whatever is omitted):

        - ``initial_positions`` / ``initial_quaternions``: starting
          estimates, ordered like :meth:`pose_indices`;
        - ``relative_translations`` / ``relative_quaternions``: edge
          measurements, ordered like :meth:`constraints` — the Monte-Carlo
          /multi-hypothesis axis: resample measurements per instance and
          every instance optimizes its own graph realization.

        ``batch_size`` is required only when every per-instance input is
        omitted. The registry is NOT written back (instances have no
        single answer); returns ``(positions (B, P, 3), quaternions
        (B, P, 4) renormalized, switches (B, L), summary)`` with numpy
        arrays and a per-instance ``lm.Summary`` pytree (leading axis B).

        The reference API is strictly one-problem-per-Solve
        (pose_graph_optimizer.h:67); this is the TPU serving shape —
        one 80-pose system cannot fill a chip, B of them can.
        """
        if self.solver not in ("dense", "auto"):
            raise ValueError(
                "solve_batch runs on the dense direct path; construct the "
                "optimizer with solver='dense' (CG/tridiag batching would "
                "multiply their iteration-count compromises, not amortize "
                "them)"
            )
        if self.solver == "auto" and 7 * len(self._poses) > 6000:
            raise ValueError(
                "solve_batch materializes B dense (7P+L)^2 systems — at "
                f"{len(self._poses)} poses that is far past the dense "
                "envelope 'auto' would pick for solve(); batch serving is "
                "a small-graph shape (construct with solver='dense' "
                "explicitly to override)"
            )
        if options is None:
            options = Options().replace(max_iterations=500)
        if not self._constraints:
            raise ValueError(
                "PoseGraphOptimizer.solve_batch: no constraints registered"
            )
        flat = self._flatten()
        indices, index_of = flat["indices"], flat["index_of"]
        P, E, L = flat["P"], flat["E"], flat["L"]
        edges = flat["edges_dev"]
        dtype = self.dtype

        sizes = {
            np.shape(a)[0]
            for a in (
                initial_positions,
                initial_quaternions,
                relative_translations,
                relative_quaternions,
            )
            if a is not None
        }
        if batch_size is not None:
            sizes.add(int(batch_size))
        if len(sizes) != 1:
            raise ValueError(
                f"inconsistent or missing batch size: {sorted(sizes)}; pass "
                "batch_size= or at least one (B, ...) per-instance array"
            )
        B = sizes.pop()

        def _batched(arr, default, shape, name):
            if arr is None:
                return jnp.broadcast_to(jnp.asarray(default, dtype), (B,) + shape)
            a = jnp.asarray(arr, dtype)
            if a.shape != (B,) + shape:
                raise ValueError(f"{name} must be (B,) + {shape}; got {a.shape}")
            return a

        pos0, quat0 = self._packed(indices, index_of)
        pos_b = _batched(initial_positions, pos0, (P, 3), "initial_positions")
        quat_b = _batched(
            initial_quaternions, quat0, (P, 4), "initial_quaternions"
        )
        rel_t_b = _batched(
            relative_translations,
            edges.relative_translations,
            (E, 3),
            "relative_translations",
        )
        rel_q_b = _batched(
            relative_quaternions,
            edges.relative_quaternions,
            (E, 4),
            "relative_quaternions",
        )

        free = np.ones(P)
        for pi in self._constant:
            free[index_of[pi]] = 0.0
        prior_sqrt, prior_mean, prior_sel, prior_offset = self._prior_args(
            index_of, dtype
        )
        edges_b = edges._replace(
            relative_translations=rel_t_b, relative_quaternions=rel_q_b
        )
        pos, quat, sw, summary = _pose_graph_solve_batch(
            pos_b,
            quat_b,
            jnp.ones((B, L), dtype),
            edges_b,
            jnp.asarray(free, dtype),
            jnp.asarray(self.switch_penalty, dtype),
            self.edge_loss,
            P,
            L,
            options,
            prior_sqrt,
            prior_mean,
            prior_sel,
            prior_offset,
        )
        # one batched fetch (per-fetch dispatch quantum, CLAUDE.md)
        pos, quat, sw, summary = jax.device_get((pos, quat, sw, summary))
        quat = np.array(quat, np.float64)
        quat /= np.linalg.norm(quat, axis=2, keepdims=True)
        return np.array(pos, np.float64), quat, np.asarray(sw, np.float64), summary

    def _tangent_edge_blocks(self, flat):
        """Host f64 linearization of every constraint on the 6-DoF
        tangent chart (shared by the dense and banded covariance paths):
        returns (J_ref6, J_qry6, J_s, sw_slot, quat, Tq)."""
        all_indices = flat["indices"]
        index_of = flat["index_of"]
        L = flat["L"]
        pos, quat = self._packed(all_indices, index_of)
        pos = pos.astype(np.float64)
        quat = quat.astype(np.float64)
        quat /= np.linalg.norm(quat, axis=1, keepdims=True)

        sw_slot = np.cumsum(flat["is_loop"].astype(int)) - 1  # (E,)
        sw = getattr(self, "_last_switches", None)
        if sw is None or len(sw) != L:
            sw = np.ones(L)
        sw_full = np.where(flat["is_loop"] > 0, sw[np.clip(sw_slot, 0, max(L - 1, 0))], 1.0) if L else np.ones(flat["E"])

        from ..ops.relative_pose import np_edge_residuals_and_jacobians

        r, J_ref, J_qry, J_s = np_edge_residuals_and_jacobians(
            pos, quat, sw_full,
            flat["ref_idx"], flat["query_idx"],
            flat["rel_t"], flat["rel_q"], flat["is_loop"],
            self.switch_penalty,
            sqrt_info=flat["sqrt_info"],
        )
        if self.edge_loss is not None:
            sq = np.sum(r * r, axis=1)
            _, w, _ = self.edge_loss.evaluate(sq)
            sqrt_w = np.sqrt(np.asarray(w, np.float64))[:, None, None]
            J_ref = J_ref * sqrt_w
            J_qry = J_qry * sqrt_w
            J_s = J_s * sqrt_w[:, :, 0]

        # chain ambient (E,7,7) blocks onto the per-pose tangent chart
        Tq = 0.5 * _np_left_quat(quat)[:, :, 1:]  # (P, 4, 3)
        ref_i, qry_i = flat["ref_idx"], flat["query_idx"]
        J_ref = np.concatenate([J_ref[:, :, :3], J_ref[:, :, 3:] @ Tq[ref_i]], axis=2)
        J_qry = np.concatenate([J_qry[:, :, :3], J_qry[:, :, 3:] @ Tq[qry_i]], axis=2)
        return J_ref, J_qry, J_s, sw_slot, quat, Tq

    def _covariance_sparse_plan(self, flat):
        """d=6 tangent-chart dissection plan for the selected-inverse
        covariance (separate from the solver's d=7 ambient plan;
        cached per topology)."""
        if flat.get("sparse_cov") is not None:
            return flat["sparse_cov"]
        from . import multifrontal

        pos, _ = self._packed(flat["indices"], flat["index_of"])
        plan = multifrontal.symbolic(
            flat["P"],
            flat["ref_idx"].astype(np.int64),
            flat["query_idx"].astype(np.int64),
            d=6,
            coords=np.asarray(pos, np.float64),
            leaf_size=16,
        )
        flat["sparse_cov"] = plan
        return plan

    def _covariance_sparse(self, flat, indices) -> Dict[int, np.ndarray]:
        """Pose-diagonal blocks of H^{-1} by the MULTIFRONTAL selected
        inverse (multifrontal.selected_inverse_diag — Takahashi on the
        separator tree, one batched level per depth): the marginal
        engine for fat-bandwidth graphs where the RCM-band recurrence
        would go near-dense. Requires x64 for f64 marginals (runs at
        the backend's native precision otherwise)."""
        from . import multifrontal

        all_indices = flat["indices"]
        index_of = flat["index_of"]
        P, E, L = flat["P"], flat["E"], flat["L"]
        J_ref, J_qry, J_s, sw_slot, quat, Tq = self._tangent_edge_blocks(flat)
        ref_i = flat["ref_idx"].astype(np.int64)
        qry_i = flat["query_idx"].astype(np.int64)
        free = np.array(
            [0.0 if pi in self._constant else 1.0 for pi in all_indices]
        )
        J_ref = J_ref * free[ref_i][:, None, None]
        J_qry = J_qry * free[qry_i][:, None, None]
        B_aa, B_bb, B_ab = _np_edge_information_blocks(J_ref, J_qry, J_s)
        plan = self._covariance_sparse_plan(flat)
        diag = np.tile((1.0 - free)[:, None], (1, 6))  # gauge identity
        fact = multifrontal.factor(
            plan, jnp.asarray(B_aa), jnp.asarray(B_bb), jnp.asarray(B_ab),
            jnp.asarray(diag),
        )
        blocks = np.asarray(multifrontal.selected_inverse_diag(plan, fact))
        if indices is None:
            indices = all_indices
        out = {}
        for pi in indices:
            if pi in self._constant:
                out[pi] = np.zeros((6, 6))
                continue
            out[pi] = np.array(blocks[index_of[pi]], np.float64)
        return out

    def _covariance_banded(self, flat, indices) -> Dict[int, np.ndarray]:
        """Pose-diagonal blocks of H^{-1} by the exact block-tridiagonal
        SELECTED-INVERSE recurrence over RCM superblocks:

            Lam_1 = D_1,   Lam_k = D_k - O_{k-1}^T Lam_{k-1}^{-1} O_{k-1}
            Sig_K = Lam_K^{-1}
            Sig_k = Lam_k^{-1} + G_k Sig_{k+1} G_k^T,  G_k = Lam_k^{-1} O_k

        O(K (6s)^3) host f64 instead of the dense path's O((6P)^3):
        sphere2500 in under a second, 50k-pose city graphs in seconds.
        Switch variables are eliminated exactly per edge first (their
        Schur downdate is rank-1 on the edge's pose blocks, inside the
        band) — the pose marginals of the reduced system equal the pose
        blocks of the full joint inverse (standard Schur identity)."""
        all_indices = flat["indices"]
        index_of = flat["index_of"]
        P, E, L = flat["P"], flat["E"], flat["L"]
        J_ref, J_qry, J_s, sw_slot, quat, Tq = self._tangent_edge_blocks(flat)
        ref_i = flat["ref_idx"].astype(np.int64)
        qry_i = flat["query_idx"].astype(np.int64)
        free = np.array(
            [0.0 if pi in self._constant else 1.0 for pi in all_indices]
        )
        J_ref = J_ref * free[ref_i][:, None, None]
        J_qry = J_qry * free[qry_i][:, None, None]

        B_aa, B_bb, B_ab = _np_edge_information_blocks(J_ref, J_qry, J_s)

        # host-only symbolic info (perm/bandwidth): does NOT build the
        # banded solver's permuted device edge uploads (round-4 review:
        # a covariance-only query was paying ~MBs of relay upload)
        perm, pinv, bw = self._rcm_cached(flat)
        s = max(bw, 8)
        K_est = max(1, -(-P // s))
        if 2 * K_est * (s * 6) ** 2 * 8 > 4 << 30:
            raise ValueError(
                f"covariance(method='banded'): RCM bandwidth {bw} over "
                f"{P} poses needs tens of GB of host panels; use "
                "method='sparse' (multifrontal selected inverse)"
            )
        ref_p, qry_p = pinv[ref_i], pinv[qry_i]
        swap = qry_p < ref_p
        lo = np.where(swap, qry_p, ref_p)
        hi = np.where(swap, ref_p, qry_p)
        # (row, col) conventions: B_ab is (row ref, col qry)
        B_ll = np.where(swap[:, None, None], B_bb, B_aa)
        B_hh = np.where(swap[:, None, None], B_aa, B_bb)
        B_hl = np.where(swap[:, None, None], B_ab, np.swapaxes(B_ab, 1, 2))
        # gauge-fixed poses and padding keep an identity diagonal (their
        # output blocks are zeroed below, like the dense path)
        K, m, D, O = _scatter_banded_blocks(
            P, 6, s, lo, hi, B_ll, B_hh, B_hl, 1.0 - free[perm]
        )
        sig_blocks = _block_tridiag_selected_inverse(K, m, D, O)

        if indices is None:
            indices = all_indices
        out = {}
        for pi in indices:
            if pi in self._constant:
                out[pi] = np.zeros((6, 6))
                continue
            q = int(pinv[index_of[pi]])
            k, r = q // s, q % s
            out[pi] = sig_blocks[k][
                r * 6:(r + 1) * 6, r * 6:(r + 1) * 6
            ].copy()
        return out

    def covariance(
        self,
        indices: Optional[List[int]] = None,
        method: str = "auto",
    ) -> Dict[int, np.ndarray]:
        """Marginal 6x6 TANGENT-space covariance blocks per pose.

        Linearizes every constraint (with the switch values learned by the
        last ``solve()``, ones before any solve) at the current estimates,
        assembles the Gauss-Newton information over the 6-DoF local chart
        per free pose (dp; dtheta with q -> n(q) (x) (1, dtheta/2)) plus
        the loop switch variables, and returns the pose-diagonal blocks of
        its inverse. Constant (gauge) poses get a zero block.

        ``method``: "dense" inverts the full (6P+L)^2 information
        (host f64, O(dim^3) — graphs up to a few thousand poses);
        "banded" computes the SAME pose-diagonal blocks by the exact
        block-tridiagonal selected-inverse recurrence over RCM
        superblocks (O(K (s*6)^3) — sphere2500/50k-pose scale in
        seconds; switch variables eliminated exactly per edge first);
        "auto" (default) picks dense below ~3k poses, banded above.
        The two paths agree to f64 roundoff (asserted in
        tests/test_covariance.py).

        The reference has no covariance query at all (Ceres' Covariance
        class is never used); this is standard SLAM functionality the
        framework adds.

        Returns {pose_index: (6, 6) ndarray}.
        """
        flat = self._flatten()
        all_indices = flat["indices"]
        index_of = flat["index_of"]
        P, E, L = flat["P"], flat["E"], flat["L"]
        if E == 0:
            raise ValueError("covariance: no constraints registered")
        if not self._constant and not self._priors:
            raise ValueError(
                "covariance: gauge-free graph has unbounded covariance; "
                "fix at least one pose with set_pose_constant() or anchor "
                "one with set_prior()"
            )
        if method not in ("auto", "dense", "banded", "sparse"):
            raise ValueError(f"unknown covariance method {method!r}")
        if method == "auto":
            # banded is exact and orders faster already at mid scale
            # (sphere2500: 1.1 s vs 137 s dense, agreement 1e-13);
            # sparse (multifrontal selected inverse) covers band-hostile
            # big graphs; dense for small graphs or priors
            if P <= 500 or self._priors:
                method = "dense"
            else:
                # Gate on the SAME host-only d=6 f64 panel-memory bound
                # _covariance_banded itself enforces (round-5 fix: the
                # old probe ran _flatten_banded, paying the banded
                # solver's permuted device-edge uploads for a host-only
                # query, and its d=7 solver-dtype guard could accept a
                # graph the d=6 covariance guard then rejects).
                perm, pinv, bw = self._rcm_cached(flat)
                s = max(bw, 8)
                K_est = max(1, -(-P // s))
                if 2 * K_est * (s * 6) ** 2 * 8 <= 4 << 30:
                    method = "banded"
                else:
                    try:
                        self._covariance_sparse_plan(flat)
                        method = "sparse"
                    except ValueError:
                        method = "dense"
        if method in ("banded", "sparse"):
            if self._priors:
                raise ValueError(
                    f"covariance(method={method!r}) does not support "
                    "priors yet; use method='dense'"
                )
            if method == "banded":
                return self._covariance_banded(flat, indices)
            return self._covariance_sparse(flat, indices)
        J_ref, J_qry, J_s, sw_slot, quat, Tq = self._tangent_edge_blocks(flat)
        ref_i, qry_i = flat["ref_idx"], flat["query_idx"]

        free = np.array(
            [0.0 if pi in self._constant else 1.0 for pi in all_indices]
        )
        J_ref = J_ref * free[ref_i][:, None, None]
        J_qry = J_qry * free[qry_i][:, None, None]

        dim = 6 * P + L
        H = np.zeros((dim, dim))
        r6 = np.arange(6)
        rows_ref = 6 * ref_i[:, None] + r6[None, :]  # (E, 6)
        rows_qry = 6 * qry_i[:, None] + r6[None, :]

        def scatter(rows_a, rows_b, blocks):
            np.add.at(H, (rows_a[:, :, None], rows_b[:, None, :]), blocks)

        scatter(rows_ref, rows_ref, np.einsum("edi,edj->eij", J_ref, J_ref))
        scatter(rows_qry, rows_qry, np.einsum("edi,edj->eij", J_qry, J_qry))
        cross = np.einsum("edi,edj->eij", J_ref, J_qry)
        scatter(rows_ref, rows_qry, cross)
        scatter(rows_qry, rows_ref, np.swapaxes(cross, 1, 2))
        if L:
            cols_sw = 6 * P + sw_slot  # (E,)
            b_rs = np.einsum("edi,ed->ei", J_ref, J_s)
            b_qs = np.einsum("edi,ed->ei", J_qry, J_s)
            np.add.at(H, (rows_ref, cols_sw[:, None]), b_rs)
            np.add.at(H, (cols_sw[:, None], rows_ref), b_rs)
            np.add.at(H, (rows_qry, cols_sw[:, None]), b_qs)
            np.add.at(H, (cols_sw[:, None], rows_qry), b_qs)
            np.add.at(H, (cols_sw, cols_sw), np.sum(J_s * J_s, axis=1))

        # prior factors: r_p = S dphi; chained onto the tangent chart at
        # the current estimate, J_tan = S @ d(dphi)/d(ambient) @
        # blkdiag(I3, Tq) (same algebra as the dense solver's prior block)
        for pi, (mean, S) in self._priors.items():
            i = index_of[pi]
            q = quat[i]  # unit (normalized above)
            q_lin = mean[3:] / np.linalg.norm(mean[3:])
            Dn = np.eye(4) - np.outer(q, q)  # d(q/|q|)/dq at |q|=1
            dq = 2.0 * (_np_left_quat(_np_conj_quat(q_lin)) @ Dn)[1:, :]  # (3,4)
            T_amb = np.zeros((6, 7))
            T_amb[:3, :3] = np.eye(3)
            T_amb[3:, 3:] = dq
            chart = np.zeros((7, 6))
            chart[:3, :3] = np.eye(3)
            chart[3:, 3:] = Tq[i]
            J = S @ T_amb @ chart  # (6, 6)
            H[6 * i : 6 * i + 6, 6 * i : 6 * i + 6] += J.T @ J

        # drop constant-pose rows/cols, invert, re-embed
        keep = np.concatenate(
            [np.repeat(free, 6).astype(bool), np.ones(L, bool)]
        )
        H_red = H[np.ix_(keep, keep)]
        try:
            Sigma_red = np.linalg.inv(H_red)
        except np.linalg.LinAlgError as exc:
            raise ValueError(
                "covariance: information matrix is singular — the graph "
                "is under-constrained (disconnected components or "
                "unobserved poses)"
            ) from exc
        Sigma = np.zeros((dim, dim))
        kk = np.nonzero(keep)[0]
        Sigma[np.ix_(kk, kk)] = Sigma_red

        if indices is None:
            indices = all_indices
        out = {}
        for pi in indices:
            i = index_of[pi]
            out[pi] = Sigma[6 * i : 6 * i + 6, 6 * i : 6 * i + 6].copy()
        return out


# ----------------------------------------------------------------------------
# SE(2) pose graph (BASELINE config 4: "2D and 3D relative-pose graph").
# The reference repo has no 2D graph module; this follows the standard
# g2o-style SE(2) edge with the same switchable-constraint treatment and
# the same batched one-hot dense-GN assembly as the 3D solver above.
# ----------------------------------------------------------------------------


class PoseGraph2DEdges(NamedTuple):
    reference_indices: Array  # (E,)
    query_indices: Array  # (E,)
    relative_xyt: Array  # (E, 3) (dx, dy, dtheta) in the reference frame
    is_loop: Array  # (E,)
    mask: Array  # (E,)
    # optional sqrt-information: (E, 3) diagonal rows (1/sigma_x,
    # 1/sigma_y, 1/sigma_theta) or (E, 3, 3) full matrices (g2o EDGE_SE2
    # information; see io/g2o.py). None = unit weights. Penalty row
    # unwhitened.
    sqrt_info: Optional[Array] = None


def se2_edge_residual(xyt_ref: Array, xyt_query: Array, rel: Array) -> Array:
    """r = [R(th_r)^T (p_q - p_r) - t_rel ; wrap(th_q - th_r - th_rel)]."""
    c, s = jnp.cos(xyt_ref[2]), jnp.sin(xyt_ref[2])
    dp = xyt_query[:2] - xyt_ref[:2]
    local = jnp.stack([c * dp[0] + s * dp[1], -s * dp[0] + c * dp[1]])
    dth = xyt_query[2] - xyt_ref[2] - rel[2]
    # branch-free angle wrap
    dth = jnp.arctan2(jnp.sin(dth), jnp.cos(dth))
    return jnp.concatenate([local - rel[:2], dth[None]])


def se2_edge_residuals_and_jacobians(
    xyt: Array,  # (P, 3)
    switches: Array,  # (E,)
    edges: "PoseGraph2DEdges",
    penalty_scale,
) -> Tuple[Array, Array, Array, Array]:
    """Batched SE(2) edge residuals + CLOSED-FORM Jacobian blocks.

    r = [s? * (R(th_r)^T (p_q - p_r) - t_rel) ;
         s? * wrap(th_q - th_r - th_rel) ;
         loop? (1 - s) * penalty]                         (E, 4)
    J_ref/J_query (E, 4, 3) w.r.t. (x, y, th); J_s (E, 4). The wrap is a
    piecewise-constant shift, so its derivative is 1 almost everywhere.
    Verified against the jacfwd oracle in tests/test_pose_graph_2d.py."""
    dtype = xyt.dtype
    E = edges.mask.shape[0]
    ref = xyt[edges.reference_indices]  # (E, 3)
    qry = xyt[edges.query_indices]
    rel = edges.relative_xyt

    c = jnp.cos(ref[:, 2])
    sn = jnp.sin(ref[:, 2])
    dx = qry[:, 0] - ref[:, 0]
    dy = qry[:, 1] - ref[:, 1]
    lx = c * dx + sn * dy
    ly = -sn * dx + c * dy
    dth = qry[:, 2] - ref[:, 2] - rel[:, 2]
    dth = jnp.arctan2(jnp.sin(dth), jnp.cos(dth))
    r3 = jnp.stack([lx - rel[:, 0], ly - rel[:, 1], dth], axis=-1)  # (E, 3)

    zero = jnp.zeros((E,), dtype)
    one = jnp.ones((E,), dtype)
    # d local / d th_ref = [[-sn, c], [-c, -sn]] @ d
    dlx_dth = -sn * dx + c * dy
    dly_dth = -c * dx - sn * dy
    J3_ref = jnp.stack(
        [
            jnp.stack([-c, -sn, dlx_dth], axis=-1),
            jnp.stack([sn, -c, dly_dth], axis=-1),
            jnp.stack([zero, zero, -one], axis=-1),
        ],
        axis=-2,
    )  # (E, 3, 3)
    J3_query = jnp.stack(
        [
            jnp.stack([c, sn, zero], axis=-1),
            jnp.stack([-sn, c, zero], axis=-1),
            jnp.stack([zero, zero, one], axis=-1),
        ],
        axis=-2,
    )

    if edges.sqrt_info is not None:
        r3, J3_ref, J3_query = apply_sqrt_info(
            edges.sqrt_info, r3, J3_ref, J3_query
        )

    loop = edges.is_loop > 0
    sw = jnp.where(loop, switches, one)
    m = edges.mask
    penalty = jnp.where(loop, (1.0 - switches) * penalty_scale, 0.0)
    r = jnp.concatenate([r3 * sw[:, None], penalty[:, None]], axis=-1)
    r = r * m[:, None]
    smm = (sw * m)[:, None, None]
    zero13 = jnp.zeros((E, 1, 3), dtype)
    J_ref = jnp.concatenate([J3_ref * smm, zero13], axis=-2)  # (E, 4, 3)
    J_query = jnp.concatenate([J3_query * smm, zero13], axis=-2)
    J_s = (
        jnp.concatenate(
            [
                jnp.where(loop[:, None], r3, 0.0),
                jnp.where(loop, -penalty_scale, 0.0)[:, None],
            ],
            axis=-1,
        )
        * m[:, None]
    )  # (E, 4)
    return r, J_ref, J_query, J_s


@functools.partial(jax.jit, static_argnums=(6, 7, 8))
def _pose_graph_2d_solve(
    xyt0,  # (P, 3)
    switches0,  # (L,)
    edges: "PoseGraph2DEdges",
    free_mask,  # (P,)
    switch_penalty,
    edge_loss,  # Optional[LossFunction] per edge block
    num_poses: int,
    num_loops: int,
    options: Options,
):
    """SE(2) dense direct path: same segment-sum 3x3-block assembly,
    canonical lm.solve loop, and robust edge-loss treatment as the 3D
    solver (which see)."""
    P = num_poses
    L = num_loops
    dim = 3 * P + L
    dtype = xyt0.dtype
    E = edges.mask.shape[0]
    ref_i = edges.reference_indices
    qry_i = edges.query_indices

    if L > 0:
        loop_slot = jnp.clip(
            jnp.cumsum(edges.is_loop.astype(jnp.int32)) - 1, 0, L - 1
        )
    else:
        loop_slot = jnp.zeros((E,), jnp.int32)

    free_ref = free_mask[ref_i]
    free_qry = free_mask[qry_i]
    col_mask = jnp.concatenate(
        [jnp.repeat(free_mask, 3), jnp.ones((L,), dtype)]
    )
    threes = jnp.arange(3, dtype=jnp.int32)
    rows_ref = 3 * ref_i[:, None] + threes[None, :]  # (E, 3)
    rows_qry = 3 * qry_i[:, None] + threes[None, :]
    col_sw = 3 * P + loop_slot

    def quad(x):
        xyt = x[: 3 * P].reshape(P, 3)
        sw = x[3 * P :]
        sw_full = sw[loop_slot] if L > 0 else jnp.zeros((E,), dtype)
        r, J_ref, J_query, J_s = se2_edge_residuals_and_jacobians(
            xyt, sw_full, edges, switch_penalty
        )
        J_ref = J_ref * free_ref[:, None, None]
        J_query = J_query * free_qry[:, None, None]

        if edge_loss is not None:
            sq = jnp.sum(r * r, axis=1)
            rho, w, _ = edge_loss.evaluate(sq)
            cost = jnp.sum(rho)
            sqrt_w = jnp.sqrt(w)
            r = r * sqrt_w[:, None]
            J_ref = J_ref * sqrt_w[:, None, None]
            J_query = J_query * sqrt_w[:, None, None]
            J_s = J_s * sqrt_w[:, None]
        else:
            cost = jnp.sum(r * r)

        with jax.default_matmul_precision("highest"):
            B_rr = jnp.einsum("edi,edj->eij", J_ref, J_ref)
            B_rq = jnp.einsum("edi,edj->eij", J_ref, J_query)
            B_qq = jnp.einsum("edi,edj->eij", J_query, J_query)
            g_r = jnp.einsum("edi,ed->ei", J_ref, r)
            g_q = jnp.einsum("edi,ed->ei", J_query, r)

        H = jnp.zeros((dim, dim), dtype)
        H = H.at[rows_ref[:, :, None], rows_ref[:, None, :]].add(B_rr)
        H = H.at[rows_ref[:, :, None], rows_qry[:, None, :]].add(B_rq)
        H = H.at[rows_qry[:, :, None], rows_ref[:, None, :]].add(
            jnp.swapaxes(B_rq, 1, 2)
        )
        H = H.at[rows_qry[:, :, None], rows_qry[:, None, :]].add(B_qq)
        g = jnp.zeros((dim,), dtype)
        g = g.at[rows_ref].add(g_r).at[rows_qry].add(g_q)

        if L > 0:
            b_rs = jnp.einsum("edi,ed->ei", J_ref, J_s)
            b_qs = jnp.einsum("edi,ed->ei", J_query, J_s)
            H = H.at[rows_ref, col_sw[:, None]].add(b_rs)
            H = H.at[col_sw[:, None], rows_ref].add(b_rs)
            H = H.at[rows_qry, col_sw[:, None]].add(b_qs)
            H = H.at[col_sw[:, None], rows_qry].add(b_qs)
            H = H.at[col_sw, col_sw].add(jnp.sum(J_s * J_s, axis=1))
            g = g.at[col_sw].add(jnp.sum(J_s * r, axis=1))

        H = H + jnp.diag(1.0 - col_mask) + 1e-10 * jnp.eye(dim, dtype=dtype)
        return H, g, cost

    def retract(x, delta):
        return x + delta * col_mask

    x0 = jnp.concatenate([xyt0.reshape(-1), switches0])
    x, summary = lm.solve(quad, retract, x0, options)
    return x[: 3 * P].reshape(P, 3), x[3 * P :], summary


@functools.partial(jax.jit, static_argnums=(6, 7, 8, 9, 10))
def _pose_graph_2d_solve_cg(
    xyt0,  # (P, 3)
    switches0,  # (L,)
    edges: "PoseGraph2DEdges",
    free_mask,  # (P,)
    switch_penalty,
    edge_loss,
    num_poses: int,
    num_loops: int,
    options: Options,
    cg_iterations: int,
    cg_precond: str,
):
    """SE(2) matrix-free path: the 3-DoF-block mirror of the 3D CG
    solver (which see) — O(E) memory per LM step, chain
    block-tridiagonal or block-Jacobi preconditioning, the canonical
    lm.solve policy loop. City-scale 2D corpora (M3500/city10000) do
    not fit the dense (3P+L)^2 normal matrix; this path is their
    solver."""
    P, L = num_poses, num_loops
    dtype = xyt0.dtype
    E = edges.mask.shape[0]
    ref_i = edges.reference_indices
    qry_i = edges.query_indices
    if L > 0:
        loop_slot = jnp.clip(
            jnp.cumsum(edges.is_loop.astype(jnp.int32)) - 1, 0, L - 1
        )
    else:
        loop_slot = jnp.zeros((E,), jnp.int32)
    is_loop = edges.is_loop > 0
    free_ref = free_mask[ref_i]
    free_qry = free_mask[qry_i]
    fixed_p = (1.0 - free_mask)[:, None]

    def scatter_jt(J_ref, J_query, J_s, y):
        gp = jnp.zeros((P, 3), dtype)
        gp = gp.at[ref_i].add(jnp.sum(J_ref * y[:, :, None], axis=1))
        gp = gp.at[qry_i].add(jnp.sum(J_query * y[:, :, None], axis=1))
        if L > 0:
            gs_e = jnp.sum(J_s * y, axis=1) * is_loop
            gs = jnp.zeros((L,), dtype).at[loop_slot].add(gs_e)
        else:
            gs = jnp.zeros((0,), dtype)
        return gp, gs

    def eval_quadratic(params):
        xyt, switches = params
        sw_full = switches[loop_slot] if L > 0 else jnp.zeros((E,), dtype)
        r, J_ref, J_query, J_s = se2_edge_residuals_and_jacobians(
            xyt, sw_full, edges, switch_penalty
        )
        J_ref = J_ref * free_ref[:, None, None]
        J_query = J_query * free_qry[:, None, None]
        if edge_loss is not None:
            sq = jnp.sum(r * r, axis=1)
            rho, w, _ = edge_loss.evaluate(sq)
            cost = jnp.sum(rho)
            sqrt_w = jnp.sqrt(w)
            r = r * sqrt_w[:, None]
            J_ref = J_ref * sqrt_w[:, None, None]
            J_query = J_query * sqrt_w[:, None, None]
            J_s = J_s * sqrt_w[:, None]
        else:
            cost = jnp.sum(r * r)

        g = scatter_jt(J_ref, J_query, J_s, r)
        d_p = jnp.zeros((P, 3), dtype)
        d_p = d_p.at[ref_i].add(jnp.sum(J_ref * J_ref, axis=1))
        d_p = d_p.at[qry_i].add(jnp.sum(J_query * J_query, axis=1))
        B_p = jnp.zeros((P, 3, 3), dtype)
        B_p = B_p.at[ref_i].add(
            jnp.sum(J_ref[:, :, :, None] * J_ref[:, :, None, :], axis=1)
        )
        B_p = B_p.at[qry_i].add(
            jnp.sum(J_query[:, :, :, None] * J_query[:, :, None, :], axis=1)
        )
        if L > 0:
            d_s = jnp.zeros((L,), dtype).at[loop_slot].add(
                jnp.sum(J_s * J_s, axis=1) * is_loop
            )
        else:
            d_s = jnp.zeros((0,), dtype)

        if cg_precond == "chain":
            chain = (jnp.abs(ref_i - qry_i) == 1) & (edges.mask > 0)
            cross = jnp.sum(
                J_ref[:, :, :, None] * J_query[:, :, None, :], axis=1
            )
            cross = jnp.where(
                (ref_i < qry_i)[:, None, None],
                cross,
                jnp.swapaxes(cross, 1, 2),
            )
            lo = jnp.minimum(ref_i, qry_i)
            O_chain = jnp.zeros((P, 3, 3), dtype).at[lo].add(
                jnp.where(chain[:, None, None], cross, 0.0)
            )
        else:
            O_chain = None
        return (J_ref, J_query, J_s, d_p, d_s, B_p, O_chain), g, cost

    def solve_linear(H_rep, g, lam):
        J_ref, J_query, J_s, d_p, d_s, B_p, O_chain = H_rep
        g_p, g_s = g

        def matvec(v):
            vp, vs = v
            Jv = jnp.sum(J_ref * vp[ref_i][:, None, :], axis=2) + jnp.sum(
                J_query * vp[qry_i][:, None, :], axis=2
            )
            if L > 0:
                Jv = Jv + J_s * (vs[loop_slot] * is_loop)[:, None]
            hp, hs = scatter_jt(J_ref, J_query, J_s, Jv)
            hp = hp + lam * d_p * vp + fixed_p * vp + 1e-8 * vp
            hs = hs + lam * d_s * vs + 1e-8 * vs
            return hp, hs

        dvec = lam * d_p + fixed_p + 1e-8
        Bp = B_p + jnp.eye(3, dtype=dtype) * dvec[:, None, :]
        pre_s = (1.0 + lam) * d_s + 1e-8

        if cg_precond == "chain":
            from . import block_tridiag

            floor = 1e-3 * jnp.max(d_p, axis=1, keepdims=True) + 1e-8
            fact = block_tridiag.factor(
                Bp + jnp.eye(3, dtype=dtype) * floor[:, :, None], O_chain
            )

            def precond(v):
                return block_tridiag.solve_factored(fact, v[0]), v[1] / pre_s

        else:
            Bp_inv = jnp.linalg.inv(Bp)

            def precond(v):
                return (
                    jnp.sum(Bp_inv * v[0][:, None, :], axis=2),
                    v[1] / pre_s,
                )

        delta, _ = jax.scipy.sparse.linalg.cg(
            matvec, (-g_p, -g_s), maxiter=cg_iterations, M=precond
        )
        return delta

    def retract(params, delta):
        xyt, switches = params
        dp, ds = delta
        return (xyt + dp * free_mask[:, None], switches + ds)

    (xyt, switches), summary = lm.solve(
        eval_quadratic, retract, (xyt0, switches0), options,
        solve_linear=solve_linear,
    )
    return xyt, switches, summary


@functools.partial(jax.jit, static_argnums=(6, 7, 8, 9))
def _pose_graph_2d_solve_banded(
    xyt0,  # (P, 3) in RCM-PERMUTED order
    switches0,  # (L,)
    edges: "PoseGraph2DEdges",  # endpoint indices in PERMUTED order
    free_mask,  # (P,) permuted
    switch_penalty,
    edge_loss,
    num_poses: int,
    num_loops: int,
    super_size: int,
    options: Options,
):
    """SE(2) banded direct solver: the exact 3-DoF analog of
    :func:`_pose_graph_solve_banded` (which see for the full design
    narrative — RCM symbolic phase, superblock cyclic reduction, exact
    per-edge switch elimination, f32-factor + iterative-refinement f64).
    Pose blocks are 3 wide (x, y, theta) and superblock panels are
    (3s x 3s); M3500-class city graphs whose dense (3P)^2 matrix does
    not fit become a few hundred MXU panels."""
    P, L = num_poses, num_loops
    s = super_size
    K = max(1, -(-P // s))
    Pp = K * s
    dtype = xyt0.dtype
    E = edges.mask.shape[0]
    ref_i = edges.reference_indices
    qry_i = edges.query_indices

    if L > 0:
        loop_slot = jnp.clip(
            jnp.cumsum(edges.is_loop.astype(jnp.int32)) - 1, 0, L - 1
        )
    else:
        loop_slot = jnp.zeros((E,), jnp.int32)
    is_loop = edges.is_loop > 0

    free_ref = free_mask[ref_i]
    free_qry = free_mask[qry_i]
    fixed_p = (1.0 - free_mask)[:, None]

    swap = qry_i < ref_i
    lo_i = jnp.where(swap, qry_i, ref_i)
    hi_i = jnp.where(swap, ref_i, qry_i)
    k_lo, r_lo = lo_i // s, lo_i % s
    k_hi, r_hi = hi_i // s, hi_i % s
    same_k = (k_lo == k_hi)[:, None, None]

    def accumulate_pose(contrib_ref, contrib_qry):
        out = jnp.zeros((P,) + contrib_ref.shape[1:], dtype)
        return out.at[ref_i].add(contrib_ref).at[qry_i].add(contrib_qry)

    def eval_quadratic(params):
        xyt, switches = params
        sw_full = switches[loop_slot] if L > 0 else jnp.zeros((E,), dtype)
        r, J_ref, J_query, J_s = se2_edge_residuals_and_jacobians(
            xyt, sw_full, edges, switch_penalty
        )
        J_ref = J_ref * free_ref[:, None, None]
        J_query = J_query * free_qry[:, None, None]

        if edge_loss is not None:
            sq = jnp.sum(r * r, axis=1)
            rho, w, _ = edge_loss.evaluate(sq)
            cost = jnp.sum(rho)
            sqrt_w = jnp.sqrt(w)
            r = r * sqrt_w[:, None]
            J_ref = J_ref * sqrt_w[:, None, None]
            J_query = J_query * sqrt_w[:, None, None]
            J_s = J_s * sqrt_w[:, None]
        else:
            cost = jnp.sum(r * r)

        g_p = accumulate_pose(
            jnp.sum(J_ref * r[:, :, None], axis=1),
            jnp.sum(J_query * r[:, :, None], axis=1),
        )
        if L > 0:
            gs_e = jnp.sum(J_s * r, axis=1) * is_loop
            g_s = jnp.zeros((L,), dtype).at[loop_slot].add(gs_e)
        else:
            g_s = jnp.zeros((0,), dtype)

        d_p = accumulate_pose(
            jnp.sum(J_ref * J_ref, axis=1), jnp.sum(J_query * J_query, axis=1)
        )
        if L > 0:
            d_s = jnp.zeros((L,), dtype).at[loop_slot].add(
                jnp.sum(J_s * J_s, axis=1) * is_loop
            )
        else:
            d_s = jnp.zeros((0,), dtype)

        H_rep = (J_ref, J_query, J_s, d_p, d_s)
        return H_rep, (g_p, g_s), cost

    def solve_linear(H_rep, g, lam):
        J_ref, J_query, J_s, d_p, d_s = H_rep
        g_p, g_s = g

        J_lo = jnp.where(swap[:, None, None], J_query, J_ref)  # (E, 4, 3)
        J_hi = jnp.where(swap[:, None, None], J_ref, J_query)

        B_ll = jnp.sum(J_lo[:, :, :, None] * J_lo[:, :, None, :], axis=1)
        B_hh = jnp.sum(J_hi[:, :, :, None] * J_hi[:, :, None, :], axis=1)
        B_hl = jnp.sum(J_hi[:, :, :, None] * J_lo[:, :, None, :], axis=1)

        b_p = -g_p

        if L > 0:
            c = J_s  # (E, 4)
            cc = jnp.sum(c * c, axis=1)
            gamma = cc + lam * d_s[loop_slot] + 1e-8
            inv_gamma = jnp.where(is_loop, 1.0 / gamma, 0.0)
            Jlc = jnp.sum(J_lo * c[:, :, None], axis=1)  # (E, 3)
            Jhc = jnp.sum(J_hi * c[:, :, None], axis=1)
            g_s_e = g_s[loop_slot]
            coef = inv_gamma * g_s_e
            b_p = b_p.at[lo_i].add(Jlc * coef[:, None])
            b_p = b_p.at[hi_i].add(Jhc * coef[:, None])
            B_ll = B_ll - inv_gamma[:, None, None] * (
                Jlc[:, :, None] * Jlc[:, None, :]
            )
            B_hh = B_hh - inv_gamma[:, None, None] * (
                Jhc[:, :, None] * Jhc[:, None, :]
            )
            B_hl = B_hl - inv_gamma[:, None, None] * (
                Jhc[:, :, None] * Jlc[:, None, :]
            )

        Dsup = jnp.zeros((K, s, 3, s, 3), dtype)
        Dsup = Dsup.at[k_lo, r_lo, :, r_lo, :].add(B_ll)
        Dsup = Dsup.at[k_hi, r_hi, :, r_hi, :].add(B_hh)
        B_hl_T = jnp.swapaxes(B_hl, -1, -2)
        Dsup = Dsup.at[k_lo, r_hi, :, r_lo, :].add(
            jnp.where(same_k, B_hl, 0.0)
        )
        Dsup = Dsup.at[k_lo, r_lo, :, r_hi, :].add(
            jnp.where(same_k, B_hl_T, 0.0)
        )
        D = Dsup.reshape(K, s * 3, s * 3)
        if K > 1:
            Osup = jnp.zeros((K - 1, s, 3, s, 3), dtype)
            k_off = jnp.minimum(k_lo, K - 2)
            Osup = Osup.at[k_off, r_lo, :, r_hi, :].add(
                jnp.where(same_k, 0.0, B_hl_T)
            )
            O = Osup.reshape(K - 1, s * 3, s * 3)
        else:
            O = jnp.zeros((0, s * 3, s * 3), dtype)

        dvec = lam * d_p + fixed_p + 1e-8  # (P, 3)
        dpad = jnp.concatenate(
            [dvec, jnp.ones((Pp - P, 3), dtype)], axis=0
        ).reshape(K, s * 3)
        D = D + jnp.eye(s * 3, dtype=dtype) * dpad[:, None, :]

        rhs = jnp.concatenate(
            [b_p, jnp.zeros((Pp - P, 3), dtype)], axis=0
        ).reshape(K, s * 3)
        cutoff = max(1, 4096 // (s * 3))
        if dtype == jnp.float64:
            fact = block_tridiag.factor(
                D.astype(jnp.float32), O.astype(jnp.float32), cutoff
            )

            def banded_matvec(x):
                with jax.default_matmul_precision("highest"):
                    y = jnp.einsum("kij,kj->ki", D, x)
                    if K > 1:
                        y = y.at[:-1].add(jnp.einsum("kij,kj->ki", O, x[1:]))
                        y = y.at[1:].add(jnp.einsum("kji,kj->ki", O, x[:-1]))
                return y

            x = block_tridiag.solve_factored(
                fact, rhs.astype(jnp.float32)
            ).astype(dtype)
            for _ in range(2):
                resid = rhs - banded_matvec(x)
                x = x + block_tridiag.solve_factored(
                    fact, resid.astype(jnp.float32)
                ).astype(dtype)
        else:
            x = block_tridiag.solve(D, O, rhs, dense_cutoff=cutoff)
        dp = x.reshape(Pp, 3)[:P]

        if L > 0:
            v = jnp.sum(J_lo * dp[lo_i][:, None, :], axis=2) + jnp.sum(
                J_hi * dp[hi_i][:, None, :], axis=2
            )  # (E, 4)
            ds_e = jnp.where(
                is_loop,
                (-g_s[loop_slot] - jnp.sum(c * v, axis=1)) * inv_gamma,
                0.0,
            )
            ds = jnp.zeros((L,), dtype).at[loop_slot].add(ds_e)
        else:
            ds = jnp.zeros((0,), dtype)
        return dp, ds

    def retract(params, delta):
        xyt, switches = params
        dp, ds = delta
        return (xyt + dp * free_mask[:, None], switches + ds)

    from . import block_tridiag

    (xyt, switches), summary = lm.solve(
        eval_quadratic, retract, (xyt0, switches0), options,
        solve_linear=solve_linear,
    )
    return xyt, switches, summary


@functools.partial(jax.jit, static_argnums=(6, 7, 8))
def _pose_graph_2d_solve_batch(
    xyt0_b,  # (B, P, 3)
    switches0_b,  # (B, L)
    edges: "PoseGraph2DEdges",  # relative_xyt (B, E, 3); rest shared
    free_mask,
    switch_penalty,
    edge_loss,
    num_poses: int,
    num_loops: int,
    options: Options,
):
    """SE(2) analog of _pose_graph_solve_batch (which see): B instances
    of one topology as one vmapped dense device program."""

    def one(xyt0, sw0, rel):
        e = edges._replace(relative_xyt=rel)
        return _pose_graph_2d_solve(
            xyt0, sw0, e, free_mask, switch_penalty, edge_loss,
            num_poses, num_loops, options,
        )

    return jax.vmap(one)(xyt0_b, switches0_b, edges.relative_xyt)


class PoseGraphOptimizer2D:
    """SE(2) pose-graph optimizer; same API shape as the 3D one."""

    def __init__(
        self,
        dtype=jnp.float64,
        switch_penalty: float = None,
        edge_loss=None,
        solver: str = "dense",
        cg_iterations: int = 250,
        cg_precond: str = "chain",
    ):
        """``solver``: "auto" picks dense/banded/sparse/cg from the
        graph's topology at solve() time (see :func:`select_solver`;
        the choice lands in ``self.last_solver_choice``);
        "dense" materializes the (3P+L)^2 normal matrix;
        "cg" is the matrix-free path for city-scale 2D corpora
        (M3500/city10000 do not fit dense) — same ``cg_iterations`` /
        ``cg_precond`` semantics as the 3D optimizer (which see);
        "banded" is the DIRECT solver for those same large graphs (RCM
        ordering + superblock cyclic reduction, the SE(2) analog of the
        3D optimizer's banded path — exact damped-GN steps where
        truncated CG is not);
        "sparse" is the nested-dissection multifrontal direct solver
        (solvers/multifrontal.py) for loop-rich fat-bandwidth city
        graphs (Olson M3500-class) whose RCM bandwidth grows with the
        arena diameter — sqrt(P) geometric separators keep the
        factorization O(P^{3/2}) where banded superblocks go near-dense."""
        from ..ops.relative_pose import SWITCH_PENALTY_SCALE

        if solver not in ("auto", "dense", "cg", "banded", "sparse"):
            raise ValueError(f"unknown solver {solver!r}")
        if cg_precond not in ("chain", "jacobi"):
            raise ValueError(f"unknown cg_precond {cg_precond!r}")
        self.dtype = dtype
        self.edge_loss = edge_loss
        self.solver = solver
        self.cg_iterations = cg_iterations
        self.cg_precond = cg_precond
        self.switch_penalty = (
            SWITCH_PENALTY_SCALE if switch_penalty is None else switch_penalty
        )
        self._poses: Dict[int, "np.ndarray"] = {}  # index -> (x, y, theta)
        self._constant: set = set()
        self._constraints: List[dict] = []
        # nested-dissection plan cache: (P, E, edge-array hash) -> Plan
        self._sparse_plan = None

    def set_pose(self, index: int, xyt) -> None:
        self._poses[index] = np.asarray(xyt, dtype=np.float64).copy()

    def set_pose_constant(self, index: int) -> None:
        if index not in self._poses:
            raise KeyError(f"pose {index} not registered")
        self._constant.add(index)

    def set_constraint(
        self,
        reference_index: int,
        query_index: int,
        relative_xyt,
        constraint_type: int = ConstraintType.ODOMETRY,
        sqrt_info=None,
    ) -> None:
        """``sqrt_info``: optional whitening — scalar, (2,) =
        (1/sigma_t, 1/sigma_theta), (3,) diagonal = (x, y, theta), or a
        full (3, 3) sqrt-information matrix (see
        :func:`sqrt_info_from_information` / io.g2o)."""
        if reference_index not in self._poses or query_index not in self._poses:
            raise KeyError("constraint endpoints must be registered poses")
        if reference_index == query_index:
            raise ValueError("self-constraint is not allowed")
        self._constraints.append(
            dict(
                reference_index=reference_index,
                query_index=query_index,
                relative_xyt=np.asarray(relative_xyt, np.float64).copy(),
                type=constraint_type,
                sqrt_info=_expand_sqrt_info_2d(sqrt_info),
            )
        )

    def get_pose(self, index: int) -> "np.ndarray":
        return self._poses[index].copy()

    def pose_indices(self) -> "List[int]":
        """Registered pose ids, sorted (the solver's packing order)."""
        return sorted(self._poses)

    def constraints(self) -> "List[dict]":
        """Shallow copies of the registered constraint records
        (reference_index, query_index, relative_xyt, type, sqrt_info)."""
        return [dict(c) for c in self._constraints]

    def initialize(
        self,
        method: str = "chordal",
        include_loops: bool = True,
        cg_iterations: int = 300,
    ) -> None:
        """SE(2) counterpart of PoseGraphOptimizer.initialize (which see):
        replace non-constant estimates with a spanning-tree or chordal
        (complex rotation averaging) initialization from the edge
        measurements."""
        from . import graph_init

        indices = sorted(self._poses)
        index_of = {pi: i for i, pi in enumerate(indices)}
        P = len(indices)
        cons = self._constraints
        if not include_loops:
            cons = [c for c in cons if c["type"] != ConstraintType.LOOP]
        ref_idx = np.array([index_of[c["reference_index"]] for c in cons], np.int32)
        query_idx = np.array([index_of[c["query_index"]] for c in cons], np.int32)
        rel_xyt = (
            np.stack([c["relative_xyt"] for c in cons])
            if cons
            else np.zeros((0, 3))
        )
        is_loop = np.array(
            [1.0 if c["type"] == ConstraintType.LOOP else 0.0 for c in cons]
        )
        anchor_ids = sorted(self._constant) or [indices[0]]
        anchors = {index_of[pi]: self._poses[pi].copy() for pi in anchor_ids}

        if method == "spanning_tree":
            xyt = graph_init.spanning_tree_init_2d(
                ref_idx, query_idx, rel_xyt, P, anchors, edge_priority=is_loop
            )
        elif method == "chordal":
            xyt = graph_init.chordal_init_2d(
                ref_idx, query_idx, rel_xyt, P, anchors,
                cg_iterations=cg_iterations,
            )
        else:
            raise ValueError(
                f"unknown initialization method {method!r} "
                "(spanning_tree | chordal)"
            )
        for pi in indices:
            if pi in self._constant:
                continue
            self._poses[pi] = xyt[index_of[pi]].copy()

    def _flat_2d(self):
        """Pack the registry into solver arrays (shared by solve and
        solve_batch)."""
        indices = sorted(self._poses)
        index_of = {pi: i for i, pi in enumerate(indices)}
        P = len(indices)
        xyt = np.stack([self._poses[pi] for pi in indices])

        E = len(self._constraints)
        is_loop = np.array(
            [1.0 if c["type"] == ConstraintType.LOOP else 0.0 for c in self._constraints]
        )
        L = int(is_loop.sum())
        dtype = self.dtype
        edges = PoseGraph2DEdges(
            reference_indices=jnp.asarray(
                [index_of[c["reference_index"]] for c in self._constraints],
                jnp.int32,
            ),
            query_indices=jnp.asarray(
                [index_of[c["query_index"]] for c in self._constraints], jnp.int32
            ),
            relative_xyt=jnp.asarray(
                np.stack([c["relative_xyt"] for c in self._constraints]), dtype
            ),
            is_loop=jnp.asarray(is_loop, dtype),
            mask=jnp.ones((E,), dtype),
            sqrt_info=(
                None
                if (
                    w3 := stack_sqrt_info(
                        [c["sqrt_info"] for c in self._constraints], 3
                    )
                )
                is None
                else jnp.asarray(w3, dtype)
            ),
        )
        free = np.ones(P)
        for pi in self._constant:
            free[index_of[pi]] = 0.0
        return indices, index_of, P, E, L, xyt, edges, free

    def _sparse_symbolic(self, P, edges, xyt):
        """Cached nested-dissection plan (solvers/multifrontal.py); the
        (x, y) pose positions seed the geometric median cuts. Cache key
        is the topology (endpoint arrays), not the pose values."""
        from . import multifrontal

        ref_np = np.asarray(edges.reference_indices, np.int64)
        qry_np = np.asarray(edges.query_indices, np.int64)
        key = (P, len(ref_np), ref_np.tobytes(), qry_np.tobytes())
        if self._sparse_plan is not None and self._sparse_plan[0] == key:
            return self._sparse_plan[1]
        plan = multifrontal.symbolic(
            P, ref_np, qry_np, d=3, coords=np.asarray(xyt[:, :2], np.float64),
            leaf_size=32,
        )
        acc = multifrontal.accumulate_rounds(P, ref_np, qry_np)
        self._sparse_plan = (key, (plan, acc))
        return plan, acc

    def solve(self, options: Optional[Options] = None):
        if options is None:
            options = Options().replace(max_iterations=500)
        if not self._constraints:
            raise ValueError(
                "PoseGraphOptimizer2D.solve: no constraints registered; add "
                "edges with set_constraint() before solving"
            )
        indices, index_of, P, E, L, xyt, edges, free = self._flat_2d()
        dtype = self.dtype

        solver = self.solver
        if solver == "auto":
            # no SE(2) tridiag path exists; a tight band covers chains
            solver, self.last_selection = select_solver(
                P,
                np.asarray(edges.reference_indices, np.int64),
                np.asarray(edges.query_indices, np.int64),
                np.asarray(edges.is_loop),
                3,
                plan_fn=lambda: self._sparse_symbolic(P, edges, xyt)[0],
                allow_tridiag=False,
            )
        self.last_solver_choice = solver

        if solver == "sparse":
            plan, acc = self._sparse_symbolic(P, edges, xyt)
            out_xyt, sw, summary = _pose_graph_2d_solve_sparse(
                jnp.asarray(xyt, dtype),
                jnp.ones((L,), dtype),
                edges,
                jnp.asarray(free, dtype),
                jnp.asarray(self.switch_penalty, dtype),
                self.edge_loss,
                P,
                L,
                plan,
                options,
                jnp.asarray(acc),
            )
        elif solver == "banded":
            # HOST symbolic phase (same recipe as the 3D optimizer's
            # _flatten_banded): RCM pose ordering bounds the block
            # bandwidth; recomputed per solve — RCM on a 10k-pose graph
            # costs ~ms, far below one LM iteration.
            from scipy.sparse import coo_matrix
            from scipy.sparse.csgraph import reverse_cuthill_mckee

            ref_np = np.asarray(edges.reference_indices, np.int64)
            qry_np = np.asarray(edges.query_indices, np.int64)
            A = coo_matrix(
                (np.ones(len(ref_np)), (ref_np, qry_np)), shape=(P, P)
            )
            A = (A + A.T).tocsr()
            perm = np.asarray(reverse_cuthill_mckee(A, symmetric_mode=True))
            inv = np.empty(P, np.int64)
            inv[perm] = np.arange(P)
            ref_p = inv[ref_np]
            qry_p = inv[qry_np]
            bandwidth = int(np.abs(ref_p - qry_p).max()) if len(ref_p) else 1
            ssize = max(bandwidth, 8)
            K = -(-P // ssize)
            itemsize = jnp.zeros((), dtype).dtype.itemsize
            panel_bytes = K * (ssize * 3) ** 2 * itemsize
            if panel_bytes > 2 << 30:
                raise ValueError(
                    f"banded solver: RCM bandwidth {bandwidth} over {P} "
                    f"poses needs ~{2 * panel_bytes / 1e9:.1f} GB of "
                    "superblock panels; use solver='cg' instead"
                )
            edges_p = edges._replace(
                reference_indices=jnp.asarray(ref_p.astype(np.int32)),
                query_indices=jnp.asarray(qry_p.astype(np.int32)),
            )
            xyt_p, sw, summary = _pose_graph_2d_solve_banded(
                jnp.asarray(xyt[perm], dtype),
                jnp.ones((L,), dtype),
                edges_p,
                jnp.asarray(free[perm], dtype),
                jnp.asarray(self.switch_penalty, dtype),
                self.edge_loss,
                P,
                L,
                ssize,
                options,
            )
            out_xyt = xyt_p[jnp.asarray(inv)]
        elif solver == "cg":
            out_xyt, sw, summary = _pose_graph_2d_solve_cg(
                jnp.asarray(xyt, dtype),
                jnp.ones((L,), dtype),
                edges,
                jnp.asarray(free, dtype),
                jnp.asarray(self.switch_penalty, dtype),
                self.edge_loss,
                P,
                L,
                options,
                self.cg_iterations,
                self.cg_precond,
            )
        else:
            out_xyt, sw, summary = _pose_graph_2d_solve(
                jnp.asarray(xyt, dtype),
                jnp.ones((L,), dtype),
                edges,
                jnp.asarray(free, dtype),
                jnp.asarray(self.switch_penalty, dtype),
                self.edge_loss,
                P,
                L,
                options,
            )
        # ONE batched fetch for every output incl. the summary scalars
        # (round 5: each separate np.asarray(device_array) fetch cost
        # ~600 ms through the relay on a 10k-pose solve — 4 of them were
        # 2.4 s of a 2.6 s wall whose device program runs in ~2 ms)
        out_xyt, sw, summary = jax.device_get((out_xyt, sw, summary))
        out = np.asarray(out_xyt, np.float64)
        for i, pi in enumerate(indices):
            # wrap theta on write-back (the SE(2) analog of quaternion
            # renormalization)
            o = out[i].copy()
            o[2] = float(np.arctan2(np.sin(o[2]), np.cos(o[2])))
            self._poses[pi] = o
        sw = np.asarray(sw, np.float64)
        self._last_switches = sw.copy()
        return summary, sw

    def solve_batch(
        self,
        batch_size: Optional[int] = None,
        initial_xyt=None,  # (B, P, 3), pose_indices() order
        relative_xyt=None,  # (B, E, 3), constraints() order
        options: Optional[Options] = None,
    ):
        """B independent instances sharing THIS graph's topology in one
        vmapped dense device program — the SE(2) analog of
        :meth:`PoseGraphOptimizer.solve_batch` (which see for semantics:
        shared topology/gauge/weights, per-instance initial states and
        edge measurements, registry NOT written back). Returns
        ``(xyt (B, P, 3) theta-wrapped, switches (B, L), summary)``."""
        if self.solver not in ("dense", "auto"):
            raise ValueError(
                "solve_batch runs on the dense direct path; construct the "
                "optimizer with solver='dense'"
            )
        if self.solver == "auto" and 3 * len(self._poses) > 6000:
            raise ValueError(
                "solve_batch materializes B dense (3P+L)^2 systems — at "
                f"{len(self._poses)} poses that is far past the dense "
                "envelope; construct with solver='dense' explicitly to "
                "override"
            )
        if options is None:
            options = Options().replace(max_iterations=500)
        if not self._constraints:
            raise ValueError(
                "PoseGraphOptimizer2D.solve_batch: no constraints registered"
            )
        indices, index_of, P, E, L, xyt, edges, free = self._flat_2d()
        dtype = self.dtype

        sizes = {
            np.shape(a)[0]
            for a in (initial_xyt, relative_xyt)
            if a is not None
        }
        if batch_size is not None:
            sizes.add(int(batch_size))
        if len(sizes) != 1:
            raise ValueError(
                f"inconsistent or missing batch size: {sorted(sizes)}; pass "
                "batch_size= or at least one (B, ...) per-instance array"
            )
        B = sizes.pop()

        def _batched(arr, default, shape, name):
            if arr is None:
                return jnp.broadcast_to(
                    jnp.asarray(default, dtype), (B,) + shape
                )
            a = jnp.asarray(arr, dtype)
            if a.shape != (B,) + shape:
                raise ValueError(
                    f"{name} must be (B,) + {shape}; got {a.shape}"
                )
            return a

        xyt_b = _batched(initial_xyt, xyt, (P, 3), "initial_xyt")
        rel_b = _batched(
            relative_xyt, edges.relative_xyt, (E, 3), "relative_xyt"
        )
        out_xyt, sw, summary = _pose_graph_2d_solve_batch(
            xyt_b,
            jnp.ones((B, L), dtype),
            edges._replace(relative_xyt=rel_b),
            jnp.asarray(free, dtype),
            jnp.asarray(self.switch_penalty, dtype),
            self.edge_loss,
            P,
            L,
            options,
        )
        out_xyt, sw, summary = jax.device_get((out_xyt, sw, summary))
        out = np.array(out_xyt, np.float64)  # writable copy
        out[:, :, 2] = np.arctan2(np.sin(out[:, :, 2]), np.cos(out[:, :, 2]))
        return out, np.asarray(sw, np.float64), summary

    def covariance(
        self,
        indices: Optional[List[int]] = None,
        method: str = "auto",
    ) -> Dict[int, np.ndarray]:
        """Marginal 3x3 (x, y, theta) covariance blocks per pose — the
        SE(2) analog of :meth:`PoseGraphOptimizer.covariance` (which see;
        SE(2) needs no tangent chart, the ambient coordinates are the
        chart). Host-side f64 numpy linearization at the current
        estimates with the last solve's switch values.

        ``method``: "dense" (full (3P+L)^2 inverse), "banded" (RCM
        superblock selected-inverse recurrence), "sparse" (multifrontal
        selected inverse over the dissection tree — the engine for
        fat-bandwidth city arenas where the band recurrence goes
        near-dense), or "auto". All return the same blocks to f64
        roundoff."""
        if method not in ("auto", "dense", "banded", "sparse"):
            raise ValueError(f"unknown covariance method {method!r}")
        if not self._constraints:
            raise ValueError("covariance: no constraints registered")
        if not self._constant:
            raise ValueError(
                "covariance: gauge-free graph has unbounded covariance; "
                "fix at least one pose with set_pose_constant()"
            )
        # auto resolution happens after the bandwidth estimate below
        indices_all = sorted(self._poses)
        index_of = {pi: i for i, pi in enumerate(indices_all)}
        P = len(indices_all)
        xyt = np.stack([self._poses[pi] for pi in indices_all])
        E = len(self._constraints)
        ref_i = np.array([index_of[c["reference_index"]] for c in self._constraints])
        qry_i = np.array([index_of[c["query_index"]] for c in self._constraints])
        rel = np.stack([c["relative_xyt"] for c in self._constraints])
        is_loop = np.array(
            [1.0 if c["type"] == ConstraintType.LOOP else 0.0 for c in self._constraints]
        )
        L = int(is_loop.sum())
        sw_slot = np.cumsum(is_loop.astype(int)) - 1
        last = getattr(self, "_last_switches", None)
        if last is None or len(last) != L:
            last = np.ones(L)
        sw = np.where(is_loop > 0, last[np.clip(sw_slot, 0, max(L - 1, 0))], 1.0) if L else np.ones(E)

        # numpy twin of se2_edge_residuals_and_jacobians (same formulas)
        c_ = np.cos(xyt[ref_i, 2]); sn = np.sin(xyt[ref_i, 2])
        dx = xyt[qry_i, 0] - xyt[ref_i, 0]
        dy = xyt[qry_i, 1] - xyt[ref_i, 1]
        dth = xyt[qry_i, 2] - xyt[ref_i, 2] - rel[:, 2]
        dth = np.arctan2(np.sin(dth), np.cos(dth))
        r3 = np.stack(
            [c_ * dx + sn * dy - rel[:, 0], -sn * dx + c_ * dy - rel[:, 1], dth], -1
        )
        zero = np.zeros(E); one = np.ones(E)
        J3_ref = np.stack(
            [
                np.stack([-c_, -sn, -sn * dx + c_ * dy], -1),
                np.stack([sn, -c_, -c_ * dx - sn * dy], -1),
                np.stack([zero, zero, -one], -1),
            ],
            -2,
        )
        J3_qry = np.stack(
            [
                np.stack([c_, sn, zero], -1),
                np.stack([-sn, c_, zero], -1),
                np.stack([zero, zero, one], -1),
            ],
            -2,
        )
        w3 = stack_sqrt_info([cst["sqrt_info"] for cst in self._constraints], 3)
        if w3 is not None:
            r3, J3_ref, J3_qry = apply_sqrt_info(w3, r3, J3_ref, J3_qry)
        # switchable scaling + robust loss weights (4th penalty row has
        # no pose columns, so only the J_s/switch column sees it)
        penalty = np.where(is_loop > 0, (1.0 - sw) * self.switch_penalty, 0.0)
        r4 = np.concatenate([r3 * sw[:, None], penalty[:, None]], axis=1)
        J_ref4 = np.concatenate([J3_ref * sw[:, None, None], np.zeros((E, 1, 3))], axis=1)
        J_qry4 = np.concatenate([J3_qry * sw[:, None, None], np.zeros((E, 1, 3))], axis=1)
        J_s4 = np.concatenate(
            [np.where(is_loop[:, None] > 0, r3, 0.0),
             np.where(is_loop > 0, -self.switch_penalty, 0.0)[:, None]],
            axis=1,
        )
        if self.edge_loss is not None:
            sq = np.sum(r4 * r4, axis=1)
            _, w, _ = self.edge_loss.evaluate(sq)
            sqrt_w = np.sqrt(np.asarray(w, np.float64))
            J_ref4 = J_ref4 * sqrt_w[:, None, None]
            J_qry4 = J_qry4 * sqrt_w[:, None, None]
            J_s4 = J_s4 * sqrt_w[:, None]

        free = np.array([0.0 if pi in self._constant else 1.0 for pi in indices_all])
        J_ref4 = J_ref4 * free[ref_i][:, None, None]
        J_qry4 = J_qry4 * free[qry_i][:, None, None]

        if method == "auto":
            # mirror the 3D policy: dense for small graphs, banded when
            # the band is host-feasible, else the multifrontal selected
            # inverse (round-4 review: the previous auto always picked
            # banded and could allocate tens of GB on band-hostile
            # topologies)
            if P <= 500:
                method = "dense"
            else:
                _, _, bw_a = _rcm_perm_bandwidth(P, ref_i, qry_i)
                s_a = max(bw_a, 8)
                K_a = max(1, -(-P // s_a))
                method = (
                    "banded"
                    if 2 * K_a * (s_a * 3) ** 2 * 8 <= 4 << 30
                    else "sparse"
                )
        if method in ("banded", "sparse"):
            # exact per-edge switch elimination (information form), then
            # the shared selected-inverse engines
            B_aa, B_bb, B_ab = _np_edge_information_blocks(
                J_ref4, J_qry4, J_s4
            )
            if method == "sparse":
                # multifrontal selected inverse (Takahashi on the
                # dissection tree) — device-batched, see multifrontal.py
                from . import multifrontal

                plan, _ = self._sparse_symbolic(
                    P,
                    PoseGraph2DEdges(
                        reference_indices=jnp.asarray(ref_i, jnp.int32),
                        query_indices=jnp.asarray(qry_i, jnp.int32),
                        relative_xyt=jnp.zeros((E, 3)),
                        is_loop=jnp.asarray(is_loop),
                        mask=jnp.ones((E,)),
                    ),
                    xyt,
                )
                diagv = np.tile((1.0 - free)[:, None], (1, 3))
                fact = multifrontal.factor(
                    plan, jnp.asarray(B_aa), jnp.asarray(B_bb),
                    jnp.asarray(B_ab), jnp.asarray(diagv),
                )
                blocks = np.asarray(
                    multifrontal.selected_inverse_diag(plan, fact)
                )
                if indices is None:
                    indices = indices_all
                return {
                    pi: (
                        np.zeros((3, 3))
                        if pi in self._constant
                        else np.array(blocks[index_of[pi]], np.float64)
                    )
                    for pi in indices
                }
            perm, pinv, bw = _rcm_perm_bandwidth(P, ref_i, qry_i)
            s = max(bw, 8)
            ref_p, qry_p = pinv[ref_i], pinv[qry_i]
            swap = qry_p < ref_p
            lo = np.where(swap, qry_p, ref_p)
            hi = np.where(swap, ref_p, qry_p)
            B_ll = np.where(swap[:, None, None], B_bb, B_aa)
            B_hh = np.where(swap[:, None, None], B_aa, B_bb)
            B_hl = np.where(swap[:, None, None], B_ab, np.swapaxes(B_ab, 1, 2))
            K, m, Dp, Op = _scatter_banded_blocks(
                P, 3, s, lo, hi, B_ll, B_hh, B_hl, 1.0 - free[perm]
            )
            sig_blocks = _block_tridiag_selected_inverse(K, m, Dp, Op)
            if indices is None:
                indices = indices_all
            out = {}
            for pi in indices:
                if pi in self._constant:
                    out[pi] = np.zeros((3, 3))
                    continue
                q = int(pinv[index_of[pi]])
                k, r = q // s, q % s
                out[pi] = sig_blocks[k][
                    r * 3:(r + 1) * 3, r * 3:(r + 1) * 3
                ].copy()
            return out

        dim = 3 * P + L
        H = np.zeros((dim, dim))
        threes = np.arange(3)
        rows_ref = 3 * ref_i[:, None] + threes[None, :]
        rows_qry = 3 * qry_i[:, None] + threes[None, :]
        np.add.at(H, (rows_ref[:, :, None], rows_ref[:, None, :]),
                  np.einsum("edi,edj->eij", J_ref4, J_ref4))
        np.add.at(H, (rows_qry[:, :, None], rows_qry[:, None, :]),
                  np.einsum("edi,edj->eij", J_qry4, J_qry4))
        cross = np.einsum("edi,edj->eij", J_ref4, J_qry4)
        np.add.at(H, (rows_ref[:, :, None], rows_qry[:, None, :]), cross)
        np.add.at(H, (rows_qry[:, :, None], rows_ref[:, None, :]),
                  np.swapaxes(cross, 1, 2))
        if L:
            cols_sw = 3 * P + sw_slot
            b_rs = np.einsum("edi,ed->ei", J_ref4, J_s4)
            b_qs = np.einsum("edi,ed->ei", J_qry4, J_s4)
            np.add.at(H, (rows_ref, cols_sw[:, None]), b_rs)
            np.add.at(H, (cols_sw[:, None], rows_ref), b_rs)
            np.add.at(H, (rows_qry, cols_sw[:, None]), b_qs)
            np.add.at(H, (cols_sw[:, None], rows_qry), b_qs)
            np.add.at(H, (cols_sw, cols_sw), np.sum(J_s4 * J_s4, axis=1))

        keep = np.concatenate([np.repeat(free, 3).astype(bool), np.ones(L, bool)])
        try:
            Sigma_red = np.linalg.inv(H[np.ix_(keep, keep)])
        except np.linalg.LinAlgError as exc:
            raise ValueError(
                "covariance: information matrix is singular — the graph "
                "is under-constrained"
            ) from exc
        Sigma = np.zeros((dim, dim))
        kk = np.nonzero(keep)[0]
        Sigma[np.ix_(kk, kk)] = Sigma_red
        if indices is None:
            indices = indices_all
        return {
            pi: Sigma[3 * index_of[pi] : 3 * index_of[pi] + 3,
                      3 * index_of[pi] : 3 * index_of[pi] + 3].copy()
            for pi in indices
        }


# ----------------------------------------------------------------------------
# Matrix-free CG solve for LARGE graphs.
# The dense path materializes the (7P+L)^2 normal matrix via one-hot
# scatter — ideal on the MXU up to a few thousand poses, quadratic memory
# beyond. This path never forms H: the damped-normal-equation matvec is
# two edge-batched contractions (gather -> per-edge 7x7 block matvec ->
# scatter-add), so memory is O(E) and the solve scales to 100k+ poses.
# This realizes the reference's unwritten "sparse Hessian / Sparse
# Cholesky" TODO (pose_graph_optimizer_analytic.cc:12-51) the TPU way:
# Krylov iterations of batched gathers instead of sparse factorization.
# ----------------------------------------------------------------------------


@functools.partial(jax.jit, static_argnums=(7, 8, 9, 10, 11))
def _pose_graph_solve_cg(
    positions0,
    quaternions0,
    switches0,
    edges: PoseGraphEdges,
    free_mask,
    switch_penalty,
    edge_loss,  # Optional[LossFunction] robustifying each edge block
    num_poses: int,
    num_loops: int,
    options: Options,
    cg_iterations: int,
    cg_precond: str = "chain",
):
    """Matrix-free LM: the canonical ``lm.solve`` policy loop with a
    preconditioned-CG linear step. ``eval_quadratic`` returns the
    per-edge Jacobian blocks as the operator representation (never forming
    H), and ``solve_linear`` runs the damped matvec CG — so the lambda
    schedule, convergence checks, and per-iteration records are the same
    single implementation every other solver uses (no duplicated policy
    loop, real IterationRecords).

    ``cg_precond`` selects the preconditioner:

    - "chain" (default): the block-TRIDIAGONAL part of the damped H —
      full per-pose 7x7 blocks plus the off-diagonal coupling blocks of
      consecutive-pose edges — factored by the cyclic-reduction direct
      solver (block_tridiag.factor) once per LM step and applied in
      log-depth per CG iteration. SLAM graphs are odometry chains plus
      loop closures, so this preconditioner is EXACT up to the loop
      off-diagonals: a pure chain converges in O(1) CG iterations, and
      loopy graphs (sphere2500-style, one closure per pose) converge
      several-fold faster than block-Jacobi, which ignores ALL
      inter-pose coupling and stalls on the chain's long-wavelength
      modes.
    - "jacobi": the per-pose damped 7x7 diagonal blocks only (the
      round-1 behavior; cheapest per iteration, no chain information).
    """
    E = edges.mask.shape[0]
    if num_loops > 0:
        loop_slot = jnp.clip(
            jnp.cumsum(edges.is_loop.astype(jnp.int32)) - 1, 0, num_loops - 1
        )
    else:
        loop_slot = jnp.zeros((E,), jnp.int32)
    return _pose_graph_cg_impl(
        positions0, quaternions0, switches0, edges, loop_slot, free_mask,
        switch_penalty, edge_loss, num_poses, num_loops, options,
        cg_iterations, cg_precond, None,
    )


def _pose_graph_cg_impl(
    positions0,
    quaternions0,
    switches0,
    edges: PoseGraphEdges,
    loop_slot,  # (E,) int32 GLOBAL loop-slot index per edge (0 for non-loops)
    free_mask,
    switch_penalty,
    edge_loss,
    num_poses: int,
    num_loops: int,
    options: Options,
    cg_iterations: int,
    cg_precond: str,
    psum_axis,  # Optional[str]: shard_map axis when edges are SHARDED
):
    """Body of the CG solve (see :func:`_pose_graph_solve_cg`).

    ``loop_slot`` is passed in (not derived) because under a sharded
    edge batch a local cumsum over ``is_loop`` would number the loop
    slots per-shard; the caller computes it globally. When ``psum_axis``
    is set, every edge-reduction (cost, gradient/matvec scatters, the
    preconditioner block accumulations) is psum'd over that shard_map
    axis, so the pose-dimension state — and therefore the entire LM
    loop, CG iterations included — stays bitwise-replicated across
    devices while the per-edge work is data-parallel over ICI
    (SURVEY section 2.8, same design as parallel/sharded.py)."""
    P, L = num_poses, num_loops
    dtype = positions0.dtype
    E = edges.mask.shape[0]
    ref_i = edges.reference_indices
    qry_i = edges.query_indices
    is_loop = edges.is_loop > 0

    def _psum(x):
        return jax.lax.psum(x, psum_axis) if psum_axis is not None else x

    free_ref = free_mask[ref_i]  # (E,)
    free_qry = free_mask[qry_i]
    fixed_p = (1.0 - free_mask)[:, None]

    def scatter_jt(J_ref, J_query, J_s, y):
        """(Jt y) as a pytree ((P,7), (L,)). Per-edge J^T y products are
        broadcast-mul-sums over the residual axis (length 6): the einsum
        spelling lowers tiny contractions to tile-padded MXU dot_generals
        that dominate the CG matvec profile."""
        gp = jnp.zeros((P, 7), dtype)
        gp = gp.at[ref_i].add(jnp.sum(J_ref * y[:, :, None], axis=1))
        gp = gp.at[qry_i].add(jnp.sum(J_query * y[:, :, None], axis=1))
        if L > 0:
            gs_e = jnp.sum(J_s * y, axis=1) * is_loop
            gs = jnp.zeros((L,), dtype).at[loop_slot].add(gs_e)
        else:
            gs = jnp.zeros((0,), dtype)
        return _psum((gp, gs))

    def eval_quadratic(params):
        pose_params, switches = params
        pos = pose_params[:, :3]
        quat = pose_params[:, 3:]
        sw_full = switches[loop_slot] if L > 0 else jnp.zeros((E,), dtype)
        r, J_ref, J_query, J_s = edge_residuals_and_jacobians(
            pos, quat, sw_full, edges, switch_penalty
        )
        # gauge fixing: fixed poses contribute no derivatives
        J_ref = J_ref * free_ref[:, None, None]
        J_query = J_query * free_qry[:, None, None]

        if edge_loss is not None:
            sq = jnp.sum(r * r, axis=1)
            rho, w, _ = edge_loss.evaluate(sq)
            cost = jnp.sum(rho)
            sqrt_w = jnp.sqrt(w)
            r = r * sqrt_w[:, None]
            J_ref = J_ref * sqrt_w[:, None, None]
            J_query = J_query * sqrt_w[:, None, None]
            J_s = J_s * sqrt_w[:, None]
        else:
            cost = jnp.sum(r * r)

        g = scatter_jt(J_ref, J_query, J_s, r)

        # diag(J^T J) for multiplicative damping + the per-pose 7x7
        # J^T J blocks for the block-Jacobi preconditioner (outer
        # products in VPU broadcast form, not einsum — see scatter_jt)
        d_p = jnp.zeros((P, 7), dtype)
        d_p = d_p.at[ref_i].add(jnp.sum(J_ref * J_ref, axis=1))
        d_p = d_p.at[qry_i].add(jnp.sum(J_query * J_query, axis=1))
        B_p = jnp.zeros((P, 7, 7), dtype)
        B_p = B_p.at[ref_i].add(
            jnp.sum(J_ref[:, :, :, None] * J_ref[:, :, None, :], axis=1)
        )
        B_p = B_p.at[qry_i].add(
            jnp.sum(J_query[:, :, :, None] * J_query[:, :, None, :], axis=1)
        )
        if L > 0:
            d_s = jnp.zeros((L,), dtype).at[loop_slot].add(
                jnp.sum(J_s * J_s, axis=1) * is_loop
            )
        else:
            d_s = jnp.zeros((0,), dtype)

        if cg_precond == "chain":
            # off-diagonal H blocks of consecutive-pose edges, scattered
            # to slot min(ref, qry): H[a, b] += J_a^T J_b, oriented so
            # O[k] = H[k, k+1]
            chain = (jnp.abs(ref_i - qry_i) == 1) & (edges.mask > 0)
            cross = jnp.sum(
                J_ref[:, :, :, None] * J_query[:, :, None, :], axis=1
            )  # (E, 7, 7) = J_ref^T J_query
            cross = jnp.where(
                (ref_i < qry_i)[:, None, None],
                cross,
                jnp.swapaxes(cross, 1, 2),
            )
            lo = jnp.minimum(ref_i, qry_i)
            O_chain = jnp.zeros((P, 7, 7), dtype).at[lo].add(
                jnp.where(chain[:, None, None], cross, 0.0)
            )
        else:
            O_chain = None

        cost = _psum(cost)
        d_p, d_s, B_p = _psum((d_p, d_s, B_p))
        if O_chain is not None:
            O_chain = _psum(O_chain)
        H_rep = (J_ref, J_query, J_s, d_p, d_s, B_p, O_chain)
        return H_rep, g, cost

    def solve_linear(H_rep, g, lam):
        J_ref, J_query, J_s, d_p, d_s, B_p, O_chain = H_rep
        g_p, g_s = g

        def matvec(v):
            vp, vs = v
            vpr = vp[ref_i][:, None, :]
            vpq = vp[qry_i][:, None, :]
            Jv = jnp.sum(J_ref * vpr, axis=2) + jnp.sum(J_query * vpq, axis=2)
            if L > 0:
                Jv = Jv + J_s * (vs[loop_slot] * is_loop)[:, None]
            hp, hs = scatter_jt(J_ref, J_query, J_s, Jv)
            hp = hp + lam * d_p * vp + fixed_p * vp + 1e-8 * vp
            hs = hs + lam * d_s * vs + 1e-8 * vs
            return hp, hs

        # Block-Jacobi preconditioner: per-pose damped 7x7 J^T J block
        # (exactly the pose-diagonal of the damped H the matvec applies),
        # inverted batched once per LM step (~0.04 ms for 5000 poses on a
        # v5e) and applied as a VPU broadcast-mul-sum per CG iteration.
        # Long chains are far too ill-conditioned for diagonal Jacobi at
        # practical iteration counts — the 7x7 blocks capture the strong
        # in-pose rotation/translation coupling and cut CG iterations
        # several-fold. Switch variables are genuinely diagonal in H.
        dvec = lam * d_p + fixed_p + 1e-8  # (P, 7) damping diagonal
        Bp = B_p + jnp.eye(7, dtype=dtype) * dvec[:, None, :]
        pre_s = (1.0 + lam) * d_s + 1e-8

        if cg_precond == "chain":
            # damped block-tridiagonal part of H, factored by cyclic
            # reduction once per LM step; the per-CG-iteration apply is
            # a log-depth direct solve (see the docstring above).
            # Preconditioner-only diagonal floor: at small lambda each
            # pose block is near-singular along its quaternion-scale
            # gauge direction, and the tridiag factorization PROPAGATES
            # that ill-conditioning across poses (block-Jacobi inverts
            # each block in isolation and merely returns a large local
            # step). M only has to be PD — flooring its diagonal at a
            # small fraction of the block scale keeps the factorization
            # stable (f32 included) without touching the actual system.
            from . import block_tridiag

            floor = 1e-3 * jnp.max(d_p, axis=1, keepdims=True) + 1e-8
            fact = block_tridiag.factor(
                Bp + jnp.eye(7, dtype=dtype) * floor[:, :, None], O_chain
            )

            def precond(v):
                return block_tridiag.solve_factored(fact, v[0]), v[1] / pre_s

        else:
            Bp_inv = jnp.linalg.inv(Bp)

            def precond(v):
                vp = jnp.sum(Bp_inv * v[0][:, None, :], axis=2)
                return vp, v[1] / pre_s

        delta, _ = jax.scipy.sparse.linalg.cg(
            matvec, (-g_p, -g_s), maxiter=cg_iterations, M=precond
        )
        return delta

    def retract(params, delta):
        pose_params, switches = params
        dp, ds = delta
        # fixed poses receive no update (their gradient and matvec rows
        # are identity, so dp is ~0 there already; the mask makes it exact)
        return (pose_params + dp * free_mask[:, None], switches + ds)

    pose0 = jnp.concatenate([positions0, quaternions0], axis=1)  # (P, 7)
    (pose_params, switches), summary = lm.solve(
        eval_quadratic, retract, (pose0, switches0), options,
        solve_linear=solve_linear,
    )
    return pose_params[:, :3], pose_params[:, 3:], switches, summary


@functools.lru_cache(maxsize=32)
def _build_sharded_cg(
    mesh, edge_loss, num_poses, num_loops, options, cg_iterations, cg_precond
):
    """Compile-cached shard_map'd CG solve: edges (and their global
    loop_slot) sharded along the factor axis, pose/switch state
    replicated, every edge reduction psum'd over ICI — the whole LM
    loop (CG iterations included) is ONE multi-device XLA program
    (SURVEY section 2.8; the pose-graph analog of parallel/sharded.py's
    whole-loop replication)."""
    from ..parallel.mesh import FACTOR_AXIS

    try:
        shard_map = jax.shard_map
    except AttributeError:  # pragma: no cover - older jax
        from jax.experimental.shard_map import shard_map

    Ps = jax.sharding.PartitionSpec

    def local(pos0, quat0, sw0, edges_sh, loop_slot_sh, free_mask, penalty):
        return _pose_graph_cg_impl(
            pos0, quat0, sw0, edges_sh, loop_slot_sh, free_mask, penalty,
            edge_loss, num_poses, num_loops, options, cg_iterations,
            cg_precond, FACTOR_AXIS,
        )

    in_specs = (
        Ps(), Ps(), Ps(),
        PoseGraphEdges(
            Ps(FACTOR_AXIS), Ps(FACTOR_AXIS), Ps(FACTOR_AXIS),
            Ps(FACTOR_AXIS), Ps(FACTOR_AXIS), Ps(FACTOR_AXIS),
            Ps(FACTOR_AXIS),
        ),
        Ps(FACTOR_AXIS), Ps(), Ps(),
    )
    kwargs = dict(mesh=mesh, in_specs=in_specs, out_specs=Ps())
    try:
        fn = shard_map(local, check_vma=False, **kwargs)
    except TypeError:  # pragma: no cover - older check_rep spelling
        fn = shard_map(local, check_rep=False, **kwargs)
    return jax.jit(fn)


def _pose_graph_solve_cg_sharded(
    mesh,
    positions0,
    quaternions0,
    switches0,
    edges: PoseGraphEdges,
    free_mask,
    switch_penalty,
    edge_loss,
    num_poses: int,
    num_loops: int,
    options: Options,
    cg_iterations: int,
    cg_precond: str,
):
    """Multi-device CG solve: pads the edge batch to the mesh size,
    computes the GLOBAL loop_slot host-side (a per-shard cumsum would
    misnumber switch slots), and runs the cached shard_map program."""
    n_dev = int(np.prod(list(mesh.shape.values())))
    E = edges.mask.shape[0]
    dtype = positions0.dtype
    loop_slot_np = np.clip(
        np.cumsum(np.asarray(edges.is_loop) > 0) - 1, 0, max(num_loops - 1, 0)
    ).astype(np.int32)

    pad = (-E) % n_dev
    if pad:
        def padcat(x, fill):
            filler = jnp.full((pad,) + x.shape[1:], fill, x.dtype)
            return jnp.concatenate([x, filler], axis=0)

        q_id = jnp.zeros((pad, 4), dtype).at[:, 0].set(1.0)
        w_pad = None
        if edges.sqrt_info is not None:
            w = edges.sqrt_info
            filler = (
                jnp.ones((pad, 6), w.dtype)
                if w.ndim == 2
                else jnp.broadcast_to(jnp.eye(6, dtype=w.dtype), (pad, 6, 6))
            )
            w_pad = jnp.concatenate([w, filler], axis=0)
        edges = PoseGraphEdges(
            padcat(edges.reference_indices, 0),
            padcat(edges.query_indices, min(1, num_poses - 1)),
            padcat(edges.relative_translations, 0.0),
            jnp.concatenate([edges.relative_quaternions, q_id], axis=0),
            padcat(edges.is_loop, 0.0),
            padcat(edges.mask, 0.0),  # padded rows contribute nothing
            sqrt_info=w_pad,
        )
        loop_slot_np = np.concatenate(
            [loop_slot_np, np.zeros(pad, np.int32)]
        )

    if edges.sqrt_info is None:
        # shard_map in_specs are positional over the NamedTuple fields;
        # materialize unit weights so the pytree structure is static
        edges = edges._replace(
            sqrt_info=jnp.ones((edges.mask.shape[0], 6), dtype)
        )

    fn = _build_sharded_cg(
        mesh, edge_loss, num_poses, num_loops, options,
        cg_iterations, cg_precond,
    )
    return fn(
        positions0, quaternions0, switches0, edges,
        jnp.asarray(loop_slot_np), free_mask, switch_penalty,
    )


# Woodbury correction sizing: up to _CORR_DENSE_MAX correction edges
# the (P, Uc, 7, 7) dense-columns form is used (fastest, one tridiag
# solve); beyond it columns are processed _CORR_CHUNK edges at a time
# under lax.scan so memory stays O(P * _CORR_CHUNK * 56) at any loop
# count.
_CORR_DENSE_MAX = 32
_CORR_CHUNK = 16


@functools.partial(jax.jit, static_argnums=(9, 10, 11, 12, 13))
def _pose_graph_solve_tridiag(
    positions0,
    quaternions0,
    switches0,
    edges: PoseGraphEdges,  # REORDERED: chain edges (by lo) first, then corr
    free_mask,
    switch_penalty,
    edge_loss,
    chain_lo,  # (Ec,) int32 min(ref, qry) per chain edge
    chain_forward,  # (Ec,) 1.0 when ref < qry
    num_chain: int,  # Ec — first Ec edges are the chain partition
    num_poses: int,
    num_loops: int,
    options: Options,
    chain_seq: bool,  # True when chain_lo == arange(P-1) exactly: every
    # consecutive pose pair has exactly one chain edge, so every chain
    # segment-sum is a pad-shift-add (NO scatter — scatters serialize on
    # TPU and cost ~2 ms per (P,7,7) operand at P=5000, dominating the
    # whole LM step; the shift form is pure VPU bandwidth)
):
    """Direct LM for chain-dominated graphs: exact damped-GN steps via
    block-tridiagonal cyclic reduction + a Woodbury low-rank correction.

    SLAM pose graphs are odometry chains (edges i <-> i+1) plus a sparse
    set of loop closures. The damped normal system splits exactly:

        H_d = T + U W U^T

    - ``T``: the block-tridiagonal part — chain-edge 7x7 blocks plus the
      FULL damping diagonal lam*diag(H) + gauge + 1e-8 (diagonals are
      always representable in T, so the correction stays undamped and
      exact). Solved by ``block_tridiag.solve`` — log2(P) batched levels,
      not P sequential pivots, and EXACT where truncated CG is not.
    - ``U W U^T``: each remaining edge contributes its pose-block outer
      product A_e^T A_e (7 columns) MINUS the switch-Schur rank-1 term
      (A_e^T c_e)(A_e^T c_e)^T / gamma_e from eliminating its (damped)
      switch variable. Writing the minus term as a signed column keeps
      W = diag(+1,...,-1,...) = W^{-1} exactly (the I - c c^T/gamma form
      is near-singular at small lambda; its inverse is not f32-safe).

    Switch variables are recovered exactly by back-substitution
    ds = Hss^{-1}(-g_s - Hsp dp). Same LM policy loop (lm.solve), same
    eval_quadratic semantics as the CG path — only the linear solver
    differs, so trajectories match the dense path to float reassociation.
    """
    from . import block_tridiag

    P, L = num_poses, num_loops
    dtype = positions0.dtype
    E = edges.mask.shape[0]
    Ec = num_chain
    Uc = E - Ec
    ref_i = edges.reference_indices
    qry_i = edges.query_indices

    if L > 0:
        loop_slot = jnp.clip(
            jnp.cumsum(edges.is_loop.astype(jnp.int32)) - 1, 0, L - 1
        )
    else:
        loop_slot = jnp.zeros((E,), jnp.int32)
    is_loop = edges.is_loop > 0

    free_ref = free_mask[ref_i]
    free_qry = free_mask[qry_i]
    fixed_p = (1.0 - free_mask)[:, None]

    corr_a = ref_i[Ec:]
    corr_b = qry_i[Ec:]
    corr_slot = loop_slot[Ec:]
    corr_is_loop = edges.is_loop[Ec:]  # (Uc,)
    eye7 = jnp.eye(7, dtype=dtype)
    fwd1 = chain_forward[:, None]  # (Ec, 1)
    fwd2 = chain_forward[:, None, None]

    def chain_accumulate(c_lo, c_hi):
        """Sum per-chain-edge contributions into per-pose rows.
        ``c_lo``/``c_hi`` are (Ec, ...) contributions to pose lo / lo+1.
        chain_seq: lo == arange(P-1), so the segment sum is two shifted
        pads — zero scatters. Otherwise fall back to scatter-add."""
        if chain_seq:
            z = jnp.zeros((1,) + c_lo.shape[1:], dtype)
            return jnp.concatenate([c_lo, z]) + jnp.concatenate([z, c_hi])
        out = jnp.zeros((P,) + c_lo.shape[1:], dtype)
        return out.at[chain_lo].add(c_lo).at[chain_lo + 1].add(c_hi)

    def accumulate_pose(contrib_ref, contrib_qry):
        """Sum per-edge (E, ...) pose contributions into (P, ...)."""
        cr, cq = contrib_ref[:Ec], contrib_qry[:Ec]
        f = fwd1 if cr.ndim == 2 else fwd2
        gp = chain_accumulate(
            jnp.where(f > 0, cr, cq), jnp.where(f > 0, cq, cr)
        )
        if Uc > 0:
            gp = gp.at[corr_a].add(contrib_ref[Ec:])
            gp = gp.at[corr_b].add(contrib_qry[Ec:])
        return gp

    def eval_quadratic(params):
        pose_params, switches = params
        pos = pose_params[:, :3]
        quat = pose_params[:, 3:]
        sw_full = switches[loop_slot] if L > 0 else jnp.zeros((E,), dtype)
        r, J_ref, J_query, J_s = edge_residuals_and_jacobians(
            pos, quat, sw_full, edges, switch_penalty
        )
        J_ref = J_ref * free_ref[:, None, None]
        J_query = J_query * free_qry[:, None, None]

        if edge_loss is not None:
            sq = jnp.sum(r * r, axis=1)
            rho, w, _ = edge_loss.evaluate(sq)
            cost = jnp.sum(rho)
            sqrt_w = jnp.sqrt(w)
            r = r * sqrt_w[:, None]
            J_ref = J_ref * sqrt_w[:, None, None]
            J_query = J_query * sqrt_w[:, None, None]
            J_s = J_s * sqrt_w[:, None]
        else:
            cost = jnp.sum(r * r)

        g_p = accumulate_pose(
            jnp.sum(J_ref * r[:, :, None], axis=1),
            jnp.sum(J_query * r[:, :, None], axis=1),
        )
        if L > 0:
            gs_e = jnp.sum(J_s * r, axis=1) * is_loop
            g_s = jnp.zeros((L,), dtype).at[loop_slot].add(gs_e)
        else:
            g_s = jnp.zeros((0,), dtype)

        d_p = accumulate_pose(
            jnp.sum(J_ref * J_ref, axis=1), jnp.sum(J_query * J_query, axis=1)
        )
        if L > 0:
            d_s = jnp.zeros((L,), dtype).at[loop_slot].add(
                jnp.sum(J_s * J_s, axis=1) * is_loop
            )
        else:
            d_s = jnp.zeros((0,), dtype)

        H_rep = (J_ref, J_query, J_s, d_p, d_s)
        return H_rep, (g_p, g_s), cost

    def solve_linear(H_rep, g, lam):
        J_ref, J_query, J_s, d_p, d_s = H_rep
        g_p, g_s = g
        dvec = lam * d_p + fixed_p + 1e-8  # (P, 7) damping diagonal

        # ---- T: chain blocks + damping diagonal -------------------------
        Jr = J_ref[:Ec]  # (Ec, 7, 7)
        Jq = J_query[:Ec]
        J_lo = jnp.where(fwd2 > 0, Jr, Jq)
        J_hi = jnp.where(fwd2 > 0, Jq, Jr)
        D_lo = jnp.sum(J_lo[:, :, :, None] * J_lo[:, :, None, :], axis=1)
        D_hi = jnp.sum(J_hi[:, :, :, None] * J_hi[:, :, None, :], axis=1)
        O_c = jnp.sum(J_lo[:, :, :, None] * J_hi[:, :, None, :], axis=1)
        D = chain_accumulate(D_lo, D_hi)
        D = D + eye7 * dvec[:, None, :]
        if chain_seq:
            O = O_c  # (P-1, 7, 7), already in lo order
        else:
            O = jnp.zeros((max(P - 1, 1), 7, 7), dtype).at[chain_lo].add(O_c)

        b_p = -g_p

        if Uc > 0:
            # ---- signed low-rank correction columns ---------------------
            Ja = J_ref[Ec:]  # (Uc, 7, 7) block at pose a
            Jb = J_query[Ec:]
            c = J_s[Ec:]  # (Uc, 7)
            cc = jnp.sum(c * c, axis=1)
            d_s_corr = (
                d_s[corr_slot] * corr_is_loop if L > 0 else jnp.zeros((Uc,), dtype)
            )
            gamma = cc + lam * d_s_corr + 1e-8
            g_s_corr = (
                g_s[corr_slot] * corr_is_loop if L > 0 else jnp.zeros((Uc,), dtype)
            )

            Jac = jnp.sum(Ja * c[:, :, None], axis=1)  # (Uc, 7) = A_a^T c
            Jbc = jnp.sum(Jb * c[:, :, None], axis=1)

            # RHS after switch elimination: b_p = -g_p + Hps Hss^{-1} g_s
            coef = jnp.where(corr_is_loop > 0, g_s_corr / gamma, 0.0)
            b_p = b_p.at[corr_a].add(Jac * coef[:, None])
            b_p = b_p.at[corr_b].add(Jbc * coef[:, None])

            inv_sq = jnp.where(
                corr_is_loop > 0, 1.0 / jnp.sqrt(gamma), 0.0
            )[:, None]
            if Uc <= _CORR_DENSE_MAX:
                # single-shot dense columns: one tridiag solve over
                # (1 + 8 Uc) right-hand sides
                arange_u = jnp.arange(Uc)
                # +columns: the 7 residual rows of A_e^T [pose, edge, d, i]
                U4 = jnp.zeros((P, Uc, 7, 7), dtype)
                U4 = U4.at[corr_a, arange_u].add(Ja)
                U4 = U4.at[corr_b, arange_u].add(Jb)
                U_plus = U4.transpose(0, 3, 1, 2).reshape(P, 7, Uc * 7)
                # -columns: switch-Schur rank-1 per loop edge
                V3 = jnp.zeros((P, Uc, 7), dtype)
                V3 = V3.at[corr_a, arange_u].add(Jac * inv_sq)
                V3 = V3.at[corr_b, arange_u].add(Jbc * inv_sq)
                V = V3.transpose(0, 2, 1)  # (P, 7, Uc)
                U_all = jnp.concatenate([U_plus, V], axis=-1)  # (P, 7, K)
                K = 8 * Uc
                w_sign = jnp.concatenate(
                    [jnp.ones((7 * Uc,), dtype), -jnp.ones((Uc,), dtype)]
                )

                rhs = jnp.concatenate([b_p[:, :, None], U_all], axis=-1)
                X = block_tridiag.solve(D, O, rhs)
                xb = X[..., 0]  # (P, 7) = T^{-1} b_p
                Y = X[..., 1:]  # (P, 7, K) = T^{-1} U

                with jax.default_matmul_precision("highest"):
                    Uf = U_all.reshape(P * 7, K)
                    UtY = Uf.T @ Y.reshape(P * 7, K)  # (K, K)
                    Utx = Uf.T @ xb.reshape(P * 7)  # (K,)
                    M = jnp.diag(w_sign) + UtY  # W^{-1} = W = diag(+-1)
                    alpha = jnp.linalg.solve(M, Utx)
                    dp = xb - Y @ alpha
            else:
                # ---- CHUNKED Woodbury columns: bounded memory ----------
                # The dense-columns form materializes (P, Uc, 7, 7)
                # tensors — ~1 GB per 25 correction edges at 50k poses,
                # OOM by ~100 loops. Instead the capacitance system is
                # assembled a chunk of correction edges at a time under
                # lax.scan (U never exists densely: its transpose applies
                # by per-edge gathers), and the final correction costs
                # ONE extra single-rhs tridiag solve:
                #     dp = xb - T^{-1} (U alpha).
                # Column layout per chunk: [7 '+' cols per edge (e-major,
                # d-fast) | 1 '-' col per edge]; padded edges have zero
                # blocks, so their capacitance rows/cols reduce to the
                # +-1 diagonal and decouple.
                Cc = _CORR_CHUNK
                n_chunks = (Uc + Cc - 1) // Cc
                Up = n_chunks * Cc
                pad = Up - Uc

                def padc(x):
                    if not pad:
                        return x
                    return jnp.concatenate(
                        [x, jnp.zeros((pad,) + x.shape[1:], x.dtype)]
                    )

                ca = padc(corr_a)
                cb = padc(corr_b)
                Jap, Jbp = padc(Ja), padc(Jb)
                Jva = padc(Jac * inv_sq)  # (Up, 7) '-' column blocks
                Jvb = padc(Jbc * inv_sq)
                K = 8 * Up

                # f32 einsums lower to single-pass bf16 on the MXU and
                # destroy the capacitance system's conditioning at city
                # scale (measured: 12 m error at 50k poses) — force full
                # precision like the dense branch does.
                hp = jax.default_matmul_precision

                def ut_apply(z):
                    """U^T @ z for z (P, 7, m) -> (K, m), sparse gathers."""
                    za, zb = z[ca], z[cb]  # (Up, 7, m)
                    with hp("highest"):
                        plus = jnp.einsum("edi,eim->edm", Jap, za) + jnp.einsum(
                            "edi,eim->edm", Jbp, zb
                        )  # (Up, 7, m)
                        minus = jnp.einsum("ei,eim->em", Jva, za) + jnp.einsum(
                            "ei,eim->em", Jvb, zb
                        )  # (Up, m)
                    m = z.shape[-1]
                    return jnp.concatenate(
                        [
                            plus.reshape(n_chunks, Cc * 7, m),
                            minus.reshape(n_chunks, Cc, m),
                        ],
                        axis=1,
                    ).reshape(K, m)

                def u_apply(alpha):
                    """U @ alpha for alpha (K,) -> (P, 7), sparse scatters."""
                    a2 = alpha.reshape(n_chunks, 8 * Cc)
                    a_plus = a2[:, : 7 * Cc].reshape(Up, 7)
                    a_minus = a2[:, 7 * Cc :].reshape(Up)
                    with hp("highest"):
                        contrib_a = jnp.einsum("ed,edi->ei", a_plus, Jap) + (
                            a_minus[:, None] * Jva
                        )
                        contrib_b = jnp.einsum("ed,edi->ei", a_plus, Jbp) + (
                            a_minus[:, None] * Jvb
                        )
                    out = jnp.zeros((P, 7), dtype)
                    return out.at[ca].add(contrib_a).at[cb].add(contrib_b)

                # factor T once; every chunk (plus the b and U-alpha
                # solves) reuses the reduction — the per-level batched
                # inverses and block products are the dominant cost and
                # were previously redone per chunk
                fact = block_tridiag.factor(D, O)
                xb = block_tridiag.solve_factored(fact, b_p)  # (P, 7)

                arange_c = jnp.arange(Cc)

                def chunk_step(_, inp):
                    ca_c, cb_c, Ja_c, Jb_c, Jva_c, Jvb_c = inp
                    U4c = jnp.zeros((P, Cc, 7, 7), dtype)
                    U4c = U4c.at[ca_c, arange_c].add(Ja_c)
                    U4c = U4c.at[cb_c, arange_c].add(Jb_c)
                    V3c = jnp.zeros((P, Cc, 7), dtype)
                    V3c = V3c.at[ca_c, arange_c].add(Jva_c)
                    V3c = V3c.at[cb_c, arange_c].add(Jvb_c)
                    U_chunk = jnp.concatenate(
                        [
                            U4c.transpose(0, 3, 1, 2).reshape(P, 7, Cc * 7),
                            V3c.transpose(0, 2, 1),
                        ],
                        axis=-1,
                    )  # (P, 7, 8 Cc)
                    Y_c = block_tridiag.solve_factored(fact, U_chunk)
                    return None, ut_apply(Y_c)  # (K, 8 Cc)

                chunked = (
                    ca.reshape(n_chunks, Cc),
                    cb.reshape(n_chunks, Cc),
                    Jap.reshape(n_chunks, Cc, 7, 7),
                    Jbp.reshape(n_chunks, Cc, 7, 7),
                    Jva.reshape(n_chunks, Cc, 7),
                    Jvb.reshape(n_chunks, Cc, 7),
                )
                _, UtY_blocks = jax.lax.scan(chunk_step, None, chunked)
                UtY = UtY_blocks.transpose(1, 0, 2).reshape(K, K)
                w_sign = jnp.tile(
                    jnp.concatenate(
                        [jnp.ones((7 * Cc,), dtype), -jnp.ones((Cc,), dtype)]
                    ),
                    n_chunks,
                )
                Utx = ut_apply(xb[:, :, None])[:, 0]
                with hp("highest"):
                    M = jnp.diag(w_sign) + UtY
                    alpha = jnp.linalg.solve(M, Utx)
                dp = xb - block_tridiag.solve_factored(fact, u_apply(alpha))

            # exact switch back-substitution ds = (-g_s - c^T A dp)/gamma
            if L > 0:
                v = jnp.sum(Ja * dp[corr_a][:, None, :], axis=2) + jnp.sum(
                    Jb * dp[corr_b][:, None, :], axis=2
                )  # (Uc, 7) = A_e dp
                ds_e = (-g_s_corr - jnp.sum(c * v, axis=1)) / gamma
                ds = jnp.zeros((L,), dtype).at[corr_slot].add(
                    jnp.where(corr_is_loop > 0, ds_e, 0.0)
                )
            else:
                ds = jnp.zeros((0,), dtype)
        else:
            dp = block_tridiag.solve(D, O, b_p)
            ds = jnp.zeros((L,), dtype)

        return dp, ds

    def retract(params, delta):
        pose_params, switches = params
        dp, ds = delta
        return (pose_params + dp * free_mask[:, None], switches + ds)

    pose0 = jnp.concatenate([positions0, quaternions0], axis=1)
    (pose_params, switches), summary = lm.solve(
        eval_quadratic, retract, (pose0, switches0), options,
        solve_linear=solve_linear,
    )
    return pose_params[:, :3], pose_params[:, 3:], switches, summary


@functools.partial(jax.jit, static_argnums=(7, 8, 9, 10))
def _pose_graph_solve_banded(
    positions0,  # (P, 3) in RCM-PERMUTED order
    quaternions0,  # (P, 4) same order
    switches0,  # (L,)
    edges: PoseGraphEdges,  # endpoint indices in PERMUTED order
    free_mask,  # (P,) permuted
    switch_penalty,
    edge_loss,
    num_poses: int,
    num_loops: int,
    super_size: int,  # s >= block bandwidth of the permuted graph
    options: Options,
):
    """Direct LM for loop-RICH graphs: block-BANDED Cholesky via
    superblock cyclic reduction.

    The reference's pose-graph analytic path is an unimplemented stub
    whose comments name "Sparse Cholesky"
    (pose_graph_optimizer_analytic.cc:12-51). A general sparse Cholesky
    (dynamic fill-in, pointer-chasing supernodes) is the wrong shape for
    a TPU; the TPU-native equivalent built here is:

      1. HOST symbolic phase, once per topology: a reverse Cuthill-McKee
         ordering of the pose graph (scipy.sparse.csgraph) bounds the
         block bandwidth b = max |perm_i - perm_j| over edges.
      2. DEVICE numeric phase, per LM iteration: the banded system is
         packed into K = ceil(P/s) consecutive SUPERBLOCKS of s = b poses
         (7s x 7s dense panels). Any edge then couples the same or
         adjacent superblocks, so the banded matrix IS block-tridiagonal
         at superblock granularity and the existing cyclic-reduction
         solver (solvers/block_tridiag.py) factors it in log2(K) levels
         of BATCHED dense panel products — MXU work with static shapes,
         instead of P sequential pivots or hundreds of CG matvecs.

    Unlike the "tridiag" solver there is NO low-rank correction: sphere-
    class graphs (one ring closure per pose; ~2.4k loops) make the
    Woodbury capacitance larger than the original system, while here
    every loop edge lands inside the band. Switchable-constraint switch
    variables are eliminated EXACTLY per edge (their damped Schur
    complement is a rank-1 update to the edge's 2x2 pose-block square,
    which by construction also lies in the band) and recovered by exact
    back-substitution — the same algebra as the tridiag path's signed
    Woodbury columns, but folded into the band.

    Same eval_quadratic/LM policy as the dense/cg/tridiag paths; only the
    linear solver differs.
    """
    P, L = num_poses, num_loops
    s = super_size
    K = max(1, -(-P // s))
    Pp = K * s  # padded pose count (pad poses decouple: identity diagonal)
    dtype = positions0.dtype
    E = edges.mask.shape[0]
    ref_i = edges.reference_indices
    qry_i = edges.query_indices

    if L > 0:
        loop_slot = jnp.clip(
            jnp.cumsum(edges.is_loop.astype(jnp.int32)) - 1, 0, L - 1
        )
    else:
        loop_slot = jnp.zeros((E,), jnp.int32)
    is_loop = edges.is_loop > 0

    free_ref = free_mask[ref_i]
    free_qry = free_mask[qry_i]
    fixed_p = (1.0 - free_mask)[:, None]

    # lo/hi endpoint split (lo = smaller permuted index); bandwidth
    # guarantee: hi - lo <= s, so superblocks are same or adjacent
    swap = qry_i < ref_i
    lo_i = jnp.where(swap, qry_i, ref_i)
    hi_i = jnp.where(swap, ref_i, qry_i)
    k_lo, r_lo = lo_i // s, lo_i % s
    k_hi, r_hi = hi_i // s, hi_i % s
    same_k = (k_lo == k_hi)[:, None, None]

    def accumulate_pose(contrib_ref, contrib_qry):
        out = jnp.zeros((P,) + contrib_ref.shape[1:], dtype)
        return out.at[ref_i].add(contrib_ref).at[qry_i].add(contrib_qry)

    def eval_quadratic(params):
        pose_params, switches = params
        pos = pose_params[:, :3]
        quat = pose_params[:, 3:]
        sw_full = switches[loop_slot] if L > 0 else jnp.zeros((E,), dtype)
        r, J_ref, J_query, J_s = edge_residuals_and_jacobians(
            pos, quat, sw_full, edges, switch_penalty
        )
        J_ref = J_ref * free_ref[:, None, None]
        J_query = J_query * free_qry[:, None, None]

        if edge_loss is not None:
            sq = jnp.sum(r * r, axis=1)
            rho, w, _ = edge_loss.evaluate(sq)
            cost = jnp.sum(rho)
            sqrt_w = jnp.sqrt(w)
            r = r * sqrt_w[:, None]
            J_ref = J_ref * sqrt_w[:, None, None]
            J_query = J_query * sqrt_w[:, None, None]
            J_s = J_s * sqrt_w[:, None]
        else:
            cost = jnp.sum(r * r)

        g_p = accumulate_pose(
            jnp.sum(J_ref * r[:, :, None], axis=1),
            jnp.sum(J_query * r[:, :, None], axis=1),
        )
        if L > 0:
            gs_e = jnp.sum(J_s * r, axis=1) * is_loop
            g_s = jnp.zeros((L,), dtype).at[loop_slot].add(gs_e)
        else:
            g_s = jnp.zeros((0,), dtype)

        d_p = accumulate_pose(
            jnp.sum(J_ref * J_ref, axis=1), jnp.sum(J_query * J_query, axis=1)
        )
        if L > 0:
            d_s = jnp.zeros((L,), dtype).at[loop_slot].add(
                jnp.sum(J_s * J_s, axis=1) * is_loop
            )
        else:
            d_s = jnp.zeros((0,), dtype)

        H_rep = (J_ref, J_query, J_s, d_p, d_s)
        return H_rep, (g_p, g_s), cost

    def solve_linear(H_rep, g, lam):
        J_ref, J_query, J_s, d_p, d_s = H_rep
        g_p, g_s = g

        J_lo = jnp.where(swap[:, None, None], J_query, J_ref)  # (E, 7, 7)
        J_hi = jnp.where(swap[:, None, None], J_ref, J_query)

        # per-edge pose blocks (res axis contracted on the VPU)
        B_ll = jnp.sum(J_lo[:, :, :, None] * J_lo[:, :, None, :], axis=1)
        B_hh = jnp.sum(J_hi[:, :, :, None] * J_hi[:, :, None, :], axis=1)
        B_hl = jnp.sum(J_hi[:, :, :, None] * J_lo[:, :, None, :], axis=1)

        b_p = -g_p

        if L > 0:
            # exact damped-Schur elimination of each loop edge's switch:
            # H_pp -= (A^T c)(A^T c)^T / gamma,  b_p += (A^T c) g_s / gamma
            c = J_s  # (E, 7)
            cc = jnp.sum(c * c, axis=1)
            gamma = cc + lam * d_s[loop_slot] + 1e-8
            inv_gamma = jnp.where(is_loop, 1.0 / gamma, 0.0)  # (E,)
            Jlc = jnp.sum(J_lo * c[:, :, None], axis=1)  # (E, 7) = A_lo^T c
            Jhc = jnp.sum(J_hi * c[:, :, None], axis=1)
            g_s_e = g_s[loop_slot]
            coef = inv_gamma * g_s_e
            b_p = b_p.at[lo_i].add(Jlc * coef[:, None])
            b_p = b_p.at[hi_i].add(Jhc * coef[:, None])
            B_ll = B_ll - inv_gamma[:, None, None] * (
                Jlc[:, :, None] * Jlc[:, None, :]
            )
            B_hh = B_hh - inv_gamma[:, None, None] * (
                Jhc[:, :, None] * Jhc[:, None, :]
            )
            B_hl = B_hl - inv_gamma[:, None, None] * (
                Jhc[:, :, None] * Jlc[:, None, :]
            )

        # ---- scatter into superblock panels ------------------------------
        Dsup = jnp.zeros((K, s, 7, s, 7), dtype)
        Dsup = Dsup.at[k_lo, r_lo, :, r_lo, :].add(B_ll)
        Dsup = Dsup.at[k_hi, r_hi, :, r_hi, :].add(B_hh)
        B_hl_T = jnp.swapaxes(B_hl, -1, -2)
        # same-superblock off blocks: (r_hi, r_lo) and its transpose
        Dsup = Dsup.at[k_lo, r_hi, :, r_lo, :].add(
            jnp.where(same_k, B_hl, 0.0)
        )
        Dsup = Dsup.at[k_lo, r_lo, :, r_hi, :].add(
            jnp.where(same_k, B_hl_T, 0.0)
        )
        D = Dsup.reshape(K, s * 7, s * 7)
        if K > 1:
            # cross-superblock: O[k] = H(superblock k, k+1); the (lo, hi)
            # block is B_hl^T. Same-superblock edges scatter zeros at a
            # clipped index.
            Osup = jnp.zeros((K - 1, s, 7, s, 7), dtype)
            k_off = jnp.minimum(k_lo, K - 2)
            Osup = Osup.at[k_off, r_lo, :, r_hi, :].add(
                jnp.where(same_k, 0.0, B_hl_T)
            )
            O = Osup.reshape(K - 1, s * 7, s * 7)
        else:
            O = jnp.zeros((0, s * 7, s * 7), dtype)

        # damping diagonal (reference policy: lam * diag(H), plus gauge
        # fixing and the rank-deficiency floor); padded poses get 1.0
        dvec = lam * d_p + fixed_p + 1e-8  # (P, 7)
        dpad = jnp.concatenate(
            [dvec, jnp.ones((Pp - P, 7), dtype)], axis=0
        ).reshape(K, s * 7)
        D = D + jnp.eye(s * 7, dtype=dtype) * dpad[:, None, :]

        rhs = jnp.concatenate(
            [b_p, jnp.zeros((Pp - P, 7), dtype)], axis=0
        ).reshape(K, s * 7)
        # dense_cutoff in SUPERBLOCK rows: stop reduction once the dense
        # tail stays MXU-sized (~4k)
        cutoff = max(1, 4096 // (s * 7))
        if dtype == jnp.float64:
            # MIXED PRECISION: factor the panels in f32 (the TPU's native
            # precision — f64 panel products are ~10x emulated) and recover
            # f64 step accuracy with iterative refinement: the residual
            # matvec is ONE banded f64 product per step vs a whole
            # factorization, and two steps push the relative residual to
            # f64 roundoff for any LM-damped conditioning (classic
            # Wilkinson refinement, done the TPU way).
            fact = block_tridiag.factor(
                D.astype(jnp.float32), O.astype(jnp.float32), cutoff
            )

            def banded_matvec(x):
                with jax.default_matmul_precision("highest"):
                    y = jnp.einsum("kij,kj->ki", D, x)
                    if K > 1:
                        y = y.at[:-1].add(
                            jnp.einsum("kij,kj->ki", O, x[1:])
                        )
                        y = y.at[1:].add(
                            jnp.einsum("kji,kj->ki", O, x[:-1])
                        )
                return y

            x = block_tridiag.solve_factored(
                fact, rhs.astype(jnp.float32)
            ).astype(dtype)
            for _ in range(2):
                resid = rhs - banded_matvec(x)
                x = x + block_tridiag.solve_factored(
                    fact, resid.astype(jnp.float32)
                ).astype(dtype)
        else:
            x = block_tridiag.solve(D, O, rhs, dense_cutoff=cutoff)
        dp = x.reshape(Pp, 7)[:P]

        # exact switch back-substitution ds = (-g_s - c^T A dp) / gamma
        if L > 0:
            v = jnp.sum(J_lo * dp[lo_i][:, None, :], axis=2) + jnp.sum(
                J_hi * dp[hi_i][:, None, :], axis=2
            )  # (E, 7) = A_e dp
            ds_e = jnp.where(
                is_loop, (-g_s[loop_slot] - jnp.sum(c * v, axis=1)) * inv_gamma, 0.0
            )
            ds = jnp.zeros((L,), dtype).at[loop_slot].add(ds_e)
        else:
            ds = jnp.zeros((0,), dtype)
        return dp, ds

    def retract(params, delta):
        pose_params, switches = params
        dp, ds = delta
        return (pose_params + dp * free_mask[:, None], switches + ds)

    from . import block_tridiag

    pose0 = jnp.concatenate([positions0, quaternions0], axis=1)
    (pose_params, switches), summary = lm.solve(
        eval_quadratic, retract, (pose0, switches0), options,
        solve_linear=solve_linear,
    )
    return pose_params[:, :3], pose_params[:, 3:], switches, summary


@functools.partial(jax.jit, static_argnums=(7, 8, 9, 10, 11))
def _pose_graph_solve_sparse(
    positions0,  # (P, 3) registry order (NO permutation — the plan owns it)
    quaternions0,  # (P, 4)
    switches0,  # (L,)
    edges: PoseGraphEdges,
    free_mask,  # (P,)
    switch_penalty,
    edge_loss,
    num_poses: int,
    num_loops: int,
    plan,  # multifrontal.Plan from _flatten_sparse
    options: Options,
    mesh=None,  # optional Mesh("factors"): fronts partitioned by XLA SPMD
    acc_rounds=None,  # (kmax, P) multifrontal.accumulate_rounds maps
):
    """Direct LM via nested-dissection multifrontal block-sparse
    Cholesky (solvers/multifrontal.py — see its module docstring for the
    TPU-first design narrative). This is the solver class for loop-rich
    FAT-BANDWIDTH graphs (Olson Manhattan worlds) where every RCM
    ordering still couples across the arena: the banded superblock
    solver degrades to near-dense panels while nested dissection keeps
    O(P^{3/2}) with sqrt(P)-sized separator fronts.

    Same eval_quadratic/LM policy and exact per-edge switch elimination
    as the banded path (the damped Schur complement of each loop
    switch is a rank-1 update to its edge blocks, which by construction
    stay inside the sparsity pattern); only the linear solver differs.
    """
    from . import multifrontal

    P, L = num_poses, num_loops
    dtype = positions0.dtype
    E = edges.mask.shape[0]
    ref_i = edges.reference_indices
    qry_i = edges.query_indices

    if L > 0:
        loop_slot = jnp.clip(
            jnp.cumsum(edges.is_loop.astype(jnp.int32)) - 1, 0, L - 1
        )
    else:
        loop_slot = jnp.zeros((E,), jnp.int32)
    is_loop = edges.is_loop > 0

    free_ref = free_mask[ref_i]
    free_qry = free_mask[qry_i]
    fixed_p = (1.0 - free_mask)[:, None]

    def accumulate_pose(contrib_ref, contrib_qry):
        if acc_rounds is None:
            out = jnp.zeros((P,) + contrib_ref.shape[1:], dtype)
            return out.at[ref_i].add(contrib_ref).at[qry_i].add(contrib_qry)
        # scatter-free gather rounds (multifrontal.accumulate_rounds).
        # Honest measurement note: replacing these per-edge scatter-adds
        # changed manhattan10000 end-to-end within noise (~1.2 s both
        # ways) — the sparse path's per-iteration cost is NOT scatter-
        # bound at city scale; kept because the gather form is never
        # the serializing op and composes with higher-degree graphs.
        src = jnp.concatenate(
            [contrib_ref, contrib_qry,
             jnp.zeros((1,) + contrib_ref.shape[1:], dtype)]
        )
        out = src[acc_rounds[0]]
        for t in range(1, acc_rounds.shape[0]):
            out = out + src[acc_rounds[t]]
        return out

    def eval_quadratic(params):
        pose_params, switches = params
        pos = pose_params[:, :3]
        quat = pose_params[:, 3:]
        sw_full = switches[loop_slot] if L > 0 else jnp.zeros((E,), dtype)
        r, J_ref, J_query, J_s = edge_residuals_and_jacobians(
            pos, quat, sw_full, edges, switch_penalty
        )
        J_ref = J_ref * free_ref[:, None, None]
        J_query = J_query * free_qry[:, None, None]

        if edge_loss is not None:
            sq = jnp.sum(r * r, axis=1)
            rho, w, _ = edge_loss.evaluate(sq)
            cost = jnp.sum(rho)
            sqrt_w = jnp.sqrt(w)
            r = r * sqrt_w[:, None]
            J_ref = J_ref * sqrt_w[:, None, None]
            J_query = J_query * sqrt_w[:, None, None]
            J_s = J_s * sqrt_w[:, None]
        else:
            cost = jnp.sum(r * r)

        g_p = accumulate_pose(
            jnp.sum(J_ref * r[:, :, None], axis=1),
            jnp.sum(J_query * r[:, :, None], axis=1),
        )
        if L > 0:
            gs_e = jnp.sum(J_s * r, axis=1) * is_loop
            g_s = jnp.zeros((L,), dtype).at[loop_slot].add(gs_e)
        else:
            g_s = jnp.zeros((0,), dtype)

        d_p = accumulate_pose(
            jnp.sum(J_ref * J_ref, axis=1), jnp.sum(J_query * J_query, axis=1)
        )
        if L > 0:
            d_s = jnp.zeros((L,), dtype).at[loop_slot].add(
                jnp.sum(J_s * J_s, axis=1) * is_loop
            )
        else:
            d_s = jnp.zeros((0,), dtype)

        H_rep = (J_ref, J_query, J_s, d_p, d_s)
        return H_rep, (g_p, g_s), cost

    def solve_linear(H_rep, g, lam):
        J_ref, J_query, J_s, d_p, d_s = H_rep
        g_p, g_s = g

        # per-edge blocks in (ref, query) = (a, b) convention
        B_aa = jnp.sum(J_ref[:, :, :, None] * J_ref[:, :, None, :], axis=1)
        B_bb = jnp.sum(
            J_query[:, :, :, None] * J_query[:, :, None, :], axis=1
        )
        B_ab = jnp.sum(J_ref[:, :, :, None] * J_query[:, :, None, :], axis=1)

        b_p = -g_p

        if L > 0:
            # exact damped-Schur elimination of each loop edge's switch
            # (rank-1 per edge — the same algebra as the banded path)
            c = J_s
            cc = jnp.sum(c * c, axis=1)
            gamma = cc + lam * d_s[loop_slot] + 1e-8
            inv_gamma = jnp.where(is_loop, 1.0 / gamma, 0.0)
            Jac = jnp.sum(J_ref * c[:, :, None], axis=1)  # (E, bd)
            Jbc = jnp.sum(J_query * c[:, :, None], axis=1)
            coef = inv_gamma * g_s[loop_slot]
            b_p = b_p + accumulate_pose(
                Jac * coef[:, None], Jbc * coef[:, None]
            )
            B_aa = B_aa - inv_gamma[:, None, None] * (
                Jac[:, :, None] * Jac[:, None, :]
            )
            B_bb = B_bb - inv_gamma[:, None, None] * (
                Jbc[:, :, None] * Jbc[:, None, :]
            )
            B_ab = B_ab - inv_gamma[:, None, None] * (
                Jac[:, :, None] * Jbc[:, None, :]
            )

        dvec = lam * d_p + fixed_p + 1e-8  # damping + gauge + floor
        dp = multifrontal.solve(
            plan, ref_i, qry_i, B_aa, B_bb, B_ab, dvec, b_p, mesh=mesh
        )

        if L > 0:
            v = jnp.einsum("erd,ed->er", J_ref, dp[ref_i]) + jnp.einsum(
                "erd,ed->er", J_query, dp[qry_i]
            )
            ds_e = jnp.where(
                is_loop,
                (-g_s[loop_slot] - jnp.sum(c * v, axis=1)) * inv_gamma,
                0.0,
            )
            ds = jnp.zeros((L,), dtype).at[loop_slot].add(ds_e)
        else:
            ds = jnp.zeros((0,), dtype)
        return dp, ds

    def retract(params, delta):
        pose_params, switches = params
        dp, ds = delta
        return (pose_params + dp * free_mask[:, None], switches + ds)

    pose0 = jnp.concatenate([positions0, quaternions0], axis=1)
    (pose_params, switches), summary = lm.solve(
        eval_quadratic, retract, (pose0, switches0), options,
        solve_linear=solve_linear,
    )
    return pose_params[:, :3], pose_params[:, 3:], switches, summary


@functools.partial(jax.jit, static_argnums=(6, 7, 8, 9))
def _pose_graph_2d_solve_sparse(
    xyt0,  # (P, 3) registry order (NO permutation — the plan owns it)
    switches0,  # (L,)
    edges: "PoseGraph2DEdges",
    free_mask,  # (P,)
    switch_penalty,
    edge_loss,
    num_poses: int,
    num_loops: int,
    plan,  # multifrontal.Plan
    options: Options,
    acc_rounds=None,  # (kmax, P) multifrontal.accumulate_rounds maps
):
    """SE(2) nested-dissection multifrontal direct solver: the 3-DoF
    analog of :func:`_pose_graph_solve_sparse` (which see, and
    solvers/multifrontal.py for the design narrative). This is the
    M3500-class city-graph solver: Olson arenas have RCM bandwidth
    growing with the arena diameter (341 on manhattan3500 — near-dense
    superblocks), while geometric nested dissection keeps sqrt(P)-sized
    separator fronts."""
    from . import multifrontal

    P, L = num_poses, num_loops
    dtype = xyt0.dtype
    E = edges.mask.shape[0]
    ref_i = edges.reference_indices
    qry_i = edges.query_indices

    if L > 0:
        loop_slot = jnp.clip(
            jnp.cumsum(edges.is_loop.astype(jnp.int32)) - 1, 0, L - 1
        )
    else:
        loop_slot = jnp.zeros((E,), jnp.int32)
    is_loop = edges.is_loop > 0

    free_ref = free_mask[ref_i]
    free_qry = free_mask[qry_i]
    fixed_p = (1.0 - free_mask)[:, None]

    def accumulate_pose(contrib_ref, contrib_qry):
        if acc_rounds is None:
            out = jnp.zeros((P,) + contrib_ref.shape[1:], dtype)
            return out.at[ref_i].add(contrib_ref).at[qry_i].add(contrib_qry)
        # scatter-free gather rounds (multifrontal.accumulate_rounds).
        # Honest measurement note: replacing these per-edge scatter-adds
        # changed manhattan10000 end-to-end within noise (~1.2 s both
        # ways) — the sparse path's per-iteration cost is NOT scatter-
        # bound at city scale; kept because the gather form is never
        # the serializing op and composes with higher-degree graphs.
        src = jnp.concatenate(
            [contrib_ref, contrib_qry,
             jnp.zeros((1,) + contrib_ref.shape[1:], dtype)]
        )
        out = src[acc_rounds[0]]
        for t in range(1, acc_rounds.shape[0]):
            out = out + src[acc_rounds[t]]
        return out

    def eval_quadratic(params):
        xyt, switches = params
        sw_full = switches[loop_slot] if L > 0 else jnp.zeros((E,), dtype)
        r, J_ref, J_query, J_s = se2_edge_residuals_and_jacobians(
            xyt, sw_full, edges, switch_penalty
        )
        J_ref = J_ref * free_ref[:, None, None]
        J_query = J_query * free_qry[:, None, None]

        if edge_loss is not None:
            sq = jnp.sum(r * r, axis=1)
            rho, w, _ = edge_loss.evaluate(sq)
            cost = jnp.sum(rho)
            sqrt_w = jnp.sqrt(w)
            r = r * sqrt_w[:, None]
            J_ref = J_ref * sqrt_w[:, None, None]
            J_query = J_query * sqrt_w[:, None, None]
            J_s = J_s * sqrt_w[:, None]
        else:
            cost = jnp.sum(r * r)

        g_p = accumulate_pose(
            jnp.sum(J_ref * r[:, :, None], axis=1),
            jnp.sum(J_query * r[:, :, None], axis=1),
        )
        if L > 0:
            gs_e = jnp.sum(J_s * r, axis=1) * is_loop
            g_s = jnp.zeros((L,), dtype).at[loop_slot].add(gs_e)
        else:
            g_s = jnp.zeros((0,), dtype)

        d_p = accumulate_pose(
            jnp.sum(J_ref * J_ref, axis=1), jnp.sum(J_query * J_query, axis=1)
        )
        if L > 0:
            d_s = jnp.zeros((L,), dtype).at[loop_slot].add(
                jnp.sum(J_s * J_s, axis=1) * is_loop
            )
        else:
            d_s = jnp.zeros((0,), dtype)

        H_rep = (J_ref, J_query, J_s, d_p, d_s)
        return H_rep, (g_p, g_s), cost

    def solve_linear(H_rep, g, lam):
        J_ref, J_query, J_s, d_p, d_s = H_rep
        g_p, g_s = g

        B_aa = jnp.sum(J_ref[:, :, :, None] * J_ref[:, :, None, :], axis=1)
        B_bb = jnp.sum(
            J_query[:, :, :, None] * J_query[:, :, None, :], axis=1
        )
        B_ab = jnp.sum(J_ref[:, :, :, None] * J_query[:, :, None, :], axis=1)

        b_p = -g_p

        if L > 0:
            c = J_s
            cc = jnp.sum(c * c, axis=1)
            gamma = cc + lam * d_s[loop_slot] + 1e-8
            inv_gamma = jnp.where(is_loop, 1.0 / gamma, 0.0)
            Jac = jnp.sum(J_ref * c[:, :, None], axis=1)
            Jbc = jnp.sum(J_query * c[:, :, None], axis=1)
            coef = inv_gamma * g_s[loop_slot]
            b_p = b_p + accumulate_pose(
                Jac * coef[:, None], Jbc * coef[:, None]
            )
            B_aa = B_aa - inv_gamma[:, None, None] * (
                Jac[:, :, None] * Jac[:, None, :]
            )
            B_bb = B_bb - inv_gamma[:, None, None] * (
                Jbc[:, :, None] * Jbc[:, None, :]
            )
            B_ab = B_ab - inv_gamma[:, None, None] * (
                Jac[:, :, None] * Jbc[:, None, :]
            )

        dvec = lam * d_p + fixed_p + 1e-8
        dp = multifrontal.solve(
            plan, ref_i, qry_i, B_aa, B_bb, B_ab, dvec, b_p
        )

        if L > 0:
            v = jnp.einsum("erd,ed->er", J_ref, dp[ref_i]) + jnp.einsum(
                "erd,ed->er", J_query, dp[qry_i]
            )
            ds_e = jnp.where(
                is_loop,
                (-g_s[loop_slot] - jnp.sum(c * v, axis=1)) * inv_gamma,
                0.0,
            )
            ds = jnp.zeros((L,), dtype).at[loop_slot].add(ds_e)
        else:
            ds = jnp.zeros((0,), dtype)
        return dp, ds

    def retract(params, delta):
        xyt, switches = params
        dp, ds = delta
        return (xyt + dp * free_mask[:, None], switches + ds)

    (xyt, switches), summary = lm.solve(
        eval_quadratic, retract, (xyt0, switches0), options,
        solve_linear=solve_linear,
    )
    return xyt, switches, summary
