"""Pose-landmark SLAM: joint optimization of SE(3) poses and 3-D
landmarks from body-frame landmark observations plus relative-pose
(odometry / loop-closure) edges.

The classic landmark-SLAM factor graph — the capability family the
reference does not cover at all (its pose graph is pose-only, its BA is
camera-projection-specific). Observation factor, for pose i observing
landmark j at body-frame position z:

    r = R(q_i)^T (l_j - p_i) - z        (3,)

whitened by optional per-observation sqrt-information, robustified by an
optional per-observation loss. Pose-pose edges reuse the pose-graph edge
machinery verbatim (ops/relative_pose.py: ambient parameterization,
switchable loop constraints, closed-form Jacobians).

TPU design: one XLA program per solve (the canonical lm.solve policy
loop); the quadratic model keeps the landmark block structure explicit —
dense (7P+L)^2 pose/switch block T, dense (7P+L, 3M) coupling W, batched
(M, 3, 3) landmark diagonal D — and ``solve_linear`` eliminates the
landmarks by Schur complement per LM step:

    (T - W D^-1 W^T) dp = -g_T + W D^-1 g_l ;  dl = D^-1 (-g_l - W^T dp)

Landmark count M can far exceed pose count P (the usual regime); the
reduced system is only (7P+L)^2 and the elimination is one MXU matmul
plus batched 3x3 inverses. Memory is O((7P+L) * 3M) for W — the
dense-coupling form is right up to a few thousand poses and tens of
thousands of landmarks (the same envelope as the dense pose graph).
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
    _rotate_jacobian_wrt_quat,
    edge_residuals_and_jacobians,
    stack_sqrt_info,
    apply_sqrt_info,
)
from . import lm
from .bundle_adjustment import _inv3x3
from .pose_graph import ConstraintType, _expand_sqrt_info

Array = jax.Array

_CONJ = np.array([1.0, -1.0, -1.0, -1.0])


class LandmarkObservations(NamedTuple):
    """SoA batch of body-frame landmark observations."""

    pose_indices: Array  # (O,) int32 into packed poses
    landmark_indices: Array  # (O,) int32 into packed landmarks
    measurements: Array  # (O, 3) landmark position in the POSE frame
    mask: Array  # (O,)
    sqrt_info: Optional[Array] = None  # (O, 3) diag or (O, 3, 3)


def observation_residuals_and_jacobians(
    positions: Array,  # (P, 3)
    quaternions: Array,  # (P, 4) ambient (normalized inside)
    landmarks: Array,  # (M, 3)
    obs: LandmarkObservations,
) -> Tuple[Array, Array, Array]:
    """Batched residuals r = R(n(q))^T (l - p) - z and CLOSED-FORM
    Jacobians w.r.t. the ambient pose (7) and the landmark (3).

    R(n)^T v = R(conj(n)) v, so the quaternion derivative is the classic
    rotate-Jacobian at conj(n) chained through conjugation and
    normalization. Verified against jacfwd in tests/test_pose_landmark.py.

    Returns (r (O,3), J_pose (O,3,7), J_lm (O,3,3))."""
    dtype = positions.dtype
    p = positions[obs.pose_indices]
    q = quaternions[obs.pose_indices]
    l = landmarks[obs.landmark_indices]
    n = lie.quat_normalize(q)
    cn = lie.quat_conjugate(n)
    v = l - p  # (O, 3)

    Rt_rows = lie.quat_to_rotmat(cn)  # R(conj n) = R(n)^T, (O, 3, 3)
    r = jnp.einsum("oij,oj->oi", Rt_rows, v) - obs.measurements

    # d r / d l = R^T ; d r / d p = -R^T
    J_l = Rt_rows
    J_p = -Rt_rows
    # d r / d q = d(R(conj n) v)/d(conj n) @ d(conj n)/dn @ dn/dq
    conj_sign = jnp.asarray(_CONJ, dtype)
    J_q = (
        _rotate_jacobian_wrt_quat(cn, v) * conj_sign[None, None, :]
    ) @ _normalize_jacobian(q)  # (O, 3, 4)

    J_pose = jnp.concatenate([J_p, J_q], axis=-1)  # (O, 3, 7)

    if obs.sqrt_info is not None:
        r, J_pose, J_l = apply_sqrt_info(obs.sqrt_info, r, J_pose, J_l)
    m = obs.mask
    return r * m[:, None], J_pose * m[:, None, None], J_l * m[:, None, None]



def _robustify(loss, r, *jacobians):
    """Ceres-style per-block robust reweighting over the squared residual
    norm: returns (cost, r', jacobians'); identity when ``loss`` is None.
    Shared by the edge and observation terms of both landmark solvers."""
    if loss is None:
        return (jnp.sum(r * r), r) + jacobians
    sq = jnp.sum(r * r, axis=1)
    rho, w, _ = loss.evaluate(sq)
    sw = jnp.sqrt(w)
    out = [r * sw[:, None]]
    out += [J * sw.reshape((-1,) + (1,) * (J.ndim - 1)) for J in jacobians]
    return (jnp.sum(rho), *out)


def _assemble_pose_switch_block(
    dimT, rows_ref, rows_qry, col_sw, L, r_e, J_ref, J_query, J_s, dtype
):
    """Dense (dimT, dimT) pose/switch Gauss-Newton block + gradient from
    per-edge Jacobian blocks — ONE copy of the scatter assembly both the
    SE(3) and SE(2) landmark solvers share (mirrors _pose_graph_solve's;
    broadcast-mul-sum products, see docs/ARCHITECTURE.md on small-block
    algebra)."""
    T = jnp.zeros((dimT, dimT), dtype)
    gT = jnp.zeros((dimT,), dtype)
    with jax.default_matmul_precision("highest"):
        B_rr = jnp.sum(J_ref[:, :, :, None] * J_ref[:, :, None, :], axis=1)
        B_rq = jnp.sum(J_ref[:, :, :, None] * J_query[:, :, None, :], axis=1)
        B_qq = jnp.sum(J_query[:, :, :, None] * J_query[:, :, None, :], axis=1)
        g_r = jnp.sum(J_ref * r_e[:, :, None], axis=1)
        g_q = jnp.sum(J_query * r_e[:, :, None], axis=1)
    T = T.at[rows_ref[:, :, None], rows_ref[:, None, :]].add(B_rr)
    T = T.at[rows_ref[:, :, None], rows_qry[:, None, :]].add(B_rq)
    T = T.at[rows_qry[:, :, None], rows_ref[:, None, :]].add(
        jnp.swapaxes(B_rq, 1, 2)
    )
    T = T.at[rows_qry[:, :, None], rows_qry[:, None, :]].add(B_qq)
    gT = gT.at[rows_ref].add(g_r).at[rows_qry].add(g_q)
    if L > 0:
        b_rs = jnp.sum(J_ref * J_s[:, :, None], axis=1)
        b_qs = jnp.sum(J_query * J_s[:, :, None], axis=1)
        T = T.at[rows_ref, col_sw[:, None]].add(b_rs)
        T = T.at[col_sw[:, None], rows_ref].add(b_rs)
        T = T.at[rows_qry, col_sw[:, None]].add(b_qs)
        T = T.at[col_sw[:, None], rows_qry].add(b_qs)
        T = T.at[col_sw, col_sw].add(jnp.sum(J_s * J_s, axis=1))
        gT = gT.at[col_sw].add(jnp.sum(J_s * r_e, axis=1))
    return T, gT


@functools.partial(jax.jit, static_argnums=(9, 10, 11, 12, 13, 14))
def _pose_landmark_solve(
    positions0,  # (P, 3)
    quaternions0,  # (P, 4)
    switches0,  # (L,)
    landmarks0,  # (M, 3)
    edges: PoseGraphEdges,
    obs: LandmarkObservations,
    free_pose,  # (P,)
    free_lm,  # (M,)
    switch_penalty,
    edge_loss,
    obs_loss,
    num_poses: int,
    num_landmarks: int,
    num_loops: int,
    options: Options,
):
    P, M, L = num_poses, num_landmarks, num_loops
    dimT = 7 * P + L
    dtype = positions0.dtype
    E = edges.mask.shape[0]
    O = obs.mask.shape[0]
    ref_i = edges.reference_indices
    qry_i = edges.query_indices
    if L > 0:
        loop_slot = jnp.clip(
            jnp.cumsum(edges.is_loop.astype(jnp.int32)) - 1, 0, L - 1
        )
    else:
        loop_slot = jnp.zeros((E,), jnp.int32)

    free_ref = free_pose[ref_i]
    free_qry = free_pose[qry_i]
    col_mask_T = jnp.concatenate(
        [jnp.repeat(free_pose, 7), jnp.ones((L,), dtype)]
    )
    sevens = jnp.arange(7, dtype=jnp.int32)
    rows_ref = 7 * ref_i[:, None] + sevens[None, :]
    rows_qry = 7 * qry_i[:, None] + sevens[None, :]
    col_sw = 7 * P + loop_slot
    rows_obs = 7 * obs.pose_indices[:, None] + sevens[None, :]  # (O, 7)
    free_obs_pose = free_pose[obs.pose_indices]
    free_obs_lm = free_lm[obs.landmark_indices]

    def quad(params):
        pose_params, sw, lms = params
        pos = pose_params[:, :3]
        quat = pose_params[:, 3:]

        # ---- pose-pose edges (same assembly as the dense pose graph) --
        sw_full = sw[loop_slot] if L > 0 else jnp.zeros((E,), dtype)
        r_e, J_ref, J_query, J_s = edge_residuals_and_jacobians(
            pos, quat, sw_full, edges, switch_penalty
        )
        J_ref = J_ref * free_ref[:, None, None]
        J_query = J_query * free_qry[:, None, None]
        cost_e, r_e, J_ref, J_query, J_s = _robustify(
            edge_loss, r_e, J_ref, J_query, J_s
        )

        T, gT = _assemble_pose_switch_block(
            dimT, rows_ref, rows_qry, col_sw, L, r_e, J_ref, J_query, J_s,
            dtype,
        )

        # ---- landmark observations -----------------------------------
        r_o, J_po, J_lo = observation_residuals_and_jacobians(
            pos, quat, lms, obs
        )
        J_po = J_po * free_obs_pose[:, None, None]
        J_lo = J_lo * free_obs_lm[:, None, None]
        cost_o, r_o, J_po, J_lo = _robustify(obs_loss, r_o, J_po, J_lo)

        with jax.default_matmul_precision("highest"):
            A_pp = jnp.sum(J_po[:, :, :, None] * J_po[:, :, None, :], axis=1)
            D_ll = jnp.sum(J_lo[:, :, :, None] * J_lo[:, :, None, :], axis=1)
            W_pl = jnp.sum(J_po[:, :, :, None] * J_lo[:, :, None, :], axis=1)
            g_po = jnp.sum(J_po * r_o[:, :, None], axis=1)
            g_lo = jnp.sum(J_lo * r_o[:, :, None], axis=1)

        T = T.at[rows_obs[:, :, None], rows_obs[:, None, :]].add(A_pp)
        gT = gT.at[rows_obs].add(g_po)
        D = jnp.zeros((M, 3, 3), dtype).at[obs.landmark_indices].add(D_ll)
        g_l = jnp.zeros((M, 3), dtype).at[obs.landmark_indices].add(g_lo)
        W = jnp.zeros((dimT, M, 3), dtype)
        W = W.at[
            rows_obs[:, :, None],
            obs.landmark_indices[:, None, None],
            jnp.arange(3, dtype=jnp.int32)[None, None, :],
        ].add(W_pl)

        # gauge + rank floors (see _pose_graph_solve for the rationale)
        T = T + jnp.diag(1.0 - col_mask_T) + 1e-8 * jnp.eye(dimT, dtype=dtype)
        D = D + (
            (1.0 - free_lm)[:, None, None] + 1e-8
        ) * jnp.eye(3, dtype=dtype)

        return (T, W, D), (gT, g_l), cost_e + cost_o

    def solve_linear(H_rep, g, lamb):
        T, W, D = H_rep
        gT, g_l = g
        # multiplicative damping on both diagonals (lm.damp_hessian form)
        Td = T + lamb * jnp.diag(jnp.diag(T))
        eye3 = jnp.eye(3, dtype=dtype)
        Dd = D + lamb * (D * eye3)
        Dinv = jnp.linalg.inv(Dd)  # (M, 3, 3)
        with jax.default_matmul_precision("highest"):
            WDinv = jnp.einsum("tma,mab->tmb", W, Dinv)  # (dimT, M, 3)
            A = Td - WDinv.reshape(dimT, 3 * M) @ W.reshape(dimT, 3 * M).T
            rhs = -gT + jnp.einsum("tma,ma->t", WDinv, g_l)
            dp = jax.scipy.linalg.cho_solve(
                jax.scipy.linalg.cho_factor(A, lower=True), rhs
            )
            Wt_dp = jnp.einsum("tma,t->ma", W, dp)
            dl = jnp.einsum("mab,mb->ma", Dinv, -g_l - Wt_dp)
        pose_delta = dp[: 7 * P].reshape(P, 7)
        return (pose_delta, dp[7 * P :], dl)

    def retract(params, delta):
        pose_params, sw, lms = params
        dpose, dsw, dlm = delta
        return (
            pose_params + dpose * free_pose[:, None],
            sw + dsw,
            lms + dlm * free_lm[:, None],
        )

    pose0 = jnp.concatenate([positions0, quaternions0], axis=1)
    (pose_params, sw, lms), summary = lm.solve(
        quad, retract, (pose0, switches0, landmarks0), options,
        solve_linear=solve_linear,
    )
    return pose_params[:, :3], pose_params[:, 3:], sw, lms, summary


class PoseLandmarkOptimizer:
    """Registry + solve() for the pose-landmark graph (same API shape as
    PoseGraphOptimizer, extended with landmarks and observations)."""

    def __init__(
        self,
        dtype=jnp.float64,
        switch_penalty: float = None,
        edge_loss=None,
        obs_loss=None,
        pose_solver: str = "dense",
    ):
        """``pose_solver``: "dense" solves the landmark-Schur-reduced
        pose system as one (7P+L)^2 Cholesky (right up to a few
        thousand poses); "sparse" eliminates landmarks at OBSERVATION
        level and solves the reduced system with the nested-dissection
        multifrontal factorization over pose-edge + landmark
        co-visibility sparsity (_pose_landmark_solve_sparse — city
        scale: the dense coupling tensor never exists)."""
        from ..ops.relative_pose import SWITCH_PENALTY_SCALE

        if pose_solver not in ("dense", "sparse"):
            raise ValueError(f"unknown pose_solver {pose_solver!r}")
        self.pose_solver = pose_solver
        self._sparse_cache = None
        self.dtype = dtype
        self.edge_loss = edge_loss
        self.obs_loss = obs_loss
        self.switch_penalty = (
            SWITCH_PENALTY_SCALE if switch_penalty is None else switch_penalty
        )
        self._poses: Dict[int, Pose] = {}
        self._landmarks: Dict[int, np.ndarray] = {}
        self._constant_poses: set = set()
        self._constant_landmarks: set = set()
        self._constraints: List[dict] = []
        self._observations: List[dict] = []

    # -- registry ----------------------------------------------------
    def set_pose(self, index: int, pose: Pose) -> None:
        self._poses[index] = pose.copy()
        self._cov_cache = None
        self._sparse_cov_cache = None

    def set_landmark(self, index: int, position) -> None:
        self._landmarks[index] = np.asarray(position, np.float64).copy()
        self._cov_cache = None
        self._sparse_cov_cache = None

    def set_pose_constant(self, index: int) -> None:
        if index not in self._poses:
            raise KeyError(f"pose {index} not registered")
        self._constant_poses.add(index)

    def set_landmark_constant(self, index: int) -> None:
        if index not in self._landmarks:
            raise KeyError(f"landmark {index} not registered")
        self._constant_landmarks.add(index)

    def set_constraint(
        self,
        reference_index: int,
        query_index: int,
        relative_pose: Pose,
        constraint_type: int = ConstraintType.ODOMETRY,
        sqrt_info=None,
    ) -> None:
        """Pose-pose edge; see PoseGraphOptimizer.set_constraint."""
        if reference_index not in self._poses or query_index not in self._poses:
            raise KeyError("constraint endpoints must be registered poses")
        if reference_index == query_index:
            raise ValueError("self-constraint is not allowed")
        self._constraints.append(
            dict(
                reference_index=reference_index,
                query_index=query_index,
                relative_pose=relative_pose.copy(),
                type=constraint_type,
                sqrt_info=_expand_sqrt_info(sqrt_info),
            )
        )

    def set_observation(
        self, pose_index: int, landmark_index: int, measurement, sqrt_info=None
    ) -> None:
        """Body-frame observation of a landmark from a pose:
        measurement = R_i^T (l_j - p_i) + noise. ``sqrt_info``: scalar /
        (3,) diagonal / (3, 3) matrix."""
        if pose_index not in self._poses:
            raise KeyError(f"pose {pose_index} not registered")
        if landmark_index not in self._landmarks:
            raise KeyError(f"landmark {landmark_index} not registered")
        w = sqrt_info
        if w is not None:
            w = np.asarray(w, np.float64)
            if w.ndim == 0 or w.size == 1:
                w = np.full(3, float(w.reshape(-1)[0]))
            elif not (w.shape == (3,) or w.shape == (3, 3)):
                # NOT the SE(2) (trans, rot) shorthand: a point residual
                # has no translation/rotation split, so (2,) is an error
                raise ValueError(
                    f"observation sqrt_info must be scalar, (3,) diagonal, "
                    f"or (3, 3); got shape {w.shape}"
                )
        self._observations.append(
            dict(
                pose_index=pose_index,
                landmark_index=landmark_index,
                measurement=np.asarray(measurement, np.float64).copy(),
                sqrt_info=w,
            )
        )

    @property
    def num_poses(self) -> int:
        return len(self._poses)

    @property
    def num_landmarks(self) -> int:
        return len(self._landmarks)

    def pose_indices(self) -> List[int]:
        """Registered pose ids, sorted (the solver's packing order)."""
        return sorted(self._poses)

    def landmark_indices(self) -> List[int]:
        """Registered landmark ids, sorted."""
        return sorted(self._landmarks)

    def constraints(self) -> List[dict]:
        """Shallow copies of the registered pose-pose edge records."""
        return [dict(c) for c in self._constraints]

    def observations(self) -> List[dict]:
        """Shallow copies of the registered observation records."""
        return [dict(o) for o in self._observations]

    def get_pose(self, index: int) -> Pose:
        return self._poses[index].copy()

    def get_landmark(self, index: int) -> np.ndarray:
        return self._landmarks[index].copy()

    # -- solve ---------------------------------------------------------
    def solve(self, options: Optional[Options] = None):
        if options is None:
            options = Options().replace(max_iterations=200)
        if not self._observations:
            raise ValueError(
                "PoseLandmarkOptimizer.solve: no observations registered"
            )
        pose_ids = sorted(self._poses)
        lm_ids = sorted(self._landmarks)
        pose_of = {pi: i for i, pi in enumerate(pose_ids)}
        lm_of = {li: i for i, li in enumerate(lm_ids)}
        P, M = len(pose_ids), len(lm_ids)
        E = len(self._constraints)
        dtype = self.dtype

        positions = np.stack([self._poses[pi].translation for pi in pose_ids])
        quats = np.stack([self._poses[pi].quaternion() for pi in pose_ids])
        lms = np.stack([self._landmarks[li] for li in lm_ids])

        if E:
            is_loop = np.array(
                [
                    1.0 if c["type"] == ConstraintType.LOOP else 0.0
                    for c in self._constraints
                ]
            )
            edges = PoseGraphEdges(
                jnp.asarray(
                    np.array([pose_of[c["reference_index"]] for c in self._constraints], np.int32)
                ),
                jnp.asarray(
                    np.array([pose_of[c["query_index"]] for c in self._constraints], np.int32)
                ),
                jnp.asarray(
                    np.stack([c["relative_pose"].translation for c in self._constraints]), dtype
                ),
                jnp.asarray(
                    np.stack([c["relative_pose"].quaternion() for c in self._constraints]), dtype
                ),
                jnp.asarray(is_loop, dtype),
                jnp.ones((E,), dtype),
                sqrt_info=(
                    None
                    if (w := stack_sqrt_info([c["sqrt_info"] for c in self._constraints], 6)) is None
                    else jnp.asarray(w, dtype)
                ),
            )
            L = int(is_loop.sum())
        else:
            # one masked placeholder edge keeps shapes static and nonzero
            edges = PoseGraphEdges(
                jnp.zeros((1,), jnp.int32),
                jnp.asarray([min(1, P - 1)], jnp.int32),
                jnp.zeros((1, 3), dtype),
                jnp.asarray([[1.0, 0.0, 0.0, 0.0]], dtype),
                jnp.zeros((1,), dtype),
                jnp.zeros((1,), dtype),
            )
            L = 0

        obs = LandmarkObservations(
            jnp.asarray(
                np.array([pose_of[o["pose_index"]] for o in self._observations], np.int32)
            ),
            jnp.asarray(
                np.array([lm_of[o["landmark_index"]] for o in self._observations], np.int32)
            ),
            jnp.asarray(np.stack([o["measurement"] for o in self._observations]), dtype),
            jnp.ones((len(self._observations),), dtype),
            sqrt_info=(
                None
                if (wo := stack_sqrt_info([o["sqrt_info"] for o in self._observations], 3)) is None
                else jnp.asarray(wo, dtype)
            ),
        )

        free_pose = np.ones(P)
        for pi in self._constant_poses:
            free_pose[pose_of[pi]] = 0.0
        free_lm = np.ones(M)
        for li in self._constant_landmarks:
            free_lm[lm_of[li]] = 0.0

        if self.pose_solver == "sparse":
            pos, quat, sw, lms_out, summary = self._solve_sparse(
                positions, quats, lms, edges, obs, free_pose, free_lm,
                P, M, L, options,
            )
        else:
            pos, quat, sw, lms_out, summary = _pose_landmark_solve(
                jnp.asarray(positions, dtype),
                jnp.asarray(quats, dtype),
                jnp.ones((L,), dtype),
                jnp.asarray(lms, dtype),
                edges,
                obs,
                jnp.asarray(free_pose, dtype),
                jnp.asarray(free_lm, dtype),
                jnp.asarray(self.switch_penalty, dtype),
                self.edge_loss,
                self.obs_loss,
                P,
                M,
                L,
                options,
            )
        pos, quat, sw, lms_out = jax.device_get((pos, quat, sw, lms_out))
        quat = np.array(quat, np.float64)  # device_get buffers are read-only
        quat /= np.linalg.norm(quat, axis=1, keepdims=True)
        for i, pi in enumerate(pose_ids):
            self._poses[pi] = Pose(
                np_quat_to_rotmat(quat[i]), np.asarray(pos[i], np.float64)
            )
        for j, li in enumerate(lm_ids):
            self._landmarks[li] = np.asarray(lms_out[j], np.float64)
        self._last_switches = np.asarray(sw, np.float64).copy()
        self._cov_cache = None
        self._sparse_cov_cache = None
        return summary, np.asarray(sw, np.float64)

    def _solve_sparse(self, positions, quats, lms, edges, obs, free_pose,
                      free_lm, P, M, L, options):
        """Co-visibility symbolic phase (cached per topology) + the
        sparse reduced solve."""
        from . import multifrontal

        dtype = self.dtype
        pose_np = np.asarray(obs.pose_indices)
        lm_np = np.asarray(obs.landmark_indices)
        ref_np = np.asarray(edges.reference_indices, np.int64)
        qry_np = np.asarray(edges.query_indices, np.int64)
        key = (P, M, pose_np.tobytes(), lm_np.tobytes(),
               ref_np.tobytes(), qry_np.tobytes())
        if self._sparse_cache is not None and self._sparse_cache[0] == key:
            plan, pairs = self._sparse_cache[1]
        else:
            pairs = build_covis_pairs(pose_np, lm_np)
            plan = multifrontal.symbolic(
                P,
                np.concatenate([ref_np, pairs[0]]),
                np.concatenate([qry_np, pairs[1]]),
                d=7,
                coords=np.asarray(positions, np.float64),
                leaf_size=16,
            )
            self._sparse_cache = (key, (plan, pairs))
        pair_a, pair_b, pr_i, pr_j, pair_slot, dg_i, dg_j = pairs
        return _pose_landmark_solve_sparse(
            jnp.asarray(positions, dtype),
            jnp.asarray(quats, dtype),
            jnp.ones((L,), dtype),
            jnp.asarray(lms, dtype),
            edges,
            obs,
            jnp.asarray(free_pose, dtype),
            jnp.asarray(free_lm, dtype),
            jnp.asarray(self.switch_penalty, dtype),
            jnp.asarray(pair_a, jnp.int32),
            jnp.asarray(pair_b, jnp.int32),
            jnp.asarray(pr_i),
            jnp.asarray(pr_j),
            jnp.asarray(pair_slot),
            jnp.asarray(dg_i),
            jnp.asarray(dg_j),
            edge_loss=self.edge_loss,
            obs_loss=self.obs_loss,
            num_poses=P,
            num_landmarks=M,
            num_loops=L,
            num_pairs=int(len(pair_a)),
            plan=plan,
            options=options,
        )

    # -- uncertainty ---------------------------------------------------
    def covariance(self, indices=None, method="auto") -> Dict[int, np.ndarray]:
        """Marginal 6x6 TANGENT-space pose covariance blocks from the
        JOINT pose+landmark information — see PoseGraphOptimizer.
        covariance for the conventions.

        ``method``: "dense" inverts the full joint (6P+3M)^2 information
        host-side (O((6P+3M)^3) — fine to a few hundred poses);
        "sparse" (round 5) eliminates the landmark blocks exactly per
        landmark and runs the multifrontal Takahashi selected inverse on
        the reduced pose system over pose-edge + co-visibility sparsity
        — the 5,000x15,000 headline fixture answers in seconds where
        the joint dim (75k) makes the dense inverse unusable; "auto"
        picks sparse once the joint dim exceeds ~2,400. Both agree to
        f64 roundoff (tests/test_pose_landmark.py)."""
        method = self._pick_cov_method(method)
        if method == "sparse":
            pose_blocks, _, pose_of, _ = self._sparse_marginals()
            ids = self.pose_indices() if indices is None else indices
            return {pi: pose_blocks[pose_of[pi]].copy() for pi in ids}
        Sigma, pose_of, lm_of = self._joint_covariance()
        ids = self.pose_indices() if indices is None else indices
        return {
            pi: Sigma[6 * pose_of[pi] : 6 * pose_of[pi] + 6,
                      6 * pose_of[pi] : 6 * pose_of[pi] + 6].copy()
            for pi in ids
        }

    def landmark_covariance(self, indices=None, method="auto") -> Dict[int, np.ndarray]:
        """Marginal 3x3 landmark covariance blocks (pose uncertainty
        fully propagated). Constant landmarks get zero. ``method`` as in
        :meth:`covariance`; the sparse path back-propagates the reduced
        pose covariance through each landmark's Schur complement,
        Sigma_l = D^-1 + D^-1 W^T Sigma_p W D^-1 (batched 3x3s over the
        co-visibility pairs — no joint inverse ever exists)."""
        method = self._pick_cov_method(method)
        if method == "sparse":
            _, lm_blocks, _, lm_of = self._sparse_marginals()
            ids = self.landmark_indices() if indices is None else indices
            return {li: lm_blocks[lm_of[li]].copy() for li in ids}
        Sigma, pose_of, lm_of = self._joint_covariance()
        P = len(pose_of)
        base = 6 * P
        ids = self.landmark_indices() if indices is None else indices
        return {
            li: Sigma[base + 3 * lm_of[li] : base + 3 * lm_of[li] + 3,
                      base + 3 * lm_of[li] : base + 3 * lm_of[li] + 3].copy()
            for li in ids
        }

    def _pick_cov_method(self, method: str) -> str:
        if method not in ("auto", "dense", "sparse"):
            raise ValueError(f"unknown covariance method {method!r}")
        if method == "auto":
            dim = 6 * len(self._poses) + 3 * len(self._landmarks)
            method = "sparse" if dim > 2400 else "dense"
        return method

    def _sparse_marginals(self):
        """(pose_blocks (P,6,6), lm_blocks (M,3,3), pose_of, lm_of) by
        landmark elimination + multifrontal selected inverse.

        The joint information is [[A, W], [W^T, D]] with D 3x3
        block-diagonal per landmark. Pose marginals are the diagonal
        blocks of S^-1, S = A - W D^-1 W^T, extracted by the Takahashi
        selected inverse over the reduced system's pose-edge +
        co-visibility sparsity (solvers/multifrontal.py — the round-4
        machinery the pose-graph family already uses, threaded through
        the landmark Schur complement). Landmark marginals back-
        propagate: Sigma_l = D_l^-1 + D_l^-1 (sum_{a,b in obs(l)}
        W_al^T Sigma_p[a,b] W_bl) D_l^-1 — every needed off-diagonal
        Sigma_p[a,b] is a co-visibility pair, i.e. an EDGE of the
        reduced system, so the selected inverse provably contains it
        (multifrontal.selected_inverse_pairs)."""
        if getattr(self, "_sparse_cov_cache", None) is not None:
            return self._sparse_cov_cache
        lin = self._tangent_linearization()
        pose_blocks, lm_blocks = _sparse_marginals_from_lin(lin, dp=6, dl=3)
        self._sparse_cov_cache = (
            pose_blocks, lm_blocks, lin["pose_of"], lin["lm_of"]
        )
        return self._sparse_cov_cache

    def _tangent_linearization(self):
        """Host f64 tangent-chart (6-DoF pose / 3-DoF landmark)
        linearization at the current estimates — shared by the dense
        joint inverse and the sparse selected-inverse marginals. Gauge
        (constant) poses/landmarks have their Jacobian columns zeroed.

        Returns a dict with pose/landmark id maps, free masks, the
        freed tangent edge blocks (J_ref, J_qry, ref_i, qry_i — None
        when no constraints), and the freed observation blocks
        (J_pose, J_lm, o_pi, o_li)."""
        from ..ops.relative_pose import (
            np_edge_residuals_and_jacobians,
            np_quat_left_matrix,
        )

        if not self._observations:
            raise ValueError("covariance: no observations registered")
        if not self._constant_poses and not self._constant_landmarks:
            raise ValueError(
                "covariance: gauge-free graph has unbounded covariance; "
                "fix a pose or landmark first"
            )
        pose_ids = sorted(self._poses)
        lm_ids = sorted(self._landmarks)
        pose_of = {pi: i for i, pi in enumerate(pose_ids)}
        lm_of = {li: i for i, li in enumerate(lm_ids)}
        P, M = len(pose_ids), len(lm_ids)

        pos = np.stack([self._poses[pi].translation for pi in pose_ids]).astype(np.float64)
        quat = np.stack([self._poses[pi].quaternion() for pi in pose_ids]).astype(np.float64)
        quat /= np.linalg.norm(quat, axis=1, keepdims=True)
        lms = np.stack([self._landmarks[li] for li in lm_ids]).astype(np.float64)
        Tq = 0.5 * np_quat_left_matrix(quat)[:, :, 1:]  # (P, 4, 3)

        free_p = np.array([0.0 if pi in self._constant_poses else 1.0 for pi in pose_ids])
        free_l = np.array([0.0 if li in self._constant_landmarks else 1.0 for li in lm_ids])

        # pose-pose edges, LOOP edges linearized at the switch values
        # the last solve() learned (treated as FIXED at their MAP value
        # — a rejected loop, s ~ 0, contributes ~no information; the
        # switch's own uncertainty is not propagated)
        edge = None
        if self._constraints:
            ref_i = np.array([pose_of[c["reference_index"]] for c in self._constraints])
            qry_i = np.array([pose_of[c["query_index"]] for c in self._constraints])
            is_loop = np.array(
                [1.0 if c["type"] == ConstraintType.LOOP else 0.0
                 for c in self._constraints]
            )
            sw = getattr(self, "_last_switches", None)
            L = int(is_loop.sum())
            if sw is None or len(sw) != L:
                sw = np.ones(L)
            slot = np.clip(np.cumsum(is_loop.astype(int)) - 1, 0, max(L - 1, 0))
            sw_full = np.where(is_loop > 0, sw[slot] if L else 1.0, 1.0)
            w6 = stack_sqrt_info([c["sqrt_info"] for c in self._constraints], 6)
            r, J_ref, J_qry, _ = np_edge_residuals_and_jacobians(
                pos, quat, sw_full,
                ref_i, qry_i,
                np.stack([c["relative_pose"].translation for c in self._constraints]),
                np.stack([c["relative_pose"].quaternion() for c in self._constraints]),
                is_loop,
                0.0,
                sqrt_info=w6,
            )
            if self.edge_loss is not None:
                sq = np.sum(r * r, axis=1)
                _, w, _ = self.edge_loss.evaluate(sq)
                s = np.sqrt(np.asarray(w, np.float64))[:, None, None]
                J_ref = J_ref * s
                J_qry = J_qry * s
            J_ref = np.concatenate(
                [J_ref[:, :, :3], J_ref[:, :, 3:] @ Tq[ref_i]], axis=2
            ) * free_p[ref_i][:, None, None]
            J_qry = np.concatenate(
                [J_qry[:, :, :3], J_qry[:, :, 3:] @ Tq[qry_i]], axis=2
            ) * free_p[qry_i][:, None, None]
            edge = (J_ref, J_qry, ref_i, qry_i)

        # observations
        o_pi = np.array([pose_of[o["pose_index"]] for o in self._observations])
        o_li = np.array([lm_of[o["landmark_index"]] for o in self._observations])
        meas = np.stack([o["measurement"] for o in self._observations])
        wo = stack_sqrt_info([o["sqrt_info"] for o in self._observations], 3)
        r_o, J_pose_amb, J_lm = np_observation_jacobians(
            pos, quat, lms, o_pi, o_li, meas, wo
        )
        if self.obs_loss is not None:
            sq = np.sum(r_o * r_o, axis=1)
            _, w, _ = self.obs_loss.evaluate(sq)
            s = np.sqrt(np.asarray(w, np.float64))[:, None, None]
            J_pose_amb = J_pose_amb * s
            J_lm = J_lm * s
        J_pose = np.concatenate(
            [J_pose_amb[:, :, :3], J_pose_amb[:, :, 3:] @ Tq[o_pi]], axis=2
        ) * free_p[o_pi][:, None, None]
        J_lm = J_lm * free_l[o_li][:, None, None]
        return dict(
            pose_ids=pose_ids, lm_ids=lm_ids, pose_of=pose_of, lm_of=lm_of,
            P=P, M=M, pos=pos, free_p=free_p, free_l=free_l, edge=edge,
            obs=(J_pose, J_lm, o_pi, o_li),
        )

    def _joint_covariance(self):
        if getattr(self, "_cov_cache", None) is not None:
            # one O((6P+3M)^3) inverse serves both covariance() and
            # landmark_covariance(); invalidated by solve()/registry edits
            return self._cov_cache
        lin = self._tangent_linearization()
        P, M = lin["P"], lin["M"]
        pose_of, lm_of = lin["pose_of"], lin["lm_of"]
        free_p, free_l = lin["free_p"], lin["free_l"]
        dim = 6 * P + 3 * M
        H = np.zeros((dim, dim))
        r6 = np.arange(6)
        if lin["edge"] is not None:
            J_ref, J_qry, ref_i, qry_i = lin["edge"]
            rows_ref = 6 * ref_i[:, None] + r6[None, :]
            rows_qry = 6 * qry_i[:, None] + r6[None, :]
            _np_scatter_pair(H, rows_ref, rows_qry, J_ref, J_qry)
        J_pose, J_lm, o_pi, o_li = lin["obs"]
        rows_p = 6 * o_pi[:, None] + r6[None, :]
        rows_l = 6 * P + 3 * o_li[:, None] + np.arange(3)[None, :]
        _np_scatter_pair(H, rows_p, rows_l, J_pose, J_lm)

        keep = np.concatenate(
            [np.repeat(free_p, 6).astype(bool), np.repeat(free_l, 3).astype(bool)]
        )
        H_red = H[np.ix_(keep, keep)]
        try:
            Sigma_red = np.linalg.inv(H_red)
        except np.linalg.LinAlgError as exc:
            raise ValueError(
                "covariance: information matrix is singular — "
                "under-constrained graph (unobserved landmarks or "
                "disconnected poses)"
            ) from exc
        Sigma = np.zeros((dim, dim))
        kk = np.nonzero(keep)[0]
        Sigma[np.ix_(kk, kk)] = Sigma_red
        self._cov_cache = (Sigma, pose_of, lm_of)
        return self._cov_cache


def _sparse_marginals_from_lin(lin, dp: int, dl: int):
    """Generic sparse selected-inverse marginals engine shared by the
    SE(3) (dp=6, dl=3) and SE(2) (dp=3, dl=2) landmark optimizers —
    see PoseLandmarkOptimizer._sparse_marginals for the derivation.
    ``lin`` is a _tangent_linearization()-shaped dict."""
    from . import multifrontal

    P, M = lin["P"], lin["M"]
    free_p, free_l = lin["free_p"], lin["free_l"]
    J_pose, J_lm, o_pi, o_li = lin["obs"]

    # aggregate observations per (pose, landmark): W_pl cross blocks
    # and per-landmark D blocks
    key = o_pi.astype(np.int64) * M + o_li
    ukey, inv = np.unique(key, return_inverse=True)
    e_pose = (ukey // M).astype(np.int64)
    e_lm = (ukey % M).astype(np.int64)
    nE = len(ukey)
    W_pl = np.zeros((nE, dp, dl))
    np.add.at(W_pl, inv, np.einsum("odi,odj->oij", J_pose, J_lm))
    D = np.zeros((M, dl, dl))
    np.add.at(D, o_li, np.einsum("odi,odj->oij", J_lm, J_lm))
    U = np.zeros((P, dp, dp))
    np.add.at(U, o_pi, np.einsum("odi,odj->oij", J_pose, J_pose))

    # D^-1 per free landmark (constant landmarks have zeroed J_lm;
    # pad their D with identity, then zero the result)
    D_pad = D + (1.0 - free_l)[:, None, None] * np.eye(dl)
    try:
        Dinv = np.linalg.inv(D_pad)
    except np.linalg.LinAlgError as exc:
        raise ValueError(
            "covariance: landmark information is singular — "
            "unobserved free landmarks"
        ) from exc
    Dinv *= free_l[:, None, None]

    # Schur downdates over co-visibility structure of the DEDUPED
    # (pose, landmark) entries (same-pose pairs impossible after
    # dedup, so dg_* are empty)
    pair_a, pair_b, pr_i, pr_j, pair_slot, _, _ = build_covis_pairs(
        e_pose, e_lm
    )
    X = np.einsum("eij,ejk->eik", W_pl, Dinv[e_lm])  # (nE, dp, dl)
    # diagonal downdate per entry: -X_e W_e^T at pose(e)
    np.add.at(U, e_pose, -np.einsum("eij,ekj->eik", X, W_pl))
    npairs = len(pair_a)
    cross = np.zeros((npairs, dp, dp))
    np.add.at(
        cross, pair_slot,
        -np.einsum("kij,klj->kil", X[pr_i], W_pl[pr_j]),
    )

    # reduced-system edges: pose-pose constraints + covis fill pairs
    if lin["edge"] is not None:
        J_ref, J_qry, ref_i, qry_i = lin["edge"]
        Ea = np.einsum("edi,edj->eij", J_ref, J_ref)
        Eb = np.einsum("edi,edj->eij", J_qry, J_qry)
        Eab = np.einsum("edi,edj->eij", J_ref, J_qry)
        e_a = np.concatenate([ref_i.astype(np.int64), pair_a])
        e_b = np.concatenate([qry_i.astype(np.int64), pair_b])
        B_aa = np.concatenate([Ea, np.zeros((npairs, dp, dp))])
        B_bb = np.concatenate([Eb, np.zeros((npairs, dp, dp))])
        B_ab = np.concatenate([Eab, cross])
    else:
        e_a, e_b = pair_a, pair_b
        B_aa = np.zeros((npairs, dp, dp))
        B_bb = np.zeros((npairs, dp, dp))
        B_ab = cross
    diag = U + (1.0 - free_p)[:, None, None] * np.eye(dp)

    # leaf_size tuned for the HOST CPU backend this query runs on
    # (round-5 sweep at 5,000x15,000: 16 -> 15.0 s, 64 -> 8.5, 192 ->
    # 5.4-7.0 — fewer tree levels trade fill for the dense LAPACK
    # efficiency a CPU prefers; marginals bit-identical across sizes)
    plan = multifrontal.symbolic(
        P, e_a, e_b, d=dp, coords=lin["pos"], leaf_size=192
    )

    # One jitted program for the whole numeric phase — run eagerly,
    # factor + Takahashi dispatch ~1,100 primitive programs and the
    # XLA compiles dominate (measured 34 s of a 56 s query at
    # 5,000x15,000); fused it is one compile and ~seconds.
    # ON THE HOST CPU BACKEND under a scoped x64 context: covariance
    # is a host-facing offline query, the dense reference path is
    # host f64, and the Takahashi front covariances of a city-scale
    # co-visibility graph are GB-scale transients — the fused
    # program run on the accelerator crashed the TPU worker
    # (HBM exhaustion) at 5,000x15,000 and would be f32 anyway
    # when x64 is off. Host f64: exact, 13.6 s at that scale.
    def _numeric(Baa, Bbb, Bab, dg):
        fact = multifrontal.factor(plan, Baa, Bbb, Bab, dg)
        return multifrontal.selected_inverse_pairs(
            plan, fact, pair_a, pair_b
        )

    try:
        _enable_x64 = jax.enable_x64  # JAX >= 0.9
    except AttributeError:  # pragma: no cover
        _enable_x64 = jax.experimental.enable_x64
    cpu = jax.devices("cpu")[0]
    with _enable_x64(True), jax.default_device(cpu):
        sig_diag, sig_pairs = jax.jit(_numeric)(
            jnp.asarray(B_aa, jnp.float64),
            jnp.asarray(B_bb, jnp.float64),
            jnp.asarray(B_ab, jnp.float64),
            jnp.asarray(diag, jnp.float64),
        )
        sig_diag = np.asarray(sig_diag)
        sig_pairs = np.asarray(sig_pairs)
    sig_diag = np.asarray(sig_diag, np.float64)
    sig_pairs = np.asarray(sig_pairs, np.float64)
    if not np.all(np.isfinite(sig_diag)):
        raise ValueError(
            "covariance: information matrix is singular — "
            "under-constrained graph (unobserved landmarks or "
            "disconnected poses)"
        )
    pose_blocks = sig_diag * free_p[:, None, None]

    # landmark back-propagation: M_l = sum W^T Sigma_p W over the
    # (a, a) diagonal and both orientations of each (a, b) pair
    Mk = np.zeros((M, dl, dl))
    np.add.at(
        Mk, e_lm,
        np.einsum("eji,ejk,ekl->eil", W_pl, sig_diag[e_pose], W_pl),
    )
    if npairs:
        Sab = np.einsum(
            "kji,kjl,klm->kim", W_pl[pr_i], sig_pairs[pair_slot],
            W_pl[pr_j],
        )  # (ncontrib, dl, dl), lm(pr_i) == lm(pr_j)
        np.add.at(Mk, e_lm[pr_i], Sab + np.swapaxes(Sab, 1, 2))
    lm_blocks = Dinv + np.einsum(
        "lij,ljk,lkm->lim", Dinv, Mk, Dinv
    )
    lm_blocks *= free_l[:, None, None]
    return pose_blocks, lm_blocks


def _np_scatter_pair(H, rows_a, rows_b, J_a, J_b):
    """Scatter-add the Gauss-Newton contributions of a two-block factor
    batch into dense H: diag blocks for a and b plus the symmetric cross
    term (shared by the edge and observation assemblies of both joint-
    covariance builders; same idiom as PoseGraphOptimizer.covariance)."""
    np.add.at(H, (rows_a[:, :, None], rows_a[:, None, :]),
              np.einsum("edi,edj->eij", J_a, J_a))
    np.add.at(H, (rows_b[:, :, None], rows_b[:, None, :]),
              np.einsum("edi,edj->eij", J_b, J_b))
    cross = np.einsum("edi,edj->eij", J_a, J_b)
    np.add.at(H, (rows_a[:, :, None], rows_b[:, None, :]), cross)
    np.add.at(H, (rows_b[:, :, None], rows_a[:, None, :]),
              np.swapaxes(cross, 1, 2))


def np_observation_jacobians(
    positions, quaternions_unit, landmarks, pose_idx, lm_idx, measurements,
    sqrt_info=None,
):
    """Numpy twin of :func:`observation_residuals_and_jacobians` for
    UNIT quaternions (host-side covariance assembly; d(q/|q|)/dq at
    |q|=1 is I - q q^T). Returns (r (O,3), J_pose (O,3,7) ambient,
    J_lm (O,3,3))."""
    q = quaternions_unit[pose_idx]
    p = positions[pose_idx]
    l = landmarks[lm_idx]
    v = l - p
    cn = q * _CONJ

    Rt = np.stack([np_quat_to_rotmat(ci) for ci in cn])  # (O, 3, 3)
    r = np.einsum("oij,oj->oi", Rt, v) - measurements

    def skew(x):
        a, b, c = x[..., 0], x[..., 1], x[..., 2]
        o = np.zeros_like(a)
        return np.stack(
            [np.stack([o, -c, b], -1), np.stack([c, o, -a], -1),
             np.stack([-b, a, o], -1)], -2,
        )

    w = cn[:, 0]
    u = cn[:, 1:]
    uxv = np.cross(u, v)
    d_dw = 2.0 * uxv
    d_du = (
        -2.0 * w[:, None, None] * skew(v)
        - 2.0 * skew(uxv)
        - 2.0 * skew(u) @ skew(v)
    )
    drot_dcn = np.concatenate([d_dw[:, :, None], d_du], axis=-1)  # (O,3,4)
    Dn = np.eye(4)[None] - q[:, :, None] * q[:, None, :]  # unit-q normalize J
    J_q = (drot_dcn * _CONJ[None, None, :]) @ Dn
    J_pose = np.concatenate([-Rt, J_q], axis=-1)
    J_lm = Rt.copy()
    if sqrt_info is not None:
        r, J_pose, J_lm = apply_sqrt_info(sqrt_info, r, J_pose, J_lm)
    return r, J_pose, J_lm


# ----------------------------------------------------------------------------
# SE(2) landmark SLAM (victoria-park-style: VERTEX_XY / EDGE_SE2_XY).
# Same Schur-eliminated design with (3P+L) pose/switch block and 2x2
# landmark blocks; pose-pose edges reuse the SE(2) pose-graph machinery.
# ----------------------------------------------------------------------------


class LandmarkObservations2D(NamedTuple):
    pose_indices: Array  # (O,) int32
    landmark_indices: Array  # (O,) int32
    measurements: Array  # (O, 2) landmark position in the POSE frame
    mask: Array  # (O,)
    sqrt_info: Optional[Array] = None  # (O, 2) diag or (O, 2, 2)


def observation_residuals_and_jacobians_2d(
    xyt: Array,  # (P, 3)
    landmarks: Array,  # (M, 2)
    obs: LandmarkObservations2D,
) -> Tuple[Array, Array, Array]:
    """r = R(th)^T (l - p) - z; closed-form J w.r.t. (x, y, th) and l.

    Returns (r (O,2), J_pose (O,2,3), J_lm (O,2,2))."""
    dtype = xyt.dtype
    pose = xyt[obs.pose_indices]
    l = landmarks[obs.landmark_indices]
    c, s = jnp.cos(pose[:, 2]), jnp.sin(pose[:, 2])
    dx = l[:, 0] - pose[:, 0]
    dy = l[:, 1] - pose[:, 1]
    lx = c * dx + s * dy
    ly = -s * dx + c * dy
    r = jnp.stack([lx, ly], axis=-1) - obs.measurements

    # d r / d th = [-s dx + c dy ; -c dx - s dy]
    J_pose = jnp.stack(
        [
            jnp.stack([-c, -s, -s * dx + c * dy], axis=-1),
            jnp.stack([s, -c, -c * dx - s * dy], axis=-1),
        ],
        axis=-2,
    )  # (O, 2, 3)
    J_lm = jnp.stack(
        [jnp.stack([c, s], axis=-1), jnp.stack([-s, c], axis=-1)], axis=-2
    )  # (O, 2, 2)

    if obs.sqrt_info is not None:
        r, J_pose, J_lm = apply_sqrt_info(obs.sqrt_info, r, J_pose, J_lm)
    m = obs.mask
    return r * m[:, None], J_pose * m[:, None, None], J_lm * m[:, None, None]


@functools.partial(jax.jit, static_argnums=(8, 9, 10, 11, 12, 13))
def _pose_landmark_2d_solve(
    xyt0,  # (P, 3)
    switches0,  # (L,)
    landmarks0,  # (M, 2)
    edges,  # PoseGraph2DEdges
    obs: LandmarkObservations2D,
    free_pose,  # (P,)
    free_lm,  # (M,)
    switch_penalty,
    edge_loss,
    obs_loss,
    num_poses: int,
    num_landmarks: int,
    num_loops: int,
    options: Options,
):
    from .pose_graph import se2_edge_residuals_and_jacobians

    P, M, L = num_poses, num_landmarks, num_loops
    dimT = 3 * P + L
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
    free_ref = free_pose[ref_i]
    free_qry = free_pose[qry_i]
    col_mask_T = jnp.concatenate(
        [jnp.repeat(free_pose, 3), jnp.ones((L,), dtype)]
    )
    threes = jnp.arange(3, dtype=jnp.int32)
    rows_ref = 3 * ref_i[:, None] + threes[None, :]
    rows_qry = 3 * qry_i[:, None] + threes[None, :]
    col_sw = 3 * P + loop_slot
    rows_obs = 3 * obs.pose_indices[:, None] + threes[None, :]
    free_obs_pose = free_pose[obs.pose_indices]
    free_obs_lm = free_lm[obs.landmark_indices]

    def quad(params):
        xyt, sw, lms = params
        sw_full = sw[loop_slot] if L > 0 else jnp.zeros((E,), dtype)
        r_e, J_ref, J_query, J_s = se2_edge_residuals_and_jacobians(
            xyt, sw_full, edges, switch_penalty
        )
        J_ref = J_ref * free_ref[:, None, None]
        J_query = J_query * free_qry[:, None, None]
        cost_e, r_e, J_ref, J_query, J_s = _robustify(
            edge_loss, r_e, J_ref, J_query, J_s
        )

        T, gT = _assemble_pose_switch_block(
            dimT, rows_ref, rows_qry, col_sw, L, r_e, J_ref, J_query, J_s,
            dtype,
        )

        r_o, J_po, J_lo = observation_residuals_and_jacobians_2d(
            xyt, lms, obs
        )
        J_po = J_po * free_obs_pose[:, None, None]
        J_lo = J_lo * free_obs_lm[:, None, None]
        cost_o, r_o, J_po, J_lo = _robustify(obs_loss, r_o, J_po, J_lo)

        with jax.default_matmul_precision("highest"):
            A_pp = jnp.sum(J_po[:, :, :, None] * J_po[:, :, None, :], axis=1)
            D_ll = jnp.sum(J_lo[:, :, :, None] * J_lo[:, :, None, :], axis=1)
            W_pl = jnp.sum(J_po[:, :, :, None] * J_lo[:, :, None, :], axis=1)
            g_po = jnp.sum(J_po * r_o[:, :, None], axis=1)
            g_lo = jnp.sum(J_lo * r_o[:, :, None], axis=1)
        T = T.at[rows_obs[:, :, None], rows_obs[:, None, :]].add(A_pp)
        gT = gT.at[rows_obs].add(g_po)
        D = jnp.zeros((M, 2, 2), dtype).at[obs.landmark_indices].add(D_ll)
        g_l = jnp.zeros((M, 2), dtype).at[obs.landmark_indices].add(g_lo)
        W = jnp.zeros((dimT, M, 2), dtype)
        W = W.at[
            rows_obs[:, :, None],
            obs.landmark_indices[:, None, None],
            jnp.arange(2, dtype=jnp.int32)[None, None, :],
        ].add(W_pl)

        T = T + jnp.diag(1.0 - col_mask_T) + 1e-10 * jnp.eye(dimT, dtype=dtype)
        D = D + (
            (1.0 - free_lm)[:, None, None] + 1e-10
        ) * jnp.eye(2, dtype=dtype)
        return (T, W, D), (gT, g_l), cost_e + cost_o

    def solve_linear(H_rep, g, lamb):
        T, W, D = H_rep
        gT, g_l = g
        Td = T + lamb * jnp.diag(jnp.diag(T))
        eye2 = jnp.eye(2, dtype=dtype)
        Dd = D + lamb * (D * eye2)
        Dinv = jnp.linalg.inv(Dd)
        with jax.default_matmul_precision("highest"):
            WDinv = jnp.einsum("tma,mab->tmb", W, Dinv)
            A = Td - WDinv.reshape(dimT, 2 * M) @ W.reshape(dimT, 2 * M).T
            rhs = -gT + jnp.einsum("tma,ma->t", WDinv, g_l)
            dp = jax.scipy.linalg.cho_solve(
                jax.scipy.linalg.cho_factor(A, lower=True), rhs
            )
            Wt_dp = jnp.einsum("tma,t->ma", W, dp)
            dl = jnp.einsum("mab,mb->ma", Dinv, -g_l - Wt_dp)
        return (dp[: 3 * P].reshape(P, 3), dp[3 * P :], dl)

    def retract(params, delta):
        xyt, sw, lms = params
        dxyt, dsw, dlm = delta
        return (
            xyt + dxyt * free_pose[:, None],
            sw + dsw,
            lms + dlm * free_lm[:, None],
        )

    (xyt, sw, lms), summary = lm.solve(
        quad, retract, (xyt0, switches0, landmarks0), options,
        solve_linear=solve_linear,
    )
    return xyt, sw, lms, summary


class PoseLandmark2DOptimizer:
    """SE(2) pose-landmark SLAM (victoria-park family); same API shape
    as :class:`PoseLandmarkOptimizer` with xyt poses and 2-D landmarks
    (including ``pose_solver="sparse"`` — which see)."""

    def __init__(
        self,
        dtype=jnp.float64,
        switch_penalty: float = None,
        edge_loss=None,
        obs_loss=None,
        pose_solver: str = "dense",
    ):
        from ..ops.relative_pose import SWITCH_PENALTY_SCALE

        if pose_solver not in ("dense", "sparse"):
            raise ValueError(f"unknown pose_solver {pose_solver!r}")
        self.pose_solver = pose_solver
        self._sparse_cache = None
        self.dtype = dtype
        self.edge_loss = edge_loss
        self.obs_loss = obs_loss
        self.switch_penalty = (
            SWITCH_PENALTY_SCALE if switch_penalty is None else switch_penalty
        )
        self._poses: Dict[int, np.ndarray] = {}
        self._landmarks: Dict[int, np.ndarray] = {}
        self._constant_poses: set = set()
        self._constant_landmarks: set = set()
        self._constraints: List[dict] = []
        self._observations: List[dict] = []

    def set_pose(self, index: int, xyt) -> None:
        self._poses[index] = np.asarray(xyt, np.float64).copy()
        self._cov_cache = None
        self._sparse_cov_cache = None

    def set_landmark(self, index: int, position) -> None:
        self._landmarks[index] = np.asarray(position, np.float64).copy()
        self._cov_cache = None
        self._sparse_cov_cache = None

    def set_pose_constant(self, index: int) -> None:
        if index not in self._poses:
            raise KeyError(f"pose {index} not registered")
        self._constant_poses.add(index)

    def set_landmark_constant(self, index: int) -> None:
        if index not in self._landmarks:
            raise KeyError(f"landmark {index} not registered")
        self._constant_landmarks.add(index)

    def set_constraint(
        self,
        reference_index: int,
        query_index: int,
        relative_xyt,
        constraint_type: int = ConstraintType.ODOMETRY,
        sqrt_info=None,
    ) -> None:
        from .pose_graph import _expand_sqrt_info_2d

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

    def set_observation(
        self, pose_index: int, landmark_index: int, measurement, sqrt_info=None
    ) -> None:
        """Pose-frame observation: measurement = R(th)^T (l - p) + noise.
        ``sqrt_info``: scalar / (2,) diagonal / (2, 2) matrix."""
        if pose_index not in self._poses:
            raise KeyError(f"pose {pose_index} not registered")
        if landmark_index not in self._landmarks:
            raise KeyError(f"landmark {landmark_index} not registered")
        w = sqrt_info
        if w is not None:
            w = np.asarray(w, np.float64)
            if w.ndim == 0:
                w = np.full(2, float(w))
            elif w.ndim == 1 and w.size == 1:
                w = np.full(2, w[0])
            elif not (w.shape == (2,) or w.shape == (2, 2)):
                raise ValueError(
                    f"sqrt_info must be scalar, (2,), or (2, 2); got {w.shape}"
                )
        self._observations.append(
            dict(
                pose_index=pose_index,
                landmark_index=landmark_index,
                measurement=np.asarray(measurement, np.float64).copy(),
                sqrt_info=w,
            )
        )

    @property
    def num_poses(self) -> int:
        return len(self._poses)

    @property
    def num_landmarks(self) -> int:
        return len(self._landmarks)

    def pose_indices(self) -> List[int]:
        """Registered pose ids, sorted (the solver's packing order)."""
        return sorted(self._poses)

    def landmark_indices(self) -> List[int]:
        """Registered landmark ids, sorted."""
        return sorted(self._landmarks)

    def constraints(self) -> List[dict]:
        """Shallow copies of the registered pose-pose edge records."""
        return [dict(c) for c in self._constraints]

    def observations(self) -> List[dict]:
        """Shallow copies of the registered observation records."""
        return [dict(o) for o in self._observations]

    def get_pose(self, index: int) -> np.ndarray:
        return self._poses[index].copy()

    def get_landmark(self, index: int) -> np.ndarray:
        return self._landmarks[index].copy()

    def solve(self, options: Optional[Options] = None):
        from .pose_graph import PoseGraph2DEdges

        if options is None:
            options = Options().replace(max_iterations=200)
        if not self._observations:
            raise ValueError(
                "PoseLandmark2DOptimizer.solve: no observations registered"
            )
        pose_ids = sorted(self._poses)
        lm_ids = sorted(self._landmarks)
        pose_of = {pi: i for i, pi in enumerate(pose_ids)}
        lm_of = {li: i for i, li in enumerate(lm_ids)}
        P, M = len(pose_ids), len(lm_ids)
        E = len(self._constraints)
        dtype = self.dtype
        xyt = np.stack([self._poses[pi] for pi in pose_ids])
        lms = np.stack([self._landmarks[li] for li in lm_ids])

        if E:
            is_loop = np.array(
                [
                    1.0 if c["type"] == ConstraintType.LOOP else 0.0
                    for c in self._constraints
                ]
            )
            edges = PoseGraph2DEdges(
                jnp.asarray(
                    np.array([pose_of[c["reference_index"]] for c in self._constraints], np.int32)
                ),
                jnp.asarray(
                    np.array([pose_of[c["query_index"]] for c in self._constraints], np.int32)
                ),
                jnp.asarray(
                    np.stack([c["relative_xyt"] for c in self._constraints]), dtype
                ),
                jnp.asarray(is_loop, dtype),
                jnp.ones((E,), dtype),
                sqrt_info=(
                    None
                    if (w := stack_sqrt_info([c["sqrt_info"] for c in self._constraints], 3)) is None
                    else jnp.asarray(w, dtype)
                ),
            )
            L = int(is_loop.sum())
        else:
            edges = PoseGraph2DEdges(
                jnp.zeros((1,), jnp.int32),
                jnp.asarray([min(1, P - 1)], jnp.int32),
                jnp.zeros((1, 3), dtype),
                jnp.zeros((1,), dtype),
                jnp.zeros((1,), dtype),
            )
            L = 0

        obs = LandmarkObservations2D(
            jnp.asarray(
                np.array([pose_of[o["pose_index"]] for o in self._observations], np.int32)
            ),
            jnp.asarray(
                np.array([lm_of[o["landmark_index"]] for o in self._observations], np.int32)
            ),
            jnp.asarray(np.stack([o["measurement"] for o in self._observations]), dtype),
            jnp.ones((len(self._observations),), dtype),
            sqrt_info=(
                None
                if (wo := stack_sqrt_info([o["sqrt_info"] for o in self._observations], 2)) is None
                else jnp.asarray(wo, dtype)
            ),
        )

        free_pose = np.ones(P)
        for pi in self._constant_poses:
            free_pose[pose_of[pi]] = 0.0
        free_lm = np.ones(M)
        for li in self._constant_landmarks:
            free_lm[lm_of[li]] = 0.0

        if self.pose_solver == "sparse":
            out_xyt, sw, lms_out, summary = self._solve_sparse_2d(
                xyt, lms, edges, obs, free_pose, free_lm, P, M, L,
                options,
            )
        else:
            out_xyt, sw, lms_out, summary = _pose_landmark_2d_solve(
                jnp.asarray(xyt, dtype),
                jnp.ones((L,), dtype),
                jnp.asarray(lms, dtype),
                edges,
                obs,
                jnp.asarray(free_pose, dtype),
                jnp.asarray(free_lm, dtype),
                jnp.asarray(self.switch_penalty, dtype),
                self.edge_loss,
                self.obs_loss,
                P,
                M,
                L,
                options,
            )
        out_xyt, sw, lms_out = jax.device_get((out_xyt, sw, lms_out))
        out_xyt = np.array(out_xyt, np.float64)
        for i, pi in enumerate(pose_ids):
            o = out_xyt[i].copy()
            o[2] = float(np.arctan2(np.sin(o[2]), np.cos(o[2])))
            self._poses[pi] = o
        for j, li in enumerate(lm_ids):
            self._landmarks[li] = np.asarray(lms_out[j], np.float64)
        self._last_switches = np.asarray(sw, np.float64).copy()
        self._cov_cache = None
        self._sparse_cov_cache = None
        return summary, np.asarray(sw, np.float64)

    # -- uncertainty ---------------------------------------------------
    def _solve_sparse_2d(self, xyt, lms, edges, obs, free_pose, free_lm,
                         P, M, L, options):
        """Co-visibility symbolic phase (cached per topology) + the
        sparse reduced solve — SE(2) analog of
        PoseLandmarkOptimizer._solve_sparse."""
        from . import multifrontal

        dtype = self.dtype
        pose_np = np.asarray(obs.pose_indices)
        lm_np = np.asarray(obs.landmark_indices)
        ref_np = np.asarray(edges.reference_indices, np.int64)
        qry_np = np.asarray(edges.query_indices, np.int64)
        key = (P, M, pose_np.tobytes(), lm_np.tobytes(),
               ref_np.tobytes(), qry_np.tobytes())
        if self._sparse_cache is not None and self._sparse_cache[0] == key:
            plan, pairs = self._sparse_cache[1]
        else:
            pairs = build_covis_pairs(pose_np, lm_np)
            plan = multifrontal.symbolic(
                P,
                np.concatenate([ref_np, pairs[0]]),
                np.concatenate([qry_np, pairs[1]]),
                d=3,
                coords=np.asarray(xyt[:, :2], np.float64),
                leaf_size=32,
            )
            self._sparse_cache = (key, (plan, pairs))
        pair_a, pair_b, pr_i, pr_j, pair_slot, dg_i, dg_j = pairs
        return _pose_landmark_2d_solve_sparse(
            jnp.asarray(xyt, dtype),
            jnp.ones((L,), dtype),
            jnp.asarray(lms, dtype),
            edges,
            obs,
            jnp.asarray(free_pose, dtype),
            jnp.asarray(free_lm, dtype),
            jnp.asarray(self.switch_penalty, dtype),
            jnp.asarray(pair_a, jnp.int32),
            jnp.asarray(pair_b, jnp.int32),
            jnp.asarray(pr_i),
            jnp.asarray(pr_j),
            jnp.asarray(pair_slot),
            jnp.asarray(dg_i),
            jnp.asarray(dg_j),
            edge_loss=self.edge_loss,
            obs_loss=self.obs_loss,
            num_poses=P,
            num_landmarks=M,
            num_loops=L,
            num_pairs=int(len(pair_a)),
            plan=plan,
            options=options,
        )

    def covariance(self, indices=None, method="auto") -> Dict[int, np.ndarray]:
        """Marginal 3x3 (x, y, theta) pose covariance; SE(2) analog of
        :meth:`PoseLandmarkOptimizer.covariance` incl. the round-5
        ``method="sparse"`` selected-inverse path (dp=3/dl=2 blocks
        through the same generic Takahashi engine)."""
        method = self._pick_cov_method(method)
        if method == "sparse":
            pose_blocks, _, pose_of, _ = self._sparse_marginals()
            ids = self.pose_indices() if indices is None else indices
            return {pi: pose_blocks[pose_of[pi]].copy() for pi in ids}
        Sigma, pose_of, lm_of = self._joint_covariance()
        ids = self.pose_indices() if indices is None else indices
        return {
            pi: Sigma[3 * pose_of[pi] : 3 * pose_of[pi] + 3,
                      3 * pose_of[pi] : 3 * pose_of[pi] + 3].copy()
            for pi in ids
        }

    def landmark_covariance(self, indices=None, method="auto") -> Dict[int, np.ndarray]:
        """Marginal 2x2 landmark covariance blocks; ``method`` as in
        :meth:`covariance`."""
        method = self._pick_cov_method(method)
        if method == "sparse":
            _, lm_blocks, _, lm_of = self._sparse_marginals()
            ids = self.landmark_indices() if indices is None else indices
            return {li: lm_blocks[lm_of[li]].copy() for li in ids}
        Sigma, pose_of, lm_of = self._joint_covariance()
        base = 3 * len(pose_of)
        ids = self.landmark_indices() if indices is None else indices
        return {
            li: Sigma[base + 2 * lm_of[li] : base + 2 * lm_of[li] + 2,
                      base + 2 * lm_of[li] : base + 2 * lm_of[li] + 2].copy()
            for li in ids
        }

    def _pick_cov_method(self, method: str) -> str:
        if method not in ("auto", "dense", "sparse"):
            raise ValueError(f"unknown covariance method {method!r}")
        if method == "auto":
            dim = 3 * len(self._poses) + 2 * len(self._landmarks)
            method = "sparse" if dim > 2400 else "dense"
        return method

    def _sparse_marginals(self):
        """SE(2) sparse selected-inverse marginals (round 5): the
        generic engine with dp=3 pose / dl=2 landmark blocks."""
        if getattr(self, "_sparse_cov_cache", None) is not None:
            return self._sparse_cov_cache
        lin = self._tangent_linearization_2d()
        pose_blocks, lm_blocks = _sparse_marginals_from_lin(lin, dp=3, dl=2)
        self._sparse_cov_cache = (
            pose_blocks, lm_blocks, lin["pose_of"], lin["lm_of"]
        )
        return self._sparse_cov_cache

    def _tangent_linearization_2d(self):
        """Host f64 SE(2) linearization at the current estimates —
        shared by the dense joint inverse and the sparse selected-
        inverse marginals (same contract as the SE(3) class's
        _tangent_linearization; ``pos`` carries the (x, y) coords for
        the dissection oracle)."""
        if not self._observations:
            raise ValueError("covariance: no observations registered")
        if not self._constant_poses and not self._constant_landmarks:
            raise ValueError(
                "covariance: gauge-free graph has unbounded covariance; "
                "fix a pose or landmark first"
            )
        pose_ids = sorted(self._poses)
        lm_ids = sorted(self._landmarks)
        pose_of = {pi: i for i, pi in enumerate(pose_ids)}
        lm_of = {li: i for i, li in enumerate(lm_ids)}
        P, M = len(pose_ids), len(lm_ids)
        xyt = np.stack([self._poses[pi] for pi in pose_ids]).astype(np.float64)
        lms = np.stack([self._landmarks[li] for li in lm_ids]).astype(np.float64)
        free_p = np.array([0.0 if pi in self._constant_poses else 1.0 for pi in pose_ids])
        free_l = np.array([0.0 if li in self._constant_landmarks else 1.0 for li in lm_ids])

        edge = None
        if self._constraints:
            ref_i = np.array([pose_of[c["reference_index"]] for c in self._constraints])
            qry_i = np.array([pose_of[c["query_index"]] for c in self._constraints])
            rel = np.stack([c["relative_xyt"] for c in self._constraints])
            c_, s_ = np.cos(xyt[ref_i, 2]), np.sin(xyt[ref_i, 2])
            dx = xyt[qry_i, 0] - xyt[ref_i, 0]
            dy = xyt[qry_i, 1] - xyt[ref_i, 1]
            zero = np.zeros_like(c_)
            one = np.ones_like(c_)
            J_ref = np.stack(
                [
                    np.stack([-c_, -s_, -s_ * dx + c_ * dy], -1),
                    np.stack([s_, -c_, -c_ * dx - s_ * dy], -1),
                    np.stack([zero, zero, -one], -1),
                ],
                -2,
            )
            J_qry = np.stack(
                [
                    np.stack([c_, s_, zero], -1),
                    np.stack([-s_, c_, zero], -1),
                    np.stack([zero, zero, one], -1),
                ],
                -2,
            )
            w3 = stack_sqrt_info([c["sqrt_info"] for c in self._constraints], 3)
            if w3 is not None:
                lx = c_ * dx + s_ * dy
                ly = -s_ * dx + c_ * dy
                dth = xyt[qry_i, 2] - xyt[ref_i, 2] - rel[:, 2]
                r_e = np.stack(
                    [lx - rel[:, 0], ly - rel[:, 1],
                     np.arctan2(np.sin(dth), np.cos(dth))], -1,
                )
                r_e, J_ref, J_qry = apply_sqrt_info(w3, r_e, J_ref, J_qry)
            elif self.edge_loss is not None:
                lx = c_ * dx + s_ * dy
                ly = -s_ * dx + c_ * dy
                dth = xyt[qry_i, 2] - xyt[ref_i, 2] - rel[:, 2]
                r_e = np.stack(
                    [lx - rel[:, 0], ly - rel[:, 1],
                     np.arctan2(np.sin(dth), np.cos(dth))], -1,
                )
            if self.edge_loss is not None:
                sq = np.sum(r_e * r_e, axis=1)
                _, w, _ = self.edge_loss.evaluate(sq)
                sw_ = np.sqrt(np.asarray(w, np.float64))[:, None, None]
                J_ref = J_ref * sw_
                J_qry = J_qry * sw_
            # LOOP edges at their learned (fixed) switch values, like
            # the 3-D class
            is_loop = np.array(
                [1.0 if c["type"] == ConstraintType.LOOP else 0.0
                 for c in self._constraints]
            )
            L = int(is_loop.sum())
            sw = getattr(self, "_last_switches", None)
            if sw is None or len(sw) != L:
                sw = np.ones(L)
            slot = np.clip(np.cumsum(is_loop.astype(int)) - 1, 0, max(L - 1, 0))
            sw_full = np.where(is_loop > 0, sw[slot] if L else 1.0, 1.0)
            J_ref = J_ref * (sw_full * free_p[ref_i])[:, None, None]
            J_qry = J_qry * (sw_full * free_p[qry_i])[:, None, None]
            edge = (J_ref, J_qry, ref_i, qry_i)

        # observations
        o_pi = np.array([pose_of[o["pose_index"]] for o in self._observations])
        o_li = np.array([lm_of[o["landmark_index"]] for o in self._observations])
        meas = np.stack([o["measurement"] for o in self._observations])
        c_, s_ = np.cos(xyt[o_pi, 2]), np.sin(xyt[o_pi, 2])
        dx = lms[o_li, 0] - xyt[o_pi, 0]
        dy = lms[o_li, 1] - xyt[o_pi, 1]
        r_o = np.stack(
            [c_ * dx + s_ * dy - meas[:, 0], -s_ * dx + c_ * dy - meas[:, 1]], -1
        )
        J_pose = np.stack(
            [
                np.stack([-c_, -s_, -s_ * dx + c_ * dy], -1),
                np.stack([s_, -c_, -c_ * dx - s_ * dy], -1),
            ],
            -2,
        )
        J_lm = np.stack(
            [np.stack([c_, s_], -1), np.stack([-s_, c_], -1)], -2
        )
        wo = stack_sqrt_info([o["sqrt_info"] for o in self._observations], 2)
        if wo is not None:
            r_o, J_pose, J_lm = apply_sqrt_info(wo, r_o, J_pose, J_lm)
        if self.obs_loss is not None:
            sq = np.sum(r_o * r_o, axis=1)
            _, w, _ = self.obs_loss.evaluate(sq)
            sw_ = np.sqrt(np.asarray(w, np.float64))[:, None, None]
            J_pose = J_pose * sw_
            J_lm = J_lm * sw_
        J_pose = J_pose * free_p[o_pi][:, None, None]
        J_lm = J_lm * free_l[o_li][:, None, None]
        return dict(
            pose_ids=pose_ids, lm_ids=lm_ids, pose_of=pose_of, lm_of=lm_of,
            P=P, M=M, pos=xyt[:, :2].copy(), free_p=free_p, free_l=free_l,
            edge=edge, obs=(J_pose, J_lm, o_pi, o_li),
        )

    def _joint_covariance(self):
        if getattr(self, "_cov_cache", None) is not None:
            return self._cov_cache
        lin = self._tangent_linearization_2d()
        P, M = lin["P"], lin["M"]
        pose_of, lm_of = lin["pose_of"], lin["lm_of"]
        free_p, free_l = lin["free_p"], lin["free_l"]
        dim = 3 * P + 2 * M
        H = np.zeros((dim, dim))
        r3 = np.arange(3)
        if lin["edge"] is not None:
            J_ref, J_qry, ref_i, qry_i = lin["edge"]
            rows_ref = 3 * ref_i[:, None] + r3[None, :]
            rows_qry = 3 * qry_i[:, None] + r3[None, :]
            _np_scatter_pair(H, rows_ref, rows_qry, J_ref, J_qry)
        J_pose, J_lm, o_pi, o_li = lin["obs"]
        rows_p = 3 * o_pi[:, None] + r3[None, :]
        rows_l = 3 * P + 2 * o_li[:, None] + np.arange(2)[None, :]
        _np_scatter_pair(H, rows_p, rows_l, J_pose, J_lm)

        keep = np.concatenate(
            [np.repeat(free_p, 3).astype(bool), np.repeat(free_l, 2).astype(bool)]
        )
        H_red = H[np.ix_(keep, keep)]
        try:
            Sigma_red = np.linalg.inv(H_red)
        except np.linalg.LinAlgError as exc:
            raise ValueError(
                "covariance: information matrix is singular — "
                "under-constrained graph"
            ) from exc
        Sigma = np.zeros((dim, dim))
        kk = np.nonzero(keep)[0]
        Sigma[np.ix_(kk, kk)] = Sigma_red
        self._cov_cache = (Sigma, pose_of, lm_of)
        return self._cov_cache


def build_covis_pairs(pose_idx: np.ndarray, lm_idx: np.ndarray):
    """HOST symbolic helper for the sparse reduced pose system: all
    landmark co-visibility contributions.

    For each landmark, every unordered pair of its observations (i, j)
    contributes the Schur cross block -W_i D^-1 W_j^T. Pairs whose two
    observations come from DIFFERENT poses (a < b by pose index) map to
    a unique (a, b) pose pair (the fill-in edges of the reduced
    system); same-pose pairs fold into that pose's diagonal block.

    Returns (pair_a, pair_b, pr_i, pr_j, pair_slot, dg_i, dg_j):
      pair_a/pair_b (npairs,) unique pose pairs;
      pr_i/pr_j (ncontrib,) observation ids with pose(pr_i) < pose(pr_j);
      pair_slot (ncontrib,) contribution -> pair row;
      dg_i/dg_j (nsame,) same-pose observation pairs (i != j).
    """
    pose_idx = np.asarray(pose_idx)
    lm_idx = np.asarray(lm_idx)
    n = len(lm_idx)
    empty32 = np.zeros(0, np.int32)
    if n == 0:
        return (np.zeros(0, np.int64), np.zeros(0, np.int64),
                empty32, empty32, empty32, empty32, empty32)
    order = np.argsort(lm_idx, kind="stable")
    sl = lm_idx[order]
    starts = np.flatnonzero(np.r_[True, sl[1:] != sl[:-1]])
    ends = np.r_[starts[1:], n]
    sizes = ends - starts
    total_pairs = int(np.sum(sizes.astype(np.int64) * (sizes - 1) // 2))
    kmax = int(sizes.max())
    # Contribution count is quadratic in the largest observation group: a
    # single long-lived map landmark seen from k poses alone yields
    # k(k-1)/2 Schur cross contributions (round-5 guard — the symbolic
    # phase used to explode silently here).
    if total_pairs > 20_000_000:
        import warnings

        warnings.warn(
            f"build_covis_pairs: {total_pairs:,} co-visibility "
            f"contributions (largest landmark group {kmax:,} "
            f"observations — k(k-1)/2 pairs per landmark). The sparse "
            "reduced system will be built but the symbolic arrays are "
            "O(pairs); consider pose_solver='dense' or capping "
            "observations per landmark.",
            stacklevel=2,
        )
    # vectorized pair enumeration: one triu_indices template per distinct
    # group size, gathered through each group's observation ids (same
    # x < y order as the former nested loop)
    tri_cache = {}
    ii, jj = [], []
    for s, e, k in zip(starts, ends, sizes):
        if k < 2:
            continue
        t = tri_cache.get(k)
        if t is None:
            t = np.triu_indices(int(k), 1)
            tri_cache[k] = t
        g = order[s:e]
        ii.append(g[t[0]])
        jj.append(g[t[1]])
    if not ii:
        return (np.zeros(0, np.int64), np.zeros(0, np.int64),
                empty32, empty32, empty32, empty32, empty32)
    i = np.concatenate(ii)
    j = np.concatenate(jj)
    pa = pose_idx[i].astype(np.int64)
    pb = pose_idx[j].astype(np.int64)
    same = pa == pb
    dg_i, dg_j = i[same], j[same]
    i, j, pa, pb = i[~same], j[~same], pa[~same], pb[~same]
    swap = pa > pb
    pr_i = np.where(swap, j, i)
    pr_j = np.where(swap, i, j)
    a = np.minimum(pa, pb)
    b = np.maximum(pa, pb)
    span = int(pose_idx.max()) + 1
    uk, pair_slot = np.unique(a * span + b, return_inverse=True)
    return (
        uk // span, uk % span,
        pr_i.astype(np.int32), pr_j.astype(np.int32),
        pair_slot.astype(np.int32),
        dg_i.astype(np.int32), dg_j.astype(np.int32),
    )


@functools.partial(
    jax.jit,
    static_argnames=(
        "num_poses", "num_landmarks", "num_loops", "num_pairs", "plan",
        "options", "edge_loss", "obs_loss",
    ),
)
def _pose_landmark_solve_sparse(
    positions0,  # (P, 3)
    quaternions0,  # (P, 4)
    switches0,  # (L,)
    landmarks0,  # (M, 3)
    edges: PoseGraphEdges,
    obs: LandmarkObservations,
    free_pose,  # (P,)
    free_lm,  # (M,)
    switch_penalty,
    pair_a,  # (npairs,) unique co-visibility pose pairs
    pair_b,
    pr_i,  # (ncontrib,) observation pairs (different poses)
    pr_j,
    pair_slot,  # (ncontrib,) -> pair row
    dg_i,  # (nsame,) same-pose observation pairs
    dg_j,
    *,
    edge_loss,
    obs_loss,
    num_poses: int,
    num_landmarks: int,
    num_loops: int,
    num_pairs: int,
    plan,  # multifrontal.Plan over poses (edges = pose edges + covis pairs)
    options: Options,
):
    """Landmark SLAM at city scale: the landmark block is eliminated at
    OBSERVATION level (exactly like the BAL solver — segment-sums, no
    dense (dimT, 3M) coupling tensor) and the Schur-REDUCED pose system
    is solved by the nested-dissection multifrontal factorization
    (solvers/multifrontal.py) instead of a dense (7P+L)^2 Cholesky:

      pair blocks   -W_a D^-1 W_b^T  (co-visibility fill-in, assembled
                                      per unique pose pair)
      diag blocks   A_pp - sum_o W_o D^-1 W_o^T  (per-pose, dense 7x7)
      edge blocks   the pose-graph machinery verbatim, switch variables
                    eliminated exactly per edge (rank-1, in-pattern)

    Memory is O(observations + pairs + fronts); the dense path's
    (7P+L)(3M) coupling and (7P+L)^2 system never exist.
    """
    from . import multifrontal

    P, M, L = num_poses, num_landmarks, num_loops
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
    free_ref = free_pose[ref_i]
    free_qry = free_pose[qry_i]
    fixed_p = (1.0 - free_pose)[:, None]
    free_obs_pose = free_pose[obs.pose_indices]
    free_obs_lm = free_lm[obs.landmark_indices]
    eye3 = jnp.eye(3, dtype=dtype)
    eye7 = jnp.eye(7, dtype=dtype)
    # combined edge list fed to the plan: pose edges then covis pairs
    all_a = jnp.concatenate([ref_i.astype(jnp.int32),
                             jnp.asarray(pair_a, jnp.int32)])
    all_b = jnp.concatenate([qry_i.astype(jnp.int32),
                             jnp.asarray(pair_b, jnp.int32)])

    def quad(params):
        pose_params, sw, lms = params
        pos = pose_params[:, :3]
        quat = pose_params[:, 3:]

        sw_full = sw[loop_slot] if L > 0 else jnp.zeros((E,), dtype)
        r_e, J_ref, J_query, J_s = edge_residuals_and_jacobians(
            pos, quat, sw_full, edges, switch_penalty
        )
        J_ref = J_ref * free_ref[:, None, None]
        J_query = J_query * free_qry[:, None, None]
        cost_e, r_e, J_ref, J_query, J_s = _robustify(
            edge_loss, r_e, J_ref, J_query, J_s
        )

        r_o, J_po, J_lo = observation_residuals_and_jacobians(
            pos, quat, lms, obs
        )
        J_po = J_po * free_obs_pose[:, None, None]
        J_lo = J_lo * free_obs_lm[:, None, None]
        cost_o, r_o, J_po, J_lo = _robustify(obs_loss, r_o, J_po, J_lo)

        cost = cost_e + cost_o
        H_rep = (J_ref, J_query, J_s, J_po, J_lo, r_o)

        # gradient pieces (observation-level, no dense assembly)
        g_p = jnp.zeros((P, 7), dtype)
        g_p = g_p.at[ref_i].add(jnp.sum(J_ref * r_e[:, :, None], axis=1))
        g_p = g_p.at[qry_i].add(jnp.sum(J_query * r_e[:, :, None], axis=1))
        g_p = g_p.at[obs.pose_indices].add(
            jnp.sum(J_po * r_o[:, :, None], axis=1)
        )
        if L > 0:
            gs_e = jnp.sum(J_s * r_e, axis=1) * is_loop
            g_s = jnp.zeros((L,), dtype).at[loop_slot].add(gs_e)
        else:
            g_s = jnp.zeros((0,), dtype)
        g_l = jax.ops.segment_sum(
            jnp.sum(J_lo * r_o[:, :, None], axis=1), obs.landmark_indices, M
        )
        return H_rep, (g_p, g_s, g_l), cost

    def solve_linear(H_rep, g, lamb):
        J_ref, J_query, J_s, J_po, J_lo, r_o = H_rep
        g_p, g_s, g_l = g

        with jax.default_matmul_precision("highest"):
            # landmark diagonal + damping (reference policy on D)
            D_ll = jnp.einsum("odi,odj->oij", J_lo, J_lo)
            D = jax.ops.segment_sum(D_ll, obs.landmark_indices, M)
            D = D + ((1.0 - free_lm)[:, None, None] + 1e-8) * eye3
            Dd = D + lamb * (D * eye3)
            Dinv = _inv3x3(Dd)

            W = jnp.einsum("odi,odj->oij", J_po, J_lo)  # (O, 7, 3)
            WD = jnp.einsum("oab,obc->oac", W, Dinv[obs.landmark_indices])

            # per-pose diagonal blocks: A_pp - same-obs/same-pose WDW^T
            A_pp = jnp.einsum("odi,odj->oij", J_po, J_po)
            diag_blocks = jax.ops.segment_sum(
                A_pp - jnp.einsum("oac,obc->oab", WD, W),
                obs.pose_indices, P,
            )
            if dg_i.shape[0]:
                Csame = -jnp.einsum("kac,kbc->kab", WD[dg_i], W[dg_j])
                diag_blocks = diag_blocks.at[obs.pose_indices[dg_i]].add(
                    Csame + jnp.swapaxes(Csame, -1, -2)
                )

            # co-visibility pair blocks (row a, col b)
            if num_pairs:
                C = -jnp.einsum("kac,kbc->kab", WD[pr_i], W[pr_j])
                B_pair = jax.ops.segment_sum(C, pair_slot, num_pairs)
            else:
                B_pair = jnp.zeros((0, 7, 7), dtype)

            # pose-edge blocks + exact switch elimination (the sparse
            # pose-graph algebra verbatim)
            B_aa = jnp.einsum("erd,erf->edf", J_ref, J_ref)
            B_bb = jnp.einsum("erd,erf->edf", J_query, J_query)
            B_ab = jnp.einsum("erd,erf->edf", J_ref, J_query)
            b_p = -g_p
            b_p = b_p.at[obs.pose_indices].add(
                jnp.einsum("oac,oc->oa", WD, g_l[obs.landmark_indices])
            )
            if L > 0:
                c = J_s
                d_s = jnp.zeros((L,), dtype).at[loop_slot].add(
                    jnp.sum(J_s * J_s, axis=1) * is_loop
                )
                cc = jnp.sum(c * c, axis=1)
                gamma = cc + lamb * d_s[loop_slot] + 1e-8
                inv_gamma = jnp.where(is_loop, 1.0 / gamma, 0.0)
                Jac = jnp.sum(J_ref * c[:, :, None], axis=1)
                Jbc = jnp.sum(J_query * c[:, :, None], axis=1)
                coef = inv_gamma * g_s[loop_slot]
                b_p = b_p.at[ref_i].add(Jac * coef[:, None])
                b_p = b_p.at[qry_i].add(Jbc * coef[:, None])
                B_aa = B_aa - inv_gamma[:, None, None] * (
                    Jac[:, :, None] * Jac[:, None, :]
                )
                B_bb = B_bb - inv_gamma[:, None, None] * (
                    Jbc[:, :, None] * Jbc[:, None, :]
                )
                B_ab = B_ab - inv_gamma[:, None, None] * (
                    Jac[:, :, None] * Jbc[:, None, :]
                )

            # reference damping on the pose diagonal (diag of the
            # UNREDUCED T = edge + obs diag entries), gauge, rank floor
            d_p = jnp.zeros((P, 7), dtype)
            d_p = d_p.at[ref_i].add(jnp.sum(J_ref * J_ref, axis=1))
            d_p = d_p.at[qry_i].add(jnp.sum(J_query * J_query, axis=1))
            d_p = d_p.at[obs.pose_indices].add(jnp.sum(J_po * J_po, axis=1))
            dvec = lamb * d_p + fixed_p + 1e-8
            diag_blocks = diag_blocks + dvec[:, :, None] * eye7

        # assemble blocks along the plan's combined edge list
        Z = jnp.zeros((num_pairs, 7, 7), dtype)
        full_aa = jnp.concatenate([B_aa, Z], axis=0)
        full_bb = jnp.concatenate([B_bb, Z], axis=0)
        full_ab = jnp.concatenate([B_ab, B_pair], axis=0)
        dp = multifrontal.solve(
            plan, all_a, all_b, full_aa, full_bb, full_ab, diag_blocks, b_p
        )

        # switch + landmark back-substitution
        if L > 0:
            v = jnp.einsum("erd,ed->er", J_ref, dp[ref_i]) + jnp.einsum(
                "erd,ed->er", J_query, dp[qry_i]
            )
            ds_e = jnp.where(
                is_loop,
                (-g_s[loop_slot] - jnp.sum(J_s * v, axis=1)) * inv_gamma,
                0.0,
            )
            ds = jnp.zeros((L,), dtype).at[loop_slot].add(ds_e)
        else:
            ds = jnp.zeros((0,), dtype)
        with jax.default_matmul_precision("highest"):
            Wt_dp = jax.ops.segment_sum(
                jnp.einsum("oab,oa->ob", W, dp[obs.pose_indices]),
                obs.landmark_indices, M,
            )
            dl = jnp.einsum("mab,mb->ma", Dinv, -g_l - Wt_dp)
        return (dp, ds, dl)

    def retract(params, delta):
        pose_params, sw, lms = params
        dpose, dsw, dlm = delta
        return (
            pose_params + dpose * free_pose[:, None],
            sw + dsw,
            lms + dlm * free_lm[:, None],
        )

    pose0 = jnp.concatenate([positions0, quaternions0], axis=1)
    (pose_params, sw, lms), summary = lm.solve(
        quad, retract, (pose0, switches0, landmarks0), options,
        solve_linear=solve_linear,
    )
    return pose_params[:, :3], pose_params[:, 3:], sw, lms, summary



def _inv2x2(A):
    """Closed-form batched 2x2 inverse."""
    a, b = A[..., 0, 0], A[..., 0, 1]
    c, d = A[..., 1, 0], A[..., 1, 1]
    det = a * d - b * c
    return jnp.stack(
        [jnp.stack([d, -b], -1), jnp.stack([-c, a], -1)], -2
    ) / det[..., None, None]


@functools.partial(
    jax.jit,
    static_argnames=(
        "num_poses", "num_landmarks", "num_loops", "num_pairs", "plan",
        "options", "edge_loss", "obs_loss",
    ),
)
def _pose_landmark_2d_solve_sparse(
    xyt0,  # (P, 3)
    switches0,  # (L,)
    landmarks0,  # (M, 2)
    edges,  # PoseGraph2DEdges
    obs: LandmarkObservations2D,
    free_pose,  # (P,)
    free_lm,  # (M,)
    switch_penalty,
    pair_a,
    pair_b,
    pr_i,
    pr_j,
    pair_slot,
    dg_i,
    dg_j,
    *,
    edge_loss,
    obs_loss,
    num_poses: int,
    num_landmarks: int,
    num_loops: int,
    num_pairs: int,
    plan,
    options: Options,
):
    """SE(2) analog of :func:`_pose_landmark_solve_sparse` (which see):
    observation-level landmark elimination + the multifrontal reduced
    pose solve over pose-edge + co-visibility sparsity, d=3 pose
    blocks, closed-form 2x2 landmark inverses."""
    from . import multifrontal
    from .pose_graph import se2_edge_residuals_and_jacobians

    P, M, L = num_poses, num_landmarks, num_loops
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
    free_ref = free_pose[ref_i]
    free_qry = free_pose[qry_i]
    fixed_p = (1.0 - free_pose)[:, None]
    free_obs_pose = free_pose[obs.pose_indices]
    free_obs_lm = free_lm[obs.landmark_indices]
    eye2 = jnp.eye(2, dtype=dtype)
    eye3 = jnp.eye(3, dtype=dtype)
    all_a = jnp.concatenate([ref_i.astype(jnp.int32),
                             jnp.asarray(pair_a, jnp.int32)])
    all_b = jnp.concatenate([qry_i.astype(jnp.int32),
                             jnp.asarray(pair_b, jnp.int32)])

    def quad(params):
        xyt, sw, lms = params
        sw_full = sw[loop_slot] if L > 0 else jnp.zeros((E,), dtype)
        r_e, J_ref, J_query, J_s = se2_edge_residuals_and_jacobians(
            xyt, sw_full, edges, switch_penalty
        )
        J_ref = J_ref * free_ref[:, None, None]
        J_query = J_query * free_qry[:, None, None]
        cost_e, r_e, J_ref, J_query, J_s = _robustify(
            edge_loss, r_e, J_ref, J_query, J_s
        )
        r_o, J_po, J_lo = observation_residuals_and_jacobians_2d(
            xyt, lms, obs
        )
        J_po = J_po * free_obs_pose[:, None, None]
        J_lo = J_lo * free_obs_lm[:, None, None]
        cost_o, r_o, J_po, J_lo = _robustify(obs_loss, r_o, J_po, J_lo)

        g_p = jnp.zeros((P, 3), dtype)
        g_p = g_p.at[ref_i].add(jnp.sum(J_ref * r_e[:, :, None], axis=1))
        g_p = g_p.at[qry_i].add(jnp.sum(J_query * r_e[:, :, None], axis=1))
        g_p = g_p.at[obs.pose_indices].add(
            jnp.sum(J_po * r_o[:, :, None], axis=1)
        )
        if L > 0:
            gs_e = jnp.sum(J_s * r_e, axis=1) * is_loop
            g_s = jnp.zeros((L,), dtype).at[loop_slot].add(gs_e)
        else:
            g_s = jnp.zeros((0,), dtype)
        g_l = jax.ops.segment_sum(
            jnp.sum(J_lo * r_o[:, :, None], axis=1), obs.landmark_indices, M
        )
        return (J_ref, J_query, J_s, J_po, J_lo), (g_p, g_s, g_l), (
            cost_e + cost_o
        )

    def solve_linear(H_rep, g, lamb):
        J_ref, J_query, J_s, J_po, J_lo = H_rep
        g_p, g_s, g_l = g
        with jax.default_matmul_precision("highest"):
            D_ll = jnp.einsum("odi,odj->oij", J_lo, J_lo)
            D = jax.ops.segment_sum(D_ll, obs.landmark_indices, M)
            D = D + ((1.0 - free_lm)[:, None, None] + 1e-10) * eye2
            Dd = D + lamb * (D * eye2)
            Dinv = _inv2x2(Dd)

            W = jnp.einsum("odi,odj->oij", J_po, J_lo)  # (O, 3, 2)
            WD = jnp.einsum("oab,obc->oac", W, Dinv[obs.landmark_indices])

            A_pp = jnp.einsum("odi,odj->oij", J_po, J_po)
            diag_blocks = jax.ops.segment_sum(
                A_pp - jnp.einsum("oac,obc->oab", WD, W),
                obs.pose_indices, P,
            )
            if dg_i.shape[0]:
                Csame = -jnp.einsum("kac,kbc->kab", WD[dg_i], W[dg_j])
                diag_blocks = diag_blocks.at[obs.pose_indices[dg_i]].add(
                    Csame + jnp.swapaxes(Csame, -1, -2)
                )
            if num_pairs:
                C = -jnp.einsum("kac,kbc->kab", WD[pr_i], W[pr_j])
                B_pair = jax.ops.segment_sum(C, pair_slot, num_pairs)
            else:
                B_pair = jnp.zeros((0, 3, 3), dtype)

            B_aa = jnp.einsum("erd,erf->edf", J_ref, J_ref)
            B_bb = jnp.einsum("erd,erf->edf", J_query, J_query)
            B_ab = jnp.einsum("erd,erf->edf", J_ref, J_query)
            b_p = -g_p
            b_p = b_p.at[obs.pose_indices].add(
                jnp.einsum("oac,oc->oa", WD, g_l[obs.landmark_indices])
            )
            if L > 0:
                c = J_s
                d_s = jnp.zeros((L,), dtype).at[loop_slot].add(
                    jnp.sum(J_s * J_s, axis=1) * is_loop
                )
                cc = jnp.sum(c * c, axis=1)
                gamma = cc + lamb * d_s[loop_slot] + 1e-8
                inv_gamma = jnp.where(is_loop, 1.0 / gamma, 0.0)
                Jac = jnp.sum(J_ref * c[:, :, None], axis=1)
                Jbc = jnp.sum(J_query * c[:, :, None], axis=1)
                coef = inv_gamma * g_s[loop_slot]
                b_p = b_p.at[ref_i].add(Jac * coef[:, None])
                b_p = b_p.at[qry_i].add(Jbc * coef[:, None])
                B_aa = B_aa - inv_gamma[:, None, None] * (
                    Jac[:, :, None] * Jac[:, None, :]
                )
                B_bb = B_bb - inv_gamma[:, None, None] * (
                    Jbc[:, :, None] * Jbc[:, None, :]
                )
                B_ab = B_ab - inv_gamma[:, None, None] * (
                    Jac[:, :, None] * Jbc[:, None, :]
                )

            d_p = jnp.zeros((P, 3), dtype)
            d_p = d_p.at[ref_i].add(jnp.sum(J_ref * J_ref, axis=1))
            d_p = d_p.at[qry_i].add(jnp.sum(J_query * J_query, axis=1))
            d_p = d_p.at[obs.pose_indices].add(jnp.sum(J_po * J_po, axis=1))
            dvec = lamb * d_p + fixed_p + 1e-10
            diag_blocks = diag_blocks + dvec[:, :, None] * eye3

        Z = jnp.zeros((num_pairs, 3, 3), dtype)
        full_aa = jnp.concatenate([B_aa, Z], axis=0)
        full_bb = jnp.concatenate([B_bb, Z], axis=0)
        full_ab = jnp.concatenate([B_ab, B_pair], axis=0)
        dp = multifrontal.solve(
            plan, all_a, all_b, full_aa, full_bb, full_ab, diag_blocks, b_p
        )

        if L > 0:
            v = jnp.einsum("erd,ed->er", J_ref, dp[ref_i]) + jnp.einsum(
                "erd,ed->er", J_query, dp[qry_i]
            )
            ds_e = jnp.where(
                is_loop,
                (-g_s[loop_slot] - jnp.sum(J_s * v, axis=1)) * inv_gamma,
                0.0,
            )
            ds = jnp.zeros((L,), dtype).at[loop_slot].add(ds_e)
        else:
            ds = jnp.zeros((0,), dtype)
        with jax.default_matmul_precision("highest"):
            Wt_dp = jax.ops.segment_sum(
                jnp.einsum("oab,oa->ob", W, dp[obs.pose_indices]),
                obs.landmark_indices, M,
            )
            dl = jnp.einsum("mab,mb->ma", Dinv, -g_l - Wt_dp)
        return (dp, ds, dl)

    def retract(params, delta):
        xyt, sw, lms = params
        dxyt, dsw, dlm = delta
        return (
            xyt + dxyt * free_pose[:, None],
            sw + dsw,
            lms + dlm * free_lm[:, None],
        )

    (xyt, sw, lms), summary = lm.solve(
        quad, retract, (xyt0, switches0, landmarks0), options,
        solve_linear=solve_linear,
    )
    return xyt, sw, lms, summary
