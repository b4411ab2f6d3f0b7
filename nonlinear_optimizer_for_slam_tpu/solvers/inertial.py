"""Inertial state-estimation graph: keyframe states
(p, q, v, b_g, b_a) bound by preintegrated IMU factors, bias
random-walk factors, relative-pose (vision/lidar odometry) edges, and
unary priors (GPS positions, velocity, bias).

GPS-INS smoothing / inertial odometry, the classic estimation stack on
top of ops/imu.py — entirely beyond the reference (no inertial anything
there). One XLA program per solve: the residual stack is pure jnp, its
Jacobian comes from ONE jacfwd over the flattened (N, 16) state inside
the jitted program (16N columns — the dense-path envelope of a few
hundred keyframes, plenty for a smoothing window; the closed-form-
Jacobian treatment the pose graph got is the optimization to make when
a profile demands it), and the canonical lm.solve policy loop drives
damping/convergence.

State layout per keyframe: [p (3), q (4, ambient), v (3), b_g (3),
b_a (3)] = 16. Gauge: fix the first state (set_state_constant) and/or
anchor with position priors — with gravity observable through the
accelerometer, position priors + a fixed (or yaw-prior'd) first state
make the graph well-posed.
"""

from __future__ import annotations

import functools
from typing import Dict, List, NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..core import lie
from ..core.options import Options
from ..core.pose import Pose, np_quat_to_rotmat
from ..ops.imu import GRAVITY, ImuPreintegrator, PreintegratedImuFactor, imu_residuals
from ..ops.relative_pose import (
    PoseGraphEdges,
    edge_residuals,
    stack_sqrt_info,
)
from . import lm
from .pose_graph import _expand_sqrt_info

Array = jax.Array


class _Priors(NamedTuple):
    """SoA unary priors; each row targets one state's component block."""

    idx: Array  # (K,) int32
    value: Array  # (K, d)
    weight: Array  # (K, d) diagonal sqrt-info


@functools.partial(jax.jit, static_argnums=(9, 10))
def _inertial_solve(
    x0,  # (N, 16)
    factors: PreintegratedImuFactor,
    walk_pairs,  # (B, 2) int32
    walk_w,  # (B, 6)
    edges: Optional[PoseGraphEdges],
    priors,  # dict of _Priors (pos / vel / bias / yawless pose handled via pos+vel)
    free_mask,  # (N, 16) per-component
    gravity,  # (3,) world-frame gravity vector
    mprior,  # None | (idx (), S (15,15), c (15,), lin (16,)): the fixed-lag
    # smoother's Gaussian marginal over one state's 15-DoF tangent
    num_states: int,
    options: Options,
):
    """Production inertial solve: CLOSED-FORM per-factor Jacobians
    (ops.imu.imu_residuals_and_jacobians + the pose-graph edge closed
    form) scatter-assembled into the dense normal equations — the same
    optimization the pose graph got. The full-stack jacfwd formulation
    is preserved as :func:`_inertial_solve_ad` (the test oracle,
    tests/test_inertial.py asserts solve parity): its Jacobian is 16N
    JVP columns of the WHOLE residual stack, which made both compile
    time and per-iteration FLOPs grow ~quadratically with the window."""
    from ..ops.imu import imu_residuals_and_jacobians
    from ..ops.relative_pose import edge_residuals_and_jacobians

    N = num_states
    dtype = x0.dtype
    col_mask = free_mask.reshape(-1)
    n = 16 * N
    arange16 = jnp.arange(16)

    def quad(xflat):
        x = xflat.reshape(N, 16)
        p, q, v, b = x[:, :3], x[:, 3:7], x[:, 7:10], x[:, 10:16]
        H = jnp.zeros((n, n), dtype)
        g = jnp.zeros((n,), dtype)
        cost = jnp.zeros((), dtype)

        def add_pair(H, g, cost, idx_a, idx_b, Ja, Jb, r):
            """Accumulate a two-block factor family: Ja (F, d, 16) at
            state column block idx_a, Jb at idx_b, residual r (F, d)."""
            rows_a = idx_a[:, None] * 16 + arange16  # (F, 16)
            rows_b = idx_b[:, None] * 16 + arange16
            with jax.default_matmul_precision("highest"):
                Haa = jnp.einsum("fda,fdb->fab", Ja, Ja)
                Hab = jnp.einsum("fda,fdb->fab", Ja, Jb)
                Hbb = jnp.einsum("fda,fdb->fab", Jb, Jb)
                ga = jnp.einsum("fda,fd->fa", Ja, r)
                gb = jnp.einsum("fda,fd->fa", Jb, r)
            H = H.at[rows_a[:, :, None], rows_a[:, None, :]].add(Haa)
            H = H.at[rows_a[:, :, None], rows_b[:, None, :]].add(Hab)
            H = H.at[rows_b[:, :, None], rows_a[:, None, :]].add(
                jnp.swapaxes(Hab, -1, -2)
            )
            H = H.at[rows_b[:, :, None], rows_b[:, None, :]].add(Hbb)
            g = g.at[rows_a].add(ga).at[rows_b].add(gb)
            return H, g, cost + jnp.sum(r * r)

        if factors.dt.shape[0] > 0:
            r_f, J_i, J_j = imu_residuals_and_jacobians(
                p, q, v, b, factors, gravity
            )
            J_i = J_i * free_mask[factors.i][:, None, :]
            J_j = J_j * free_mask[factors.j][:, None, :]
            H, g, cost = add_pair(H, g, cost, factors.i, factors.j, J_i, J_j, r_f)

        if walk_pairs.shape[0] > 0:
            wi, wj = walk_pairs[:, 0], walk_pairs[:, 1]
            r_w = (b[wj] - b[wi]) * walk_w  # (B, 6)
            eye6 = jnp.eye(6, dtype=dtype)
            # bias columns live at state offset 10:16
            Jw_i = jnp.concatenate(
                [jnp.zeros((walk_w.shape[0], 6, 10), dtype),
                 -walk_w[:, :, None] * eye6], axis=-1,
            ) * free_mask[wi][:, None, :]
            Jw_j = jnp.concatenate(
                [jnp.zeros((walk_w.shape[0], 6, 10), dtype),
                 walk_w[:, :, None] * eye6], axis=-1,
            ) * free_mask[wj][:, None, :]
            H, g, cost = add_pair(H, g, cost, wi, wj, Jw_i, Jw_j, r_w)

        if edges is not None:
            E = edges.mask.shape[0]
            r_e, J_ref, J_qry, _ = edge_residuals_and_jacobians(
                p, q, jnp.ones((E,), dtype), edges, 0.0
            )  # (E, 7), (E, 7, 7) over (p, q) columns
            pad = jnp.zeros((E, 7, 9), dtype)
            Je_ref = jnp.concatenate([J_ref, pad], axis=-1) * free_mask[
                edges.reference_indices
            ][:, None, :]
            Je_qry = jnp.concatenate([J_qry, pad], axis=-1) * free_mask[
                edges.query_indices
            ][:, None, :]
            H, g, cost = add_pair(
                H, g, cost,
                edges.reference_indices, edges.query_indices,
                Je_ref, Je_qry, r_e,
            )

        for key, off, d in (("pos", 0, 3), ("vel", 7, 3), ("bias", 10, 6)):
            pr = priors[key]
            if pr.idx.shape[0] > 0:
                sl = slice(off, off + d)
                r_p = (x[pr.idx, sl] - pr.value) * pr.weight  # (K, d)
                wm = pr.weight * free_mask[pr.idx, sl]  # masked diag J
                rows = pr.idx[:, None] * 16 + off + jnp.arange(d)
                H = H.at[rows, rows].add(wm * wm)
                g = g.at[rows].add(wm * r_p)
                cost = cost + jnp.sum(r_p * r_p)

        if mprior is not None:
            m_idx, m_S, m_c, m_lin = mprior
            xs = x[m_idx]
            q_lin = m_lin[3:7] / jnp.linalg.norm(m_lin[3:7])
            nq = xs[3:7] / jnp.linalg.norm(xs[3:7])
            e_q = lie.quat_multiply(lie.quat_conjugate(q_lin), nq)
            sign = jnp.where(e_q[0] < 0, -1.0, 1.0)
            e_q = sign * e_q
            dtheta = 2.0 * e_q[1:]
            dphi = jnp.concatenate(
                [xs[:3] - m_lin[:3], dtheta, xs[7:] - m_lin[7:]]
            )
            r_m = m_S @ dphi + m_c  # (15,)
            # d dphi / d xs: translation/vel/bias identity; rotation rows
            # 2 sign (L(conj(q_lin)) Dn)[1:4] over the ambient quaternion
            from ..ops.relative_pose import (
                _normalize_jacobian,
                _quat_left_matrix,
            )

            Dn = _normalize_jacobian(xs[3:7])
            Dth = 2.0 * sign * (_quat_left_matrix(lie.quat_conjugate(q_lin)) @ Dn)[1:4]
            Ddphi = jnp.zeros((15, 16), dtype)
            Ddphi = Ddphi.at[0:3, 0:3].set(jnp.eye(3, dtype=dtype))
            Ddphi = Ddphi.at[3:6, 3:7].set(Dth)
            Ddphi = Ddphi.at[6:15, 7:16].set(jnp.eye(9, dtype=dtype))
            J_m = (m_S @ Ddphi) * free_mask[m_idx][None, :]  # (15, 16)
            rows = m_idx * 16 + arange16
            with jax.default_matmul_precision("highest"):
                H = H.at[rows[:, None], rows[None, :]].add(J_m.T @ J_m)
                g = g.at[rows].add(J_m.T @ r_m)
            cost = cost + jnp.sum(r_m * r_m)

        H = H + jnp.diag(1.0 - col_mask) + 1e-10 * jnp.eye(n, dtype=dtype)
        return H, g, cost

    def retract(xflat, delta):
        return xflat + delta * col_mask

    x, summary = lm.solve(quad, retract, x0.reshape(-1), options)
    return x.reshape(N, 16), summary


def _residual_stack(xflat, factors, walk_pairs, walk_w, edges, priors,
                    gravity, mprior, N):
    """The full whitened residual stack at a flattened (N*16,) state —
    the single objective definition every solve path (closed-form,
    jacfwd oracle) and the external scipy anchor consume (the reference's
    shared-cost-functor pattern, pose_graph_optimizer_ceres.cc:15-69)."""
    dtype = xflat.dtype
    x = xflat.reshape(N, 16)
    p, q, v, b = x[:, :3], x[:, 3:7], x[:, 7:10], x[:, 10:16]
    parts = [imu_residuals(p, q, v, b, factors, gravity).reshape(-1)]
    if walk_pairs.shape[0] > 0:
        dw = (b[walk_pairs[:, 1]] - b[walk_pairs[:, 0]]) * walk_w
        parts.append(dw.reshape(-1))
    if edges is not None:
        E = edges.mask.shape[0]
        r_e = edge_residuals(
            p, q, jnp.ones((E,), dtype), edges, 0.0
        )  # (E, 7); no switchable loops on odometry edges
        parts.append(r_e.reshape(-1))
    for key, sl in (("pos", slice(0, 3)), ("vel", slice(7, 10)),
                    ("bias", slice(10, 16))):
        pr = priors[key]
        if pr.idx.shape[0] > 0:
            parts.append(((x[pr.idx, sl] - pr.value) * pr.weight).reshape(-1))
    if mprior is not None:
        # affine tangent prior r = S dphi + c (same form and
        # rationale as the pose fixed-lag smoother's, fixed_lag.py)
        m_idx, m_S, m_c, m_lin = mprior
        xs = x[m_idx]
        q_lin = m_lin[3:7] / jnp.linalg.norm(m_lin[3:7])
        n = xs[3:7] / jnp.linalg.norm(xs[3:7])
        e_q = lie.quat_multiply(lie.quat_conjugate(q_lin), n)
        # shortest-arc hemisphere (every other rotation residual in
        # this file sign-normalizes; without it a large window step
        # that flips the ambient sign measures the 2pi complement)
        e_q = jnp.where(e_q[0] < 0, -e_q, e_q)
        dtheta = 2.0 * e_q[1:]
        dphi = jnp.concatenate(
            [xs[:3] - m_lin[:3], dtheta, xs[7:] - m_lin[7:]]
        )
        parts.append(m_S @ dphi + m_c)
    return jnp.concatenate(parts)


# jitted evaluation for the host-facing residual_vector API (eager jnp
# on host paths pays per-op dispatch — CLAUDE.md); shape-keyed, compiled
# once per problem structure
_residual_stack_jit = jax.jit(_residual_stack, static_argnums=(8,))


@functools.partial(jax.jit, static_argnums=(9, 10))
def _inertial_solve_ad(
    x0,  # (N, 16)
    factors: PreintegratedImuFactor,
    walk_pairs,  # (B, 2) int32
    walk_w,  # (B, 6)
    edges: Optional[PoseGraphEdges],
    priors,
    free_mask,  # (N, 16) per-component
    gravity,  # (3,)
    mprior,
    num_states: int,
    options: Options,
):
    """Full-stack jacfwd formulation (the round-2 production path, now
    the TEST ORACLE for :func:`_inertial_solve` — one jacfwd over the
    flattened (N, 16) state, 16N JVP columns)."""
    N = num_states
    dtype = x0.dtype
    col_mask = free_mask.reshape(-1)

    def residual_stack(xflat):
        return _residual_stack(
            xflat, factors, walk_pairs, walk_w, edges, priors, gravity,
            mprior, N,
        )

    def quad(xflat):
        r = residual_stack(xflat)
        J = jax.jacfwd(residual_stack)(xflat) * col_mask[None, :]
        with jax.default_matmul_precision("highest"):
            H = J.T @ J
            g = J.T @ r
        H = H + jnp.diag(1.0 - col_mask) + 1e-10 * jnp.eye(16 * N, dtype=dtype)
        return H, g, jnp.sum(r * r)

    def retract(xflat, delta):
        return xflat + delta * col_mask

    x, summary = lm.solve(quad, retract, x0.reshape(-1), options)
    return x.reshape(N, 16), summary


def _pack_imu_factors(imu, of, dtype) -> PreintegratedImuFactor:
    """SoA-pack registered IMU factor dicts (shared by the batch
    optimizer and the fixed-lag smoother)."""
    if imu:
        def st(key):
            return jnp.asarray(np.stack([f[key] for f in imu]), dtype)

        return PreintegratedImuFactor(
            jnp.asarray(np.array([of[f["i"]] for f in imu], np.int32)),
            jnp.asarray(np.array([of[f["j"]] for f in imu], np.int32)),
            st("delta_q"), st("delta_v"), st("delta_p"),
            jnp.asarray(np.array([f["dt"] for f in imu]), dtype),
            st("dR_dbg"), st("dv_dbg"), st("dv_dba"),
            st("dp_dbg"), st("dp_dba"), st("sqrt_info"), st("bias0"),
        )
    z3 = jnp.zeros((0, 3), dtype)
    z33 = jnp.zeros((0, 3, 3), dtype)
    return PreintegratedImuFactor(
        jnp.zeros((0,), jnp.int32), jnp.zeros((0,), jnp.int32),
        jnp.zeros((0, 4), dtype), z3, z3, jnp.zeros((0,), dtype),
        z33, z33, z33, z33, z33,
        jnp.zeros((0, 9, 9), dtype), jnp.zeros((0, 6), dtype),
    )


def _pack_walks(walks, of, dtype):
    pairs = jnp.asarray(
        np.array([[of[i], of[j]] for (i, j, _) in walks], np.int32).reshape(-1, 2)
    )
    w = jnp.asarray(
        np.array([w for (_, _, w) in walks], np.float64).reshape(-1, 6), dtype
    )
    return pairs, w


def _pack_priors(prior_lists, of, dtype):
    out = {}
    for key, d in (("pos", 3), ("vel", 3), ("bias", 6)):
        rows = prior_lists[key]
        out[key] = _Priors(
            jnp.asarray(np.array([of[i] for (i, _, _) in rows], np.int32)),
            jnp.asarray(np.array([v for (_, v, _) in rows], np.float64).reshape(-1, d), dtype),
            jnp.asarray(np.array([w for (_, _, w) in rows], np.float64).reshape(-1, d), dtype),
        )
    return out


class InertialGraphOptimizer:
    """Registry + solve() for the inertial keyframe graph."""

    def __init__(self, dtype=jnp.float64, gravity=None):
        """``gravity``: world-frame gravity vector; default ENU
        (0, 0, -9.81). Pass (0, 0, +9.81) for NED, or a locally
        calibrated magnitude — every IMU residual whitens against it."""
        self.dtype = dtype
        self.gravity = (
            GRAVITY.copy() if gravity is None else np.asarray(gravity, np.float64)
        )
        self._states: Dict[int, np.ndarray] = {}  # (16,) packed
        self._constant: Dict[int, set] = {}
        self._imu: List[dict] = []  # (i, j, factor-array dict)
        self._walks: List[tuple] = []  # (i, j, w6)
        self._edges: List[dict] = []
        self._priors: Dict[str, List[tuple]] = {"pos": [], "vel": [], "bias": []}

    # -- registry ------------------------------------------------------
    def add_state(
        self, index: int, pose: Pose, velocity=None, gyro_bias=None, accel_bias=None
    ) -> None:
        v = np.zeros(3) if velocity is None else np.asarray(velocity, np.float64)
        bg = np.zeros(3) if gyro_bias is None else np.asarray(gyro_bias, np.float64)
        ba = np.zeros(3) if accel_bias is None else np.asarray(accel_bias, np.float64)
        self._states[index] = np.concatenate(
            [pose.translation, pose.quaternion(), v, bg, ba]
        )

    _COMPONENT_SLICES = {"pose": slice(0, 7), "velocity": slice(7, 10),
                         "bias": slice(10, 16)}

    def set_state_constant(self, index: int, components=("pose",)) -> None:
        """Freeze components of a state. DEFAULT freezes only the POSE
        (the gauge): freezing the whole state would pin its bias at the
        initial guess, and strong bias-walk factors then drag every
        other bias toward that frozen value — the classic way to
        silently break bias estimation. Pass
        components=("pose", "velocity", "bias") to freeze everything."""
        if index not in self._states:
            raise KeyError(f"state {index} not registered")
        for c in components:
            if c not in self._COMPONENT_SLICES:
                raise ValueError(
                    f"unknown component {c!r}; use pose/velocity/bias"
                )
        self._constant.setdefault(index, set()).update(components)

    def add_imu_factor(self, i: int, j: int, preintegrated) -> None:
        """``preintegrated``: an ops.imu.ImuPreintegrator (or its
        to_factor_arrays() dict)."""
        if i not in self._states or j not in self._states:
            raise KeyError("IMU factor endpoints must be registered states")
        arr = (
            preintegrated.to_factor_arrays()
            if isinstance(preintegrated, ImuPreintegrator)
            else dict(preintegrated)
        )
        self._imu.append(dict(i=i, j=j, **arr))

    def add_bias_walk(self, i: int, j: int, sqrt_info) -> None:
        """Random-walk factor (b_j - b_i) * w; ``sqrt_info``: scalar,
        (2,) = (gyro, accel), or (6,)."""
        if i not in self._states or j not in self._states:
            raise KeyError("bias-walk endpoints must be registered states")
        w = np.asarray(sqrt_info, np.float64).reshape(-1)
        if w.size == 1:
            w = np.full(6, w[0])
        elif w.size == 2:
            w = np.concatenate([np.full(3, w[0]), np.full(3, w[1])])
        elif w.size != 6:
            raise ValueError(f"sqrt_info must be scalar/(2,)/(6,), got {w.size}")
        self._walks.append((i, j, w))

    def set_constraint(self, i: int, j: int, relative_pose: Pose, sqrt_info=None) -> None:
        """Relative-pose (odometry) edge on the pose slice — the
        pose-graph edge machinery, no switch variables."""
        if i not in self._states or j not in self._states:
            raise KeyError("edge endpoints must be registered states")
        self._edges.append(
            dict(
                i=i, j=j, rel=relative_pose.copy(),
                sqrt_info=_expand_sqrt_info(sqrt_info),
            )
        )

    def add_position_prior(self, index: int, position, sqrt_info=1.0) -> None:
        """GPS-style unary prior on p; ``sqrt_info`` scalar or (3,)."""
        self._add_prior("pos", index, np.asarray(position, np.float64), sqrt_info, 3)

    def add_velocity_prior(self, index: int, velocity, sqrt_info=1.0) -> None:
        self._add_prior("vel", index, np.asarray(velocity, np.float64), sqrt_info, 3)

    def add_bias_prior(self, index: int, bias6, sqrt_info=1.0) -> None:
        self._add_prior("bias", index, np.asarray(bias6, np.float64), sqrt_info, 6)

    def _add_prior(self, key, index, value, sqrt_info, d):
        if index not in self._states:
            raise KeyError(f"state {index} not registered")
        w = np.asarray(sqrt_info, np.float64).reshape(-1)
        w = np.full(d, w[0]) if w.size == 1 else w
        if w.size != d or value.size != d:
            raise ValueError(f"{key} prior needs ({d},) value/weight")
        self._priors[key].append((index, value, w))

    def get_state(self, index: int):
        """(Pose, velocity (3,), bias (6,))."""
        x = self._states[index]
        q = x[3:7] / np.linalg.norm(x[3:7])
        return Pose(np_quat_to_rotmat(q), x[:3].copy()), x[7:10].copy(), x[10:16].copy()

    def get_pose(self, index: int) -> Pose:
        return self.get_state(index)[0]

    @property
    def num_states(self) -> int:
        return len(self._states)

    # -- solve ---------------------------------------------------------
    def _pack_problem(self):
        """SoA-pack the registered factors (shared by solve / the
        residual-vector evaluation API)."""
        ids = sorted(self._states)
        of = {si: k for k, si in enumerate(ids)}
        N = len(ids)
        dtype = self.dtype
        x0 = np.stack([self._states[si] for si in ids])

        factors = _pack_imu_factors(self._imu, of, dtype)
        walk_pairs, walk_w = _pack_walks(self._walks, of, dtype)

        if self._edges:
            E = len(self._edges)
            edges = PoseGraphEdges(
                jnp.asarray(np.array([of[e["i"]] for e in self._edges], np.int32)),
                jnp.asarray(np.array([of[e["j"]] for e in self._edges], np.int32)),
                jnp.asarray(np.stack([e["rel"].translation for e in self._edges]), dtype),
                jnp.asarray(np.stack([e["rel"].quaternion() for e in self._edges]), dtype),
                jnp.zeros((E,), dtype),
                jnp.ones((E,), dtype),
                sqrt_info=(
                    None
                    if (w := stack_sqrt_info([e["sqrt_info"] for e in self._edges], 6)) is None
                    else jnp.asarray(w, dtype)
                ),
            )
        else:
            edges = None

        priors = _pack_priors(self._priors, of, dtype)

        free = np.ones((N, 16))
        for si, comps in self._constant.items():
            for c in comps:
                free[of[si], self._COMPONENT_SLICES[c]] = 0.0
        return ids, of, N, x0, factors, walk_pairs, walk_w, edges, priors, free

    def residual_vector(self, states: Optional[np.ndarray] = None) -> np.ndarray:
        """Whitened residual stack evaluated at ``states`` ((N, 16) in
        sorted-id order; default: the optimizer's current states) — the
        exact objective every solve path minimizes (chi^2 = |r|^2).
        Consistency monitoring, chi^2 tests, and the external scipy
        anchor (tests/test_external_anchor.py) all read this."""
        ids, of, N, x0, factors, walk_pairs, walk_w, edges, priors, _ = (
            self._pack_problem()
        )
        x = x0 if states is None else np.asarray(states, np.float64)
        if x.shape != (N, 16):
            raise ValueError(f"states must be ({N}, 16), got {x.shape}")
        r = _residual_stack_jit(
            jnp.asarray(x.reshape(-1), self.dtype), factors, walk_pairs,
            walk_w, edges, priors, jnp.asarray(self.gravity, self.dtype),
            None, N,
        )
        return np.asarray(jax.device_get(r), np.float64)

    def chi2(self, states: Optional[np.ndarray] = None) -> float:
        """Sum of squared whitened residuals at ``states`` (default: the
        current estimate)."""
        r = self.residual_vector(states)
        return float(r @ r)

    def solve(self, options: Optional[Options] = None):
        if options is None:
            options = Options().replace(max_iterations=100)
        if not self._imu and not self._edges:
            raise ValueError(
                "InertialGraphOptimizer.solve: no IMU factors or edges"
            )
        ids, of, N, x0, factors, walk_pairs, walk_w, edges, priors, free = (
            self._pack_problem()
        )
        dtype = self.dtype

        x, summary = _inertial_solve(
            jnp.asarray(x0, dtype), factors, walk_pairs, walk_w, edges,
            priors, jnp.asarray(free, dtype),
            jnp.asarray(self.gravity, dtype), None, N, options,
        )
        x = np.array(jax.device_get(x), np.float64)
        x[:, 3:7] /= np.linalg.norm(x[:, 3:7], axis=1, keepdims=True)
        for k, si in enumerate(ids):
            self._states[si] = x[k]
        return summary


class FixedLagInertialSmoother:
    """Online sliding-window inertial smoother (fixed-lag VIO/GPS-INS
    backend): keeps the last ``lag`` keyframe states, marginalizes
    older ones EXACTLY — the graph is a Markov chain (IMU + bias-walk
    factors couple only consecutive states, priors are unary), so
    dropping the oldest state produces a single dense Gaussian prior
    over the next state's 15-DoF tangent, carried forward as the
    affine residual r = S dphi + c (the same prior form the pose
    fixed-lag smoother earned the hard way, fixed_lag.py).

    Marginalization runs host-side in f64; the IMU-factor tangent
    Jacobians come from central differences of the numpy residual twin
    (ops.imu.np_imu_residual; step 1e-6 on f64 -> ~1e-9 accurate, far
    below the prior's own linearization error). Window solves are the
    jitted _inertial_solve program.

    Usage::

        sm = FixedLagInertialSmoother(lag=10)
        sm.add_state(0, pose0, velocity=v0)
        for k, pre in stream:           # consecutive keyframes
            sm.add_state(k, prediction, velocity=v_pred)
            sm.add_imu_factor(k - 1, k, pre)
            sm.add_position_prior(k, gps, 1 / sigma)
            sm.update()
    """

    def __init__(self, lag: int = 10, dtype=jnp.float64, gravity=None,
                 marginalize_every: int = 1):
        """``marginalize_every``: flush cadence of the update_async
        streaming mode — 1 (default) keeps blocking semantics; N > 1
        amortizes the per-frame blocking fetch over N frames (the pose
        FixedLagSmoother's round-5 treatment; see its __init__ for the
        full rationale and semantics)."""
        if lag < 2:
            raise ValueError("lag must be >= 2")
        if marginalize_every < 1:
            raise ValueError("marginalize_every must be >= 1")
        self.lag = lag
        self.marginalize_every = marginalize_every
        self._pending: Optional[dict] = None
        self._pending_age = 0
        self._last_summary = None
        self.dtype = dtype
        self.gravity = (
            GRAVITY.copy() if gravity is None else np.asarray(gravity, np.float64)
        )
        self._est: Dict[int, np.ndarray] = {}
        self._history: Dict[int, np.ndarray] = {}
        self._window: List[int] = []
        self._imu: List[dict] = []  # consecutive (i, j) only
        self._walks: List[tuple] = []
        self._priors: Dict[str, List[tuple]] = {"pos": [], "vel": [], "bias": []}
        self._mprior = None  # (anchor_idx, S (15,15), c (15,), lin (16,))
        self._gauge: Optional[int] = None

    # -- registry (same shapes as InertialGraphOptimizer) ---------------
    def add_state(self, index, pose, velocity=None, gyro_bias=None, accel_bias=None):
        if self._window and index != self._window[-1] + 1:
            raise ValueError(
                f"states must be consecutive (next is {self._window[-1] + 1})"
            )
        v = np.zeros(3) if velocity is None else np.asarray(velocity, np.float64)
        bg = np.zeros(3) if gyro_bias is None else np.asarray(gyro_bias, np.float64)
        ba = np.zeros(3) if accel_bias is None else np.asarray(accel_bias, np.float64)
        self._est[index] = np.concatenate(
            [pose.translation, pose.quaternion(), v, bg, ba]
        )
        self._window.append(index)
        if self._gauge is None and self._mprior is None:
            self._gauge = index

    def add_imu_factor(self, i, j, preintegrated):
        if j != i + 1:
            raise ValueError("chain smoother: IMU factors must join i, i+1")
        if i not in self._est or j not in self._est:
            raise KeyError("IMU factor endpoints must be in the window")
        arr = (
            preintegrated.to_factor_arrays()
            if isinstance(preintegrated, ImuPreintegrator)
            else dict(preintegrated)
        )
        self._imu.append(dict(i=i, j=j, **arr))

    def add_bias_walk(self, i, j, sqrt_info):
        if j != i + 1:
            raise ValueError("chain smoother: bias walks must join i, i+1")
        if i not in self._est or j not in self._est:
            raise KeyError("bias-walk endpoints must be in the window")
        w = np.asarray(sqrt_info, np.float64).reshape(-1)
        if w.size == 1:
            w = np.full(6, w[0])
        elif w.size == 2:
            w = np.concatenate([np.full(3, w[0]), np.full(3, w[1])])
        elif w.size != 6:
            raise ValueError(f"sqrt_info must be scalar/(2,)/(6,), got {w.size}")
        self._walks.append((i, j, w))

    def _check_in_window(self, index):
        if index not in self._est:
            raise KeyError(
                f"state {index} is not in the active window "
                f"(marginalized or never added)"
            )

    def add_position_prior(self, index, position, sqrt_info=1.0):
        self._check_in_window(index)
        w = np.asarray(sqrt_info, np.float64).reshape(-1)
        self._priors["pos"].append(
            (index, np.asarray(position, np.float64),
             np.full(3, w[0]) if w.size == 1 else w)
        )

    def add_velocity_prior(self, index, velocity, sqrt_info=1.0):
        self._check_in_window(index)
        w = np.asarray(sqrt_info, np.float64).reshape(-1)
        self._priors["vel"].append(
            (index, np.asarray(velocity, np.float64),
             np.full(3, w[0]) if w.size == 1 else w)
        )

    def add_bias_prior(self, index, bias6, sqrt_info=1.0):
        self._check_in_window(index)
        w = np.asarray(sqrt_info, np.float64).reshape(-1)
        self._priors["bias"].append(
            (index, np.asarray(bias6, np.float64),
             np.full(6, w[0]) if w.size == 1 else w)
        )

    def get_state(self, index):
        self.flush()
        x = self._est.get(index)
        if x is None:
            x = self._history[index]
        q = x[3:7] / np.linalg.norm(x[3:7])
        return (
            Pose(np_quat_to_rotmat(q), x[:3].copy()),
            x[7:10].copy(),
            x[10:16].copy(),
        )

    def get_pose(self, index) -> Pose:
        return self.get_state(index)[0]

    @property
    def window(self) -> List[int]:
        self.flush()
        return list(self._window)

    # -- async streaming (round 5; mirrors FixedLagSmoother) -------------
    def update_async(self, options: Optional[Options] = None) -> None:
        """Dispatch the window solve without fetching; the fetch +
        write-back run at the next flush (every ``marginalize_every``
        update_async calls, any state read, or an explicit flush())."""
        if self._pending is not None:
            self._pending_age += 1
            if self._pending_age >= self.marginalize_every:
                self.flush()
        self._pending = self._dispatch(options)

    @property
    def last_summary(self):
        return self._last_summary

    def flush(self):
        """Complete a pending update_async: one batched fetch +
        write-back. No-op without a pending update."""
        pending = self._pending
        if pending is None:
            return self._last_summary
        self._pending = None
        self._pending_age = 0
        # one batched fetch incl. the summary (separate fetches each pay
        # a dispatch quantum, CLAUDE.md)
        x, summary = jax.device_get((pending["x"], pending["summary"]))
        x = np.array(x, np.float64)
        x[:, 3:7] /= np.linalg.norm(x[:, 3:7], axis=1, keepdims=True)
        for k, si in enumerate(pending["ids"]):
            self._est[si] = x[k]
        self._last_summary = summary
        return self._last_summary

    # -- marginalization -------------------------------------------------
    @staticmethod
    def _apply_tangent(x, dphi):
        from ..ops.relative_pose import np_quat_multiply

        out = x.copy()
        out[:3] += dphi[:3]
        q = x[3:7] / np.linalg.norm(x[3:7])
        dq = np.concatenate([[1.0], 0.5 * dphi[3:6]])
        out[3:7] = np_quat_multiply(q, dq)
        out[7:16] += dphi[6:15]
        return out

    def _dphi(self, x, lin):
        from ..ops.relative_pose import np_quat_conjugate, np_quat_multiply

        q = x[3:7] / np.linalg.norm(x[3:7])
        q_lin = lin[3:7] / np.linalg.norm(lin[3:7])
        e_q = np_quat_multiply(np_quat_conjugate(q_lin), q)
        if e_q[0] < 0:  # shortest arc, matching the jitted prior
            e_q = -e_q
        return np.concatenate(
            [x[:3] - lin[:3], 2.0 * e_q[1:], x[7:] - lin[7:]]
        )

    def _marginalize_oldest(self):
        """Drop the oldest window state: absorb every factor touching it
        into a Gaussian over (x_old, x_next) tangent (30 dims),
        Schur-eliminate the old 15 -> new affine prior on x_next."""
        old = self._window[0]
        nxt = self._window[1]
        x_old = self._est[old]
        x_nxt = self._est[nxt]
        H = np.zeros((30, 30))
        g = np.zeros(30)

        def fd_jacobian(res_fn, x_o, x_n):
            r0 = res_fn(x_o, x_n)
            J = np.zeros((r0.size, 30))
            eps = 1e-6
            for a in range(15):
                d = np.zeros(15); d[a] = eps
                J[:, a] = (
                    res_fn(self._apply_tangent(x_o, d), x_n)
                    - res_fn(self._apply_tangent(x_o, -d), x_n)
                ) / (2 * eps)
            for a in range(15):
                d = np.zeros(15); d[a] = eps
                J[:, 15 + a] = (
                    res_fn(x_o, self._apply_tangent(x_n, d))
                    - res_fn(x_o, self._apply_tangent(x_n, -d))
                ) / (2 * eps)
            return r0, J

        def absorb(r0, J):
            nonlocal H, g
            H += J.T @ J
            g += J.T @ r0

        from ..ops.imu import np_imu_residual

        imu_keep = []
        for f in self._imu:
            if f["i"] == old:
                r0, J = fd_jacobian(
                    lambda a, b: np_imu_residual(a, b, f, self.gravity),
                    x_old, x_nxt,
                )
                absorb(r0, J)
            else:
                imu_keep.append(f)
        self._imu = imu_keep

        walk_keep = []
        for (i, j, w) in self._walks:
            if i == old:
                r0 = (x_nxt[10:16] - x_old[10:16]) * w
                J = np.zeros((6, 30))
                J[:, 9:15] = -np.diag(w)
                J[:, 24:30] = np.diag(w)
                absorb(r0, J)
            else:
                walk_keep.append((i, j, w))
        self._walks = walk_keep

        for key, sl, tsl in (("pos", slice(0, 3), slice(0, 3)),
                             ("vel", slice(7, 10), slice(6, 9)),
                             ("bias", slice(10, 16), slice(9, 15))):
            keep = []
            for (idx, val, w) in self._priors[key]:
                if idx == old:
                    r0 = (x_old[sl] - val) * w
                    J = np.zeros((r0.size, 30))
                    J[:, tsl] = np.diag(w)
                    absorb(r0, J)
                else:
                    keep.append((idx, val, w))
            self._priors[key] = keep

        if self._mprior is not None:
            a_idx, S, c, lin = self._mprior
            assert a_idx == old, "marginal prior must sit on the oldest state"
            r0 = S @ self._dphi(x_old, lin) + c
            # d dphi/d tangent at x_old: translation/vel/bias identity;
            # rotation block d(2 vec(q_lin^-1 (q (x) (1, dth/2))))/d dth
            # = vec-part of L(q_lin^-1 q); FD keeps it simple and exact
            # to O(eps^2) like the factor Jacobians
            J = np.zeros((15, 30))
            eps = 1e-6
            for a in range(15):
                d = np.zeros(15); d[a] = eps
                J[:, a] = (
                    S @ self._dphi(self._apply_tangent(x_old, d), lin)
                    - S @ self._dphi(self._apply_tangent(x_old, -d), lin)
                ) / (2 * eps)
            absorb(r0, J)
            self._mprior = None

        if self._gauge == old:
            # the very first marginalization absorbs the gauge: pin the
            # old state's POSE tangent (only — its velocity/bias carry
            # real information from the absorbed factors) so the
            # eliminated block is nonsingular and the gauge flows into
            # the prior
            H[:6, :6] += 1e8 * np.eye(6)
            self._gauge = None

        H_oo = H[:15, :15]
        H_on = H[:15, 15:]
        g_o = g[:15]
        sol = np.linalg.solve(H_oo + 1e-12 * np.eye(15),
                              np.concatenate([H_on, g_o[:, None]], axis=1))
        Lam = H[15:, 15:] - H_on.T @ sol[:, :15]
        g_n = g[15:] - H_on.T @ sol[:, 15]
        w_e, Vec = np.linalg.eigh(Lam)
        w_e = np.clip(w_e, 0.0, None)
        S_new = np.sqrt(w_e)[:, None] * Vec.T
        keep = w_e > 1e-12 * max(w_e.max(), 1.0)
        c_new = np.where(
            keep, (Vec.T @ g_n) / np.sqrt(np.maximum(w_e, 1e-300)), 0.0
        )
        self._mprior = (nxt, S_new, c_new, x_nxt.copy())
        self._history[old] = self._est.pop(old)
        self._window = self._window[1:]

    # -- update ----------------------------------------------------------
    def update(self, options: Optional[Options] = None):
        """Marginalize down to the lag, then solve the window
        (blocking: dispatch + immediate flush)."""
        self.flush()
        self._pending = self._dispatch(options)
        return self.flush()

    def _dispatch(self, options: Optional[Options] = None) -> dict:
        """Marginalize down to the lag, then DISPATCH the window solve
        (no fetch — see flush/update_async)."""
        if options is None:
            options = Options().replace(max_iterations=50)
        while len(self._window) > self.lag:
            self._marginalize_oldest()
        ids = list(self._window)
        of = {si: k for k, si in enumerate(ids)}
        N = len(ids)
        dtype = self.dtype
        x0 = np.stack([self._est[si] for si in ids])

        factors = _pack_imu_factors(self._imu, of, dtype)
        walk_pairs, walk_w = _pack_walks(self._walks, of, dtype)
        priors = _pack_priors(self._priors, of, dtype)
        free = np.ones((N, 16))
        if self._gauge is not None:
            free[of[self._gauge], :7] = 0.0
        mprior = None
        if self._mprior is not None:
            a_idx, S, c, lin = self._mprior
            mprior = (
                jnp.asarray(of[a_idx], jnp.int32),
                jnp.asarray(S, dtype),
                jnp.asarray(c, dtype),
                jnp.asarray(lin, dtype),
            )
        x, summary = _inertial_solve(
            jnp.asarray(x0, dtype), factors, walk_pairs, walk_w, None,
            priors, jnp.asarray(free, dtype),
            jnp.asarray(self.gravity, dtype), mprior, N, options,
        )
        return dict(x=x, ids=ids, summary=summary)
