"""Fixed-lag smoother: ONLINE sliding-window SE(3) pose-graph optimization
with Gaussian marginalization.

New capability — the reference is batch-only (its pose-graph module
re-solves the whole history, pose_graph_optimizer.h:21-108). A fixed-lag
smoother keeps compute and memory bounded for online SLAM: only the most
recent ``lag`` poses stay active; older poses are marginalized into a
dense Gaussian prior over the poses they were connected to, so their
information is kept (unlike plain windowing) while the per-update solve
stays a constant-size problem.

Division of labor (the same host/device split as the rest of the
framework):

- the WINDOW optimization is the dense pose-graph solve
  (`solvers.pose_graph._pose_graph_solve`) — one XLA program per update,
  with the marginal prior folded in as an extra quadratic factor
  (`prior_sqrt/prior_mean/prior_sel`);
- MARGINALIZATION runs on host in f64 numpy (a handful of edges once per
  update; eager jnp dispatches cost ~30 ms each through this runtime's
  relay, so host paths use the pure-numpy linearization twin
  `ops.relative_pose.np_edge_residuals_and_jacobians`).

Marginalization is the standard Schur complement on the Gauss-Newton
information of every factor touching a leaving pose, linearized at the
current (post-optimization) estimate:

    Lambda_b = H_bb - H_bm (H_mm + eps I)^{-1} H_mb
    g_b'     = g_b  - H_bm (H_mm + eps I)^{-1} g_m

stored as a square-root factor S (Lambda = S^T S via eigendecomposition
with eigenvalue clipping — Lambda is PSD but rank-deficient along the
quaternion-scale null directions the normalization Jacobian leaves) and a
mean x_bar = x_b* - Lambda^+ g_b', i.e. the prior residual S (x_b - x_bar)
reproduces the marginal quadratic exactly. Switch variables of absorbed
loop closures are marginalized with their edges.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Tuple

import jax.numpy as jnp
import numpy as np

from ..core.options import Options
from ..core.pose import Pose, np_quat_to_rotmat
from ..ops.relative_pose import (
    SWITCH_PENALTY_SCALE,
    PoseGraphEdges,
    np_edge_residuals_and_jacobians,
)
from . import lm
from .pose_graph import _pose_graph_solve


def _pack(pose: Pose) -> np.ndarray:
    return np.concatenate([pose.translation, pose.quaternion()])


class FixedLagSmoother:
    """Sliding-window smoother over consecutively-indexed poses.

    Usage (one odometry step per frame, loops optional):

        sm = FixedLagSmoother(lag=15, switch_penalty=0.03)
        sm.add_pose(0, first_pose)
        for k in odometry_stream:
            sm.add_pose(k, prediction)
            sm.add_odometry(k - 1, k, rel_pose)
            if loop_found:
                sm.add_loop(i, k, rel_pose)
            summary = sm.update()

    ``get_pose(i)`` returns the current window estimate, or the final
    (frozen) estimate for already-marginalized poses.

    ``edge_loss`` is not supported: a robust loss has no consistent
    quadratic marginal (its curvature depends on the residual it is
    evaluated at), so mixing it with marginalization silently changes the
    objective — use switchable loop constraints (supported) instead.
    """

    def __init__(
        self,
        lag: int,
        dtype=jnp.float64,
        switch_penalty: Optional[float] = None,
        max_iterations: int = 50,
    ):
        if lag < 2:
            raise ValueError("lag must be >= 2")
        self.lag = lag
        self.dtype = dtype
        self.switch_penalty = (
            SWITCH_PENALTY_SCALE if switch_penalty is None else switch_penalty
        )
        self.max_iterations = max_iterations
        self._window: List[int] = []  # consecutive pose ids, oldest first
        self._est: Dict[int, np.ndarray] = {}  # id -> packed (7,) [p, q]
        self._history: Dict[int, np.ndarray] = {}  # marginalized finals
        # odometry: (ref, qry, rel_t (3,), rel_q (4,)); loops add a switch
        self._odom: List[Tuple] = []
        self._loops: List[dict] = []  # ref, qry, rel_t, rel_q, switch
        # prior: (support ids ascending, S (7B, 7B), mean (B, 7))
        self._prior: Optional[Tuple[List[int], np.ndarray, np.ndarray]] = None
        self._gauge: Optional[int] = None  # fixed pose until a prior exists

    # -- registry -----------------------------------------------------------
    def add_pose(self, index: int, pose: Pose) -> None:
        if self._window and index != self._window[-1] + 1:
            raise ValueError(
                f"poses must be added consecutively (expected "
                f"{self._window[-1] + 1}, got {index})"
            )
        self._window.append(index)
        self._est[index] = _pack(pose)
        if self._gauge is None and self._prior is None:
            self._gauge = index

    def _check_edge(self, ref: int, qry: int) -> None:
        if ref not in self._est or qry not in self._est:
            raise KeyError("edge endpoints must be in the active window")
        if ref == qry:
            raise ValueError("self-edge is not allowed")

    def add_odometry(self, reference_index: int, query_index: int, relative_pose: Pose) -> None:
        self._check_edge(reference_index, query_index)
        self._odom.append(
            (
                reference_index,
                query_index,
                relative_pose.translation.copy(),
                relative_pose.quaternion(),
            )
        )

    def add_loop(self, reference_index: int, query_index: int, relative_pose: Pose) -> None:
        self._check_edge(reference_index, query_index)
        self._loops.append(
            dict(
                ref=reference_index,
                qry=query_index,
                rel_t=relative_pose.translation.copy(),
                rel_q=relative_pose.quaternion(),
                switch=1.0,
            )
        )

    def get_pose(self, index: int) -> Pose:
        x = self._est.get(index)
        if x is None:
            x = self._history[index]
        q = x[3:] / np.linalg.norm(x[3:])
        return Pose(np_quat_to_rotmat(q), x[:3].copy())

    def loop_switches(self) -> np.ndarray:
        """Current switch values of the ACTIVE (un-marginalized) loops."""
        return np.array([l["switch"] for l in self._loops])

    @property
    def window(self) -> List[int]:
        return list(self._window)

    # -- update ---------------------------------------------------------------
    def update(self, options: Optional[Options] = None) -> lm.Summary:
        """Optimize the window, then marginalize poses older than the lag."""
        summary = self._optimize(options)
        cutoff = self._window[-1] - self.lag + 1
        if cutoff > self._window[0]:
            self._marginalize(cutoff)
        return summary

    # -- window solve ---------------------------------------------------------
    def _optimize(self, options: Optional[Options]) -> lm.Summary:
        if options is None:
            options = Options().replace(max_iterations=self.max_iterations)
        W = len(self._window)
        local = {pi: i for i, pi in enumerate(self._window)}
        dtype = self.dtype

        if not self._odom and not self._loops:
            zero = jnp.zeros((), dtype)
            nan = jnp.full((options.max_iterations,), jnp.nan, dtype)
            return lm.Summary(
                zero, zero, jnp.zeros((), jnp.int32), zero,
                jnp.asarray(True), lm.IterationRecord(nan, nan, nan, nan),
            )

        est = np.stack([self._est[pi] for pi in self._window])
        ref, qry, rel_t, rel_q, is_loop, sw0 = [], [], [], [], [], []
        for (a, b, t, q) in self._odom:
            ref.append(local[a]); qry.append(local[b])
            rel_t.append(t); rel_q.append(q); is_loop.append(0.0)
        for l in self._loops:
            ref.append(local[l["ref"]]); qry.append(local[l["qry"]])
            rel_t.append(l["rel_t"]); rel_q.append(l["rel_q"])
            is_loop.append(1.0); sw0.append(l["switch"])
        E = len(ref)
        edges = PoseGraphEdges(
            reference_indices=jnp.asarray(np.array(ref, np.int32)),
            query_indices=jnp.asarray(np.array(qry, np.int32)),
            relative_translations=jnp.asarray(np.stack(rel_t), dtype),
            relative_quaternions=jnp.asarray(np.stack(rel_q), dtype),
            is_loop=jnp.asarray(np.array(is_loop), dtype),
            mask=jnp.ones((E,), dtype),
        )
        L = len(sw0)
        free = np.ones(W)
        if self._prior is None and self._gauge is not None:
            free[local[self._gauge]] = 0.0

        prior_sqrt = prior_mean = prior_sel = None
        if self._prior is not None:
            sup, S, mean = self._prior
            prior_sqrt = jnp.asarray(S, dtype)
            prior_mean = jnp.asarray(mean, dtype)
            prior_sel = jnp.asarray(
                np.array([local[pi] for pi in sup], np.int32)
            )

        pos, quat, sw, summary = _pose_graph_solve(
            jnp.asarray(est[:, :3], dtype),
            jnp.asarray(est[:, 3:], dtype),
            jnp.asarray(np.array(sw0), dtype),
            edges,
            jnp.asarray(free, dtype),
            jnp.asarray(self.switch_penalty, dtype),
            None,  # edge_loss unsupported (see class docstring)
            W,
            L,
            options,
            prior_sqrt,
            prior_mean,
            prior_sel,
        )
        pos, quat, sw = np.array(pos, np.float64), np.array(quat, np.float64), np.array(sw, np.float64)
        for i, pi in enumerate(self._window):
            self._est[pi] = np.concatenate([pos[i], quat[i]])
        for l, s in zip(self._loops, sw):
            l["switch"] = float(s)
        return summary

    # -- marginalization --------------------------------------------------------
    def _marginalize(self, cutoff: int) -> None:
        leaving = {pi for pi in self._window if pi < cutoff}

        absorb_odom = [e for e in self._odom if e[0] in leaving or e[1] in leaving]
        absorb_loops = [
            l for l in self._loops if l["ref"] in leaving or l["qry"] in leaving
        ]
        prior_support = list(self._prior[0]) if self._prior is not None else []

        # variable set: every pose touched by an absorbed factor/prior,
        # plus all leaving poses (isolated ones contribute nothing but
        # must still be removed from the window)
        V: List[int] = sorted(
            leaving
            | {e[0] for e in absorb_odom} | {e[1] for e in absorb_odom}
            | {l["ref"] for l in absorb_loops} | {l["qry"] for l in absorb_loops}
            | set(prior_support)
        )
        slot = {pi: i for i, pi in enumerate(V)}
        n_sw = len(absorb_loops)
        dim = 7 * len(V) + n_sw

        est = np.stack([self._est[pi] for pi in V])  # (V, 7) linearization
        H = np.zeros((dim, dim))
        g = np.zeros(dim)

        edges_all = [(e[0], e[1], e[2], e[3], 0.0, 1.0) for e in absorb_odom] + [
            (l["ref"], l["qry"], l["rel_t"], l["rel_q"], 1.0, l["switch"])
            for l in absorb_loops
        ]
        if edges_all:
            ref_i = np.array([slot[e[0]] for e in edges_all])
            qry_i = np.array([slot[e[1]] for e in edges_all])
            r, J_ref, J_qry, J_s = np_edge_residuals_and_jacobians(
                est[:, :3].astype(np.float64),
                est[:, 3:].astype(np.float64),
                np.array([e[5] for e in edges_all]),
                ref_i,
                qry_i,
                np.stack([e[2] for e in edges_all]),
                np.stack([e[3] for e in edges_all]),
                np.array([e[4] for e in edges_all]),
                self.switch_penalty,
            )
            # the gauge pose (fixed while no prior exists) is a constant:
            # zero its Jacobian columns so it contributes no information
            for k, (a, b, *_rest) in enumerate(edges_all):
                if self._prior is None and a == self._gauge:
                    J_ref[k] = 0.0
                if self._prior is None and b == self._gauge:
                    J_qry[k] = 0.0
            n_odom = len(absorb_odom)
            for k in range(len(edges_all)):
                ra = 7 * ref_i[k]
                rb = 7 * qry_i[k]
                Ja, Jb, rk = J_ref[k], J_qry[k], r[k]
                H[ra : ra + 7, ra : ra + 7] += Ja.T @ Ja
                H[rb : rb + 7, rb : rb + 7] += Jb.T @ Jb
                H[ra : ra + 7, rb : rb + 7] += Ja.T @ Jb
                H[rb : rb + 7, ra : ra + 7] += Jb.T @ Ja
                g[ra : ra + 7] += Ja.T @ rk
                g[rb : rb + 7] += Jb.T @ rk
                if k >= n_odom:  # loop: switch column
                    sc = 7 * len(V) + (k - n_odom)
                    Js = J_s[k]
                    H[ra : ra + 7, sc] += Ja.T @ Js
                    H[sc, ra : ra + 7] += Ja.T @ Js
                    H[rb : rb + 7, sc] += Jb.T @ Js
                    H[sc, rb : rb + 7] += Jb.T @ Js
                    H[sc, sc] += Js @ Js
                    g[sc] += Js @ rk

        if self._prior is not None:
            sup, S, mean = self._prior
            rows = np.concatenate([np.arange(7 * slot[pi], 7 * slot[pi] + 7) for pi in sup])
            r_p = S @ (est.reshape(-1)[rows] - mean.reshape(-1))
            H[np.ix_(rows, rows)] += S.T @ S
            g[rows] += S.T @ r_p

        # partition: m = leaving poses + absorbed switches; b = retained
        m_rows = np.concatenate(
            [np.arange(7 * slot[pi], 7 * slot[pi] + 7) for pi in V if pi in leaving]
            + [np.arange(7 * len(V), dim)]
        ).astype(int)
        retained = [pi for pi in V if pi not in leaving]
        b_rows = np.concatenate(
            [np.arange(7 * slot[pi], 7 * slot[pi] + 7) for pi in retained]
        ).astype(int) if retained else np.zeros((0,), int)

        if len(b_rows):
            H_mm = H[np.ix_(m_rows, m_rows)] + 1e-10 * np.eye(len(m_rows))
            H_bm = H[np.ix_(b_rows, m_rows)]
            sol = np.linalg.solve(H_mm, np.concatenate([H_bm.T, g[m_rows][:, None]], axis=1))
            Lam = H[np.ix_(b_rows, b_rows)] - H_bm @ sol[:, :-1]
            g_b = g[b_rows] - H_bm @ sol[:, -1]
            Lam = 0.5 * (Lam + Lam.T)
            w, Vec = np.linalg.eigh(Lam)
            w = np.clip(w, 0.0, None)
            S_new = np.sqrt(w)[:, None] * Vec.T
            w_inv = np.where(w > 1e-12 * max(w.max(), 1.0), 1.0 / np.maximum(w, 1e-300), 0.0)
            x_star = np.concatenate([self._est[pi] for pi in retained])
            mean_new = x_star - Vec @ (w_inv * (Vec.T @ g_b))
            self._prior = (retained, S_new, mean_new.reshape(len(retained), 7))
        else:
            self._prior = None

        # slide the registry
        for pi in sorted(leaving):
            self._history[pi] = self._est.pop(pi)
        self._window = [pi for pi in self._window if pi not in leaving]
        # identity-based filtering: the entries hold numpy arrays, whose
        # `==` is elementwise — membership tests would be fragile
        absorbed = {id(e) for e in absorb_odom} | {id(l) for l in absorb_loops}
        self._odom = [e for e in self._odom if id(e) not in absorbed]
        self._loops = [l for l in self._loops if id(l) not in absorbed]
        self._gauge = None  # the prior carries the gauge from here on
